"""Seasonal-Trend decomposition by LOESS (STL) — from-scratch numpy port.

The reference decomposes via ``rstl.STL(data, np, "periodic", robust=True)``
(/root/reference/src/anomaly_detector/univariate/util/r_stl.py:32), a Python
port of R's ``stl`` which in turn wraps Cleveland et al.'s public-domain
Fortran ``stl.f`` (netlib).  This module re-implements that algorithm from
the published Fortran structure (stlstp/stless/stlest/stlss/stlfts/stlma/
stlrwt) with R's parameter policy:

- ``s.window="periodic"``: ns = 10n+1, s.degree = 0; after the loop the
  seasonal is replaced by per-phase means (R stl post-processing).
- robust=True: inner = 1, outer = 15.
- t.window = nextodd(ceil(1.5 p / (1 - 1.5/ns))), l.window = nextodd(p),
  t.degree = l.degree = 1, jumps = ceil(window/10).

Wrappers (stl / stl_log / stl_adjust_trend / de_outlier_stl) port
r_stl.py:12-110 and stl_helpers.py:11-38.
"""

from __future__ import annotations

import numpy as np

MAPE_UB = 0.10  # stl_helpers.py:7-8
MAPE_LB = 0.05


def _nextodd(x: float) -> int:
    x = int(round(x))
    return x + 1 if x % 2 == 0 else x


# LOESS anchor geometry (anchor list, window starts, gather indices) and the
# tricube weight matrix depend only on (n, length, ideg, njump) — not on the
# data — and stl_decompose re-runs the same smooths 16x per series over
# thousands of same-shape series.  The plans below compute those arrays ONCE
# with exactly the ops _est_batch/_ss run inline, then reuse them bitwise-
# identically; for userw=False even the normalized + degree-adjusted weight
# matrix is data-independent, so a smooth collapses to gather*weights+sum.
_SMOOTH_PLANS: dict = {}
_SMOOTH_PLANS_BYTES = 0
# executor workers are long-lived: bound what a pathological mix of series
# shapes can pin (same policy as trend._triu_cache) — oversized single plans
# are returned uncached, and the whole cache resets past the byte budget
_SMOOTH_PLAN_MAX_BYTES = 8 << 20        # per plan
_SMOOTH_PLANS_BUDGET = 64 << 20         # per process
_SS_PLANS: dict = {}


def _smooth_plan(n: int, length: int, ideg: int, newnj: int, userw: bool):
    """Precomputed `_est_batch` internals for `_smooth`'s length<n branch."""
    key = (n, length, ideg, newnj, userw)
    plan = _SMOOTH_PLANS.get(key)
    if plan is not None:
        return plan
    nsh = (length + 1) // 2
    if newnj == 1:
        i_list = np.arange(1, n + 1)
        nleft_list = 1 + np.clip(i_list - nsh, 0, n - length)
    else:
        i_list = np.arange(1, n + 1, newnj)
        nleft_list = np.where(
            i_list < nsh,
            1,
            np.where(i_list >= n - nsh + 1, n - length + 1, i_list - nsh + 1),
        )
    xs = i_list.astype(float)
    nleft = nleft_list.astype(int)
    rng = float(n - 1)
    nright = nleft + length - 1           # width == length (length < n here)
    h = np.maximum(xs - nleft, nright - xs)
    idx = (nleft - 1)[:, None] + np.arange(length)[None, :]
    J = (idx + 1).astype(float)
    r = np.abs(J - xs[:, None])
    h9 = 0.999 * h
    h1 = 0.001 * h
    with np.errstate(divide="ignore", invalid="ignore"):
        w0 = np.where(r <= h9[:, None], (1.0 - (r / h[:, None]) ** 3) ** 3, 0.0)
    w0[r <= h1[:, None]] = 1.0
    fb_idx = np.clip(xs.astype(int) - 1, 0, n - 1)
    # tail anchor at i=n for the k != n jump case (length < n here, so the
    # window is always [n-length+1, n]) — replicate _est's scalar ops exactly
    k = ((n - 1) // newnj) * newnj + 1
    tail = None
    if newnj != 1 and k != n:
        tl = n - length + 1
        jt = np.arange(tl, n + 1, dtype=float)
        rt = np.abs(jt - float(n))
        ht = max(float(n) - tl, 0.0)
        wt = np.zeros(len(jt))
        if ht > 0:
            inside = rt <= 0.999 * ht
            wt[inside] = (1.0 - (rt[inside] / ht) ** 3) ** 3
        wt[rt <= 0.001 * ht] = 1.0
        if userw:
            tail = (tl, jt, wt, ht)
        else:
            at = wt.sum()
            if at <= 0:
                tail = (tl, None, None, None)       # _est returns None
            else:
                wtn = wt / at
                if ht > 0 and ideg > 0:
                    xm = float((wtn * jt).sum())
                    b = float(n) - xm
                    c = float((wtn * (jt - xm) ** 2).sum())
                    if np.sqrt(c) > 0.001 * rng:
                        b = b / c
                        wtn = wtn * (b * (jt - xm) + 1.0)
                tail = (tl, None, wtn, None)
    if userw:
        plan = (i_list, idx, J, xs, rng, w0, fb_idx, None, None, tail)
    else:
        # data-independent: finish the normalization + degree-1 adjustment
        # exactly as _est_batch would (same ops, same order, run once)
        a = w0.sum(axis=1)
        ok = a > 0
        w = w0 / np.where(ok, a, 1.0)[:, None]
        if ideg > 0:
            xm = (w * J).sum(axis=1)
            b = xs - xm
            c = (w * (J - xm[:, None]) ** 2).sum(axis=1)
            use = np.sqrt(np.maximum(c, 0.0)) > 0.001 * rng
            bc = np.where(use & (c != 0), b / np.where(c != 0, c, 1.0), 0.0)
            w = np.where(use[:, None], w * (bc[:, None] * (J - xm[:, None]) + 1.0), w)
        plan = (i_list, idx, J, xs, rng, w0, fb_idx, w, ok, tail)
    global _SMOOTH_PLANS_BYTES
    plan_bytes = sum(a.nbytes for a in plan[:9] if isinstance(a, np.ndarray))
    if plan_bytes <= _SMOOTH_PLAN_MAX_BYTES:
        if _SMOOTH_PLANS_BYTES + plan_bytes > _SMOOTH_PLANS_BUDGET:
            _SMOOTH_PLANS.clear()
            _SMOOTH_PLANS_BYTES = 0
        _SMOOTH_PLANS[key] = plan
        _SMOOTH_PLANS_BYTES += plan_bytes
    return plan


def _ss_plan(m: int, ns: int):
    """Precomputed periodic-fast-path anchor weights for `_ss` (nsdeg == 0)."""
    key = (m, ns)
    plan = _SS_PLANS.get(key)
    if plan is not None:
        return plan
    xs = np.array([1.0, float(m), 0.0, float(m + 1)])
    h = np.maximum(xs - 1.0, float(m) - xs)
    if ns > m:
        h = h + (ns - m) / 2.0
    J = np.arange(1, m + 1, dtype=float)
    rmat = np.abs(J[None, :] - xs[:, None])  # (4, m)
    h9 = 0.999 * h
    h1 = 0.001 * h
    with np.errstate(divide="ignore", invalid="ignore"):
        w0 = np.where(rmat <= h9[:, None], (1.0 - (rmat / h[:, None]) ** 3) ** 3, 0.0)
    w0[rmat <= h1[:, None]] = 1.0
    # userw=False finisher (normalize; nsdeg==0 so no degree adjustment) —
    # bitwise what the broadcast (B, 4, m) form produced per identical row
    a0 = w0.sum(axis=1)
    ok0 = a0 > 0
    w0n = w0 / np.where(ok0, a0, 1.0)[:, None]
    interp = np.arange(1, m - 1) if m > 2 else None
    plan = (w0, w0n, ok0, interp)
    if len(_SS_PLANS) >= 256:
        _SS_PLANS.clear()
    _SS_PLANS[key] = plan
    return plan


def _est(y: np.ndarray, length: int, ideg: int, xs: float, nleft: int, nright: int,
         userw: bool, rw: np.ndarray) -> float | None:
    """LOESS estimate at xs over y[nleft-1:nright] (1-based bounds); stlest."""
    n = len(y)
    rng = float(n - 1)
    h = max(xs - nleft, nright - xs)
    if length > n:
        h += (length - n) / 2.0
    h9 = 0.999 * h
    h1 = 0.001 * h
    j = np.arange(nleft, nright + 1, dtype=float)
    r = np.abs(j - xs)
    w = np.zeros(len(j))
    inside = r <= h9
    tiny = r <= h1
    if h > 0:
        w[inside] = (1.0 - (r[inside] / h) ** 3) ** 3
    w[tiny] = 1.0
    if userw:
        w *= rw[nleft - 1 : nright]
    a = w.sum()
    if a <= 0:
        return None
    w = w / a
    if h > 0 and ideg > 0:
        xm = float((w * j).sum())
        b = xs - xm
        c = float((w * (j - xm) ** 2).sum())
        if np.sqrt(c) > 0.001 * rng:
            b = b / c
            w = w * (b * (j - xm) + 1.0)
    return float((w * y[nleft - 1 : nright]).sum())


def _est_batch(y: np.ndarray, length: int, ideg: int, xs: np.ndarray,
               nleft: np.ndarray, userw: bool, rw: np.ndarray,
               width: int | None = None, return_ok: bool = False):
    """Vectorized ``_est`` over many anchors sharing the same window width.

    Follows the scalar loop's arithmetic exactly (same normalize-then-sum
    order), just batched row-wise; rows whose weights sum to zero fall back
    to the raw value, matching stless's not-ok branch.  ``width`` is the
    actual window span (defaults to ``length``; pass ``n`` when length > n,
    where the span clamps to the data and h widens by (length-n)/2).
    """
    n = len(y)
    rng = float(n - 1)
    if width is None:
        width = length
    nright = nleft + width - 1
    h = np.maximum(xs - nleft, nright - xs)
    if length > n:
        h = h + (length - n) / 2.0
    idx = (nleft - 1)[:, None] + np.arange(width)[None, :]
    J = (idx + 1).astype(float)
    r = np.abs(J - xs[:, None])
    h9 = 0.999 * h
    h1 = 0.001 * h
    with np.errstate(divide="ignore", invalid="ignore"):
        w = np.where(r[:, :] <= h9[:, None], (1.0 - (r / h[:, None]) ** 3) ** 3, 0.0)
    w[r <= h1[:, None]] = 1.0
    if userw:
        w = w * rw[idx]
    a = w.sum(axis=1)
    ok = a > 0
    safe_a = np.where(ok, a, 1.0)
    w = w / safe_a[:, None]
    if ideg > 0:
        xm = (w * J).sum(axis=1)
        b = xs - xm
        c = (w * (J - xm[:, None]) ** 2).sum(axis=1)
        use = np.sqrt(np.maximum(c, 0.0)) > 0.001 * rng
        bc = np.where(use & (c != 0), b / np.where(c != 0, c, 1.0), 0.0)
        w = np.where(use[:, None], w * (bc[:, None] * (J - xm[:, None]) + 1.0), w)
    ys = (w * y[idx]).sum(axis=1)
    fallback = y[np.clip(xs.astype(int) - 1, 0, n - 1)]
    out = np.where(ok, ys, fallback)
    if return_ok:
        return out, ok
    return out


def _smooth(y: np.ndarray, length: int, ideg: int, njump: int,
            userw: bool, rw: np.ndarray) -> np.ndarray:
    """LOESS smoothing of a whole series with jump interpolation; stless."""
    n = len(y)
    ys = np.empty(n)
    if n < 2:
        ys[:] = y[:]
        return ys
    newnj = min(njump, n - 1)
    tail = None
    if length >= n:
        nleft, nright = 1, n
        for i in range(1, n + 1, newnj):
            v = _est(y, length, ideg, float(i), nleft, nright, userw, rw)
            ys[i - 1] = y[i - 1] if v is None else v
    else:
        i_list, idx, J, xs, rng, w0, fb_idx, w_pre, ok_pre, tail = _smooth_plan(
            n, length, ideg, newnj, userw)
        if not userw:
            vals = (w_pre * y[idx]).sum(axis=1)
            ys[i_list - 1] = np.where(ok_pre, vals, y[fb_idx])
        else:
            # _est_batch's data-dependent tail on the cached geometry
            w = w0 * rw[idx]
            a = w.sum(axis=1)
            ok = a > 0
            w = w / np.where(ok, a, 1.0)[:, None]
            if ideg > 0:
                xm = (w * J).sum(axis=1)
                b = xs - xm
                c = (w * (J - xm[:, None]) ** 2).sum(axis=1)
                use = np.sqrt(np.maximum(c, 0.0)) > 0.001 * rng
                bc = np.where(use & (c != 0), b / np.where(c != 0, c, 1.0), 0.0)
                w = np.where(use[:, None], w * (bc[:, None] * (J - xm[:, None]) + 1.0), w)
            vals = (w * y[idx]).sum(axis=1)
            ys[i_list - 1] = np.where(ok, vals, y[fb_idx])
    if newnj != 1:
        # anchor-to-anchor linear interpolation, vectorized: deltas read only
        # anchor values (never interpolated ones), so the batched form equals
        # the sequential loop element-for-element
        starts = np.arange(1, n - newnj + 1, newnj)
        if len(starts):
            deltas = (ys[starts + newnj - 1] - ys[starts - 1]) / newnj
            offs = np.arange(1, newnj)
            pos = starts[:, None] + offs[None, :]
            ys[pos - 1] = ys[starts - 1][:, None] + deltas[:, None] * offs[None, :]
        k = ((n - 1) // newnj) * newnj + 1
        if k != n:
            if tail is not None:
                # cached _est geometry for the final anchor (length < n)
                tl, jt, wt, ht = tail
                if not userw:
                    v = None if wt is None else float((wt * y[tl - 1 : n]).sum())
                else:
                    w = wt * rw[tl - 1 : n]
                    a = w.sum()
                    if a <= 0:
                        v = None
                    else:
                        w = w / a
                        if ht > 0 and ideg > 0:
                            rng_ = float(n - 1)
                            xm = float((w * jt).sum())
                            b = float(n) - xm
                            c = float((w * (jt - xm) ** 2).sum())
                            if np.sqrt(c) > 0.001 * rng_:
                                b = b / c
                                w = w * (b * (jt - xm) + 1.0)
                        v = float((w * y[tl - 1 : n]).sum())
            else:
                if length >= n:
                    nleft, nright = 1, n
                elif n < (length + 1) // 2:
                    nleft, nright = 1, length
                elif n >= n - (length + 1) // 2 + 1:
                    nleft, nright = n - length + 1, n
                v = _est(y, length, ideg, float(n), nleft, nright, userw, rw)
            ys[n - 1] = y[n - 1] if v is None else v
            if k != n - 1:
                delta = (ys[n - 1] - ys[k - 1]) / (n - k)
                for j in range(k + 1, n):
                    ys[j - 1] = ys[k - 1] + delta * (j - k)
    return ys


def _ma(x: np.ndarray, length: int) -> np.ndarray:
    """Moving average of window ``length``; stlma."""
    c = np.cumsum(np.concatenate(([0.0], x)))
    return (c[length:] - c[:-length]) / length


def _fts(x: np.ndarray, period: int) -> np.ndarray:
    """Low-pass: MA(period) -> MA(period) -> MA(3); stlfts."""
    return _ma(_ma(_ma(x, period), period), 3)


def _ss(y: np.ndarray, period: int, ns: int, nsdeg: int, nsjump: int,
        userw: bool, rw: np.ndarray) -> np.ndarray:
    """Cycle-subseries smoothing, extended one period each side; stlss.

    Fast path: with the periodic s.window (ns = 10n+1 >= m), every subseries
    evaluation (both anchors + backcast/forecast) shares nleft=1 and window
    width m, so each phase is one batched weighted-mean call instead of four
    scalar LOESS calls.
    """
    n = len(y)
    # season is a slice view of a period-aligned buffer so the batched fast
    # path can scatter whole phase groups through one (rows, period) reshape
    # instead of B strided writes; scalar-path writes through the slice land
    # in the same storage (r7 — values and write order per phase unchanged)
    out_rows = (n + 2 * period + period - 1) // period
    season_pad = np.empty(out_rows * period)
    season = season_pad[: n + 2 * period]
    season_view = season_pad.reshape(out_rows, period)
    # (rows, period) view of y (padded to a multiple of period): column j-1
    # is exactly y[j-1::period], so a phase-group gather is one fancy-index
    # copy instead of B strided slices + np.stack
    y_rows = (n + period - 1) // period
    y_pad = np.empty(y_rows * period)
    y_pad[:n] = y
    y_view = y_pad.reshape(y_rows, period)
    if userw:
        rw_pad = np.empty(y_rows * period)
        rw_pad[:n] = rw
        rw_view = rw_pad.reshape(y_rows, period)
    # Subseries lengths take at most two values (q+1 for the first n%period
    # phases, q for the rest), and on the periodic fast path every phase of a
    # length group shares the SAME anchor geometry (xs, window, tricube
    # weights).  Batch each group into one (B, 4, m) evaluation instead of
    # `period` separate 4-anchor calls — identical per-row arithmetic (the
    # reductions stay per-(phase, anchor) over the contiguous m axis, so the
    # pairwise-summation order is unchanged), ~period× fewer numpy dispatches.
    q, r = divmod(n, period)
    groups = []
    if r > 0:
        groups.append((q + 1, range(1, r + 1)))
    groups.append((q, range(r + 1, period + 1)))
    for m, js in groups:
        if not (ns >= m and m >= 2 and nsjump >= m - 1 and nsdeg == 0):
            for j in js:
                sub = y[j - 1 :: period][:m]
                subrw = rw[j - 1 :: period][:m] if userw else np.ones(m)
                ext = np.empty(m + 2)
                if ns >= m and m >= 2 and nsjump >= m - 1:
                    xs = np.array([1.0, float(m), 0.0, float(m + 1)])
                    vals, ok = _est_batch(sub, ns, nsdeg, xs, np.ones(4, dtype=int),
                                          userw, subrw, width=m, return_ok=True)
                    s_first = vals[0] if ok[0] else sub[0]
                    s_last = vals[1] if ok[1] else sub[m - 1]
                    sm = np.empty(m)
                    sm[0] = s_first
                    sm[m - 1] = s_last
                    newnj = min(nsjump, m - 1)
                    if m > 2:
                        # stless jump interpolation between the two anchors
                        delta = (s_last - s_first) / newnj
                        sm[1 : m - 1] = s_first + delta * np.arange(1, m - 1)
                    ext[1 : m + 1] = sm
                    ext[0] = vals[2] if ok[2] else sm[0]
                    ext[m + 1] = vals[3] if ok[3] else sm[m - 1]
                else:
                    sm = _smooth(sub, ns, nsdeg, nsjump, userw, subrw)
                    back = _est(sub, ns, nsdeg, 0.0, 1, min(ns, m), userw, subrw)
                    fore = _est(sub, ns, nsdeg, float(m + 1), max(1, m - ns + 1), m, userw, subrw)
                    ext[1 : m + 1] = sm
                    ext[0] = sm[0] if back is None else back
                    ext[m + 1] = sm[m - 1] if fore is None else fore
                season[j - 1 :: period][: m + 2] = ext
            continue
        js = np.asarray(js)
        B = len(js)
        if B == 0:
            continue
        S = np.ascontiguousarray(y_view[:m, js - 1].T)  # (B, m), == old np.stack
        # anchor geometry shared by the whole group (xs over 1..m, nleft=1) —
        # data-independent, cached per (m, ns)
        w0, w0n, ok0, interp = _ss_plan(m, ns)
        if userw:
            RW = np.ascontiguousarray(rw_view[:m, js - 1].T)  # (B, m)
            w = w0[None, :, :] * RW[:, None, :]  # (B, 4, m)
            a = w.sum(axis=2)  # (B, 4)
            ok = a > 0
            w = w / np.where(ok, a, 1.0)[:, :, None]
        else:
            # every row of the broadcast (B, 4, m) form reduces identically,
            # so the cached normalized weights are bitwise the same
            w = np.broadcast_to(w0n, (B, 4, m))
            ok = np.broadcast_to(ok0, (B, 4))
        # nsdeg == 0 on this path, so the degree-1 reweighting never applies
        vals = (w * S[:, None, :]).sum(axis=2)  # (B, 4)
        s_first = np.where(ok[:, 0], vals[:, 0], S[:, 0])
        s_last = np.where(ok[:, 1], vals[:, 1], S[:, m - 1])
        ext = np.empty((B, m + 2))
        ext[:, 1] = s_first
        ext[:, m] = s_last
        newnj = min(nsjump, m - 1)
        if m > 2:
            delta = (s_last - s_first) / newnj
            ext[:, 2:m] = s_first[:, None] + delta[:, None] * interp[None, :]
        ext[:, 0] = np.where(ok[:, 2], vals[:, 2], s_first)
        ext[:, m + 1] = np.where(ok[:, 3], vals[:, 3], s_last)
        season_view[: m + 2, js - 1] = ext.T
    return season


def _rwts(y: np.ndarray, fit: np.ndarray) -> np.ndarray:
    """Bisquare robustness weights; stlrwt."""
    n = len(y)
    r = np.abs(y - fit)
    mid1 = n // 2 + 1
    mid2 = n - mid1 + 1
    # only two order statistics are read; partial selection places the same
    # values at those positions as a full sort (NaNs sort last either way)
    sr = np.partition(r, (mid2 - 1, mid1 - 1))
    mad = 3.0 * (sr[mid1 - 1] + sr[mid2 - 1])
    c9 = 0.999 * mad
    c1 = 0.001 * mad
    rw = np.zeros(n)
    with np.errstate(divide="ignore", invalid="ignore"):
        mask_mid = (r > c1) & (r <= c9)
        rw[mask_mid] = (1.0 - (r[mask_mid] / mad) ** 2) ** 2
    rw[r <= c1] = 1.0
    return rw


def stl_decompose(y, period: int, robust: bool = True) -> dict:
    """STL with s.window='periodic'; returns dict(seasonal, trend, remainder)."""
    y = np.asarray(y, dtype=float)
    n = len(y)
    if period < 2 or n <= 2 * period:
        raise ValueError("series is not periodic or has less than two periods")
    ns = 10 * n + 1  # periodic
    isdeg = 0
    nt = _nextodd(np.ceil(1.5 * period / (1.0 - 1.5 / ns)))
    nl = _nextodd(period)
    itdeg, ildeg = 1, 1
    nsjump = int(np.ceil(ns / 10.0))
    ntjump = int(np.ceil(nt / 10.0))
    nljump = int(np.ceil(nl / 10.0))
    inner = 1 if robust else 2
    outer = 15 if robust else 0

    trend = np.zeros(n)
    season = np.zeros(n)
    rw = np.ones(n)
    userw = False
    k = 0
    while True:
        for _ in range(inner):
            detrended = y - trend
            c = _ss(detrended, period, ns, isdeg, nsjump, userw, rw)
            lowpass = _smooth(_fts(c, period), nl, ildeg, nljump, False, rw)
            season = c[period : period + n] - lowpass
            deseason = y - season
            trend = _smooth(deseason, nt, itdeg, ntjump, userw, rw)
        k += 1
        if k > outer:
            break
        rw = _rwts(y, trend + season)
        userw = True

    # NOTE: R's stl() replaces the periodic seasonal by per-phase means as a
    # post-processing step; the reference's rstl port returns the raw Fortran
    # seasonal/trend (validated against the golden corpus), so no averaging
    # here.
    remainder = y - season - trend
    return {"seasonal": season, "trend": trend, "remainder": remainder}


# --- wrappers mirroring r_stl.py / stl_helpers.py ---------------------------


def stl(data, np_period: int, log_transform: bool = False) -> dict:
    """Port of r_stl.py:76-80 (stl / stl_log dispatch)."""
    data = np.asarray(data, dtype=float)
    if not log_transform:
        return stl_decompose(data, np_period)
    # stl_log (r_stl.py:36-73)
    base = data.min()
    shifted = data
    if base < 1:
        shifted = data - base + 1.0
    res = stl_decompose(np.log(shifted), np_period)
    trend = np.exp(res["trend"])
    seasonal = np.exp(res["trend"] + res["seasonal"]) - trend
    remainder = shifted - trend - seasonal
    if base < 1:
        trend = trend - 1.0 + base
    return {"seasonal": seasonal, "trend": trend, "remainder": remainder}


def stl_adjust_trend(data, np_period: int, log_transform: bool = False) -> dict:
    """Port of r_stl.py:83-110 — extend one point, keep the better tail."""
    data = np.asarray(data, dtype=float)
    extended = np.append(data, [np.median(data[-np_period::-np_period])])
    origin = stl(data, np_period, log_transform)
    adjust = stl(extended, np_period, log_transform)
    if np.abs(origin["remainder"][-1]) <= np.abs(adjust["remainder"][-2]):
        return origin
    n = len(data)
    return {k: adjust[k][:n] for k in ("seasonal", "trend", "remainder")}


def _ffill_bfill(values: np.ndarray) -> np.ndarray:
    """pandas ffill().bfill() equivalent for a 1-D array with NaNs."""
    out = values.copy()
    mask = np.isnan(out)
    idx = np.where(~mask, np.arange(len(out)), 0)
    np.maximum.accumulate(idx, out=idx)
    out = out[idx]
    if np.isnan(out[0]):
        first_valid = np.where(~np.isnan(out))[0]
        if len(first_valid):
            out[: first_valid[0]] = out[first_valid[0]]
    return out


def get_outlier(values: np.ndarray, period: int) -> np.ndarray:
    """Port of stl_helpers.py:11-23 (phase-bucket-aware 3-sigma outliers)."""
    mean = np.mean(values)
    std = np.std(values)
    if std == 0:
        return np.array([], dtype=int)
    outlier_index = np.where(np.abs(values - mean) / std >= 3)[0]
    if len(outlier_index) == 0:
        return np.array([], dtype=int)
    period_bins = outlier_index % period
    unique, counts = np.unique(period_bins, return_counts=True)
    invalid = unique[counts <= int((len(values) / period) / 2)]
    return outlier_index[np.isin(period_bins, invalid)]


def de_outlier_stl(series, stl_func, period: int, log_transform: bool) -> dict:
    """Port of stl_helpers.py:26-38 — de-outlier then re-decompose."""
    series = np.asarray(series, dtype=float)
    dec = stl_func(series, period, log_transform)
    de_trend = dec["remainder"] + dec["seasonal"]
    outlier = get_outlier(de_trend, period)
    if len(outlier) == 0:
        return dec
    de_trend = de_trend.copy()
    de_trend[outlier] = np.nan
    de_trend = _ffill_bfill(de_trend)
    return stl_func(de_trend + dec["trend"], period, log_transform)
