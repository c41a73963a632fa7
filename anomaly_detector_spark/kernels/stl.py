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


def _smooth(y: np.ndarray, length: int, ideg: int, njump: int,
            userw: bool, rw: np.ndarray) -> np.ndarray:
    """LOESS smoothing of a whole series with jump interpolation; stless."""
    n = len(y)
    ys = np.empty(n)
    if n < 2:
        ys[:] = y[:]
        return ys
    newnj = min(njump, n - 1)
    if length >= n:
        nleft, nright = 1, n
        for i in range(1, n + 1, newnj):
            v = _est(y, length, ideg, float(i), nleft, nright, userw, rw)
            ys[i - 1] = y[i - 1] if v is None else v
    else:
        if newnj == 1:
            nsh = (length + 1) // 2
            nleft, nright = 1, length
            for i in range(1, n + 1):
                if i > nsh and nright != n:
                    nleft += 1
                    nright += 1
                v = _est(y, length, ideg, float(i), nleft, nright, userw, rw)
                ys[i - 1] = y[i - 1] if v is None else v
        else:
            nsh = (length + 1) // 2
            for i in range(1, n + 1, newnj):
                if i < nsh:
                    nleft, nright = 1, length
                elif i >= n - nsh + 1:
                    nleft, nright = n - length + 1, n
                else:
                    nleft, nright = i - nsh + 1, length + i - nsh
                v = _est(y, length, ideg, float(i), nleft, nright, userw, rw)
                ys[i - 1] = y[i - 1] if v is None else v
    if newnj != 1:
        for i in range(1, n - newnj + 1, newnj):
            delta = (ys[i + newnj - 1] - ys[i - 1]) / newnj
            for j in range(i + 1, i + newnj):
                ys[j - 1] = ys[i - 1] + delta * (j - i)
        k = ((n - 1) // newnj) * newnj + 1
        if k != n:
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


def _ss(y: np.ndarray, period: int, ns: int, isdeg: int, nsjump: int,
        userw: bool, rw: np.ndarray) -> np.ndarray:
    """Cycle-subseries smoothing, extended one period each side; stlss."""
    n = len(y)
    season = np.empty(n + 2 * period)
    for j in range(1, period + 1):
        m = (n - j) // period + 1
        sub = y[j - 1 :: period][:m]
        subrw = rw[j - 1 :: period][:m] if userw else np.ones(m)
        sm = _smooth(sub, ns, isdeg, nsjump, userw, subrw)
        # backcast at position 0 and forecast at m+1
        back = _est(sub, ns, isdeg, 0.0, 1, min(ns, m), userw, subrw)
        fore = _est(sub, ns, isdeg, float(m + 1), max(1, m - ns + 1), m, userw, subrw)
        ext = np.empty(m + 2)
        ext[1 : m + 1] = sm
        ext[0] = sm[0] if back is None else back
        ext[m + 1] = sm[m - 1] if fore is None else fore
        season[j - 1 :: period][: m + 2] = ext
    return season


def _rwts(y: np.ndarray, fit: np.ndarray) -> np.ndarray:
    """Bisquare robustness weights; stlrwt."""
    n = len(y)
    r = np.abs(y - fit)
    sr = np.sort(r)
    mid1 = n // 2 + 1
    mid2 = n - mid1 + 1
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
