"""Exhaustive inverse search for the last-mode xfail family (test_d/test_e/
spectrum_period.last_0).

The reference's last-mode expected value is produced by
``trend_detection(interp(de_anomalized_series))`` (dynamic_threshold.py:17-44)
— a deterministic function of the de-anomalization subset S and the trend
window w (helpers.py:74-101).  The series are 23-24 points, so the FULL
2^n subset space is enumerable.  For each feasible window (w follows from the
guessed period) we solve the forward map vectorized and report every (S, w)
whose EV at the last index matches the golden expectedValue.

A hit identifies the reference's exact de-anom set; a miss over the full
space PROVES the reference EV is not spline-of-interp-of-any-subset and the
divergence sits elsewhere (trend kind, interp semantics, or EV source).

Usage: python tools/xfail_inverse.py [case_name] [--tol 1e-9]
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from anomaly_detector_spark.kernels.trend import (  # noqa: E402
    _bspline_basis,
    aglet,
    line_filter,
    mean_filter,
    median_filter,
    spline_filter,
)

CASES_DIR = "/root/reference/tests/cases"


def load_case(name: str):
    with open(f"{CASES_DIR}/{name}") as f:
        content = json.load(f)
    vals = np.array([float(p["value"]) for p in content["request"]["series"]])
    return vals, content["response"]["expectedValue"]


def interp_rows(Z: np.ndarray) -> np.ndarray:
    """Vectorized row-wise np.interp over NaNs (helpers.py:65-71 semantics:
    linear inside, flat clamp at the ends).  All-NaN rows stay NaN."""
    B, n = Z.shape
    valid = ~np.isnan(Z)
    cols = np.arange(n)
    # previous valid index per cell (-1 if none), next valid index (n if none)
    prev_idx = np.maximum.accumulate(np.where(valid, cols, -1), axis=1)
    nxt = np.where(valid[:, ::-1], cols[::-1], n)
    next_idx = np.minimum.accumulate(nxt, axis=1)[:, ::-1]
    has_any = valid.any(axis=1)
    p = np.clip(prev_idx, 0, n - 1)
    q = np.clip(next_idx, 0, n - 1)
    vp = np.take_along_axis(Z, p, axis=1)
    vq = np.take_along_axis(Z, q, axis=1)
    # edge clamps
    vp = np.where(prev_idx < 0, vq, vp)
    vq = np.where(next_idx >= n, vp, vq)
    span = (next_idx - prev_idx).astype(float)
    w = np.where((prev_idx >= 0) & (next_idx < n) & (span > 0),
                 (cols - prev_idx) / np.where(span > 0, span, 1.0), 0.0)
    filled = vp + (vq - vp) * w
    out = np.where(valid, Z, filled)
    out[~has_any] = np.nan
    return out


def theil_sen_rows(F: np.ndarray) -> np.ndarray:
    """Vectorized Theil-Sen median slope over the last axis (rows = series)."""
    n = F.shape[1]
    ii, jj = np.triu_indices(n, k=1)
    slopes = (F[:, jj] - F[:, ii]) / (jj - ii)
    return np.median(slopes, axis=1)


def spline_ev_last(Z: np.ndarray, window: int, at: int = -1) -> np.ndarray:
    """EV at index `at` of aglet(spline_filter(z, nseg), window) for each
    row of Z, fully vectorized (matches kernels/trend.py:fit_trend spline)."""
    n = Z.shape[1]
    at = at % n
    nseg = n // (window * 2) + 1
    x = np.arange(n, dtype=float)
    nknots = max(2, nseg + 1)
    interior = np.linspace(0, n - 1, nknots + 2)[1:-1]
    basis = _bspline_basis(x, interior)
    # hat matrix: F = Z @ H.T reproduces basis @ lstsq(basis, z)
    H = basis @ np.linalg.pinv(basis)
    F = Z @ H.T
    half = window // 2
    if half == 0 or n < window:
        return F[:, at]
    if at < half:
        slope = theil_sen_rows(F[:, :window])
        return F[:, half] + slope * (at - half)
    if at >= n - half:
        slope = theil_sen_rows(F[:, n - window :])
        return F[:, n - 1 - half] + slope * (at - (n - 1 - half))
    return F[:, at]


def other_kind_ev_last(z: np.ndarray, window: int) -> dict[str, float]:
    """EV at last index for the non-spline trend kinds (single row)."""
    out = {}
    out["median"] = aglet(median_filter(z, window), window)[-1]
    out["mean"] = aglet(mean_filter(z, window), window)[-1]
    out["line"] = line_filter(z, window)[-1]
    n = len(z)
    nseg = n // (window * 2) + 1
    out["spline"] = aglet(spline_filter(z, nseg), window)[-1]
    return out


def windows_for(n: int) -> list[int]:
    """Every window the reference could use: period<=1 -> min(n//3,512);
    period p in 2..n//3 (guess_trended_period caps at max_period=n//3)
    -> 2p-1."""
    ws = {min(n // 3, 512)}
    for p in range(2, n // 3 + 1):
        ws.add((p * 2) // 2 * 2 - 1)
    return sorted(w for w in ws if w >= 1)


def run_case(name: str, tol: float = 1e-9, max_mask_bits: int | None = None,
             at: int = -1, targets: list[float] | None = None):
    """Sweep all de-anom subsets x windows; report (S, w, target) matches of
    the spline-trend EV at index `at` against each target."""
    y, default_target = load_case(name)
    targets = targets if targets is not None else [default_target]
    targets = np.asarray(targets)
    n = len(y)
    bits = n if max_mask_bits is None else max_mask_bits
    total = 1 << bits
    ws = windows_for(n)
    print(f"{name}: n={n} at={at} targets={list(targets)} windows={ws} subsets={total:,}")

    hits = []
    CHUNK = 1 << 17
    col_bits = np.arange(bits)
    for start in range(0, total, CHUNK):
        masks = np.arange(start, min(start + CHUNK, total), dtype=np.int64)
        nan_mask = (masks[:, None] >> col_bits[None, :]) & 1  # (B, bits)
        Z = np.tile(y, (len(masks), 1))
        Z[nan_mask.astype(bool)] = np.nan
        # drop the all-NaN row (mask == 2^n - 1)
        valid = ~np.isnan(Z).all(axis=1)
        Z = interp_rows(Z)
        for w in ws:
            ev = spline_ev_last(Z, w, at=at)
            match = valid & (np.abs(ev[:, None] - targets[None, :]) < tol).any(axis=1)
            for i in np.nonzero(match)[0]:
                hits.append((int(masks[i]), w, float(ev[i])))
        if start % (CHUNK * 16) == 0:
            print(f"  {start:,}/{total:,} hits={len(hits)}", flush=True)
    print(f"DONE {name}: {len(hits)} hits")
    for mask, w, ev in hits[:50]:
        subset = [i for i in range(bits) if mask >> i & 1]
        print(f"  S={subset} w={w} ev={ev!r}")
    return hits


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tol = 1e-9
    for a in sys.argv[1:]:
        if a.startswith("--tol"):
            tol = float(a.split("=")[1])
    names = args or ["json_last_cases.test_d_0.json"]
    for nm in names:
        run_case(nm, tol=tol)
