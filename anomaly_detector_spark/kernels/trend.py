"""Trend estimation + spike smoothing — numpy ports.

Ports the reference's trend stack (operators T1-T2, PD4 in SURVEY.md):

- median_filter (incremental sorted window, float32)
                         <- _anomaly_kernel_cython.pyx:231-278
- trend_detection / fit_trend / guess_trended_period
                         <- util/helpers.py:74-115
- smooth_spikes / interp <- util/helpers.py:65-71, 259-265
- normalize              <- util/helpers.py:249-256

``fit_trend`` delegates to filters from the public `seasonal` package
(github.com/welch/seasonal, MIT); those are re-implemented here from their
documented behavior (windowed mean/median + line-straightened ends, LSQ
cubic-spline fit).  The reference's golden tests allow ±5% on expected
values, which these reconstructions target; anomaly flags do not depend on
them on the dynamic-threshold path (trend only feeds expected values).
"""

from __future__ import annotations

import bisect

import numpy as np

_f32 = np.float32


def normalize(values: np.ndarray, min_max: bool = False):
    """(v - min) / (max - min), identity when constant; helpers.py:249-256."""
    values = np.asarray(values, dtype=float)
    min_val = values.min()
    max_val = values.max()
    out = values
    if min_val != max_val:
        out = (values - min_val) / (max_val - min_val)
    if min_max:
        return out, min_val, max_val
    return out


def interp(values: np.ndarray) -> np.ndarray:
    """Linear interpolation of NaNs, flat extrapolation; helpers.py:65-71."""
    value_array = np.array(values, dtype=float)
    nans = np.isnan(value_array)
    nans_index = nans.nonzero()[0]
    non_nans_index = (~nans).nonzero()[0]
    value_array[nans_index] = np.interp(nans_index, non_nans_index, value_array[non_nans_index])
    return value_array


def smooth_spikes(data: np.ndarray) -> np.ndarray:
    """NaN out |z| >= 3 spikes and interpolate; helpers.py:259-265.

    The reference uses pandas Series.std() (ddof=1); replicated here.
    """
    data = np.asarray(data, dtype=float)
    n = len(data)
    std = (np.std(data, ddof=1) if n > 1 else 0.0) + 1e-8
    mean = data.mean()
    if std == 0:
        anomaly_index = np.array([], dtype=int)
    else:
        anomaly_index = np.where(np.abs(data - mean) / std >= 3)[0]
    series = data.copy()
    series[anomaly_index] = np.nan
    return interp(series)


def median_filter(data: np.ndarray, window: int, need_two_end: bool = False) -> np.ndarray:
    """Sliding median with float32 arithmetic; port of .pyx:231-278.

    Ends keep the raw values unless ``need_two_end`` (shrinking tail
    windows), exactly like the Cython kernel.
    """
    data = np.asarray(data, dtype=float)
    w_len = window // 2 * 2 + 1
    t_len = len(data)
    # float(_f32(x)) per element == one vectorized f32 round-trip
    arr = np.asarray(data, dtype=_f32).astype(float)
    ans = arr.copy()
    if t_len < w_len:
        return ans
    half = w_len // 2

    def sorted_median(s: np.ndarray) -> float:
        # median of an ALREADY SORTED array; same element pick / f32
        # averaging formula as the incremental sorted-window loop this
        # replaced (bit-exact: tools/kernel_ab.py)
        n = len(s)
        if n % 2 == 1:
            return float(s[n // 2])
        return float(_f32((_f32(s[n // 2 - 1]) + _f32(s[n // 2])) / _f32(2.0)))

    # full windows are always odd (w_len = 2*half+1): the median is the
    # exact middle element of each sorted window.  For narrow windows one
    # C-side sort over the strided window view beats the Python bisect loop
    # ~3-10x; for wide windows the O(n*w log w) full re-sorts lose to the
    # O(n*(log w + w_memmove)) incremental sorted window (measured crossover
    # ~w=100-150 at n=2000..8640), so wide windows keep the loop.
    if w_len <= 99:
        sw = np.lib.stride_tricks.sliding_window_view(arr, w_len)
        ans[half:t_len - half] = np.sort(sw, axis=1)[:, half]
    else:
        val = arr.tolist()
        cur = sorted(val[:w_len])
        ans[half] = cur[half]
        for i in range(half + 1, t_len - half):
            cur.pop(bisect.bisect_right(cur, val[i - half - 1]) - 1)
            bisect.insort_right(cur, val[i + half])
            ans[i] = cur[half]
    if need_two_end:
        for i in range(half):  # growing head windows arr[0 : i+half+1]
            ans[i] = sorted_median(np.sort(arr[: i + half + 1]))
        for i in range(t_len - half, t_len):  # shrinking tail windows
            ans[i] = sorted_median(np.sort(arr[i - half:]))
    return ans


def mean_filter(data: np.ndarray, window: int) -> np.ndarray:
    """Centered windowed mean, shrinking windows at the ends."""
    data = np.asarray(data, dtype=float)
    n = len(data)
    half = window // 2
    c = np.cumsum(np.concatenate(([0.0], data)))
    lo = np.maximum(np.arange(n) - half, 0)
    hi = np.minimum(np.arange(n) + half + 1, n)
    return (c[hi] - c[lo]) / (hi - lo)


def _fit_line(x: np.ndarray, y: np.ndarray) -> tuple[float, float]:
    """Least-squares line (slope, intercept); helpers.py:24-34 equivalent."""
    n = len(x)
    sum_x, sum_y = x.sum(), y.sum()
    sum_xx = (x * x).sum()
    sum_xy = (x * y).sum()
    denom = n * sum_xx - sum_x * sum_x
    if denom == 0:
        return 0.0, float(np.mean(y))
    a = (n * sum_xy - sum_x * sum_y) / denom
    b = (sum_xx * sum_y - sum_x * sum_xy) / denom
    return a, b


_triu_cache: dict = {}
_basis_cache: dict = {}


def _theil_sen_slope(values: np.ndarray) -> float:
    """Median of all pairwise slopes (Theil-Sen estimator).

    Vectorized over the n*(n-1)/2 pairs in one shot: each slope is the same
    (values[j]-values[i])/(j-i) float64 division as the per-i loop form, and
    np.median is order-invariant over the identical multiset, so the result
    is bit-exact vs the loop (tools/kernel_ab.py compare)."""
    n = len(values)
    pairs = _triu_cache.get(n)
    if pairs is None:
        pairs = np.triu_indices(n, k=1)
        # bound the cache by BYTES, not just entries: a single n=8640 entry
        # is two int64 arrays of n(n-1)/2 = 37M elements (~600 MB) pinned in
        # every executor Python worker forever.  Cache only small windows
        # (<= ~8 MB per entry, n <= ~1024); large ones stay transient.
        if pairs[0].nbytes <= 4 << 20:
            if len(_triu_cache) > 64:  # windows are few distinct sizes
                _triu_cache.clear()
            _triu_cache[n] = pairs
    i, j = pairs
    slopes = (values[j] - values[i]) / (j - i)
    return float(np.median(slopes))


def aglet(src: np.ndarray, window: int) -> np.ndarray:
    """Straighten the half-window ends of a filtered sequence.

    Each end's window/2 samples are replaced by a line through the first
    (resp. last) retained sample with the Theil-Sen median slope of the
    adjacent full window — behavior identified against the reference's
    golden expected values (seasonal.trend.aglet equivalent)."""
    dst = np.array(src, dtype=float)
    n = len(dst)
    half = window // 2
    if n < window or half == 0:
        return dst
    left_slope = _theil_sen_slope(dst[:window])
    for i in range(half):
        dst[i] = dst[half] + left_slope * (i - half)
    right_slope = _theil_sen_slope(np.array(src, dtype=float)[n - window :])
    anchor = n - 1 - half
    for i in range(n - half, n):
        dst[i] = dst[anchor] + right_slope * (i - anchor)
    return dst


def line_filter(data: np.ndarray, window: int) -> np.ndarray:
    """Straight least-squares line through the series."""
    data = np.asarray(data, dtype=float)
    x = np.arange(len(data), dtype=float)
    a, b = _fit_line(x, data)
    return a * x + b


def _bspline_basis(x: np.ndarray, knots: np.ndarray, degree: int = 3) -> np.ndarray:
    """Cox-de Boor cubic B-spline basis matrix over [x0, xn] with interior
    ``knots`` (clamped ends)."""
    t = np.concatenate(
        [np.full(degree + 1, x[0]), knots, np.full(degree + 1, x[-1])]
    )
    n_basis = len(t) - degree - 1
    basis = np.zeros((len(x), n_basis))
    # degree 0
    B = np.zeros((len(x), len(t) - 1))
    for j in range(len(t) - 1):
        B[:, j] = np.where((x >= t[j]) & (x < t[j + 1]), 1.0, 0.0)
    B[x >= t[-1], len(t) - degree - 2] = 1.0  # close right end
    for d in range(1, degree + 1):
        B_new = np.zeros((len(x), len(t) - 1 - d))
        for j in range(len(t) - 1 - d):
            left_den = t[j + d] - t[j]
            right_den = t[j + d + 1] - t[j + 1]
            left = (x - t[j]) / left_den * B[:, j] if left_den > 0 else 0.0
            right = (t[j + d + 1] - x) / right_den * B[:, j + 1] if right_den > 0 else 0.0
            B_new[:, j] = left + right
        B = B_new
    basis[:, : B.shape[1]] = B
    return basis[:, :n_basis]


def spline_filter(data: np.ndarray, nsegs: int) -> np.ndarray:
    """LSQ cubic-spline fit (scipy LSQUnivariateSpline equivalent) with
    ``nknots = max(2, nsegs + 1)`` equispaced interior knots,
    ``linspace(0, n-1, nknots+2)[1:-1]`` — knot policy identified against the
    reference's golden expected values (seasonal.trend.spline_filter)."""
    data = np.asarray(data, dtype=float)
    n = len(data)
    nknots = max(2, int(nsegs) + 1)
    # the basis is a pure function of (n, nknots) and production series
    # lengths cluster tightly (hourly drift series ~357 points), so cache
    # the matrix across calls; lstsq still sees the bit-identical basis
    basis = _basis_cache.get((n, nknots))
    if basis is None:
        if len(_basis_cache) > 64:
            _basis_cache.clear()
        x = np.arange(n, dtype=float)
        interior = np.linspace(0, n - 1, nknots + 2)[1:-1]
        basis = _bspline_basis(x, interior)
        _basis_cache[(n, nknots)] = basis
    coef, *_ = np.linalg.lstsq(basis, data, rcond=None)
    return basis @ coef


def fit_trend(data: np.ndarray, kind: str = "spline", period: int | None = None,
              ptimes: int = 2) -> np.ndarray:
    """Port of helpers.py:81-101."""
    data = np.asarray(data, dtype=float)
    if kind is None:
        return np.zeros(len(data)) + np.mean(data)
    if period is None:
        period = guess_trended_period(data)
    if period <= 1:
        window = min(len(data) // 3, 512)
    else:
        window = (int(period * ptimes) // 2) * 2 - 1  # odd window
    if kind == "median":
        filtered = aglet(median_filter(data, window), window)
    elif kind == "mean":
        filtered = aglet(mean_filter(data, window), window)
    elif kind == "line":
        filtered = line_filter(data, window)
    elif kind == "spline":
        n_segments = len(data) // (window * 2) + 1
        filtered = aglet(spline_filter(data, n_segments), window)
    else:
        raise ValueError(f"adjust_trend: unknown filter type {kind}")
    return filtered


def guess_trended_period(data: np.ndarray) -> int:
    """Port of helpers.py:104-115."""
    from anomaly_detector_spark.kernels.period import periodogram_peaks

    max_period = min(len(data) // 3, 512)
    broad = fit_trend(data, kind="median", period=max_period)
    if np.any(~np.isfinite(broad)):
        raise ValueError("ValueOverflow")
    peaks = periodogram_peaks(data - broad)
    if peaks is None:
        return max_period
    periods, scores, _, _ = zip(*peaks)
    return int(round(np.average(periods, weights=scores)))


def trend_detection(series, trend_type: str = "spline", period: int | None = None) -> np.ndarray:
    """Port of helpers.py:74-78."""
    series = np.asarray(series, dtype=float)
    if len(series) < 6:
        return np.full(len(series), np.mean(series))
    return fit_trend(series, kind=trend_type, period=period)
