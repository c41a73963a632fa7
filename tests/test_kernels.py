"""Kernel unit tests: SR, ESD, STL, fill-up, margins, special functions."""

import numpy as np
import pytest

from anomaly_detector_spark.kernels import esd, fillup, margins, special, sr, stl, trend


def test_average_filter_basic():
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    out = sr.average_filter(vals, n=3)
    assert np.allclose(out, [1.0, 1.5, 2.0, 3.0, 4.0])


def test_sr_transform_matches_log_free_form():
    rng = np.random.RandomState(0)
    vals = rng.rand(64) * 10 + 1
    mag = sr.spectral_residual_transform(vals)
    assert mag.shape == (64,)
    assert np.all(np.isfinite(mag))


def test_sr_detects_planted_spike():
    vals = np.sin(np.arange(200) / 5.0) + 1.5
    vals[150] += 20
    res, model_id = sr.sr_detection(vals, threshold=3.5, max_anomaly_ratio=0.25)
    assert model_id == "SpectralResidual"
    assert res["is_anomaly"][150]
    assert res["is_anomaly"].sum() <= 50


def test_esd_critical_values_monotone():
    crit = esd.get_critical(0.05, 500, 10)
    assert all(crit[i] >= crit[i + 1] for i in range(9))


def test_esd_flags_outliers():
    rng = np.random.RandomState(1)
    vals = rng.normal(0, 1, 300)
    vals[10] = 30.0
    vals[20] = -25.0
    s = np.sort(vals)
    order = np.argsort(vals, kind="quicksort")
    det = esd.ESD(esd._SortedSeries(s, order), max_outliers=30, majority_value=None, alpha=0.05)
    upper = det.detect(upper_tail=True)
    lower = det.detect(upper_tail=False)
    assert 10 in upper
    assert 20 in lower


def test_student_t_ppf_known_values():
    # classic table values
    assert abs(special.student_t_ppf(0.975, 10) - 2.2281) < 1e-3
    assert abs(special.student_t_ppf(0.95, 1) - 6.3138) < 1e-3
    assert abs(special.student_t_ppf(0.5, 7)) < 1e-12


def test_stl_reconstructs_sine():
    n, p = 240, 12
    y = np.sin(2 * np.pi * np.arange(n) / p) + 0.01 * np.arange(n)
    d = stl.stl_decompose(y, p)
    assert np.abs(d["remainder"]).max() < 0.05
    # trend tracks the linear drift mid-series
    mid = slice(p, n - p)
    assert np.corrcoef(d["trend"][mid], 0.01 * np.arange(n)[mid])[0, 1] > 0.99


def test_fillup_linear_and_last():
    f = fillup.FillUp([0, 1, 4, 5], [0.0, 1.0, 4.0, 5.0])
    assert f.need_fill_up
    vals, tags = f.fill("linear")
    assert np.allclose(vals, [0, 1, 2, 3, 4, 5])
    vals, tags = f.fill("last")
    assert vals == [0.0, 1.0, 1.0, 1.0, 4.0, 5.0]
    assert tags == [False, False, True, True, False, False]


def test_cubic_spline_interpolates_exactly_on_cubic():
    x = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    y = x**3 - 2 * x
    xq = np.linspace(0, 4, 17)
    out = fillup.cubic_spline_interp(x, y, xq)
    assert np.allclose(out, xq**3 - 2 * xq, atol=1e-9)


def test_margin_factors_match_formula_ends():
    assert margins.FACTORS[0] == 532.0
    assert margins.FACTORS[100] == 0.0
    assert len(margins.FACTORS) == 101


def test_median_filter_matches_numpy_center():
    rng = np.random.RandomState(2)
    vals = rng.rand(50)
    out = trend.median_filter(vals, 5)
    for i in range(2, 48):
        expect = np.median(np.float32(vals[i - 2 : i + 3]))
        assert abs(out[i] - expect) < 1e-6


def test_detect_series_non_seasonal_smoke():
    from anomaly_detector_spark.kernels.detect import detect_series

    vals = list(np.sin(np.arange(100) / 3.0))
    vals[50] = 10.0
    results, period, sp, model_id, fill = detect_series(vals, list(range(100)))
    assert len(results["value"]) == 100
    assert results["is_anomaly"][50]


# --- remove_anomaly_in_bucket parity vs the reference's per-phase loop ------


def _naive_remove_anomaly(values, period):
    """Literal per-phase loop form of the reference (.pyx:339-350): f32
    medians, f32 MAD deviations, f64 spike test, in-place replacement."""
    from anomaly_detector_spark.kernels.period import fast_median_f32

    values = np.array(values, dtype=float)
    for i in range(period):
        sub = values[i::period]
        med = fast_median_f32(sub)
        mad = 1.4826 * fast_median_f32((sub - med).astype(np.float32)) + 1e-8
        spike = np.where((sub - med) / mad >= 3.0)[0]
        for k in spike:
            values[k * period + i] = med
    return values


def test_remove_anomaly_in_bucket_matches_loop_finite():
    from anomaly_detector_spark.kernels.period import remove_anomaly_in_bucket

    rng = np.random.RandomState(7)
    for n, period in [(100, 7), (96, 12), (13, 13), (50, 24)]:
        vals = rng.rand(n) * 10
        vals[rng.randint(0, n, 3)] += 100.0  # planted spikes
        got = remove_anomaly_in_bucket(vals.copy(), period)
        want = _naive_remove_anomaly(vals.copy(), period)
        assert np.array_equal(got, want), (n, period)


def test_remove_anomaly_in_bucket_matches_loop_nan_inf():
    """NaN values are kept (NaN comparisons are False in the loop), +inf is a
    spike and gets the phase median, -inf is kept — the NaN-padded vectorized
    form must reproduce all three, which +inf padding could not (inf pads
    sort BEFORE real NaNs and shift the median index)."""
    from anomaly_detector_spark.kernels.period import remove_anomaly_in_bucket

    rng = np.random.RandomState(11)
    vals = rng.rand(60) * 10
    vals[[3, 17, 41]] = np.nan
    vals[8] = np.inf
    vals[25] = -np.inf
    for period in [5, 7, 12]:
        got = remove_anomaly_in_bucket(vals.copy(), period)
        want = _naive_remove_anomaly(vals.copy(), period)
        assert np.array_equal(got, want, equal_nan=True), period
    # a +inf spike in a phase with positive MAD is replaced by the phase
    # median, exactly as the loop does (the old isinf mask suppressed this)
    ramp = np.arange(24, dtype=float)
    ramp[5] = np.inf
    got = remove_anomaly_in_bucket(ramp.copy(), 4)
    want = _naive_remove_anomaly(ramp.copy(), 4)
    assert np.array_equal(got, want)
    assert not np.isinf(got[5])


def test_remove_anomaly_in_bucket_rejects_period_beyond_length():
    from anomaly_detector_spark.kernels.period import remove_anomaly_in_bucket

    with pytest.raises(ValueError):
        remove_anomaly_in_bucket(np.arange(5.0), 8)


def test_theil_sen_triu_cache_skips_large_windows():
    """The pair-index cache is byte-bounded: a large window's index arrays
    (O(n^2) int64) must not be pinned in every executor worker forever."""
    from anomaly_detector_spark.kernels.trend import _theil_sen_slope, _triu_cache

    _theil_sen_slope(np.arange(2000.0))  # ~16 MB of pair indices
    assert 2000 not in _triu_cache
    _theil_sen_slope(np.arange(64.0))
    assert 64 in _triu_cache


def test_esd_tail_fast_matches_seq():
    """The batched full-scan tail loop (r7: vectorized medians/deviations/
    threshold checks, lazy merged-median probes) must return exactly the
    sequential reference form's indices on every series shape — ties, zero
    blocks, heavy tails, near-constant data, both tails, ESD-style varying
    and DT-style constant thresholds."""
    rng = np.random.default_rng(424242)
    for trial in range(400):
        n = int(rng.integers(12, 700))
        kind = trial % 5
        vals = rng.normal(0, 1, n)
        if kind == 1:
            vals = np.round(vals * 2) / 2
        elif kind == 2:
            vals = np.concatenate([np.zeros(n // 2), rng.normal(5, 3, n - n // 2)])
        elif kind == 3:
            vals = rng.standard_cauchy(n)
        elif kind == 4:
            vals = np.full(n, 3.0) + (rng.random(n) < 0.1) * rng.normal(0, 4, n)
        vals = np.sort(vals).astype(np.float32)
        idx = rng.permutation(n)
        mo = int(rng.integers(1, max(2, n // 2)))
        if trial % 3 == 0:
            thr = [float(rng.uniform(1.5, 4.0))] * mo
        else:
            thr = list(rng.uniform(1.5, 4.0, mo))
        upper = bool(rng.integers(0, 2))
        fast = esd._tail_test_full(vals, idx, mo, thr, upper)
        seq = esd._tail_test_loop_seq(vals, idx, mo, thr, upper, -1)
        assert list(fast) == list(seq), (n, mo, upper, kind)


def test_esd_tail_fast_edge_shapes():
    """Degenerate inputs: max_outliers clamped past n, zero effective k
    range, all-identical values, NaN deviations."""
    idx = np.arange(6)
    flat = np.zeros(6, dtype=np.float32)
    assert esd._tail_test_full(flat, idx, 10, [3.0] * 10, True) == \
        esd._tail_test_loop_seq(flat, idx, 10, [3.0] * 10, True, -1)
    two = np.array([1.0, 2.0], dtype=np.float32)
    assert esd._tail_test_full(two, np.arange(2), 5, [3.0] * 5, False) == \
        esd._tail_test_loop_seq(two, np.arange(2), 5, [3.0] * 5, False, -1)
    withnan = np.array([0.0, 1.0, 2.0, np.nan, np.nan, 100.0], dtype=np.float32)
    assert esd._tail_test_full(withnan, idx, 3, [2.0] * 3, True) == \
        esd._tail_test_loop_seq(withnan, idx, 3, [2.0] * 3, True, -1)


def test_smooth_plan_matches_est_batch():
    """The cached-geometry smooth (r7: _smooth_plan reuses the anchor list,
    gather indices and tricube weights across calls; for userw=False the
    fully normalized + degree-adjusted weight matrix) must equal a direct
    _est_batch evaluation bit-for-bit on every geometry — both userw
    branches, both degrees, jump and no-jump anchor grids."""
    rng = np.random.default_rng(77)
    stl._SMOOTH_PLANS.clear()
    for trial in range(200):
        n = int(rng.integers(8, 400))
        length = int(rng.integers(3, max(4, n - 1)) | 1)  # odd, < n
        if length >= n:
            length = n - 1 if (n - 1) % 2 else n - 2
        if length < 3:
            continue
        ideg = int(rng.integers(0, 2))
        njump = int(rng.integers(1, max(2, length // 2)))
        userw = bool(rng.integers(0, 2))
        y = rng.normal(0, 10, n)
        rw = rng.random(n) if userw else np.ones(n)
        got = stl._smooth(y, length, ideg, njump, userw, rw)
        # reference: the retained _est_batch on the same anchor grid, plus
        # _smooth's own interpolation/tail logic via a cache-bypassing call
        newnj = min(njump, n - 1)
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
        direct = stl._est_batch(y, length, ideg, i_list.astype(float),
                                nleft_list.astype(int), userw, rw)
        assert np.array_equal(got[i_list - 1], direct), (n, length, ideg, njump, userw)
        # the cached tail anchor (k != n) must equal a direct scalar _est
        k = ((n - 1) // newnj) * newnj + 1
        if newnj != 1 and k != n:
            v = stl._est(y, length, ideg, float(n), n - length + 1, n, userw, rw)
            want = y[n - 1] if v is None else v
            assert got[n - 1] == want, (n, length, ideg, njump, userw)


def test_ss_plan_matches_uncached_geometry():
    """_ss_plan's cached tricube/normalized weights must equal the inline
    computation for every (m, ns) it will see (including ns > m widening)."""
    for m in range(2, 40):
        for ns_mult in (1, 3, 10):
            ns = 10 * (m * ns_mult) + 1
            stl._SS_PLANS.clear()
            w0, w0n, ok0, interp = stl._ss_plan(m, ns)
            xs = np.array([1.0, float(m), 0.0, float(m + 1)])
            h = np.maximum(xs - 1.0, float(m) - xs)
            if ns > m:
                h = h + (ns - m) / 2.0
            J = np.arange(1, m + 1, dtype=float)
            rmat = np.abs(J[None, :] - xs[:, None])
            with np.errstate(divide="ignore", invalid="ignore"):
                ref = np.where(rmat <= 0.999 * h[:, None],
                               (1.0 - (rmat / h[:, None]) ** 3) ** 3, 0.0)
            ref[rmat <= 0.001 * h[:, None]] = 1.0
            assert np.array_equal(w0, ref)
            a = ref.sum(axis=1)
            assert np.array_equal(ok0, a > 0)
            assert np.array_equal(w0n, ref / np.where(a > 0, a, 1.0)[:, None])
            if m > 2:
                assert np.array_equal(interp, np.arange(1, m - 1))


def test_smooth_plan_cache_is_byte_bounded():
    """An oversized geometry (long series, newnj=1) must not be pinned in
    every executor worker forever; small geometries stay cached."""
    stl._SMOOTH_PLANS.clear()
    y = np.arange(9000.0)
    rw = np.ones(9000)
    stl._smooth(y, 37, 1, 1, False, rw)  # ~9000x37 matrices > per-plan cap
    assert (9000, 37, 1, 1, False) not in stl._SMOOTH_PLANS
    small = np.arange(300.0)
    stl._smooth(small, 25, 1, 3, False, np.ones(300))
    assert (300, 25, 1, 3, False) in stl._SMOOTH_PLANS
