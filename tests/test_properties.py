"""Property-based tests (hypothesis) over the numpy kernels, plus seeded
random batteries comparing the Spark MVAD ops against their pandas reference
transcriptions on inputs the hand-written fixtures don't cover.

Kernel properties run without Spark (fast, many examples); Spark ops use a
small deterministic seed battery (Spark round-trips are too slow for
per-example generation).
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from anomaly_detector_spark.kernels import esd, fillup, hbos, sr, stl
from anomaly_detector_spark.kernels.detect import detect_request

finite_floats = st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False, width=64)


# --- request-level totality ---------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(st.lists(finite_floats, min_size=12, max_size=120))
def test_detect_request_total_and_well_formed(values):
    """Any valid finite series must produce a structurally sound response:
    no crash, aligned lengths, boolean flags, anomalies within the ratio cap,
    finite expected values."""
    resp = detect_request({"series": [{"value": v} for v in values],
                           "granularity": "none"})
    n = len(values)
    assert len(resp["expectedValues"]) == n
    assert len(resp["isAnomaly"]) == n
    assert all(isinstance(b, bool) for b in resp["isAnomaly"])
    assert all(np.isfinite(ev) for ev in resp["expectedValues"])
    assert all(u >= 0 for u in resp["upperMargins"])
    assert all(l >= 0 for l in resp["lowerMargins"])
    # positive/negative partition the anomaly set
    for a, p, q in zip(resp["isAnomaly"], resp["isPositiveAnomaly"], resp["isNegativeAnomaly"]):
        assert a == (p or q)
        assert not (p and q)


@settings(max_examples=25, deadline=None)
@given(st.lists(finite_floats, min_size=24, max_size=96),
       st.sampled_from(["hbos", "spectral_residual", "dynamic_threshold"]))
def test_explicit_detectors_total(values, name):
    params = {"period": 0, "threshold": 0.9 if name == "hbos" else 3.5,
              "outlierFraction": 0.1, "alpha": 0.05, "maxAnomalyRatio": 0.25}
    resp = detect_request({"series": [{"value": v} for v in values],
                           "granularity": "none",
                           "detector": {"name": name, "parameters": params}})
    assert len(resp["isAnomaly"]) == len(values)
    assert all(isinstance(b, bool) for b in resp["isAnomaly"])


# --- kernel invariants ----------------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(st.lists(finite_floats, min_size=24, max_size=240),
       st.integers(min_value=2, max_value=24))
def test_stl_reconstruction_identity(values, period):
    """STL decomposition must reconstruct the series exactly:
    trend + seasonal + remainder == input."""
    arr = np.asarray(values)
    if len(arr) < 2 * period + 1:
        return
    dec = stl.stl(arr, np_period=period)
    recon = np.asarray(dec["trend"]) + np.asarray(dec["seasonal"]) + np.asarray(dec["remainder"])
    assert np.allclose(recon, arr, atol=1e-6, rtol=1e-6)


@settings(max_examples=50, deadline=None)
@given(st.lists(finite_floats, min_size=12, max_size=300))
def test_sr_scores_finite_and_bounded_flags(values):
    arr = np.asarray(values)
    res, model_id = sr.sr_detection(arr, threshold=3.5, max_anomaly_ratio=0.25)
    assert model_id == "SpectralResidual"
    assert np.all(np.isfinite(res["score"]))
    assert res["is_anomaly"].sum() <= max(int(len(arr) * 0.25), 1)


@settings(max_examples=50, deadline=None)
@given(st.lists(finite_floats, min_size=12, max_size=200))
def test_hbos_scores_in_unit_interval(values):
    scores = hbos.hbos_scores(np.asarray(values))
    assert np.all(scores >= 0) and np.all(scores <= 1)


@settings(max_examples=40, deadline=None)
@given(st.lists(finite_floats, min_size=20, max_size=200), st.data())
def test_fillup_preserves_observed_points(values, data):
    """fill_up_on_demand must return the full grid with every observed value
    unchanged and filled_tags marking exactly the gap positions."""
    n = len(values)
    # random strictly-increasing integer grid starting at 0 with gaps
    steps = data.draw(st.lists(st.integers(min_value=1, max_value=3),
                               min_size=n - 1, max_size=n - 1))
    indices = [0]
    for s in steps:
        indices.append(indices[-1] + s)
    fu = fillup.FillUp(indices, list(values))
    for mode in ("previous", "linear"):
        filled, tags = fillup.fill_up_on_demand(fu, mode)
        if filled is None:
            assert not fu.need_fill_up
            continue
        assert len(filled) == indices[-1] + 1
        assert len(tags) == len(filled)
        for idx, v in zip(indices, values):
            assert filled[idx] == pytest.approx(v)
            assert not tags[idx]
        assert sum(tags) == len(filled) - n


@settings(max_examples=50, deadline=None)
@given(st.lists(finite_floats, min_size=30, max_size=300), st.integers(2, 40))
def test_esd_flags_at_most_max_outliers_per_tail(values, max_outliers):
    arr = np.asarray(values)
    order = np.argsort(arr, kind="quicksort")
    s = esd._SortedSeries(arr[order], order)
    det = esd.ESD(s, max_outliers=max_outliers, majority_value=None, alpha=0.05)
    for tail in (True, False):
        hits = det.detect(upper_tail=tail)
        assert len(hits) <= max_outliers
        assert all(0 <= int(h) < len(arr) for h in hits)


# --- Spark MVAD ops: seeded random battery vs pandas transcriptions --------------


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_fill_na_random_battery(spark, seed):
    rng = np.random.RandomState(seed)
    n = 60
    v = rng.normal(0, 10, n)
    mask = rng.rand(n) < 0.3
    v[mask] = np.nan
    if mask.all():
        v[0] = 1.0
    pdf = pd.DataFrame({"t": range(n), "v": v})
    from anomaly_detector_spark.operators import mvad

    for method, pd_fn in [
        ("Linear", lambda s: s.interpolate(method="linear", limit_direction="both", limit=len(s))),
        ("Previous", lambda s: s.ffill(limit=len(s)).bfill(limit=len(s))),
        ("Subsequent", lambda s: s.bfill(limit=len(s)).ffill(limit=len(s))),
    ]:
        got = {r["t"]: r["v"] for r in
               mvad.fill_na(spark.createDataFrame(pdf), ["v"], order_col="t",
                            method=method).collect()}
        exp = pd_fn(pdf["v"]).fillna(0).tolist()
        for i in range(n):
            assert got[i] == pytest.approx(exp[i]), (method, seed, i)


@pytest.mark.parametrize("seed", [5, 17])
def test_rolling_threshold_random_battery(spark, seed):
    rng = np.random.RandomState(seed)
    scores = np.abs(rng.normal(0.2, 0.1, 90))
    tw = int(rng.randint(5, 30))
    result_n = len(scores)
    thresholds = []
    for i in range(result_n - 1, tw - 2, -1):
        w = np.sort(scores[max(0, result_n - tw - i): result_n - i])
        thresholds.append(w[int(len(w) * 0.95)])
    from anomaly_detector_spark.operators import mvad

    pdf = pd.DataFrame({"t": range(result_n), "score": scores})
    out = mvad.rolling_quantile_threshold(
        spark.createDataFrame(pdf), "score", "t", threshold_window=tw
    ).orderBy("t").collect()
    assert len(out) == len(thresholds)
    for k, r in enumerate(out):
        assert r["threshold"] == pytest.approx(thresholds[k]), (seed, tw, k)
