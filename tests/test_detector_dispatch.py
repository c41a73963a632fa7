"""Explicit-detector dispatch (detect_model.py:156-250) + HBOS fixtures.

No golden-corpus case exercises the no-model-selection path, so these are
hand-built fixtures mirroring the reference semantics:
- hbos_detection.py:76-115 (non-seasonal: histogram scores over raw values,
  expected = trend) and :13-73 (seasonal: scores over normalized STL residual)
- detect_model.py:158-168 (period defaulting/override), :186-192 / :225-231
  (seasonal_series requires period > 0, dynamic_threshold requires period == 0)
- univariate_anomaly_detection.py:213-237 (request-level detector validation)
"""

import numpy as np
import pytest

from anomaly_detector_spark.kernels import detect, hbos, sr


def _idx(values):
    return list(range(len(values)))


# --- HBOS scoring semantics (pyod HBOS documented formula) --------------------


def test_hbos_scores_isolates_single_outlier():
    # 23 points in bin 0, one in bin 9: minmax of -log2(density + 0.1)
    # puts the outlier at exactly 1.0 and the majority at exactly 0.0.
    x = np.array([1.0] * 23 + [100.0])
    scores = hbos.hbos_scores(x)
    assert scores[-1] == pytest.approx(1.0)
    assert np.all(scores[:-1] == 0.0)


def test_hbos_scores_constant_series_is_zero():
    assert np.all(hbos.hbos_scores(np.full(24, 7.0)) == 0.0)


# --- non-seasonal HBOS through the dispatch ------------------------------------


def test_detect_series_hbos_nonseasonal():
    values = [1.0] * 23 + [100.0]
    results, period, _sp, model_id, do_fill_up = detect.detect_series(
        values, _idx(values),
        detector={"name": "hbos",
                  "parameters": {"period": 0, "threshold": 0.9, "outlierFraction": 0.1}},
    )
    assert model_id == "HbosNonseasonal"
    assert period == 0 and not do_fill_up
    assert bool(results["is_anomaly"][-1])
    assert results["is_anomaly"][:-1].sum() == 0
    # direction: 100 >> expected trend -> positive anomaly
    assert bool(results["is_positive_anomaly"][-1])
    assert results["score"][-1] == pytest.approx(1.0)


def test_detect_series_hbos_seasonal_flags_planted_spike():
    n, p = 72, 12
    values = (10 + 3 * np.sin(2 * np.pi * np.arange(n) / p)).tolist()
    values[40] += 25.0
    results, period, _sp, model_id, _f = detect.detect_series(
        values, _idx(values),
        detector={"name": "hbos",
                  "parameters": {"period": p, "threshold": 0.9, "outlierFraction": 0.1}},
    )
    assert model_id == "HbosSeasonal"
    assert period == p
    assert bool(results["is_anomaly"][40])
    assert results["is_anomaly"].sum() <= 3
    assert bool(results["is_positive_anomaly"][40])


def test_detect_series_hbos_parameter_period_overrides_argument():
    values = [1.0] * 23 + [100.0]
    _r, period, _sp, model_id, _f = detect.detect_series(
        values, _idx(values), period=5,
        detector={"name": "hbos",
                  "parameters": {"period": 0, "threshold": 0.9, "outlierFraction": 0.1}},
    )
    # parameters.period wins over the call-level period (detect_model.py:163-165)
    assert period == 0 and model_id == "HbosNonseasonal"


# --- other explicit detectors ---------------------------------------------------


def test_detect_series_explicit_spectral_residual_matches_kernel():
    vals = (np.sin(np.arange(200) / 5.0) + 1.5)
    vals[150] += 20
    values = vals.tolist()
    results, period, _sp, model_id, _f = detect.detect_series(
        values, _idx(values),
        detector={"name": "spectral_residual",
                  "parameters": {"period": 0, "threshold": 3.5, "maxAnomalyRatio": 0.25}},
    )
    assert model_id == "SpectralResidual"
    direct, _ = sr.sr_detection(np.array(values), threshold=3.5, max_anomaly_ratio=0.25)
    # same flags modulo the shared EPS refinement (detect_model.py:356-361)
    refine = np.abs(direct["value"] - direct["expected_value"]) < detect.EPS
    expect_anom = np.array(direct["is_anomaly"], dtype=bool)
    expect_anom[refine] = False
    assert np.array_equal(results["is_anomaly"], expect_anom)


def test_detect_series_explicit_dynamic_threshold():
    rng = np.random.RandomState(3)
    values = (rng.normal(10, 0.5, 100)).tolist()
    values[30] = 40.0
    results, _p, _sp, model_id, _f = detect.detect_series(
        values, _idx(values),
        detector={"name": "dynamic_threshold",
                  "parameters": {"period": 0, "alpha": 0.05, "maxAnomalyRatio": 0.25}},
    )
    assert model_id in ("DynamicThreshold", "DynamicThresholdMad")
    assert bool(results["is_anomaly"][30])


def test_detect_series_explicit_seasonal_series():
    n, p = 96, 12
    values = (10 + 3 * np.sin(2 * np.pi * np.arange(n) / p)).tolist()
    values[50] -= 20.0
    results, period, _sp, model_id, _f = detect.detect_series(
        values, _idx(values),
        detector={"name": "seasonal_series",
                  "parameters": {"period": p, "alpha": 0.05, "maxAnomalyRatio": 0.25}},
    )
    assert model_id in ("AnomalyDetector", "AnomalyDetectorMad")
    assert period == p
    assert bool(results["is_anomaly"][50])
    assert bool(results["is_negative_anomaly"][50])


# --- error parity ----------------------------------------------------------------


def test_dynamic_threshold_rejects_nonzero_period():
    values = list(np.sin(np.arange(48) / 3.0) + 2)
    with pytest.raises(ValueError, match="InvalidDetector"):
        detect.detect_series(
            values, _idx(values),
            detector={"name": "dynamic_threshold",
                      "parameters": {"period": 12, "alpha": 0.05, "maxAnomalyRatio": 0.25}},
        )


def test_seasonal_series_rejects_zero_period():
    values = list(np.sin(np.arange(48) / 3.0) + 2)
    with pytest.raises(ValueError, match="InvalidDetector"):
        detect.detect_series(
            values, _idx(values),
            detector={"name": "seasonal_series",
                      "parameters": {"period": 0, "alpha": 0.05, "maxAnomalyRatio": 0.25}},
        )


def test_missing_period_everywhere_raises():
    values = [float(i % 7) for i in range(48)]
    with pytest.raises(ValueError, match="InvalidDetector"):
        detect.detect_series(
            values, _idx(values),
            detector={"name": "spectral_residual",
                      "parameters": {"threshold": 3.5, "maxAnomalyRatio": 0.25}},
        )


def test_unknown_detector_name_raises():
    values = [float(i % 7) for i in range(48)]
    with pytest.raises(ValueError, match="InvalidDetector"):
        detect.detect_series(
            values, _idx(values),
            detector={"name": "isolation_forest", "parameters": {"period": 0}},
        )


def test_incomplete_detector_dict_falls_back_to_selection():
    # detector without 'parameters' triggers model selection
    # (detect_model.py:145-153), not a crash.
    values = (np.sin(np.arange(60) / 4.0) + 2).tolist()
    _r, _p, _sp, model_id, _f = detect.detect_series(
        values, _idx(values), detector={"name": "hbos"},
    )
    assert "Hbos" not in model_id


# --- request-level validation -----------------------------------------------------


def _base_request(values):
    return {"series": [{"value": v} for v in values], "granularity": "none"}


def test_detect_request_hbos_end_to_end():
    req = _base_request([1.0] * 23 + [100.0])
    req["detector"] = {"name": "hbos",
                       "parameters": {"period": 0, "threshold": 0.9, "outlierFraction": 0.1}}
    resp = detect.detect_request(req)
    assert resp["modelId"] == "HbosNonseasonal"
    assert resp["isAnomaly"][-1] is True
    assert sum(resp["isAnomaly"][:-1]) == 0
    assert len(resp["expectedValues"]) == 24


def test_detect_request_detector_validation_errors():
    values = [float(i % 5) for i in range(24)]
    req = _base_request(values)
    req["detector"] = {"name": "hbos"}
    with pytest.raises(ValueError, match="MissingDetectorParameters"):
        detect.detect_request(req)
    req["detector"] = {"parameters": {}}
    with pytest.raises(ValueError, match="MissingDetectorName"):
        detect.detect_request(req)
    req["detector"] = {"name": "nope", "parameters": {}}
    with pytest.raises(ValueError, match="InvalidDetector"):
        detect.detect_request(req)
    req["detector"] = {"name": "hbos", "parameters": 3}
    with pytest.raises(ValueError, match="InvalidDetectorParameters"):
        detect.detect_request(req)


def test_detect_request_non_dict_detector_falls_back_to_selection():
    # Reference only validates when detector IS a dict
    # (univariate_anomaly_detection.py:214); a string/list/number silently
    # falls through to model selection.
    values = (np.sin(np.arange(24) / 4.0) + 2).tolist()
    for bad in ("hbos", 3, ["hbos"], True):
        req = _base_request(values)
        req["detector"] = bad
        resp = detect.detect_request(req)
        assert "Hbos" not in resp["modelId"]
