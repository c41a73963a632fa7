"""HBOS detection — numpy port (operator D14 in SURVEY.md §2.11).

Port of model/hbos_detection.py:13-135, replacing the pyod dependency with
its documented histogram scoring (pyod.models.hbos, BSD): 10 equal-width
bins, density histogram, per-sample score log2(density + alpha), decision
score = -sum, probability = min-max scaling over the fitted scores
(predict_proba method='linear' with train == test).
"""

from __future__ import annotations

import numpy as np

from anomaly_detector_spark.kernels import stl as stl_mod
from anomaly_detector_spark.kernels.trend import interp, normalize, trend_detection

HBOS_N_BINS = 10
HBOS_ALPHA = 0.1


def hbos_scores(values: np.ndarray) -> np.ndarray:
    """Min-max scaled HBOS outlier probability for a 1-D sample."""
    x = np.asarray(values, dtype=float)
    hist, edges = np.histogram(x, bins=HBOS_N_BINS, density=True)
    width = edges[1] - edges[0]
    if width == 0:
        return np.zeros(len(x))
    idx = ((x - edges[0]) / width).astype(int)
    idx[idx == HBOS_N_BINS] = HBOS_N_BINS - 1  # the last bin is closed
    idx = np.clip(idx, 0, HBOS_N_BINS - 1)
    raw = -np.log2(hist[idx] + HBOS_ALPHA)
    lo, hi = raw.min(), raw.max()
    if hi == lo:
        return np.zeros(len(x))
    return (raw - lo) / (hi - lo)


def _directions(series, expected, is_anomaly):
    is_neg = np.zeros(len(series), dtype=bool)
    is_pos = np.zeros(len(series), dtype=bool)
    anom = np.where(is_anomaly)[0]
    is_neg[anom] = expected[anom] > series[anom]
    is_pos[anom] = ~is_neg[anom]
    return is_pos, is_neg


def hbos_detection(series, period: int, threshold: float, outlier_fraction: float,
                   need_trend: bool = False, last_value=None):
    """Port of hbos_detection (dispatch at hbos_detection.py:118-126)."""
    series = np.asarray(series, dtype=float)
    num_obs = len(series)
    if period > 0:
        # seasonal variant (:13-73)
        if outlier_fraction > 0.49:
            raise ValueError("max_anomaly_ratio must be less than 50% of the data points")
        outlier_fraction = max(outlier_fraction, 1.0 / num_obs)
        if num_obs < period * 2 + 1:
            raise ValueError("Anomaly detection needs at least 2 periods worth of data")
        stl_func = stl_mod.stl_adjust_trend if last_value is not None else stl_mod.stl
        decompose = stl_mod.de_outlier_stl(series, stl_func=stl_func, period=period,
                                           log_transform=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            mape = np.mean(np.abs(decompose["remainder"] / series))
        if mape > stl_mod.MAPE_UB:
            dec_log = stl_mod.de_outlier_stl(series, stl_func=stl_func, period=period,
                                             log_transform=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                mape_log = np.mean(np.abs(dec_log["remainder"] / series))
            if mape_log < stl_mod.MAPE_LB:
                decompose = dec_log
        trend = np.array(decompose["trend"], dtype=float)
        season = np.array(decompose["seasonal"], dtype=float)
        scores = hbos_scores(normalize(series - trend - season))
        is_anomaly = scores > threshold
        if np.any(is_anomaly) and np.sum(is_anomaly) < num_obs:
            trend[is_anomaly] = np.nan
            trend = interp(trend)
        expected = trend + season
        is_pos, is_neg = _directions(series, expected, is_anomaly)
        out = {
            "value": series, "expected_value": expected, "is_anomaly": is_anomaly,
            "is_positive_anomaly": is_pos, "is_negative_anomaly": is_neg,
            "score": scores,
        }
        if need_trend:
            out["trend"] = trend
        return out, "HbosSeasonal"

    # non-seasonal variant (:76-115)
    outlier_fraction = max(outlier_fraction, 1.0 / num_obs)
    scores = hbos_scores(series)
    is_anomaly = scores > threshold
    trend_values = trend_detection(series)
    expected = np.array(trend_values, dtype=float)
    is_pos, is_neg = _directions(series, expected, is_anomaly)
    out = {
        "value": series, "expected_value": expected, "is_anomaly": is_anomaly,
        "is_positive_anomaly": is_pos, "is_negative_anomaly": is_neg,
        "score": scores,
    }
    if need_trend:
        out["trend"] = expected
    return out, "HbosNonseasonal"
