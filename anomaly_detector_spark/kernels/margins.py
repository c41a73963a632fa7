"""Margins, severity, boundary units — numpy ports (operators M1-M11).

- refine_margins / SR & AD margins / dispatch <- util/refine.py:10-154
- factor table, units, anomaly score, severity <- util/boundary_utils.py
"""

from __future__ import annotations

import bisect

import numpy as np

EPS = 1e-8
ANOMALY_IGNORE_RATIO = 0.0001  # boundary_utils.py:9
MIN_UNIT = 0.3                 # boundary_utils.py:10

# Sensitivity factor curve (boundary_utils.py:46-59); regenerated from the
# documented piecewise formula (comment block boundary_utils.py:12-44).


def _gen_factors() -> list[float]:
    factors = []
    for i in range(0, 25):
        factors.append(0.8 * (i - 25) ** 2 + 32)
    for i in range(25, 46):
        factors.append(-1.25 * (i + 5) + 67.5)
    for i in range(46, 56):
        factors.append(-0.4 * (i + 5) + 25)
    for i in range(56, 66):
        factors.append(-0.04 * (i + 5) + 3.4)
    for i in range(66, 76):
        factors.append(-0.03 * (i + 5) + 2.7)
    for i in range(76, 86):
        factors.append(-0.015 * (i + 5) + 1.4999999999999998)
    for i in range(86, 93):
        factors.append(-0.011818181818181818 * (i + 5) + 1.2136363636363636)
    # refined high-sensitivity tail present in the shipped table
    factors.extend([0.043636363636363695, 0.01200000000000001, 0.008,
                    0.0060750000000000005, 0.00415, 0.0022249999999999995,
                    0.0002999999999999999, 0.0])
    return factors


FACTORS = _gen_factors()


def calculate_boundary_units(trend: np.ndarray, is_anomaly: np.ndarray) -> np.ndarray:
    """Port of boundary_utils.py:62-70."""
    trend = np.asarray(trend, dtype=float)
    is_anomaly = np.asarray(is_anomaly, dtype=bool)
    normal = trend[~is_anomaly]
    if np.all(np.abs(normal) < EPS):
        return np.ones(len(trend)) * MIN_UNIT
    unit = np.mean(np.abs(normal))
    units = np.abs(trend) * 0.5 + unit * 0.5
    return np.clip(units, MIN_UNIT, max(MIN_UNIT, np.max(units)))


def calculate_margin(unit: float, sensitivity: float, value: float,
                     expected_value: float, is_anomaly: bool) -> tuple[float, float]:
    """Port of boundary_utils.py:73-107 (returns (upper, lower))."""

    def changed_margin(sens_int: int):
        percent = 0.5
        delta = unit * FACTORS[int(sens_int)]
        if not is_anomaly:
            delta = np.abs(expected_value - value) + delta * percent
            if value > expected_value:
                return np.array([delta, delta / 3.0])
            return np.array([delta / 3.0, delta])
        if delta * ANOMALY_IGNORE_RATIO < np.abs(value - expected_value) < delta and sens_int == 99:
            delta = np.abs(expected_value - value) * percent
        return np.array([delta, delta])

    if sensitivity < 0 or sensitivity > 100:
        raise ValueError("sensitivity should be integer in [0, 100]")
    if unit <= 0:
        raise ValueError("unit should be a positive number")
    lb = int(sensitivity)
    margin1 = changed_margin(lb)
    if lb == sensitivity:
        return float(margin1[0]), float(margin1[1])
    margin2 = changed_margin(lb + 1)
    out = margin2 + (1 - sensitivity + lb) * (margin1 - margin2)
    return float(out[0]), float(out[1])


def calculate_anomaly_score(value: float, expected_value: float, unit: float,
                            is_anomaly: bool) -> float:
    """Port of boundary_utils.py:110-122."""
    dist = np.abs(expected_value - value) / unit
    margins = FACTORS[::-1]
    lb = bisect.bisect_left(margins, dist)
    if lb == 0:
        return 0
    if lb >= 100:
        return 100
    a, b = margins[lb - 1], margins[lb]
    return lb - 1 + (dist - a) / (b - a)


def calculate_severity_v1(value: float, expected_value: float, is_anomaly: bool) -> float:
    if not is_anomaly:
        return 0.0
    base = np.abs(expected_value)
    if base <= EPS:
        base = MIN_UNIT
    return float(np.min((np.abs(value - expected_value) / base, 1.0)))


def calculate_severity_v2(anomaly_score: float, is_anomaly: bool) -> float:
    return anomaly_score / 100.0 if is_anomaly else 0.0


def refine_margins(actual, expected, is_anomaly, anomaly_neg, anomaly_pos,
                   sensitivity, upper_margins, lower_margins):
    """Port of refine.py:10-48."""
    actual = np.asarray(actual, dtype=float)
    expected = np.asarray(expected, dtype=float)
    is_anomaly = np.array(is_anomaly, dtype=bool)
    anomaly_neg = np.array(anomaly_neg, dtype=bool)
    anomaly_pos = np.array(anomaly_pos, dtype=bool)

    upper_bound = expected + upper_margins
    lower_bound = expected - lower_margins
    upper_bound = np.clip(upper_bound, np.min(upper_bound), max(np.max(actual), np.max(expected)))
    lower_bound = np.clip(lower_bound, min(np.min(actual), np.min(expected)), np.max(lower_bound))
    upper_margins = upper_bound - expected
    lower_margins = expected - lower_bound

    anomaly_refine = np.where(is_anomaly & (upper_bound >= actual) & (actual >= lower_bound))
    upper_refine = np.where((actual > upper_bound) & ~is_anomaly)
    upper_margins[upper_refine] = (actual[upper_refine] - expected[upper_refine]) * 1.01
    lower_margins[upper_refine] = upper_margins[upper_refine]
    lower_refine = np.where((actual < lower_bound) & ~is_anomaly)
    lower_margins[lower_refine] = (expected[lower_refine] - actual[lower_refine]) * 1.01
    upper_margins[lower_refine] = lower_margins[lower_refine]

    if sensitivity == 100:
        upper_margins[anomaly_refine] = 0.0
        lower_margins[anomaly_refine] = 0.0
    else:
        is_anomaly[anomaly_refine] = False
        anomaly_neg[anomaly_refine] = False
        anomaly_pos[anomaly_refine] = False

    severity = [calculate_severity_v1(av, ev, an) for av, ev, an in zip(actual, expected, is_anomaly)]
    return expected, upper_margins, lower_margins, anomaly_neg, anomaly_pos, is_anomaly, severity


def get_spectral_residual_margins(actual, expected, is_anomaly, anomaly_neg, anomaly_pos,
                                  sensitivity, anomaly_scores):
    """Port of refine.py:51-82."""
    actual = np.asarray(actual, dtype=float)
    expected = np.asarray(expected, dtype=float)
    anomaly_scores = np.asarray(anomaly_scores, dtype=float)
    count = len(actual)
    margins = np.zeros(count, dtype=np.float64)
    normal_mask = np.less_equal(anomaly_scores, EPS)
    normal_values = actual[normal_mask]
    if len(normal_values) > 0:
        normal_margin = (normal_values.max() - normal_values.min()) * 0.01
        margins = np.ones(count, dtype=np.float64) * normal_margin
    bar = 1 - sensitivity / 100.0
    margins[~normal_mask] = (
        np.abs(actual[~normal_mask] - expected[~normal_mask]) / anomaly_scores[~normal_mask] * bar
    )
    return refine_margins(actual, expected, is_anomaly, anomaly_neg, anomaly_pos,
                          sensitivity, margins, np.copy(margins))


def get_anomaly_detector_margins(actual, expected, is_anomaly, anomaly_neg, anomaly_pos,
                                 sensitivity):
    """Port of refine.py:85-91."""
    expected = np.asarray(expected, dtype=float)
    upper = np.abs(expected) * (100 - sensitivity) / 100
    return refine_margins(actual, expected, is_anomaly, anomaly_neg, anomaly_pos,
                          sensitivity, upper, np.array(upper))


def get_margins(results: dict, sensitivity: float, model_id: str, boundary_version: str,
                last: bool = False):
    """Port of refine.py:94-154.  ``results`` is the kernel result dict with
    numpy columns (value, expected_value, is_anomaly, is_negative_anomaly,
    is_positive_anomaly, score, optionally trend)."""
    if boundary_version == "V1":
        if model_id == "SpectralResidual":
            out = get_spectral_residual_margins(
                results["value"], results["expected_value"], np.array(results["is_anomaly"]),
                np.array(results["is_negative_anomaly"]), np.array(results["is_positive_anomaly"]),
                sensitivity, results["score"],
            )
        else:
            out = get_anomaly_detector_margins(
                results["value"], results["expected_value"], np.array(results["is_anomaly"]),
                np.array(results["is_negative_anomaly"]), np.array(results["is_positive_anomaly"]),
                sensitivity,
            )
        expected, upper, lower, neg, pos, anom, severity = out
        if last:
            return (expected[-1], upper[-1], lower[-1], bool(neg[-1]), bool(pos[-1]),
                    bool(anom[-1]), severity[-1], None, None)
        return expected, upper, lower, neg, pos, anom, severity, None, None

    # V2/V3 (refine.py:110-143)
    values = np.asarray(results["value"], dtype=float)
    expected = np.asarray(results["expected_value"], dtype=float)
    is_anomaly = np.array(results["is_anomaly"], dtype=bool)
    units = calculate_boundary_units(results["trend"], is_anomaly)
    if last:
        value, ev, anomaly, unit = values[-1], expected[-1], is_anomaly[-1], units[-1]
        score = calculate_anomaly_score(value, ev, unit, anomaly)
        severity = calculate_severity_v2(score, anomaly)
        upper, lower = calculate_margin(unit, sensitivity, value, ev, anomaly)
        pos = value > ev + upper and anomaly
        neg = value < ev - lower and anomaly
        anomaly = pos or neg
        return ev, upper, lower, bool(neg), bool(pos), bool(anomaly), severity, unit, score
    scores = [calculate_anomaly_score(v, e, u, a) for v, e, u, a in zip(values, expected, units, is_anomaly)]
    bounds = [calculate_margin(u, sensitivity, v, e, a) for u, v, e, a in zip(units, values, expected, is_anomaly)]
    upper, lower = (np.array(x) for x in zip(*bounds))
    pos = is_anomaly & (values > expected + upper)
    neg = is_anomaly & (values < expected - lower)
    is_anomaly = pos | neg
    severity = [calculate_severity_v2(s, a) for s, a in zip(scores, is_anomaly)]
    return expected, upper, lower, neg, pos, is_anomaly, severity, units, scores
