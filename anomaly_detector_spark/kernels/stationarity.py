"""Stationarity tests (ADF, KPSS) — numpy re-implementations.

The reference gates its differencing pass on
``ADF(x).pvalue < 0.05 or KPSS(x).pvalue >= 0.05`` (arch package;
model/detect_model.py:41).  Re-implemented here from the published test
definitions: ADF with constant trend + AIC lag selection and MacKinnon (1994)
p-value surface; KPSS with constant trend, Newey-West/Hobijn automatic
bandwidth, and the canonical critical-value interpolation.  Only the 0.05
decision boundary feeds the reference's behavior, so interpolation details
away from the boundary are immaterial.
"""

from __future__ import annotations

import math

import numpy as np

# MacKinnon (1994) p-value regression surface, constant trend, N=1
# (published constants, same as statsmodels.tsa.adfvalues).
_TAU_STAR_C = -1.61
_TAU_MIN_C = -18.83
_TAU_MAX_C = 2.74
_TAU_C_SMALLP = [2.1659, 1.4412, 0.038269]
_TAU_C_LARGEP = [1.7339, 0.93202, -0.12745, -0.010368]


def _norm_cdf(x: float) -> float:
    return 0.5 * math.erfc(-x / math.sqrt(2))


def mackinnon_pvalue(stat: float) -> float:
    """Approximate ADF p-value (constant trend, single series)."""
    if stat > _TAU_MAX_C:
        return 1.0
    if stat < _TAU_MIN_C:
        return 0.0
    if stat <= _TAU_STAR_C:
        poly = _TAU_C_SMALLP
    else:
        poly = _TAU_C_LARGEP
    arg = sum(c * stat**i for i, c in enumerate(poly))
    return _norm_cdf(arg)


def _ols(X: np.ndarray, y: np.ndarray):
    beta, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    return beta, resid


def adf_test(values, max_lags: int | None = None) -> tuple[float, float]:
    """Augmented Dickey-Fuller (trend='c', AIC lag selection).

    Returns (stat, pvalue).  Raises on degenerate inputs like the arch
    implementation would (caller treats exceptions as 'stationary',
    detect_model.py:40-43).
    """
    y = np.asarray(values, dtype=float)
    nobs = len(y)
    if nobs < 4:
        raise ValueError("series too short for ADF")
    delta = np.diff(y)
    if max_lags is None:
        max_lags = int(np.ceil(12.0 * (nobs / 100.0) ** 0.25))
        max_lags = max(min(max_lags, nobs // 2 - 2), 0)

    # lag selection by AIC on the common (max_lags-trimmed) sample
    best_aic, best_lag = np.inf, 0
    n_common = len(delta) - max_lags
    if n_common < 3:
        max_lags = max(len(delta) - 3, 0)
        n_common = len(delta) - max_lags
    for lag in range(0, max_lags + 1):
        dep = delta[max_lags:]
        cols = [y[max_lags : nobs - 1]]
        for i in range(1, lag + 1):
            cols.append(delta[max_lags - i : len(delta) - i])
        cols.append(np.ones(n_common))
        X = np.column_stack(cols)
        _, resid = _ols(X, dep)
        sigma2 = (resid @ resid) / n_common
        if sigma2 <= 0:
            raise ValueError("degenerate ADF regression")
        k = X.shape[1]
        aic = math.log(sigma2) + 2.0 * k / n_common
        if aic < best_aic:
            best_aic, best_lag = aic, lag

    # final regression trimmed only by the selected lag
    lag = best_lag
    dep = delta[lag:]
    n = len(dep)
    cols = [y[lag : nobs - 1]]
    for i in range(1, lag + 1):
        cols.append(delta[lag - i : len(delta) - i])
    cols.append(np.ones(n))
    X = np.column_stack(cols)
    beta, resid = _ols(X, dep)
    k = X.shape[1]
    if n - k <= 0:
        raise ValueError("not enough observations for ADF")
    s2 = (resid @ resid) / (n - k)
    xtx_inv = np.linalg.pinv(X.T @ X)
    se = math.sqrt(s2 * xtx_inv[0, 0])
    if se == 0:
        raise ValueError("degenerate ADF regression")
    stat = float(beta[0] / se)
    return stat, mackinnon_pvalue(stat)


# KPSS critical values for trend='c' (Kwiatkowski et al. 1992, table 1).
_KPSS_CRIT = np.array([0.347, 0.463, 0.574, 0.739])
_KPSS_PVALS = np.array([0.10, 0.05, 0.025, 0.01])


def kpss_test(values) -> tuple[float, float]:
    """KPSS (trend='c') with Newey-West automatic bandwidth (Hobijn et al.).

    Returns (stat, pvalue) with p interpolated over the canonical critical
    values and clamped to [0.01, 0.10] outside the table.
    """
    y = np.asarray(values, dtype=float)
    nobs = len(y)
    if nobs < 4:
        raise ValueError("series too short for KPSS")
    e = y - y.mean()

    # Hobijn et al. automatic bandwidth for the Bartlett kernel
    n_gamma = int(nobs ** (2.0 / 9.0))
    gamma = np.array([(e[: nobs - j] * e[j:]).sum() / nobs for j in range(n_gamma + 1)])
    s0 = gamma[0] + 2 * gamma[1:].sum()
    s1 = 2 * (np.arange(1, n_gamma + 1) * gamma[1:]).sum()
    if s0 == 0:
        raise ValueError("degenerate KPSS variance")
    bandwidth = int(1.1447 * ((s1 / s0) ** 2) ** (1.0 / 3.0) * nobs ** (1.0 / 3.0))
    bandwidth = max(min(bandwidth, nobs - 1), 0)

    gam = np.array([(e[: nobs - j] * e[j:]).sum() / nobs for j in range(bandwidth + 1)])
    w = 1.0 - np.arange(1, bandwidth + 1) / (bandwidth + 1.0)
    lrvar = gam[0] + 2 * (w * gam[1:]).sum()
    if lrvar <= 0:
        raise ValueError("degenerate KPSS long-run variance")
    s = np.cumsum(e)
    stat = float((s @ s) / (nobs**2 * lrvar))
    pvalue = float(np.interp(stat, _KPSS_CRIT, _KPSS_PVALS))
    if stat < _KPSS_CRIT[0]:
        pvalue = 0.10
    elif stat > _KPSS_CRIT[-1]:
        pvalue = 0.01
    return stat, pvalue


def should_include_delta(values, max_delta: int = 2):
    """Port of detect_model.py:34-50 — how many differences to stationarity.

    Returns (delta, transformed_values); exceptions in either test count as
    stationary, matching the reference's bare except.
    """
    from anomaly_detector_spark.kernels.detect import get_delta

    new_values = list(values)
    for delta in range(max_delta + 1):
        try:
            stationary = adf_test(new_values)[1] < 0.05 or kpss_test(new_values)[1] >= 0.05
        except Exception:
            stationary = True
        if stationary:
            return delta, new_values
        new_values = get_delta(delta, new_values)
    return -1, list(values)
