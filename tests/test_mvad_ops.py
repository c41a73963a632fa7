"""MVAD dataflow-shell operators vs direct pandas/numpy transcriptions of the
reference semantics (multivariate/util.py, model.py:228-273, dataset.py:51-82,
common/data_processor.py:38-61)."""

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from anomaly_detector_spark.operators import mvad


@pytest.fixture(scope="module")
def mv_df(spark):
    rng = np.random.RandomState(7)
    n = 240
    pdf = pd.DataFrame({
        "t": np.arange(n),
        "b_var": np.sin(np.arange(n) / 6.0) * 3 + 10 + rng.normal(0, 0.1, n),
        "a_var": np.cos(np.arange(n) / 9.0) * 2 + 5 + rng.normal(0, 0.1, n),
        "c_var": rng.normal(0, 1, n).cumsum(),
    })
    return spark.createDataFrame(pdf), pdf


def test_mvad_ingest_sorts_columns_and_casts(spark, mv_df):
    df, pdf = mv_df
    out = mvad.mvad_ingest(df.orderBy(F.rand(seed=1)), ts_col="t")
    assert out.columns == ["t", "a_var", "b_var", "c_var"]
    # ingest no longer global-sorts (downstream windows order on ts anyway);
    # content must be complete and typed, order comes from order_col
    rows = sorted(out.collect(), key=lambda r: r["t"])
    assert [r["t"] for r in rows] == list(range(len(pdf)))
    assert all(isinstance(rows[0][c], float) for c in ["a_var", "b_var", "c_var"])


def test_fill_na_methods_match_pandas(spark):
    vals = [np.nan, np.nan, 1.0, 4.0, np.nan, np.nan, 10.0, np.nan]
    pdf = pd.DataFrame({"t": range(len(vals)), "v": vals, "u": [np.nan] * len(vals)})
    df = spark.createDataFrame(pdf)

    for method, pd_fn in [
        ("Linear", lambda s: s.interpolate(method="linear", limit_direction="both", limit=len(s))),
        ("Previous", lambda s: s.ffill(limit=len(s)).bfill(limit=len(s))),
        ("Subsequent", lambda s: s.bfill(limit=len(s)).ffill(limit=len(s))),
        ("Fixed", lambda s: s.fillna(7.5)),
    ]:
        out = mvad.fill_na(df, ["v", "u"], order_col="t", method=method, fill_value=7.5)
        got = {r["t"]: (r["v"], r["u"]) for r in out.collect()}
        exp_v = pd_fn(pdf["v"]).fillna(0).tolist()
        exp_u = pd_fn(pdf["u"]).fillna(0).tolist()
        for i in range(len(vals)):
            assert got[i][0] == pytest.approx(exp_v[i]), (method, i)
            assert got[i][1] == pytest.approx(exp_u[i]), (method, i)

    with pytest.raises(ValueError, match="not supported"):
        mvad.fill_na(df, ["v"], order_col="t", method="Cubic")


def _ref_pct_weight(data: np.ndarray, window: int) -> list:
    """Direct transcription of util.py:46-76."""
    variables_num = data.shape[1]
    pct = np.empty(variables_num, float)
    for i in range(variables_num):
        s = pd.Series(data[:, i] + 0.0001)
        d1 = np.maximum(np.abs((s.shift(1) / s) - 1), np.abs((s.shift(-1) / s) - 1))
        d2 = np.clip(d1, a_max=2, a_min=0)
        pct[i] = d2.rolling(window).max().mean()
    reweight_num = np.count_nonzero(pct > 1.9)
    reweight_value = reweight_num / variables_num
    out = [reweight_value if p > 1.9 else 1.0 for p in pct]
    return pct.tolist(), out


def test_pct_weight_matches_reference(spark, mv_df):
    df, pdf = mv_df
    cols = sorted(["a_var", "b_var", "c_var"])
    data = pdf[cols].values
    exp_raw, exp_w = _ref_pct_weight(data, window=10)
    out = {r["variable"]: (r["pct_weight_raw"], r["weight"])
           for r in mvad.pct_weight(df, cols, window=10, order_col="t").collect()}
    for i, c in enumerate(cols):
        assert out[c][0] == pytest.approx(exp_raw[i], rel=1e-9)
        assert out[c][1] == pytest.approx(exp_w[i])


def test_pct_weight_reweight_rule(spark):
    # one spiky variable above 1.9, two flat -> spiky weight = 1/3
    n = 60
    rng = np.random.RandomState(0)
    spiky = np.ones(n)
    spiky[::2] = 10.0
    pdf = pd.DataFrame({"t": range(n), "flat1": np.ones(n) + rng.normal(0, .001, n),
                        "flat2": 2 + rng.normal(0, .001, n), "spiky": spiky})
    df = spark.createDataFrame(pdf)
    out = {r["variable"]: r["weight"]
           for r in mvad.pct_weight(df, ["flat1", "flat2", "spiky"], window=5, order_col="t").collect()}
    assert out["spiky"] == pytest.approx(1 / 3)
    assert out["flat1"] == 1.0 and out["flat2"] == 1.0


def _ref_sliding(data, window_size, interval, horizon, mins, maxs, clip_min, clip_max):
    """Direct transcription of dataset.py:51-82."""
    n = len(data)
    x_index_set = range(window_size, n - horizon + 1)
    x_end_idx = [x_index_set[j * interval] for j in range(len(x_index_set) // interval)]
    samples = []
    for hi in x_end_idx:
        lo = hi - window_size
        x = np.clip((data[lo:hi] - mins) / (maxs - mins + 1e-8), clip_min, clip_max)
        y = np.clip((data[hi - 1 + horizon] - mins) / (maxs - mins + 1e-8), clip_min, clip_max)
        samples.append((hi, x, y))
    return samples


def test_sliding_windows_match_reference(spark, mv_df):
    df, pdf = mv_df
    cols = sorted(["a_var", "b_var", "c_var"])
    data = pdf[cols].values
    mins, maxs = data.min(axis=0), data.max(axis=0)
    ws, interval, horizon = 20, 7, 1
    expected = _ref_sliding(data, ws, interval, horizon, mins, maxs, 0.0, 1.0)

    out = mvad.sliding_windows(df, cols, order_col="t", window_size=ws,
                               interval=interval, horizon=horizon).collect()
    assert len(out) == len(expected)
    by_end = {r["window_end"]: r for r in out}
    for hi, x, y in expected:
        r = by_end[hi]  # window_end is the 1-based row number == hi
        for ci, c in enumerate(cols):
            assert np.allclose(r[f"x_{c}"], x[:, ci], atol=1e-12), (hi, c)
            assert r[f"y_{c}"] == pytest.approx(y[ci])


def _ref_thresholds(scores, tw):
    """Direct transcription of model.py:246-255 + util.py:28-32."""
    result_n = len(scores)
    thresholds = []
    for i in range(result_n - 1, tw - 2, -1):
        window = np.sort(scores[max(0, result_n - tw - i): result_n - i])
        thresholds.append(0 if len(window) == 0 else window[int(len(window) * 0.95)])
    return scores[tw - 1:], thresholds


def test_rolling_quantile_threshold_matches_reference(spark):
    rng = np.random.RandomState(5)
    scores = rng.rand(120)
    scores[100] = 5.0
    tw = 30
    kept, exp_thr = _ref_thresholds(scores, tw)
    pdf = pd.DataFrame({"t": range(len(scores)), "score": scores})
    out = (
        mvad.rolling_quantile_threshold(spark.createDataFrame(pdf), "score", "t",
                                        threshold_window=tw)
        .orderBy("t").collect()
    )
    assert len(out) == len(kept)
    for k, r in enumerate(out):
        assert r["score"] == pytest.approx(kept[k])
        assert r["threshold"] == pytest.approx(exp_thr[k]), k


def test_anomaly_rule_and_severity(spark):
    pdf = pd.DataFrame({
        "t": range(5),
        "score": [0.1, 0.35, 0.45, 0.6, 0.2],
        "threshold": [0.4, 0.3, 0.5, 0.9, 0.1],
    })
    # train_threshold=0.4 -> hard_upper=max(0.5,.4)=0.5, hard_lower=min(0.3,.4)=0.3
    df = mvad.mvad_anomaly_rule(spark.createDataFrame(pdf), train_threshold=0.4)
    df = mvad.mvad_severity(df)
    rows = {r["t"]: r for r in df.collect()}
    # s>=t and s>=0.3: t=1 (.35>=.3), t=4 fails hard_lower (.2<0.3); s>0.5: t=3
    assert [rows[i]["is_anomaly"] for i in range(5)] == [False, True, False, True, False]
    assert rows[3]["severity"] == pytest.approx(0.6 / (math.e - 1))
    assert rows[0]["severity"] == 0.0


def test_contributors_and_topk(spark):
    pdf = pd.DataFrame({"t": [0, 1], "rmses": [[1.0, 3.0, 4.0], [2.0, 2.0, 6.0]]})
    df = mvad.contributor_scores(spark.createDataFrame(pdf), "rmses")
    df = mvad.top_k_contributors(df, "contributor_scores", ["a", "b", "c"], k=2)
    rows = {r["t"]: r for r in df.collect()}
    assert rows[0]["contributor_scores"] == pytest.approx([0.125, 0.375, 0.5])
    interp = rows[0]["interpretation"]
    assert [(i["variable_name"], round(i["contribution_score"], 6)) for i in interp] == [
        ("c", 0.5), ("b", 0.375)]
    assert rows[1]["interpretation"][0]["variable_name"] == "c"


def test_rolling_attention_delta(spark):
    vals = np.arange(10, dtype=float)
    pdf = pd.DataFrame({"t": range(10), "attn": vals})
    out = mvad.rolling_attention_delta(spark.createDataFrame(pdf), "attn", "t",
                                       threshold_window=4).orderBy("t").collect()
    # trailing mean of 4 at t>=3 is v-1.5 -> delta 1.5; ramp-in below
    assert out[0]["attn_delta"] == pytest.approx(0.0)
    assert out[5]["attn_delta"] == pytest.approx(1.5)
    assert out[9]["attn_delta"] == pytest.approx(1.5)


def test_ffill_bfill_partitioned(spark):
    pdf = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 4,
        "t": list(range(4)) * 2,
        "v": [np.nan, 1.0, np.nan, 3.0, 5.0, np.nan, np.nan, np.nan],
    })
    df = spark.createDataFrame(pdf)
    f = {(r["g"], r["t"]): r["v"] for r in
         mvad.ffill(df, ["v"], "t", partition_cols=["g"]).collect()}
    assert f[("a", 0)] is None and f[("a", 2)] == 1.0 and f[("b", 3)] == 5.0
    b = {(r["g"], r["t"]): r["v"] for r in
         mvad.bfill(df, ["v"], "t", partition_cols=["g"]).collect()}
    assert b[("a", 0)] == 1.0 and b[("a", 2)] == 3.0 and b[("b", 1)] is None
