"""Planted-anomaly truth tests for the Spark-side drift wiring.

The golden corpus proves the numpy kernel; these prove the DataFrame plumbing
(derive_series bucketing/grid indices -> applyInPandas scoring -> verdict
rollup) flags exactly the planted events and nothing structural around them.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from anomaly_detector_spark.operators.drift import derive_series, drift_verdicts, score_drift

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(spark, spikes: dict[str, list[int]], n_hours: int = 200, base_rate: int = 20):
    """Synthetic events: `base_rate` rows per hour per event_type, plus
    `spike x 10` extra rows at the planted hour indices."""
    rows = []
    for etype in spikes:
        for h in range(n_hours):
            n = base_rate + (base_rate * 10 if h in spikes[etype] else 0)
            for i in range(n):
                rows.append((etype, T0 + dt.timedelta(hours=h, seconds=i % 3600), 1.0))
    pdf = pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    return spark.createDataFrame(pdf)


def test_sr_drift_flags_planted_rate_spikes(spark):
    spikes = {"click": [50, 120], "view": []}
    ev = _mk_events(spark, spikes)
    series = derive_series(ev, partition_cols=["event_type"], ts_col="ts", bucket="1 hour",
                           value_exprs={"event_rate": F.count(F.lit(1)).cast("double")})
    scored = score_drift(series, granularity="hourly").collect()
    flagged = {}
    for r in scored:
        flagged.setdefault(r["series_key"], set())
        if r["is_anomaly"]:
            flagged[r["series_key"]].add(r["idx"])
    # the planted hours are flagged, as positive anomalies
    assert {50, 120} <= flagged["click/event_rate"]
    pos = {r["idx"] for r in scored if r["series_key"] == "click/event_rate" and r["is_positive_anomaly"]}
    assert {50, 120} <= pos
    # a flat series stays quiet
    assert flagged["view/event_rate"] == set()
    # no over-firing: at most a handful of borderline extras
    assert len(flagged["click/event_rate"]) <= 6


def test_drift_verdicts_fail_exactly_spiked_series(spark):
    spikes = {"click": [30, 60, 90, 110, 140, 170], "view": [], "purchase": []}
    ev = _mk_events(spark, spikes, n_hours=180)
    series = derive_series(ev, partition_cols=["event_type"], ts_col="ts", bucket="1 hour",
                           value_exprs={"event_rate": F.count(F.lit(1)).cast("double")})
    verdicts = {r["series_key"]: r for r in
                drift_verdicts(score_drift(series, granularity="hourly"),
                               max_anomaly_rate=0.02).collect()}
    assert not verdicts["click/event_rate"]["passed"]
    assert verdicts["click/event_rate"]["n_anomalies"] >= 6
    assert verdicts["view/event_rate"]["passed"]
    assert verdicts["purchase/event_rate"]["passed"]
    assert verdicts["view/event_rate"]["n_points"] == 180


def test_derive_series_grid_indices_with_missing_buckets(spark):
    """Bucket grid indices survive empty hours: idx is (ts-first)/bucket, not
    a dense row number — the kernel's fill-up path needs true grid gaps."""
    rows = []
    for h in [0, 1, 2, 5, 6, 10]:
        for i in range(3):
            rows.append(("click", T0 + dt.timedelta(hours=h, minutes=i), 1.0))
    ev = spark.createDataFrame(pd.DataFrame(rows, columns=["event_type", "ts", "value"]))
    series = derive_series(ev, partition_cols=["event_type"], ts_col="ts", bucket="1 hour",
                           value_exprs={"event_rate": F.count(F.lit(1)).cast("double")})
    got = sorted(r["idx"] for r in series.collect())
    assert got == [0, 1, 2, 5, 6, 10]


def test_score_drift_skips_too_short_series(spark):
    """Series under the reference's 12-point minimum produce no rows (the
    reference hard-errors; at table scope we skip, never crash the stage)."""
    spikes = {"click": []}
    ev = _mk_events(spark, spikes, n_hours=8)
    series = derive_series(ev, partition_cols=["event_type"], ts_col="ts", bucket="1 hour",
                           value_exprs={"event_rate": F.count(F.lit(1)).cast("double")})
    assert score_drift(series, granularity="hourly").count() == 0


def test_arrow_engine_matches_pandas_engine(spark):
    """The mapInArrow fast path and the applyInPandas path are the SAME
    operator: identical rows out (values bitwise, given identical transport
    dtype) on a battery with spiky, flat, and gappy series."""
    spikes = {"click": [50, 120], "view": [], "purchase": [33]}
    ev = _mk_events(spark, spikes, n_hours=150)
    series = derive_series(ev, partition_cols=["event_type"], ts_col="ts", bucket="1 hour",
                           value_exprs={"event_rate": F.count(F.lit(1)).cast("double"),
                                        "value_avg": F.avg("value")})
    cols = ["series_key", "idx", "value", "expected_value", "is_anomaly",
            "is_positive_anomaly", "is_negative_anomaly", "score", "period", "model_id"]
    a = sorted(score_drift(series, granularity="hourly", engine="arrow").collect(),
               key=lambda r: (r["series_key"], r["idx"]))
    b = sorted(score_drift(series, granularity="hourly", engine="pandas").collect(),
               key=lambda r: (r["series_key"], r["idx"]))
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        for c in cols:
            va, vb = ra[c], rb[c]
            if isinstance(va, float):
                assert va == vb or (np.isnan(va) and np.isnan(vb)), (ra["series_key"], ra["idx"], c)
            else:
                assert va == vb, (ra["series_key"], ra["idx"], c)


def test_transport_dtype_float64_matches_flags(spark):
    """float32 transport quantizes inputs at ~1e-7 relative; detection flags
    on the planted battery are identical to exact float64 transport."""
    spikes = {"click": [50, 120], "view": []}
    ev = _mk_events(spark, spikes)
    series = derive_series(ev, partition_cols=["event_type"], ts_col="ts", bucket="1 hour",
                           value_exprs={"event_rate": F.count(F.lit(1)).cast("double")})
    f32 = {(r["series_key"], r["idx"]): r["is_anomaly"]
           for r in score_drift(series, granularity="hourly", transport_dtype="float32").collect()}
    f64 = {(r["series_key"], r["idx"]): r["is_anomaly"]
           for r in score_drift(series, granularity="hourly", transport_dtype="float64").collect()}
    assert f32 == f64 and len(f32) > 0


def _mk_series(spark, groups: dict[tuple, list[float]]):
    """Series rows straight in the (partition_key, metric, idx, value) shape
    score_drift consumes, bypassing derive_series."""
    rows = []
    for (pk, metric), vals in groups.items():
        for i, v in enumerate(vals):
            rows.append((pk, metric, i, float(v)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["partition_key", "metric", "idx", "value"]))


def test_arrow_engine_groups_on_pair_not_joined_string(spark):
    """Distinct (partition_key, metric) pairs whose '/'-joined strings collide
    (partition values may contain '/') must be scored as SEPARATE series by
    both engines — the arrow engine once grouped on the joined string and
    silently merged them into one interleaved series."""
    spiky = [20.0] * 30
    spiky[10] = 300.0
    flat = [1000.0] * 30
    # both pairs join to the same public series_key "v/turn/rate"
    series = _mk_series(spark, {("v/turn", "rate"): spiky,
                                ("v", "turn/rate"): flat})
    a = sorted(score_drift(series, granularity="hourly", engine="arrow").collect(),
               key=lambda r: (r["idx"], r["value"]))
    b = sorted(score_drift(series, granularity="hourly", engine="pandas").collect(),
               key=lambda r: (r["idx"], r["value"]))
    assert len(a) == len(b) == 60
    for ra, rb in zip(a, b):
        assert ra["series_key"] == rb["series_key"] == "v/turn/rate"
        assert ra["value"] == rb["value"]
        assert ra["is_anomaly"] == rb["is_anomaly"], (ra["idx"], ra["value"])
    # scored independently: the flat series is quiet, the spike is flagged
    flat_rows = [r for r in a if r["value"] == 1000.0]
    assert flat_rows and not any(r["is_anomaly"] for r in flat_rows)
    assert any(r["is_anomaly"] and r["value"] == 300.0 for r in a)


def test_float32_transport_clamps_beyond_f32_range(spark):
    """|value| > f32-max clamps to a huge finite float instead of
    overflowing to Infinity (which would poison the kernel statistics);
    anomaly flags match the exact float64 transport."""
    vals = [10.0] * 30
    vals[15] = 1e39  # overflows a float32
    series = _mk_series(spark, {("p", "m"): vals})
    f32 = sorted(score_drift(series, granularity="hourly",
                             transport_dtype="float32").collect(),
                 key=lambda r: r["idx"])
    f64 = sorted(score_drift(series, granularity="hourly",
                             transport_dtype="float64").collect(),
                 key=lambda r: r["idx"])
    assert len(f32) == len(f64) == 30
    for r in f32:
        assert not np.isinf(r["value"]) and not np.isnan(r["value"])
    assert [r["is_anomaly"] for r in f32] == [r["is_anomaly"] for r in f64]
    assert f32[15]["is_anomaly"]
