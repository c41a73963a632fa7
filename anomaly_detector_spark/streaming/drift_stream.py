"""Structured Streaming variant of the drift checks.

The reference has no true streaming — its LATEST mode re-runs the batch
pipeline per request (univariate_anomaly_detection.py:295-320, SURVEY.md
§2.14), i.e. micro-batch semantics.  This module expresses that as a real
Structured Streaming job:

- windowed per-partition aggregation with a watermark for late turns
- stateful last-point scoring via ``applyInPandasWithState`` (the
  reference's LATEST-mode ESD/z-score over the trailing window)

The state per series is a bounded trailing buffer (<= MAX_SERIES_POINTS,
the reference's own cap), so state size is O(#series x window).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STREAM_SCORE_SCHEMA = T.StructType(
    [
        T.StructField("series_key", T.StringType(), False),
        T.StructField("bucket_ts", T.TimestampType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("expected_value", T.DoubleType(), True),
        T.StructField("is_anomaly", T.BooleanType(), True),
        T.StructField("n_state_points", T.IntegerType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("values", T.ArrayType(T.DoubleType()), True),
    ]
)


def windowed_series(stream_df: DataFrame, partition_cols: list[str], ts_col: str = "ts",
                    bucket: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked windowed aggregation -> long-format series updates."""
    agg = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*partition_cols, F.window(F.col(ts_col), bucket).alias("w"))
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
    )
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("null")) for c in partition_cols]
    return agg.select(
        F.concat_ws("/", *parts).alias("series_key"),
        F.col("w.start").alias("bucket_ts"),
        "value",
    )


def _score_latest(key, pdf_iter, state: GroupState):
    """Stateful latest-point scoring: keep a trailing buffer per series and
    score each arriving bucket with the reference's latest-mode detector."""
    from anomaly_detector_spark.kernels.detect import dynamic_threshold_detection
    from anomaly_detector_spark.kernels.trend import trend_detection
    from anomaly_detector_spark.schema import MAX_SERIES_POINTS, MIN_SERIES_POINTS

    if state.exists:
        (values,) = state.get
        values = list(values)
    else:
        values = []
    out_rows = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("bucket_ts")
        for _, row in pdf.iterrows():
            values.append(float(row["value"]))
            if len(values) > MAX_SERIES_POINTS:
                values = values[-MAX_SERIES_POINTS:]
            if len(values) >= MIN_SERIES_POINTS:
                try:
                    res, _ = dynamic_threshold_detection(
                        values, trend_detection(values), alpha=0.05,
                        max_anomaly_ratio=0.25, last_value=values[-1],
                    )
                    expected = float(res["expected_value"][-1])
                    is_anom = bool(res["is_anomaly"][-1])
                except Exception:
                    expected, is_anom = float("nan"), False
            else:
                expected, is_anom = float("nan"), False
            out_rows.append(
                {
                    "series_key": key[0],
                    "bucket_ts": row["bucket_ts"],
                    "value": float(row["value"]),
                    "expected_value": expected,
                    "is_anomaly": is_anom,
                    "n_state_points": len(values),
                }
            )
    state.update((values,))
    yield pd.DataFrame(out_rows, columns=[f.name for f in STREAM_SCORE_SCHEMA.fields])


def score_stream(series_updates: DataFrame) -> DataFrame:
    """Latest-mode drift scoring over a stream of series updates."""
    return series_updates.groupBy("series_key").applyInPandasWithState(
        _score_latest,
        outputStructType=STREAM_SCORE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
