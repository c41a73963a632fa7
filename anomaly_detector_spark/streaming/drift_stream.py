"""Structured Streaming variant of the drift checks.

The reference has no true streaming — its LATEST mode re-runs the batch
pipeline per request (univariate_anomaly_detection.py:295-320, SURVEY.md
§2.14), i.e. micro-batch semantics.  This module expresses that as a real
Structured Streaming job.

Design constraint that shaped the layout: Spark does NOT allow
``applyInPandasWithState`` after a streaming aggregation (append mode), so
the per-bucket aggregation cannot be a separate ``groupBy(window)`` stage.
Instead the stream stays one stateful operator: a stateless projection maps
each event to (series_key, bucket_ts), and the state function both
accumulates per-bucket counts AND scores each bucket once the key's max-seen
bucket epoch has advanced past it by more than the lateness delay (true
watermark semantics: multiple buckets inside the lateness horizon stay open
in state and keep absorbing out-of-order events across micro-batches).

State per series is a bounded trailing buffer (<= MAX_SERIES_POINTS, the
reference's own cap) plus the open buckets, so state size is
O(#series x window).

``windowed_series`` (watermarked groupBy(window)) is kept for update-mode
aggregation-only jobs where no stateful scoring follows.

CHECKPOINT COMPATIBILITY: the state row is the 4-field ``_STATE_SCHEMA``
(values, open_ts, open_counts, closed_through).  Checkpoints written by the
earlier 3-field close-on-advance layout CANNOT be deserialized by this
operator — restarting such a stream fails in state decoding.  Use a fresh
``checkpointLocation`` when upgrading.  Note also that the default
``lateness`` of "2 hours" delays a bucket's emission until the key's
max-seen bucket epoch passes it by that horizon; pass ``lateness="0
seconds"`` for the old close-as-soon-as-advanced behavior.
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
        T.StructField("open_ts", T.ArrayType(T.LongType()), True),
        T.StructField("open_counts", T.ArrayType(T.DoubleType()), True),
        T.StructField("closed_through", T.LongType(), True),
    ]
)

_BUCKET_TRUNC = {"1 hour": "hour", "1 minute": "minute", "1 day": "day",
                 "1 week": "week", "1 month": "month"}


def bucketed_events(stream_df: DataFrame, partition_cols: list[str], ts_col: str = "ts",
                    bucket: str = "1 hour") -> DataFrame:
    """Stateless projection: event -> (series_key, bucket_ts).  No shuffle,
    no state — the stateful scorer does the counting."""
    trunc = _BUCKET_TRUNC[bucket]
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("null")) for c in partition_cols]
    return stream_df.select(
        F.concat_ws("/", *parts).alias("series_key"),
        F.date_trunc(trunc, F.col(ts_col)).alias("bucket_ts"),
    )


def windowed_series(stream_df: DataFrame, partition_cols: list[str], ts_col: str = "ts",
                    bucket: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked windowed aggregation -> long-format series updates
    (update/complete-mode aggregation jobs; cannot precede the stateful
    scorer in one query — see module docstring)."""
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


def _score_one(values: list) -> tuple[float, bool]:
    from anomaly_detector_spark.kernels.detect import dynamic_threshold_detection
    from anomaly_detector_spark.kernels.trend import trend_detection
    from anomaly_detector_spark.schema import MIN_SERIES_POINTS

    if len(values) < MIN_SERIES_POINTS:
        return float("nan"), False
    try:
        res, _ = dynamic_threshold_detection(
            values, trend_detection(values), alpha=0.05,
            max_anomaly_ratio=0.25, last_value=values[-1],
        )
        return float(res["expected_value"][-1]), bool(res["is_anomaly"][-1])
    except Exception:
        return float("nan"), False


def _score_latest(key, pdf_iter, state: GroupState, lateness_seconds: int = 0):
    """Stateful bucket counting + latest-point scoring with lateness tolerance.

    A bucket closes only once the max-seen bucket epoch for the key has
    advanced past it by more than ``lateness_seconds`` — true watermark
    semantics: an event arriving in a LATER micro-batch for a bucket still
    inside the lateness horizon is counted, not dropped.  Closed buckets are
    scored in timestamp order (count appended to the trailing value buffer,
    reference latest-mode detector); buckets at or before the persisted
    ``closed_through`` epoch are late beyond the horizon and dropped,
    matching what a watermarked windowed aggregation would do.
    """
    from anomaly_detector_spark.schema import MAX_SERIES_POINTS

    if state.exists:
        values, open_ts, open_counts, closed_through = state.get
        values = list(values)
        open_buckets = dict(zip(open_ts, open_counts))
    else:
        values, open_buckets, closed_through = [], {}, None

    for pdf in pdf_iter:
        counts = pdf.groupby("bucket_ts").size()
        for ts, cnt in counts.items():
            epoch = int(pd.Timestamp(ts).value // 1_000_000_000)
            if closed_through is not None and epoch <= closed_through:
                continue  # late past the lateness horizon: dropped
            open_buckets[epoch] = open_buckets.get(epoch, 0.0) + float(cnt)

    out_rows = []
    if open_buckets:
        horizon = max(open_buckets) - lateness_seconds
        for epoch in sorted(b for b in open_buckets if b < horizon):
            cnt = open_buckets.pop(epoch)
            closed_through = epoch if closed_through is None else max(closed_through, epoch)
            values.append(cnt)
            if len(values) > MAX_SERIES_POINTS:
                values = values[-MAX_SERIES_POINTS:]
            expected, is_anom = _score_one(values)
            out_rows.append(
                {
                    "series_key": key[0],
                    "bucket_ts": pd.Timestamp(epoch, unit="s"),
                    "value": cnt,
                    "expected_value": expected,
                    "is_anomaly": is_anom,
                    "n_state_points": len(values),
                }
            )
    state.update((values, list(open_buckets.keys()), list(open_buckets.values()),
                  closed_through))
    yield pd.DataFrame(out_rows, columns=[f.name for f in STREAM_SCORE_SCHEMA.fields])


def score_stream(events: DataFrame, lateness: str = "2 hours") -> DataFrame:
    """Latest-mode drift scoring over a stream of bucketed events
    (``bucketed_events`` output).  ``lateness`` is the out-of-order tolerance
    (watermark delay): buckets stay open — and keep absorbing late events —
    until the key's max-seen bucket epoch passes them by more than this."""
    units = {"second": 1, "seconds": 1, "minute": 60,
             "minutes": 60, "hour": 3600, "hours": 3600,
             "day": 86400, "days": 86400}
    try:
        n, unit = lateness.split()
        lateness_seconds = int(n) * units[unit]
    except (ValueError, KeyError):
        raise ValueError(
            f"invalid lateness {lateness!r}: expected '<n> <unit>' with unit "
            f"one of {sorted(set(units))} (e.g. '2 hours', '90 minutes'), "
            "matching withWatermark's '<n> <unit>' style"
        ) from None

    def fn(key, pdf_iter, state):
        return _score_latest(key, pdf_iter, state, lateness_seconds)

    return events.groupBy("series_key").applyInPandasWithState(
        fn,
        outputStructType=STREAM_SCORE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
