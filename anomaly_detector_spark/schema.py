"""Canonical schemas for the validation engine.

The primary input is a table of multi-turn conversation / agent transcripts
(one row per turn).  The reference engine's "univariate series" maps onto the
long-format drift series derived from this table (cf.
/root/reference/src/anomaly_detector/univariate/univariate_anomaly_detection.py:57-62,
where a series is a list of ``{"timestamp", "value"}`` records).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input table of transcripts: one row per turn.
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Conversation registry for referential-integrity checks.
REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("created_ts", T.TimestampType(), True),
    ]
)

# Long-format derived drift series (one group == one reference "series").
SERIES_SCHEMA = T.StructType(
    [
        T.StructField("series_key", T.StringType(), False),
        T.StructField("idx", T.IntegerType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

# Violation rows emitted by constraint checks, in stable (conv_id, turn_idx)
# order (cf. reference result ordering univariate_anomaly_detection.py:269).
VIOLATIONS_SCHEMA = T.StructType(
    [
        T.StructField("check", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("column", T.StringType(), True),
        T.StructField("detail", T.StringType(), True),
    ]
)

# Per-partition verdicts (pass/fail + drift score), mirroring the reference's
# per-point result dicts rolled up to partitions.
VERDICTS_SCHEMA = T.StructType(
    [
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("check", T.StringType(), False),
        T.StructField("passed", T.BooleanType(), False),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("detail", T.StringType(), True),
    ]
)

ROLE_DOMAIN = ["user", "assistant", "system", "tool"]
TOOL_DOMAIN = ["bash", "search", "edit", "browser", "python", "none"]

# Value bounds enforced by the reference
# (univariate/util/fields.py:36-37, univariate_anomaly_detection.py:66-67).
VALUE_LOWER_BOUND = -1.0e100
VALUE_UPPER_BOUND = 1.0e100
MIN_SERIES_POINTS = 12      # univariate_anomaly_detection.py:52-53
MAX_SERIES_POINTS = 8640    # univariate_anomaly_detection.py:54-55
