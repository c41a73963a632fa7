"""Checkpoint / resume with per-partition lineage + metrics tables.

North-rule requirement: runs are resumable from a snapshot with per-partition
lineage.  Implemented storage-agnostically over any atomic-append table sink
(Iceberg `writeTo(...).append()` in production; partitioned parquet
directories here, which the driver environment supports):

- `_lineage`  : one row per (run_id, partition_key, check) that COMPLETED.
- `_metrics`  : per-run counters and timings.
- resume      : anti-join the pending partition list against `_lineage` of
  prior runs — only unfinished partitions are re-validated (SURVEY.md §4,
  checkpoint/resume paragraph).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("check", T.StringType(), False),
        T.StructField("passed", T.BooleanType(), True),
        T.StructField("completed_at", T.DoubleType(), True),
    ]
)


class CheckpointStore:
    """Parquet-directory-backed lineage/metrics store with append-only writes."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.lineage_path = os.path.join(root, "_lineage")
        self.metrics_path = os.path.join(root, "_metrics")

    def record(self, run_id: str, verdicts: DataFrame) -> None:
        """Append completed partition verdicts to the lineage table."""
        rows = verdicts.select(
            F.lit(run_id).alias("run_id"),
            F.col("partition_key"),
            F.col("check"),
            F.col("passed"),
            F.lit(time.time()).alias("completed_at"),
        )
        rows.write.mode("append").parquet(self.lineage_path)

    def record_metrics(self, run_id: str, metrics: dict) -> None:
        pdf = [(run_id, k, float(v)) for k, v in metrics.items()]
        self.spark.createDataFrame(pdf, "run_id string, metric string, value double") \
            .write.mode("append").parquet(self.metrics_path)

    def lineage(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.lineage_path)
        except Exception:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)

    def pending(self, partitions: DataFrame, check: str,
                key_col: str = "partition_key") -> DataFrame:
        """Partitions not yet completed for ``check`` (any prior run).

        Anti-join on the distinct completed set — the lineage side is
        aggregated first so the join input is one row per partition.
        """
        done = (
            self.lineage()
            .filter(F.col("check") == check)
            .select(F.col("partition_key").alias(key_col))
            .distinct()
        )
        return partitions.join(done, key_col, "left_anti")
