"""Bucketed table storage — shuffle-free co-located joins and aggregations.

At 10^12-turn scale the dominant shuffle is the (conv_id, turn_idx)-keyed
work: uniqueness, turn-gap windows, per-conversation rollups, and joins
against conversation-level dimensions.  Writing the transcripts table
bucketed by conv_id (Spark `bucketBy` — the parquet/Hive analogue of an
Iceberg bucket partition transform) makes that partitioning DURABLE: every
reader gets hash-clustered files, so joins and aggregations on conv_id plan
with NO Exchange on the bucketed side(s).

The same idea back-ends the IVF similarity path (bucket by cluster_id) and
the dedup band tables (bucket by band_key).

Spark requires `saveAsTable` (a metastore entry) for bucketed writes; the
default embedded catalog with a local warehouse dir is used in tests, a real
deployment points `spark.sql.warehouse.dir` / catalog at its lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 64, sort_cols: list[str] | None = None,
                   mode: str = "overwrite", fmt: str = "parquet") -> None:
    """Persist ``df`` hash-bucketed by ``bucket_cols`` (optionally sorted
    within buckets — e.g. (conv_id) buckets sorted by (conv_id, turn_idx)
    make per-conversation window scans sequential reads)."""
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; Spark's relation carries the bucket spec, so
    downstream joins/aggs on the bucket keys skip their Exchange."""
    return spark.table(table)


