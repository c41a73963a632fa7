"""Table sources (SURVEY.md §2 rows S1/S3/S4).

The reference ingests CSV fixtures with ``pd.read_csv`` + a timestamp index
(tests/test_demo.py:31,36,59) and casts every variable column to float
(common/data_processor.py:41-44).  Here the same contracts are Spark readers:
schema enforced at the scan (never inferSchema — a schema-inference pass reads
the whole input twice and produces type drift between runs), malformed rows
surfaced rather than silently dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from anomaly_detector_spark.schema import TRANSCRIPTS_SCHEMA


def read_transcripts_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Transcripts from parquet/Iceberg-style directories — the 100 TB path.
    Column pruning and predicate pushdown happen at the scan."""
    return spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(path)


def read_transcripts_csv(spark: SparkSession, path: str,
                         mode: str = "PERMISSIVE") -> DataFrame:
    """Transcripts from headered CSV (the reference's fixture format).

    PERMISSIVE keeps malformed rows as nulls so the downstream constraint
    checks (null_text / castability) report them as violations, mirroring how
    the reference surfaces bad values as request errors instead of dropping
    them; pass mode="FAILFAST" to hard-error like ``pd.read_csv`` would.
    """
    return (
        spark.read.schema(TRANSCRIPTS_SCHEMA)
        .options(header=True, mode=mode, timestampFormat="yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )


def read_multivariate_csv(spark: SparkSession, path: str,
                          ts_col: str = "timestamp") -> DataFrame:
    """MVAD-style wide CSV: a timestamp column + N variable columns, variables
    cast to double in sorted column order (MultiADDataProcessor.process,
    common/data_processor.py:30-44; fixture shape tests/test_demo.py:31).

    The header is read from the first file only (one tiny scan), then the
    full read runs with an explicit schema — no inferSchema pass over the
    data.  Uncastable values become NULL for fill_na to handle, matching the
    reference's float-cast contract.
    """
    header_df = spark.read.options(header=True).csv(path).limit(0)
    value_cols = sorted(c for c in header_df.columns if c != ts_col)
    df = spark.read.options(header=True).csv(path)
    # try_cast, not cast: under ANSI mode a malformed cell would fail the job;
    # the contract is uncastable -> NULL, surfaced to fill_na / null checks.
    return df.select(
        F.to_timestamp(F.col(ts_col)).alias(ts_col),
        *[F.col(c).try_cast("double").alias(c) for c in value_cols],
    )
