"""Per-column statistics — one pass over the table, all JVM-side.

Re-expresses the reference's per-series summary statistics (mean/std/median,
histogram majority ratio, quantiles; cf.
/root/reference/src/anomaly_detector/univariate/model/detect_model.py:107-114,
detectors/z_score.py:16-20, spectral_residual.py:119-120) as whole-table
grouped aggregations:

- null-rate           : avg(isnull)               (reference V4 analogue)
- cardinality         : approx_count_distinct     (HyperLogLog++ sketch)
- min/max/avg/stddev  : built-in aggs
- quantiles           : approx_percentile (KLL-style sketch) or exact
- majority ratio      : 20-bin histogram max-bin share (detect_model.py:107-114)

Everything is a single shuffle-free scan + partial/final agg; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_stats(df: DataFrame, numeric_cols: list[str], string_cols: list[str] | None = None,
                 exact_quantiles: bool = False, group_by: list[str] | None = None) -> DataFrame:
    """One row per input group (or a single global row) with per-column stats.

    Uses sketches (HLL, approx quantiles) by default — the 100 TB path; pass
    ``exact_quantiles=True`` for oracle-comparable exact results at test scale.
    """
    string_cols = string_cols or []
    aggs: list[Column] = [F.count(F.lit(1)).alias("row_count")]
    for c in numeric_cols:
        col = F.col(c)
        isnull = F.when(col.isNull() | F.isnan(col.cast("double")), 1.0).otherwise(0.0)
        quant = (
            F.expr(f"percentile({c}, array(0.25, 0.5, 0.75))")
            if exact_quantiles
            else F.expr(f"approx_percentile({c}, array(0.25, 0.5, 0.75), 10000)")
        )
        aggs += [
            F.round(F.avg(isnull), 6).alias(f"{c}_null_rate"),
            F.min(col).alias(f"{c}_min"),
            F.max(col).alias(f"{c}_max"),
            F.round(F.avg(col), 6).alias(f"{c}_avg"),
            F.round(F.stddev_pop(col), 6).alias(f"{c}_stddev"),
            quant.alias(f"{c}_quantiles"),
        ]
    for c in string_cols:
        col = F.col(c)
        aggs += [
            F.round(F.avg(F.when(col.isNull(), 1.0).otherwise(0.0)), 6).alias(f"{c}_null_rate"),
            F.approx_count_distinct(col).alias(f"{c}_approx_cardinality"),
            F.round(F.avg(F.length(col)), 6).alias(f"{c}_avg_length"),
        ]
    grouped = df.groupBy(*[F.col(g) for g in (group_by or [])])
    return grouped.agg(*aggs)


def majority_ratio(df: DataFrame, value_col: str, bins: int = 20) -> DataFrame:
    """Share of the densest of ``bins`` equal-width buckets.

    Port of the reference's histogram majority gate
    (detect_model.py:107-114: ``np.histogram(values, bins=20)`` then
    ``max(counts)/len(values)``); numpy's last bin is closed so the max value
    falls in bin ``bins-1``.  Two-stage agg: min/max first (broadcast as a
    cross join of one row), then bucket counts — still two scans but no
    driver collect.
    """
    bounds = df.agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi"), F.count(F.lit(1)).alias("_n")
    )
    bucket = F.least(
        F.floor((F.col(value_col) - F.col("_lo")) / ((F.col("_hi") - F.col("_lo")) / bins)).cast("int"),
        F.lit(bins - 1),
    )
    counts = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_bucket", F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(bucket))
        .groupBy("_bucket")
        .agg(F.count(F.lit(1)).alias("_cnt"), F.first("_n").alias("_n"))
    )
    return counts.agg(
        F.round((F.max("_cnt") / F.first("_n")), 6).alias("majority_ratio"),
        F.max("_cnt").alias("majority_count"),
    )
