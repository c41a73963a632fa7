"""MVAD dataflow-shell operators — the reference's multivariate pipeline
minus the torch network, as pure DataFrame/Window plans (SURVEY.md §2 rows
S2, F8, W4-W8, W5/M13, M12, M14, A7).

The reference's MVAD model is a torch GAT/VAE; what IS portable to a Spark
engine — and what BASELINE names (the rolling-quantile drift-threshold op) —
is the dataflow around it: ingest normalization, NaN filling, per-variable
pct-weights, sliding-window extraction, the thresholding / severity /
contributor post-processing.  Each op here is a window/agg expression over a
long- or wide-form DataFrame; every windowed op takes ``partition_cols`` so
the plan shards by series key at scale (a window without partitioning is a
single task).

Reference files: multivariate/util.py:28-92, multivariate/model.py:228-273 +
422-506, multivariate/dataset.py:51-82, common/data_processor.py:30-61,
multivariate/contract.py:9-19.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

# contract.py:9-19
TRAIN_CLIP_MIN, TRAIN_CLIP_MAX = 0.0, 1.0
INFERENCE_CLIP_MIN, INFERENCE_CLIP_MAX = -1000.0, 1000.0
ANOMALY_UPPER_THRESHOLD = 0.5
ANOMALY_LOWER_THRESHOLD = 0.3
TOP_ATTENTION_COUNT = 10
MAX_PCT_WEIGHT = 1.9  # util.py:47


def _w(partition_cols: list[str] | None, order_col: str) -> Window:
    cols = partition_cols or []
    return Window.partitionBy(*cols).orderBy(order_col)


def mvad_ingest(df: DataFrame, ts_col: str, value_cols: list[str] | None = None) -> DataFrame:
    """S2 — MultiADDataProcessor.process (data_processor.py:30-36): sort rows
    by timestamp, variables in sorted column order, values cast to double."""
    if value_cols is None:
        value_cols = [c for c in df.columns if c != ts_col]
    ordered = sorted(value_cols)
    # No trailing orderBy: a global sort costs a RangePartitioner sampling
    # pass and every downstream window re-sorts on ts anyway; callers that
    # need presentation order sort at the sink.
    return df.select(ts_col, *[F.col(c).cast("double").alias(c) for c in ordered])


def ffill(df: DataFrame, cols: list[str], order_col: str,
          partition_cols: list[str] | None = None) -> DataFrame:
    """W8 — forward fill: last non-null value at or before the row
    (``last(ignorenulls) over (unboundedPreceding, 0)``)."""
    w = _w(partition_cols, order_col).rowsBetween(Window.unboundedPreceding, 0)
    return df.select(
        *[c for c in df.columns if c not in cols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in cols],
    )


def bfill(df: DataFrame, cols: list[str], order_col: str,
          partition_cols: list[str] | None = None) -> DataFrame:
    """W8 — backward fill: first non-null value at or after the row."""
    w = _w(partition_cols, order_col).rowsBetween(0, Window.unboundedFollowing)
    return df.select(
        *[c for c in df.columns if c not in cols],
        *[F.first(c, ignorenulls=True).over(w).alias(c) for c in cols],
    )


def fill_na(df: DataFrame, cols: list[str], order_col: str, method: str = "Linear",
            fill_value: float = 0.0, partition_cols: list[str] | None = None) -> DataFrame:
    """F8 — MultiADDataProcessor.fill_na (data_processor.py:38-61).

    Previous = ffill then bfill; Subsequent = bfill then ffill;
    Linear = pandas ``interpolate(method='linear', limit_direction='both')``
    semantics — interior nulls linearly interpolated between nearest valid
    neighbours by row distance, leading/trailing nulls clamped to the nearest
    valid value; Fixed = constant.  All methods end with fillna(0), matching
    the reference's trailing ``fillna(0)``.
    """
    keep = [c for c in df.columns if c not in cols]
    if method == "Previous":
        out = bfill(ffill(df, cols, order_col, partition_cols), cols, order_col, partition_cols)
    elif method == "Subsequent":
        out = ffill(bfill(df, cols, order_col, partition_cols), cols, order_col, partition_cols)
    elif method == "Fixed":
        out = df.select(*keep, *[F.coalesce(F.col(c), F.lit(float(fill_value))).alias(c) for c in cols])
    elif method == "Linear":
        w = _w(partition_cols, order_col)
        rn = F.row_number().over(w)
        df2 = df.withColumn("_rn", rn)
        wprev = _w(partition_cols, order_col).rowsBetween(Window.unboundedPreceding, 0)
        wnext = _w(partition_cols, order_col).rowsBetween(0, Window.unboundedFollowing)
        exprs = []
        for c in cols:
            rn_if_valid = F.when(F.col(c).isNotNull(), F.col("_rn"))
            prev_v = F.last(c, ignorenulls=True).over(wprev)
            prev_rn = F.last(rn_if_valid, ignorenulls=True).over(wprev)
            next_v = F.first(c, ignorenulls=True).over(wnext)
            next_rn = F.first(rn_if_valid, ignorenulls=True).over(wnext)
            interp = (
                F.when(F.col(c).isNotNull(), F.col(c))
                .when(prev_v.isNull(), next_v)          # leading -> first valid
                .when(next_v.isNull(), prev_v)          # trailing -> last valid
                .otherwise(
                    prev_v + (next_v - prev_v) * (F.col("_rn") - prev_rn) / (next_rn - prev_rn)
                )
            )
            exprs.append(interp.alias(c))
        out = df2.select(*keep, *exprs)
    else:
        raise ValueError(f"fill_na_method {method} is not supported.")
    return out.select(*keep, *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in cols])


def pct_weight(df: DataFrame, value_cols: list[str], window: int, order_col: str,
               partition_cols: list[str] | None = None) -> DataFrame:
    """W4 — get_multiple_variables_pct_weight_score (util.py:46-76).

    Per variable: s = v + 1e-4; d1 = max(|lag(s)/s - 1|, |lead(s)/s - 1|)
    (NaN where either neighbour is missing, matching np.maximum NaN
    propagation); d2 = clip(d1, 0, 2); rolling full-window max (NaN while the
    window is incomplete or contains a NaN, matching pandas min_periods);
    pct = mean of the valid rolling maxima.  Then the reweight rule: weight
    is 1 unless pct > 1.9, in which case it is (#vars over 1.9)/#vars.

    One pass: long-form (variable, value), windows partitioned by variable —
    scales with #variables × series length, shuffle carries (key, double).
    """
    stack_expr = F.explode(F.array(*[
        F.struct(F.lit(c).alias("variable"), (F.col(c).cast("double") + F.lit(0.0001)).alias("s"))
        for c in sorted(value_cols)
    ])).alias("kv")
    part = list(partition_cols or [])
    long_df = df.select(*part, order_col, stack_expr).select(
        *part, order_col, "kv.variable", "kv.s"
    )
    w = Window.partitionBy(*part, "variable").orderBy(order_col)
    lag_s = F.lag("s").over(w)
    lead_s = F.lead("s").over(w)
    # NULL when either neighbour is missing (np.maximum NaN propagation);
    # the clip stays inside the guard because Spark's least/greatest SKIP
    # nulls rather than propagate them.
    d2 = F.when(
        F.col("s").isNotNull() & lag_s.isNotNull() & lead_s.isNotNull(),
        F.least(
            F.greatest(F.abs(lag_s / F.col("s") - 1), F.abs(lead_s / F.col("s") - 1)),
            F.lit(2.0),
        ),
    )
    wroll = w.rowsBetween(-(window - 1), 0)
    scored = long_df.withColumn("_d2", d2).withColumn("_rn", F.row_number().over(w))
    valid = (F.col("_rn") >= window) & (F.count("_d2").over(wroll) == window)
    rolled = scored.withColumn(
        "_roll", F.when(valid, F.max("_d2").over(wroll))
    )
    per_var = rolled.groupBy(*part, "variable").agg(F.avg("_roll").alias("pct_weight_raw"))
    wpart = Window.partitionBy(*part)
    reweight = (
        F.sum(F.when(F.col("pct_weight_raw") > MAX_PCT_WEIGHT, 1).otherwise(0)).over(wpart)
        / F.count(F.lit(1)).over(wpart)
    )
    return per_var.withColumn(
        "weight",
        F.when(F.col("pct_weight_raw") > MAX_PCT_WEIGHT, reweight).otherwise(F.lit(1.0)),
    )


def minmax_normalize_cols(df: DataFrame, value_cols: list[str], clip_min: float,
                          clip_max: float,
                          partition_cols: list[str] | None = None) -> DataFrame:
    """util.py:35-43 — (v - min)/(max - min + 1e-8), clipped; min/max computed
    over the partition (the reference passes train-set min/max in)."""
    wpart = Window.partitionBy(*(partition_cols or []))
    out = df
    for c in value_cols:
        norm = (F.col(c) - F.min(c).over(wpart)) / (F.max(c).over(wpart) - F.min(c).over(wpart) + F.lit(1e-8))
        out = out.withColumn(c, F.least(F.greatest(norm, F.lit(clip_min)), F.lit(clip_max)))
    return out


def sliding_windows(df: DataFrame, value_cols: list[str], order_col: str,
                    window_size: int, interval: int = 10, horizon: int = 1,
                    partition_cols: list[str] | None = None,
                    normalize: bool = True,
                    clip_min: float = TRAIN_CLIP_MIN,
                    clip_max: float = TRAIN_CLIP_MAX) -> DataFrame:
    """W7 — MultiADDataset window extraction (dataset.py:51-82).

    Emits one row per sample: x_<var> = the trailing ``window_size`` values
    (range [hi-window_size, hi) of the 0-based series), y_<var> = the value at
    hi - 1 + horizon, both min-max normalized and clipped exactly like
    ``minmax_normalize`` (util.py:35-43).  Sample upper bounds hi =
    window_size + j*interval for j in range(L // interval), L = n - horizon +
    1 - window_size — including the reference's floor cap that drops trailing
    windows when ``interval`` does not divide L.

    ``collect_list over rowsBetween`` keeps the whole plan JVM-side; rows per
    partition are bounded by the series length, arrays by window_size.
    """
    part = list(partition_cols or [])
    cols = sorted(value_cols)
    work = df.select(*part, order_col, *[F.col(c).cast("double").alias(c) for c in cols])
    if normalize:
        work = minmax_normalize_cols(work, cols, clip_min, clip_max, part)
    w = Window.partitionBy(*part).orderBy(order_col)
    wpart = Window.partitionBy(*part)
    wtrail = w.rowsBetween(-(window_size - 1), 0)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wpart)
    work = work.select(
        *part, order_col,
        rn.alias("_rn"), n.alias("_n"),
        *[F.collect_list(c).over(wtrail).alias(f"x_{c}") for c in cols],
        *[F.lead(c, horizon).over(w).alias(f"y_{c}") for c in cols],
    )
    big_l = F.col("_n") - horizon + 1 - window_size
    j = (F.col("_rn") - window_size) / interval
    keep = (
        (F.col("_rn") >= window_size)
        & ((F.col("_rn") - window_size) % interval == 0)
        & (j < F.floor(big_l / interval))
    )
    return work.filter(keep).select(
        *part,
        F.col("_rn").alias("window_end"),
        *[f"x_{c}" for c in cols],
        *[f"y_{c}" for c in cols],
    )


def rolling_quantile_threshold(df: DataFrame, score_col: str, order_col: str,
                               threshold_window: int, p: float = 0.95,
                               partition_cols: list[str] | None = None) -> DataFrame:
    """W5 — the drift-threshold op (model.py:246-253 + util.py:28-32).

    get_threshold is the order statistic sorted(scores)[int(len*p)] over a
    trailing window of raw scores.  The reference pairs the score at 0-based
    index tw-1+k with the window of scores ENDING at index k (a tw-1 lag) and
    drops the first tw-1 scores; ``threshold`` here reproduces that exactly:
    threshold(rn) = orderstat(scores[rn-tw+1-(tw-1) .. rn-(tw-1)]).

    ``sort_array(collect_list(...))`` over the trailing window keeps the op
    JVM-side; cost is O(tw log tw) per row with tw = 200 by default.
    """
    part = list(partition_cols or [])
    w = Window.partitionBy(*part).orderBy(order_col)
    lag_amt = threshold_window - 1
    wlag = w.rowsBetween(-(threshold_window - 1) - lag_amt, -lag_amt)
    rn = F.row_number().over(w)
    window_vals = F.sort_array(F.collect_list(score_col).over(wlag))
    thr = F.element_at(window_vals, (F.floor(F.size(window_vals) * p) + 1).cast("int"))
    return (
        df.withColumn("_rn", rn)
        .withColumn("threshold", thr)
        .filter(F.col("_rn") >= threshold_window)
        .drop("_rn")
    )


def mvad_anomaly_rule(df: DataFrame, score_col: str = "score",
                      threshold_col: str = "threshold",
                      train_threshold: float = 0.0) -> DataFrame:
    """M13 — (s >= rolling_threshold AND s >= hard_lower) OR s > hard_upper,
    hard_upper = max(0.5, train_thr), hard_lower = min(0.3, train_thr)
    (model.py:228-229, 256-261)."""
    hard_upper = max(ANOMALY_UPPER_THRESHOLD, train_threshold)
    hard_lower = min(ANOMALY_LOWER_THRESHOLD, train_threshold)
    s, t = F.col(score_col), F.col(threshold_col)
    return df.withColumn(
        "is_anomaly",
        ((s >= t) & (s >= F.lit(hard_lower))) | (s > F.lit(hard_upper)),
    )


def mvad_severity(df: DataFrame, score_col: str = "score",
                  anomaly_col: str = "is_anomaly") -> DataFrame:
    """M12 — severity = score/(e-1), zeroed for non-anomalies
    (util.py:91-92, model.py:262-263)."""
    return df.withColumn(
        "severity",
        F.when(F.col(anomaly_col), F.col(score_col) / F.lit(math.e - 1)).otherwise(F.lit(0.0)),
    )


def contributor_scores(df: DataFrame, rmse_array_col: str,
                       out_col: str = "contributor_scores") -> DataFrame:
    """M14 — per-variable rmse share normalized by the row sum
    (model.py:240-243)."""
    arr = F.col(rmse_array_col)
    total = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)
    return df.withColumn(out_col, F.transform(arr, lambda x: x / total))


def top_k_contributors(df: DataFrame, scores_col: str, variable_names: list[str],
                       k: int | None = None,
                       out_col: str = "interpretation") -> DataFrame:
    """A7 — contributors sorted by score desc, renormalized by the total
    (model.py:432-441: gather(desc) / sum(all)), packed as
    [{variable_name, contribution_score}] (model.py:478-497 minus the
    attention correlation, which needs the torch attention maps)."""
    names = F.array(*[F.lit(v) for v in variable_names])
    arr = F.col(scores_col)
    total = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)
    pairs = F.zip_with(
        arr, names,
        lambda s, v: F.struct((-s).alias("neg"), v.alias("variable_name"), (s / total).alias("contribution_score")),
    )
    ranked = F.transform(
        F.array_sort(pairs),
        lambda p: F.struct(p["variable_name"].alias("variable_name"),
                           p["contribution_score"].alias("contribution_score")),
    )
    if k is not None:
        ranked = F.slice(ranked, 1, k)
    return df.withColumn(out_col, ranked)


def rolling_attention_delta(df: DataFrame, col: str, order_col: str,
                            threshold_window: int,
                            partition_cols: list[str] | None = None,
                            out_col: str = "attn_delta") -> DataFrame:
    """W6 — value minus its trailing threshold_window mean (model.py:264-273:
    unfold(0, tw, 1).mean(-1) is the window ending at the current row)."""
    part = list(partition_cols or [])
    w = Window.partitionBy(*part).orderBy(order_col).rowsBetween(-(threshold_window - 1), 0)
    return df.withColumn(out_col, F.col(col) - F.avg(col).over(w))
