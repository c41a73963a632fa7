"""Deterministic synthetic transcripts generator — pure Spark, no external data.

Built entirely from ``spark.range`` + hash-derived columns so the same
(n_convs, seed) always yields byte-identical tables on any cluster size and
any partitioning (every column is a pure function of (conv_id, turn_idx)).

Planted violations (all rule-based, so tests know the exact expected rows):
- duplicate (conv_id, turn_idx) pairs        -> uniqueness check (SURVEY V7)
- out-of-domain role / tool values           -> domain checks (V9)
- NULL text                                  -> null-rate stat / V4
- out-of-order ts within a conversation      -> monotonicity check (V5)
- conv_ids missing from the registry         -> referential integrity (V12)

Skew: conversations whose index is divisible by HOT_EVERY get HOT_TURNS turns
(~1% of convs own a large share of rows), exercising salting / AQE skew paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOT_EVERY = 97          # conv index divisible by this => hot conversation
HOT_TURNS = 600         # turns in a hot conversation
BASE_TURNS = 8          # minimum turns per normal conversation
TURN_SPREAD = 24        # normal conversations have BASE_TURNS..BASE_TURNS+TURN_SPREAD-1
DUP_MOD = 997           # rows with pmod(row_hash, DUP_MOD)==0 are duplicated
BAD_ROLE_MOD = 499      # rows with pmod(row_hash, BAD_ROLE_MOD)==1 get role='robot'
BAD_TOOL_MOD = 587      # rows with pmod(row_hash, BAD_TOOL_MOD)==2 get tool='teleport'
NULL_TEXT_MOD = 211     # rows with pmod(row_hash, NULL_TEXT_MOD)==3 get NULL text
DISORDER_MOD = 601      # rows with pmod(row_hash, DISORDER_MOD)==4 get ts pushed back
UNREGISTERED_MOD = 41   # convs with pmod(conv_hash, UNREGISTERED_MOD)==5 not in registry
EPOCH = "2025-01-01 00:00:00"


def _conv_base(spark: SparkSession, n_convs: int, seed: int) -> DataFrame:
    """One row per conversation with its deterministic turn count and start."""
    return (
        spark.range(n_convs)
        .withColumnRenamed("id", "conv_idx")
        .withColumn("conv_id", F.format_string("c%08d", F.col("conv_idx")))
        .withColumn("conv_hash", F.xxhash64(F.col("conv_id"), F.lit(seed)))
        .withColumn(
            "n_turns",
            F.when(F.col("conv_idx") % HOT_EVERY == 0, F.lit(HOT_TURNS)).otherwise(
                BASE_TURNS + F.pmod(F.col("conv_hash"), F.lit(TURN_SPREAD)).cast("int")
            ),
        )
        .withColumn(
            "start_offset_s",
            F.pmod(F.col("conv_hash"), F.lit(14 * 24 * 3600)).cast("long"),
        )
    )


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    profile: str = "adversarial",
) -> DataFrame:
    """Deterministic transcripts table with planted violations.

    Returns columns exactly matching ``schema.TRANSCRIPTS_SCHEMA``.

    ``profile`` selects the timestamp model (everything else is identical):

    - ``"adversarial"`` (default, unchanged since round 1): each turn's ts is
      ``start + turn_idx * interval(row)`` with a per-ROW interval, so ~38%
      of turns are out of order by construction on top of the planted
      1/DISORDER_MOD backshifts.  This materializes ~12M violation rows per
      30.6M turns — an adversarial stress profile for the violation sink,
      and the input every scaling series through round 5 used.
    - ``"realistic"``: a per-CONVERSATION base interval plus bounded per-turn
      jitter (jitter < base) keeps timestamps strictly increasing except the
      planted backshifts, so the violation rate is <1% — the shape of a
      production transcript table.  Same schema, same planted duplicate /
      domain / null / referential rows, still a pure function of
      (conv_id, turn_idx, seed).
    """
    if profile not in ("adversarial", "realistic"):
        raise ValueError(f"unknown synth profile: {profile!r}")
    conv = _conv_base(spark, n_convs, seed)
    rows = conv.select(
        "conv_id",
        "conv_hash",
        "start_offset_s",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    row_hash = F.xxhash64("conv_id", "turn_idx", F.lit(seed))
    rows = rows.withColumn("row_hash", row_hash)

    role = (
        F.when(F.pmod(F.col("row_hash"), F.lit(BAD_ROLE_MOD)) == 1, F.lit("robot"))
        .when(F.col("turn_idx") == 0, F.lit("system"))
        .when(F.col("turn_idx") % 2 == 1, F.lit("user"))
        .when(F.pmod(F.col("row_hash"), F.lit(5)) == 0, F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )
    tool = (
        F.when(F.pmod(F.col("row_hash"), F.lit(BAD_TOOL_MOD)) == 2, F.lit("teleport"))
        .when(
            role == "tool",
            F.element_at(
                F.array(*[F.lit(x) for x in ["bash", "search", "edit", "browser", "python"]]),
                (F.pmod(F.col("row_hash"), F.lit(5)) + 1).cast("int"),
            ),
        )
        .otherwise(F.lit("none"))
    )
    # Deterministic pseudo-text keyed by (conv_id, turn_idx): repeatable words,
    # length varies with the hash (lognormal-ish via squaring a uniform).
    text_len_words = (F.pmod(F.col("row_hash"), F.lit(13)) + 1) * (
        F.pmod(F.shiftright(F.col("row_hash"), 7), F.lit(11)) + 1
    )
    text = F.when(
        F.pmod(F.col("row_hash"), F.lit(NULL_TEXT_MOD)) == 3, F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            F.format_string("turn %s/%s ", F.col("conv_id"), F.col("turn_idx")),
            F.repeat(
                F.concat(F.lit("w"), F.pmod(F.col("row_hash"), F.lit(100)).cast("string"), F.lit(" ")),
                text_len_words.cast("int"),
            ),
        )
    )
    if profile == "adversarial":
        turn_interval_s = 30 + F.pmod(F.col("row_hash"), F.lit(90))
        elapsed_s = F.col("turn_idx") * turn_interval_s
    else:  # realistic: strictly increasing within a conversation
        base_interval_s = 30 + F.pmod(F.col("conv_hash"), F.lit(60))
        jitter_s = F.pmod(F.col("row_hash"), F.lit(29))  # 0..28 < base
        elapsed_s = F.col("turn_idx") * base_interval_s + jitter_s
    ts_seconds = (
        F.unix_timestamp(F.lit(EPOCH))
        + F.col("start_offset_s")
        + elapsed_s
        # planted disorder: some turns jump backwards in time
        - F.when(F.pmod(F.col("row_hash"), F.lit(DISORDER_MOD)) == 4, F.lit(7200)).otherwise(F.lit(0))
    )

    base = rows.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_seconds(ts_seconds).alias("ts"),
        "row_hash",
    )
    dups = base.filter(F.pmod(F.col("row_hash"), F.lit(DUP_MOD)) == 0)
    return base.unionAll(dups).drop("row_hash")


def synth_registry(spark: SparkSession, n_convs: int = 1000, seed: int = 42) -> DataFrame:
    """Conversation registry omitting a deterministic subset of conv_ids."""
    conv = _conv_base(spark, n_convs, seed)
    return (
        conv.filter(F.pmod(F.col("conv_hash"), F.lit(UNREGISTERED_MOD)) != 5)
        .select(
            "conv_id",
            F.timestamp_seconds(
                F.unix_timestamp(F.lit(EPOCH)) + F.col("start_offset_s")
            ).alias("created_ts"),
        )
    )
