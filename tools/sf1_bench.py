"""One-shot sf1.0-scale operator bench (VERDICT round-3 ask #7).

The driver testdata tops out at sf0.1, so this tool builds a deterministic
10x dataset in /tmp by replicating the sf0.1 tables with shifted keys
(valid for scan/shuffle/agg scaling curves — the data distribution per copy
is unchanged) and times the headline operator queries plus the validation
pipeline at 10x the usual turn count.  Results go to BENCH/sf1.json.

Usage: python tools/sf1_bench.py [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_synth"
COPIES = 10


def build(spark):
    os.makedirs(DST, exist_ok=True)
    # lineitem/orders for q1-style aggregation, documents for minhash;
    # key columns shifted per copy so uniqueness-sensitive ops stay honest
    plans = {
        "lineitem": ("l_orderkey", 100_000_000),
        "orders": ("o_orderkey", 100_000_000),
        "documents": ("doc_id", 10_000_000),
    }
    for table, (key, stride) in plans.items():
        out = f"{DST}/{table}.parquet"
        if os.path.isdir(out):
            continue
        base = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = [
            base.withColumn(key, F.col(key) + F.lit(i * stride)) for i in range(COPIES)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionAll(p)
        df.write.mode("overwrite").parquet(out)


def _pilot_stamp() -> dict:
    """Fresh-JVM Spark pilot record + clean flag (r5 verdict ask: sf1
    results must carry a clean or explicitly-qualified pilot trail)."""
    tools = os.path.join(os.path.dirname(os.path.abspath(__file__)))
    if tools not in sys.path:
        sys.path.insert(0, tools)
    from spark_pilot import min_tps, run_subprocess_pilot

    try:
        rec = run_subprocess_pilot()
        rec["clean"] = rec.get("tps", 0.0) >= min_tps()
    except Exception as e:  # noqa: BLE001 — a failed probe must not kill the bench
        rec = {"tps": 0.0, "clean": False, "error": type(e).__name__}
    print("pilot:", json.dumps(rec), flush=True)
    return rec


def main():
    from anomaly_detector_spark.data import synth_registry, synth_transcripts
    from anomaly_detector_spark.engine.runner import run_validation
    from anomaly_detector_spark.session import get_spark

    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    pilot_pre = _pilot_stamp()
    spark = get_spark(app_name="sf1-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)

    timings = {}

    def timed(name, mk):
        t0 = time.time()
        n = mk().count()
        timings[name] = {"wall_s": round(time.time() - t0, 2), "rows": n}
        print(f"{name}: {timings[name]}", flush=True)

    li = spark.read.parquet(f"{DST}/lineitem.parquet")

    def q1():
        return (
            li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum("l_extendedprice").alias("sum_base_price"),
                F.avg("l_discount").alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    timed("q1_sf1", q1)
    timed("q1_sf1_warm", q1)

    from anomaly_detector_spark.operators import constraints

    timed("uniqueness_sf1", lambda: constraints.uniqueness_violations(
        li.select(F.col("l_orderkey").alias("conv_id"), F.col("l_linenumber").alias("turn_idx")),
        ["conv_id", "turn_idx"],
    ))

    from anomaly_detector_spark.operators.dedup import minhash_lsh_pairs

    def mh():
        res = minhash_lsh_pairs(spark.read.parquet(f"{DST}/documents.parquet"),
                                jaccard_threshold=0.5)
        n = res.df.count()
        res.release()
        return _Counted(n)

    class _Counted:
        def __init__(self, n):
            self.n = n

        def count(self):
            return self.n

    timed("minhash_sf1", mh)

    # validation pipeline at 10x the bench turn count (sf1.0-equivalent);
    # materialized to parquet first so the timed region matches the
    # bench.py/scaling_run protocol (reading a table, not re-synthesizing
    # the input once per consumed output)
    n_convs = 400_000
    # both synth profiles: adversarial for round-4 comparability, realistic
    # (r6 default; ~1.4% violation rate) as the headline series
    for profile, key in (("adversarial", "validation_sf1"),
                         ("realistic", "validation_sf1_realistic")):
        tag = "" if profile == "adversarial" else f"_{profile}"
        tpath = f"/tmp/scaling_transcripts_{n_convs}{tag}.parquet"
        if not os.path.isdir(tpath):
            synth_transcripts(spark, n_convs=n_convs, seed=42,
                              profile=profile).write.mode(
                "overwrite").parquet(tpath)
        transcripts = spark.read.parquet(tpath)
        registry = synth_registry(spark, n_convs=n_convs, seed=42)
        t0 = time.time()
        res = run_validation(spark, transcripts, registry, cache_input=False)
        nv = res.verdicts.count()
        nviol = res.violations.count()
        wall = time.time() - t0
        res.release()
        n_turns = transcripts.count()
        timings[key] = {
            "wall_s": round(wall, 2), "n_turns": n_turns,
            "turns_per_sec": round(n_turns / wall, 1),
            "n_verdicts": nv, "n_violations": nviol,
            "input_profile": profile,
        }
        print(f"{key}: {timings[key]}", flush=True)

    pilot_post = _pilot_stamp()
    out = {"sf": 1.0, "cpus": cpus, "copies": COPIES, "timings": timings,
           "pilot_pre": pilot_pre, "pilot_post": pilot_post,
           "clean_window": bool(pilot_pre.get("clean")
                                and pilot_post.get("clean"))}
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "BENCH", "sf1.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
