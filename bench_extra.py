"""Round-7 measurement harness (bench.py is FROZEN for the driver; this file
holds the extra instrumentation the optimization round needs).

Modes (combine freely):
  --battery N     run the bench.py query battery N times (same timing
                  methodology: build + .count()) and print per-round and min
                  per-query walls
  --noop          use a noop sink (df.write.format("noop")) instead of count()
                  for the battery — times EVERY column of every row (guide §1.4)
  --only a,b,c    restrict to a comma-separated query subset
  --plans TAG     dump .explain("formatted") for the battery queries to
                  plans/r07/<query>_<TAG>.txt
  --validation N  time the cold validation pipeline N times (fresh synth
                  input each time, cache released between rounds)

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
CONVS_PER_SF = 400_000

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "stats_events_by_type",
    "uniqueness_violations",
    "rolling_daily_revenue",
    "dedup_exact",
    "minhash_near_dups",
    "ann_brute_force",
    "ann_ivf_indexed",
    "embedding_near_dups",
    "text_quality",
    "sr_drift_events",
    "mvad_drift_threshold",
]


def infer_sf(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def get_session():
    from anomaly_detector_spark.session import get_spark

    spark = get_spark(app_name="adspark-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS) * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def warmup(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.time()
    spark.range(1_000_000).select(F.sum("id")).collect()
    _wu = F.pandas_udf(lambda s: s, "long")
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 1000).repartition(par).select(_wu("id")).count()
    return round(time.time() - t0, 3)


def run_battery(spark, names: list[str], rounds: int, noop: bool) -> dict:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    all_t: dict[str, list[float]] = {n: [] for n in names}
    for r in range(rounds):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra r{r}: {name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            all_t[name].append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"# round {r}: " + json.dumps({n: all_t[n][-1] for n in names}),
              flush=True)
    return {
        "rounds": all_t,
        "min": {n: min(v) for n, v in all_t.items()},
        "min_total": round(sum(min(v) for v in all_t.values()), 3),
    }


def dump_plans(spark, names: list[str], tag: str) -> None:
    import io
    from contextlib import redirect_stdout

    import __spark_entry__ as entry_mod

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"# wrote plans/r07/{name}_{tag}.txt", flush=True)


def run_validation_rounds(spark, rounds: int) -> dict:
    from anomaly_detector_spark.data import synth_registry, synth_transcripts
    from anomaly_detector_spark.engine.runner import run_validation

    sf = infer_sf(SF_DIR)
    n_convs = max(int(CONVS_PER_SF * sf), 1000)
    walls = []
    for r in range(rounds):
        transcripts = synth_transcripts(spark, n_convs=n_convs, seed=42)
        registry = synth_registry(spark, n_convs=n_convs, seed=42)
        spark.sparkContext.setJobDescription(f"bench_extra validation r{r}")
        t0 = time.time()
        result = run_validation(spark, transcripts, registry, cache_input=True)
        nv = result.verdicts.count()
        nviol = result.violations.count()
        walls.append(round(time.time() - t0, 3))
        result.release()
        spark.catalog.clearCache()
        print(f"# validation r{r}: {walls[-1]}s verdicts={nv} violations={nviol}",
              flush=True)
    return {"walls": walls, "min": min(walls)}


def main() -> None:
    args = sys.argv[1:]

    def opt(flag, default=None):
        if flag in args:
            i = args.index(flag)
            return args[i + 1]
        return default

    only = opt("--only")
    names = only.split(",") if only else BENCH_QUERIES
    battery = opt("--battery")
    plans_tag = opt("--plans")
    validation = opt("--validation")
    noop = "--noop" in args

    spark = get_session()
    w = warmup(spark)
    print(f"# warmup {w}s sf_dir={SF_DIR} cpus={CPUS}", flush=True)
    out: dict = {"sf": infer_sf(SF_DIR), "cpus": int(CPUS), "warmup_sec": w}
    if plans_tag:
        dump_plans(spark, names, plans_tag)
    if battery:
        out["battery"] = run_battery(spark, names, int(battery), noop)
    if validation:
        out["validation"] = run_validation_rounds(spark, int(validation))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
