"""Per-phase warm timings of the validation pipeline at a given parallelism.

Mirrors run_validation's ACTUAL stage structure (engine/runner.py) so the
4-vs-16 decomposition attributes wall time to the real phases:

  scan        full parquet scan + count (decode bandwidth baseline)
  seq         fused conv-window sweep (uniqueness+monotonic+gaps) — the one
              full-table exchange on the constraint side
  narrow      role/tool domain + null-text scans (no shuffle)
  ref         registry anti-join
  derive      drift series aggregation (scan + agg exchange + window)
  kernel      drift scoring pass alone, on a pre-materialized series input
  full        run_validation end-to-end (persist + both outputs, release'd)

Usage: python tools/phase_profile.py <cpus> <n_convs> [out.json]
Requires /tmp/scaling_transcripts_<n_convs>.parquet (written by scaling_run).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from anomaly_detector_spark.data import synth_registry  # noqa: E402
from anomaly_detector_spark.operators import constraints  # noqa: E402
from anomaly_detector_spark.operators.drift import (  # noqa: E402
    derive_series,
    drift_verdicts,
    score_drift,
)
from anomaly_detector_spark.engine.runner import run_validation  # noqa: E402
from anomaly_detector_spark.schema import ROLE_DOMAIN, TOOL_DOMAIN  # noqa: E402
from anomaly_detector_spark.session import get_spark  # noqa: E402


def main():
    cpus = int(sys.argv[1])
    n_convs = int(sys.argv[2])
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")
    # r6: realistic is the headline profile — the phase decomposition must
    # read the same input the ladder legs ran on (scaling_run's tagged path)
    profile = os.environ.get("SCALING_PROFILE", "realistic")
    tag = "" if profile == "adversarial" else f"_{profile}"
    t = spark.read.parquet(f"/tmp/scaling_transcripts_{n_convs}{tag}.parquet")
    reg = synth_registry(spark, n_convs=n_convs, seed=42)
    report = {"cpus": cpus, "n_convs": n_convs, "input_profile": profile,
              "phases": {}}

    def timed(name, mk):
        walls = []
        for _ in range(2):  # pass 1 warms; report the best
            spark.catalog.clearCache()
            df = mk()
            t0 = time.time()
            c = df.count()
            walls.append(time.time() - t0)
        report["phases"][name] = {"wall_s": round(min(walls), 2), "rows": c,
                                  "walls_s": [round(w, 2) for w in walls]}
        print(f"PHASE {name}: {min(walls):.1f}s ({c} rows)", flush=True)

    timed("scan", lambda: t)
    timed("seq", lambda: constraints.sequence_violations(t, include_duplicates=True))
    timed("narrow", lambda: (
        constraints.domain_violations(t, "role", ROLE_DOMAIN)
        .unionAll(constraints.domain_violations(t, "tool", TOOL_DOMAIN)
                  .select("conv_id", "turn_idx", "bad_value"))
        .unionAll(constraints.null_violations(t, "text")
                  .select("conv_id", "turn_idx", F.lit(None).alias("bad_value")))
    ))
    timed("ref", lambda: constraints.referential_violations(t, reg))

    sharded = t.withColumn("shard", F.pmod(F.xxhash64("conv_id"), F.lit(128)))
    timed("derive", lambda: derive_series(sharded, ["shard", "role"], "ts", "1 hour"))

    # kernel pass alone: materialize the tiny series table once, score it
    series_pdf = derive_series(sharded, ["shard", "role"], "ts", "1 hour").toPandas()
    series_cached = spark.createDataFrame(series_pdf).persist()
    series_cached.count()
    timed("kernel", lambda: drift_verdicts(
        score_drift(series_cached, granularity="hourly")))
    series_cached.unpersist()

    def full():
        res = run_validation(spark, t, reg, cache_input=False)
        t0 = time.time()
        nv = res.verdicts.count()
        nb = res.violations.count()
        wall = time.time() - t0
        res.release()
        return wall, nv + nb

    walls = []
    for _ in range(2):
        spark.catalog.clearCache()
        w, c = full()
        walls.append(w)
    report["phases"]["full"] = {"wall_s": round(min(walls), 2), "rows": c,
                                "walls_s": [round(w, 2) for w in walls]}
    print(f"PHASE full: {min(walls):.1f}s", flush=True)
    print(json.dumps(report), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
