"""Phase decomposition of the cold validation pipeline at bench conditions.

Times each phase of run_validation in isolation (fresh synth input, warm JVM)
so round-7 optimization targets the real cost centers.

Usage: SPARK_GRAFT_CPUS=32 python tools/r7_validation_profile.py [n_convs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark import StorageLevel  # noqa: E402

from anomaly_detector_spark.data import synth_registry, synth_transcripts  # noqa: E402
from anomaly_detector_spark.engine.runner import run_validation  # noqa: E402
from anomaly_detector_spark.operators import constraints  # noqa: E402
from anomaly_detector_spark.operators.drift import derive_series, drift_verdicts, score_drift  # noqa: E402
from anomaly_detector_spark.schema import ROLE_DOMAIN, TOOL_DOMAIN  # noqa: E402
from anomaly_detector_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    spark = get_spark(app_name="r7-validation-profile", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus) * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench
    spark.range(1_000_000).select(F.sum("id")).collect()
    _wu = F.pandas_udf(lambda s: s, "long")
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 1000).repartition(par).select(_wu("id")).count()

    report = {}

    def timed(name, fn, repeats=2):
        walls = []
        for _ in range(repeats):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        report[name] = walls
        print(f"# {name}: {walls}", flush=True)

    # phase 0: synth generation alone (no persist)
    timed("synth_noop", lambda: noop(synth_transcripts(spark, n_convs=n_convs, seed=42)))

    # phase 0b: persist materialization + count
    def gen_persist():
        t = synth_transcripts(spark, n_convs=n_convs, seed=42).persist(
            StorageLevel.MEMORY_AND_DISK)
        t.count()
        t.unpersist()

    timed("synth_persist_count", gen_persist)

    # cached input for the following phases
    t = synth_transcripts(spark, n_convs=n_convs, seed=42).persist(
        StorageLevel.MEMORY_AND_DISK)
    t.count()
    reg = synth_registry(spark, n_convs=n_convs, seed=42)

    timed("seq_window", lambda: noop(
        constraints.sequence_violations(t, include_duplicates=True)))
    timed("narrow_domains", lambda: (
        noop(constraints.domain_violations(t, "role", ROLE_DOMAIN)),
        noop(constraints.domain_violations(t, "tool", TOOL_DOMAIN)),
        noop(constraints.null_violations(t, "text"))))
    timed("referential", lambda: noop(constraints.referential_violations(t, reg)))

    series_parts = spark.sparkContext.defaultParallelism * 4
    sharded = t.withColumn("shard", F.pmod(F.xxhash64("conv_id"), F.lit(128)))

    timed("derive_series", lambda: noop(
        derive_series(sharded, partition_cols=["shard", "role"], ts_col="ts",
                      bucket="1 hour", num_partitions=series_parts)))

    def drift_full():
        series = derive_series(sharded, partition_cols=["shard", "role"], ts_col="ts",
                               bucket="1 hour", num_partitions=series_parts)
        noop(drift_verdicts(score_drift(series, granularity="hourly",
                                        assume_partitioned=True)))

    timed("drift_score_verdicts", drift_full)
    t.unpersist()

    # end-to-end, bench-identical (fresh input, cache_input=True)
    def e2e():
        tt = synth_transcripts(spark, n_convs=n_convs, seed=42)
        rr = synth_registry(spark, n_convs=n_convs, seed=42)
        res = run_validation(spark, tt, rr, cache_input=True)
        res.verdicts.count()
        res.violations.count()
        res.release()
        spark.catalog.clearCache()

    timed("e2e", e2e)

    print(json.dumps({"n_convs": n_convs, "cpus": int(cpus), "phases": report}))


if __name__ == "__main__":
    main()
