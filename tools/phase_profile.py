"""Per-phase warm timings of the validation pipeline at a given parallelism.

Usage: python tools/phase_profile.py <cpus> <n_convs>
Requires /tmp/scaling_transcripts_<n_convs>.parquet (written by scaling_run).
"""

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
from anomaly_detector_spark.schema import ROLE_DOMAIN, TOOL_DOMAIN  # noqa: E402
from anomaly_detector_spark.session import get_spark  # noqa: E402


def main():
    cpus = int(sys.argv[1])
    n_convs = int(sys.argv[2])
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")
    t = spark.read.parquet(f"/tmp/scaling_transcripts_{n_convs}.parquet")
    reg = synth_registry(spark, n_convs=n_convs, seed=42)

    def timed(name, df):
        # warm twice, report second
        for i in range(2):
            t0 = time.time()
            c = df.count()
            wall = time.time() - t0
        print(f"PHASE {name}: {wall:.1f}s ({c})", flush=True)

    timed("scan", t)
    timed("uniq", constraints.uniqueness_violations(t, ["conv_id", "turn_idx"]))
    timed("mono", constraints.monotonic_violations(t))
    timed("role", constraints.domain_violations(t, "role", ROLE_DOMAIN))
    timed("tool", constraints.domain_violations(t, "tool", TOOL_DOMAIN))
    timed("ref", constraints.referential_violations(t, reg))
    timed("gaps", constraints.turn_gap_violations(t))
    sharded = t.withColumn("shard", F.pmod(F.xxhash64("conv_id"), F.lit(128)))
    timed("drift", drift_verdicts(score_drift(derive_series(sharded, ["shard", "role"], "ts", "1 hour"))))


if __name__ == "__main__":
    main()
