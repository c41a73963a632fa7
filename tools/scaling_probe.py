"""Spark-native scaling probe: is the *engine plan* or the *VM hardware* the
scaling bottleneck?

Round-1 finding (BENCH/BASELINE.md): the full validation pipeline measures
0.36-0.48 efficiency local[8]->local[32], while a pure-Python scalar loop on
the same box scales at 0.82 and vectorized numpy throughput is flat beyond ~8
processes (memory/vector-bandwidth ceiling).  This probe runs the SAME plan
shapes the engine uses — parquet scan -> projected map work -> salted hash
aggregation -> window -> union -> global sort — but with the per-row work made
ALU-bound (iterated sha2 hashing, negligible memory traffic).  If THIS scales
>= 0.8 while the real pipeline does not, the engine has no serial stage and
the real job's shortfall is the VM's bandwidth ceiling, which a multi-node
cluster (each node bringing its own memory system) does not share.

Usage: SCALING_N_LO=8 python tools/scaling_probe.py
Writes BENCH/scaling_probe.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from anomaly_detector_spark.session import get_spark
from anomaly_detector_spark.data import synth_transcripts
from pyspark.sql import functions as F

cpus = int(sys.argv[1])
n_convs = int(sys.argv[2])
rounds = int(sys.argv[3])
spark = get_spark(app_name=f"probe-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus * 2, 16))
spark.sparkContext.setLogLevel("ERROR")
path = f"/tmp/scaling_transcripts_{n_convs}.parquet"
if not os.path.isdir(path):
    synth_transcripts(spark, n_convs=n_convs, seed=42).write.mode("overwrite").parquet(path)
t = spark.read.parquet(path)
n_turns = t.count()

def job():
    # ALU-bound map work: `rounds` chained sha2-512 per row (same scan ->
    # project -> salted agg -> window -> sort shapes as run_validation)
    h = F.col("text")
    for _ in range(rounds):
        h = F.sha2(F.concat(h, F.col("conv_id")), 512)
    from pyspark.sql.window import Window
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    hashed = t.select("conv_id", "turn_idx", h.alias("h"))
    agg = (hashed.withColumn("_salt", F.pmod(F.xxhash64("conv_id", "turn_idx", "h"), F.lit(64)))
           .groupBy("conv_id", "_salt").agg(F.count(F.lit(1)).alias("c"),
                                            F.max("h").alias("hmax"))
           .groupBy("conv_id").agg(F.sum("c").alias("n"), F.max("hmax").alias("hmax")))
    lagged = (hashed.withColumn("prev", F.lag("h").over(w))
              .filter(F.col("prev").isNotNull() & (F.col("prev") > F.col("h")))
              .groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"),
                                      F.max("h").alias("hmax")))
    out = agg.select("conv_id", "n", "hmax").unionAll(lagged.select("conv_id", "n", "hmax"))
    return out.orderBy("conv_id", "n").count()

walls = []
for _ in range(2):
    t0 = time.time()
    n_out = job()
    walls.append(time.time() - t0)
wall = walls[-1]
print(json.dumps({"cpus": cpus, "n_turns": n_turns, "rounds": rounds,
                  "wall_s": round(wall, 3), "wall_cold_s": round(walls[0], 3),
                  "rows_per_sec": round(n_turns / wall, 1), "n_out": n_out}))
"""


def run_one(cpus: int, n_convs: int, rounds: int) -> dict:
    code = WORKER % {"repo": REPO}
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_convs), str(rounds)],
        capture_output=True, text=True, timeout=3000,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1])


def main() -> None:
    n_convs = int(os.environ.get("SCALING_N_CONVS", "200000"))
    rounds = int(os.environ.get("SCALING_SHA_ROUNDS", "24"))
    n_lo = int(os.environ.get("SCALING_N_LO", "8"))
    n_hi = 4 * n_lo
    lo = run_one(n_lo, n_convs, rounds)
    print(f"local[{n_lo}]:", json.dumps(lo))
    hi = run_one(n_hi, n_convs, rounds)
    print(f"local[{n_hi}]:", json.dumps(hi))
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / 4.0
    report = {
        "probe": "ALU-bound sha2 map + salted agg + window + sort (engine plan shapes)",
        "n_convs": n_convs, "sha_rounds": rounds,
        f"local{n_lo}": lo, f"local{n_hi}": hi,
        "scaling_efficiency_N_to_4N": round(eff, 3), "n_lo": n_lo,
    }
    print(json.dumps(report))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_probe.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
