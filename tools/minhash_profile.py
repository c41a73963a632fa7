"""Stage-wall decomposition of the minhash_near_dups bench query.

The r5 verdict asks why the clean-window record reads 8.5s against the r3
bar of <=7s (r4 clean observation: 6.6s).  At sf0.1 the documents table is
5,000 rows x ~300 chars — the wall is Spark fixed costs (stage scheduling,
pandas-UDF worker spin-up, exchanges, the orderBy sampling job), not data.
This tool rebuilds minhash_lsh_pairs' EXACT pipeline (same helpers, same
parameters as __spark_entry__._minhash_near_dups) with a count() barrier
after each stage so every marginal cost is attributable:

  scan      docs parquet read + count
  fused     fused shingle+signature+band Arrow UDF (r6) + pinning
            repartition + persist materialize
  band      posexplode of band hashes + persist materialize
  candidate oversized-bucket agg + broadcast anti-join + self-join + distinct
  verify    pair joins + exact-Jaccard filter (no orderBy)
  sink_sort the final orderBy(id_a, id_b) marginal cost
  e2e       a fresh uninstrumented minhash_lsh_pairs() run for cross-check

Persisted intermediates make each count a MARGINAL cost: the signature
stage reads the persisted shingles, the candidate stage reads the persisted
band entries, etc.  Run inside a pilot-clean window for evidentiary walls.

Usage: python tools/minhash_profile.py [sf_dir] [cpus] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from anomaly_detector_spark.operators.dedup import (  # noqa: E402
    _minhash_udf,
    minhash_lsh_pairs,
)
from anomaly_detector_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "BENCH", "minhash_decomposition.json")
    spark = get_spark(app_name="minhash-profile", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")

    # identical parameters to __spark_entry__._minhash_near_dups
    num_hashes, bands, shingle_k, seed = 64, 16, 5, 7
    jaccard_threshold, max_bucket_size = 0.5, 500
    id_col = "doc_id"

    report = {"sf_dir": sf_dir, "cpus": cpus, "stages": {}}

    def timed(name, fn):
        t0 = time.time()
        n = fn()
        w = time.time() - t0
        report["stages"][name] = {"wall_s": round(w, 3), "rows": n}
        print(f"STAGE {name}: {w:.2f}s ({n} rows)", flush=True)
        return n

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    timed("scan", docs.count)

    par = spark.sparkContext.defaultParallelism * 2
    fused = _minhash_udf(num_hashes, bands, shingle_k, seed)
    hashed = (
        docs.select(F.col(id_col), F.col("text"))
        .repartition(par, id_col)
        .select(F.col(id_col), fused(F.col("text")).alias("_ss"))
        .select(id_col, F.col("_ss.sh").alias("sh"),
                F.col("_ss.band_hashes").alias("band_hashes"))
        .persist())
    timed("fused", hashed.count)

    band_entries = hashed.select(
        id_col, F.posexplode("band_hashes").alias("band", "band_hash")
    ).persist()
    timed("band", band_entries.count)

    oversized = (
        band_entries.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_bucket_size)
        .select("band", "band_hash"))
    capped = band_entries.join(
        F.broadcast(oversized), ["band", "band_hash"], "left_anti")
    left, right = capped.alias("l"), capped.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"))
        .distinct()).persist()
    timed("candidate", candidates.count)

    shingled = hashed.select(
        F.col(id_col), F.col("sh").alias("shingle_set"))
    verified = (
        candidates
        .join(shingled.withColumnRenamed(id_col, "id_a")
              .withColumnRenamed("shingle_set", "set_a"), "id_a")
        .join(shingled.withColumnRenamed(id_col, "id_b")
              .withColumnRenamed("shingle_set", "set_b"), "id_b")
        .withColumn("jaccard",
                    F.size(F.array_intersect("set_a", "set_b"))
                    / F.size(F.array_union("set_a", "set_b")))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        ).persist()
    timed("verify", verified.count)
    timed("sink_sort", verified.orderBy("id_a", "id_b").count)

    for df in (hashed, band_entries, candidates, verified):
        df.unpersist()
    spark.catalog.clearCache()

    # uninstrumented cross-check: the real operator, same params
    t0 = time.time()
    res = minhash_lsh_pairs(docs, jaccard_threshold=jaccard_threshold)
    n = res.df.count()
    report["stages"]["e2e"] = {"wall_s": round(time.time() - t0, 3), "rows": n}
    print(f"STAGE e2e: {report['stages']['e2e']['wall_s']:.2f}s ({n} rows)",
          flush=True)
    res.release()

    report["stage_sum_s"] = round(sum(
        s["wall_s"] for k, s in report["stages"].items() if k != "e2e"), 3)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
