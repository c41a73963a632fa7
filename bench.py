"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is turns/sec validated — the full validation pipeline
(stats + constraints + SR drift) over a deterministic synthetic transcripts
table sized to the scale factor — plus per-query wall times for the main
operator battery on the driver testdata.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# transcripts conversations per sf unit (sf0.1 -> 40k convs ~ 1.0M turns)
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


def main() -> None:
    import __spark_entry__ as entry_mod
    from anomaly_detector_spark.data import synth_registry, synth_transcripts
    from anomaly_detector_spark.engine.runner import run_validation
    from anomaly_detector_spark.session import get_spark

    sf = infer_sf(SF_DIR)
    spark = get_spark(app_name="adspark-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS) * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    qs = entry_mod.queries()
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        _ = n

    # headline: validation throughput over synthetic transcripts
    n_convs = max(int(CONVS_PER_SF * sf), 1000)
    transcripts = synth_transcripts(spark, n_convs=n_convs, seed=42)
    registry = synth_registry(spark, n_convs=n_convs, seed=42)
    t0 = time.time()
    result = run_validation(spark, transcripts, registry, cache_input=True)
    n_verdicts = result.verdicts.count()
    n_violations = result.violations.count()
    wall = time.time() - t0
    n_turns = transcripts.count()
    timings["validation_pipeline"] = round(wall, 3)

    out = {
        "metric": "total bench wall time (operator battery + validation pipeline)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "turns_per_sec_validated": round(n_turns / wall, 1),
        "validation_wall_sec": round(wall, 3),
        "n_turns": n_turns,
        "n_verdicts": n_verdicts,
        "n_violations": n_violations,
        "queries": timings,
        "sf": sf,
        "cpus": int(CPUS),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
