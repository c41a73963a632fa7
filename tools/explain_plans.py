"""Dump formatted physical plans for the headline queries (plan review aid).

Usage: python tools/explain_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entry_mod
    from anomaly_detector_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or ["q1_pricing_summary", "q3_shipping_priority",
                             "uniqueness_violations", "minhash_near_dups"]
    spark = get_spark(app_name="explain", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    for name in names:
        print(f"\n===== {name} =====")
        qs[name](spark, sf_dir).explain("formatted")


if __name__ == "__main__":
    main()
