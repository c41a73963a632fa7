"""Driver-style correctness harness: run every queries() entry on Spark and
its oracle_sql() on DuckDB over the same parquet dir; compare row count,
column names, and order-insensitive value hash (mirrors the driver's check).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        kind = str(df[c].dtype)
        if "float" in kind or "int" in kind.lower():
            df[c] = pd.to_numeric(df[c], errors="coerce").astype(float).round(6)
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (int, float)):
            df[c] = pd.to_numeric(df[c], errors="coerce").astype(float).round(6)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry_mod
    from anomaly_detector_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK EXC {type(e).__name__}: {str(e)[:200]}"))
            print(f"{name:28s} SPARK-ERROR")
            continue
        if name not in oracles:
            print(f"{name:28s} rows={len(sdf):6d} (rows-only, no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"ORACLE EXC {str(e)[:200]}"))
            print(f"{name:28s} ORACLE-ERROR")
            continue
        s, o = canon(sdf), canon(odf)
        ok_rows = len(s) == len(o)
        ok_cols = list(s.columns) == list(o.columns)
        ok_vals = ok_rows and ok_cols and s.astype(str).equals(o.astype(str))
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
        print(f"{name:28s} rows={len(s):6d}/{len(o):6d} cols={'=' if ok_cols else 'DIFF'} vals={'=' if ok_vals else 'DIFF'} {status}")
        if status != "OK":
            failures.append((name, f"rows {len(s)}/{len(o)} cols s={list(s.columns)} o={list(o.columns)}"))
            if ok_cols and ok_rows:
                neq = (s.astype(str) != o.astype(str)).any(axis=1)
                print("  first diffs (spark vs oracle):")
                print(pd.concat([s[neq].head(3), o[neq].head(3)], keys=["spark", "oracle"]))
    print()
    for name, msg in failures:
        print("FAIL", name, msg)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
