"""Simulate the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf dir; compare row
counts, schemas (column names) and order-insensitive values.

Usage: PYTHONPATH=. python tools/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from s2js_spark.spark.session import get_session

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            # EXACT float compare (the engine queries round() their
            # float outputs themselves; the comparison must not mask
            # cross-engine drift the driver's value-hash would catch).
            df[c] = df[c].astype(np.float64)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_session("local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {e}")
            failures += 1
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows, {spark_t:.1f}s")
            if len(sdf) == 0:
                print(f"  !! zero rows")
                failures += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {e}")
            failures += 1
            continue
        a, b = canon(sdf), canon(ddf)
        if list(a.columns) != list(b.columns):
            print(f"[FAIL] {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"[FAIL] {name}: rows {len(a)} vs {len(b)}")
            failures += 1
            continue
        eq = a.equals(b)
        if not eq:
            diff = (a != b) & ~(a.isna() & b.isna())
            bad_rows = diff.any(axis=1)
            print(f"[FAIL] {name}: {int(bad_rows.sum())}/{len(a)} rows differ")
            print("  spark:", a[bad_rows].head(3).to_dict("records"))
            print("  duck :", b[bad_rows].head(3).to_dict("records"))
            failures += 1
        else:
            print(f"[OK]   {name}: {len(a)} rows match exactly, {spark_t:.1f}s")
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
