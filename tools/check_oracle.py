#!/usr/bin/env python
"""Local simulation of the driver's DuckDB correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at sf0.01,
sorts columns by name and rows by value, and diffs exactly (floats
bit-compared — the driver hashes values, so 'close' is not enough).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    import decimal

    if v is None or v != v:
        return "\x00NULL"
    if isinstance(v, decimal.Decimal):
        # Driver-faithful: Spark decimals stringify with trailing zeros
        # (Decimal('1234.50')) while DuckDB decimals reach pandas as
        # float64. Do NOT coerce — a Spark-decimal vs oracle-float pair
        # must FAIL here exactly as it fails the driver's value hash.
        return str(v)
    if isinstance(v, float):
        return repr(float(v))
    s = str(v)
    # pandas renders DuckDB DATE as midnight datetime64; Spark gives date
    if s.endswith(" 00:00:00"):
        s = s[:-9]
    return s


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_norm)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(only: list[str] | None = None) -> int:
    import __spark_entry__ as entry
    from osm_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        wall = time.monotonic() - t0
        if name not in oracles:
            print(f"rows-only  {name}: {len(spark_pdf)} rows  ({wall:.1f}s)")
            if len(spark_pdf) == 0:
                print(f"  WARN {name}: 0 rows")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        a, b = canon(spark_pdf), canon(duck_pdf)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            continue
        neq = (a != b).any(axis=1)
        if neq.any():
            failures.append(name)
            i = neq.idxmax()
            print(f"FAIL  {name}: {int(neq.sum())}/{len(a)} rows differ; first:")
            print("  spark:", a.iloc[i].to_dict())
            print("  duck :", b.iloc[i].to_dict())
            continue
        print(f"OK    {name}: {len(a)} rows match  ({wall:.1f}s)")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
