#!/usr/bin/env python
"""Schema-width audit for the driver gate: compares every gated query's
Spark column types against its DuckDB oracle's result types.

The driver's schema check distinguishes integer widths, and DuckDB types
VALUES literals as INT32 / DECIMAL where Spark emits int64 / double —
a class of mismatch the value-hash simulation cannot see (pandas
stringifies 32- and 64-bit ints identically). Run this after adding or
editing any oracle.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# spark simpleString -> DuckDB type name
TYPE_MAP = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "smallint": "SMALLINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
}


def main() -> int:
    import __spark_entry__ as entry
    from osm_spark.session import get_spark

    spark = get_spark(app_name="dtype_audit", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if name not in oracles:
            continue
        stypes = dict(fn(spark, SF_DIR).dtypes)
        rel = con.sql(oracles[name])
        dtypes = dict(zip(rel.columns, [str(t) for t in rel.types]))
        for c, st in stypes.items():
            dt = dtypes.get(c)
            exp = TYPE_MAP.get(st)
            if dt is None:
                print(f"MISMATCH {name}.{c}: missing in oracle result")
                bad += 1
            elif exp is None:
                print(f"UNMAPPED {name}.{c}: spark={st} duck={dt}")
                bad += 1
            elif dt != exp:
                print(f"MISMATCH {name}.{c}: spark={st} duck={dt}")
                bad += 1
    print(f"{bad} schema-width problems across {len(oracles)} gated queries")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
