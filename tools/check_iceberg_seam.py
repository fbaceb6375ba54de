#!/usr/bin/env python
"""Iceberg-seam conformance check (round-3 verdict ask #7).

The engine's catalog-facing surface is three seams, each real code that
runs today and flips to Iceberg semantics the moment a runtime jar and a
configured V2 catalog exist (SURVEY.md §1.4/§2.1; reference analog:
cache/snapshot invalidation in lib/osm/model.rb:99-119):

1. ``merge_into_sql``      — the exact MERGE INTO statement emitted.
2. ``catalog_supports_merge`` / ``merge_upsert_table`` — the dispatch:
   real ``spark.sql(MERGE INTO ...)`` on a V2 catalog, the portable
   full-outer+coalesce plan on the builtin session catalog.
3. ``LineageLog(table_prefix=...)`` — per-stage catalog tables + a
   lineage table whose per-file row counts stand in for Iceberg
   manifest counts (snapshot ids slot into the same rows).

This script asserts each seam against RECORDED expectations, without
needing the jar: the emitted SQL is golden-pinned, the dispatch is
driven both ways (the V2 branch through a recording spark.sql proxy —
the catalog impl conf is just a string, so the branch is reachable
without loading any Iceberg class), and the lineage/resume behavior
runs for real against the builtin catalog. If an Iceberg runtime IS on
the classpath (spark.jars.packages or a local jar), the script
additionally creates a real ``USING iceberg`` table, executes the MERGE
natively, and reads the snapshots metadata table — otherwise those
checks report BLOCKED(no-iceberg-jar), which is the expected sandbox
outcome.

Run: ``python tools/check_iceberg_seam.py`` → per-check PASS/BLOCKED
lines, exit 0 iff no check FAILED.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RESULTS: list[tuple[str, str, str]] = []  # (check, status, detail)


def record(check: str, status: str, detail: str = "") -> None:
    RESULTS.append((check, status, detail))
    print(f"{status:8s} {check}" + (f": {detail}" if detail else ""))


# The recorded expectation for seam 1: this exact statement shape is
# what an Iceberg/Delta catalog receives. Any change to merge_into_sql
# must update this golden AND re-verify against a real catalog.
GOLDEN_MERGE_SQL = (
    "MERGE INTO ice.db.orders t USING _src s "
    "ON t.o_orderkey = s.o_orderkey "
    "WHEN MATCHED THEN UPDATE SET t.o_status = s.o_status, t.o_total = s.o_total "
    "WHEN NOT MATCHED THEN INSERT (o_orderkey, o_status, o_total) "
    "VALUES (s.o_orderkey, s.o_status, s.o_total)"
)


def main() -> int:
    from osm_spark.pipeline.merge import (
        catalog_supports_merge,
        merge_into_sql,
        merge_upsert,
        merge_upsert_table,
    )
    from osm_spark.session import get_spark

    # --- seam 1: emitted SQL is golden-pinned (no session needed) ---
    sql = merge_into_sql(
        "ice.db.orders", "_src", "o_orderkey", ["o_orderkey", "o_status", "o_total"]
    )
    if sql == GOLDEN_MERGE_SQL:
        record("merge_into_sql golden", "PASS")
    else:
        record("merge_into_sql golden", "FAIL", f"got: {sql}")

    spark = get_spark(
        app_name="iceberg_seam", master="local[2]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- seam 2a: builtin catalog → portable plan, correct result ---
    spark.sql("DROP TABLE IF EXISTS _seam_target")
    spark.createDataFrame(
        [(1, "O", 10.0), (2, "F", 20.0)], "o_orderkey long, o_status string, o_total double"
    ).write.mode("overwrite").saveAsTable("_seam_target")
    source = spark.createDataFrame(
        [(2, "P", 25.0), (3, "O", 30.0)], "o_orderkey long, o_status string, o_total double"
    )
    if catalog_supports_merge(spark, "_seam_target"):
        record("builtin catalog detected as non-V2", "FAIL")
    else:
        record("builtin catalog detected as non-V2", "PASS")
    out, sql2, executed = merge_upsert_table(spark, "_seam_target", source, "o_orderkey")
    got = {(r.o_orderkey, r.o_status, r.o_total) for r in out.collect()}
    want = {(1, "O", 10.0), (2, "P", 25.0), (3, "O", 30.0)}
    if executed is False and got == want and "MERGE INTO _seam_target" in sql2:
        record("portable fallback result + SQL returned", "PASS")
    else:
        record(
            "portable fallback result + SQL returned",
            "FAIL",
            f"executed={executed} got={got}",
        )

    # --- seam 2b: V2-catalog branch dispatches to spark.sql(MERGE ...) ---
    # The catalog impl conf is a plain string; catalog_supports_merge only
    # reads it, so the V2 branch is reachable without the jar. A recording
    # proxy pins WHAT the branch executes.
    spark.conf.set("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    if catalog_supports_merge(spark, "ice.db.orders"):
        record("V2 catalog conf detected", "PASS")
    else:
        record("V2 catalog conf detected", "FAIL")

    recorded: list[str] = []
    real_sql, real_table = spark.sql, spark.table

    def rec_sql(q, *a, **kw):
        recorded.append(q)
        return spark.createDataFrame([], "x int")

    try:
        spark.sql = rec_sql  # type: ignore[method-assign]
        spark.table = lambda t: source  # type: ignore[method-assign]
        _out, sql3, executed3 = merge_upsert_table(
            spark, "ice.db.orders", source, "o_orderkey"
        )
    finally:
        spark.sql, spark.table = real_sql, real_table
    ok = (
        executed3 is True
        and len(recorded) == 1
        and recorded[0] == sql3
        and recorded[0].startswith("MERGE INTO ice.db.orders t USING _merge_src_")
        and "WHEN MATCHED THEN UPDATE SET" in recorded[0]
        and "WHEN NOT MATCHED THEN INSERT" in recorded[0]
    )
    record(
        "V2 branch executes exactly the emitted MERGE",
        "PASS" if ok else "FAIL",
        "" if ok else f"recorded={recorded}",
    )

    # --- seam 3: LineageLog catalog mode — stage tables + lineage rows
    # with per-file row counts (the Iceberg-manifest stand-in), resume
    # skips completed stages ---
    from osm_spark.pipeline.lineage import LineageLog
    import pyspark.sql.functions as F

    prefix = "_seam_lin"
    for t in (f"{prefix}_s1", f"{prefix}_lineage"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        log = LineageLog(spark, table_prefix=prefix)
        r1 = log.run_stage("s1", lambda: spark.range(100).select(F.col("id")))
        log2 = LineageLog(spark, table_prefix=prefix)  # a fresh run resumes
        r2 = log2.run_stage("s1", lambda: (_ for _ in ()).throw(AssertionError))
        lin = log2.lineage()
        rows_logged = (
            lin.filter(~F.col("skipped")).agg(F.sum("output_rows")).collect()[0][0]
        )
        ok = (
            not r1.skipped
            and r1.output_rows == 100
            and r2.skipped
            and rows_logged == 100
            and lin.filter(F.col("partition_file").isNotNull()).count() >= 1
        )
        record("lineage catalog mode + resume + manifest counts", "PASS" if ok else "FAIL")
    finally:
        for t in (f"{prefix}_s1", f"{prefix}_lineage"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    # --- optional: a real Iceberg runtime, if one is on the classpath ---
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        have_jar = True
    except Exception:
        have_jar = False
    if have_jar:
        # real conformance: USING iceberg table, native MERGE, snapshots
        spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
        spark.conf.set("spark.sql.catalog.ice.warehouse", "/tmp/_seam_ice_wh")
        spark.sql("CREATE TABLE IF NOT EXISTS ice.db.t (k long, v string) USING iceberg")
        spark.createDataFrame([(1, "a")], "k long, v string").createOrReplaceTempView("_s")
        spark.sql("MERGE INTO ice.db.t t USING _s s ON t.k = s.k "
                  "WHEN MATCHED THEN UPDATE SET t.v = s.v "
                  "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)")
        snaps = spark.sql("SELECT snapshot_id FROM ice.db.t.snapshots").count()
        record("real iceberg MERGE + snapshots table", "PASS" if snaps >= 1 else "FAIL")
    else:
        record(
            "real iceberg MERGE + snapshots table",
            "BLOCKED",
            "no Iceberg runtime jar on the classpath (sandbox ships none; "
            "the seam above pins exactly what would execute)",
        )

    spark.sql("DROP TABLE IF EXISTS _seam_target")
    spark.stop()
    failed = [c for c, s, _ in RESULTS if s == "FAIL"]
    print(f"\n{len(RESULTS)} checks: "
          f"{sum(1 for _, s, _ in RESULTS if s == 'PASS')} pass, "
          f"{sum(1 for _, s, _ in RESULTS if s == 'BLOCKED')} blocked, "
          f"{len(failed)} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
