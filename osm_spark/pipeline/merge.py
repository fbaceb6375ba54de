"""Upsert (MERGE INTO) and change-data-capture diff — the engine's write
path.

Reference parity (SURVEY.md §2.1 S7, §2.8 V5, §3.5): every reference
mutation is "diff dirty attributes → POST only changed columns → verify
echo → invalidate cache" (lib/osm/model.rb:74-94; per-cell update e.g.
lib/osm/event.rb:795-853, lib/osm/flexi_record.rb:284-321). Here:

- ``changed_cells(old, new, key)`` is the DirtyHashy diff: one row per
  (key, column) whose value changed, plus inserted/deleted keys — the
  change set a MERGE consumes and the lineage log records.
- ``merge_upsert(target, source, key)`` is MERGE INTO expressed as a
  full-outer join + column-wise coalesce — the engine-portable form; on
  an Iceberg/Delta catalog the same call site emits ``MERGE INTO`` SQL
  and the writer handles copy-on-write.

Scale design: both are single hash-shuffle joins on the key (co-located
when both sides are bucketed by it); the diff projects to the narrow
change set before any write, mirroring the reference's minimal-update
contract (§2.1 O6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """MERGE: source rows win on key match, target rows survive otherwise
    (WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT *)."""
    cols = [c for c in target.columns]
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    return joined.select(
        *[
            F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c)
            if c != key
            else F.coalesce(F.col(f"s.{key}"), F.col(f"t.{key}")).alias(key)
            for c in cols
        ]
    )


def merge_into_sql(
    target_table: str, source_view: str, key: str, cols: list[str]
) -> str:
    """The ANSI ``MERGE INTO`` statement the catalog path executes —
    source wins on match, inserts otherwise (exactly ``merge_upsert``'s
    semantics, ref model.rb:74-119 minimal-update contract O1/O6)."""
    sets = ", ".join(f"t.{c} = s.{c}" for c in cols if c != key)
    cols_csv = ", ".join(cols)
    vals = ", ".join(f"s.{c}" for c in cols)
    return (
        f"MERGE INTO {target_table} t USING {source_view} s "
        f"ON t.{key} = s.{key} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({cols_csv}) VALUES ({vals})"
    )


def catalog_supports_merge(spark, table: str) -> bool:
    """True when the table's catalog is a configured V2 catalog (Iceberg/
    Delta register an implementation under spark.sql.catalog.<name>) —
    those execute MERGE INTO natively. The built-in session catalog over
    plain files does not."""
    catalog = (
        table.split(".", 1)[0]
        if table.count(".") >= 2
        else spark.conf.get("spark.sql.defaultCatalog", "spark_catalog")
    )
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    # Spark 4 reports the built-in session catalog as 'builtin'; a real
    # V2 catalog (Iceberg SparkCatalog, Delta) is a class name.
    return bool(impl) and impl != "builtin"


def merge_upsert_table(
    spark, target_table: str, source: DataFrame, key: str
):
    """Catalog-aware MERGE seam.

    On a configured V2 catalog (Iceberg/Delta) this registers the source
    as a temp view and executes real ``MERGE INTO`` SQL — copy-on-write /
    merge-on-read is the writer's concern, snapshots come for free. In
    this sandbox (no catalog jars) it falls back to the engine-portable
    full-outer + coalesce plan. Returns ``(result_df, sql_text,
    executed)`` so callers and tests can inspect the statement either way.
    """
    import uuid as _uuid

    view = f"_merge_src_{_uuid.uuid4().hex[:8]}"
    source.createOrReplaceTempView(view)
    sql = merge_into_sql(target_table, view, key, list(source.columns))
    if catalog_supports_merge(spark, target_table):
        spark.sql(sql)
        return spark.table(target_table), sql, True
    return merge_upsert(spark.table(target_table), source, key), sql, False


def changed_cells(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """CDC diff: (key, column, old_value, new_value, change) rows.

    change ∈ {'update', 'insert', 'delete'}; values stringified (the
    change log is heterogeneous by construction, like the reference's
    audit trail lib/osm/event.rb:889-897). Only genuinely changed cells
    emit rows — null-safe comparison (<=>).
    """
    cols = [c for c in old.columns if c != key]
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    k = F.coalesce(F.col(f"n.{key}"), F.col(f"o.{key}")).alias(key)
    change = (
        F.when(F.col(f"o.{key}").isNull(), F.lit("insert"))
        .when(F.col(f"n.{key}").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"o.{c}").cast("string").alias("old_value"),
                F.col(f"n.{c}").cast("string").alias("new_value"),
            )
            for c in cols
        ]
    )
    exploded = joined.select(k, change.alias("change"), F.explode(cells).alias("cell"))
    return exploded.filter(
        (F.col("change") != "update")
        | ~F.col("cell.old_value").eqNullSafe(F.col("cell.new_value"))
    ).select(
        key,
        F.col("cell.column").alias("column"),
        F.col("cell.old_value").alias("old_value"),
        F.col("cell.new_value").alias("new_value"),
        "change",
    )
