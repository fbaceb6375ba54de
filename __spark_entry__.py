"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``: flagship PIP-join query on sf0.001.
``queries()``: one entry per implemented operator family (SURVEY.md §2),
each runnable at any sf dir. ``oracle_sql()``: DuckDB-equivalent ANSI SQL
for the value-hash correctness gate; spatial operators that SQL cannot
express (PIP refine, kNN ring search, contours) are registered without an
oracle → rows-only check, and their exactness is covered by pytest goldens
against pure-Python oracles instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _prep(spark: SparkSession) -> None:
    from osm_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _prep(spark)
    from osm_spark.pipeline.flagship import flagship_query

    return flagship_query(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Operator queries. Each maps to SURVEY.md §2 ids (noted inline) and has an
# exactly-matching DuckDB oracle below unless marked rows-only.
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A10 aggregate stack (TPC-H Q1 shape) with decimal-exact sums."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,4)")
                 * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")))
            )
            .cast("decimal(18,4)")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 latest-per-key (online_payment.rb:320-323,475-480 semantics)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus")
    )


def q_interval_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/P8 equality + closed-interval predicates (term.rb:192-234)."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31"))
        & (F.col("o_orderstatus") == "O")
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")


def q_grouped_count_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 having-filter aggregate (badge.rb:585-593 modules_gained shape)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 12)
    )


def q_broadcast_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 broadcast hash lookup join (badge.rb:153-168 modules map)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)").alias("sum_qty"),
        )
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 anti join / set difference (event.rb:322-351 badges_to_delete)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def q_signed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 signed-sum value (invoice.rb:408-412: +income/−expense)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type").isin("purchase", "error"))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value").cast("decimal(18,2)"))
                .otherwise(-F.col("value").cast("decimal(18,2)"))
            )
            .cast("decimal(18,2)")
            .alias("net_value")
        )
    )


def q_multi_key_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 multi-key sort with a desc component (member.rb:559-566),
    materialized as a rank column so the order-insensitive hash still
    verifies the ordering."""
    c = _t(spark, sf_dir, "customer")
    w = Window.orderBy(
        F.col("c_mktsegment").asc(), F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey", "c_mktsegment", F.row_number().over(w).alias("rank")
    )


def q_tag_requirement_met(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 + F-series: JSON prop extract + the requirement_met truth test
    (badge.rb:855-859) over the events props map."""
    from osm_spark.functions import requirement_met

    e = _t(spark, sf_dir, "events")
    v = F.get_json_object(F.col("props"), "$.k")
    return (
        e.select(F.col("event_id"), v.alias("k_value"))
        .withColumn("met", requirement_met(F.col("k_value")))
        .groupBy("met")
        .agg(F.count("*").alias("n"))
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text deduplication: keeper = min doc_id per identical text."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("text")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_dups"))
        .select("keeper_id", "n_dups")
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: whitespace token count + char stats per language."""
    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    return (
        d.select("lang", toks.alias("n_tokens"), F.length("text").alias("n"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
            F.round(F.sum(F.col("n").cast("double")) / F.sum(F.col("n_tokens").cast("double")), 4)
            .alias("chars_per_token"),
        )
    )


def q_tile_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster tile groupBy-count with coordinates derived arithmetically
    from customer keys (SQL-expressible in both engines)."""
    from osm_spark.geo.tiles import tile_xy

    c = _t(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") * 2654435761 % 1700001) / 10000.0 - 85.0
    lon = (F.col("c_custkey") * 40503 % 3600001) / 10000.0 - 180.0
    pts = c.select(lat.alias("lat"), lon.alias("lon"))
    t = tile_xy("lat", "lon", 6)
    return (
        pts.select(t.alias("t"))
        .groupBy(F.col("t.x").alias("tx"), F.col("t.y").alias("ty"))
        .agg(F.count("*").alias("n"))
    )


def q_haversine_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle distance as pure column math (kNN's metric), verified
    value-exactly against DuckDB's trig on the same derived coordinates."""
    from osm_spark.geo.knn import haversine_m

    c = _t(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") * 2654435761 % 1700001) / 10000.0 - 85.0
    lon = (F.col("c_custkey") * 40503 % 3600001) / 10000.0 - 180.0
    pts = c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    d = haversine_m(F.col("lat"), F.col("lon"), F.lit(51.5074), F.lit(-0.1278))
    return pts.select("c_custkey", F.round(d / 1000.0, 3).alias("dist_km"))


# --- rows-only (non-SQL-expressible) spatial operators ---


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2.10 cell-prejoined point-in-polygon (rows-only; exactness is
    pytest-golden-verified vs a pure-Python oracle)."""
    _prep(spark)
    from osm_spark.pipeline.flagship import flagship_query

    return flagship_query(spark, sf_dir)


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-partitioned kNN (rows-only; pytest-golden-verified)."""
    _prep(spark)
    from osm_spark.geo.knn import knn_join
    from osm_spark.pipeline.geometry import synth_nodes
    from osm_spark.pipeline.pages import synth_pages
    from osm_spark.pipeline.spatial_join import extract_points

    points = extract_points(synth_pages(spark, sf_dir))
    return knn_join(points, synth_nodes(spark), k=3).select("url", "node_id", "rank")


def q_contours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster→vector marching-squares contours (rows-only)."""
    _prep(spark)
    from osm_spark.geo.contours import contours, density_raster
    from osm_spark.pipeline.pages import synth_pages
    from osm_spark.pipeline.spatial_join import extract_points

    points = extract_points(synth_pages(spark, sf_dir))
    return contours(density_raster(points, 12), threshold=1.0)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": q_pricing_summary,
        "latest_order_per_customer": q_latest_order_per_customer,
        "interval_filter": q_interval_filter,
        "grouped_count_having": q_grouped_count_having,
        "broadcast_lookup_join": q_broadcast_lookup_join,
        "anti_join": q_anti_join,
        "signed_sum": q_signed_sum,
        "multi_key_ordering": q_multi_key_ordering,
        "tag_requirement_met": q_tag_requirement_met,
        "exact_dedup": q_exact_dedup,
        "token_stats": q_token_stats,
        "tile_assignment": q_tile_assignment,
        "haversine_distance": q_haversine_distance,
        "pip_join": q_pip_join,
        "knn_join": q_knn_join,
        "contours": q_contours,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "latest_order_per_customer": """
            SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                  FROM orders)
            WHERE rn = 1
        """,
        "interval_filter": """
            SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate <= TIMESTAMP '1996-12-31'
              AND o_orderstatus = 'O'
        """,
        "grouped_count_having": """
            SELECT o_custkey, COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
        """,
        "broadcast_lookup_join": """
            SELECT p_brand, COUNT(*) AS n_items,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "anti_join": """
            SELECT c_custkey, c_name, c_mktsegment
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "signed_sum": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN CAST(value AS DECIMAL(18,2))
                                 ELSE -CAST(value AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS net_value
            FROM events
            WHERE event_type IN ('purchase', 'error')
            GROUP BY user_id
        """,
        "multi_key_ordering": """
            SELECT c_custkey, c_mktsegment,
                   CAST(ROW_NUMBER() OVER (ORDER BY c_mktsegment ASC, c_acctbal DESC,
                        c_custkey ASC) AS INT) AS rank
            FROM customer
        """,
        "tag_requirement_met": """
            SELECT met, COUNT(*) AS n FROM (
                SELECT NOT (k_value IS NULL OR TRIM(k_value) = '' OR k_value = '0'
                            OR LOWER(SUBSTRING(k_value, 1, 1)) = 'x') AS met
                FROM (SELECT json_extract_string(props, '$.k') AS k_value FROM events)
            ) GROUP BY met
        """,
        "exact_dedup": """
            SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS n_dups
            FROM documents GROUP BY text
        """,
        "token_stats": """
            SELECT lang, COUNT(*) AS n_docs,
                   SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS total_tokens,
                   ROUND(SUM(CAST(LENGTH(text) AS DOUBLE))
                         / SUM(CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS chars_per_token
            FROM documents GROUP BY lang
        """,
        "tile_assignment": """
            WITH pts AS (
                SELECT (c_custkey * 2654435761 % 1700001) / 10000.0 - 85.0 AS lat,
                       (c_custkey * 40503 % 3600001) / 10000.0 - 180.0 AS lon
                FROM customer
            ), t AS (
                -- DuckDB 1.0 has no asinh: asinh(x) = ln(x + sqrt(x*x + 1))
                SELECT LEAST(GREATEST(CAST(FLOOR((lon + 180.0) / 360.0 * 64.0) AS BIGINT), 0), 63) AS tx,
                       LEAST(GREATEST(CAST(FLOOR((1.0 - ln(
                           tan(radians(LEAST(GREATEST(lat, -85.05112878), 85.05112878)))
                           + sqrt(tan(radians(LEAST(GREATEST(lat, -85.05112878), 85.05112878)))
                                  * tan(radians(LEAST(GREATEST(lat, -85.05112878), 85.05112878))) + 1.0)
                       ) / pi()) / 2.0 * 64.0) AS BIGINT), 0), 63) AS ty
                FROM pts
            )
            SELECT tx, ty, COUNT(*) AS n FROM t GROUP BY tx, ty
        """,
        "haversine_distance": """
            SELECT c_custkey,
                   ROUND(2.0 * 6371000.0 * asin(sqrt(
                       pow(sin(radians(51.5074 - ((c_custkey * 2654435761 % 1700001) / 10000.0 - 85.0)) / 2.0), 2)
                       + cos(radians((c_custkey * 2654435761 % 1700001) / 10000.0 - 85.0))
                       * cos(radians(51.5074))
                       * pow(sin(radians(-0.1278 - ((c_custkey * 40503 % 3600001) / 10000.0 - 180.0)) / 2.0), 2)
                   )) / 1000.0, 3) AS dist_km
            FROM customer
        """,
    }
