"""Deterministic synthesis of the Common-Crawl-style ``pages`` table.

``BASELINE.json:15`` pins the input shape: ``pages(url string, warc_ts
timestamp, html binary, text string, lang string)`` at a 10^12-row design
point, synthesized deterministically at small scale (no external data). We
derive pages from the driver's read-only ``documents`` parquet so content is
realistic; everything else is a pure function of ``url`` via ``xxhash64`` —
fully JVM-side (zero UDFs), so synthesis never bottlenecks the benchmarks
and is reproducible at any scale factor or multiplier.

Skew is generated on purpose (north_rule: "explicit H3-cell skew splitting
for hot tiles"): coordinates cluster around city centers with a heavily
weighted first city, and a fraction of that city's pages concentrate in a
~200 m hotspot — producing res-9 cells 100×+ the median load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (name, lat, lon, weight%) — cumulative weights over pmod(hash, 100).
CITIES = [
    ("london", 51.5074, -0.1278, 35),
    ("paris", 48.8566, 2.3522, 20),
    ("nyc", 40.7128, -74.0060, 12),
    ("tokyo", 35.6762, 139.6503, 10),
    ("sydney", -33.8688, 151.2093, 8),
    ("saopaulo", -23.5505, -46.6333, 6),
    ("cairo", 30.0444, 31.2357, 4),
    ("mumbai", 19.0760, 72.8777, 3),
    ("nairobi", -1.2921, 36.8219, 1),
    ("reykjavik", 64.1466, -21.9426, 1),
]
CITY_SPREAD_DEG = 0.04  # ±0.04° ≈ city extent ~9 km
HOTSPOT_FRACTION = 25  # % of city-0 pages inside the ~200 m hotspot
HOTSPOT_SPREAD_DEG = 0.001
COORD_FRACTION = 60  # % of pages that carry a coordinate sentence


def _city_pick(h):
    """Weighted city index from a hash column (cumulative thresholds)."""
    bucket = F.pmod(h, F.lit(100))
    expr = None
    cum = 0
    for idx, (_n, _la, _lo, w) in enumerate(CITIES):
        cum += w
        cond = bucket < cum
        expr = F.when(cond, idx) if expr is None else expr.when(cond, idx)
    return expr.otherwise(len(CITIES) - 1)


def _uniform(h, lo: float, hi: float):
    """Deterministic uniform double in [lo, hi) from a hash column."""
    return F.pmod(h, F.lit(1_000_000)) / 1_000_000.0 * (hi - lo) + lo


def synth_pages(spark: SparkSession, sf_dir: str, multiplier: int = 1) -> DataFrame:
    """Build the pages table from ``{sf_dir}/documents.parquet``.

    ``multiplier`` replicates each document with distinct urls (and distinct
    coordinates) to scale the row count without new source data. Returns
    columns exactly per input_hint: url, warc_ts, html, text, lang.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # The fixture is a single parquet file → 1-2 input partitions; spread
    # the small side BEFORE the multiplier cross join so the synthesized
    # table has cluster-wide parallelism (a real Iceberg pages table
    # arrives pre-split; this stands in for that layout).
    docs = docs.repartition(spark.sparkContext.defaultParallelism * 2)
    if multiplier > 1:
        docs = docs.join(
            spark.range(multiplier).withColumnRenamed("id", "rep"), how="cross"
        )
    else:
        docs = docs.withColumn("rep", F.lit(0))

    url = F.concat(
        F.lit("https://example.org/p/"),
        F.col("doc_id").cast("string"),
        F.lit("-"),
        F.col("rep").cast("string"),
    )
    df = docs.withColumn("url", url)
    h = lambda salt: F.xxhash64(F.col("url"), F.lit(salt))  # noqa: E731

    city = _city_pick(h(1))
    city_lat = F.element_at(
        F.array(*[F.lit(c[1]) for c in CITIES]), city + 1
    )
    city_lon = F.element_at(
        F.array(*[F.lit(c[2]) for c in CITIES]), city + 1
    )
    in_hotspot = (city == 0) & (F.pmod(h(2), F.lit(100)) < HOTSPOT_FRACTION)
    spread = F.when(in_hotspot, HOTSPOT_SPREAD_DEG).otherwise(CITY_SPREAD_DEG)
    lat = city_lat + _uniform(h(3), -1.0, 1.0) * spread
    lon = city_lon + _uniform(h(4), -1.0, 1.0) * spread

    has_coord = F.pmod(h(5), F.lit(100)) < COORD_FRACTION
    sentence = F.when(
        has_coord, F.format_string(" geo:%.6f,%.6f", lat, lon)
    ).otherwise(F.lit(""))

    text = F.concat(F.col("text"), sentence)
    html = F.encode(
        F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "UTF-8"
    )
    warc_ts = F.timestamp_seconds(
        F.lit(1704067200) + F.pmod(h(6), F.lit(180 * 86400))  # 2024-01-01 + <180d
    )
    return df.select(
        F.col("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        F.col("lang"),
    )
