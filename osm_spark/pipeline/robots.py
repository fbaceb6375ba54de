"""Robots-style URL rule filtering — longest-prefix-match allow/deny.

The crawl-policy primitive that pairs with the frontier sharder
(pipeline/frontier.py): a per-host rule table ``(host, prefix, allow)``
decides each URL by the LONGEST matching path prefix (the robots.txt
most-specific-rule convention, ties broken allow-wins like Google's
documented tie-break), default allow when no rule matches.

Scale shape: the rule table is a policy dim (millions of hosts × a few
rules — broadcastable; past the ceiling the same equi-join on host
hash-joins), URLs join on host only, prefix matching and the
longest-match argmin run as pure-Column expressions BEFORE any further
exchange: one ``min(struct(-len, !allow))`` per URL via a map-side
combined aggregate keyed on the URL — no window over the page table.

Reference parity: robertgauld/osm gates API access per-section via
permission lookups (lib/osm/model.rb user permissions); this is the
same decide-by-most-specific-rule shape applied to crawl policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from osm_spark.functions.urls import url_host

__all__ = ["apply_url_rules"]


def apply_url_rules(
    urls: DataFrame,
    rules: DataFrame,
    *,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Filter ``urls`` by the rule table: returns the input columns plus
    ``allowed`` (boolean) and ``matched_prefix`` (NULL when no rule
    matched — default allow).  ``rules`` columns: host, prefix, allow.

    The path is extracted with the engine's canonical host/path parsing
    (functions/urls.py) so rules see the same path the dedup and
    rollup operators see.  Exact-duplicate url ROWS collapse (the
    longest-match aggregate groups on the input columns) — feed a
    deduped frontier, which is what the crawl pipeline produces."""
    u = urls.withColumn("_host", url_host(F.col(url_col)))
    # path = everything from the first '/' after the authority; '' if none
    after = F.substring_index(
        F.substring_index(F.col(url_col), "://", -1), "?", 1
    )
    slash = F.instr(after, "/")
    path = F.when(slash > 0, F.expr("substr(_after, _slash)")).otherwise(
        F.lit("/")
    )
    u = (
        u.withColumn("_after", after)
        .withColumn("_slash", slash)
        .withColumn("_path", path)
        .drop("_after", "_slash")
    )
    r = rules.select(
        F.col("host").alias("_host"),
        F.col("prefix").alias("_prefix"),
        F.col("allow").cast("boolean").alias("_allow"),
    )
    if broadcast_rules:
        r = F.broadcast(r)
    joined = u.join(r, on="_host", how="left").where(
        F.col("_prefix").isNull()
        | F.col("_path").startswith(F.col("_prefix"))
    )
    # most-specific rule: longest prefix wins; equal-length tie → allow
    # wins (sort key: (-len, allow DESC) via boolean NOT)
    pick = F.min(
        F.when(
            F.col("_prefix").isNotNull(),
            F.struct(
                (-F.length("_prefix")).alias("neg_len"),
                (~F.col("_allow")).alias("deny_first"),
                F.col("_prefix").alias("prefix"),
                F.col("_allow").alias("allow"),
            ),
        )
    ).alias("_best")
    keys = [c for c in urls.columns]
    out = (
        joined.groupBy(*keys, "_host", "_path")
        .agg(pick)
        .select(
            *keys,
            F.coalesce(F.col("_best.allow"), F.lit(True)).alias("allowed"),
            F.col("_best.prefix").alias("matched_prefix"),
        )
    )
    return out
