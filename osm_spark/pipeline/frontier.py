"""Crawl-frontier politeness sharding: assign each URL to a fetch worker
such that one host is fetched by exactly one worker, in a deterministic
per-host order, under an optional per-host budget.

The scheduling layer in front of the page pipeline (pipeline/pages.py
consumes fetched bytes; functions/urls.py canonicalizes; this decides
WHO fetches WHAT in WHICH order — the Mercator/Heritrix frontier
shape): politeness requires serializing per-host fetches, so the
host→worker map must be a pure function of the host, not of load —
exactly the salted-digest assignment text/sharding.py uses for training
shards, applied to hosts.

Output columns:
- ``worker``  = first-8-hex of md5(salt:host) mod n_workers — byte-stable
  across runs, cluster sizes and engines (a worker crash re-fetches its
  own hosts; no global reassignment).
- ``fetch_seq`` = 1-based per-host order: priority DESC then url ASC —
  deterministic, so a resumed crawl continues where the sequence says.
- rows with fetch_seq > ``max_per_host`` are DROPPED when a budget is
  set (the crawl-budget cut; the skew guard — one 10^8-URL host cannot
  monopolize its worker).

Plan: worker assignment is a pure projection (codegen, pushdown-safe);
fetch_seq is ONE host-keyed hash exchange + per-partition sort (the
global_shuffle shape — the sort is bounded by the largest host, the
standard AQE skew case). Nothing is collected; no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_spark.functions.urls import url_host


def frontier_assign(
    urls: DataFrame,
    n_workers: int,
    max_per_host: int | None = None,
    url_col: str = "url",
    priority_col: str | None = None,
    salt: str = "fr1",
) -> DataFrame:
    """(url, host, worker, fetch_seq) — politeness-sharded fetch plan.
    ``priority_col`` (higher first) is optional; ties and the no-priority
    case order by url ascending."""
    if n_workers < 1:
        raise ValueError(f"n_workers must be >= 1, got {n_workers}")
    if max_per_host is not None and max_per_host < 1:
        raise ValueError(f"max_per_host must be >= 1, got {max_per_host}")
    host = url_host(url_col)
    digest = F.md5(F.concat_ws(":", F.lit(salt), host))
    worker = F.pmod(
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long"),
        F.lit(n_workers),
    ).cast("int")

    order = (
        [F.desc(priority_col), F.asc(url_col)]
        if priority_col
        else [F.asc(url_col)]
    )
    w = Window.partitionBy("host").orderBy(*order)
    out = (
        urls.withColumn("host", host)
        .withColumn("worker", worker)
        .withColumn("fetch_seq", F.row_number().over(w).cast("long"))
    )
    if max_per_host is not None:
        out = out.where(F.col("fetch_seq") <= max_per_host)
    return out.select(url_col, "host", "worker", "fetch_seq")
