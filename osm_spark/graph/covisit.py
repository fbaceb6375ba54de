"""Co-visitation pairs: the bipartite user×item graph projected onto
item–item co-occurrence counts — "users who touched A also touched B",
the raw material of related-pages suggestions, co-click similarity and
collaborative filtering over web logs.

The quadratic trap, and the cap that closes it: projecting a bipartite
graph squares each user's item list, so one crawler account touching
10^6 items would alone emit 10^12 pairs — the exact "curse of the last
reducer" wedge-explosion triangle counting solves by orientation
(graph/triangles.py). For co-visitation the industry answer is a
PER-USER CONTRIBUTION CAP (co-click/co-view matrices cap session
length): each user contributes pairs from at most ``cap`` items. The
cap is DETERMINISTIC — the first ``cap`` items in sorted item order
after distinct — so results are reproducible and SQL-replayable, and
per-user work is bounded by cap² regardless of corpus size.

Plan: one (user, item) distinct (map-side pre-distinct via the pair
aggregation), one user-keyed collect_set + sort + slice, pair expansion
as a pure-Column nested transform (codegen, no UDF, no self-join — the
naive items⋈items equi-join on user shuffles each user's list twice
and re-materializes the quadratic blow-up as JOIN OUTPUT; here it never
leaves the row), then ONE pair-keyed combiner-reduced aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pair_array(items: Column) -> Column:
    """array<struct<a,b>> of all ordered pairs (a < b in array order)
    from a sorted item array — row-local, whole-stage codegen."""
    return F.flatten(
        F.transform(
            items,
            lambda x, i: F.transform(
                F.slice(items, i + 2, F.size(items)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


def covisitation(
    interactions: DataFrame,
    user: str = "user_id",
    item: str = "item",
    cap: int = 64,
) -> DataFrame:
    """(a, b, n_users) — for each unordered item pair, how many users
    touched both (a < b lexicographically; each user counted once per
    pair via the distinct). Users contribute only their first ``cap``
    distinct items in sorted order."""
    if cap < 2:
        raise ValueError(f"cap must be >= 2, got {cap}")
    arrs = (
        interactions.select(F.col(user).alias("u"), F.col(item).alias("it"))
        .distinct()
        .groupBy("u")
        .agg(
            F.slice(F.sort_array(F.collect_set("it")), 1, cap).alias("items")
        )
    )
    return (
        arrs.select(F.explode(pair_array(F.col("items"))).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
