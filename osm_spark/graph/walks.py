"""Deterministic random-walk generation over the link graph — the
sampling primitive behind DeepWalk/node2vec-style graph embeddings
(Perozzi et al. 2014; public algorithm) and behind walk-based corpus
augmentation ("page → neighborhood context" training examples).

Reproducibility design: the walk must be REPLAYABLE (driver contract +
resume semantics), so the next-hop choice is hash-random, not
RNG-random: from vertex v at step s of walk (start, w), the walk moves
to

    argmin over out-neighbors d of  md5(start:w:s:d)

md5 is the engine-portable hash used across the dedup/linkage stack
(identical bytes in Spark and DuckDB), the argmin ties break on the
neighbor id, and the choice depends only on (walk identity, step,
candidate) — uniformly pseudo-random per step, exactly reproducible on
any engine, restart or cluster size. Dead ends (no out-edges) terminate
the walk early; emitted prefix rows are kept.

Scale shape: one join per step — the frontier (|starts| × walks rows,
constant width) hash-joins edges on the current vertex and reduces by
min(struct(hash, dst)) with map-side combine, so each step's shuffle
carries one row per live walk plus the edge probe. Step count is the
loop bound (bounded, small); no lineage blow-up at these depths — the
plan grows linearly with a single self-reference per step, the
k^rounds trap (graph/iterate.py) needs multi-reference rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["random_walks"]


def random_walks(
    edges: DataFrame,
    walk_len: int = 3,
    walks_per_node: int = 1,
) -> DataFrame:
    """(start_id, walk_no, step, node) for steps 0..walk_len — step 0
    is the start vertex itself; later steps follow the hash-argmin
    choice above. Walks stop early at sinks."""
    if walk_len < 1:
        raise ValueError("walk_len must be >= 1")
    if walks_per_node < 1:
        raise ValueError("walks_per_node must be >= 1")
    e = (
        edges.select(F.col("src").alias("src"), F.col("dst").alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    walks = verts.select(
        "id",
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_node - 1))
        ).alias("walk_no"),
    ).select(
        F.col("id").alias("start_id"),
        "walk_no",
        F.col("id").alias("node"),
    )
    out = walks.select(
        "start_id", "walk_no", F.lit(0).cast("int").alias("step"), "node"
    )
    cur = walks
    for s in range(1, walk_len + 1):
        h = F.md5(
            F.concat_ws(
                ":",
                F.col("start_id"),
                F.col("walk_no"),
                F.lit(s),
                F.col("dst"),
            )
        )
        cur = (
            cur.join(
                e.hint("shuffle_hash"), cur["node"] == e["src"]
            )
            .groupBy("start_id", "walk_no")
            .agg(F.min(F.struct(h.alias("h"), F.col("dst"))).alias("_pick"))
            .select(
                "start_id", "walk_no", F.col("_pick.dst").alias("node")
            )
        )
        out = out.unionByName(
            cur.select(
                "start_id",
                "walk_no",
                F.lit(s).cast("int").alias("step"),
                "node",
            )
        )
    return out
