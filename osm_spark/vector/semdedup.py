"""SemDeDup-style semantic deduplication: cluster embeddings, then prune
ε-similar neighbours inside each cluster (Abbas et al. 2023,
arXiv:2303.09540 — "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication").

The paper's recipe is k-means then within-cluster pairwise cosine; the
pruning rule keeps, of any ε-similar pair, the item FARTHER from its
centroid (low centroid-similarity items are the "edge" examples that
carry the most training signal).  The gated form here replaces the
iterative k-means with a deterministic one-pass nearest-seed assignment
(seeds = the k vectors with the smallest md5(id) — engine-portable, no
RNG state), which keeps every stage exactly replayable in ANSI SQL while
exercising the identical Spark plan shape; `ivf.kmeans_fit` slots in as
the centroid source for production runs (the assignment + prune stages
below are centroid-agnostic).

Scale design (the SemDeDup cost model):

- Seed pick is a global ``orderBy().limit(k)`` — k rows to the driver,
  re-broadcast; identical shape to the IVF centroid collect
  (`vector/ivf.py`).
- Assignment is corpus × k-seed broadcast nested loop (the exact form,
  same shape as ``cosine_topk``'s broadcast query side) + a map-side
  combined struct-max argmax — one shuffle keyed on vec_id.  At the
  10^12-row design point k grows to ~10^5 and the broadcast NL join is
  replaced by the IVF route (coarse quantizer probe) — same downstream
  contract.
- The prune is a self equi-join ON THE CLUSTER ID, so pair volume is
  Σ occupancy² — the paper's within-cluster budget — never corpus².
  Cluster occupancy is controlled by k (paper: ~corpus/10^5); a Zipf-hot
  cluster is a salted-join candidate (`pipeline/salting.salt_plan`
  applies unchanged to the cluster key).
- The removal rule is a per-row EXISTS (witness aggregate), so the
  decision needs no ordering or iteration: v is dropped iff some
  cluster-mate u has cos(u, v) ≥ τ and strictly lower
  (cent_sim, vec_id) — associative, order-free, and exactly the paper's
  keep-the-edge-example policy under a deterministic tie-break.

Reference parity: the reference library models de-duplicated element
sets via id equality only (robertgauld/osm lib/osm.rb element identity);
semantic near-duplicates are the corpus-scale generalisation the
training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.vector.similarity import cosine

__all__ = ["semantic_dedup", "seed_pick"]


def seed_pick(embeddings: DataFrame, k: int, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """The k deterministic seed vectors: smallest md5(id) wins.

    md5 over the decimal id string is engine-portable (same choice as the
    exact-dedup digest, `text/dedup.py`), so any SQL engine reproduces
    the seed set bit-for-bit.  Returns (seed_id, seed_vec), k rows.
    """
    return (
        embeddings.select(
            F.col(id_col).alias("seed_id"),
            F.col(vec_col).alias("seed_vec"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h", "seed_id")
        .limit(k)
        .drop("_h")
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Cluster-then-prune semantic dedup over (id, array<float>) rows.

    Returns one row per input vector: (vec_id, cluster_id, cent_sim,
    keep) — ``keep = false`` iff a cluster-mate within cosine
    ``threshold`` precedes it under the (cent_sim, vec_id) order (the
    SemDeDup keep-low-centroid-similarity policy).  ``seeds`` overrides
    the hash-picked seed table with externally fitted centroids
    (e.g. `ivf.kmeans_fit`) carrying (seed_id, seed_vec).
    """
    if seeds is None:
        seeds = seed_pick(embeddings, k, id_col, vec_col)

    # Exact assignment: corpus × k seeds (broadcast NL — k is small by
    # construction), rounded cosine so the argmax ties identically in
    # any engine, struct-max argmax (map-side combined, no window).
    sims = embeddings.join(F.broadcast(seeds)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("seed_id"),
        F.round(cosine(F.col(vec_col), F.col("seed_vec")), 6).alias("cent_sim"),
    )
    pick = F.max(
        F.struct(F.col("cent_sim"), (-F.col("seed_id")).alias("_neg"))
    ).alias("_m")
    assigned = (
        sims.groupBy(id_col)
        .agg(pick, F.first(vec_col).alias(vec_col))
        .select(
            F.col(id_col),
            (-F.col("_m._neg")).cast("long").alias("cluster_id"),
            F.col("_m.cent_sim").alias("cent_sim"),
            F.col(vec_col),
        )
    )

    # Within-cluster prune: equi-join on cluster_id only (pair volume =
    # Σ occupancy²); a witness u kills v iff cos ≥ τ and u precedes v.
    a = assigned.alias("a")
    b = assigned.alias("b")
    witnesses = (
        a.join(b, on="cluster_id")
        .where(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .where(
            (F.col("b.cent_sim") < F.col("a.cent_sim"))
            | (
                (F.col("b.cent_sim") == F.col("a.cent_sim"))
                & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}"))
            )
        )
        .where(
            F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6)
            >= F.lit(threshold)
        )
        .select(F.col(f"a.{id_col}").alias(id_col))
        .distinct()
    )

    return (
        assigned.join(
            witnesses.withColumn("_dup", F.lit(True)), on=id_col, how="left"
        )
        .select(
            F.col(id_col),
            "cluster_id",
            "cent_sim",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )
