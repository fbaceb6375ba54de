"""Neighborhood function: how many vertices are reachable within h hops.

Two implementations of the same quantity ``N(u, h) = |{v : d(u, v) ≤ h}|``
(shortest-path distance, self included at distance 0):

* :func:`neighborhood_function` — EXACT.  Maintains the materialized
  reachable set as distinct ``(id, dst)`` pairs and grows it one
  BFS round per hop (frontier join + union + distinct — all keyed
  shuffles).  Exact is the audit oracle: the reachable-set size is
  O(n · reach) rows, which on a web graph explodes within a few hops,
  so this path is for bounded h / bounded components and for gating.

* :func:`hyperball` — the HyperBall algorithm (Boldi & Vigna, "In-core
  computation of geometric centralities with HyperBall", 2013 — public
  algorithm, independently implemented): per vertex keep a HyperLogLog
  sketch of the reachable set, per round union each vertex's sketch
  into its in-neighbors'.  State per vertex is CONSTANT (2^lg_k
  registers) regardless of reach, so the per-round cost is one edge
  join + one ``hll_union_agg`` — the 100 TB path.  Spark's DataSketches
  HLL functions keep small sets in exact (sparse) mode, so on test
  graphs the estimates equal the exact counts and the parity test is
  deterministic; at scale the usual ~1.6 %/sqrt(2^lg_k) error applies.

Both loops run through lineage truncation (graph/iterate.py) so plans
and Catalyst stats stay bounded — the BENCH findings #11/#12 classes.

Reference parity: robertgauld/osm walks member↔section networks one
API call at a time (lib/osm/section.rb); the neighborhood function is
the whole-graph generalization (effective-diameter / centrality input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from osm_spark.graph.iterate import drop_truncated, truncate_lineage

__all__ = [
    "neighborhood_function",
    "hyperball",
    "effective_diameter",
    "harmonic_centrality",
]


def _clean_edges(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.col("src").alias("src"), F.col("dst").alias("dst")
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )


def _vertices(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def neighborhood_function(edges: DataFrame, max_hops: int = 3) -> DataFrame:
    """Exact ``(id, hops, n_reachable)`` for hops 1..max_hops over the
    directed graph ``edges(src, dst)``; ``n_reachable`` includes the
    vertex itself (distance 0), so it is monotone in ``hops`` and every
    vertex appears at every hop."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    e = _clean_edges(edges)
    reach = _vertices(e).select("id", F.col("id").alias("dst"))
    out = None
    prev = None
    for h in range(1, max_hops + 1):
        reach = truncate_lineage(
            reach.unionByName(
                reach.alias("r")
                .join(e.alias("e"), F.col("r.dst") == F.col("e.src"))
                .select(F.col("r.id").alias("id"), F.col("e.dst").alias("dst"))
            ).distinct()
        )
        if prev is not None:
            drop_truncated(prev)
        prev = reach
        # The per-hop counts outlive the round state (they are the
        # output), so they get their OWN small leaf before the backing
        # reach frame is superseded and dropped next round.
        counts = truncate_lineage(
            reach.groupBy("id")
            .agg(F.count("*").cast("bigint").alias("n_reachable"))
            .select("id", F.lit(h).cast("int").alias("hops"), "n_reachable")
        )
        out = counts if out is None else out.unionByName(counts)
    drop_truncated(reach)
    return out


def effective_diameter(
    edges: DataFrame, *, q: float = 0.9, max_hops: int = 3
) -> DataFrame:
    """The q-effective diameter (integer form): the smallest hop count
    ``h ≤ max_hops`` at which the total number of reachable (u, v)
    pairs is at least ``q`` × the total at ``max_hops`` — the standard
    web-graph distance summary (usually quoted at q=0.9), here closed
    from exact integer pair totals so the result is engine-exact (the
    interpolated fractional variant is a display convention, not a
    different measurement).  One row: (eff_diameter, pairs_at_h,
    pairs_at_max).  Derived from :func:`neighborhood_function`; at
    scale, swap in :func:`hyperball`'s estimates for the same fold."""
    if not 0.0 < q <= 1.0:
        raise ValueError("q must be in (0, 1]")
    nf = neighborhood_function(edges, max_hops=max_hops)
    totals = nf.groupBy("hops").agg(
        F.sum("n_reachable").cast("bigint").alias("pairs")
    )
    tmax = totals.where(F.col("hops") == max_hops).select(
        F.col("pairs").alias("pairs_at_max")
    )
    hit = (
        totals.crossJoin(F.broadcast(tmax))
        .where(
            F.col("pairs").cast("double")
            >= F.lit(float(q)) * F.col("pairs_at_max").cast("double")
        )
        .groupBy("pairs_at_max")
        .agg(
            F.min_by(F.col("hops"), F.col("hops")).alias("eff_diameter"),
            F.min_by(F.col("pairs"), F.col("hops")).alias("pairs_at_h"),
        )
    )
    return hit.select(
        F.col("eff_diameter").cast("int").alias("eff_diameter"),
        "pairs_at_h",
        "pairs_at_max",
    )


def hyperball(
    edges: DataFrame, max_hops: int = 3, lg_k: int = 12
) -> DataFrame:
    """HyperBall ``(id, hops, est_reachable)``: HLL-sketched reachable
    sets, constant state per vertex.  See module docstring for the
    exactness-on-small-sets property the parity test uses."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    e = _clean_edges(edges)
    # b0(u) = sketch({u})
    cur = _vertices(e).groupBy("id").agg(
        F.hll_sketch_agg(F.col("id").cast("string"), F.lit(lg_k)).alias("sk")
    )
    out = None
    prev = None
    for h in range(1, max_hops + 1):
        contrib = (
            e.join(cur, e["dst"] == cur["id"])
            .select(F.col("src").alias("id"), "sk")
        )
        cur = truncate_lineage(
            contrib.unionByName(cur.select("id", "sk"))
            .groupBy("id")
            .agg(F.hll_union_agg("sk").alias("sk"))
        )
        if prev is not None:
            drop_truncated(prev)
        prev = cur
        # estimates outlive the sketch state — own leaf (see exact path)
        est = truncate_lineage(
            cur.select(
                "id",
                F.lit(h).cast("int").alias("hops"),
                F.hll_sketch_estimate("sk").cast("bigint").alias(
                    "est_reachable"
                ),
            )
        )
        out = est if out is None else out.unionByName(est)
    drop_truncated(cur)
    return out


def harmonic_centrality(
    edges: DataFrame,
    max_hops: int = 3,
    method: str = "exact",
    lg_k: int = 12,
) -> DataFrame:
    """Bounded-horizon harmonic centrality
    ``H(u) = Σ_{h=1..max_hops} ΔN(u, h) / h`` where ``ΔN(u, h)`` is the
    number of vertices whose distance from ``u`` is exactly ``h``
    (Boldi & Vigna, "Axioms for centrality", 2014 — harmonic is the
    geometric centrality HyperBall was built to compute; the bounded
    horizon is the standard truncation). Counts vertices REACHABLE FROM
    ``u`` along the edge direction given; pass reversed edges for the
    classic incoming-distance form.

    Exactness: per-hop terms are micro-quantized longs
    ``round(ΔN · 1e6 / h)`` (ΔN·1e6 is exact in a double, one
    correctly-rounded divide), so the per-vertex sum over the ≤
    ``max_hops`` terms is order-independent and SQL-replayable — the
    same discipline as lm/pagerank micro-units.

    ``method='exact'`` folds :func:`neighborhood_function` (the audit
    path — reachable sets explode on web graphs); ``'hyperball'`` runs
    the same fold over :func:`hyperball` estimates — constant state per
    vertex, the 100 TB path, exact-equal on small graphs while the HLL
    sketches stay in sparse mode (the parity property the tests pin).

    Output: (id, harmonic_micro).
    """
    if method == "exact":
        nf = neighborhood_function(edges, max_hops=max_hops)
    elif method == "hyperball":
        nf = hyperball(edges, max_hops=max_hops, lg_k=lg_k).select(
            "id", "hops", F.col("est_reachable").alias("n_reachable")
        )
    else:
        raise ValueError(f"method must be exact|hyperball, got {method!r}")
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("hops")
    prev = F.coalesce(
        F.lag("n_reachable").over(w), F.lit(1).cast("bigint")
    )
    term = F.round(
        (F.col("n_reachable") - prev).cast("double")
        * F.lit(1000000.0)
        / F.col("hops").cast("double")
    ).cast("long")
    return (
        nf.select("id", term.alias("_t"))
        .groupBy("id")
        .agg(F.sum("_t").cast("bigint").alias("harmonic_micro"))
    )
