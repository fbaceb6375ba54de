"""Rich-club coefficient over the host/link graph (Zhou & Mondragón
2004): do the high-degree hubs link to EACH OTHER more densely than
chance?  φ(k) = 2·E_{>k} / (N_{>k}·(N_{>k}−1)) over the subgraph induced
by vertices of degree > k — the standard web-graph structural probe
("is the core an oligarchy") consumed alongside assortativity and the
bowtie decomposition (`graph/linkpred.py`, `graph/scc.py`).

Computed for a whole THRESHOLD LADDER in two passes, no per-k subgraph
materialization: degrees once (one exchange), edges annotated with
min(deg_u, deg_v) via two shuffle-hash joins, then one ladder explode +
conditional count per side — work is |E|·|ladder| codegen rows and two
combiner-reduced aggregates, independent of which k values are asked.
Exactness: counts are integers; φ closes with one rounded division per
ladder row (micro units); N_{>k} < 2 yields NULL (no pairs exist).

The normalized form φ_norm (vs a degree-preserving random rewiring)
needs an external null model by definition — out of scope for the
deterministic gate and documented here so nobody mistakes raw φ for it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.graph.triangles import canonical_edges, vertex_degrees

__all__ = ["rich_club"]


def rich_club(
    edges: DataFrame,
    ks: Sequence[int],
    a: str = "src",
    b: str = "dst",
) -> DataFrame:
    """(k, n_k, e_k, phi_micro) for every degree threshold in ``ks``."""
    if not ks:
        raise ValueError("ks must be non-empty")
    e = canonical_edges(edges, a, b)
    deg = vertex_degrees(e)

    ladder = F.array(*[F.lit(int(k)) for k in sorted(set(ks))])
    nk = (
        deg.select(F.explode(ladder).alias("k"), "deg")
        .where(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_k"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    ed = (
        e.join(du.hint("shuffle_hash"), "u")
        .join(dv.hint("shuffle_hash"), "v")
        .select(F.least("du", "dv").alias("min_deg"))
    )
    ek = (
        ed.select(F.explode(ladder).alias("k"), "min_deg")
        .where(F.col("min_deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("e_k"))
    )

    base = e.sparkSession.createDataFrame(
        [(int(k),) for k in sorted(set(ks))], "k int"
    )
    out = (
        base.join(F.broadcast(nk), "k", "left")
        .join(F.broadcast(ek), "k", "left")
        .select(
            "k",
            F.coalesce("n_k", F.lit(0).cast("long")).alias("n_k"),
            F.coalesce("e_k", F.lit(0).cast("long")).alias("e_k"),
        )
    )
    phi = F.when(
        F.col("n_k") >= 2,
        F.round(
            F.lit(2e6) * F.col("e_k").cast("double")
            / (F.col("n_k").cast("double") * (F.col("n_k").cast("double") - 1.0)),
            0,
        ).cast("long"),
    )
    return out.select("k", "n_k", "e_k", phi.alias("phi_micro"))
