"""Newman-Girvan modularity of a vertex labeling.

The community-QUALITY companion to the community-FINDING operators
(graph/lpa.py label propagation, components.py, scc.py): given any
labeling, Q = Σ_c [ m_c/m − (d_c/2m)² ] measures how much denser the
intra-community edges are than a degree-preserving random rewiring
(Newman & Girvan, "Finding and evaluating community structure in
networks", PRE 2004). Q ≈ 0 for arbitrary partitions, > 0.3 for real
community structure — the standard acceptance test for LPA output over
the host graph.

Exactness: the three ingredients are exact bigints — m (canonical edge
count), m_intra (edges whose endpoints share a label), Σ_c d_c² (one
squared sum per community, summed) — and Q closes as ONE IEEE double
expression Q = (4m·m_intra − Σd_c²) / (4m²), floor'd to nano
(bit-identical across engines; the assortativity precedent). The
bigint products stay inside int64 up to m ≈ 1.5·10^9 intra-edges per
community pair-sum — past that, promote the close to per-community
partial doubles (documented, not needed at gate scale).

Scale shape: two label attaches (shuffle_hash equi joins on the vertex
id — the pagerank per-round join discipline), one map-side-combined
groupBy per community for d_c, three 1-row aggregates cross-joined —
no driver collect, no window, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.graph.triangles import canonical_edges, vertex_degrees

Q_SCALE = 1_000_000_000

__all__ = ["modularity"]


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    *,
    a: str = "src",
    b: str = "dst",
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """One row (m, n_communities, q_nano) for the canonicalized
    undirected graph under ``labels`` (id → label). Vertices missing a
    label form their own implicit singleton per NULL-id semantics —
    callers should label every vertex (inner joins drop unlabeled
    endpoints' edges, and the docstringed contract is total labels)."""
    e = canonical_edges(edges, a, b)
    lab = labels.select(
        F.col(id_col).alias("_id"), F.col(label_col).alias("_lab")
    )
    lu = lab.select(F.col("_id").alias("u"), F.col("_lab").alias("lu"))
    lv = lab.select(F.col("_id").alias("v"), F.col("_lab").alias("lv"))
    el = e.join(lu.hint("shuffle_hash"), "u").join(lv.hint("shuffle_hash"), "v")
    counts = el.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum((F.col("lu") == F.col("lv")).cast("long")).alias("m_intra"),
    )
    deg = vertex_degrees(e)
    dc = (
        deg.join(
            lab.select(F.col("_id").alias("id"), "_lab").hint("shuffle_hash"),
            "id",
        )
        .groupBy("_lab")
        .agg(F.sum("deg").alias("d_c"))
    )
    dsq = dc.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.sum(F.col("d_c") * F.col("d_c")).alias("sdc2"),
    )
    both = counts.crossJoin(dsq)
    m = F.col("m").cast("double")
    q = (
        F.lit(4.0) * m * F.col("m_intra").cast("double")
        - F.col("sdc2").cast("double")
    ) / (F.lit(4.0) * m * m)
    return both.select(
        "m",
        "n_communities",
        F.when(
            F.col("m") > 0,
            F.floor(F.lit(float(Q_SCALE)) * q).cast("long"),
        ).alias("q_nano"),
    )
