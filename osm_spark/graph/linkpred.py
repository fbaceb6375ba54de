"""Neighborhood link prediction — common-neighbours / Jaccard /
Resource-Allocation scores for non-adjacent vertex pairs.

The missing-edge companion to triangles.py (which scores edges that DO
exist): over the host graph a web-corpus pipeline builds
(pipeline/links.py), a non-linked host pair sharing many neighbours is
a candidate mirror / affiliate / near-duplicate site — the classic
crawl-frontier prioritization and link-spam signal. Extends the
reference's member-cross-reference idiom (lib/osm/relation.rb members
referencing shared ways — SURVEY §2.3 J3/J4) from "which elements share
a member" to "how strongly, and which NON-members should".

Scores (Liben-Nowell & Kleinberg, "The link-prediction problem for
social networks", CIKM 2003; Zhou/Lü/Zhang's Resource Allocation
variant, EPJ B 2009):

- ``common``  — |Γ(u) ∩ Γ(v)|, the common-neighbour count;
- ``jaccard_ppm`` — floor(10^6 · |Γ∩| / |Γ∪|), integer division;
- ``ra_nano`` — Σ_{z ∈ Γ∩} floor(10^9 / deg(z)), the Resource
  Allocation index in nano-units: one bigint integer division per
  term, bit-identical in any engine with NO libm dependence (RA also
  outperforms AA on most benchmark graphs — Zhou et al., Table 1);
- ``aa_micro`` — Σ_{z ∈ Γ∩} round(10^6 / ln(deg(z))), Adamic-Adar in
  micro-units. ln() is quantized PER TERM before the integer sum —
  the lm_score micro-nat convention: the only cross-engine risk is
  ln differing in its last ulp exactly at a 0.5 micro rounding
  boundary, the same accepted trade. Degree-1 centers generate no
  wedges, so the ln(1)=0 pole never contributes.

Shape — one wedge exchange, same skew discipline as triangles.py:

1. canonicalize the edge set (u < v, loops/dupes dropped);
2. per-vertex degrees (one map-side-combined exchange);
3. every unordered neighbour pair of every center z is generated ONCE
   (n1 < n2 on the wedge self-join), with floor(10^9/deg(z)) attached
   at generation time so scoring is a pure integer map;
4. one groupBy (n1, n2) folds common/ra; an anti join against the edge
   set keeps non-adjacent pairs only; degrees attach for Jaccard.

Why this survives 10^12 edges: the wedge volume is Σ_z deg(z)², which
a celebrity host dominates — ``hub_cap`` drops wedge CENTERS above a
degree ceiling (they contribute ≤ 10^9/cap ≈ 0 RA mass each and are
navigational hubs, not similarity evidence — the standard production
cut, e.g. Twitter's WTF pipeline caps identically). With cap c the
exchange is ≤ m·c rows, spread evenly because no center exceeds c.
Every join is an equi hash join on explicit keys (shuffle_hash: skinny
long pairs, a sort for SMJ would dominate); nothing broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.graph.triangles import canonical_edges, vertex_degrees

RA_SCALE = 1_000_000_000  # nano-units carried by the RA index
AA_SCALE = 1_000_000  # micro-units carried by the Adamic-Adar index
JACCARD_SCALE = 1_000_000  # ppm carried by the Jaccard coefficient

__all__ = ["link_prediction", "degree_assortativity"]


def link_prediction(
    edges: DataFrame,
    a: str = "src",
    b: str = "dst",
    *,
    min_common: int = 1,
    hub_cap: int | None = None,
) -> DataFrame:
    """(u, v, common, deg_u, deg_v, jaccard_ppm, ra_nano, aa_micro) for
    every NON-adjacent pair with ≥ ``min_common`` shared neighbours,
    u < v.

    Input may be directed / duplicated / self-looped — canonicalized
    first.  ``hub_cap`` drops wedge centers with deg > cap (the 100 TB
    skew cut — exact results need None, the test-scale default)."""
    e = canonical_edges(edges, a, b)
    deg = vertex_degrees(e)

    # symmetric adjacency with the center's RA term attached once
    adj = e.select(F.col("u").alias("z"), F.col("v").alias("nb")).unionAll(
        e.select(F.col("v").alias("z"), F.col("u").alias("nb"))
    )
    zdeg = deg.select(F.col("id").alias("z"), F.col("deg").alias("zdeg"))
    if hub_cap is not None:
        zdeg = zdeg.where(F.col("zdeg") <= F.lit(int(hub_cap)))
    adj = (
        adj.join(zdeg.hint("shuffle_hash"), "z")
        .withColumn("ra_term", F.expr(f"{RA_SCALE}L div zdeg"))
        .withColumn(
            "aa_term",
            F.when(
                F.col("zdeg") >= 2,
                F.round(
                    F.lit(float(AA_SCALE)) / F.log(F.col("zdeg").cast("double")),
                    0,
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
    )

    # each unordered neighbour pair of z exactly once (n1 < n2)
    left = adj.select("z", F.col("nb").alias("n1"), "ra_term", "aa_term")
    right = adj.select("z", F.col("nb").alias("n2"))
    wedges = left.join(right.hint("shuffle_hash"), "z").where(
        F.col("n1") < F.col("n2")
    )
    scored = wedges.groupBy("n1", "n2").agg(
        F.count(F.lit(1)).alias("common"),
        F.sum("ra_term").alias("ra_nano"),
        F.sum("aa_term").alias("aa_micro"),
    )
    if min_common > 1:
        scored = scored.where(F.col("common") >= F.lit(int(min_common)))

    # keep non-adjacent pairs only: the predicted (missing) edges
    scored = scored.join(
        e.select(F.col("u").alias("n1"), F.col("v").alias("n2")).hint(
            "shuffle_hash"
        ),
        ["n1", "n2"],
        "left_anti",
    )

    d1 = deg.select(F.col("id").alias("n1"), F.col("deg").alias("deg_u"))
    d2 = deg.select(F.col("id").alias("n2"), F.col("deg").alias("deg_v"))
    out = scored.join(d1.hint("shuffle_hash"), "n1").join(
        d2.hint("shuffle_hash"), "n2"
    )
    union_sz = F.col("deg_u") + F.col("deg_v") - F.col("common")
    return out.select(
        F.col("n1").alias("u"),
        F.col("n2").alias("v"),
        "common",
        "deg_u",
        "deg_v",
        F.expr(f"({JACCARD_SCALE}L * common) div (deg_u + deg_v - common)").alias(
            "jaccard_ppm"
        ),
        "ra_nano",
        "aa_micro",
    ).where(union_sz > 0)


def degree_assortativity(
    edges: DataFrame, a: str = "src", b: str = "dst"
) -> DataFrame:
    """One row (m, r_nano): Newman's degree assortativity coefficient
    (Newman, "Assortative mixing in networks", PRL 2002) over the
    canonicalized undirected graph, in nano-units.

    r is the Pearson correlation of endpoint degrees over the
    direction-doubled edge list. Every sum is an exact bigint over
    integer degrees; the closing expression is one IEEE double
    (multiply/divide/sqrt are all correctly rounded, so the floor'd
    nano value is bit-identical across engines — the gearys_c
    precedent). Degenerate graphs (all degrees equal → zero variance)
    return r_nano NULL rather than dividing by zero."""
    e = canonical_edges(edges, a, b)
    deg = vertex_degrees(e)
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    ed = e.join(du.hint("shuffle_hash"), "u").join(dv.hint("shuffle_hash"), "v")
    # double the edges so both orientations contribute (Σx == Σy)
    x, y = F.col("du"), F.col("dv")
    sums = ed.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(x + y).alias("sx"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x + y * y).alias("sxx"),
    )
    n = (F.lit(2) * F.col("m")).cast("double")
    sx = F.col("sx").cast("double")  # Σx over the doubled list
    sxy = (F.lit(2) * F.col("sxy")).cast("double")
    sxx = F.col("sxx").cast("double")
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    r = F.when(den > 0, num / den)
    return sums.select(
        F.col("m"),
        F.floor(F.lit(1_000_000_000).cast("double") * r).cast("long").alias(
            "r_nano"
        ),
    )
