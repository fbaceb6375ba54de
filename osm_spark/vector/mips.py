"""Maximum-inner-product search (MIPS) — exact top-k and the
norm-augmentation reduction onto the cosine-LSH machinery.

Recommendation-style retrieval ranks by RAW inner product, not cosine:
a long document/item vector with large norm legitimately outranks a
short one at equal angle, so cosine_topk (vector/similarity.py) answers
a different query. This module adds the dot-product ranking plus the
standard reduction that makes sublinear candidate generation possible:

    augment every database vector x with one extra coordinate
    sqrt(M² − |x|²), where M = max_x |x|; augment queries with 0.

Every augmented database vector then has norm exactly M, so for a fixed
query, cos(q̂, x̂) = ⟨q, x⟩ / (|q̂|·M) is MONOTONE in the inner product —
angular LSH over the augmented space is a valid MIPS filter
(Neyshabur & Srebro, "On symmetric and random asymmetric MIPS", ICML
2015; the simpler exact-norm variant of Shrivastava & Li's L2-ALSH,
NeurIPS 2014). Candidates from the augmented buckets are then scored by
the EXACT dot product, so augmentation affects recall only, never the
reported scores.

Scale shape — identical discipline to ann_lsh/ivf (vector/similarity.py,
vector/ivf.py): the max-norm stat is ONE scalar row attached by a 1-row
cross join (no driver collect in the plan); the query side broadcasts
(query batches are small by contract); the LSH path joins corpus to
probes on the int32 bucket key with ``plan_planes`` sizing occupancy,
so candidate volume per query is ~occupancy·nprobe instead of the
corpus; the exact path is the documented brute-force oracle twin, kept
because the driver gate needs a path whose result is provably the
ground truth. Scores round to 6 dp with vec_id tie-break before
ranking — the engine's float-portability convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_spark.vector.similarity import _bucket, _dot, _probe_buckets

__all__ = ["augment_corpus", "augment_queries", "mips_topk", "mips_topk_int8"]


def _sq_norm(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _max_sq_norm(corpus: DataFrame, vec_col: str) -> DataFrame:
    """One row (_m2): the corpus' max squared L2 norm — the augmentation
    constant M². Attached by cross join, never collected."""
    return corpus.agg(F.max(_sq_norm(F.col(vec_col))).alias("_m2"))


def augment_corpus(
    corpus: DataFrame, vec_col: str = "embedding", out_col: str = "aug"
) -> DataFrame:
    """Append sqrt(M² − |x|²) so every augmented vector has norm M.
    The residual is clamped at 0 — the max row itself lands exactly on
    the boundary and float drift must not produce sqrt(-ε) = NaN."""
    m2 = _max_sq_norm(corpus, vec_col)
    resid = F.sqrt(F.greatest(F.col("_m2") - _sq_norm(F.col(vec_col)), F.lit(0.0)))
    return (
        corpus.crossJoin(F.broadcast(m2))
        .withColumn(
            out_col,
            F.concat(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                F.array(resid),
            ),
        )
        .drop("_m2")
    )


def augment_queries(
    queries: DataFrame, vec_col: str = "embedding", out_col: str = "aug"
) -> DataFrame:
    """Queries take a 0 extra coordinate: ⟨q_aug, x_aug⟩ = ⟨q, x⟩."""
    return queries.withColumn(
        out_col,
        F.concat(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            F.array(F.lit(0.0)),
        ),
    )


def mips_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    *,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int | None = None,
    nprobe: int = 2,
    n_bands: int = 8,
) -> DataFrame:
    """(query_id, vec_id, dot, rank): top-k corpus rows per query by RAW
    inner product.

    ``num_planes=None`` (the gate path) scores every pair — exact by
    construction, the brute-force oracle twin. With ``num_planes`` set,
    candidates come from multi-probe angular LSH over the AUGMENTED
    vectors (size via ``plan_planes(n_corpus)``), then the exact dot
    ranks them — recall-bounded, score-exact.

    The LSH path bands the corpus by norm first (``n_bands``,
    Range-LSH: Yan et al., "Norm-ranging LSH for maximum inner product
    search", NeurIPS 2018): each band augments with its OWN max norm,
    so the residual coordinate stays small within a band and the
    augmentation tilt that wrecks symmetric-ALSH recall under wide norm
    spread never exceeds the band's norm ratio. Banding is corpus-side
    only — the query's augmented direction is band-independent, so the
    candidate join stays a single equi join on the bucket key."""
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(corpus_id).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    if num_planes is None:
        cand = c.crossJoin(F.broadcast(q))
    else:
        # norm-range banding: band by |x|²/M², augment with the band max
        ca = c.withColumn("_sq", _sq_norm(F.col("c_vec")))
        m2 = ca.agg(F.max("_sq").alias("_m2"))
        ca = ca.crossJoin(F.broadcast(m2)).withColumn(
            "_band",
            F.least(
                F.lit(n_bands - 1),
                F.floor(F.lit(float(n_bands)) * F.col("_sq") / F.col("_m2")),
            ),
        )
        band_m2 = ca.groupBy("_band").agg(F.max("_sq").alias("_bm2"))
        resid = F.sqrt(F.greatest(F.col("_bm2") - F.col("_sq"), F.lit(0.0)))
        ca = (
            ca.join(F.broadcast(band_m2), "_band")
            .withColumn(
                "aug",
                F.concat(
                    F.transform(F.col("c_vec"), lambda x: x.cast("double")),
                    F.array(resid),
                ),
            )
            .withColumn("bucket", _bucket(F.col("aug"), num_planes, dim + 1))
        )
        qa = augment_queries(q, "q_vec").withColumn(
            "buckets", _probe_buckets(F.col("aug"), num_planes, dim + 1, nprobe)
        )
        qa = qa.select(
            "query_id", "q_vec", F.explode("buckets").alias("bucket")
        )
        cand = ca.join(F.broadcast(qa), "bucket").select(
            "query_id", "q_vec", "vec_id", "c_vec"
        )
    from pyspark.sql import Window

    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(_dot(F.col("q_vec"), F.col("c_vec")), 6).alias("dot"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "dot", "rank")
    )


def mips_topk_int8(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    *,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, idot, dot_q, rank): MIPS over the int8
    absmax-quantized representation (vector/quantize.py) — the
    bandwidth-compressed serving path composed with the MIPS ranking.

    ``idot`` is the EXACT integer Σ q_a·q_b (order-free bigint — no
    float accumulation anywhere); ``dot_q`` rescales once per pair
    (scale_a · scale_b · idot, round-6 with vec_id tie-break — the
    engine's float-portability convention). 4× the bandwidth of the
    float path at a bounded quantization error; ranking differences vs
    the exact path are the documented int8 trade, not nondeterminism —
    the same inputs rank identically on every run and engine."""
    from osm_spark.vector.quantize import quantize_embeddings

    qq = quantize_embeddings(
        queries.select(F.col(query_id).alias("vec_id"), F.col(vec_col))
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("scale").alias("q_scale"),
        F.col("qvec").alias("q_q"),
    )
    qc = quantize_embeddings(
        corpus.select(F.col(corpus_id).alias("vec_id"), F.col(vec_col))
    ).select("vec_id", F.col("scale").alias("c_scale"), F.col("qvec").alias("c_q"))
    idot = F.aggregate(
        F.zip_with(F.col("q_q"), F.col("c_q"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
    scored = qc.crossJoin(F.broadcast(qq)).select(
        "query_id",
        "vec_id",
        idot.alias("idot"),
        F.round(
            F.col("q_scale") * F.col("c_scale") * idot.cast("double"), 6
        ).alias("dot_q"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_q").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "idot", "dot_q", "rank")
    )
