"""Similarity search over an ``embeddings(vec_id, embedding array<float>)``
table — brute-force cosine as the exactness baseline, sign-random-
projection (hyperplane) LSH as the scale path.

Scale design:

- **cosine_topk** is the correctness baseline: queries × corpus with the
  query side broadcast (queries are always the small side), dot product
  as a higher-order ``zip_with``/``aggregate`` Column chain — JVM-side,
  no Python. Cost is O(|Q|·|corpus|·d) spread across partitions; at
  100 TB it is the oracle for sampled audits, not the serving path.
- **hyperplane_buckets / ann_lsh_topk** is the serving path: P
  deterministic pseudo-random hyperplanes → P sign bits → bucket id;
  candidate generation is an equi join on the bucket id (hash shuffle on
  a short int key), exact cosine refines inside buckets only. Expected
  candidate count per query is |corpus| / 2^P for isotropic data —
  ``plan_planes`` derives P from the corpus size and a target bucket
  occupancy the same way the PIP join's salt factor (``salt_plan``) and
  the band count (``lsh_tune``) are derived (SURVEY.md §7, data-driven
  constants). A static P caps join parallelism at 2^P buckets and lets
  bucket occupancy grow linearly with the corpus; a data-driven P keeps
  per-bucket work constant as the corpus scales.
- **embedding_near_dups** blocks on the same buckets, so near-dup
  detection never materializes O(n²) pairs.

Hyperplane components are arithmetic (no RNG state): plane(p, i) =
((p·73856093 + i·19349663) mod 2001 − 1000)/1000 — reproducible in any
engine, which is what makes the DuckDB oracle possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PLANE_A = 73856093
PLANE_B = 19349663
PLANE_MOD = 2001


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two float-array columns (pure Column)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries × corpus, window top-k.

    Ties break on corpus id ascending after rounding to 6 dp, so ranks
    are engine-portable (two engines' last-bit float drift cannot flip
    the order)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(corpus_id).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def plan_planes(n_rows: int, target_occupancy: int = 16) -> int:
    """Hyperplane count P from corpus size: expected bucket occupancy for
    isotropic data is n / 2^P, so P = ceil(log2(n / target)).

    The data-driven analog of ``salt_plan`` (spatial_join.py) and
    ``lsh_tune`` (dedup.py): at 10^12 vectors a static P=6-8 means
    64-256 buckets — candidate scans 10^10 long and a join whose
    parallelism is capped at the bucket count. Deriving P from n keeps
    occupancy ≈ ``target_occupancy`` at any corpus size (P=33 would be
    needed past 2^31·target rows; clamped to 31 so the bucket id stays a
    valid positive int32 — beyond that, shard the corpus).

    ``n_rows`` comes from catalog stats in production; callers here pass
    ``df.count()`` (one cheap aggregate over the corpus dim, same
    pattern as ``estimate_covering_cells``).
    """
    import math

    if n_rows < 1:
        raise ValueError(f"n_rows must be >= 1, got {n_rows}")
    if target_occupancy < 1:
        raise ValueError(f"target_occupancy must be >= 1, got {target_occupancy}")
    p = math.ceil(math.log2(max(n_rows / target_occupancy, 2.0)))
    return max(1, min(31, p))


def _check_planes(num_planes: int) -> None:
    """Bucket ids are built as sign-bit · 2^p sums in int32: p ≥ 31 would
    silently overflow the cast and corrupt/collide buckets (ADVICE r2)."""
    if not 1 <= num_planes <= 31:
        raise ValueError(
            f"num_planes must be in [1, 31] (int32 bucket ids), got {num_planes}"
        )


def plane_component(p: Column | int, i: Column) -> Column:
    """Deterministic hyperplane component in [-1, 1] (engine-portable)."""
    pc = F.lit(p) if isinstance(p, int) else p
    return (
        F.pmod(pc * PLANE_A + i * PLANE_B, F.lit(PLANE_MOD)) - (PLANE_MOD - 1) / 2
    ) / float((PLANE_MOD - 1) / 2)


def _bucket(vec: Column, num_planes: int, dim: int) -> Column:
    """LSH bucket id: sum over planes of sign-bit · 2^p."""
    _check_planes(num_planes)
    idx = F.sequence(F.lit(0), F.lit(dim - 1))

    def plane_dot(p: int) -> Column:
        return F.aggregate(
            F.zip_with(
                vec, idx, lambda x, i: x.cast("double") * plane_component(p, i)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    b = F.lit(0)
    for p in range(num_planes):
        b = b + F.when(plane_dot(p) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return b.cast("int")


def hyperplane_buckets(
    vectors: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket) via sign random projection (pure Column plan)."""
    return vectors.select(
        F.col(id_col).alias("vec_id"),
        _bucket(F.col(vec_col), num_planes, dim).alias("bucket"),
    )


def _probe_buckets(vec: Column, num_planes: int, dim: int, nprobe: int) -> Column:
    """Multi-probe bucket array: the base bucket plus single-bit flips of
    the ``nprobe − 1`` planes with the smallest |margin| (the classic
    multi-probe LSH heuristic: a near-boundary sign bit is the likeliest
    to disagree with a true neighbor's). Deterministic, pure Column."""
    _check_planes(num_planes)
    idx = F.sequence(F.lit(0), F.lit(dim - 1))

    def plane_dot(p: int) -> Column:
        return F.aggregate(
            F.zip_with(vec, idx, lambda x, i: x.cast("double") * plane_component(p, i)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dots = [plane_dot(p) for p in range(num_planes)]
    base = F.lit(0)
    for p, d in enumerate(dots):
        base = base + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    base = base.cast("int")
    if nprobe <= 1:
        return F.array(base)
    margins = F.array(
        *[
            F.struct(F.abs(d).alias("m"), F.lit(p).alias("p"))
            for p, d in enumerate(dots)
        ]
    )
    flips = F.slice(F.array_sort(margins), 1, nprobe - 1)
    return F.concat(
        F.array(base),
        # shiftleft needs a literal bit count; 2^p via pow is exact for
        # p < 31 and keeps the flip inside the lambda
        F.transform(
            flips,
            lambda s: base.bitwiseXOR(F.pow(F.lit(2.0), s["p"]).cast("int")),
        ),
    )


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    num_planes: int | None = None,
    dim: int = 64,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    target_occupancy: int = 16,
    n_rows: int | None = None,
) -> DataFrame:
    """Approximate top-k: equi join on LSH bucket(s), exact cosine inside.

    ``num_planes`` defaults to the data-driven ``plan_planes`` value:
    pass ``n_rows`` (a catalog stat) to avoid the one count job,
    or an explicit ``num_planes`` to pin the bucket space.

    ``nprobe`` > 1 raises recall by also probing the buckets reached by
    flipping the nearest-boundary sign bits, one per extra probe — the
    query side explodes to nprobe rows (queries are the small side), the
    corpus side and the join shape are unchanged. Probed buckets are
    distinct by construction, so no pair dedup is needed. Deterministic
    end to end."""
    from pyspark.sql import Window

    if num_planes is None:
        num_planes = plan_planes(
            n_rows if n_rows is not None else corpus.count(), target_occupancy
        )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(
            _probe_buckets(F.col(vec_col), num_planes, dim, nprobe)
        ).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        _bucket(F.col(vec_col), num_planes, dim).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.95,
    num_planes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_occupancy: int = 64,
    n_rows: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs: LSH-blocked self-join + cosine ≥ t.

    Only same-bucket pairs are scored, so the pair count stays near-linear
    for well-spread corpora; a hot bucket is AQE-skew-split.
    ``num_planes`` defaults to ``plan_planes`` over the corpus size (the
    self-join cost per bucket is occupancy², so the default target is
    coarser than ANN's); pass ``n_rows`` from catalog stats to skip the
    count job, or pin ``num_planes`` explicitly."""
    if num_planes is None:
        num_planes = plan_planes(
            n_rows if n_rows is not None else vectors.count(), target_occupancy
        )
    b = hyperplane_buckets(vectors, num_planes, dim, id_col, vec_col).join(
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")),
        "vec_id",
    )
    a = b.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "bucket")
    c = b.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(c, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )
