"""Int8 embedding quantization — the storage/bandwidth path for ANN.

Symmetric linear (absmax) quantization, the standard int8 scheme: per
vector ``scale = max|x_i| / 127``, ``q_i = clamp(round(x_i / scale),
-127, 127)``; dequantize is ``q_i · scale``.  At 100 TB the embedding
column dominates the table (a 768-dim float32 vector is 3 KB/row);
int8 cuts it 4× and makes the IVF/LSH candidate scans (vector/ivf.py,
vector/similarity.py) bandwidth-bound on a quarter of the bytes, while
``quantized_dot`` keeps candidate scoring in EXACT integer arithmetic
(Σ qa·qb is a bigint; the two scales multiply back in at the end), so
partial-aggregation order can never change a score.

Everything is pure Column (transform/aggregate folds over the array) —
zero shuffle, zero UDF, whole-stage codegen; error bounds are the
textbook |x − q·scale| ≤ scale/2 (pytest-pinned), and the quantized
representation replays bit-exactly in SQL (float32→double widening is
exact in both engines; round/clamp are integer-identical), which is
what the driver gate checks.

Reference parity: robertgauld/osm stores no vectors; this extends the
engine's vector family (cosine_topk / ann_lsh / ivf_ann /
embedding_near_dups) with the compressed representation they would
serve from at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["quantize_embeddings", "dequantize_expr", "quantized_dot"]


def _scale(vec: Column) -> Column:
    absmax = F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    return absmax / F.lit(127.0)


def quantize_embeddings(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, scale, qvec): absmax int8 quantization per vector.  An
    all-zero (or empty) vector has scale 0 and quantizes to all zeros —
    the division is guarded, not NaN."""
    vec = F.col(vec_col)
    scale = _scale(vec)
    q = F.transform(
        vec,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.round(x.cast("double") / scale, 0).cast("int"),
                ),
            )
        )
        .cast("int"),
    )
    return df.select(
        F.col(id_col),
        scale.alias("scale"),
        q.alias("qvec"),
    )


def dequantize_expr(qvec: Column, scale: Column) -> Column:
    """Approximate reconstruction ``q_i · scale`` as array<double>."""
    return F.transform(qvec, lambda q: q.cast("double") * scale)


def quantized_dot(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """Approximate dot product: EXACT integer Σ qa·qb, rescaled once.
    The integer sum is order-independent, so scores are deterministic
    under any partial-aggregation order."""
    isum = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x * y).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return isum.cast("double") * sa * sb
