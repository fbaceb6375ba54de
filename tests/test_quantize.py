"""Int8 quantization (vector/quantize.py): reconstruction error bound,
dot-product approximation, zero-vector guard, clamp behavior, and the
zero-shuffle plan."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from osm_spark.vector.quantize import (
    dequantize_expr,
    quantize_embeddings,
    quantized_dot,
)

VECS = [
    (1, [1.0, -2.0, 0.5, 127.0]),
    (2, [0.001, 0.002, -0.003, 0.0]),
    (3, [0.0, 0.0, 0.0, 0.0]),
    (4, [-5.0, 5.0, 2.5, -2.5]),
]


def _df(spark):
    return spark.createDataFrame(VECS, "vec_id int, embedding array<float>")


def test_reconstruction_error_bound(spark):
    q = quantize_embeddings(_df(spark))
    joined = q.join(_df(spark), "vec_id").select(
        "vec_id",
        "scale",
        F.zip_with(
            dequantize_expr(F.col("qvec"), F.col("scale")),
            F.col("embedding"),
            lambda d, o: F.abs(d - o.cast("double")),
        ).alias("errs"),
    )
    for r in joined.collect():
        bound = r.scale / 2 + 1e-12
        assert all(e <= bound for e in r.errs), (r.vec_id, r.errs, bound)


def test_zero_vector_guard(spark):
    q = {r.vec_id: (r.scale, r.qvec) for r in quantize_embeddings(_df(spark)).collect()}
    assert q[3] == (0.0, [0, 0, 0, 0])


def test_clamp_and_extremes(spark):
    q = {r.vec_id: r.qvec for r in quantize_embeddings(_df(spark)).collect()}
    # component equal to absmax quantizes to exactly ±127
    assert q[1][3] == 127
    assert q[4][0] == -127 and q[4][1] == 127


def test_quantized_dot_close_to_exact(spark):
    df = _df(spark).where("vec_id in (1, 4)")
    q = quantize_embeddings(df)
    a = q.where("vec_id = 1").select(
        F.col("qvec").alias("qa"), F.col("scale").alias("sa")
    )
    b = q.where("vec_id = 4").select(
        F.col("qvec").alias("qb"), F.col("scale").alias("sb")
    )
    got = (
        a.crossJoin(b)
        .select(
            quantized_dot(
                F.col("qa"), F.col("sa"), F.col("qb"), F.col("sb")
            ).alias("d")
        )
        .collect()[0]
        .d
    )
    exact = sum(x * y for (_, va), (_, vb) in [(VECS[0], VECS[3])] for x, y in zip(va, vb))
    # error bound: sum of per-term quantization crosses; generous check
    assert math.isfinite(got)
    assert abs(got - exact) <= 0.02 * max(1.0, abs(exact)) + 1.0


def test_zero_shuffle_plan(spark):
    plan = (
        quantize_embeddings(_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
