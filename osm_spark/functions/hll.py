"""Deterministic HyperLogLog distinct counting (Flajolet et al. 2007) —
the cardinality member of the engine's sketch family (`text/cms.py` is
the frequency sketch; `graph/neighborhood.hyperball` consumes Spark's
DataSketches HLL internally).

Spark's built-in ``approx_count_distinct`` is not replayable outside the
JVM, so this is the engine-portable form: register material is md5
(identical in Spark, DuckDB, Python — the exact-dedup precedent), the
register index is the first p/4 hex nibbles, and the rank ρ comes from
the NEXT 13 nibbles (52 bits) via string arithmetic (strip leading
zeros + a 4-case nibble table) — no log2, no float anywhere in the
sketch itself.  Register harmonic mass is kept as the INTEGER
Σ 2^(53−ρ) (absent registers contribute 2^53 each), so the whole
aggregation is order-independent exact bigint math and the estimator is
ONE closing float expression (bias-corrected raw form + the standard
linear-counting small-range branch) — the engine's micro-quantization
contract, hash-gateable.

The sketch is ALGEBRAIC (the rollup_state/merge_rollup_states
discipline): a register table is the mergeable state, ``hll_merge`` is
register-wise max, and merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B)
EXACTLY — max is idempotent/commutative/associative — so incremental
refresh over landing batches never rescans history and the equivalence
is value-hash gateable, not approximately true.

Scale design: two map-side-combined shuffles — (key, register) max-ρ,
then key-level sums of ≤ 2^p rows per key.  State per key is CONSTANT
(2^p registers), the whole point of the sketch: distinct-user counts
per 10^12-row partition never materialize the distinct sets.  Standard
error ≈ 1.04/√(2^p) (~6.5% at p=8) applies to the estimate itself; the
GATED quantity is bit-exact because both engines run the identical
deterministic sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_distinct",
    "hll_registers",
    "hll_estimate",
    "hll_merge",
    "hll_pairwise_overlap",
    "HLL_RHO_MAX",
]

HLL_RHO_MAX = 53  # 52 tail bits all zero → rho = 53


def _check_p(p: int) -> None:
    if p % 4 != 0 or not 4 <= p <= 12:
        raise ValueError(f"p must be 4, 8 or 12 (nibble-aligned), got {p}")


def hll_registers(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """(keys…, reg, rho) — the mergeable sketch state: per (key,
    register) max rank.  ≤ 2^p rows per key."""
    _check_p(p)
    nib = p // 4

    h = F.md5(F.col(value_col).cast("string"))
    reg = F.conv(F.substring(h, 1, nib), 16, 10).cast("int")
    tail = F.substring(h, nib + 1, 13)
    stripped = F.regexp_replace(tail, "^0+", "")
    d = F.conv(F.substring(stripped, 1, 1), 16, 10).cast("int")
    nzl = F.when(d >= 8, 0).when(d >= 4, 1).when(d >= 2, 2).otherwise(3)
    rho = F.when(F.length(stripped) == 0, F.lit(HLL_RHO_MAX)).otherwise(
        (F.lit(13) - F.length(stripped)) * 4 + nzl + 1
    )

    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*keys, reg.alias("reg"))
        .agg(F.max(rho).alias("rho"))
    )


def hll_merge(keys: list[str], *states: DataFrame) -> DataFrame:
    """Union register states and re-max — sketch(A) ⊔ sketch(B) ≡
    sketch(A ∪ B) exactly (max is idempotent/commutative/associative)."""
    if not states:
        raise ValueError("hll_merge needs at least one state")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys, "reg").agg(F.max("rho").alias("rho"))


def hll_estimate(regs: DataFrame, keys: list[str], p: int = 8) -> DataFrame:
    """(keys…, m_used, v_zero, est_milli) from a register state."""
    _check_p(p)
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    two53 = 1 << HLL_RHO_MAX

    per_key = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("int").alias("m_used"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - rho)"))
        .cast("long")
        .alias("s_present"),
    )
    v_zero = (F.lit(m) - F.col("m_used")).cast("int")
    s_total = F.col("s_present") + v_zero.cast("long") * F.lit(two53).cast("long")
    e_raw = F.lit(float(alpha * m * m * two53)) / s_total.cast("double")
    e = F.when(
        (v_zero > 0) & (e_raw <= F.lit(2.5 * m)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(e_raw)
    return per_key.select(
        *keys,
        "m_used",
        v_zero.alias("v_zero"),
        F.round(e * 1000.0, 0).cast("bigint").alias("est_milli"),
    )


def hll_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """(keys…, m_used, v_zero, est_milli) — deterministic HLL distinct
    estimate of ``value_col`` per key group; ``est_milli`` =
    round(1000·E)."""
    return hll_estimate(hll_registers(df, keys, value_col, p), keys, p)


def hll_pairwise_overlap(
    df: DataFrame,
    key_col: str,
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """(key_a, key_b, est_a_milli, est_b_milli, est_union_milli,
    est_inter_milli) — pairwise audience overlap between key groups by
    HLL inclusion–exclusion: |A∩B| ≈ E(A) + E(B) − E(A ⊔ B), with the
    union sketch obtained for FREE from the mergeable register states
    (no data rescan — the pair stage touches ≤ 2·2^p register rows per
    pair).  ``est_inter_milli`` can go slightly negative on disjoint
    sets (standard inclusion–exclusion noise — the estimator's error is
    on each term); it is reported raw so the caller sees the sketch's
    actual arithmetic.

    The key-pair driver is a self cross join of the DISTINCT KEY DIM
    (bounded by construction — key cardinality, not data), broadcast
    against the register states; everything else is the standard
    register max/sum machinery.
    """
    regs = hll_registers(df, [key_col], value_col, p)
    keys = regs.select(F.col(key_col).alias("key_a")).distinct()
    pairs = keys.crossJoin(
        keys.select(F.col("key_a").alias("key_b"))
    ).where(F.col("key_a") < F.col("key_b"))

    u_regs = (
        regs.join(
            F.broadcast(pairs),
            (F.col(key_col) == F.col("key_a"))
            | (F.col(key_col) == F.col("key_b")),
        )
        .groupBy("key_a", "key_b", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    union_est = hll_estimate(u_regs, ["key_a", "key_b"], p).select(
        "key_a", "key_b", F.col("est_milli").alias("est_union_milli")
    )
    singles = hll_estimate(regs, [key_col], p).select(
        F.col(key_col).alias("_k"), F.col("est_milli").alias("_e")
    )
    return (
        union_est.join(
            F.broadcast(singles.select(F.col("_k").alias("key_a"),
                                       F.col("_e").alias("est_a_milli"))),
            "key_a",
        )
        .join(
            F.broadcast(singles.select(F.col("_k").alias("key_b"),
                                       F.col("_e").alias("est_b_milli"))),
            "key_b",
        )
        .select(
            "key_a",
            "key_b",
            "est_a_milli",
            "est_b_milli",
            "est_union_milli",
            (
                F.col("est_a_milli") + F.col("est_b_milli")
                - F.col("est_union_milli")
            ).alias("est_inter_milli"),
        )
    )
