"""hll_distinct vs an exact python replay + accuracy sanity."""

from __future__ import annotations

import hashlib
import math

import pytest

from osm_spark.functions.hll import HLL_RHO_MAX, hll_distinct

P = 8
M = 1 << P
ALPHA = 0.7213 / (1.0 + 1.079 / M)


def _sketch(values) -> dict[int, int]:
    regs: dict[int, int] = {}
    for v in values:
        d = hashlib.md5(str(v).encode()).hexdigest()
        reg = int(d[:2], 16)
        tail = d[2:15]
        stripped = tail.lstrip("0")
        if not stripped:
            rho = HLL_RHO_MAX
        else:
            first = int(stripped[0], 16)
            nzl = 0 if first >= 8 else 1 if first >= 4 else 2 if first >= 2 else 3
            rho = (13 - len(stripped)) * 4 + nzl + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def _estimate(regs: dict[int, int]):
    two53 = 1 << HLL_RHO_MAX
    s = sum(1 << (HLL_RHO_MAX - r) for r in regs.values())
    v = M - len(regs)
    s_total = s + v * two53
    e_raw = (ALPHA * M * M * two53) / float(s_total)
    e = M * math.log(M / float(v)) if v > 0 and e_raw <= 2.5 * M else e_raw
    r = e * 1000.0
    est = int(math.floor(r + 0.5))
    return len(regs), v, est


@pytest.fixture(scope="module")
def df(spark):
    rows = [(f"g{u % 3}", u * 7 + u % 5) for u in range(1000)]
    rows += [("empty", None)]
    return spark.createDataFrame(rows, "grp string, uid long")


def test_hll_matches_replay(spark, df):
    got = {r.grp: (r.m_used, r.v_zero, r.est_milli)
           for r in hll_distinct(df, ["grp"], "uid", p=P).collect()}
    want = {}
    for g in ("g0", "g1", "g2"):
        vals = {u * 7 + u % 5 for u in range(1000) if f"g{u % 3}" == g}
        want[g] = _estimate(_sketch(vals))
    assert got == want
    assert "empty" not in got  # all-NULL group has no registers


def test_hll_accuracy_within_3_sigma(spark):
    rows = [("k", i * 2654435761 % (1 << 40)) for i in range(5000)]
    df = spark.createDataFrame(rows, "grp string, uid long")
    est = hll_distinct(df, ["grp"], "uid", p=P).collect()[0].est_milli / 1000.0
    true = len({r[1] for r in rows})
    assert abs(est - true) / true < 3 * 1.04 / math.sqrt(M)


def test_hll_small_range_is_linear_counting(spark):
    rows = [("k", i) for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, uid long")
    r = hll_distinct(df, ["grp"], "uid", p=P).collect()[0]
    v = M - r.m_used
    want = M * math.log(M / float(v)) * 1000.0
    assert r.est_milli == int(math.floor(want + 0.5))


def test_hll_validation(spark, df):
    with pytest.raises(ValueError):
        hll_distinct(df, ["grp"], "uid", p=7)


def test_hll_merge_equals_full_sketch(spark, df):
    from osm_spark.functions.hll import hll_estimate, hll_merge, hll_registers
    from pyspark.sql import functions as F

    parts = [df.where(F.col("uid") % 3 == r) for r in range(3)]
    merged = hll_merge(
        ["grp"], *[hll_registers(p_, ["grp"], "uid", p=P) for p_ in parts]
    )
    got = {r.grp: (r.m_used, r.v_zero, r.est_milli)
           for r in hll_estimate(merged, ["grp"], p=P).collect()}
    want = {r.grp: (r.m_used, r.v_zero, r.est_milli)
            for r in hll_distinct(df, ["grp"], "uid", p=P).collect()}
    assert got == want


def test_hll_merge_idempotent(spark, df):
    from osm_spark.functions.hll import hll_estimate, hll_merge, hll_registers

    s = hll_registers(df, ["grp"], "uid", p=P)
    twice = hll_merge(["grp"], s, s)
    got = {r.grp: r.est_milli for r in hll_estimate(twice, ["grp"], p=P).collect()}
    want = {r.grp: r.est_milli for r in hll_estimate(s, ["grp"], p=P).collect()}
    assert got == want


def test_hll_pairwise_overlap_matches_replay(spark):
    from osm_spark.functions.hll import hll_pairwise_overlap

    # three groups with controlled overlap: a∩b large, a∩c empty
    rows = (
        [("a", u) for u in range(0, 400)]
        + [("b", u) for u in range(200, 600)]
        + [("c", u) for u in range(10_000, 10_300)]
    )
    df = spark.createDataFrame(rows, "grp string, uid long")
    got = {(r.key_a, r.key_b): (r.est_a_milli, r.est_b_milli,
                                r.est_union_milli, r.est_inter_milli)
           for r in hll_pairwise_overlap(df, "grp", "uid", p=P).collect()}
    vals = {"a": set(range(400)), "b": set(range(200, 600)),
            "c": set(range(10_000, 10_300))}
    want = {}
    for a, b in (("a", "b"), ("a", "c"), ("b", "c")):
        ea = _estimate(_sketch(vals[a]))[2]
        eb = _estimate(_sketch(vals[b]))[2]
        eu = _estimate(_sketch(vals[a] | vals[b]))[2]
        want[(a, b)] = (ea, eb, eu, ea + eb - eu)
    assert got == want
    # overlap ordering is recovered: a∩b >> a∩c
    assert got[("a", "b")][3] > got[("a", "c")][3]
