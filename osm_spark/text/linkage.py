"""Record linkage: blocked fuzzy (edit-distance ≤ k) join.

Candidate generation uses the PassJoin partition scheme (Li, Deng &
Feng, "PASS-JOIN: a partition-based method for similarity joins",
VLDB 2011 — public algorithm, independently implemented): if
``ed(a, b) <= k`` and ``a`` is split into ``k+1`` contiguous segments,
then at least one segment occurs VERBATIM in ``b`` starting within
``±k`` of its start position in ``a`` (pigeonhole over the ≤ k edits).
So the left side emits its ``k+1`` segments keyed
``(len(a), seg_index, segment)`` and the right side emits, for every
plausible partner length ``la ∈ [len(b)-k, len(b)+k]`` and every
segment slot, the substrings of ``b`` at the allowed start shifts under
the SAME key.  Matching keys is a plain equi-join — no O(n²) stage —
and the per-row fan-out is a constant ``≤ (2k+1)(k+1)(2k+1)`` bound
independent of corpus size, so the shape survives a 100 TB corpus: one
keyed shuffle whose width is (constant × rows), then an exact
``levenshtein`` refine on candidates only.  Blocking completeness makes
the blocked join's output IDENTICAL to the brute-force join's, which is
exactly what the DuckDB oracle checks.

Strings shorter than ``k+1`` cannot be partitioned into k+1 non-empty
segments; they take a dedicated short block: a left string with
``len ≤ k`` is within distance k only of strings with ``len ≤ 2k``, so
both sides emit one extra ``SHORT`` key under those bounds.

Skew note (scale): segment keys inherit text entropy — a corpus-wide
shared prefix (boilerplate) funnels into few keys.  The key already
contains the partner length, which shards hot text by length; residual
hot keys are exactly the AQE skew-join case and are left to
``spark.sql.adaptive.skewJoin`` rather than hand-salted, because unlike
the PIP hot cells the hot-key set here is data-dependent and transient.

Reference parity: robertgauld/osm matches members across term snapshots
by exact attribute identity (lib/osm/member.rb); this operator is the
fuzzy generalization a web-scale entity-resolution pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["fuzzy_join", "fuzzy_self_pairs"]

# Key marker for the short-string block (seg_i never hits -1 otherwise).
_SHORT_I = -1


def _seg_geometry(la: Column, i: int, k: int) -> tuple[Column, Column]:
    """(start, length) of segment ``i`` when a string of length ``la``
    is split into ``k+1`` pieces, shorter pieces first (the classic
    even partition: ``rem = la % (k+1)`` trailing pieces get one extra
    char).  Pure integer Column arithmetic — stays in codegen."""
    parts = k + 1
    base = F.floor(la / parts).cast("int")
    rem = (la % parts).cast("int")
    n_short = F.lit(parts) - rem  # number of length-`base` pieces
    li = base + F.when(F.lit(i) >= n_short, F.lit(1)).otherwise(F.lit(0))
    pi = F.lit(i) * base + F.greatest(F.lit(0), F.lit(i) - n_short)
    return pi, li


def _left_keys(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Segment side: one key row per segment (k+1 per string), plus the
    SHORT key for strings of length ≤ k."""
    s = F.col(text_col)
    la = F.length(s)
    entries = []
    for i in range(k + 1):
        pi, li = _seg_geometry(la, i, k)
        entries.append(
            F.when(
                la >= k + 1,
                F.struct(
                    la.alias("kl"),
                    F.lit(i).alias("ki"),
                    F.substring(s, pi + 1, li).alias("ks"),
                ),
            )
        )
    entries.append(
        F.when(
            la <= k,
            F.struct(
                F.lit(-1).alias("kl"),
                F.lit(_SHORT_I).alias("ki"),
                F.lit("").alias("ks"),
            ),
        )
    )
    return df.select(
        F.col(id_col).alias("id_a"),
        s.alias("s_a"),
        F.explode(F.array_compact(F.array(*entries))).alias("k"),
    ).select("id_a", "s_a", "k.kl", "k.ki", "k.ks")


def _right_keys(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Probe side: for each plausible partner length ``la = len(b)+dl``
    and segment slot ``i``, the substrings of ``b`` at start shifts
    within ±k of the segment's position in the partner — the exact key
    set the PassJoin lemma guarantees a true match lands in.  Plus the
    SHORT key for ``len(b) ≤ 2k``.  Fan-out ≤ (2k+1)(k+1)(2k+1)+1 rows
    per string — constant, corpus-size independent."""
    s = F.col(text_col)
    lb = F.length(s)
    entries = []
    for dl in range(-k, k + 1):
        la = lb + dl
        for i in range(k + 1):
            pi, li = _seg_geometry(la, i, k)
            for delta in range(-k, k + 1):
                pos = pi + delta
                valid = (
                    (la >= k + 1)
                    & (pos >= 0)
                    & (li >= 1)
                    & (pos + li <= lb)
                )
                entries.append(
                    F.when(
                        valid,
                        F.struct(
                            la.alias("kl"),
                            F.lit(i).alias("ki"),
                            F.substring(s, pos + 1, li).alias("ks"),
                        ),
                    )
                )
    entries.append(
        F.when(
            lb <= 2 * k,
            F.struct(
                F.lit(-1).alias("kl"),
                F.lit(_SHORT_I).alias("ki"),
                F.lit("").alias("ks"),
            ),
        )
    )
    return df.select(
        F.col(id_col).alias("id_b"),
        s.alias("s_b"),
        F.explode(F.array_compact(F.array(*entries))).alias("k"),
    ).select("id_b", "s_b", "k.kl", "k.ki", "k.ks")


def fuzzy_join(
    a: DataFrame,
    b: DataFrame,
    *,
    id_col: str = "id",
    text_col: str = "s",
    max_dist: int = 2,
    keep_self: bool = True,
) -> DataFrame:
    """All pairs (one from ``a``, one from ``b``) whose ``text_col``
    values are within levenshtein distance ``max_dist`` — output
    ``(id_a, id_b, dist)``, identical to the brute-force cross join
    (that identity is the gated oracle).  ``keep_self=False`` drops
    ``id_a == id_b`` rows (useful when ``a`` and ``b`` share ids).

    Null or missing-id rows never match: nulls are filtered up front on
    both sides (a null string has no distance; a null id has no pair
    identity) — the same explicit-null policy exact_topk uses.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1 (use exact join for 0)")
    k = int(max_dist)
    a = a.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
    b = b.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
    lk = _left_keys(a, id_col, text_col, k)
    rk = _right_keys(b, id_col, text_col, k)
    cand = (
        lk.join(rk, on=["kl", "ki", "ks"])
        .select("id_a", "s_a", "id_b", "s_b")
        .distinct()
    )
    dist = F.levenshtein("s_a", "s_b")
    out = cand.where(dist <= k).select(
        "id_a", "id_b", dist.cast("int").alias("dist")
    )
    if not keep_self:
        out = out.where(F.col("id_a") != F.col("id_b"))
    return out


def fuzzy_self_pairs(
    df: DataFrame,
    *,
    id_col: str = "id",
    text_col: str = "s",
    max_dist: int = 2,
) -> DataFrame:
    """Unordered near-duplicate pairs within one table: the self-join
    with ``id_a < id_b`` so each pair appears once — the record-linkage
    dedup shape (cluster seeds feed connected_components for keeper
    election, the same downstream path minhash/simhash pairs use)."""
    pairs = fuzzy_join(
        df, df, id_col=id_col, text_col=text_col, max_dist=max_dist
    )
    return pairs.where(F.col("id_a") < F.col("id_b"))
