"""Deterministic corpus sampling — the reproducible alternative to
``DataFrame.sample`` for training-data curation.

``rand()``-based sampling changes membership with partitioning, retries
and cluster size; a curation pipeline needs the SAME subset on every
run, on any cluster, from either engine (Spark or the DuckDB oracle).
Both operators therefore key on md5 of a salted stable key:

- ``hash_sample`` — Bernoulli-by-key: keep a row iff its salted digest
  falls below a threshold prefix. Pure filter: predicate-pushes, no
  shuffle, no state; changing the salt draws an independent sample.
- ``quota_sample`` — at most ``n`` rows per group (cap documents per
  domain / language / source): rank by salted digest within group.
  The shuffle is one hash-partition on the group key; hot groups are
  AQE skew-split like any other window. For quotas over *millions* of
  groups this stays one exchange; the digest ordering makes the kept
  set independent of arrival order.
- ``split_assign`` — deterministic train/val/test partition: the same
  digest uniform binned into consecutive intervals. Zero-shuffle CASE;
  repeated keys land in the same split (the leakage guard).

Reference parity: the reference's API-page windowing (SURVEY.md §2.2
P5-P8) filters rows by deterministic predicates the same way — these
operators are that idea applied to corpus membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# weighted_sample key-quantization ceiling: an exact IEEE double below
# Long.MAX so double→bigint never overflows in either engine.
_KEY_Q_SATURATE = 9.0e18


def sample_threshold(fraction: float, nibbles: int = 8) -> str:
    """32-char lowercase-hex threshold whose prefix encodes ``fraction``
    of the keyspace (``nibbles`` hex digits of precision). Lexicographic
    compare against md5 hex is identical in Spark and ANSI SQL."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    prefix = format(int(fraction * (16**nibbles)), "x").rjust(nibbles, "0")
    if len(prefix) > nibbles:  # fraction == 1.0
        return "g" * 32  # > every hex digest
    return prefix + "0" * (32 - nibbles)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "s1"
) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``key_col``.

    Membership depends only on (salt, key) — stable across runs,
    partitionings and cluster sizes; repeated keys always travel
    together (sample by DOCUMENT, not by row copy).
    """
    digest = F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col)))
    return df.filter(digest < F.lit(sample_threshold(fraction)))


def mixture_sample(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "s1",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Weighted source mixing: keep ~``fractions[group]`` of each group
    (corpus-mixing weights — upsample wiki, downsample crawl), same
    salted-digest membership as ``hash_sample`` so the mixture is
    reproducible on any engine and nested across weight increases.

    The per-group threshold is a LITERAL map (mixing weights are
    pipeline config, not data), so the whole operator is one map-stage
    filter: no shuffle, no join, no stats pass. Groups absent from
    ``fractions`` fall back to ``default_fraction`` (0.0 = drop unknown
    sources — the safe curation default).
    """
    thresholds = {g: sample_threshold(f) for g, f in fractions.items()}
    m = F.create_map(
        *[F.lit(x) for gt in sorted(thresholds.items()) for x in gt]
    )
    thr = F.coalesce(
        m.getItem(F.col(group_col)), F.lit(sample_threshold(default_fraction))
    )
    digest = F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col)))
    return df.filter(digest < thr)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    key_col: str,
    group_col: str | None = None,
    salt: str = "s1",
    rank_col: str = "rk",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis A-ES scheme (IPL 2006, public algorithm): each
    row draws a reproducible uniform ``u ∈ (0, 1]`` from its salted
    digest and competes on the exponential key ``-ln(u) / w``; the ``n``
    SMALLEST keys are exactly a weight-proportional without-replacement
    sample.  Because ``u`` comes from the md5 digest (not ``rand()``),
    membership is byte-stable across runs, partitionings and cluster
    sizes — the hash_sample/quota_sample guarantee extended to weighted
    draws.  Keys are nano-quantized before ranking (the engine's
    micro-quantization idiom) so rank order is engine-exact for the
    DuckDB twin; ties break on the key column (total order).

    ``group_col=None`` ranks globally — the sort is over candidate
    KEYS, and for global top-n over a huge corpus callers should prefer
    a per-group quota first (the int_quantiles-style caveat); with a
    group the shuffle is one hash-partition on the group key.

    Rows with non-positive or null weight never qualify (a zero-weight
    row has infinite key) and are filtered up front.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    digest = F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col)))
    # first 13 hex nibbles → 52 bits: exactly representable in a double,
    # identical arithmetic in DuckDB; +1 keeps u > 0 so ln(u) is finite
    u = (F.conv(F.substring(digest, 1, 13), 16, 10).cast("double") + 1.0) / F.lit(
        float(16**13)
    )
    key = -F.log(u) / F.col(weight_col).cast("double")
    # Saturate the nano-quantized key BELOW Long.MAX before the bigint
    # cast: for weights < ~4e-9 the product overflows, and Spark's
    # double→long cast saturates silently while DuckDB's CAST errors —
    # a cross-engine divergence (ADVICE r4).  9e18 < 2^63-1 is the same
    # IEEE double in both engines, so clamped rows (hopeless candidates
    # whose keys are astronomically large anyway) collapse to one
    # deterministic sentinel and fall to the key_col tie-break in both.
    key_q = F.least(F.round(key * 1e9, 0), F.lit(_KEY_Q_SATURATE)).cast(
        "bigint"
    )
    parts = [group_col] if group_col else []
    w = Window.partitionBy(*parts).orderBy(key_q, F.col(key_col))
    return (
        df.where(
            F.col(weight_col).isNotNull()
            & (F.col(weight_col).cast("double") > 0.0)
        )
        .withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "split",
    label_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each key's salted
    digest falls into CONSECUTIVE ``[0, 1)`` intervals, one per split,
    in ``fractions`` insertion order — input columns + ``label_col``.

    Membership depends only on (salt, key): stable across runs,
    partitionings and engines (the hash_sample guarantee applied to a
    partition instead of a filter), and repeated keys always land in
    the SAME split — the leakage guard a random split can't give.
    Because intervals are consecutive, growing a LATER split's fraction
    never reassigns rows between earlier splits.

    Fractions must be positive and sum to ≤ 1 (+ threshold-precision
    slack); when they sum below 1 the tail of the keyspace gets a NULL
    label (the discard-holdout convention — filter it, or pass an
    explicit remainder split to keep everything).

    Pure map-stage CASE over literal thresholds: no shuffle, no join,
    no stats pass — it composes with partition pruning like any
    predicate.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    if any(f <= 0 for f in fractions.values()):
        raise ValueError(f"fractions must all be > 0, got {fractions}")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions must sum to <= 1, got {total}")
    digest = F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col)))
    expr = None
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        thr = F.lit(sample_threshold(min(cum, 1.0)))
        cond = digest < thr
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return df.withColumn(label_col, expr)


def quota_sample(
    df: DataFrame,
    group_col: str,
    n: int,
    key_col: str,
    salt: str = "s1",
    rank_col: str = "rk",
) -> DataFrame:
    """Keep at most ``n`` rows per ``group_col``, chosen by salted-digest
    rank (ties broken by the key itself — total order, deterministic).

    Output = input columns + ``rank_col`` (1-based rank within group).
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    digest = F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col)))
    w = Window.partitionBy(group_col).orderBy(digest, F.col(key_col))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )
