"""Exact per-group quantiles over integer-valued metrics — the corpus
curation dashboard primitive ("token-count P50/P95/P99 per language",
"chars-per-doc P99 per source") that decides filter thresholds and
packing sequence lengths.

Reference analog: grouped statistics extend the reference's aggregate
query family (SURVEY.md §2.4); the quantile form is engine machinery a
10^12-doc corpus needs (graft mandate: training-data pipeline
operators).

Exact at scale WITHOUT sorting the data: the naive exact path (window
rank over every row) dies when one group holds 10^10 rows — a single
partition must sort them. But corpus metrics are small-range INTEGERS
(token counts, char counts, scores quantized by the engine's micro-unit
idiom), so the distribution collapses losslessly to a per-(group,
value) histogram first: one map-side-combined aggregate over the big
axis, then the window cumulative sum runs over the HISTOGRAM (rows =
distinct values per group — thousands, not billions). Rank selection on
the cumulative histogram is exact by construction; no t-digest /
percentile_approx error bars.

Semantics: the discontinuous (type-1 / ``percentile_disc``-style)
quantile — the element at 1-based rank ``floor(q·(n−1)) + 1`` of the
ascending multiset. Always an actual data value (never interpolated),
which is also what keeps the cross-engine gate trivial: integer in,
integer out.

Sibling: ``functions/quantiles.integer_quantiles`` is the GLOBAL
(ungrouped) form of the same histogram method — its cumulative window
is necessarily single-partition (safe only because the input is the
histogram), while this grouped form partitions the window BY GROUP, so
the histogram scan parallelizes across groups too. Global = that
module; per-group = this one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["histogram_quantiles"]


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: Sequence[float],
) -> DataFrame:
    """(group, q, value) — the exact disc-quantile of ``value_col`` per
    ``group_col`` for every q in ``qs`` (each in [0, 1]; q = 0 is the
    min, q = 1 the max). NULL values are excluded. ``value_col`` should
    be integer-valued (see module docstring — that is what makes the
    histogram collapse lossless)."""
    if not qs:
        raise ValueError("qs must be non-empty")
    bad = [q for q in qs if not (0.0 <= float(q) <= 1.0)]
    if bad:
        raise ValueError(f"quantiles must be in [0, 1], got {bad}")

    hist = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"), F.col(value_col).alias("value")
        )
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w_cum = Window.partitionBy("grp").orderBy("value")
    w_all = Window.partitionBy("grp")
    cum = hist.select(
        "grp",
        "value",
        "_c",
        F.sum("_c").over(w_cum).alias("_cm"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    q_arr = F.array(*[F.lit(float(q)) for q in qs])
    r = (
        F.floor(F.col("q") * (F.col("_n") - 1).cast("double")).cast("long")
        + 1
    )
    return (
        cum.select("grp", "value", "_c", "_cm", "_n", F.explode(q_arr).alias("q"))
        .where((F.col("_cm") - F.col("_c") < r) & (r <= F.col("_cm")))
        .select(
            F.col("grp").alias(group_col),
            "q",
            F.col("value").alias(value_col),
        )
    )
