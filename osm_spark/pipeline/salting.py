"""Generic data-driven hot-key salting for cell-keyed shuffle joins.

Round 4 proved the pattern on the PIP family (spatial_join.py
``salt_plan`` + ``attach_polygon_dim``: 1.59× over the AQE-only
strawman on a 20 %-hot-cell fixture) and the r4 verdict named the
remaining gap: kNN phase 2, ``radius_join`` and DBSCAN's ``eps_pairs``
still hash-join on the raw cell id with AQE as the only skew backstop.
At the 10^12-page design point a Zipf urban cell puts ~20 % of those
shuffles on one task — AQE's runtime split rebalances shuffle BLOCKS of
the probe side but cannot re-key the join, so one straggler task still
owns the hot cell's build+probe work.

This module is the shared scatter/replicate machinery those joins reuse
(the ``attach_polygon_dim`` shape generalized to any equi-key):

- ``key_salt_plan(df, key)`` — per-key split factors from the data's
  own histogram (north_rule: "salt factor must come from data, not
  constants"). Hot keys only; cold keys are implicitly k=1 and pay one
  broadcast lookup + a 1-element explode.
- ``salted_equi_join(big, small, key, salts, scatter_col)`` — big-side
  rows in a hot key scatter over ``pmod(xxhash64(scatter_col), k)``
  buckets; the small side's rows for that key replicate into all k
  buckets; the join key becomes (key, _salt), hinted shuffle_hash so
  the statless small side never falls back to a SortMergeJoin that
  would sort the big side.

Cost model: replication multiplies only the HOT keys' small-side rows
(bounded: candidate sets are (k+ε)-sized for kNN, ring-disk-sized for
radius/DBSCAN), while the big side — the 10^12-row axis — is never
replicated, only scattered. Same invariants as the PIP plan.

Deliberate non-consolidation: the PIP family keeps its ORIGINAL
implementations (``spatial_join.py`` ``salt_plan`` /
``_prejoin_salted`` / ``attach_polygon_dim``) rather than being
refactored onto this module. Those paths differ in load-bearing ways
this generalization does not carry — the two-side way-level vertex
salt derives WAY split factors from the hot-CELL plan, the adaptive
ladder salts an exploded multi-level frame, and each shape is
plan-pinned and skew-benched as written. Re-plumbing the most-tuned
join in the engine through a generic seam trades measured plans for
abstraction; if the salt SHAPE ever changes (e.g. the explode form),
both sites change together — tests/test_salting.py and
tests/test_plans.py pin the shared invariants on both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["HOT_KEY_TARGET", "key_salt_plan", "salted_equi_join"]

# rows per task a single key may own before it splits — matches the PIP
# family's HOT_CELL_TARGET (spatial_join.py) so one mental model covers
# every cell-keyed join in the engine
HOT_KEY_TARGET = 50_000


def key_salt_plan(
    df: DataFrame, key: str, target: int = HOT_KEY_TARGET
) -> DataFrame:
    """Per-key salt factors ``(key, _k)`` from the data's histogram —
    rows only for keys whose count exceeds ``target``. One combiner-
    reduced aggregate over the key column; in production the same
    histogram comes from partition-level lineage metrics (lineage.py)
    so no extra pass is needed."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > target)
        .select(
            F.col(key),
            F.ceil(F.col("_n") / target).cast("int").alias("_k"),
        )
    )


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: DataFrame,
    scatter_col: str,
) -> DataFrame:
    """Inner equi-join on ``key`` with explicit hot-key splitting.

    ``salts`` is a ``key_salt_plan`` result (or any ``(key, _k)``
    table — broadcast twice, it is hot-keys-only and tiny by
    construction). ``scatter_col`` must be a stable per-row identity on
    the big side (url, point id) so the scatter is deterministic and
    partitioning-invariant. Returns exactly the rows the unsalted join
    returns (tested per caller), with ``_salt`` dropped."""
    b = (
        big.join(F.broadcast(salts), key, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_k").isNotNull(),
                F.pmod(F.xxhash64(scatter_col), F.col("_k")),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("_k")
    )
    s = small.join(F.broadcast(salts), key, "left").select(
        *small.columns,
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("_k") - 1, F.lit(0)))
        ).alias("_salt"),
    )
    return b.join(s.hint("shuffle_hash"), [key, "_salt"]).drop("_salt")
