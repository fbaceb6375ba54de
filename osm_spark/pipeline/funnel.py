"""Ordered funnel analysis: how many users complete step 1 → 2 → … → K
in sequence — the conversion question (view → click → purchase) asked
of every event stream, and the crawl analog (fetch → parse → index).

Semantics: a user reaches step k iff the steps occur IN ORDER — the
k-th step event strictly after the event that matched step k−1 (ties
broken by the order id, so same-timestamp events still have one
deterministic order). Matching is greedy-earliest, which is equivalent
to the "min timestamp after previous match" chaining the oracle replays
(greedy takes the earliest possible match at every step, so it
dominates any other assignment — the standard funnel argument).

Implementation — one fold, no self-joins: the K-step chain is NOT K
joins (the naive translation, K passes over the event table). Events
are pruned to the step types at the scan (predicate pushdown), sorted
per user into one array, and folded left-to-right with an integer
"steps matched so far" accumulator via ``F.aggregate`` — pure Column,
whole-stage codegen, zero Python. One user-keyed exchange total;
per-user memory is that user's STEP events only (the sessionize
grouped shape). The closing count is a 1-row aggregate.

Plan shape: scan (pushed IN filter) → groupBy(user) collect_list
(map-side combined) → fold projection → single-row conditional sums →
explode to K rows. Nothing after the first aggregate scales with
|events|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user: str = "user_id",
    ts: str = "ts",
    event_type: str = "event_type",
    order_id: str = "event_id",
) -> DataFrame:
    """(step, step_name, n_users) — one row per funnel step, n_users =
    users whose event sequence reaches that step in order (cumulative:
    n_users is non-increasing in step)."""
    if not steps:
        raise ValueError("steps must be a non-empty list")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps}")
    steps_arr = F.array(*[F.lit(s) for s in steps])

    seq = (
        events.where(F.col(event_type).isin(steps))
        .select(
            F.col(user).alias("user"),
            F.struct(
                F.col(ts).alias("ts"),
                F.col(order_id).alias("oid"),
                F.col(event_type).alias("t"),
            ).alias("e"),
        )
        .groupBy("user")
        .agg(F.sort_array(F.collect_list("e")).alias("seq"))
    )
    reached = seq.select(
        F.aggregate(
            "seq",
            F.lit(0),
            lambda acc, e: F.when(
                (acc < F.lit(len(steps)))
                & (e["t"] == F.element_at(steps_arr, acc + 1)),
                acc + 1,
            ).otherwise(acc),
        ).alias("reached")
    )
    counts = reached.agg(
        *[
            F.sum((F.col("reached") >= k).cast("long")).alias(f"n{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(k).alias("step"),
                F.lit(steps[k - 1]).alias("step_name"),
                F.coalesce(F.col(f"n{k}"), F.lit(0)).alias("n_users"),
            )
            for k in range(1, len(steps) + 1)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select(
        "r.step", "r.step_name", "r.n_users"
    )
