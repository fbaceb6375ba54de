"""First-order Markov transition statistics over per-user event streams.

The behavioral-model layer of event analytics (pipeline/funnel.py asks
"do users follow THIS path"; this measures which paths exist — the
empirical transition matrix behind next-action prediction, anomaly
scoring and bot detection, and the categorical sibling of the OD matrix
in geo/odmatrix.py: same LAG shape, event types instead of tiles).

Output per observed (prev, cur) transition: exact count, the row
marginal (outgoing transitions from ``prev``), and the conditional
probability P(cur | prev) quantized to micro-units from the two exact
integers in one closing division — value-hash gateable (the lm_score
recipe; the division is the only float op).

Plan: ONE user-keyed hash exchange for the LAG window (per-partition
sort, no global sort — trip_stats' documented shape), then ONE
transition-keyed aggregate (map-side combined). The row marginal is a
window SUM over the ALREADY-aggregated transition table — |types|²
rows at most, so the second window is vocabulary-sized, not data-sized.
Nothing after the first aggregate scales with |events|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def markov_transitions(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
    event_type: str = "event_type",
) -> DataFrame:
    """(prev, cur, n, n_from_prev, p_micro) — first-order transition
    counts per ordered per-user event pair; p_micro =
    round(1e6 · n / n_from_prev). Each user's first event starts no
    transition."""
    w = Window.partitionBy(user).orderBy(ts, order_id)
    trans = (
        events.select(
            F.lag(event_type).over(w).alias("prev"),
            F.col(event_type).alias("cur"),
        )
        .where(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = Window.partitionBy("prev")
    return trans.select(
        "prev",
        "cur",
        "n",
        F.sum("n").over(row_tot).alias("n_from_prev"),
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(row_tot).cast("double")
            * 1e6,
            0,
        )
        .cast("long")
        .alias("p_micro"),
    )
