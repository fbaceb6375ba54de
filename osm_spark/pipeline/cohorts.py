"""Cohort retention: signup-week × activity-week user counts.

The longitudinal view of the event stream (sessionize gives within-visit
structure, trip_stats per-user movement; this gives corpus-level
stickiness — "of the users who first appeared in week W, how many came
back k weeks later"). The standard retention triangle of product/crawl
analytics, here over the events table.

Exactness: week buckets are ``date_trunc('week', ts)`` (Monday-start in
both Spark and DuckDB) cast to DATE, offsets are integer day-diffs div
7, and each user contributes at most once per (cohort, offset) cell via
a pre-aggregated distinct — every gated value is an exact integer.

Scale plan (10^12 events): one user-keyed aggregate for the cohort
assignment (map-side combined min), one (user, week) distinct that
rides the SAME user-keyed exchange prefix, a user-keyed join of two
user-sized tables (shuffle-hash — both ≪ events), then the final
(cohort, offset) aggregate over user-sized input. The raw event table
is touched exactly twice, both times collapsing straight into per-user
rows; nothing downstream scales with |events|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, n_users) — users active in
    cohort_week + 7·week_offset days, grouped by their first-seen week.
    Offset 0 rows are the cohort sizes (every user is active in their
    own first week by definition)."""
    week = F.date_trunc("week", F.col(ts)).cast("date")
    cohorts = (
        events.select(F.col(user).alias("user"), week.alias("w"))
        .groupBy("user")
        .agg(F.min("w").alias("cohort_week"))
    )
    active = (
        events.select(F.col(user).alias("user"), week.alias("active_week"))
        .distinct()
    )
    return (
        active.join(cohorts.hint("shuffle_hash"), "user")
        .select(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week"))
                / F.lit(7)
            )
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
