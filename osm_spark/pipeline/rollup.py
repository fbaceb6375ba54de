"""Hypertable-style time-bucket rollup — OHLC downsampling + gap fill.

The continuous-aggregate primitive a timeseries store (TimescaleDB's
``time_bucket`` + ``locf``/``interpolate``, InfluxDB's downsampling
tasks) pairs with an events stream: collapse a high-rate event table to
one row per (series key, fixed-width bucket) carrying open/high/low/
close/sum/count, then densify the bucket axis so every series exposes a
gap-free grid with last-observation-carried-forward values — the shape
every dashboard and ML feature pipeline consumes. Extends the
reference's attendance/date-keyed rollup semantics (lib/osm/register.rb
date-column folds — SURVEY §2.4 A6/A7) from per-term columns to
arbitrary fixed-width time buckets.

Exactness contract (the engine's value-hash conventions):
- bucket ids are integer ``epoch_us div width_us`` — tz-free (the
  trips.py ``unix_micros``/``epoch_us`` precedent), portable;
- open/close are SELECTIONS via struct-min/max ordered (ts, id, value)
  — deterministic under ties, no accumulation, so the raw doubles hash;
- high/low are order-independent double extrema — hashable as-is;
- sum quantizes PER ROW to micro-units and integer-sums (the lm_score
  micro-nat precedent): no float-accumulation order dependence.

Scale shape:
- ``rollup_ohlc`` is ONE map-side-combined exchange on (key, bucket) —
  every aggregate (struct-min/max, extrema, bigint sum, count) is
  algebraic, so the shuffle carries one partial row per partition per
  live (key, bucket), not the event stream. Plan note (measured,
  PLANS.md): Spark executes struct min/max via SortAggregate — the
  partial aggregate STILL combines before the exchange, but each input
  partition pays one (key, bucket)-sort. min_by with a struct ordering
  hits the same fallback (tested), and packing (ts, id) into one long
  overflows for widths > ~1 h, so the sort is the accepted price of
  exact deterministic open/close; the alternative (drop the event_id
  tie-break) trades determinism for a HashAggregate and is rejected by
  the engine's hash-gate contract. At 10^12 events the output
  is bounded by keys × span/width, independent of the input rate.
- ``gap_fill`` densifies per key with sequence()/explode — grid size is
  keys × bucket span, never a cross join — and carries values forward
  with ONE window per key (last ignoreNulls ordered by bucket). The
  window partitions by series key, so parallelism is the key
  cardinality; a single series spanning decades at 1 s buckets is a
  skewed partition — pick a width that bounds buckets-per-key (the
  TimescaleDB chunk-sizing rule) or split the fill by coarse epoch
  first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SUM_SCALE = 1_000_000  # micro-units carried by the quantized sum

__all__ = [
    "time_bucket",
    "rollup_ohlc",
    "rollup_state",
    "merge_rollup_states",
    "finalize_rollup",
    "gap_fill",
]


def time_bucket(ts: Column | str, width_s: int) -> Column:
    """Integer bucket id: epoch_us div (width·10^6) — tz-free, portable
    (DuckDB: ``epoch_us(ts) // (width * 1000000)``). Integer division
    via pmod subtraction (not double /) so the id is exact at any
    epoch."""
    c = F.col(ts) if isinstance(ts, str) else ts
    us = F.unix_micros(c.cast("timestamp"))
    width_us = F.lit(int(width_s) * 1_000_000)
    return ((us - F.pmod(us, width_us)) / width_us).cast("long")


def rollup_state(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    width_s: int = 3600,
) -> DataFrame:
    """ALGEBRAIC partial state per (key, bucket): every column is
    re-combinable (struct-min/max keep the full (t, i, v) pick so a
    later merge can still decide open/close across batches) — the
    continuous-aggregate state table a TimescaleDB materialization
    stores. One map-side-combined exchange."""
    key = F.col(key_col).alias("key")
    b = time_bucket(F.col(ts_col), width_s).alias("bucket")
    pick = F.struct(
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("i"),
        F.col(val_col).cast("double").alias("v"),
    )
    rows = events.select(
        key, b, pick.alias("_p"), F.col(val_col).cast("double").alias("_v")
    )
    return rows.groupBy("key", "bucket").agg(
        F.min("_p").alias("open_pick"),
        F.max("_v").alias("high"),
        F.min("_v").alias("low"),
        F.max("_p").alias("close_pick"),
        F.sum(F.round(F.col("_v") * SUM_SCALE, 0).cast("long")).alias(
            "sum_micro"
        ),
        F.count(F.lit(1)).alias("n"),
    )


def merge_rollup_states(*states: DataFrame) -> DataFrame:
    """Combine partial states (incremental refresh: standing state ⊕
    new-batch state, NO rescan of history). Correct because every
    column is algebraic: struct-min/max, extrema, and integer sums all
    re-combine associatively — merge(state(A), state(B)) ≡ state(A∪B)
    by construction, and the gate attests it against the full
    recompute."""
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy("key", "bucket").agg(
        F.min("open_pick").alias("open_pick"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max("close_pick").alias("close_pick"),
        F.sum("sum_micro").alias("sum_micro"),
        F.sum("n").alias("n"),
    )


def finalize_rollup(state: DataFrame) -> DataFrame:
    """Project the user-facing (key, bucket, open, high, low, close,
    sum_micro, n) row from a (possibly merged) state table."""
    return state.select(
        "key",
        "bucket",
        F.col("open_pick").getField("v").alias("open"),
        "high",
        "low",
        F.col("close_pick").getField("v").alias("close"),
        "sum_micro",
        "n",
    )


def rollup_ohlc(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    width_s: int = 3600,
) -> DataFrame:
    """(key, bucket, open, high, low, close, sum_micro, n) per live
    (key, bucket) — finalize(state): still one map-side-combined
    exchange (the projection adds no shuffle)."""
    return finalize_rollup(
        rollup_state(
            events,
            key_col=key_col,
            ts_col=ts_col,
            id_col=id_col,
            val_col=val_col,
            width_s=width_s,
        )
    )


def gap_fill(
    rolled: DataFrame,
    *,
    key_col: str = "key",
    bucket_col: str = "bucket",
    fill_col: str = "close",
    method: str = "locf",
) -> DataFrame:
    """Densify each key's bucket axis between its own min and max bucket
    and fill ``fill_col``. Returns (key, bucket, <fill>, filled,
    is_gap): ``filled`` is the fill value (never NULL — every key's
    first and last buckets are observed by construction), ``is_gap``
    marks synthesized rows.

    ``method='locf'`` carries the last observation forward;
    ``method='interpolate'`` fills each gap linearly between the
    surrounding observations (the TimescaleDB ``interpolate``
    semantics) — prev + (next − prev)·(b − pb)/(nb − pb), one IEEE
    double expression replayable bit-for-bit in SQL."""
    from pyspark.sql import Window

    if method not in ("locf", "interpolate"):
        raise ValueError(f"unknown gap_fill method: {method!r}")
    span = rolled.groupBy(key_col).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    grid = span.select(
        key_col,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias(bucket_col),
    )
    j = grid.join(
        rolled.select(key_col, bucket_col, fill_col),
        [key_col, bucket_col],
        "left",
    )
    back = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_v = F.last(fill_col, ignorenulls=True).over(back)
    if method == "locf":
        filled = prev_v
    else:
        fwd = (
            Window.partitionBy(key_col)
            .orderBy(bucket_col)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        obs_b = F.when(F.col(fill_col).isNotNull(), F.col(bucket_col))
        prev_b = F.last(obs_b, ignorenulls=True).over(back)
        next_v = F.first(fill_col, ignorenulls=True).over(fwd)
        next_b = F.first(obs_b, ignorenulls=True).over(fwd)
        frac = (F.col(bucket_col) - prev_b).cast("double") / (
            next_b - prev_b
        ).cast("double")
        filled = F.when(F.col(fill_col).isNotNull(), F.col(fill_col)).otherwise(
            prev_v + (next_v - prev_v) * frac
        )
    return j.select(
        key_col,
        bucket_col,
        F.col(fill_col),
        filled.alias("filled"),
        F.col(fill_col).isNull().alias("is_gap"),
    )
