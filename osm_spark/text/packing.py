"""Sequence packing — slicing a deterministically-ordered token stream
into fixed-budget training sequences — plus the scalable global prefix
sum it rides on.

A training-data pipeline concatenates documents in a canonical order
(here: ascending doc_id) and cuts the resulting token stream into
``budget``-token sequences; each document needs to know its pack id and
offset. The hard part at 10^12 docs is the GLOBAL running token count:
the naive ``Window.orderBy(...)`` with no partitionBy plans a
single-partition sort — one task owns the whole corpus, the definition
of a non-distributed operator.

``global_cumsum`` computes the exact same numbers with a two-phase
distributed prefix sum:

1. bucket every row by literal range boundaries taken from a quantile
   sketch (``approxQuantile`` — sketch error only affects bucket
   BALANCE, never correctness: any monotone bucketing gives the same
   final sums);
2. per-bucket windows run in parallel (partitionBy bucket), while the
   per-bucket totals — one row per bucket — are collected to the driver
   (kilobytes, like the IVF centroid sync in vector/ivf.py), prefix-
   summed there, and broadcast-joined back as offsets.

cum(row) = offset(bucket) + within-bucket running sum — exact, and
every heavy stage is partition-parallel. Cost: one quantile-sketch job
+ one tiny totals aggregate before the main pass; the input is
persisted across the two stat jobs and unpersisted before return (no
cache leak — see ``global_cumsum``), with ``persist_input=False`` +
the lineage layer's stage boundary as the alternative for callers that
manage their own checkpoints.

Reference parity: the reference has no packing, but its level-fold /
started-stage bucketing (SURVEY.md §2.4 A6/A7, lib/osm/badge.rb:574-720)
is the same derive-then-bucket shape; the budget boundary plays the
level threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    cum_col: str = "cum",
    num_buckets: int | None = None,
    persist_input: bool = True,
) -> DataFrame:
    """Exact running sum of ``value_col`` in ascending ``order_col``
    order, without a single-partition global window.

    ``order_col`` must be unique (it is the total order); values must be
    non-negative longs. Output = input columns + ``cum_col``.

    The input feeds THREE jobs (quantile sketch, per-bucket totals, the
    output plan), so by default it is persisted across the two
    driver-side stat jobs and unpersisted before returning — two
    upstream materializations total (one into cache for both stats, one
    when the caller executes the output) and NO cache left behind (an
    internal never-unpersisted cache would leak per call for the
    session's lifetime). Pass ``persist_input=False`` when the caller
    already persisted or checkpointed the input (e.g. a lineage stage
    boundary) — that also makes it ONE materialization, and is the
    right call for nondeterministic upstreams, where the stats and the
    output pass must see identical rows.
    """
    spark = df.sparkSession
    if persist_input:
        df = df.persist()
    nb = num_buckets or spark.sparkContext.defaultParallelism * 2
    qs = [i / nb for i in range(1, nb)]
    # Sketch error shifts boundaries, which only changes bucket balance;
    # bucket assignment below is monotone in order_col either way.
    bounds = sorted(set(df.stat.approxQuantile(order_col, qs, 0.001))) if qs else []
    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.size(
            F.filter(barr, lambda b: b < F.col(order_col).cast("double"))
        )
    else:
        bucket = F.lit(0)
    dfb = df.withColumn("_bkt", bucket)
    # One row per occupied bucket — kilobytes to the driver.
    totals = {
        r["_bkt"]: r["t"]
        for r in dfb.groupBy("_bkt").agg(F.sum(value_col).alias("t")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(totals):
        offsets.append((b, acc))
        acc += int(totals[b] or 0)
    if persist_input:
        # both stat jobs are done; the output plan recomputes the input
        # once at caller-execution time rather than leaking a cache
        df.unpersist()
    off_df = spark.createDataFrame(offsets, "_bkt int, _off long")
    w = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dfb.join(F.broadcast(off_df), "_bkt")
        .withColumn(cum_col, (F.col("_off") + F.sum(value_col).over(w)).cast("long"))
        .drop("_bkt", "_off")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count: Column | None = None,
    persist_input: bool = True,
) -> DataFrame:
    """Assign each document its slot in the budget-sliced token stream.

    Documents are laid out end-to-end in ascending ``id_col`` order;
    sequence k covers token offsets [k*budget, (k+1)*budget). A document
    starts in ``pack_id`` at ``pack_offset`` and spans
    ``n_packs_spanned`` sequences (>1 when it straddles a boundary —
    the concat-then-chunk convention: no padding, oversized documents
    split across packs).

    All arithmetic is integer (`div`/`pmod` on longs), so the output is
    hash-stable for the oracle gate.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n_tok = (
        token_count
        if token_count is not None
        else F.size(F.split(F.col(text_col), " ")).cast("long")
    )
    with_tok = docs.select(F.col(id_col).alias("doc_id"), n_tok.alias("n_tok"))
    cum = global_cumsum(
        with_tok,
        "doc_id",
        "n_tok",
        cum_col="cum_tokens",
        persist_input=persist_input,
    )
    start = F.col("cum_tokens") - F.col("n_tok")
    b = F.lit(int(budget)).cast("long")
    end_incl = F.when(F.col("n_tok") > 0, F.col("cum_tokens") - 1).otherwise(start)
    return cum.select(
        "doc_id",
        "n_tok",
        "cum_tokens",
        start.alias("_s"),
        end_incl.alias("_e"),
    ).select(
        "doc_id",
        "n_tok",
        "cum_tokens",
        F.expr("_s div " + str(int(budget))).alias("pack_id"),
        F.pmod(F.col("_s"), b).alias("pack_offset"),
        (F.expr("_e div " + str(int(budget))) - F.expr("_s div " + str(int(budget))) + 1)
        .cast("long")
        .alias("n_packs_spanned"),
    )
