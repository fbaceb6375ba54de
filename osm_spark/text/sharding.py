"""Deterministic global shuffle into training shards.

Training runs consume the corpus as K shard files in a fixed pseudo-
random order — "shuffle once, stream forever". ``DataFrame.repartition``
cannot provide that: its assignment changes with cluster size and its
within-partition order with task scheduling. This operator derives BOTH
the shard and the position from a salted md5 of the document key, so the
layout is a pure function of (salt, key): byte-stable across runs,
cluster sizes and engines (the DuckDB oracle replays it exactly).

Scale design (10^12 docs): one exchange. Shard assignment is a pure
projection (predicate-pushes, codegen); the position is a ``row_number``
over the shard partition ordered by digest — Spark plans that as a
single hash exchange on ``shard`` followed by a per-partition sort.
K shards at 10^12 rows means 10^12/K rows per window partition; K is
chosen as the training-file count (10^4-10^5), so each sort fits an
executor and spills at worst. No driver state, no collect. The digest
ordering IS the shuffle: within a shard, documents appear in md5 order,
i.e. uniformly pseudo-randomly with respect to any source ordering.

Reference parity: the reference's deterministic cache keys are salted
stable-key digests the same way (`lib/osm/model.rb` cache_key building;
SURVEY.md §2.1 S1) — here the digest drives layout instead of lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shard_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "sh1",
) -> DataFrame:
    """Add ``(shard int, shard_pos long)``: shard = first-8-hex-digits of
    the salted digest mod ``n_shards``; shard_pos = 1-based rank of the
    digest within the shard (ties impossible for distinct keys; equal
    keys tie-break on the key itself for full determinism)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    digest = F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col)))
    shard = F.pmod(
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("_digest", key_col)
    return (
        df.withColumn("_digest", digest)
        .withColumn("shard", shard)
        .withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .drop("_digest")
    )


def shard_assign_sql(
    table: str, key_col: str, n_shards: int, salt: str = "sh1"
) -> str:
    """DuckDB replay: identical digest, hex→int via '0x' cast, identical
    window. Emits ``SELECT *, shard, shard_pos FROM {table}``-shaped SQL
    (all source columns preserved)."""
    digest = f"md5('{salt}:' || CAST({key_col} AS VARCHAR))"
    shard = f"CAST(CAST('0x' || substr({digest}, 1, 8) AS BIGINT) % {n_shards} AS INT)"
    return f"""
        SELECT * EXCLUDE (_digest),
               CAST(row_number() OVER (
                   PARTITION BY shard ORDER BY _digest, {key_col}
               ) AS BIGINT) AS shard_pos
        FROM (
            SELECT *, {digest} AS _digest, {shard} AS shard
            FROM {table}
        )
    """
