"""Layout-controlled parquet sink: partition directories, bounded file
counts, in-file sort locality, and a row-count manifest.

The write side of S7 at corpus scale: a naive ``partitionBy`` write emits
one file per (shuffle partition × partition value) — the classic
small-file explosion that murders downstream scan planning at 10^5+
partitions — while a plain ``coalesce`` serializes the write. This sink
shuffles rows to at most ``files_per_partition`` buckets per partition
value (deterministic hash of the sort key, so re-runs produce identical
layouts), sorts within each task for scan locality / row-group pruning,
and returns the per-file row counts read from parquet footers — the same
manifest surface Iceberg keeps natively (lineage.py's catalog-table mode
is the seam when a catalog is configured).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    sort_cols: list[str] | None = None,
    num_tasks: int | None = None,
) -> list[tuple[str, int]]:
    """Write ``df`` under ``path`` partitioned by ``partition_cols`` with
    a bounded, deterministic file count and optional in-file ordering.

    ``files_per_partition`` is an UPPER bound, not an exact count: the
    repartition hash-distributes (partition value, bucket) combos into
    shuffle tasks, and two distinct buckets that land in one task merge
    into one output file. The layout is still deterministic (same data →
    same files). Pass ``num_tasks`` ≈ the number of distinct
    (partition value × bucket) combos — e.g. from catalog stats — to
    make such collisions rare and the bound tight.

    Returns [(relative_file_path, row_count)] from the parquet footers
    (metadata only — no data re-scan).
    """
    if files_per_partition < 1:
        raise ValueError("files_per_partition must be >= 1")
    sort_cols = sort_cols or []
    bucket_src = sort_cols[0] if sort_cols else df.columns[0]
    bucket = F.pmod(F.xxhash64(F.col(bucket_src)), F.lit(files_per_partition))
    part_exprs = [*[F.col(c) for c in partition_cols], bucket.alias("_file_bucket")]
    keyed = (
        df.repartition(num_tasks, *part_exprs)
        if num_tasks
        else df.repartition(*part_exprs)
    )
    if sort_cols:
        keyed = keyed.sortWithinPartitions(*partition_cols, *sort_cols)
    (
        keyed.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    manifest: list[tuple[str, int]] = []
    import pyarrow.parquet as pq

    for root, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if fn.endswith(".parquet"):
                full = os.path.join(root, fn)
                manifest.append(
                    (os.path.relpath(full, path), pq.ParquetFile(full).metadata.num_rows)
                )
    return manifest
