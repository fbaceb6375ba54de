"""Z-order (Morton) layout keys — multi-column data clustering for the
write path.

Why this exists at 100 TB: parquet/Iceberg scan pruning is only as good
as the per-file min/max statistics, and those are only tight for columns
the layout is sorted by. A single-column sort gives perfect pruning on
one column and none on the others; interleaving the bits of several
normalized columns into ONE sort key (the classic Z-order curve — the
same primitive behind Delta's ``OPTIMIZE ZORDER BY`` and Iceberg's
``rewrite_data_files(sort_order => zorder(...))``) makes every file a
small hyper-rectangle in the combined key space, so a selective filter
on ANY of the participating columns skips most files. Reference analog:
none (the reference is an API client); this is the graft-mandated
Spark-first write-path companion to ``sinks.write_partitioned``'s
file-count/sort control.

Everything is pure Column arithmetic (codegen; identical-IEEE-order
DuckDB replay gates the key), and the layout step is one
``repartitionByRange`` on the key — the same single range exchange a
global sort pays, no extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_to_bits(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into the [0, 2^bits) integer rank space by
    linear scaling from the closed domain [lo, hi] (out-of-domain values
    clamp to the edges — a skewed outlier must not wrap the curve).
    Deterministic: lo/hi are caller-supplied literals (catalog min/max
    stats in production), never computed from the data mid-query."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    span = float(2**bits - 1)
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(span)
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(span))
    return F.floor(clamped).cast("long")


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of column j lands at position
    ``i*ncols + j`` of the key. Inputs must already be in [0, 2^bits)
    (``normalize_to_bits``). ``bits * ncols`` must fit a signed long.

    Emitted as bits×ncols literal-shift terms OR-ed together — pure
    integer codegen, no loop-carried state, constant-folded shifts.
    """
    ncols = len(cols)
    if not cols:
        raise ValueError("need at least one column")
    if bits * ncols > 63:
        raise ValueError(f"{bits} bits x {ncols} cols exceeds a signed long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return key


def zorder_key(
    specs: list[tuple[Column | str, float, float]], bits: int = 16
) -> Column:
    """One Z-order key from [(column, domain_lo, domain_hi), ...]."""
    cols = [
        normalize_to_bits(F.col(c) if isinstance(c, str) else c, lo, hi, bits)
        for c, lo, hi in specs
    ]
    return interleave_bits(cols, bits)


def zorder_key_py(values: list[tuple[float, float, float]], bits: int = 16) -> int:
    """Pure-Python oracle: same clamp/scale/floor/interleave, same order."""
    import math

    span = float(2**bits - 1)
    ints = []
    for v, lo, hi in values:
        scaled = (float(v) - float(lo)) / float(hi - lo) * span
        ints.append(int(math.floor(min(max(scaled, 0.0), span))))
    ncols = len(ints)
    key = 0
    for i in range(bits):
        for j, n in enumerate(ints):
            key |= ((n >> i) & 1) << (i * ncols + j)
    return key


def cluster_by_zorder(
    df: DataFrame,
    specs: list[tuple[Column | str, float, float]],
    num_files: int,
    bits: int = 16,
) -> DataFrame:
    """Re-lay ``df`` so each output partition (→ parquet file) covers a
    contiguous Z-key range: one ``repartitionByRange`` on the key plus an
    in-partition sort — after writing, every file's min/max stats are
    tight on EVERY participating column, so selective filters prune files
    (test_zorder measures the file-skip ratio against an unclustered
    layout). The helper key column is dropped before return."""
    keyed = df.withColumn("_zkey", zorder_key(specs, bits))
    return (
        keyed.repartitionByRange(num_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
