"""Hilbert-curve layout keys — the locality upgrade on Z-order.

Same write-path role as zorder.py (tight per-file min/max on both
participating columns → file skipping on either filter), but the
Hilbert curve never takes the Z-curve's long diagonal jumps: every
consecutive key step moves to a 4-adjacent cell, so a contiguous key
range covers a more compact spatial blob and a bbox scan touches fewer
files (the reason Iceberg/Delta's docs recommend Hilbert over Z for
geo layouts; measured locality win in tests/test_hilbert.py).

Algorithm: the classic xy→d loop (public domain, the Wikipedia
"Hilbert curve" convert_xy_to_d form), UNROLLED over the ``bits``
levels as a chain of per-level projections. Each level's (x, y, d)
lands in named intermediate columns (one ``withColumns`` per level —
~10 integer ops each, referenced multiply, which Spark ≥3.3's
CollapseProject keeps un-inlined precisely because duplicating
non-cheap multi-referenced expressions is what its cost guard
prevents), so the plan grows LINEARLY in ``bits`` — no 3^bits
expression blow-up, pure codegen integer arithmetic, no UDF.

Exactness: integer-only — the key hash-gates against a generated
unrolled SQL replay with one CTE per level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_spark.pipeline.zorder import normalize_to_bits

__all__ = ["attach_hilbert_key", "hilbert_d_py", "cluster_by_hilbert"]


def attach_hilbert_key(
    df: DataFrame,
    xspec: tuple[Column | str, float, float],
    yspec: tuple[Column | str, float, float],
    bits: int = 16,
    out_col: str = "hkey",
) -> DataFrame:
    """``df`` plus ``out_col``: the 2-D Hilbert index (0 ≤ d < 4^bits)
    of the two normalized columns. Helper columns are dropped."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    (xc, xlo, xhi), (yc, ylo, yhi) = xspec, yspec
    x0 = normalize_to_bits(F.col(xc) if isinstance(xc, str) else xc, xlo, xhi, bits)
    y0 = normalize_to_bits(F.col(yc) if isinstance(yc, str) else yc, ylo, yhi, bits)
    out = df.withColumns({"_hx": x0, "_hy": y0, "_hd": F.lit(0).cast("long")})
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        x, y, d = F.col("_hx"), F.col("_hy"), F.col("_hd")
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        d2 = d + F.lit(int(s) * int(s)).cast("long") * (
            (F.lit(3) * rx).bitwiseXOR(ry)
        ).cast("long")
        # rotate/reflect the lower quadrant (only when ry == 0)
        flip = (ry == 0) & (rx == 1)
        xr = F.when(flip, F.lit(s - 1) - x).otherwise(x)
        yr = F.when(flip, F.lit(s - 1) - y).otherwise(y)
        x2 = F.when(ry == 0, yr).otherwise(x)
        y2 = F.when(ry == 0, xr).otherwise(y)
        out = out.withColumns({"_hx": x2, "_hy": y2, "_hd": d2})
    return out.withColumn(out_col, F.col("_hd")).drop("_hx", "_hy", "_hd")


def hilbert_d_py(x: int, y: int, bits: int) -> int:
    """Pure-Python oracle: the same unrolled xy→d loop."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def cluster_by_hilbert(
    df: DataFrame,
    xspec: tuple[Column | str, float, float],
    yspec: tuple[Column | str, float, float],
    num_files: int,
    bits: int = 16,
) -> DataFrame:
    """Re-lay ``df`` along the Hilbert curve: one ``repartitionByRange``
    on the key + in-partition sort, exactly the zorder.py shape."""
    keyed = attach_hilbert_key(df, xspec, yspec, bits, out_col="_hkey")
    return (
        keyed.repartitionByRange(num_files, F.col("_hkey"))
        .sortWithinPartitions("_hkey")
        .drop("_hkey")
    )
