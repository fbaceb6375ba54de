"""Focal (neighborhood) raster statistics: integer-kernel convolution
over the sparse tile grid.

The raster-algebra member of the tile family (geo/tiles.py rasterizes,
geo/hotspot.py tests significance, this smooths): focal sum/mean with an
arbitrary integer kernel — the classic "focal statistics" operator of
raster GIS, used here to smooth page-density heatmaps before contouring
or tile styling (a binomial 5×5 ≈ discrete Gaussian).

Design for sparse planetary rasters: the grid is stored as occupied
cells only; convolution is a SCATTER (each occupied cell sends
weight×count to the kernel's footprint re-keyed by target) followed by
one combiner-reduced groupBy — the same two-shuffle shape as
hotspot_gi's neighbor scatter, generalized to any kernel. Work is
|occupied| × |kernel|, independent of the 4^z address space; hot tiles
are AQE skew territory like every cell-keyed exchange in this engine.

Kernels are INTEGER weights, so the convolved values are exact integer
arithmetic end to end — value-hash gateable with no float caveats. A
float kernel is the same scatter with a documented quantization step
(multiply by a power of two and carry the scale), deliberately not
defaulted.

Output universe: every tile the kernel footprint touches (the dilated
support — focal stats grow the raster), NOT just previously-occupied
tiles; pass ``keep="occupied"`` to intersect back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: binomial 5×5 (outer product of [1,4,6,4,1]) — integer Gaussian proxy
BINOMIAL_5X5 = {
    (dx, dy): wx * wy
    for dx, wx in zip((-2, -1, 0, 1, 2), (1, 4, 6, 4, 1))
    for dy, wy in zip((-2, -1, 0, 1, 2), (1, 4, 6, 4, 1))
}


def focal_sum(
    grid: DataFrame,
    kernel: dict[tuple[int, int], int] | None = None,
    value: str = "cnt",
    keep: str = "dilated",
) -> DataFrame:
    """(x, y, focal) — Σ kernel[(dx,dy)] · value(x−dx, y−dy) over the
    sparse grid (x, y, value). ``keep='occupied'`` restricts the output
    to input cells; default is the dilated support."""
    if kernel is None:
        kernel = BINOMIAL_5X5
    if keep not in ("dilated", "occupied"):
        raise ValueError(f"keep must be 'dilated' or 'occupied', got {keep!r}")
    if not kernel:
        raise ValueError("kernel must not be empty")
    for w in kernel.values():
        if not isinstance(w, int):
            raise ValueError("focal_sum kernels are integer-weighted; "
                             "quantize float kernels explicitly")

    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(w).alias("w"))
            for (dx, dy), w in sorted(kernel.items())
        ]
    )
    scattered = grid.select("x", "y", F.col(value).alias("v"), F.explode(offs).alias("o")).select(
        (F.col("x") + F.col("o.dx")).alias("tx"),
        (F.col("y") + F.col("o.dy")).alias("ty"),
        (F.col("v") * F.col("o.w")).cast("long").alias("contrib"),
    )
    out = (
        scattered.groupBy(F.col("tx").alias("x"), F.col("ty").alias("y"))
        .agg(F.sum("contrib").cast("long").alias("focal"))
    )
    if keep == "occupied":
        out = out.join(grid.select("x", "y").hint("shuffle_hash"), ["x", "y"])
    return out
