"""Standard deviational ellipse — the directional-distribution summary.

The one-row spatial dispersion statistic (Lefever 1926; the ArcGIS
"Directional Distribution" tool): mean center, dispersion along the
principal axes, and the orientation of the point cloud — the preflight
summary before hotspot/emerging analysis, and the per-region shape
descriptor for crawl-coverage dashboards.

Exactness (the stay_points / orientation.py discipline): coordinates
quantize to e7 integers FIRST (≈1.1 cm — the OSM storage grain), so
every moment (Σx, Σy, Σxx, Σyy, Σxy) is an exact bigint and the only
float work is the closing eigen decomposition of the 2×2 centered
covariance — add/sub/mul/div/sqrt only, every one correctly rounded
IEEE, so the micro-quantized axes hash across engines. The ORIENTATION
is deliberately NOT an angle: atan2's last ulp is libm-specific (the
reason orientation.py bins atan2-free), so the gate columns are the
unit-normalized (sin 2θ, cos 2θ) pair in micro-units — built from
the exact integer moments with add/mul/div/sqrt only, no
trigonometric libm call anywhere — from which any consumer derives
θ locally (atan2 of the pair) at its own precision.

Scale: one map-side-combined aggregate over the point table per group
— no shuffle beyond the grouping key, no window, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AXIS_SCALE = 1_000_000  # micro-degrees carried by the axis lengths

__all__ = ["std_ellipse"]


def std_ellipse(
    points: DataFrame,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One row (n, mean_lat_e7, mean_lon_e7, sin2t_micro, cos2t_micro,
    major_micro, minor_micro) per group (global when ``group_cols`` is
    None): the standard deviational ellipse of the e7-quantized cloud.

    mean_*_e7 are truncated integer e7 means (``div`` — DuckDB ``//``
    truncates identically); sin2t/cos2t the
    micro-quantized unit orientation pair (NULL for an isotropic
    cloud); major/minor the √eigenvalues of the centered covariance in
    micro-degrees (floor'd; NULL for n < 3)."""
    x = F.round(F.col(lon_col) * 1e7, 0).cast("decimal(19,0)")
    y = F.round(F.col(lat_col) * 1e7, 0).cast("decimal(19,0)")
    rows = points.select(
        *(group_cols or []), x.alias("_x"), y.alias("_y")
    )
    gb = rows.groupBy(*(group_cols or []))
    # e7² products exceed int64 immediately (1.8e9² = 3.2e18), so every
    # moment runs in decimal (DuckDB replays in HUGEINT — the moran
    # precedent). Exactness bound: (Σx)² needs < 1e38, i.e. group size
    # ≲ 10^10 points — document-and-shard beyond, as with moran.
    sums = gb.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
    )
    n = F.col("n")
    # centered second moments, scaled by n² to stay integral:
    # S̃xx = n·Σxx − (Σx)², etc.
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cxx = dec(n) * dec(F.col("sxx")) - dec(F.col("sx")) * dec(F.col("sx"))
    cyy = dec(n) * dec(F.col("syy")) - dec(F.col("sy")) * dec(F.col("sy"))
    cxy = dec(n) * dec(F.col("sxy")) - dec(F.col("sx")) * dec(F.col("sy"))
    m = sums.select(
        *(group_cols or []),
        "n",
        F.expr("CAST(sx div n AS BIGINT)").alias("mean_lon_e7"),
        F.expr("CAST(sy div n AS BIGINT)").alias("mean_lat_e7"),
        (F.lit(2).cast("decimal(38,0)") * cxy).alias("t_num"),
        (cxx - cyy).alias("t_den"),
        cxx.alias("_cxx"),
        cyy.alias("_cyy"),
        cxy.alias("_cxy"),
    )
    # eigenvalues of the n²-scaled covariance; variance = λ / n² / n
    # (population variance of e7 units) → axis = sqrt(var) / 10 micro
    a = F.col("_cxx").cast("double")
    c = F.col("_cyy").cast("double")
    b = F.col("_cxy").cast("double")
    disc = F.sqrt((a - c) * (a - c) + F.lit(4.0) * b * b)
    nd = F.col("n").cast("double")
    lam1 = (a + c + disc) / F.lit(2.0)
    lam2 = (a + c - disc) / F.lit(2.0)
    axis = lambda lam: F.floor(  # noqa: E731
        F.sqrt(F.greatest(lam, F.lit(0.0)) / (nd * nd * nd)) / F.lit(10.0)
    ).cast("long")
    ok = n >= 3
    numd = F.col("t_num").cast("double")
    dend = F.col("t_den").cast("double")
    hyp = F.sqrt(numd * numd + dend * dend)
    return m.select(
        *(group_cols or []),
        "n",
        "mean_lat_e7",
        "mean_lon_e7",
        F.when(
            ok & (hyp > 0),
            F.floor(F.lit(1e6) * (numd / hyp)).cast("long"),
        ).alias("sin2t_micro"),
        F.when(
            ok & (hyp > 0),
            F.floor(F.lit(1e6) * (dend / hyp)).cast("long"),
        ).alias("cos2t_micro"),
        F.when(ok, axis(lam1)).alias("major_micro"),
        F.when(ok, axis(lam2)).alias("minor_micro"),
    )
