"""Checkpointed flagship pipeline: lineage metrics + mid-job resume."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from osm_spark.pipeline.flagship import run_flagship


def test_flagship_checkpointed_and_resumable(spark, sf_small_dir, tmp_path):
    out = str(tmp_path / "flagship")

    res1 = run_flagship(spark, sf_small_dir, out)
    assert not res1["pip"].skipped
    pip_rows = res1["pip"].df.count()
    assert pip_rows > 50
    assert res1["tiles"].df.count() > 0

    # Lineage has per-file row counts for every stage.
    lin = res1["log"].lineage()
    stages = {r.stage for r in lin.collect()}
    assert stages == {"pages", "points", "way_cells", "pip", "tiles"}
    pip_lineage = (
        lin.filter((F.col("stage") == "pip") & (~F.col("skipped")))
        .agg(F.sum("output_rows"))
        .collect()[0][0]
    )
    assert pip_lineage == pip_rows

    # Full resume: nothing recomputes.
    res2 = run_flagship(spark, sf_small_dir, out)
    assert all(res2[s].skipped for s in ["pages", "points", "way_cells", "pip", "tiles"])
    assert res2["pip"].df.count() == pip_rows

    # Mid-job kill: drop the last two stage outputs; only they recompute.
    shutil.rmtree(f"{out}/stages/pip")
    shutil.rmtree(f"{out}/stages/tiles")
    res3 = run_flagship(spark, sf_small_dir, out)
    assert res3["pages"].skipped and res3["points"].skipped and res3["way_cells"].skipped
    assert not res3["pip"].skipped and not res3["tiles"].skipped
    assert res3["pip"].df.count() == pip_rows
