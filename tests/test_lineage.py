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


def test_write_partitioned_layout(spark, sf_small_dir, tmp_path):
    """Bounded deterministic file counts per partition dir, in-file sort
    order, and a footer-derived row-count manifest."""
    import pyarrow.parquet as pq

    from osm_spark.pipeline.sinks import write_partitioned

    docs = spark.read.parquet(f"{sf_small_dir}/documents.parquet")
    out = str(tmp_path / "by_lang")
    manifest = write_partitioned(
        docs, out, ["lang"], files_per_partition=2, sort_cols=["doc_id"]
    )
    assert sum(n for _f, n in manifest) == docs.count()
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    by_dir = {}
    for f, n in manifest:
        by_dir.setdefault(f.split("/")[0], []).append((f, n))
    assert set(by_dir) == {f"lang={l}" for l in langs}
    for d, files in by_dir.items():
        assert 1 <= len(files) <= 2, (d, files)
    # in-file ordering: doc_id ascending within each file
    f0 = manifest[0][0]
    ids = pq.read_table(f"{out}/{f0}", columns=["doc_id"])["doc_id"].to_pylist()
    assert ids == sorted(ids)
    # deterministic layout on rewrite
    manifest2 = write_partitioned(
        docs, out, ["lang"], files_per_partition=2, sort_cols=["doc_id"]
    )
    assert sorted(n for _f, n in manifest) == sorted(n for _f, n in manifest2)


def test_lineage_log_mode_validation(spark, tmp_path):
    """Exactly one of base_dir / table_prefix must be set (ADVICE r2)."""
    import pytest as _pytest

    from osm_spark.pipeline.lineage import LineageLog

    with _pytest.raises(ValueError):
        LineageLog(spark)
    with _pytest.raises(ValueError):
        LineageLog(spark, base_dir=str(tmp_path), table_prefix="both")
