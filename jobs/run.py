#!/usr/bin/env python
"""spark-submit entrypoint: the checkpointed flagship pipeline.

    spark-submit --py-files $(python jobs/make_pyfiles.py) jobs/run.py \
        --sf-dir /root/testdata/sf0.1 --out /tmp/osm_out --mult 10 --zoom 12

Re-invoking with the same --out resumes mid-job: stages whose checkpoint
exists are skipped and re-read (north_rule resumability; the lineage table
under {out}/lineage records per-partition row counts + wall time per run).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", required=True)
    p.add_argument("--mult", type=int, default=1)
    p.add_argument("--zoom", type=int, default=12)
    p.add_argument("--master", default=None, help="override master (default: cluster/spark-submit)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("osm_spark_flagship")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    try:
        from osm_spark.session import ensure_workers_can_import

        ensure_workers_can_import(spark)
        from osm_spark.pipeline.flagship import run_flagship

        result = run_flagship(spark, args.sf_dir, args.out, args.mult, args.zoom)
        summary = {
            name: {
                "skipped": r.skipped,
                "wall_ms": r.wall_ms,
                "output_rows": r.output_rows,
            }
            for name, r in result.items()
            if hasattr(r, "skipped")
        }
        print(json.dumps({"out": args.out, "stages": summary}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
