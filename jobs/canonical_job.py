#!/usr/bin/env python
"""spark-submit entry point for the canonical spatial-join + tiling job.

North-rule packaging contract: the job ships as this thin driver script plus
the `gdal_spark` package zipped for --py-files, so it runs unchanged on any
cluster:

    ./scripts/build_pyfiles.sh            # -> dist/gdal_spark.zip
    spark-submit --py-files dist/gdal_spark.zip \
        jobs/canonical_job.py --n-pages 100000000 --workdir /tmp/canon

On a cluster, pass --master/--num-executors etc. to spark-submit as usual;
the script never hardcodes a master. Locally (no master configured) it
defaults to local[*]. Stage outputs + per-partition lineage manifests land
under --workdir; re-running with the same workdir resumes after the last
completed stage.

Prints one JSON line with per-stage metrics (rows, wall, partition counts).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-pages", type=int, default=1_000_000)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--salt", type=int, default=1,
                    help="hot-cell salt factor for the PIP join")
    ap.add_argument("--partitions", type=int, default=None,
                    help="input split count (default: 4x default parallelism)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    builder = SparkSession.builder.appName("gdal-spark-canonical")
    # only set a master when spark-submit didn't provide one (local dev run)
    import pyspark
    conf = pyspark.SparkConf()
    if not conf.contains("spark.master"):
        builder = builder.master("local[*]")
    spark = builder.getOrCreate()

    from gdal_spark.pipeline import run_canonical_job
    parts = args.partitions or spark.sparkContext.defaultParallelism * 4
    t0 = time.time()
    metrics = run_canonical_job(spark, n_pages=args.n_pages,
                                workdir=args.workdir, salt=args.salt,
                                partitions=parts)
    wall = time.time() - t0
    print(json.dumps({
        "n_pages": args.n_pages,
        "wall_s": round(wall, 2),
        "pages_per_sec": round(args.n_pages / wall, 1),
        "stages": {k: {kk: v[kk] for kk in ("rows", "wall_s", "resumed")
                       if kk in v}
                   for k, v in metrics.items()},
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
