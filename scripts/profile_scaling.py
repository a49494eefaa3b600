#!/usr/bin/env python
"""Decompose the canonical job's scaling: which component fails to scale
from lo to hi cores? Runs each piece in a fresh subprocess per (level,
component), reports wall at both levels. Components:

  synth    : spark.range -> codegen cols (url/lon/lat) -> count     [pure JVM]
  celljoin : + cell id + broadcast join + fast-accept filter, count [JVM join]
  pipudf   : full pip_join incl. Arrow UDF on boundary cells, agg   [Arrow]
  write    : synth -> write parquet to WORKDIR                      [I/O]

Usage: python scripts/profile_scaling.py [n] [lo] [hi] [workdir_base]
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import functions as F
from gdal_spark.session import get_spark
from gdal_spark import datagen
from gdal_spark.pipeline import synth_pages
from gdal_spark.operators import spatial_join

cores = {cores}; n = {n}; comp = {comp!r}; wd = {wd!r}
spark = get_spark("prof", cores=cores, shuffle_partitions=4 * cores)

def pages():
    return synth_pages(spark, n, partitions=4 * cores)

def run():
    if comp == "synth":
        return pages().count()
    if comp == "celljoin":
        p = pages().withColumn("_cell", spatial_join.point_cell_col(
            F.col("lon"), F.col("lat"), datagen.PIP_ZOOM))
        regions = datagen.regions(spark).select("region_id", "cells", "in_masks")
        r = regions.select("region_id", F.explode(F.arrays_zip(
            F.col("cells").alias("c"), F.col("in_masks").alias("i"))).alias("z")) \
            .select("region_id", F.col("z.c").alias("_cell"),
                    F.col("z.i").alias("_im"))
        return p.join(F.broadcast(r), "_cell") \
            .where(F.col("_im") == -1).count()
    if comp == "pipudf":
        regions = datagen.regions(spark).select(
            "region_id", "geom", "cells", "in_masks", "out_masks")
        hits = spatial_join.pip_join(pages(), regions,
                                     zoom=datagen.PIP_ZOOM, salt=1)
        return hits.groupBy("region_id").agg(F.count("*").alias("n")).count()
    if comp == "write":
        pages().write.mode("overwrite").parquet(wd + "/pages")
        return n

# warmup at small n (forks workers, JITs codegen)
saved_n = n; n = 50_000
run(); n = saved_n
t0 = time.time(); out = run(); wall = time.time() - t0
spark.stop()
print("RESULT " + json.dumps({{"comp": comp, "cores": cores,
                               "wall_s": round(wall, 2), "out": out}}))
"""


def run_one(comp, cores, n, wd):
    code = _CHILD.format(root=ROOT, cores=cores, n=n, comp=comp, wd=wd)
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"{comp}@{cores}: {out.stdout[-1500:]}\n{out.stderr[-1500:]}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    base = sys.argv[4] if len(sys.argv) > 4 else tempfile.gettempdir()
    for comp in ["synth", "celljoin", "pipudf", "write"]:
        wd = tempfile.mkdtemp(prefix=f"prof_{comp}_", dir=base)
        try:
            r_lo = run_one(comp, lo, n, wd)
            r_hi = run_one(comp, hi, n, wd)
            eff = (r_lo["wall_s"] / r_hi["wall_s"]) / (hi / lo)
            print(f"{comp:9s} lo={r_lo['wall_s']:7.2f}s hi={r_hi['wall_s']:7.2f}s "
                  f"speedup={r_lo['wall_s']/r_hi['wall_s']:.2f}x eff={eff:.2f}")
        finally:
            shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
