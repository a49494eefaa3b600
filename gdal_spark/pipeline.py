"""The canonical spatial-join + tiling job, staged and resumable.

This is the north-star workload (BASELINE.json): Common-Crawl-style pages ->
geoparse points -> point-in-polygon join against admin regions -> tile
assignment -> rasterized density -> one overview level. Each arrow is a
StageRunner stage: parquet output + manifest with per-partition row counts,
so a killed run resumes from the last completed stage.

Scale notes: pages synthesis and tile math are whole-stage-codegen column
expressions; the PIP join broadcasts the region dim (no shuffle of pages at
all until the final per-region aggregation, which is partial-aggregated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import datagen
from .core import tilemath
from .operators import spatial_join
from .plans.lineage import StageRunner


def synth_pages(spark: SparkSession, n: int,
                partitions: int | None = None) -> DataFrame:
    """Deterministic pages at arbitrary scale: same derivation as
    datagen.points but over spark.range — the 10^12-row analog."""
    rng = spark.range(0, n, numPartitions=partitions) \
        .select(F.col("id").alias("doc_id"))
    return rng.select(
        "doc_id",
        datagen.url_col().alias("url"),
        datagen.lon_col().alias("lon"),
        datagen.lat_col().alias("lat"))


def run_canonical_job(spark: SparkSession, n_pages: int, workdir: str,
                      salt: int = 1, partitions: int | None = None) -> dict:
    """Run the staged job; returns the per-stage metrics dict."""
    runner = StageRunner(spark, workdir)

    runner.stage("pages", lambda r: synth_pages(spark, n_pages, partitions))

    def build_pip(r: StageRunner) -> DataFrame:
        pages = r.load("pages")
        regions = datagen.regions(spark).select("region_id", "geom", "cells")
        hits = spatial_join.pip_join(pages, regions,
                                     zoom=datagen.PIP_ZOOM, salt=salt)
        return hits.groupBy("region_id").agg(F.count("*").alias("n_pages"))

    runner.stage("pip_counts", build_pip, upstream=["pages"])

    def build_tiles(r: StageRunner) -> DataFrame:
        pages = r.load("pages")
        gpx, gpy = tilemath.mercator_pixel_cols(
            F.col("lon"), F.col("lat"), 3)
        return (pages.select(gpx.alias("gpx"), gpy.alias("gpy"))
                .select(F.shiftright("gpx", 8).alias("tile_x"),
                        F.shiftright("gpy", 8).alias("tile_y"),
                        F.col("gpx").bitwiseAND(F.lit(255)).alias("px"),
                        F.col("gpy").bitwiseAND(F.lit(255)).alias("py"))
                .groupBy("tile_x", "tile_y", "px", "py")
                .agg(F.count("*").alias("burn")))

    runner.stage("tile_density", build_tiles, upstream=["pages"])

    def build_overview(r: StageRunner) -> DataFrame:
        z = r.load("tile_density")
        gpx = F.shiftleft("tile_x", 8) + F.col("px")
        gpy = F.shiftleft("tile_y", 8) + F.col("py")
        return (z.select(F.shiftright(gpx, 1).alias("px_up"),
                         F.shiftright(gpy, 1).alias("py_up"), "burn")
                .groupBy("px_up", "py_up")
                .agg(F.sum("burn").alias("burn")))

    runner.stage("overview", build_overview, upstream=["tile_density"])
    return runner.metrics
