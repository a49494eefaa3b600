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


LAYOUT_ZOOM = datagen.PIP_ZOOM + tilemath.SUB_BITS   # the stored-cell zoom


def prepare_pages(spark: SparkSession, n: int, path: str,
                  partitions: int | None = None, sort: bool = True,
                  store_cell: bool = False) -> None:
    """Materialize the page table once, sorted by fine-grained cell id —
    the Iceberg sort-order layout the measurement protocol prescribes
    (BASELINE.md step 1: 'write to Iceberg sorted by cell id').

    The sort key is the packed cell at PIP_ZOOM+SUB_BITS, which coincides
    exactly with the z-3 global pixel the density stage groups by, so a
    sorted table gives the downstream aggregation near-perfect map-side
    combine: the shuffle carries ~#distinct-pixels rows instead of ~#pages.
    At 100 TB this is the difference between shuffling gigabytes and
    shuffling the dataset.

    `store_cell=True` keeps the sort key as a stored `cell` column (the
    geohash-column pattern): every parquet row group then carries min/max
    stats on `cell`, so a spatially-filtered scan (`pruned_cell_scan`)
    skips row groups entirely — the SURVEY §4 'spatial-filter pushdown to
    source' analog of OGR's SetSpatialFilter + driver R-tree
    (ogrlayer.cpp:1472, ogr_gensql.cpp:576-582)."""
    df = synth_pages(spark, n, partitions)
    if sort or store_cell:
        key = spatial_join.point_cell_col(
            F.col("lon"), F.col("lat"), LAYOUT_ZOOM)
        df = df.withColumn("cell", key)
        if sort:
            df = (df.repartitionByRange(partitions or 32, "cell")
                  .sortWithinPartitions("cell"))
        if not store_cell:
            df = df.drop("cell")
    df.write.mode("overwrite").parquet(path)


def prepare_documents(spark: SparkSession, n: int, path: str,
                      partitions: int | None = None,
                      vocab: int = 30000, dup_every: int = 13) -> None:
    """Materialize a deterministic synthetic web corpus (doc_id, text)
    for the curation-job scaling runs — pure JVM column math, no UDF, so
    generation itself scales with cores and any engine can replay it.

    Shape matches what the curation stages exercise: 3-8 newline-split
    lines per page, 6-14 words per line with terminal '.', a ~1/13 exact-
    duplicate rate (doc copies the text of the previous dup_every-block
    anchor — exercises exact dedup AND MinHash clustering), plus the C4
    trip-markers (javascript lines, lorem ipsum, '{') on deterministic
    doc_id residues like the q_c4_filters webifier."""
    parts = partitions or 64
    d = spark.range(0, n, 1, parts).select(F.col("id").alias("doc_id"))
    base = F.when(F.col("doc_id") % dup_every == 1,
                  F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    # 5-7 lines x 7-12 words keeps pages inside the Gopher envelope
    # (30 <= n_words <= 95); alternating 'the'/'and' line openers give
    # stop_ratio >= 0.02 without any single word crossing top_frac 0.15
    nl = (base % 3 + 5).cast("int")

    # word identity must be a REAL hash of (doc, line, position): any
    # linear-congruential scheme is periodic mod `vocab`, which silently
    # collapses an n-doc corpus to ~vocab distinct texts (and makes every
    # doc's word sequence an arithmetic progression that cross-links
    # MinHash shingles corpus-wide). md5 is JVM column math and the
    # dedup stages downstream do far more hashing per doc than this.
    def word(j, i):
        k = F.pmod(F.conv(F.substring(F.md5(F.concat_ws(
            "_", base.cast("string"), j.cast("string"),
            i.cast("string"))), 1, 8), 16, 10).cast("long"), vocab)
        return F.concat(F.lit("w"), k.cast("string"))

    def line(j):
        nw = (F.pmod(base + j * 7, 6) + 6).cast("int")
        opener = F.when(j % 2 == 0, F.lit("the")).otherwise(F.lit("and"))
        body = F.concat(opener, F.lit(" "), F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), nw - 1), lambda i: word(j, i))))
        body = F.when((base % 97 == 3) & (j == 1),
                      F.concat(F.lit("javascript "), body)).otherwise(body)
        body = F.when((base % 89 == 5) & (j == 0),
                      F.concat(body, F.lit(" lorem ipsum"))).otherwise(body)
        return F.concat(body, F.lit("."))

    text = F.concat_ws("\n", F.transform(
        F.sequence(F.lit(0), nl - 1), line))
    d = d.select("doc_id", text.alias("text"))
    d.write.mode("overwrite").parquet(path)


def cell_bbox_predicate(xmin: float, ymin: float, xmax: float, ymax: float,
                        zoom: int = LAYOUT_ZOOM, cell_col: str = "cell",
                        max_ranges: int = 64):
    """Pushdown-able Column predicate: `cell` is inside the bbox's cover.

    The packed id is (zoom<<58)|(ty<<29)|tx, so one tile ROW [tx0..tx1] at
    fixed ty is one contiguous id range. The bbox cover becomes at most
    `max_ranges` BETWEENs: ty rows are chunked evenly, each chunk's range
    runs [pack(tx0, ty_first) .. pack(tx1, ty_last)] — a superset of the
    true cover (chunks spanning >1 ty admit the full rows in between), so
    the predicate is always safe to AND with the exact test. The BETWEENs
    fold as a BALANCED or-tree (a deep left-leaning chain overflows the
    column-node converter stack for wide bboxes).

    Plain comparisons on a stored long column: Catalyst pushes them into
    the parquet scan (PushedFilters), and with the cell-sorted layout the
    row-group min/max stats skip everything outside the filter window — no
    Spark task ever opens those pages.
    """
    import numpy as np

    from .core.tilemath import (MERC_MAX_LAT, latlon_to_tile_xyz,
                                packed_cell_id)
    ymin = max(ymin, -MERC_MAX_LAT)
    ymax = min(ymax, MERC_MAX_LAT)
    tx0, ty0 = latlon_to_tile_xyz(np.float64(ymax), np.float64(xmin), zoom)
    tx1, ty1 = latlon_to_tile_xyz(np.float64(ymin), np.float64(xmax), zoom)
    n = 2 ** zoom
    tx0 = int(np.clip(tx0, 0, n - 1)); tx1 = int(np.clip(tx1, 0, n - 1))
    ty0 = int(np.clip(ty0, 0, n - 1)); ty1 = int(np.clip(ty1, 0, n - 1))
    tx0, tx1 = min(tx0, tx1), max(tx0, tx1)
    ty0, ty1 = min(ty0, ty1), max(ty0, ty1)
    c = F.col(cell_col)
    n_rows = ty1 - ty0 + 1
    n_chunks = min(max_ranges, n_rows)
    bounds = np.linspace(ty0, ty1 + 1, n_chunks + 1).astype(np.int64)
    preds = [c.between(int(packed_cell_id(tx0, int(a), zoom)),
                       int(packed_cell_id(tx1, int(b - 1), zoom)))
             for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
    while len(preds) > 1:                      # balanced or-tree fold
        preds = [preds[i] | preds[i + 1] if i + 1 < len(preds) else preds[i]
                 for i in range(0, len(preds), 2)]
    return preds[0]


def pruned_cell_scan(spark: SparkSession, path: str,
                     xmin: float, ymin: float, xmax: float, ymax: float,
                     zoom: int = LAYOUT_ZOOM) -> DataFrame:
    """Spatially-filtered scan of a cell-sorted page table with a stored
    `cell` column: cell-cover prefilter (row-group pruning via parquet
    stats) AND the exact bbox test on lon/lat — both pushed to the scan."""
    df = spark.read.parquet(path)
    return df.where(cell_bbox_predicate(xmin, ymin, xmax, ymax, zoom)
                    & (F.col("lon") >= xmin) & (F.col("lon") <= xmax)
                    & (F.col("lat") >= ymin) & (F.col("lat") <= ymax))


def run_canonical_job(spark: SparkSession, n_pages: int, workdir: str,
                      salt: int = 1, partitions: int | None = None,
                      pages_path: str | None = None) -> dict:
    """Run the staged job; returns the per-stage metrics dict.

    If `pages_path` is given, the job reads the pre-materialized page table
    from there (the production shape: input is an existing catalog table);
    otherwise a synthesis stage generates it inside the workdir first.
    """
    runner = StageRunner(spark, workdir)

    if pages_path is None:
        runner.stage("pages", lambda r: synth_pages(spark, n_pages, partitions))
        load_pages = lambda r: r.load("pages")          # noqa: E731
        pip_upstream = ["pages"]
    else:
        load_pages = lambda r: spark.read.parquet(pages_path)  # noqa: E731
        pip_upstream = []

    def build_pip(r: StageRunner) -> DataFrame:
        pages = load_pages(r)
        regions = datagen.regions(spark).select(
            "region_id", "geom", "cells", "in_masks", "out_masks")
        hits = spatial_join.pip_join(pages, regions,
                                     zoom=datagen.PIP_ZOOM, salt=salt)
        return hits.groupBy("region_id").agg(F.count("*").alias("n_pages"))

    runner.stage("pip_counts", build_pip, upstream=pip_upstream)

    def build_tiles(r: StageRunner) -> DataFrame:
        pages = load_pages(r)
        gpx, gpy = tilemath.mercator_pixel_cols(
            F.col("lon"), F.col("lat"), 3)
        # group on ONE packed long (gpx<<32 | gpy), not a 4-column key: the
        # hash-agg probe is a single-word compare, and with cell-sorted input
        # the partial agg collapses the shuffle to ~#distinct-pixels rows
        key = F.shiftleft(gpx, 32).bitwiseOR(gpy)
        agg = (pages.select(key.alias("pxk"))
               .groupBy("pxk").agg(F.count("*").alias("burn")))
        ux = F.shiftrightunsigned(F.col("pxk"), 32)
        uy = F.col("pxk").bitwiseAND(F.lit((1 << 32) - 1))
        return agg.select(F.shiftright(ux, 8).alias("tile_x"),
                          F.shiftright(uy, 8).alias("tile_y"),
                          ux.bitwiseAND(F.lit(255)).alias("px"),
                          uy.bitwiseAND(F.lit(255)).alias("py"),
                          "burn")

    runner.stage("tile_density", build_tiles, upstream=pip_upstream)

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
