"""Streaming spatial pipeline: incoming pages -> PIP join -> windowed rollup.

The canonical batch job (pipeline.py) as a Structured Streaming graph: the
page stream joins the STATIC broadcast region dim (stream-static joins are
stateless — the mask-based pip_join works unchanged because its big side is
only mapped, joined to a broadcast, and filtered), then aggregates per
region per event-time tumbling window with a watermark bounding state.

This is the shape a live crawl ingest runs at scale: no per-batch shuffle
of the stream except the final keyed aggregation, and the same code path
serves batch backfill (pass a batch DataFrame — the `isStreaming` branch
just skips the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import spatial_join


def streaming_pip_counts(pages: DataFrame, regions: DataFrame, zoom: int,
                         window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """pages (batch or stream) with (warc_ts, lon, lat) -> per-region,
    per-window page counts."""
    hits = spatial_join.pip_join(pages, regions, zoom=zoom)
    h = hits.withColumn("ts", F.col("warc_ts").cast("timestamp"))
    if h.isStreaming:
        h = h.withWatermark("ts", watermark)
    return (h.groupBy(F.window("ts", window).alias("win"), "region_id")
            .agg(F.count("*").alias("n_pages"))
            .select(F.col("win.start").alias("win_start"), "region_id",
                    "n_pages"))


def streaming_geoparse_tiles(pages: DataFrame, zoom: int = 6,
                             window: str = "1 hour",
                             watermark: str = "2 hours") -> DataFrame:
    """The full north-star ingest as one streaming graph: raw page markup
    -> regex geoparse (map-only, codegen) -> web-mercator tile assignment
    (column math) -> watermarked per-tile, per-window page counts. Batch
    DataFrames run the identical plan minus the watermark, so backfill and
    live ingest share this function (stream == batch pinned in
    tests/test_streaming.py)."""
    from ..core import tilemath
    from ..operators import textops

    g = textops.geoparse(pages, html_col="html_txt")
    g = g.where(F.col("plat").isNotNull() & (F.abs("plat") < 85.05))
    tx, ty = tilemath.mercator_tile_cols(F.col("plon"), F.col("plat"), zoom)
    h = g.select(F.col("warc_ts").cast("timestamp").alias("ts"),
                 tx.alias("tile_x"), ty.alias("tile_y"))
    if h.isStreaming:
        h = h.withWatermark("ts", watermark)
    return (h.groupBy(F.window("ts", window).alias("win"),
                      "tile_x", "tile_y")
            .agg(F.count("*").alias("n_pages"))
            .select(F.col("win.start").alias("win_start"),
                    "tile_x", "tile_y", "n_pages"))


def stream_mvt_sink(points: DataFrame, out_dir: str, zoom: int,
                    checkpoint: str, extent: int = 4096):
    """Live MVT tile maintenance: each micro-batch of (fid, geom WKB)
    points re-encodes only the z/x/y tiles it touches (write_mvt's
    groupBy-tile shuffle is per-batch, so an idle tile is never
    rewritten). complete-mode semantics per tile come from accumulating
    batches in the sink directory; returns the StreamingQuery."""
    from ..sources import mvt as _mvt

    def emit(batch_df, batch_id):
        _mvt.write_mvt(batch_df, out_dir, zoom=zoom,
                       extent=extent).collect()

    return (points.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(emit).start())
