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
