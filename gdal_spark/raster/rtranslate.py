"""Raster gdal_translate: window / outsize / rescale / band select.

Re-expresses GDALTranslate (/root/reference/apps/gdal_translate_lib.cpp —
-srcwin :2060 area, -outsize resampled copy via the VRT source chain
:2310-2314, -scale linear rescale, -b band select) by composing the warp
engine with an identity CRS: the dst grid IS the requested window/outsize,
so subsetting, shifting and resampling reuse the same gather kernels, and
the lazy-VRT composition becomes the lazy DataFrame plan. The -scale step
(out = (in - src0) * (dst1 - dst0) / (src1 - src0) + dst0,
gdal_translate_lib.cpp -scale) is a map-only per-tile numpy expression.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rasterize import GridSpec
from .tiles import TILE_SCHEMA, decode_px, encode_px
from .warp import WarpSpec, warp


def scale_tiles(tiles_df: DataFrame, src0: float, src1: float,
                dst0: float, dst1: float, tile: int = 256,
                out_dtype: str = "float64") -> DataFrame:
    """-scale: linear rescale of every pixel (map-only, no shuffle)."""
    k = (dst1 - dst0) / (src1 - src0)

    def run(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                arr = decode_px(r.px, r.dtype, tile).astype(np.float64)
                arr = (arr - src0) * k + dst0
                out.append((r.band, r.zoom, r.tile_x, r.tile_y, out_dtype,
                            r.nodata, encode_px(arr.astype(out_dtype))))
            yield pd.DataFrame(out, columns=[f.name for f in
                                             TILE_SCHEMA.fields])

    return tiles_df.mapInPandas(run, TILE_SCHEMA)


def translate_raster(tiles_df: DataFrame, src_grid: GridSpec,
                     srcwin: tuple[int, int, int, int] | None = None,
                     outsize: tuple[int, int] | None = None,
                     scale: tuple[float, float, float, float] | None = None,
                     bands: list[int] | None = None,
                     resample: str = "near",
                     out_dtype: str = "float64") -> DataFrame:
    """gdal_translate over the tile table.

    srcwin: (xoff, yoff, xsize, ysize) in src pixels; outsize: (w, h) output
    pixels (default = window size, i.e. pure subset); scale: (src0, src1,
    dst0, dst1); bands: band numbers to keep.
    Returns the dst tile table on a grid anchored at the window origin.
    """
    if bands is not None:
        tiles_df = tiles_df.where(F.col("band").isin(bands))
    xoff, yoff, xsize, ysize = srcwin or (0, 0, src_grid.width,
                                          src_grid.height)
    ow, oh = outsize or (xsize, ysize)
    dst_grid = GridSpec(
        x0=src_grid.x0 + xoff * src_grid.dx,
        y0=src_grid.y0 + yoff * src_grid.dy,
        dx=src_grid.dx * xsize / ow,
        dy=src_grid.dy * ysize / oh,
        width=ow, height=oh, tile=src_grid.tile)
    spec = WarpSpec(src_grid=src_grid, src_crs="EPSG:4326",
                    dst_grid=dst_grid, dst_crs="EPSG:4326",
                    resample=resample)
    out = warp(tiles_df, spec, out_dtype=out_dtype)
    if scale is not None:
        out = scale_tiles(out, *scale, tile=src_grid.tile,
                          out_dtype=out_dtype)
    return out
