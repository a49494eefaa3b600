"""Overview pyramid: zoom z-1 tiles reduced from their 4 z children.

Re-expresses gdal2tiles' create_overview_tile + gcore/overview.cpp reducers
(/root/reference/swig/python/gdal-utils/osgeo_utils/gdal2tiles.py:1515;
near :72-156, average/RMS :1130-1756 of /root/reference/gcore/overview.cpp)
as ONE groupBy per zoom level:

    groupBy(band, tile_x//2, tile_y//2) -> applyInPandas(2x2 block reduce)

Building a full pyramid is `levels` successive jobs, each reading the level
below — the shuffle per level carries exactly the level's tiles, and levels
shrink 4x each step, so total work is ~4/3 of the base level (same bound as
the reference's sequential pyramid).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tiles import TILE_SCHEMA, encode_px

_REDUCERS = {
    "average": lambda b: b.mean(axis=(1, 3)),
    "sum": lambda b: b.sum(axis=(1, 3)),
    "near": lambda b: b[:, 0, :, 0],     # top-left sample (overview.cpp near)
    "min": lambda b: b.min(axis=(1, 3)),
    "max": lambda b: b.max(axis=(1, 3)),
    "rms": lambda b: np.sqrt((b.astype(np.float64) ** 2).mean(axis=(1, 3))),
}


def overview_level(tiles_df: DataFrame, resampling: str = "average",
                   tile: int = 256) -> DataFrame:
    """One pyramid step: input tiles at zoom z -> tiles at z-1."""
    reduce_fn = _REDUCERS[resampling]

    def build_parent(key, pdf: pd.DataFrame) -> pd.DataFrame:
        band, zoom, ptx, pty = (int(key[0]), int(key[1]),
                                int(key[2]), int(key[3]))
        dtype = np.dtype(pdf.iloc[0]["dtype"])
        big = np.zeros((2 * tile, 2 * tile),
                       dtype=np.float64 if resampling in ("average", "rms", "sum")
                       else dtype)
        for row in pdf.itertuples():
            sub = np.frombuffer(row.px, dtype=dtype).reshape(tile, tile)
            oy = (int(row.tile_y) & 1) * tile
            ox = (int(row.tile_x) & 1) * tile
            big[oy:oy + tile, ox:ox + tile] = sub
        blocks = big.reshape(tile, 2, tile, 2)
        out = reduce_fn(blocks)
        if resampling == "average" and np.issubdtype(dtype, np.integer):
            out = np.floor(out + 0.5)  # overview.cpp average rounds half-up
        out = out.astype(dtype) if resampling != "sum" else out.astype(np.float64)
        return pd.DataFrame([{
            "band": band, "zoom": zoom - 1, "tile_x": ptx, "tile_y": pty,
            "dtype": str(out.dtype), "nodata": pdf.iloc[0]["nodata"],
            "px": encode_px(out)}])

    return (tiles_df
            .groupBy("band", "zoom",
                     F.shiftright("tile_x", 1).alias("_ptx"),
                     F.shiftright("tile_y", 1).alias("_pty"))
            .applyInPandas(lambda k, p: build_parent(k, p), schema=TILE_SCHEMA))


def build_pyramid(base: DataFrame, levels: int,
                  resampling: str = "average", tile: int = 256) -> DataFrame:
    """Full pyramid: union of `levels` successive reductions (each level is
    one shuffle; the lazy plan chains them — at scale, checkpoint each level
    through the stage runner in plans.lineage)."""
    out = base
    cur = base
    for _ in range(levels):
        cur = overview_level(cur, resampling=resampling, tile=tile)
        out = out.unionByName(cur)
    return out
