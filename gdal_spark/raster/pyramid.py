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

def overview_level(tiles_df: DataFrame, resampling: str = "average",
                   tile: int = 256) -> DataFrame:
    """One pyramid step: input tiles at zoom z -> tiles at z-1.

    Nodata-aware like the reference reducers (overview.cpp average excludes
    nodata-masked pixels): nodata pixels AND absent child quadrants (the
    tile table is sparse) are excluded from the reduction; a parent pixel
    with no valid contributor is emitted as nodata (or 0 when the band has
    no nodata value)."""
    if resampling not in ("average", "sum", "near", "min", "max", "rms"):
        raise ValueError(f"unknown resampling {resampling!r}")

    def build_parent(key, pdf: pd.DataFrame) -> pd.DataFrame:
        band, zoom, ptx, pty = (int(key[0]), int(key[1]),
                                int(key[2]), int(key[3]))
        dtype = np.dtype(pdf.iloc[0]["dtype"])
        nodata = pdf.iloc[0]["nodata"]
        big = np.zeros((2 * tile, 2 * tile), dtype=np.float64)
        present = np.zeros((2 * tile, 2 * tile), dtype=bool)
        for row in pdf.itertuples():
            sub = np.frombuffer(row.px, dtype=dtype).reshape(tile, tile)
            oy = (int(row.tile_y) & 1) * tile
            ox = (int(row.tile_x) & 1) * tile
            big[oy:oy + tile, ox:ox + tile] = sub
            present[oy:oy + tile, ox:ox + tile] = True
        valid = present
        if nodata is not None and not (isinstance(nodata, float)
                                       and np.isnan(nodata)):
            valid = valid & (big != float(nodata))
        b = big.reshape(tile, 2, tile, 2)
        v = valid.reshape(tile, 2, tile, 2)
        cnt = v.sum(axis=(1, 3))
        any_valid = cnt > 0
        safe_cnt = np.maximum(cnt, 1)
        if resampling == "average":
            out = (b * v).sum(axis=(1, 3)) / safe_cnt
            if np.issubdtype(dtype, np.integer):
                out = np.floor(out + 0.5)  # overview.cpp average rounds half-up
        elif resampling == "sum":
            out = (b * v).sum(axis=(1, 3))
        elif resampling == "rms":
            out = np.sqrt((b * b * v).sum(axis=(1, 3)) / safe_cnt)
        elif resampling == "min":
            out = np.where(v, b, np.inf).min(axis=(1, 3))
        elif resampling == "max":
            out = np.where(v, b, -np.inf).max(axis=(1, 3))
        else:  # near: top-left sample (overview.cpp near)
            out = b[:, 0, :, 0]
            any_valid = v[:, 0, :, 0]
        fill = float(nodata) if nodata is not None and not (
            isinstance(nodata, float) and np.isnan(nodata)) else 0.0
        out = np.where(any_valid, out, fill)
        out_dtype = np.float64 if resampling == "sum" else dtype
        out = out.astype(out_dtype)
        return pd.DataFrame([{
            "band": band, "zoom": zoom - 1, "tile_x": ptx, "tile_y": pty,
            "dtype": str(out.dtype), "nodata": nodata,
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
