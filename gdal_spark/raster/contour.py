"""Contour lines from a DEM tile table (gdal_contour).

Re-expresses GDALContourGenerate (/root/reference/alg/contour.cpp +
alg/marching_squares/*.h — per-cell marching squares with linear
interpolation) as a halo-exchange tile job:

    tiles -> 1-px halo exchange (shared with the DEM stencils)
          -> per-tile marching squares over cells whose TOP-LEFT pixel is
             local (each cell computed exactly once across the cluster)
          -> segment table (level, x0, y0, x1, y1) in global pixel coords

Cross-tile polyline ASSEMBLY (the reference's ring builder,
alg/marching_squares/polygon_ring_appender.h) is inherently sequential per
ring; the distributed contract is the segment set — deterministic,
tiling-invariant, and sufficient for length/count analytics or a bounded
driver-side assembly. Saddle cells resolve by the cell-center mean, the
reference's default.

Coordinates: pixel CENTERS at integer (x, y) = (tile_x*tile + i,
tile_y*tile + j); a segment endpoint interpolates between two adjacent
centers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dem import _HALO_SCHEMA, _assemble_padded, _emit_halo

_SEG_SCHEMA = T.StructType([
    T.StructField("band", T.IntegerType()),
    T.StructField("zoom", T.IntegerType()),
    T.StructField("level", T.DoubleType()),
    T.StructField("x0", T.DoubleType()),
    T.StructField("y0", T.DoubleType()),
    T.StructField("x1", T.DoubleType()),
    T.StructField("y1", T.DoubleType()),
])


def _cell_segments(v00, v01, v10, v11, level):
    """Marching-squares segments for one cell; corners: v00=(x,y),
    v01=(x+1,y), v10=(x,y+1), v11=(x+1,y+1). Local coords within the cell;
    returns list of ((ax, ay), (bx, by))."""
    b00, b01, b10, b11 = (v00 >= level), (v01 >= level), \
        (v10 >= level), (v11 >= level)
    idx = (b00 << 3) | (b01 << 2) | (b11 << 1) | b10
    if idx in (0, 15):
        return []

    def t(a, b):
        # edges are computed eagerly for the table lookup; a same-class edge
        # (a == b possible) is never SELECTED by a case, value irrelevant
        return (level - a) / (b - a) if b != a else 0.5

    top = (t(v00, v01), 0.0)
    bot = (t(v10, v11), 1.0)
    left = (0.0, t(v00, v10))
    right = (1.0, t(v01, v11))
    table = {
        1: [(left, bot)], 14: [(left, bot)],
        2: [(bot, right)], 13: [(bot, right)],
        3: [(left, right)], 12: [(left, right)],
        4: [(top, right)], 11: [(top, right)],
        6: [(top, bot)], 9: [(top, bot)],
        7: [(left, top)], 8: [(left, top)],
    }
    if idx in table:
        return table[idx]
    # saddles: disambiguate via center mean (bit layout
    # idx = TL<<3 | TR<<2 | BR<<1 | BL)
    center_hi = (v00 + v01 + v10 + v11) / 4.0 >= level
    if idx == 10:       # TL and BR high
        return [(left, top), (bot, right)] if not center_hi \
            else [(left, bot), (top, right)]
    if idx == 5:        # TR and BL high
        return [(left, bot), (top, right)] if not center_hi \
            else [(left, top), (bot, right)]
    return []


def contour_segments(tiles_df: DataFrame, levels: list[float],
                     tile: int = 256) -> DataFrame:
    """-> segment DataFrame (band, zoom, level, x0, y0, x1, y1)."""
    halo = tiles_df.mapInPandas(lambda it: _emit_halo(it, tile), _HALO_SCHEMA)

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pad = _assemble_padded(pdf, tile)
        if pad is None:
            return pd.DataFrame(columns=[f.name for f in _SEG_SCHEMA.fields])
        got = {(-int(r.dx), -int(r.dy)) for r in pdf.itertuples()}
        band, zoom, tx, ty = int(key[0]), int(key[1]), int(key[2]), int(key[3])
        # cells with top-left pixel local: padded coords (1..tile, 1..tile);
        # the last column/row of cells needs the right/bottom neighbor — if
        # absent (raster edge), those cells do not exist globally
        nx = tile if (1, 0) in got else tile - 1
        ny = tile if (0, 1) in got else tile - 1
        out = []
        core = pad[1:ny + 2, 1:nx + 2]
        for level in levels:
            hi = core >= level
            mixed = (hi[:-1, :-1] | hi[:-1, 1:] | hi[1:, :-1] | hi[1:, 1:]) \
                & ~(hi[:-1, :-1] & hi[:-1, 1:] & hi[1:, :-1] & hi[1:, 1:])
            ys, xs = np.nonzero(mixed)
            for j, i in zip(ys, xs):
                segs = _cell_segments(
                    float(core[j, i]), float(core[j, i + 1]),
                    float(core[j + 1, i]), float(core[j + 1, i + 1]),
                    float(level))
                gx = tx * tile + i
                gy = ty * tile + j
                for (ax, ay), (bx, by) in segs:
                    out.append((band, zoom, float(level),
                                gx + ax, gy + ay, gx + bx, gy + by))
        return pd.DataFrame(out, columns=[f.name for f in _SEG_SCHEMA.fields])

    return halo.groupBy("band", "zoom", "tile_x", "tile_y") \
        .applyInPandas(build, _SEG_SCHEMA)


def contour_stats(tiles_df: DataFrame, levels: list[float],
                  tile: int = 256) -> DataFrame:
    """Per-level segment count + total length (the aggregate analytics a
    100 TB DEM run would persist)."""
    seg = contour_segments(tiles_df, levels, tile)
    dx = F.col("x1") - F.col("x0")
    dy = F.col("y1") - F.col("y0")
    return (seg.groupBy("band", "zoom", "level")
            .agg(F.count("*").alias("n_segments"),
                 F.sum(F.sqrt(dx * dx + dy * dy)).alias("total_len")))


def assemble_polylines(segments, digits: int = 9):
    """Driver-side bounded post-pass: link a level's segment set into
    polylines/rings (the reference's ring builder,
    alg/marching_squares/polygon_ring_appender.h, run once per level over
    the COLLECTED segments — appropriate when the per-level segment count
    is bounded; the distributed contract remains the segment set).

    segments: iterable of (x0, y0, x1, y1). Returns a list of vertex lists;
    a closed ring repeats its first vertex at the end.
    """
    from collections import defaultdict

    def key(x, y):
        return (round(x, digits), round(y, digits))

    adj = defaultdict(list)
    segs = []
    for x0, y0, x1, y1 in segments:
        i = len(segs)
        segs.append(((x0, y0), (x1, y1)))
        adj[key(x0, y0)].append(i)
        adj[key(x1, y1)].append(i)
    used = [False] * len(segs)
    out = []
    # open chains first (endpoints of degree 1), then remaining cycles
    starts = [k for k, v in adj.items() if len(v) == 1]
    for phase in (0, 1):
        seeds = starts if phase == 0 else list(adj.keys())
        for seed in seeds:
            nxt = [i for i in adj[seed] if not used[i]]
            if not nxt:
                continue
            i = nxt[0]
            used[i] = True
            a, b = segs[i]
            if key(*a) != seed:
                a, b = b, a
            line = [a, b]
            while True:
                k = key(*line[-1])
                cand = [j for j in adj[k] if not used[j]]
                if not cand:
                    break
                j = cand[0]
                used[j] = True
                p, q = segs[j]
                line.append(q if key(*p) == k else p)
                if key(*line[-1]) == key(*line[0]):
                    break
            out.append(line)
    return out


def contour_polygons(tiles_df: DataFrame, levels: list[float],
                     tile: int = 256, nodata: float | None = None
                     ) -> DataFrame:
    """gdal_contour -p (polygon mode, alg/contour.cpp polygon writer):
    polygons covering each level band [levels[k-1], levels[k]).

    Implementation: classify every pixel into its band index (one
    searchsorted per tile — pure map), then trace the band regions with the
    polygonize ring tracer (holes included, halo-correct across seams).
    Band boundaries are therefore PIXEL-quantized rather than sub-pixel
    interpolated like the reference's marching-squares polygon writer — the
    smooth isolines remain available as contour_segments; band areas agree
    with the reference to one pixel along each boundary (documented
    divergence). Output: (comp_id, band, zoom, level_min, level_max,
    geom WKB) with one row per connected band region, in pixel coords.
    """
    from .polygonize import polygonize_polygons
    from .tiles import TILE_SCHEMA, decode_px, encode_px

    lv = sorted(levels)

    def classify(pdf_iter):
        for pdf in pdf_iter:
            out = []
            for r in pdf.itertuples():
                arr = decode_px(r.px, r.dtype, tile)
                if nodata is not None and not np.isnan(nodata):
                    valid = arr != np.array(nodata, arr.dtype)
                else:
                    valid = np.ones_like(arr, dtype=bool)
                band = np.searchsorted(lv, arr, side="right") \
                    .astype(np.float64)
                band[~valid] = -1.0
                out.append((r.band, r.zoom, r.tile_x, r.tile_y,
                            "float64", -1.0, encode_px(band)))
            yield pd.DataFrame(out, columns=[f.name for f in
                                             TILE_SCHEMA.fields]) \
                if out else pd.DataFrame(columns=[f.name for f in
                                                  TILE_SCHEMA.fields])

    classified = tiles_df.mapInPandas(classify, TILE_SCHEMA)
    polys = polygonize_polygons(classified, tile=tile, nodata=-1.0)
    bidx = F.col("value").cast("int")
    lo = F.array(*[F.lit(float("-inf"))]
                 + [F.lit(float(v)) for v in lv])
    hi = F.array(*[F.lit(float(v)) for v in lv]
                 + [F.lit(float("inf"))])
    return polys.select(
        "comp_id", "band", "zoom",
        F.element_at(lo, bidx + 1).alias("level_min"),
        F.element_at(hi, bidx + 1).alias("level_max"),
        "geom")
