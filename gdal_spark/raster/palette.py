"""Median-cut palette + nearest-color quantization (rgb -> PCT).

Re-expresses the parallelizable half of the reference's color-table stack
(/root/reference/alg/gdalmediancut.cpp GDALComputeMedianCutPCT — Heckbert
1982 median cut over a 5-bit-per-channel histogram, after libtiff's
tiffmedian.c) Spark-first:

    1. distributed histogram: one groupBy over the quantized (r, g, b)
       triples of the whole image — at 5 bits/channel at most 32768 rows
       reach the driver regardless of raster size (map-side combine does
       the heavy lifting);
    2. the median-cut loop runs on that tiny histogram driver-side
       (split the box with the largest pixel count along its longest
       axis at the population median — the reference's rule);
    3. quantization to the palette is a map-only pass (vectorized
       nearest-color in numpy per tile).

The error-diffusion half (GDALDitherRGB2PCT's Floyd-Steinberg,
alg/gdaldither.cpp) remains out of scope: its serpentine error carry is
inherently sequential across the whole image (documented in ROADMAP.md);
the nearest-color assignment here is its diffusion-free counterpart.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tiles import TILE_SCHEMA, decode_px, encode_px

_HIST_SCHEMA = T.StructType([
    T.StructField("r", T.IntegerType()),
    T.StructField("g", T.IntegerType()),
    T.StructField("b", T.IntegerType()),
    T.StructField("n", T.LongType()),
])


def _rgb_tiles(tiles_df: DataFrame, tile: int):
    """Group the band-1/2/3 tiles of one (zoom, tile_x, tile_y) cell."""
    return tiles_df.groupBy("zoom", "tile_x", "tile_y")


def color_histogram(tiles_df: DataFrame, tile: int = 256,
                    bits: int = 5) -> DataFrame:
    """(r, g, b, n) at `bits` per channel (gdalmediancut.cpp:347
    nCLevels = 1 << nBits)."""
    shift = 8 - bits

    def partials(key, pdf: pd.DataFrame) -> pd.DataFrame:
        chans = {}
        for row in pdf.itertuples():
            chans[int(row.band)] = decode_px(row.px, row.dtype, tile)
        if not all(k in chans for k in (1, 2, 3)):
            return pd.DataFrame(columns=[f.name for f in
                                         _HIST_SCHEMA.fields])
        q = [(np.clip(chans[k], 0, 255).astype(np.int64) >> shift).ravel()
             for k in (1, 2, 3)]
        code = (q[0] << (2 * bits)) | (q[1] << bits) | q[2]
        uniq, cnt = np.unique(code, return_counts=True)
        return pd.DataFrame({
            "r": (uniq >> (2 * bits)).astype(np.int32),
            "g": ((uniq >> bits) & ((1 << bits) - 1)).astype(np.int32),
            "b": (uniq & ((1 << bits) - 1)).astype(np.int32),
            "n": cnt})

    return _rgb_tiles(tiles_df, tile).applyInPandas(partials, _HIST_SCHEMA) \
        .groupBy("r", "g", "b").agg(F.sum("n").alias("n"))


def median_cut(hist: pd.DataFrame, n_colors: int = 256,
               bits: int = 5) -> np.ndarray:
    """Heckbert median cut over the collected histogram -> (k, 3) uint8
    palette (box centroids weighted by population). Split rule: the box
    holding the most pixels splits along its longest axis at the
    population median (gdalmediancut.cpp splitbox/shrinkbox)."""
    pts = hist[["r", "g", "b"]].to_numpy(np.int64)
    w = hist["n"].to_numpy(np.int64)
    boxes = [np.arange(len(pts))]

    def pop(idx):
        return int(w[idx].sum())

    while len(boxes) < n_colors:
        splittable = [k for k, bx in enumerate(boxes) if len(bx) > 1]
        if not splittable:
            break
        k = max(splittable, key=lambda k: pop(boxes[k]))
        cand = boxes.pop(k)
        spans = pts[cand].max(0) - pts[cand].min(0)
        axis = int(np.argmax(spans))
        order = cand[np.argsort(pts[cand, axis], kind="stable")]
        csum = np.cumsum(w[order])
        half = csum[-1] / 2.0
        cut = int(np.searchsorted(csum, half)) + 1
        cut = min(max(cut, 1), len(order) - 1)
        boxes += [order[:cut], order[cut:]]

    scale = 1 << (8 - bits)
    pal = []
    for bx in boxes:
        ww = w[bx].astype(np.float64)
        c = (pts[bx] * scale + scale / 2.0)
        pal.append(np.round((c * ww[:, None]).sum(0) / ww.sum()))
    return np.clip(np.array(pal), 0, 255).astype(np.uint8)


def compute_median_cut_pct(tiles_df: DataFrame, n_colors: int = 256,
                           tile: int = 256, bits: int = 5) -> np.ndarray:
    """GDALComputeMedianCutPCT twin: distributed histogram + driver cut."""
    hist = color_histogram(tiles_df, tile, bits).toPandas()
    return median_cut(hist, n_colors, bits)


def rgb_to_pct(tiles_df: DataFrame, palette: np.ndarray,
               tile: int = 256) -> DataFrame:
    """Nearest-palette-color quantization (diffusion-free
    GDALDitherRGB2PCT counterpart): -> single-band uint8 tile table of
    palette indices. Pure map over tiles, palette ships in the closure."""
    pal = np.asarray(palette, np.float64)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        chans = {}
        zoom, tx, ty = int(key[0]), int(key[1]), int(key[2])
        for row in pdf.itertuples():
            chans[int(row.band)] = decode_px(row.px, row.dtype, tile)
        cols = [f.name for f in TILE_SCHEMA.fields]
        if not all(k in chans for k in (1, 2, 3)):
            return pd.DataFrame(columns=cols)
        rgb = np.stack([chans[k].astype(np.float64) for k in (1, 2, 3)],
                       axis=-1).reshape(-1, 3)
        d2 = ((rgb[:, None, :] - pal[None, :, :]) ** 2).sum(-1)
        idx = np.argmin(d2, axis=1).astype(np.uint8).reshape(tile, tile)
        return pd.DataFrame(
            [(1, zoom, tx, ty, "uint8", None, encode_px(idx))],
            columns=cols)

    return _rgb_tiles(tiles_df, tile).applyInPandas(run, TILE_SCHEMA)
