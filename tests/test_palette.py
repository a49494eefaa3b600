"""Median-cut palette + quantization vs a whole-image local reference.

Reference: GDALComputeMedianCutPCT (/root/reference/alg/gdalmediancut.cpp,
Heckbert median cut) — the palette of an image with <= n_colors distinct
colors is exactly those colors, and quantization maps every pixel back to
itself; on richer images the distributed histogram must equal the
whole-image numpy histogram, making the driver-side cut identical by
construction.
"""

import numpy as np
import pytest

from gdal_spark.raster.palette import (color_histogram,
                                       compute_median_cut_pct, median_cut,
                                       rgb_to_pct)
from gdal_spark.raster.tiles import TILE_SCHEMA, encode_px, tiles_to_raster


def _rgb_tiles(spark, r, g, b, tile=8):
    rows = []
    h, w = r.shape
    for ty in range(h // tile):
        for tx in range(w // tile):
            for band, arr in ((1, r), (2, g), (3, b)):
                sub = arr[ty * tile:(ty + 1) * tile,
                          tx * tile:(tx + 1) * tile]
                rows.append((band, 0, tx, ty, "uint8", None,
                             encode_px(sub.astype(np.uint8))))
    import pandas as pd
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in TILE_SCHEMA.fields]),
        schema=TILE_SCHEMA)


def test_exact_palette_and_identity_quantization(spark):
    """<= n_colors distinct colors -> palette == those colors, and
    nearest-color quantization reproduces every pixel exactly."""
    rng = np.random.default_rng(4)
    colors = np.array([[10, 20, 30], [200, 40, 90], [0, 255, 128],
                       [77, 77, 77]], np.uint8)
    pick = rng.integers(0, 4, (16, 16))
    r, g, b = (colors[pick, i] for i in range(3))
    t = _rgb_tiles(spark, r, g, b)
    pal = compute_median_cut_pct(t, n_colors=4, tile=8)
    # 5-bit histogram quantizes to bucket centers: verify each original
    # color maps to a distinct palette entry that quantizes back to it
    out = tiles_to_raster(rgb_to_pct(t, pal, tile=8), tile=8)
    back = pal[out.astype(int)]
    for i in range(3):
        chan = back[..., i].astype(int)
        orig = (colors[pick, i] >> 3).astype(int)    # 5-bit buckets
        assert np.array_equal(chan >> 3, orig)


def test_histogram_matches_whole_image(spark):
    rng = np.random.default_rng(11)
    r = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    g = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    b = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    t = _rgb_tiles(spark, r, g, b)
    got = {(row.r, row.g, row.b): row.n
           for row in color_histogram(t, tile=8).collect()}
    code = ((r.astype(np.int64) >> 3) << 10) \
        | ((g.astype(np.int64) >> 3) << 5) | (b.astype(np.int64) >> 3)
    uniq, cnt = np.unique(code, return_counts=True)
    want = {(int(u >> 10), int((u >> 5) & 31), int(u & 31)): int(c)
            for u, c in zip(uniq, cnt)}
    assert got == want


def test_median_cut_splits_largest_box():
    import pandas as pd
    # two clusters, one 3x heavier -> with 3 colors the heavy cluster
    # splits first
    hist = pd.DataFrame({
        "r": [0, 1, 30, 31], "g": [0, 0, 31, 31], "b": [0, 0, 31, 31],
        "n": [300, 300, 100, 100]})
    pal = median_cut(hist, n_colors=3)
    assert len(pal) == 3
    # heavy cluster (near black) contributes two entries
    dark = (pal.astype(int).sum(1) < 150).sum()
    assert dark == 2


def test_pct_to_rgb_inverts_quantization(spark):
    """rgb_to_pct then pct_to_rgb reproduces every pixel's palette color
    exactly when the input only contains palette colors."""
    import numpy as np

    from gdal_spark.raster.palette import pct_to_rgb, rgb_to_pct
    from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 200, 40], [10, 20, 250]],
                   np.uint8)
    rng = np.random.default_rng(5)
    idx = rng.integers(0, len(pal), size=(32, 32))
    rgb = pal[idx]
    dfs = [raster_to_tiles(spark, rgb[:, :, b].astype(np.uint8),
                           band=b + 1, tile=16) for b in range(3)]
    df = dfs[0].unionByName(dfs[1]).unionByName(dfs[2])
    pct = rgb_to_pct(df, pal, tile=16)
    back = pct_to_rgb(pct, pal, tile=16)
    for b in range(3):
        got = tiles_to_raster(back.where(back.band == b + 1), tile=16)
        np.testing.assert_array_equal(got, rgb[:, :, b])
