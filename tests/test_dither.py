"""Floyd-Steinberg dither + exact median cut vs GDAL's own goldens.

Reference: GDALDitherRGB2PCT (/root/reference/alg/gdaldither.cpp) and
GDALComputeMedianCutPCT (/root/reference/alg/gdalmediancut.cpp), pinned by
the reference's own autotest fixture (autotest/alg/dither.py:24-80):
rgbsmall.tif -> 8-colour median cut must equal an exact colour table and
the dithered band must checksum to 8803.
"""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.core.checksum import gdal_checksum
from gdal_spark.raster.dither import (build_color_cube, dither_block,
                                      dither_rgb2pct, find_nearest_color)
from gdal_spark.raster.palette import (compute_median_cut_pct_exact,
                                       median_cut_exact)
from gdal_spark.raster.tiles import TILE_SCHEMA, encode_px, tiles_to_raster

RGBSMALL = "/root/reference/autotest/gdrivers/data/rgbsmall.tif"

# autotest/alg/dither.py:56-65 ref_ct
REF_CT = np.array([(36, 48, 32), (92, 120, 20), (88, 96, 20),
                   (92, 132, 56), (0, 0, 0), (96, 152, 24),
                   (60, 112, 32), (164, 164, 108)], np.uint8)


def _rgb_tiles(spark, r, g, b, tile):
    rows = []
    h, w = r.shape
    for ty in range(-(-h // tile)):
        for tx in range(-(-w // tile)):
            for band, arr in ((1, r), (2, g), (3, b)):
                blk = np.zeros((tile, tile), np.uint8)
                sub = arr[ty * tile:(ty + 1) * tile,
                          tx * tile:(tx + 1) * tile]
                blk[:sub.shape[0], :sub.shape[1]] = sub
                rows.append((band, 0, tx, ty, "uint8", None,
                             encode_px(blk)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in TILE_SCHEMA.fields]),
        schema=TILE_SCHEMA)


def test_median_cut_exact_matches_reference_table(spark):
    from gdal_spark.sources.geotiff import read_gtiff
    t = read_gtiff(spark, RGBSMALL, tile=32)
    pal = compute_median_cut_pct_exact(t, n_colors=8, tile=32,
                                       width=50, height=50)
    assert np.array_equal(pal, REF_CT)


def test_dither_golden_checksum(spark):
    """The reference's own golden: dithered rgbsmall checksums to 8803
    (autotest/alg/dither.py:49), through our reader, median cut, and the
    distributed wavefront."""
    from gdal_spark.sources.geotiff import read_gtiff
    t = read_gtiff(spark, RGBSMALL, tile=32).localCheckpoint()
    pal = compute_median_cut_pct_exact(t, n_colors=8, tile=32,
                                       width=50, height=50)
    out = dither_rgb2pct(t, pal, tile=32, n_bits=5, width=50, height=50)
    arr = tiles_to_raster(out, tile=32)[:50, :50]
    assert gdal_checksum(arr) == 8803


def test_wavefront_equals_sequential_scan(spark):
    """Random image, palette with big errors: the loop-skewed wavefront
    (many waves, interior boundaries in both axes) must reproduce the
    whole-image sequential transcription bit-for-bit."""
    rng = np.random.default_rng(20)
    h, w = 37, 53                          # awkward sizes, partial tiles
    r = rng.integers(0, 256, (h, w)).astype(np.uint8)
    g = rng.integers(0, 256, (h, w)).astype(np.uint8)
    b = rng.integers(0, 256, (h, w)).astype(np.uint8)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
                    [255, 255, 255], [128, 128, 0]], np.uint8)
    cube = build_color_cube(pal, 5)
    want = dither_block(r, g, b, pal, cube, 5)
    t = _rgb_tiles(spark, r, g, b, tile=16)
    out = dither_rgb2pct(t, pal, tile=16, n_bits=5, width=w, height=h)
    got = tiles_to_raster(out, tile=16)[:h, :w]
    assert np.array_equal(got, want)


def test_wavefront_nbits8_exact_path(spark):
    """n_bits=8 (dynamic colour map, gdaldither.cpp:489-504): nearest
    colour on the true pixel value, no cube quantization."""
    rng = np.random.default_rng(21)
    h, w = 20, 31
    r = rng.integers(0, 256, (h, w)).astype(np.uint8)
    g = rng.integers(0, 256, (h, w)).astype(np.uint8)
    b = rng.integers(0, 256, (h, w)).astype(np.uint8)
    pal = np.stack([np.arange(0, 256, 2)] * 3, axis=1).astype(np.uint8)
    want = dither_block(r, g, b, pal, None, 8)
    t = _rgb_tiles(spark, r, g, b, tile=8)
    out = dither_rgb2pct(t, pal, tile=8, n_bits=8, width=w, height=h)
    got = tiles_to_raster(out, tile=8)[:h, :w]
    assert np.array_equal(got, want)


def test_even_gray_palette_closed_form():
    """Even-gray palette + gray input <= 254: every error is 0 or +1,
    nSixth = 0, so error flows straight down and the output index has
    the closed form (v + p_prev - p) / 2 with p = running column parity
    — the law the driver oracle (dither_gray_fs) checks in SQL."""
    rng = np.random.default_rng(22)
    v = rng.integers(0, 255, (19, 23)).astype(np.uint8)
    pal = np.stack([np.arange(0, 256, 2)] * 3, axis=1).astype(np.uint8)
    got = dither_block(v, v, v, pal, None, 8)
    par = np.cumsum(v.astype(np.int64) & 1, axis=0) & 1
    prev = np.vstack([np.zeros((1, v.shape[1]), np.int64), par[:-1]])
    want = (v.astype(np.int64) + prev - par) // 2
    assert np.array_equal(got.astype(np.int64), want)


def test_trunc_division_matches_c():
    """Negative errors: C's error/6 truncates toward zero (-5/6 == 0),
    Python's floors (-5//6 == -1).  A palette colour above the input
    value makes every error negative; diffusing -5 must add nothing to
    the neighbours except the centre (-5 - 5*0)."""
    v = np.full((2, 3), 100, np.uint8)
    pal = np.array([[105, 105, 105]], np.uint8)     # error = -5 everywhere
    got = dither_block(v, v, v, pal, None, 8)
    assert (got == 0).all()
    # second row: 100 + applied centre error -5 (clamped path) -> 95,
    # still nearest (only) colour 0; crash-free negative flow is the point
    assert got.shape == (2, 3)


def test_find_nearest_color_first_min_tiebreak():
    pal = np.array([[10, 10, 10], [12, 12, 12]], np.uint8)
    # 11 is L1-equidistant (3 vs 3): first index must win
    assert find_nearest_color(pal, np.array([[11, 11, 11]]))[0] == 0


def test_median_cut_exact_single_colors():
    """<= n_colors occupied cells -> every cell its own box; palette is
    the box midpoint ((2*cell << 3) / 2 = cell low edge)."""
    hist = pd.DataFrame({"r": [1, 30], "g": [2, 31], "b": [3, 0],
                         "n": [10, 20]})
    pal = median_cut_exact(hist, n_colors=4)
    assert len(pal) == 2
    assert {tuple(p) for p in pal.tolist()} == {(8, 16, 24), (240, 248, 0)}
