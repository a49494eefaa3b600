"""Raster gdal_translate (window / outsize / scale) vs numpy slicing.

Reference: GDALTranslate, /root/reference/apps/gdal_translate_lib.cpp
(-srcwin subset, -outsize near-resampled copy, -scale linear rescale).
"""

import numpy as np

from gdal_spark.raster.rasterize import GridSpec
from gdal_spark.raster.rtranslate import scale_tiles, translate_raster
from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster

GRID = GridSpec(x0=0.0, y0=0.0, dx=1.0, dy=-1.0, width=32, height=24,
                tile=8)


def _arr():
    rng = np.random.default_rng(5)
    return rng.integers(0, 1000, size=(24, 32)).astype(np.float64)


def test_srcwin_subset(spark):
    arr = _arr()
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8)
    out = translate_raster(tiles, GRID, srcwin=(5, 3, 16, 16))
    got = tiles_to_raster(out, tile=8)
    assert np.array_equal(got, arr[3:19, 5:21])


def test_outsize_near_downsample(spark):
    """2x near downsample picks every other pixel starting at the cell
    whose center maps into the dst pixel center (offset 0.5 of 2 -> idx 1)."""
    arr = _arr()
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8)
    out = translate_raster(tiles, GRID, srcwin=(0, 0, 32, 24),
                           outsize=(16, 12))
    got = tiles_to_raster(out, tile=8)[:12, :16]   # crop tile padding
    # dst pixel center (i+0.5)*2 in src px -> near = floor = 2i+1
    want = arr[1::2, 1::2]
    assert np.array_equal(got, want)


def test_scale_linear(spark):
    arr = _arr()
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8)
    out = scale_tiles(tiles, 0.0, 1000.0, 0.0, 255.0, tile=8)
    got = tiles_to_raster(out, tile=8)
    assert np.allclose(got, arr * 255.0 / 1000.0)


def test_window_plus_outsize_plus_scale(spark):
    arr = _arr()
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8)
    out = translate_raster(tiles, GRID, srcwin=(4, 2, 16, 16),
                           outsize=(8, 8), scale=(0.0, 1000.0, 0.0, 100.0))
    got = tiles_to_raster(out, tile=8)[:8, :8]
    want = arr[2:18, 4:20][1::2, 1::2] * 0.1
    assert np.allclose(got, want)
