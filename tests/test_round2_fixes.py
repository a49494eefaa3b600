"""Regression tests for round-2 advisory fixes:

1. rasterize MERGE_ALG=ADD + linestring burns exactly once per pixel per
   shape (gv_rasterize_one_shape contract, alg/gdalrasterize.cpp:534).
2. interpolate_at_points keeps duplicate input rows distinct.
3. overview_level excludes nodata pixels and absent child quadrants from
   the reduction (gcore/overview.cpp average nodata masking).
4. polygonize node-id packing raises on out-of-range tile coords instead
   of silently colliding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gdal_spark.core import wkb
from gdal_spark.raster import pyramid, rasterize, tiles
from gdal_spark.raster.polygonize import _node_base
from gdal_spark.raster.sample import interpolate_at_points

TILE = 16


def _mk_geoms_df(spark, geoms_burns):
    pdf = pd.DataFrame(
        [(g, float(b), i) for i, (g, b) in enumerate(geoms_burns)],
        columns=["geom", "burn", "seq"])
    return spark.createDataFrame(pdf)


def test_rasterize_add_line_burns_once_per_pixel(spark):
    grid = rasterize.GridSpec(x0=0.0, y0=float(TILE), dx=1.0, dy=-1.0,
                              width=TILE, height=TILE, tile=TILE)
    # horizontal 10-px line through pixel row 3 (two segments sharing a vertex)
    line = wkb.linestring([(0.5, 12.5), (5.5, 12.5), (10.5, 12.5)])
    df = _mk_geoms_df(spark, [(line, 1.0)])
    out = rasterize.rasterize(df, grid, merge_alg="add")
    arr = tiles.tiles_to_raster(out, tile=TILE)
    burned = arr[arr != 0]
    assert len(burned) >= 10
    np.testing.assert_array_equal(burned, np.ones_like(burned))


def test_rasterize_add_two_line_shapes_accumulate(spark):
    grid = rasterize.GridSpec(x0=0.0, y0=float(TILE), dx=1.0, dy=-1.0,
                              width=TILE, height=TILE, tile=TILE)
    line = wkb.linestring([(0.5, 12.5), (10.5, 12.5)])
    df = _mk_geoms_df(spark, [(line, 1.0), (line, 1.0)])
    out = rasterize.rasterize(df, grid, merge_alg="add")
    arr = tiles.tiles_to_raster(out, tile=TILE)
    burned = arr[arr != 0]
    # two identical shapes -> exactly 2.0 per crossed pixel
    np.testing.assert_array_equal(burned, np.full_like(burned, 2.0))


def test_interpolate_keeps_duplicate_rows(spark):
    pixels = spark.createDataFrame(
        pd.DataFrame({"gpx": [0, 1], "gpy": [0, 0],
                      "value": [10.0, 20.0]}))
    pts = spark.createDataFrame(
        pd.DataFrame({"x": [1.0, 1.0, 1.0], "y": [0.5, 0.5, 0.5]}))
    out = interpolate_at_points(pixels, pts, "x", "y",
                                mode="bilinear").collect()
    assert len(out) == 3
    for r in out:
        assert r.value == pytest.approx(15.0)


def test_overview_average_masks_nodata(spark):
    arr = np.full((2 * TILE, 2 * TILE), -1.0, dtype=np.float64)
    arr[0, 0] = 8.0            # one valid child of parent pixel (0,0)
    arr[0, 2] = 4.0            # one valid child of parent pixel (0,1)
    arr[1, 2] = 6.0            # second valid child of parent pixel (0,1)
    df = tiles.raster_to_tiles(spark, arr, zoom=1, tile=TILE, nodata=-1.0)
    up = pyramid.overview_level(df, resampling="average", tile=TILE)
    got = tiles.tiles_to_raster(up, tile=TILE)
    assert got[0, 0] == pytest.approx(8.0)      # not diluted by nodata
    assert got[0, 1] == pytest.approx(5.0)      # mean of the 2 valid children
    assert got[2, 2] == pytest.approx(-1.0)     # all-nodata parent -> nodata


def test_overview_min_masks_nodata(spark):
    arr = np.full((2 * TILE, 2 * TILE), 0.0, dtype=np.float64)
    arr[0, 0] = 5.0
    df = tiles.raster_to_tiles(spark, arr, zoom=1, tile=TILE, nodata=0.0)
    up = pyramid.overview_level(df, resampling="min", tile=TILE)
    got = tiles.tiles_to_raster(up, tile=TILE)
    assert got[0, 0] == pytest.approx(5.0)      # nodata 0s don't win the min


def test_node_base_range_check():
    assert _node_base(0, 0, 256) == 0
    assert _node_base(1, 0, 256) == 1 << 16
    with pytest.raises(ValueError):
        _node_base(1 << 23, 0, 256)
    with pytest.raises(ValueError):
        _node_base(0, -1, 256)


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int32", "float32"])
def test_warp_and_pyramid_dtype_sweep(spark, dtype):
    """Non-float64 tile payloads flow through warp (identity near) and the
    overview reduction without corruption — the packed-bytes + dtype-column
    model of SURVEY §1.2."""
    from gdal_spark.raster import warp
    from gdal_spark.raster.rasterize import GridSpec
    rng = np.random.RandomState(11)
    arr = (rng.rand(2 * TILE, 2 * TILE) * 100).astype(dtype)
    df = tiles.raster_to_tiles(spark, arr, zoom=1, tile=TILE)
    up = pyramid.overview_level(df, resampling="near", tile=TILE)
    got = tiles.tiles_to_raster(up, tile=TILE)
    np.testing.assert_array_equal(got.astype(dtype), arr[::2, ::2])
    grid = GridSpec(x0=0.0, y0=0.0, dx=1.0, dy=1.0,
                    width=2 * TILE, height=2 * TILE, tile=TILE)
    spec = warp.WarpSpec(grid, "EPSG:4326", grid, "EPSG:4326", "near")
    w = tiles.tiles_to_raster(warp.warp(df, spec, out_dtype=dtype),
                              tile=TILE)
    np.testing.assert_array_equal(w.astype(dtype), arr)
