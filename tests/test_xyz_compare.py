"""gdal2xyz and gdalcompare twins."""

from __future__ import annotations

import numpy as np

from gdal_spark.raster.rasterize import GridSpec
from gdal_spark.raster.stats import band_calc
from gdal_spark.raster.tiles import (gdal2xyz, raster_compare,
                                     raster_to_tiles)


def test_gdal2xyz_georeferenced_and_nodata_skip(spark):
    arr = np.array([[1.0, 0.0], [3.0, 4.0]])
    t = raster_to_tiles(spark, arr, tile=2)
    from pyspark.sql import functions as F
    t = t.withColumn("nodata", F.lit(0.0))
    grid = GridSpec(x0=100.0, y0=50.0, dx=0.5, dy=-0.5,
                    width=2, height=2, tile=2)
    rows = {(r.x, r.y): r.value
            for r in gdal2xyz(t, tile=2, grid=grid,
                              skip_nodata=True).collect()}
    # pixel centers: x = 100 + (px+0.5)*0.5 ; y = 50 - (py+0.5)*0.5
    assert rows == {(100.25, 49.75): 1.0,
                    (100.25, 49.25): 3.0, (100.75, 49.25): 4.0}


def test_raster_compare_identical_and_modified(spark):
    arr = np.arange(64, dtype=np.float64).reshape(8, 8)
    a = raster_to_tiles(spark, arr, tile=4)
    same = raster_compare(a, raster_to_tiles(spark, arr, tile=4),
                          tile=4).collect()[0]
    assert same.n_pixels_diff == 0 and same.max_abs_diff == 0.0
    assert same.checksum_equal

    mod = arr.copy()
    mod[3, 5] += 10.0
    mod[7, 0] -= 2.0
    diff = raster_compare(a, raster_to_tiles(spark, mod, tile=4),
                          tile=4).collect()[0]
    assert diff.n_pixels_diff == 2 and diff.max_abs_diff == 10.0
    assert not diff.checksum_equal


def test_raster_compare_missing_tile_counts_all(spark):
    arr = np.ones((8, 8))
    a = raster_to_tiles(spark, arr, tile=4)
    b = raster_to_tiles(spark, arr, tile=4).where("tile_x != 1 OR tile_y != 1")
    r = raster_compare(a, b, tile=4).collect()[0]
    assert r.n_pixels_diff == 16 and np.isinf(r.max_abs_diff)


def test_compare_band_calc_identity(spark):
    arr = np.arange(16, dtype=np.float64).reshape(4, 4)
    a = raster_to_tiles(spark, arr, tile=4)
    b = band_calc(a, "A * 1.0", tile=4)
    r = raster_compare(a, b, tile=4).collect()[0]
    assert r.n_pixels_diff == 0 and r.checksum_equal
