"""Mosaic compositing and footprint vs numpy references.

Reference: gdal_merge.py (last-on-top, nodata transparent) and
gdal_footprint (apps/gdal_footprint_lib.cpp).
"""

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.core import geomops
from gdal_spark.raster.mosaic import footprint, mosaic
from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster


def test_mosaic_last_on_top(spark):
    rng = np.random.default_rng(4)
    a = (rng.random((16, 16)) < 0.5).astype(np.int32) * 7
    b = (rng.random((16, 16)) < 0.5).astype(np.int32) * 9
    ta = raster_to_tiles(spark, a, zoom=0, tile=8).withColumn("seq", F.lit(0))
    tb = raster_to_tiles(spark, b, zoom=0, tile=8).withColumn("seq", F.lit(1))
    out = mosaic(ta.unionByName(tb), tile=8, nodata=0.0)
    got = tiles_to_raster(out, tile=8)
    want = a.copy()
    want[b != 0] = b[b != 0]
    assert np.array_equal(got.astype(np.int32), want)


def test_footprint_envelopes(spark):
    arr = np.zeros((16, 16), np.int32)
    arr[2:5, 3:9] = 4       # one data blob
    arr[10:12, 12:14] = 6   # another
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8, nodata=0.0)
    rows = footprint(tiles, tile=8).collect()
    envs = sorted(
        tuple(geomops.envelopes([bytes(r.geom)])[0].tolist()) + (r.n_pixels,)
        for r in rows)
    assert envs == [(3.0, 2.0, 9.0, 5.0, 18), (12.0, 10.0, 14.0, 12.0, 4)]
