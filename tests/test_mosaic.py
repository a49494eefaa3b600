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


def test_pansharpen_identity_and_scale(spark):
    """pan == pseudo_pan -> output equals the input bands exactly;
    pan == 2*pseudo_pan -> every band doubles (the Brovey ratio law)."""
    from gdal_spark.raster.mosaic import pansharpen
    from gdal_spark.raster.tiles import raster_to_tiles
    rng = np.random.RandomState(6)
    t = 16
    bands = {b: rng.uniform(1, 100, (t, t)) for b in (1, 2, 3)}
    ms = None
    for b, arr in bands.items():
        df = raster_to_tiles(spark, arr, zoom=0, band=b, tile=t)
        ms = df if ms is None else ms.unionByName(df)
    pseudo = sum(bands.values()) / 3.0
    for factor in (1.0, 2.0):
        pan = raster_to_tiles(spark, pseudo * factor, zoom=0, band=1, tile=t)
        out = pansharpen(ms, pan, tile=t)
        rows = out.collect()
        assert len(rows) == 3
        for r in rows:
            got = np.frombuffer(r.px, dtype=np.float64).reshape(t, t)
            np.testing.assert_allclose(got, bands[r.band] * factor,
                                       rtol=1e-12)
