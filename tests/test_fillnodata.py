"""fillnodata vs a whole-raster reference of the same spec.

Reference: GDALFillNodata, /root/reference/alg/rasterfill.cpp (directional
nearest-valid search + IDW blend + smoothing over filled pixels).
"""

import numpy as np

from gdal_spark.raster.fillnodata import _DIRS, fill_region, fillnodata
from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster


def ref_fill(arr, nodata, max_dist, smoothing):
    valid = arr != nodata
    out, _ = fill_region(arr.astype(np.float64), valid, 0, arr.shape[0],
                         max_dist, smoothing)
    return out


def test_fill_simple_hole(spark):
    arr = np.full((16, 16), 5.0)
    arr[6:9, 6:9] = -1.0          # nodata hole
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8, nodata=-1.0)
    out = tiles_to_raster(fillnodata(tiles, max_dist=4, tile=8), tile=8)
    assert np.allclose(out, 5.0)  # only value around is 5 -> fills to 5


def test_fill_matches_whole_raster_reference(spark):
    """Tiled fill == single-pass fill over the unsplit raster (the 3x3
    neighborhood exchange sees everything max_dist<=tile can reach)."""
    rng = np.random.default_rng(11)
    arr = rng.uniform(10, 20, size=(24, 24))
    holes = rng.random((24, 24)) < 0.2
    arr[holes] = -1.0
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8, nodata=-1.0)
    got = tiles_to_raster(fillnodata(tiles, max_dist=6, tile=8), tile=8)
    want = ref_fill(arr, -1.0, 6, 0)
    assert np.allclose(got, want)


def test_fill_with_smoothing(spark):
    rng = np.random.default_rng(2)
    arr = rng.uniform(0, 100, size=(16, 16))
    arr[3:6, 9:14] = -1.0
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8, nodata=-1.0)
    got = tiles_to_raster(fillnodata(tiles, max_dist=8, smoothing=2,
                                     tile=8), tile=8)
    want = ref_fill(arr, -1.0, 8, 2)
    assert np.allclose(got, want)


def test_fill_radius_beyond_tile(spark):
    """max_dist > tile (round-3 multi-ring halo): a hole whose nearest
    valid pixels sit two tiles away still fills, matching the whole-raster
    reference."""
    arr = np.full((32, 32), -1.0)
    arr[:, 0] = 7.0               # valid only on the west edge
    arr[:, 31] = 13.0             # and the east edge
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8, nodata=-1.0)
    got = tiles_to_raster(fillnodata(tiles, max_dist=31, tile=8), tile=8)
    want = ref_fill(arr, -1.0, 31, 0)
    assert np.allclose(got, want)
    assert (got != -1.0).all()    # every hole reachable within 31 px


def test_fill_radius_beyond_tile_random(spark):
    rng = np.random.default_rng(23)
    arr = np.full((40, 40), -1.0)
    keep = rng.random((40, 40)) < 0.02
    arr[keep] = rng.uniform(5, 9, keep.sum())
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8, nodata=-1.0)
    got = tiles_to_raster(fillnodata(tiles, max_dist=20, tile=8),
                          tile=8)[:40, :40]
    want = ref_fill(arr, -1.0, 20, 0)
    assert np.allclose(got, want)
