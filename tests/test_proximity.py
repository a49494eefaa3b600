"""Proximity (Euclidean distance to nearest target) vs brute force.

Reference: GDALComputeProximity, /root/reference/alg/gdalproximity.cpp
(targets = non-zero pixels, Euclidean distance, MAXDIST clamp).
"""

import numpy as np
import pytest

from gdal_spark.raster.proximity import _edt_2d, proximity
from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster


def brute(arr):
    ty, tx = np.nonzero(arr != 0)
    h, w = arr.shape
    yy, xx = np.mgrid[0:h, 0:w]
    if len(ty) == 0:
        return np.full(arr.shape, np.inf)
    d2 = ((yy[..., None] - ty) ** 2 + (xx[..., None] - tx) ** 2).min(axis=-1)
    return np.sqrt(d2.astype(np.float64))


def test_edt_2d_matches_brute():
    rng = np.random.default_rng(3)
    arr = (rng.random((20, 30)) < 0.05).astype(np.int32)
    f = np.where(arr != 0, 0.0, 1e18)
    got = np.sqrt(_edt_2d(f))
    assert np.allclose(got, brute(arr))


def test_proximity_crosses_many_tiles(spark):
    """Single target in one corner: the wavefront must propagate through
    every tile (4x4 tiles of 8px) — validates the iterative halo rounds."""
    arr = np.zeros((32, 32), np.int32)
    arr[1, 2] = 1
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8)
    out = tiles_to_raster(proximity(tiles, tile=8), tile=8)
    assert np.allclose(out, brute(arr))


def test_proximity_random_targets(spark):
    rng = np.random.default_rng(9)
    arr = (rng.random((24, 40)) < 0.03).astype(np.int32)
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8)
    out = tiles_to_raster(proximity(tiles, tile=8), tile=8)
    assert np.allclose(out, brute(arr))


def test_proximity_maxdist_clamp(spark):
    arr = np.zeros((16, 16), np.int32)
    arr[0, 0] = 1
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8)
    out = tiles_to_raster(proximity(tiles, tile=8, maxdist=5.0), tile=8)
    want = np.minimum(brute(arr), 5.0)
    assert np.allclose(out, want)
