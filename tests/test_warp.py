"""Warp tests: identity warp must be exact; reprojection must match a
single-array numpy oracle using the same mesh + kernel (proving the
distributed src-tile routing / canvas assembly is lossless)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.raster import tiles, transforms, warp
from gdal_spark.raster.rasterize import GridSpec

TILE = 16


def _smooth(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return (np.sin(x / 7.0) * 40 + np.cos(y / 9.0) * 25
            + 0.02 * x * y / 10.0 + 100.0)


def test_transform_roundtrip():
    lon = np.linspace(-179, 179, 50)
    lat = np.linspace(-84, 84, 50)
    mx, my = transforms.transform("EPSG:4326", "EPSG:3857", lon, lat)
    lon2, lat2 = transforms.transform("EPSG:3857", "EPSG:4326", mx, my)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_approx_mesh_within_tolerance():
    # realistic case: one 256px dst tile spanning ~5 degrees (the scale at
    # which the reference's ApproxTransformer pays off)
    xs, ys = np.meshgrid(np.linspace(10.0, 15.0, 256),
                         np.linspace(45.0, 50.0, 256))
    tx, ty, n_exact, n_total = transforms.approx_mesh(
        "EPSG:4326", "EPSG:3857", xs, ys, step=16, tol_px=0.125,
        px_size=2000.0)
    ex, ey = transforms.transform("EPSG:4326", "EPSG:3857", xs, ys)
    assert n_exact < n_total / 10  # saved >90% of exact transforms
    np.testing.assert_allclose(tx, ex, atol=0.5 * 2000.0)
    np.testing.assert_allclose(ty, ey, atol=0.5 * 2000.0)


@pytest.mark.parametrize("resample", ["near", "bilinear", "cubic"])
def test_identity_warp(spark, resample):
    arr = _smooth(2 * TILE, 3 * TILE)
    grid = GridSpec(x0=0.0, y0=0.0, dx=1.0, dy=1.0,
                    width=3 * TILE, height=2 * TILE, tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    spec = warp.WarpSpec(src_grid=grid, src_crs="EPSG:4326",
                         dst_grid=grid, dst_crs="EPSG:4326",
                         resample=resample)
    out = warp.warp(df, spec)
    got = tiles.tiles_to_raster(out, tile=TILE)
    # identity mesh: interior must be exact for all kernels (weights hit 0/1)
    interior = (slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(got[interior], arr[interior], atol=1e-9)


@pytest.mark.parametrize("resample", ["near", "bilinear", "cubic"])
def test_reproject_matches_single_array_oracle(spark, resample):
    """3857 -> 4326 warp across multiple tiles == one-shot numpy warp."""
    h, w = 2 * TILE, 4 * TILE
    arr = _smooth(h, w)
    # src: mercator grid covering the world band lat ~ [-66, 66]
    merc = 20037508.342789244
    src = GridSpec(x0=-merc, y0=merc / 2, dx=2 * merc / w, dy=-merc / (h),
                   width=w, height=h, tile=TILE)
    dst = GridSpec(x0=-180.0, y0=60.0, dx=360.0 / w, dy=-120.0 / h,
                   width=w, height=h, tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    spec = warp.WarpSpec(src_grid=src, src_crs="EPSG:3857",
                         dst_grid=dst, dst_crs="EPSG:4326",
                         resample=resample, fill=-1.0)
    got = tiles.tiles_to_raster(warp.warp(df, spec), tile=TILE)

    # single-array oracle with the same mesh and kernel
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    dwx = dst.x0 + (jj + 0.5) * dst.dx
    dwy = dst.y0 + (ii + 0.5) * dst.dy
    swx, swy = transforms.transform("EPSG:4326", "EPSG:3857", dwx, dwy)
    sx = (swx - src.x0) / src.dx
    sy = (swy - src.y0) / src.dy
    want = warp._sample(arr, 0, 0, sx, sy, resample, -1.0)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_warp_approx_transformer(spark):
    h, w = 2 * TILE, 2 * TILE
    arr = _smooth(h, w)
    merc = 20037508.342789244
    src = GridSpec(x0=-merc, y0=merc / 2, dx=2 * merc / w, dy=-merc / h,
                   width=w, height=h, tile=TILE)
    dst = GridSpec(x0=-180.0, y0=60.0, dx=360.0 / w, dy=-120.0 / h,
                   width=w, height=h, tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    exact = tiles.tiles_to_raster(warp.warp(df, warp.WarpSpec(
        src, "EPSG:3857", dst, "EPSG:4326", "bilinear", fill=-1.0)),
        tile=TILE)
    approx = tiles.tiles_to_raster(warp.warp(df, warp.WarpSpec(
        src, "EPSG:3857", dst, "EPSG:4326", "bilinear", fill=-1.0,
        approx_tol_px=0.125)), tile=TILE)
    # error bound: 0.125 src px of a smooth field -> tiny value difference
    assert np.abs(exact - approx).max() < 1.0
