"""Ellipsoidal CRS transforms (UTM/Transverse Mercator, LAEA) vs
independent mathematical oracles — no pyproj in this environment, so the
checks are: known anchors, numerical meridian-arc integration, the
equal-area property, and machine-precision round trips.

Reference behavior: the PROJ CT chain of alg/gdaltransformer.cpp:1348;
formulas from the public Krueger series (Karney 2011) and Snyder (1987).
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.raster import transforms as T
from gdal_spark.raster import tiles, warp
from gdal_spark.raster.rasterize import GridSpec

A = 6378137.0
F = 1 / 298.257223563
E2 = F * (2 - F)


def test_utm_natural_origin():
    x, y = T.transform("EPSG:4326", "EPSG:32631",
                       np.array([3.0]), np.array([0.0]))
    assert x[0] == pytest.approx(500000.0, abs=1e-6)
    assert y[0] == pytest.approx(0.0, abs=1e-6)


def test_utm_roundtrip_machine_precision():
    lon = np.linspace(0.5, 5.5, 50)
    lat = np.linspace(-80, 80, 50)
    x, y = T.transform("EPSG:4326", "EPSG:32631", lon, lat)
    lon2, lat2 = T.transform("EPSG:32631", "EPSG:4326", x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-11)
    np.testing.assert_allclose(lat2, lat, atol=1e-11)


def test_utm_northing_equals_scaled_meridian_arc():
    """On the central meridian, northing = k0 * meridian arc length —
    checked against brute-force numerical integration of the meridian
    curvature radius (an implementation-independent oracle)."""
    for lat in (15.0, 37.5, 60.0):
        _, y = T.transform("EPSG:4326", "EPSG:32631",
                           np.array([3.0]), np.array([lat]))
        phi = np.linspace(0.0, np.deg2rad(lat), 200001)
        m = A * (1 - E2) / (1 - E2 * np.sin(phi) ** 2) ** 1.5
        arc = np.trapz(m, phi)
        assert y[0] == pytest.approx(0.9996 * arc, abs=0.01), lat


def test_utm_south_false_northing():
    x, y = T.transform("EPSG:4326", "EPSG:32731",
                       np.array([3.0]), np.array([-0.0001]))
    assert y[0] == pytest.approx(10000000.0, abs=20.0)
    xn, yn = T.transform("EPSG:4326", "EPSG:32631",
                         np.array([3.0]), np.array([0.0001]))
    # same |lat| north/south must mirror around the false northing
    assert (10000000.0 - y[0]) == pytest.approx(yn[0], abs=1e-6)


def test_laea_3035_center_anchor():
    x, y = T.transform("EPSG:4326", "EPSG:3035",
                       np.array([10.0]), np.array([52.0]))
    assert x[0] == pytest.approx(4321000.0, abs=1e-6)
    assert y[0] == pytest.approx(3210000.0, abs=1e-6)


def test_laea_roundtrip():
    lon = np.linspace(-10, 30, 40)
    lat = np.linspace(35, 70, 40)
    x, y = T.transform("EPSG:4326", "EPSG:3035", lon, lat)
    lon2, lat2 = T.transform("EPSG:3035", "EPSG:4326", x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-7)
    np.testing.assert_allclose(lat2, lat, atol=1e-7)


def test_laea_preserves_area():
    """THE property of the projection: a small geodetic quad's projected
    planar area equals its ellipsoidal surface area (to first order)."""
    for lon0, lat0 in ((10.0, 52.0), (25.0, 40.0), (-5.0, 65.0)):
        d = 0.05
        lons = np.array([lon0, lon0 + d, lon0 + d, lon0])
        lats = np.array([lat0, lat0, lat0 + d, lat0 + d])
        x, y = T.transform("EPSG:4326", "EPSG:3035", lons, lats)
        planar = 0.5 * abs(np.dot(x, np.roll(y, -1))
                           - np.dot(np.roll(x, -1), y))
        phi = np.deg2rad(lat0 + d / 2)
        dens = (A ** 2 * (1 - E2) * np.cos(phi)
                / (1 - E2 * np.sin(phi) ** 2) ** 2)
        true = dens * np.deg2rad(d) ** 2
        assert planar == pytest.approx(true, rel=1e-4), (lon0, lat0)


def test_generic_laea_crs_string():
    lon = np.array([12.0])
    lat = np.array([48.0])
    x, y = T.transform("EPSG:4326", "LAEA:12,48", lon, lat)
    assert x[0] == pytest.approx(0.0, abs=1e-6)
    assert y[0] == pytest.approx(0.0, abs=1e-6)


def test_chain_consistency_through_mercator():
    lon = np.linspace(0.5, 5.5, 20)
    lat = np.linspace(-60, 60, 20)
    mx, my = T.transform("EPSG:4326", "EPSG:3857", lon, lat)
    ux, uy = T.transform("EPSG:3857", "EPSG:32631", mx, my)
    ux2, uy2 = T.transform("EPSG:4326", "EPSG:32631", lon, lat)
    np.testing.assert_allclose(ux, ux2, atol=1e-6)
    np.testing.assert_allclose(uy, uy2, atol=1e-6)


def test_unknown_crs_raises():
    with pytest.raises(ValueError):
        T.transform("EPSG:4326", "EPSG:9999", np.array([0.0]),
                    np.array([0.0]))


def test_warp_through_utm_matches_single_array_oracle(spark):
    """End-to-end distributed warp 4326 -> UTM 31N == one-shot numpy warp
    with the same mesh (the new CT wired through the whole warp path)."""
    TILE = 16
    h, w = 2 * TILE, 2 * TILE
    yv, xv = np.mgrid[0:h, 0:w]
    arr = np.sin(xv / 5.0) * 20 + yv * 1.5 + 50.0
    src = GridSpec(x0=0.0, y0=8.0, dx=6.0 / w, dy=-8.0 / h,
                   width=w, height=h, tile=TILE)     # lon 0..6, lat 0..8
    dst = GridSpec(x0=166000.0, y0=884000.0, dx=(834000.0 - 166000.0) / w,
                   dy=-880000.0 / h, width=w, height=h, tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    spec = warp.WarpSpec(src, "EPSG:4326", dst, "EPSG:32631",
                         resample="bilinear", fill=-1.0)
    got = tiles.tiles_to_raster(warp.warp(df, spec), tile=TILE)
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    dwx = dst.x0 + (jj + 0.5) * dst.dx
    dwy = dst.y0 + (ii + 0.5) * dst.dy
    swx, swy = T.transform("EPSG:32631", "EPSG:4326", dwx, dwy)
    sx = (swx - src.x0) / src.dx
    sy = (swy - src.y0) / src.dy
    want = warp._sample_point(arr, np.ones_like(arr, dtype=bool), 0, 0,
                              sx, sy, "bilinear", -1.0, use_mask=False)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
