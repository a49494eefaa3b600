"""Golden tests pinning our tile math to the reference formulas
(gdal2tiles.py GlobalMercator/QuadTree). The scalar oracle below is written
independently from the vectorized implementation; known constants come from
the TMS / Bing tile-system public specs."""

import math

import numpy as np
import pytest

from gdal_spark.core import tilemath as tm


def scalar_latlon_to_tile_tms(lat, lon, zoom):
    # independent scalar re-derivation of the TMS pyramid formulas
    origin = 2 * math.pi * 6378137 / 2.0
    mx = lon * origin / 180.0
    my = math.log(math.tan((90 + lat) * math.pi / 360.0)) / (math.pi / 180.0) * origin / 180.0
    res = (2 * math.pi * 6378137 / 256.0) / (2 ** zoom)
    px = (mx + origin) / res
    py = (my + origin) / res
    return int(math.ceil(px / 256.0) - 1), int(math.ceil(py / 256.0) - 1)


def test_constants():
    assert tm.ORIGIN_SHIFT == pytest.approx(20037508.342789244, abs=1e-6)
    assert tm.INITIAL_RESOLUTION == pytest.approx(156543.03392804062, abs=1e-8)


def test_known_meters():
    # 180,85 -> near the mercator corner
    mx, my = tm.latlon_to_meters(85.05112877980659, 180.0)
    assert float(mx) == pytest.approx(20037508.342789244, rel=1e-12)
    assert float(my) == pytest.approx(20037508.342789244, rel=1e-6)
    mx, my = tm.latlon_to_meters(0.0, 0.0)
    assert float(mx) == 0.0 and abs(float(my)) < 1e-6


def test_roundtrip_meters():
    rng = np.random.RandomState(42)
    lat = rng.uniform(-85, 85, 1000)
    lon = rng.uniform(-180, 180, 1000)
    mx, my = tm.latlon_to_meters(lat, lon)
    lat2, lon2 = tm.meters_to_latlon(mx, my)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)


def test_tile_vs_scalar_oracle():
    rng = np.random.RandomState(7)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-180, 180, 500)
    for zoom in (0, 1, 5, 12):
        tx, ty = tm.latlon_to_tile_tms(lat, lon, zoom)
        for i in range(len(lat)):
            stx, sty = scalar_latlon_to_tile_tms(lat[i], lon[i], zoom)
            assert (tx[i], ty[i]) == (stx, sty), (lat[i], lon[i], zoom)


def test_quadkey_bing_example():
    # Bing tile system doc example: XYZ tile (3,5) @ z3 -> quadkey "213"
    # convert XYZ->TMS: ty_tms = 2^3-1-5 = 2
    qk = tm.quadkey(np.array([3]), np.array([2]), 3)
    assert qk[0] == "213"


def test_quadkey_int_bijective():
    txs, tys = np.meshgrid(np.arange(64), np.arange(64))
    ids = tm.quadkey_int(txs.ravel(), tys.ravel(), 6)
    assert len(np.unique(ids)) == 64 * 64
    # zoom tag in high bits
    assert int(ids[0]) >> 58 == 6


def test_hilbert_bijective_and_local():
    xs, ys = np.meshgrid(np.arange(128, dtype=np.uint32), np.arange(128, dtype=np.uint32))
    h = tm.hilbert_u32(xs.ravel(), ys.ravel())
    assert len(np.unique(h)) == 128 * 128
    assert int(tm.hilbert_u32(np.uint32(0), np.uint32(0))) == 0


def test_tile_bounds_roundtrip():
    minx, miny, maxx, maxy = tm.tile_bounds_meters(0, 0, 0)
    assert float(minx) == pytest.approx(-tm.ORIGIN_SHIFT)
    assert float(maxx) == pytest.approx(tm.ORIGIN_SHIFT)
    assert float(maxy - miny) == pytest.approx(2 * tm.ORIGIN_SHIFT)


def test_cover_envelope():
    tiles = tm.cover_envelope_xyz(-1.0, -1.0, 1.0, 1.0, 2)
    # small box around origin at z2 covers tiles (1,1),(2,1),(1,2),(2,2)
    assert set(tiles) == {(1, 1), (2, 1), (1, 2), (2, 2)}


def test_zoom_for_pixel_size():
    assert tm.zoom_for_pixel_size(200000.0) == 0
    assert tm.zoom_for_pixel_size(tm.resolution(5) * 1.01) == 4
