"""Hillshade variants (combined / multidirectional / Igor) and
Zevenbergen-Thorne gradients: per-pixel transcriptions of the reference
formulas (apps/gdaldem_lib.cpp:690-1219) vs the distributed halo stencil
on a random DEM that spans tile boundaries."""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.raster.dem import dem_op
from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster

ALT, AZ = 40.0, 300.0


def _win(pad, y, x):
    """afWin ordering: rows of the 3x3 window, [0 1 2 / 3 4 5 / 6 7 8]."""
    return pad[y:y + 3, x:x + 3].ravel()


def _grad(w, alg):
    if alg == "zt":
        return (w[3] - w[5]), (w[7] - w[1]), 1.0 / 2.0
    x = (w[0] + 2 * w[3] + w[6]) - (w[2] + 2 * w[5] + w[8])
    y = (w[6] + 2 * w[7] + w[8]) - (w[0] + 2 * w[1] + w[2])
    return x, y, 1.0 / 8.0


def _expected(dem, op, alg="horn"):
    pad = np.pad(dem, 1, mode="edge")
    out = np.zeros_like(dem, dtype=np.float64)
    alt, az = math.radians(ALT), math.radians(AZ)
    for yy in range(dem.shape[0]):
        for xx in range(dem.shape[1]):
            w = _win(pad, yy, xx)
            gx, gy, zs = _grad(w, alg)
            a, b = gx * zs, gy * zs        # x*z_scaled, y*z_scaled
            q = a * a + b * b
            if op == "combined":
                cang = math.acos(max(-1.0, min(1.0, (
                    math.sin(alt) - (b * math.cos(az) * math.cos(alt)
                                     - a * math.sin(az) * math.cos(alt)))
                    / math.sqrt(1.0 + q))))
                cang = 1 - cang * math.atan(math.sqrt(q)) \
                    / ((math.pi / 2) ** 2)
                out[yy, xx] = 1.0 if cang <= 0 else 1.0 + 254.0 * cang
            elif op == "multidirectional":
                if q == 0.0:
                    out[yy, xx] = 1.0 + 254.0 * math.sin(alt)
                    continue
                c225 = math.cos(math.radians(225.0))
                sa, ca = math.sin(alt), math.cos(alt)
                v = [max(0.0, 127.0 * (sa + (a - b) * c225 * ca)),
                     max(0.0, 127.0 * (sa - a * ca)),
                     max(0.0, 127.0 * (sa + (a + b) * c225 * ca)),
                     max(0.0, 127.0 * (sa - b * ca))]
                wgt = [0.5 * q - a * b, a * a,
                       q - (0.5 * q - a * b), b * b]
                out[yy, xx] = 1.0 + sum(wi * vi for wi, vi in zip(wgt, v)) \
                    / q / math.sqrt(1.0 + q)
            elif op == "igor":
                # reference dx is right-minus-left = -gx; aspect =
                # atan2(dy, -dx) = atan2(gy, gx)
                aspect = math.atan2(gy, gx)
                slope_deg = math.degrees(math.atan(math.hypot(a, b)))
                t = math.fmod(1.5 * math.pi - az, 2 * math.pi)
                if t < 0:
                    t += 2 * math.pi
                d = abs((aspect % (2 * math.pi)) - t)
                if d > math.pi:
                    d = 2 * math.pi - d
                out[yy, xx] = 255.0 * (1.0 - (slope_deg / 90.0)
                                       * (1.0 - d / math.pi))
            elif op == "slope":
                out[yy, xx] = math.degrees(math.atan(math.sqrt(q)))
    return out


@pytest.fixture(scope="module")
def dem():
    rng = np.random.RandomState(7)
    return np.round(rng.uniform(0.0, 30.0, (16, 16)), 3)


def _run(spark, dem_arr, op, alg="horn"):
    t = raster_to_tiles(spark, dem_arr, tile=8)
    out = dem_op(t, op, tile=8, altitude=ALT, azimuth=AZ, alg=alg)
    return tiles_to_raster(out, tile=8)[:16, :16]


def test_hillshade_combined_matches_reference_formula(spark, dem):
    np.testing.assert_allclose(_run(spark, dem, "hillshade_combined"),
                               _expected(dem, "combined"), atol=1e-9)


def test_hillshade_multidirectional_matches(spark, dem):
    np.testing.assert_allclose(
        _run(spark, dem, "hillshade_multidirectional"),
        _expected(dem, "multidirectional"), atol=1e-9)


def test_hillshade_igor_matches(spark, dem):
    np.testing.assert_allclose(_run(spark, dem, "hillshade_igor"),
                               _expected(dem, "igor"), atol=1e-9)


def test_zt_slope_and_variants(spark, dem):
    np.testing.assert_allclose(_run(spark, dem, "slope", alg="zt"),
                               _expected(dem, "slope", alg="zt"),
                               atol=1e-9)
    np.testing.assert_allclose(
        _run(spark, dem, "hillshade_combined", alg="zt"),
        _expected(dem, "combined", alg="zt"), atol=1e-9)
    np.testing.assert_allclose(
        _run(spark, dem, "hillshade_igor", alg="zt"),
        _expected(dem, "igor", alg="zt"), atol=1e-9)


def test_flat_plane_closed_forms(spark):
    flat = np.full((8, 8), 5.0)
    md = _run(spark, flat, "hillshade_multidirectional")
    np.testing.assert_allclose(md, 1.0 + 254.0 * math.sin(math.radians(ALT)))
    cm = _run(spark, flat, "hillshade_combined")
    np.testing.assert_allclose(cm, 255.0)
    ig = _run(spark, flat, "hillshade_igor")
    np.testing.assert_allclose(ig, 255.0)


def test_slope_percent_and_aspect_trig(spark, dem):
    pct = _run(spark, dem, "slope_percent")
    deg = _run(spark, dem, "slope")
    # percent = 100 * tan(slope_degrees)
    np.testing.assert_allclose(pct, 100.0 * np.tan(np.radians(deg)),
                               atol=1e-9)
    trig = _run(spark, dem, "aspect_trig")
    assert np.nanmin(trig) >= 0.0 and np.nanmax(trig) < 360.0


def test_aspect_trig_flat_is_nan(spark):
    flat = np.full((8, 8), 3.0)
    out = _run(spark, flat, "aspect_trig")
    assert np.isnan(out).all()
