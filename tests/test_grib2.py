"""GRIB2 driver — reference autotest golden checksums
(autotest/gdrivers/grib.py), g2clib comunpack parity (complex packing +
spatial differencing + missing-value management), PNG packing through
the in-repo codec, bitmap semantics, unit normalization, and the
fixture writer round trip."""

import os

import numpy as np
import pytest

from gdal_spark.core.checksum import gdal_checksum
from gdal_spark.sources.grib2 import (parse_fields, read_grib2,
                                      scan_messages, write_grib2)

FIXDIR = "/root/reference/autotest/gdrivers/data/grib"

pytestmark = pytest.mark.skipif(not os.path.isdir(FIXDIR),
                                reason="reference fixtures absent")


def _field(path, msg=0, fi=0):
    msgs = scan_messages(path)
    with open(path, "rb") as f:
        f.seek(msgs[msg][0])
        return parse_fields(f.read(msgs[msg][1]))[fi]


@pytest.mark.parametrize("name,checksum", [
    ("ieee754_single.grb2", 4727),                  # template 5.4 f32
    ("ieee754_double.grb2", 4727),                  # template 5.4 f64
    ("simple_packing_nbits_zero_decimal_scaled.grb2", 5),   # 5.0 nbits=0
    ("png_nbits_zero_decimal_scaled.grb2", 5),      # 5.41 PNG
    ("spatial_differencing_order_1.grb2", 46650),   # 5.3 + missing mgmt 1
    ("gfs.t06z.pgrb2.1p0.grib2", 7674),             # global lat/lon
])
def test_reference_golden_checksums(name, checksum):
    grid, _meta = _field(os.path.join(FIXDIR, name))
    assert gdal_checksum(grid) == checksum


def test_one_one_geotransform():
    # autotest test_grib_read_geotransform_one_n_or_n_one (#5532)
    _grid, meta = _field(os.path.join(FIXDIR, "one_one.grib2"))
    assert meta["gt"] == (-114.25, 0.5, 0.0, 47.25, 0.0, -0.5)


def test_gfs_geotransform_untranslated():
    _grid, meta = _field(os.path.join(FIXDIR,
                                      "gfs.t06z.pgrb2.1p0.grib2"))
    want = (-0.125, 10.0, 0.0, 90.125, 0.0, -10.0)
    assert max(abs(a - b) for a, b in zip(meta["gt"], want)) < 1e-6


def test_two_bands_with_bitmap_nodata():
    # autotest asserts nodata == 9999 on both bands
    path = os.path.join(FIXDIR, "two_bands_with_bitmap.grib2")
    for msg in range(len(scan_messages(path))):
        grid, meta = _field(path, msg=msg)
        assert meta["nodata"] == 9999.0
        # the fixture's bitmap is all-ones (byte.tif has no nodata):
        # every cell present, none masked
        assert (grid != 9999.0).all()


def test_temperature_normalized_to_celsius():
    # GRIB_NORMALIZE_UNITS default: K -> C for temperature params
    grid, meta = _field(os.path.join(
        FIXDIR, "spatial_differencing_order_1.grb2"))
    assert meta.get("unit") == "C"
    valid = grid[grid != 9999.0]
    assert valid.min() > -90.0 and valid.max() < 60.0


def test_writer_reader_roundtrip_with_bitmap(tmp_path):
    y, x = np.mgrid[0:37, 0:41]
    a = (((17 + x * 3 + y * 7) % 400) + 20000) / 100.0
    bm = (x + y) % 5 != 0
    path = str(tmp_path / "t.grb2")
    write_grib2([a, a], path, bitmaps=[None, bm])
    g0, m0 = _field(path, 0)
    g1, _m1 = _field(path, 1)
    assert np.array_equal(g0, a)
    assert np.array_equal(g1[bm], a[bm])
    assert (g1[~bm] == 9999.0).all()
    assert m0["gt"] == (-0.25, 0.5, 0.0, 60.25, 0.0, -0.5)


def test_spark_read_multiband(spark, tmp_path):
    y, x = np.mgrid[0:20, 0:30]
    arrays = [((x + b * y) % 97).astype(np.float64) for b in (1, 2)]
    path = str(tmp_path / "m.grb2")
    write_grib2(arrays, path)
    tiles, metas = read_grib2(spark, path, tile=16)
    assert len(metas) == 2
    got = tiles.collect()
    bands = {r.band for r in got}
    assert bands == {1, 2}
