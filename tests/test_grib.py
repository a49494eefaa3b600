"""GRIB1 source tests (sources/grib.py): IBM-370 float codec, simple
packing round-trip within quantization bounds, bit-exact centi-scaled
integers, message scan, tile-table read, unsupported-feature errors."""

import numpy as np
import pytest

from gdal_spark.raster.tiles import decode_px
from gdal_spark.sources import grib as G


def test_ibm_float_roundtrip():
    for v in [0.0, 1.0, -1.0, 273.15, -273.15, 101325.0, 1.234e-4,
              -9.81e6, 16.0, 1.0 / 16.0]:
        r = G.ibm_to_float(G.float_to_ibm(v))
        assert v == 0.0 and r == 0.0 or \
            abs(r - v) / max(abs(v), 1e-30) < 1e-6
    # integers below 2^24 are exact
    for v in [1.0, 20000.0, 16777215.0]:
        assert G.ibm_to_float(G.float_to_ibm(v)) == v


def test_message_roundtrip_quantization_bound(tmp_path):
    nj, ni = 37, 41
    y, x = np.mgrid[0:nj, 0:ni]
    t850 = 250.0 + 0.37 * x - 0.21 * y + 0.01 * ((x * y) % 7)
    path = str(tmp_path / "t.grib")
    G.write_grib([t850], path, nbits=12, d_scale=2)
    (off, ln), = G.scan_messages(path)
    vals, meta = G.parse_message(open(path, "rb").read()[off:off + ln])
    assert meta["ni"] == ni and meta["nj"] == nj
    assert meta["param"] == 11 and meta["level"] == 850
    assert meta["lat1"] == 60.0 and meta["lon2"] == 10.0
    assert np.abs(vals - t850).max() <= \
        2.0 ** meta["e_scale"] / 10 ** 2 + 1e-9


def test_centi_integer_fields_bit_exact(tmp_path):
    y, x = np.mgrid[0:37, 0:41]
    a = (((x * 3 + y * 7) % 400) + 20000) / 100.0
    path = str(tmp_path / "i.grib")
    G.write_grib([a], path, nbits=12, d_scale=2)
    (off, ln), = G.scan_messages(path)
    vals, _ = G.parse_message(open(path, "rb").read()[off:off + ln])
    assert np.array_equal(vals, a)


def test_spark_read_tiles(spark, tmp_path):
    y, x = np.mgrid[0:37, 0:41]
    fields = [(((b * 17 + x * 3 + y * 7) % 400) + 20000) / 100.0
              for b in (1, 2)]
    path = str(tmp_path / "m.grib")
    G.write_grib(fields, path)
    tiles, metas = G.read_grib(spark, path, tile=32)
    rows = tiles.collect()
    assert sorted({r.band for r in rows}) == [1, 2]
    for band, field in ((1, fields[0]), (2, fields[1])):
        rec = np.zeros((64, 64))
        for r in rows:
            if r.band == band:
                a = decode_px(r.px, r.dtype, 32)
                rec[r.tile_y * 32:(r.tile_y + 1) * 32,
                    r.tile_x * 32:(r.tile_x + 1) * 32] = a
        assert np.array_equal(rec[:37, :41], field)
    assert metas[0]["level"] == 850


def test_unsupported_features_raise(tmp_path):
    y, x = np.mgrid[0:5, 0:5]
    path = str(tmp_path / "e.grib")
    G.write_grib([x * 1.0], path)
    buf = bytearray(open(path, "rb").read())
    buf[7] = 2                                 # edition 2
    open(path, "wb").write(bytes(buf))
    with pytest.raises(ValueError):
        G.scan_messages(path)
