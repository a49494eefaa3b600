"""Zarr v2 store round-trip: chunk naming, zlib codec, metadata,
sparse-store fill_value reads."""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pytest

from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster
from gdal_spark.sources.zarr import read_zarr, write_zarr


def test_roundtrip_zlib(spark, tmp_path):
    arr = np.arange(256, dtype=np.float64).reshape(16, 16)
    t = raster_to_tiles(spark, arr, tile=8)
    path = str(tmp_path / "a.zarr")
    write_zarr(t, path, width=16, height=16, tile=8)
    meta = json.load(open(os.path.join(path, ".zarray")))
    assert meta["zarr_format"] == 2
    assert meta["shape"] == [16, 16] and meta["chunks"] == [8, 8]
    assert meta["dtype"] == "<f8"
    assert meta["compressor"] == {"id": "zlib", "level": 6}
    assert sorted(f for f in os.listdir(path) if not f.startswith(".")) \
        == ["0.0", "0.1", "1.0", "1.1"]
    # chunk bytes are standard zlib of C-order little-endian float64
    raw = zlib.decompress(open(os.path.join(path, "0.1"), "rb").read())
    np.testing.assert_array_equal(
        np.frombuffer(raw, "<f8").reshape(8, 8), arr[:8, 8:])
    out, meta2 = read_zarr(spark, path)
    assert meta2 == meta
    np.testing.assert_array_equal(tiles_to_raster(out, tile=8), arr)


def test_uncompressed_and_sparse_fill(spark, tmp_path):
    arr = np.ones((16, 16), dtype=np.float32) * 7.0
    t = raster_to_tiles(spark, arr, tile=8)
    path = str(tmp_path / "b.zarr")
    write_zarr(t, path, width=16, height=16, tile=8, compressor=None,
               fill_value=-5.0)
    os.unlink(os.path.join(path, "1.1"))       # sparse store
    out, meta = read_zarr(spark, path)
    assert meta["compressor"] is None
    got = tiles_to_raster(out, tile=8)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got[:8, :], arr[:8, :])
    np.testing.assert_array_equal(got[8:, 8:], np.full((8, 8), -5.0,
                                                       np.float32))


ZFIX = "/root/reference/autotest/gdrivers/data/zarr"


@pytest.mark.skipif(not os.path.isdir(ZFIX),
                    reason="reference fixtures absent")
def test_zarr_v3_cf1_golden(spark):
    """Zarr v3 (frmts/zarr/zarrv3array.cpp): the CF-convention
    byte_cf1.zr3 store decodes to the classic byte raster (checksum
    4672) with rows flipped per its ascending y coordinate, and the
    geotransform recovered from the x/y coordinate arrays equals
    byte.tif's."""
    from gdal_spark.core.checksum import gdal_checksum
    from gdal_spark.sources.zarr import read_zarr

    df, m = read_zarr(spark, os.path.join(ZFIX, "byte_cf1.zr3"))
    assert m["zarr_format"] == 3 and m["flipped_y"]
    assert m["geotransform"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0,
                                 -60.0)
    full = tiles_to_raster(df, tile=m["chunks"][0])[:20, :20]
    assert gdal_checksum(full) == 4672


@pytest.mark.skipif(not os.path.isdir(ZFIX),
                    reason="reference fixtures absent")
def test_zarr_v3_group_store_arrays(spark):
    """test.zr3 (autotest test_zarr_read_v3): /ar reads [1, 2]; the
    v2-key-encoded /marvin/android reads its 5x4 chunk."""
    from gdal_spark.raster.tiles import decode_px
    from gdal_spark.sources.zarr import list_zarr3_arrays, read_zarr

    store = os.path.join(ZFIX, "v3", "test.zr3")
    assert set(list_zarr3_arrays(store)) == {"/ar", "/marvin/android"}
    df, m = read_zarr(spark, store, array="/ar")
    r = df.collect()[0]
    assert decode_px(r.px, r.dtype, m["chunks"][0])[0, :2].tolist() \
        == [1, 2]
    df2, m2 = read_zarr(spark, store, array="/marvin/android")
    assert m2["shape"] == [5, 4]
    r2 = df2.collect()[0]
    assert decode_px(r2.px, r2.dtype, m2["chunks"][0])[:5, :4].min() == 1
