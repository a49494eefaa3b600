"""From-scratch HDF5 reader — reference autotest golden checksums
(autotest/gdrivers/hdf5.py: u8be 135, groups 18, netCDF-4 chunked x 231,
complex f32 523 / f64 511), chunk filters (shuffle + deflate decode of
byte.tif content, 4672 after the netCDF bottom-up flip), and the
classic-format writer round trip."""

import os

import numpy as np
import pandas as pd
import pytest

from gdal_spark.core.checksum import gdal_checksum
from gdal_spark.raster.tiles import TILE_SCHEMA, decode_px, encode_px
from gdal_spark.sources.hdf5 import (HDF5File, read_dataset, read_hdf5,
                                     write_hdf5)

FIXDIR = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(FIXDIR),
                                reason="reference fixtures absent")


@pytest.mark.parametrize("rel,ds,checksum", [
    ("hdf5/u8be.h5", "/TestArray", 135),          # big-endian u8
    ("hdf5/groups.h5", "/MyGroup/dset1", 18),     # nested groups, >i4
    ("hdf5/complex.h5", "/f32", 523),             # compound -> complex
    ("hdf5/complex.h5", "/f64", 511),
])
def test_reference_golden_checksums(rel, ds, checksum):
    arr = read_dataset(HDF5File(os.path.join(FIXDIR, rel)), ds)
    assert gdal_checksum(arr) == checksum


def test_netcdf4_chunked_dataset():
    # autotest test_hdf5_single_dim: HDF5:byte_chunked_multiple.nc://x
    h = HDF5File(os.path.join(FIXDIR, "netcdf/byte_chunked_multiple.nc"))
    x = read_dataset(h, "/x").reshape(1, -1)
    assert x.shape == (1, 20)
    assert gdal_checksum(x) == 231
    # Band1 is chunked byte.tif content stored bottom-up
    band = read_dataset(h, "/Band1")
    assert gdal_checksum(band[::-1]) == 4672


def test_shuffle_deflate_filters():
    h = HDF5File(os.path.join(FIXDIR, "hdf5/deflate.h5"))
    info = h.datasets["/Band1"]
    assert info["layout"][0] == "chunked"
    assert set(info["filters"]) == {1, 2}        # deflate + shuffle
    band = read_dataset(h, "/Band1")
    assert gdal_checksum(band[::-1]) == 4672     # byte.tif content


def test_recursive_groups_terminate():
    h = HDF5File(os.path.join(FIXDIR, "hdf5/recursive_groups.h5"))
    assert isinstance(h.datasets, dict)          # no infinite loop


def test_spark_chunked_read(spark):
    path = os.path.join(FIXDIR, "hdf5/deflate.h5")
    tiles, h = read_hdf5(spark, path, "/Band1", tile=256)
    got = np.zeros((20, 20))
    for r in tiles.collect():
        arr = decode_px(r.px, r.dtype, 256)
        got[:20, :20] = arr[:20, :20]
    assert gdal_checksum(got[::-1]) == 4672


def test_write_read_roundtrip_exact(spark, tmp_path):
    W, H, t = 100, 80, 32
    rng = np.random.RandomState(5)
    full = rng.randint(-9000, 9000, size=(H, W)).astype(np.int16)
    rows = []
    for ty in range(-(-H // t)):
        for tx in range(-(-W // t)):
            blk = np.zeros((t, t), np.int16)
            sub = full[ty * t:(ty + 1) * t, tx * t:(tx + 1) * t]
            blk[:sub.shape[0], :sub.shape[1]] = sub
            rows.append((1, 0, tx, ty, "i2", None, encode_px(blk)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in TILE_SCHEMA.fields]),
        TILE_SCHEMA)
    path = str(tmp_path / "rt.h5")
    write_hdf5(df, path, W, H, tile=t)
    h = HDF5File(path)
    assert h.datasets["/Band1"]["shape"] == [H, W]
    assert np.array_equal(read_dataset(h, "/Band1"), full)


def test_multi_gb_file_opens_with_bounded_metadata_reads(spark, tmp_path):
    """Round-5 scale contract: a 4 GiB HDF5 opens driver-side through
    the vsi.PagedReader seam touching only superblock/node pages —
    bytes_fetched stays header-sized, never f.read()-the-world."""
    path = str(tmp_path / "big.h5")
    w, h = 32768, 65536                     # 32768*65536*2 B = 4 GiB
    tiles = spark.createDataFrame(
        pd.DataFrame([(1, 0, 0, 0, "float64", None,
                       encode_px(np.ones((256, 256))))],
                     columns=[f.name for f in TILE_SCHEMA.fields]),
        TILE_SCHEMA)
    write_hdf5(tiles, path, w, h, name="big", np_dtype="<i2")
    assert os.path.getsize(path) >= 4 * 1024 ** 3
    hd = HDF5File(path)
    assert "/big" in hd.datasets
    assert hd.datasets["/big"]["shape"] == [h, w]
    assert hd.buf.bytes_fetched < 1 * 1024 * 1024


def test_multidim_long_format(spark, tmp_path):
    """4-D contiguous fixture: every (d0, d1) slice exact."""
    import numpy as np
    from gdal_spark.raster.tiles import decode_px
    from gdal_spark.sources.hdf5 import read_hdf5_multidim, write_hdf5_nd
    t, z, h, w = 3, 2, 37, 41
    tt, zz, yy, xx = np.meshgrid(np.arange(t), np.arange(z),
                                 np.arange(h), np.arange(w),
                                 indexing="ij")
    arr = ((tt * 1000 + zz * 500 + yy * 41 + xx) % 997).astype("<i4")
    p = str(tmp_path / "md4.h5")
    write_hdf5_nd(arr, p, "temp")
    tiles, hdf = read_hdf5_multidim(spark, p, tile=64)
    rows = tiles.collect()
    assert len(rows) == t * z
    for r in rows:
        a = decode_px(r.px, r.dtype, 64)[:h, :w]
        assert np.array_equal(a, arr[r.d0, r.d1])


def test_multidim_chunked_hdfeos(spark):
    """3-D chunked (deflate) HDFEOS autotest fixture: multidim slices
    match the whole-array driver decode."""
    import numpy as np
    from gdal_spark.raster.tiles import decode_px
    from gdal_spark.sources.hdf5 import (HDF5File, read_dataset,
                                         read_hdf5_multidim)
    f = os.path.join(FIXDIR, "hdf5/dummy_HDFEOS_swath_chunked.h5")
    ds = "/HDFEOS/SWATHS/MySwath/Data Fields/MyDataField"
    full = read_dataset(HDF5File(f), ds)
    tiles, _ = read_hdf5_multidim(spark, f, ds, tile=64)
    rows = tiles.collect()
    assert {r.d0 for r in rows} == set(range(full.shape[0]))
    for r in rows:
        assert r.d1 is None
        a = decode_px(r.px, r.dtype, 64)
        es = full[r.d0][r.tile_y * 64:(r.tile_y + 1) * 64,
                        r.tile_x * 64:(r.tile_x + 1) * 64]
        assert np.array_equal(a[:es.shape[0], :es.shape[1]], es)


def test_unallocated_dataset_reads_fill(spark):
    """UNDEF-address contiguous dataset (fwhm.h5) = fill value 0."""
    import numpy as np
    from gdal_spark.raster.tiles import decode_px
    from gdal_spark.sources.hdf5 import read_hdf5_multidim
    f = os.path.join(FIXDIR, "hdf5/fwhm.h5")
    tiles, _ = read_hdf5_multidim(spark, f, "/MyDataField", tile=64)
    for r in tiles.collect():
        assert decode_px(r.px, r.dtype, 64).sum() == 0
