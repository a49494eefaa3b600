"""NetCDF classic source (sources/netcdf.py) vs the reference driver
(frmts/netcdf; autotest/gdrivers/netcdf.py fixtures)."""

import glob

import numpy as np
import pytest

from gdal_spark.core.checksum import gdal_checksum
from gdal_spark.sources.netcdf import (parse_netcdf_header, read_netcdf,
                                       write_netcdf)

NCDIR = "/root/reference/autotest/gdrivers/data/netcdf"


def test_bug636_tas_pinned_checksum():
    """autotest test_netcdf_1: NETCDF:bug636.nc:tas band 1 checksum
    31621 — pins header offsets, big-endian f4 decode and row order."""
    h = parse_netcdf_header(f"{NCDIR}/bug636.nc")
    v = h["vars"]["tas"]
    assert v["dims"] == ["latitude", "longitude"]
    assert v["shape"] == [64, 128]
    raw = open(f"{NCDIR}/bug636.nc", "rb").read()
    arr = np.frombuffer(raw, np.dtype(v["dtype"]), 64 * 128,
                        v["begin"]).reshape(64, 128)
    assert gdal_checksum(arr.astype(np.float64)) == 31621


def test_every_classic_fixture_header_parses():
    """All CDF-1/CDF-2 files in the reference corpus parse; the HDF5-
    backed netCDF-4 ones raise the documented 'not classic' error."""
    n_classic = 0
    for p in sorted(glob.glob(f"{NCDIR}/*.nc")):
        head = open(p, "rb").read(4)
        if head[:3] == b"CDF" and head[3] in (1, 2):
            h = parse_netcdf_header(p)
            assert h["dims"] and isinstance(h["gatts"], dict)
            n_classic += 1
        else:
            with pytest.raises(ValueError, match="classic"):
                parse_netcdf_header(p)
    assert n_classic >= 20


def test_cdf2_64bit_offsets():
    h = parse_netcdf_header(f"{NCDIR}/trmm-nc2.nc")
    assert h["version"] == 2
    assert h["vars"]["pcp"]["shape"] == [0, 40, 40]   # record variable


def test_attribute_fidelity():
    h = parse_netcdf_header(f"{NCDIR}/trmm.nc")
    v = h["vars"]["pcp"]
    assert v["atts"].get("_FillValue") is not None
    assert "latitude" in h["vars"] and "longitude" in h["vars"]


def test_spark_read_matches_local_decode(spark):
    t, meta = read_netcdf(spark, f"{NCDIR}/bug636.nc", var="tas", tile=32)
    from gdal_spark.raster.tiles import tiles_to_raster
    got = tiles_to_raster(t, tile=32)[:64, :128]
    assert meta["shape"] == (64, 128)
    assert meta["dims"] == ["latitude", "longitude"]
    assert gdal_checksum(got.astype(np.float64)) == 31621


def test_write_read_roundtrip_with_attrs(spark, tmp_path):
    from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster

    rng = np.random.RandomState(5)
    arr = rng.uniform(-50, 50, (40, 70))
    path = str(tmp_path / "cell.nc")
    write_netcdf(raster_to_tiles(spark, arr, tile=16), path,
                 width=70, height=40, var="elev", tile=16,
                 atts={"units": "m", "scale": [1.5]},
                 gatts={"title": "gdal_spark roundtrip"})
    h = parse_netcdf_header(path)
    assert [d for d, _n in h["dims"]] == ["y", "x"]
    assert dict(h["dims"])["x"] == 70
    assert h["vars"]["elev"]["atts"]["units"] == "m"
    assert h["gatts"]["title"] == "gdal_spark roundtrip"
    back, meta = read_netcdf(spark, path, var="elev", tile=16)
    np.testing.assert_allclose(tiles_to_raster(back, tile=16)[:40, :70],
                               arr)
