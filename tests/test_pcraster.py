"""PCRaster CSF 2.0 driver — reference autotest golden checksum 4528 +
geotransform + nodata 255 on ldd.map (autotest/gdrivers/pcraster.py),
and the distributed writer round trip."""

import os

import numpy as np
import pytest

from gdal_spark.core.checksum import gdal_checksum
from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster
from gdal_spark.sources.pcraster import (parse_header, read_pcraster,
                                         write_pcraster)

LDD = "/root/reference/autotest/gdrivers/data/pcraster/ldd.map"

pytestmark = pytest.mark.skipif(not os.path.exists(LDD),
                                reason="reference fixtures absent")


def test_reference_golden_checksum(spark):
    # autotest pcraster.py test_pcraster_1: band 1 checksum 4528
    t, m = read_pcraster(spark, LDD, tile=64)
    assert (m["width"], m["height"]) == (80, 100)
    assert m["value_scale"] == 0xF0 and m["dt"] == "u1"  # VS_LDD UINT1
    full = tiles_to_raster(t, tile=64)[:100, :80]
    assert gdal_checksum(full) == 4528


def test_reference_georef_and_nodata():
    # autotest pcraster.py test_pcraster_2
    m = parse_header(LDD)
    assert m["geotransform"] == (182140.0, 10.0, 0.0, 327880.0, 0.0,
                                 -10.0)
    assert m["nodata"] == 255.0


@pytest.mark.parametrize("repr_,vals", [
    ("u1", np.arange(0, 200).reshape(10, 20) % 250),
    ("i4", (np.arange(0, 200).reshape(10, 20) * 7 - 300)),
    ("f4", np.linspace(-5.0, 5.0, 200).reshape(10, 20)),
])
def test_write_read_roundtrip_exact(spark, tmp_path, repr_, vals):
    arr = vals.astype(np.float64)
    path = str(tmp_path / f"rt_{repr_}.map")
    t = raster_to_tiles(spark, arr, tile=8)
    write_pcraster(t, path, width_px=20, height_px=10, tile=8,
                   cell_repr=repr_, xul=5.0, yul=100.0, cell=2.5)
    back, m = read_pcraster(spark, path, tile=8)
    assert m["geotransform"] == (5.0, 2.5, 0.0, 100.0, 0.0, -2.5)
    assert m["dt"] == repr_
    got = tiles_to_raster(back, tile=8)[:10, :20]
    np.testing.assert_allclose(got, arr.astype("<" + repr_)
                               .astype(np.float64), rtol=0, atol=0)
    # header min/max reflect the distributed aggregate
    assert m["min"] == pytest.approx(arr.astype("<" + repr_).min())
    assert m["max"] == pytest.approx(arr.astype("<" + repr_).max())
