"""USGS ASCII DEM driver — reference autotest golden checksums
(autotest/gdrivers/usgsdem.py: 1583 / 53864 / 61424 with their
geotransforms), the oddball A-record variants, and the distributed
writer round trip."""

import os

import numpy as np
import pandas as pd
import pytest

from gdal_spark.core.checksum import gdal_checksum
from gdal_spark.raster.tiles import TILE_SCHEMA, decode_px, encode_px
from gdal_spark.sources.usgsdem import (parse_header, read_usgsdem,
                                        write_usgsdem)

FIXDIR = "/root/reference/autotest/gdrivers/data/usgsdem"

pytestmark = pytest.mark.skipif(not os.path.isdir(FIXDIR),
                                reason="reference fixtures absent")


def _assemble(spark, path, tile=256):
    meta = parse_header(path)
    nx, ny = meta["nx"], meta["ny"]
    full = np.full((ny, nx), -32767, np.float64)
    for r in read_usgsdem(spark, path, tile=tile).collect():
        arr = decode_px(r.px, r.dtype, tile)
        y0, x0 = r.tile_y * tile, r.tile_x * tile
        h, w = min(tile, ny - y0), min(tile, nx - x0)
        if h > 0 and w > 0:
            full[y0:y0 + h, x0:x0 + w] = arr[:h, :w]
    return meta, full


@pytest.mark.parametrize("name,checksum,gt", [
    ("022gdeme_truncated", 1583,
     (-67.00041667, 0.00083333, 0.0, 50.000416667, 0.0, -0.00083333)),
    ("114p01_0100_deme_truncated.dem", 53864,
     (-136.25010416667, 0.000208333, 0.0, 59.25010416667, 0.0,
      -0.000208333)),
    ("39079G6_truncated.dem", 61424,
     (606855.0, 30.0, 0.0, 4414605.0, 0.0, -30.0)),
])
def test_reference_golden_checksums(spark, name, checksum, gt):
    meta, full = _assemble(spark, os.path.join(FIXDIR, name))
    assert gdal_checksum(full) == checksum
    for a, b in zip(meta["gt"], gt):
        assert abs(a - b) < 1e-7


@pytest.mark.parametrize("name,start", [
    ("39109h1_truncated.dem", 893),
    ("4619old_truncated.dem", 1024),
    ("fema06-140cm_2995441b_truncated.dem", 918),
    ("record_1025_ending_with_linefeed.dem", 1025),
    ("usgsdem_with_extra_values_at_end_of_profile.dem", 1024),
    ("usgsdem_with_spaces_after_byte_864.dem", 1024),
])
def test_a_record_variants_open(spark, name, start):
    path = os.path.join(FIXDIR, name)
    meta = parse_header(path)
    assert meta["start"] == start
    assert read_usgsdem(spark, path).count() > 0


def test_write_read_roundtrip_exact(spark, tmp_path):
    W = H = 70
    t = 32
    rng = np.random.RandomState(5)
    full = rng.randint(-400, 5000, size=(H, W)).astype(np.int16)
    rows = []
    for ty in range(-(-H // t)):
        for tx in range(-(-W // t)):
            blk = np.full((t, t), -32767, np.int16)
            sub = full[ty * t:(ty + 1) * t, tx * t:(tx + 1) * t]
            blk[:sub.shape[0], :sub.shape[1]] = sub
            rows.append((1, 0, tx, ty, "i2", -32767.0, encode_px(blk)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in TILE_SCHEMA.fields]),
        TILE_SCHEMA)
    path = str(tmp_path / "rt.dem")
    write_usgsdem(df, path, W, H, tile=t, x0=-100.0, y_top=41.0,
                  dx=1 / 1200, dy=1 / 1200, geographic=True)
    meta = parse_header(path)
    assert (meta["nx"], meta["ny"]) == (W, H)
    assert abs(meta["gt"][0] - (-100.0)) < 1e-9
    assert abs(meta["gt"][3] - 41.0) < 1e-9
    back = np.full((H, W), -32767, np.int16)
    for r in read_usgsdem(spark, path, tile=t).collect():
        arr = decode_px(r.px, r.dtype, t)
        y0, x0 = r.tile_y * t, r.tile_x * t
        h, w = min(t, H - y0), min(t, W - x0)
        back[y0:y0 + h, x0:x0 + w] = arr[:h, :w]
    assert np.array_equal(back, full)
    # file is 1024-block aligned with a correct A record
    assert os.path.getsize(path) % 1024 == 0
