"""BSB/KAP nautical chart driver — reference autotest golden checksum
30321 on all three rgbsmall variants (plain, explicit index table,
embedded line break / row-continuation records), the 4-bit chart, the
palette, and the two-phase distributed writer round trip."""

import os

import numpy as np
import pandas as pd
import pytest

from gdal_spark.core.checksum import gdal_checksum
from gdal_spark.raster.tiles import TILE_SCHEMA, decode_px, encode_px
from gdal_spark.sources.bsb import (parse_header, read_bsb, write_bsb)

FIXDIR = "/root/reference/autotest/gdrivers/data/bsb"

pytestmark = pytest.mark.skipif(not os.path.isdir(FIXDIR),
                                reason="reference fixtures absent")


def _assemble(spark, path, tile=256):
    meta = parse_header(path)
    W, H = meta["width"], meta["height"]
    full = np.zeros((H, W))
    for r in read_bsb(spark, path, tile=tile)[0].collect():
        arr = decode_px(r.px, r.dtype, tile)
        y0, x0 = r.tile_y * tile, r.tile_x * tile
        hh, ww = min(tile, H - y0), min(tile, W - x0)
        full[y0:y0 + hh, x0:x0 + ww] = arr[:hh, :ww]
    return meta, full


@pytest.mark.parametrize("name", [
    "rgbsmall.kap",                  # sequential offset discovery
    "rgbsmall_index.kap",            # explicit index table
    "rgbsmall_with_line_break.kap",  # row-continuation records
    "transverse_mercator.kap",
])
def test_reference_golden_checksum(spark, name):
    _meta, full = _assemble(spark, os.path.join(FIXDIR, name))
    assert gdal_checksum(full) == 30321


def test_4bit_chart_reads(spark):
    meta, full = _assemble(spark, os.path.join(FIXDIR,
                                               "australia4c.kap"))
    assert (meta["width"], meta["height"]) == (625, 480)
    assert meta["depth"] == 3
    assert full.max() < (1 << 3)
    assert len(meta["palette"]) > 0


def test_palette_parsed():
    meta = parse_header(os.path.join(FIXDIR, "rgbsmall.kap"))
    assert meta["depth"] == 7
    assert 1 in meta["palette"]
    assert all(0 <= c <= 255 for rgb in meta["palette"].values()
               for c in rgb)


def test_write_read_roundtrip_exact(spark, tmp_path):
    W, H, t = 100, 70, 32
    rng = np.random.RandomState(11)
    full = rng.randint(0, 100, size=(H, W)).astype(np.uint8)
    rows = []
    for ty in range(-(-H // t)):
        for tx in range(-(-W // t)):
            blk = np.zeros((t, t), np.uint8)
            sub = full[ty * t:(ty + 1) * t, tx * t:(tx + 1) * t]
            blk[:sub.shape[0], :sub.shape[1]] = sub
            rows.append((1, 0, tx, ty, "u1", None, encode_px(blk)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in TILE_SCHEMA.fields]),
        TILE_SCHEMA)
    path = str(tmp_path / "rt.kap")
    write_bsb(df, path, W, H, tile=t, depth=7)
    meta, back = _assemble(spark, path, tile=t)
    assert (meta["width"], meta["height"]) == (W, H)
    assert meta["offsets"] is not None       # index table valid
    assert np.array_equal(back.astype(np.uint8), full)
