"""SDTS DEM over the generic ISO 8211 engine — the reference autotest
golden checksum 61672 + exact geotransform + TITLE on the truncated
ALANSON quad, DDF grammar units, and the five-module writer round
trip."""

import os

import numpy as np
import pandas as pd
import pytest

from gdal_spark.core.checksum import gdal_checksum
from gdal_spark.core.iso8211 import DDFModule, parse_format
from gdal_spark.raster.tiles import TILE_SCHEMA, decode_px, encode_px
from gdal_spark.sources.sdts import parse_header, read_sdts, write_sdts

FIX = ("/root/reference/autotest/gdrivers/data/"
       "STDS_1107834_truncated/1107CATD.DDF")

pytestmark = pytest.mark.skipif(not os.path.exists(FIX),
                                reason="reference fixtures absent")


def _assemble(spark, catd, tile=256):
    meta = parse_header(catd)
    W, H = meta["width"], meta["height"]
    full = np.full((H, W), -32766.0)
    for r in read_sdts(spark, catd, tile=tile)[0].collect():
        arr = decode_px(r.px, r.dtype, tile)
        y0, x0 = r.tile_y * tile, r.tile_x * tile
        hh, ww = min(tile, H - y0), min(tile, W - x0)
        full[y0:y0 + hh, x0:x0 + ww] = arr[:hh, :ww]
    return meta, full


def test_reference_golden_checksum(spark):
    meta, full = _assemble(spark, FIX)
    assert gdal_checksum(full) == 61672
    assert meta["gt"] == (666015.0, 30.0, 0.0, 5040735.0, 0.0, -30.0)
    assert meta["title"] == "ALANSON, MI-24000"


def test_iso8211_format_controls():
    assert parse_format("(A(4),2I(6),B(16))") == \
        [("A", 4), ("I", 6), ("I", 6), ("B", 2)]
    assert parse_format("(A,I,R)") == [("A", None), ("I", None),
                                       ("R", None)]
    assert parse_format("(3(A(2),I(1)))") == \
        [("A", 2), ("I", 1)] * 3


def test_iso8211_reused_leaders():
    """CEL0 uses a leader-id 'R' stream: one leader, bare field areas."""
    cell = os.path.join(os.path.dirname(FIX), "1107CEL0.DDF")
    rows = list(DDFModule(cell))
    assert len(rows) == 25
    assert all(len(r["CVLS"]) == 339 for r in rows)
    assert rows[0]["CELL"][0]["ROWI"] == 1
    assert rows[-1]["CELL"][0]["ROWI"] == 25


def test_write_read_roundtrip_exact(spark, tmp_path):
    W, H, t = 100, 60, 32
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
    gt = (666000.0, 30.0, 0.0, 5040750.0, 0.0, -30.0)
    catd = write_sdts(df, str(tmp_path / "x"), W, H, tile=t, gt=gt)
    meta, back = _assemble(spark, catd, tile=t)
    assert meta["gt"] == gt
    assert (meta["width"], meta["height"]) == (W, H)
    assert np.array_equal(back.astype(np.int16), full)
