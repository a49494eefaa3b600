"""PDS3 planetary raster: ODL parser, pointer forms, reference-fixture
checksum pin, write/read roundtrip."""

import numpy as np
import pytest

from gdal_spark.sources import pds as P

FIX = "/root/reference/autotest/gdrivers/data/pds/LDEM_4.LBL"


def test_odl_parser_nesting_and_comments():
    lbl = P.parse_odl("""PDS_VERSION_ID = "PDS3"
/* a comment
   spanning lines */
RECORD_BYTES = 2880
NOTE = "a quoted
multi-line value"
SET = {"A","B"}
OBJECT = IMAGE
  LINES = 720
  SAMPLE_TYPE = LSB_INTEGER
END_OBJECT = IMAGE
END
IGNORED = 1
""")
    assert lbl["RECORD_BYTES"] == 2880
    assert "multi-line" in lbl["NOTE"]
    assert lbl["IMAGE"]["LINES"] == 720
    assert "IGNORED" not in lbl


def test_pointer_forms(tmp_path):
    lp = str(tmp_path / "x.lbl")
    open(lp, "w").write("")
    open(tmp_path / "d.img", "wb").write(b"")
    assert P._resolve_pointer(5, lp, 100) == (lp, 400)
    assert P._resolve_pointer("5 <BYTES>", lp, 100) == (lp, 4)
    f, off = P._resolve_pointer('("d.img", 3)', lp, 100)
    assert f.endswith("d.img") and off == 200
    f, off = P._resolve_pointer('("d.img", 3 <BYTES>)', lp, 100)
    assert off == 2
    f, off = P._resolve_pointer('"d.img"', lp, 100)
    assert off == 0


def test_reference_fixture_window_checksum(spark):
    # autotest/gdrivers/pds.py:173 — checksum 50938 over (0,0,1440,2);
    # the fixture .IMG is truncated, missing rows zero-fill
    from gdal_spark.core.checksum import gdal_checksum
    from gdal_spark.raster.tiles import decode_px
    t, m = P.read_pds(spark, FIX, tile=256)
    assert (m["width"], m["height"]) == (1440, 720)
    assert m["scale"] == 0.5 and m["add_offset"] == 1737400.0
    img = np.zeros((2, 1440), np.int16)
    for r in t.where("tile_y = 0").collect():
        arr = decode_px(r.px, r.dtype, 256)
        x0 = r.tile_x * 256
        w = min(256, 1440 - x0)
        img[:, x0:x0 + w] = arr[:2, :w]
    assert gdal_checksum(img) == 50938


def test_write_read_roundtrip(spark, tmp_path):
    from gdal_spark.raster.tiles import TILE_SCHEMA, decode_px, encode_px
    rng = np.random.RandomState(4)
    img = rng.randint(-500, 500, (32, 32)).astype(np.float64)
    rows = []
    for ty in range(2):
        for tx in range(2):
            blk = img[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
            rows.append((1, 0, tx, ty, "f8", None, bytes(encode_px(blk))))
    t = spark.createDataFrame(rows, TILE_SCHEMA)
    stem = str(tmp_path / "o")
    P.write_pds(t, stem + ".LBL", samples=32, lines=32, dtype="i2",
                tile=16, scale=0.5, add_offset=100.0)
    back, meta = P.read_pds(spark, stem + ".LBL", tile=16)
    assert meta["scale"] == 0.5 and meta["add_offset"] == 100.0
    got = np.zeros((32, 32), np.int16)
    for r in back.collect():
        arr = decode_px(r.px, r.dtype, 16)
        got[r.tile_y * 16:(r.tile_y + 1) * 16,
            r.tile_x * 16:(r.tile_x + 1) * 16] = arr
    assert np.array_equal(got, img.astype(np.int16))


def test_isis2_fixture_checksum(spark):
    # autotest/gdrivers/isis2.py:27 — checksum 382 (truncated payload)
    from gdal_spark.core.checksum import gdal_checksum
    from gdal_spark.raster.tiles import decode_px
    t, m = P.read_isis2(
        spark, "/root/reference/autotest/gdrivers/data/isis2/"
               "arvidson_original_truncated.cub", tile=64)
    assert (m["width"], m["height"]) == (43, 1)
    assert m["dtype"] == "f4"
    img = np.zeros((1, 43))
    for r in t.where("band = 1").collect():
        arr = decode_px(r.px, r.dtype, 64)
        img[:1, :43] = arr[:1, :43]
    assert gdal_checksum(img) == 382
