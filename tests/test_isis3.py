"""ISIS3 cube source/sink: autotest checksum pins (tiled + detached
band-sequential), PVL parser, verbatim-tile roundtrip."""

import numpy as np

from gdal_spark.core.checksum import gdal_checksum
from gdal_spark.raster.tiles import TILE_SCHEMA, decode_px, encode_px
from gdal_spark.sources import isis3 as I

FIX = "/root/reference/autotest/gdrivers/data/isis3"


def _assemble(t, m):
    ts = m["tile"]
    img = np.zeros((m["height"], m["width"]))
    for r in t.where("band = 1").collect():
        arr = decode_px(r.px, r.dtype, ts)
        y0, x0 = r.tile_y * ts, r.tile_x * ts
        h = min(ts, m["height"] - y0)
        w = min(ts, m["width"] - x0)
        img[y0:y0 + h, x0:x0 + w] = arr[:h, :w]
    return img


def test_tiled_cube_checksum(spark):
    # autotest/gdrivers/isis.py:78
    t, m = I.read_isis3(spark, f"{FIX}/isis3_unit_test.cub")
    assert m["format"] == "TILE" and m["tile"] == 128
    assert round(m["scale"], 6) == 0.250065
    assert gdal_checksum(_assemble(t, m)) == 42403


def test_detached_bsq_checksum(spark):
    # autotest/gdrivers/isis.py:53
    t, m = I.read_isis3(spark, f"{FIX}/isis3_detached.lbl")
    assert m["format"] == "BANDSEQUENTIAL"
    assert gdal_checksum(_assemble(t, m)) == 9978


def test_pvl_parser():
    lbl = I.parse_pvl("""Object = IsisCube
  Object = Core
    StartByte = 65537
    Group = Pixels
      Type = SignedWord
      Center = 700 <NANOMETERS>
      List = (1, 2,
              3)
    End_Group
  End_Object
End_Object
End
Ignored = 1
""")
    core = lbl["IsisCube"]["Core"]
    assert core["StartByte"] == 65537
    assert core["Pixels"]["Type"] == "SignedWord"
    assert core["Pixels"]["Center"] == 700          # unit stripped
    assert "3)" in core["Pixels"]["List"]           # continuation joined
    assert "Ignored" not in lbl


def test_roundtrip(spark, tmp_path):
    rng = np.random.RandomState(6)
    img = rng.randint(-2000, 2000, (48, 48)).astype(np.float64)
    rows = []
    for ty in range(3):
        for tx in range(3):
            blk = img[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
            rows.append((1, 0, tx, ty, "f8", None, bytes(encode_px(blk))))
    t = spark.createDataFrame(rows, TILE_SCHEMA)
    p = str(tmp_path / "o.cub")
    I.write_isis3(t, p, samples=48, lines=48, dtype="i2", tile=16,
                  base=10.0, multiplier=2.0)
    back, m = I.read_isis3(spark, p)
    assert m["format"] == "TILE" and m["add_offset"] == 10.0
    assert np.array_equal(_assemble(back, m),
                          img.astype(np.int16).astype(np.float64))
