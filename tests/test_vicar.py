"""VICAR source/sink: the reference autotest checksum table
(autotest/gdrivers/vicar.py read_datatypes_lists) across dtypes,
orgs, endiannesses and VAX floats; label tokenizer; roundtrip."""

import numpy as np
import pytest

from gdal_spark.core.checksum import gdal_checksum
from gdal_spark.raster.tiles import TILE_SCHEMA, decode_px, encode_px
from gdal_spark.sources import vicar as V

FIX = "/root/reference/autotest/gdrivers/data/vicar"

CASES = [("vicar_byte", 129), ("vicar_int16", 129),
         ("vicar_bigendian_int16", 129), ("vicar_int32", 129),
         ("vicar_float32_bsq", 123), ("vicar_float32_bil", 123),
         ("vicar_float32_bip", 123), ("vicar_bigendian_float32", 129),
         ("vicar_float64", 129), ("vicar_vax_float32", 129),
         ("vicar_vax_float64", 129)]


def _assemble(t, m, tile):
    img = np.zeros((m["height"], m["width"]))
    for r in t.where("band = 1").collect():
        arr = decode_px(r.px, r.dtype, tile)
        y0, x0 = r.tile_y * tile, r.tile_x * tile
        h = min(tile, m["height"] - y0)
        w = min(tile, m["width"] - x0)
        img[y0:y0 + h, x0:x0 + w] = arr[:h, :w]
    return img


@pytest.mark.parametrize("name,want", CASES,
                         ids=[c[0] for c in CASES])
def test_autotest_checksums(spark, name, want):
    t, m = V.read_vicar(spark, f"{FIX}/{name}.vic", tile=64)
    assert gdal_checksum(_assemble(t, m, 64)) == want


def test_label_tokenizer_quote_escape():
    toks = dict(V._tokenize(
        "A='it''s'  B=(1, 2)  C=3  D='x y'"))
    assert toks == {"A": "it's", "B": "(1, 2)", "C": "3", "D": "x y"}


def test_roundtrip(spark, tmp_path):
    rng = np.random.RandomState(2)
    img = rng.randint(-900, 900, (40, 52)).astype(np.float64)
    rows = []
    for ty in range(3):
        for tx in range(4):
            blk = np.zeros((16, 16))
            sub = img[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
            blk[:sub.shape[0], :sub.shape[1]] = sub
            rows.append((1, 0, tx, ty, "f8", None, bytes(encode_px(blk))))
    t = spark.createDataFrame(rows, TILE_SCHEMA)
    p = str(tmp_path / "rt.vic")
    V.write_vicar(t, p, samples=52, lines=40, dtype="i2", tile=16)
    lbl = V.parse_vicar_label(p)
    assert lbl["LBLSIZE"] % lbl["RECSIZE"] == 0     # format invariant
    back, m = V.read_vicar(spark, p, tile=16)
    assert np.array_equal(_assemble(back, m, 16),
                          img.astype(np.int16).astype(np.float64))
