"""GIF source/sink: reference-fixture decode pins (giflib-encoded,
interlaced + progressive), LZW strip concatenation, full Spark trip."""

import numpy as np
import pytest

from gdal_spark.core.checksum import gdal_checksum
from gdal_spark.sources import gif as G

FIX = "/root/reference/autotest/gdrivers/data/gif"


def _decode_file(path):
    m = G.parse_gif(path)
    w, h = m["width"], m["height"]
    px = G.lzw_decode(m["lzw"], m["min_code"], w * h).reshape(h, w)
    if m["interlace"]:
        disp = np.empty_like(px)
        disp[G.deinterlace_order(h)] = px
        px = disp
    return px, m


@pytest.mark.parametrize("name,want,interlaced", [
    ("bug407", 57921, True),          # autotest/gdrivers/gif.py:48
    ("byte_with_xmp", 4672, False),   # classic byte.tif checksum (gif.py:186)
])
def test_reference_fixture_checksums(name, want, interlaced):
    px, m = _decode_file(f"{FIX}/{name}.gif")
    assert m["interlace"] == interlaced
    assert gdal_checksum(px) == want


def test_strip_concat_roundtrip():
    rng = np.random.RandomState(3)
    img = np.vstack([np.tile(np.arange(64, dtype=np.uint8), (20, 1)),
                     rng.randint(0, 256, (20, 64), dtype=np.uint8),
                     np.zeros((24, 64), np.uint8)])
    strips = [img[0:20].ravel(), img[20:40].ravel(), img[40:64].ravel()]
    payload = b"".join(G.lzw_encode_strip(s, 8, i == 2)
                       for i, s in enumerate(strips))
    dec = G.lzw_decode(payload, 8, img.size).reshape(img.shape)
    assert np.array_equal(dec, img)


def test_dict_overflow_clear_roundtrip():
    rng = np.random.RandomState(5)
    big = rng.randint(0, 256, 200000).astype(np.uint8)
    pl = G.lzw_encode_strip(big, 8, True)
    assert np.array_equal(G.lzw_decode(pl, 8, big.size), big)


def test_spark_write_read_roundtrip(spark, tmp_path):
    from gdal_spark.raster.tiles import TILE_SCHEMA, encode_px
    rng = np.random.RandomState(9)
    w = h = 48
    tile = 16
    img = rng.randint(0, 256, (h, w)).astype(np.uint8)
    rows = []
    for ty in range(3):
        for tx in range(3):
            blk = img[ty * tile:(ty + 1) * tile,
                      tx * tile:(tx + 1) * tile].astype(np.float64)
            rows.append((1, 0, tx, ty, "f8", None,
                         bytes(encode_px(blk))))
    t = spark.createDataFrame(rows, TILE_SCHEMA)
    p = str(tmp_path / "t.gif")
    G.write_gif(t, p, width=w, height=h, tile=tile)
    back, meta = G.read_gif(spark, p, tile=tile)
    assert meta["width"] == w and not meta["interlace"]
    got = np.zeros((h, w), np.uint8)
    from gdal_spark.raster.tiles import decode_px
    for r in back.collect():
        arr = decode_px(r.px, r.dtype, tile)
        got[r.tile_y * tile:(r.tile_y + 1) * tile,
            r.tile_x * tile:(r.tile_x + 1) * tile] = arr
    assert np.array_equal(got, img)


def test_transparent_nodata(tmp_path):
    import os
    # hand-write a 2x2 with transparency GCE, decode meta
    img = np.array([[1, 2], [3, 0]], np.uint8)
    pl = G.lzw_encode_strip(img.ravel(), 8, True)
    two = (2).to_bytes(2, "little")
    hdr = (b"GIF89a" + two + two + b"\xf7\x00\x00" + bytes(768)
           + bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])     # GCE, tindex 0
           + b"\x2C" + bytes(4) + two + two + b"\x00" + bytes([8]))
    body = b""
    i = 0
    while i < len(pl):
        chunk = pl[i:i + 255]
        body += bytes([len(chunk)]) + chunk
        i += 255
    path = str(tmp_path / "t.gif")
    with open(path, "wb") as f:
        f.write(hdr + body + b"\x00\x3B")
    m = G.parse_gif(path)
    assert m["transparent"] == 0
    px = G.lzw_decode(m["lzw"], m["min_code"], 4).reshape(2, 2)
    assert np.array_equal(px, img)
