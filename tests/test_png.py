"""PNG codec + Spark reader/writer (frmts/png; RFC 2083)."""

import struct
import zlib

import numpy as np
import pytest

from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster
from gdal_spark.sources.png import (_adler_combine, _chunk, _SIG,
                                    decode_png, encode_png, read_png,
                                    write_png)


def test_adler_combine_identity():
    rng = np.random.default_rng(7)
    for n1, n2 in [(1, 1), (100, 3), (65521, 65521), (5, 70000)]:
        b1 = rng.integers(0, 256, n1, dtype=np.uint8).tobytes()
        b2 = rng.integers(0, 256, n2, dtype=np.uint8).tobytes()
        assert _adler_combine(zlib.adler32(b1), zlib.adler32(b2),
                              len(b2)) == zlib.adler32(b1 + b2)


@pytest.mark.parametrize("shape,dtype", [
    ((13, 17), np.uint8), ((13, 17), np.uint16),
    ((8, 9, 3), np.uint8), ((5, 6, 4), np.uint8),
    ((7, 4, 2), np.uint16)])
def test_png_codec_roundtrip(shape, dtype):
    rng = np.random.default_rng(42)
    hi = 65535 if dtype == np.uint16 else 255
    arr = rng.integers(0, hi + 1, shape).astype(dtype)
    back, meta = decode_png(encode_png(arr))
    np.testing.assert_array_equal(back, arr)
    assert meta["depth"] == (16 if dtype == np.uint16 else 8)


def test_png_decode_all_filters():
    # hand-build one PNG per filter type and check reconstruction
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (6, 8, 3)).astype(np.uint8)
    h, w, _ = arr.shape
    body = arr.reshape(h, -1).astype(np.int32)
    for f in range(5):
        lines = []
        prev = np.zeros(w * 3, np.int32)
        for y in range(h):
            cur = body[y]
            a = np.roll(cur, 3); a[:3] = 0
            c = np.roll(prev, 3); c[:3] = 0
            if f == 0:
                filt = cur
            elif f == 1:
                filt = cur - a
            elif f == 2:
                filt = cur - prev
            elif f == 3:
                filt = cur - (a + prev) // 2
            else:
                p = a + prev - c
                pa, pb, pc = abs(p - a), abs(p - prev), abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a,
                                np.where(pb <= pc, prev, c))
                filt = cur - pred
            lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8)
                         .tobytes())
            prev = cur
        raw = b"".join(lines)
        png = bytearray(_SIG)
        png += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        png += _chunk(b"IDAT", zlib.compress(raw))
        png += _chunk(b"IEND", b"")
        back, _ = decode_png(bytes(png))
        np.testing.assert_array_equal(back, arr, err_msg=f"filter {f}")


def test_png_spark_rgb_roundtrip(spark, tmp_path):
    path = str(tmp_path / "img.png")
    rng = np.random.default_rng(11)
    bands = [rng.integers(0, 256, (40, 70)).astype(np.uint8)
             for _ in range(3)]
    tiles = None
    for i, b in enumerate(bands):
        t = raster_to_tiles(spark, b, band=i + 1, tile=16)
        tiles = t if tiles is None else tiles.unionByName(t)
    write_png(tiles, path, width_px=70, height_px=40, tile=16)

    arr, meta = decode_png(open(path, "rb").read())
    assert meta["ctype"] == 2 and arr.shape == (40, 70, 3)
    for i, b in enumerate(bands):
        np.testing.assert_array_equal(arr[:, :, i], b)

    back = read_png(spark, path, tile=16)
    for i, b in enumerate(bands):
        got = tiles_to_raster(back.where(f"band = {i + 1}"), tile=16)
        np.testing.assert_array_equal(got[:40, :70], b)
