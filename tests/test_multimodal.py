"""Unit tests for the real multimodal decode operators
(gdal_spark/operators/multimodal.py): format sniffing, the in-memory
BMP/PNM decoders, integer-exact aHash, resize modes, the VID0 frame
container, and the lossless band-split guarantee of the near-dup join."""

import struct

import numpy as np
import pytest

from gdal_spark.operators import multimodal as mm
from gdal_spark.sources.jpeg import encode_jpeg
from gdal_spark.sources.png import encode_png


def _ramp(h, w, chans=None):
    y, x = np.mgrid[0:h, 0:w]
    g = ((5 * x + 11 * y) % 256).astype(np.uint8)
    if chans is None:
        return g
    return np.stack([(g + 31 * c) % 256 for c in range(chans)],
                    axis=-1).astype(np.uint8)


def _bmp_bytes(arr):
    """Minimal BITMAPINFOHEADER writer (24-bit RGB or 8-bit gray,
    bottom-up) for decoder tests."""
    h, w = arr.shape[:2]
    nb = 3 if arr.ndim == 3 else 1
    stride = (w * nb + 3) & ~3
    pal = b""
    if nb == 1:
        pal = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    data_off = 14 + 40 + len(pal)
    body = bytearray()
    for yy in range(h - 1, -1, -1):
        row = arr[yy]
        if nb == 3:
            row = row[:, ::-1]                      # RGB -> BGR
        rb = row.tobytes()
        body += rb + b"\0" * (stride - len(rb))
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    info = struct.pack("<IiihHIIiiII", 40, w, h, 1, nb * 8, 0,
                       len(body), 2835, 2835, 256 if nb == 1 else 0, 0)
    return bytes(hdr + info + pal + bytes(body))


def _pnm_bytes(arr):
    h, w = arr.shape[:2]
    tag = b"P6" if arr.ndim == 3 else b"P5"
    return tag + b"\n# test\n%d %d\n255\n" % (w, h) + arr.tobytes()


# ---------------------------------------------------------------------------

def test_sniff_format():
    g = _ramp(8, 8)
    assert mm.sniff_format(encode_png(g)) == "png"
    assert mm.sniff_format(encode_jpeg(g)) == "jpeg"
    assert mm.sniff_format(_bmp_bytes(g)) == "bmp"
    assert mm.sniff_format(_pnm_bytes(g)) == "pnm"
    assert mm.sniff_format(mm.pack_video([encode_png(g)])) == "vid"
    assert mm.sniff_format(b"\x00\x01\x02\x03") is None


@pytest.mark.parametrize("chans", [None, 3])
def test_bmp_pnm_inmemory_decode_roundtrip(chans):
    arr = _ramp(13, 10, chans)                      # odd width: padding path
    out_b, fmt_b = mm.decode_image_bytes(_bmp_bytes(arr))
    assert fmt_b == "bmp" and (out_b == arr).all()
    out_p, fmt_p = mm.decode_image_bytes(_pnm_bytes(arr))
    assert fmt_p == "pnm" and (out_p == arr).all()


def test_decode_image_bytes_png_jpeg():
    arr = _ramp(16, 16, 3)
    png_out, fmt = mm.decode_image_bytes(encode_png(arr))
    assert fmt == "png" and (png_out == arr).all()
    jpg_out, fmt = mm.decode_image_bytes(encode_jpeg(
        np.full((16, 16, 3), 128, np.uint8), quality=95))
    assert fmt == "jpeg" and jpg_out.shape == (16, 16, 3)
    assert np.abs(jpg_out.astype(int) - 128).max() <= 4


def test_ahash_integer_exact_and_offset_invariance():
    g = _ramp(16, 16)
    hi, lo = mm.ahash64(g)
    assert 0 <= hi < 2**32 and 0 <= lo < 2**32
    # brute-force the definition
    b = g.astype(np.int64).reshape(8, 2, 8, 2).sum(axis=(1, 3))
    t = int(b.sum())
    word = 0
    for by in range(8):
        for bx in range(8):
            if b[by, bx] * 64 > t:
                word |= 1 << (by * 8 + bx)
    assert (hi << 32) | lo == word
    # constant offsets don't change the hash (no mod wrap here)
    g2 = np.clip(g, 0, 205) + 50
    hi2, lo2 = mm.ahash64(np.clip(g, 0, 205))
    hi3, lo3 = mm.ahash64(g2)
    assert (hi2, lo2) == (hi3, lo3)
    # RGB path uses the 299/587/114 luma numerator
    rgb = np.stack([g, g, g], axis=-1)
    assert mm.ahash64(rgb) == mm.ahash64(g)


def test_resize_modes():
    arr = _ramp(16, 16)
    box = mm._resize_array(arr, 8, 8, "box")
    exp = arr.astype(np.int64).reshape(8, 2, 8, 2).sum(axis=(1, 3)) // 4
    assert (box == exp).all()
    near = mm._resize_array(arr, 8, 8, "nearest")
    assert (near == arr[1::2][:, 1::2]).all()       # floor((i+.5)*2) = 2i+1
    bil = mm._resize_array(arr, 32, 32, "bilinear")
    assert bil.shape == (32, 32)
    flat = mm._resize_array(np.full((16, 16), 77, np.uint8), 5, 7,
                            "bilinear")
    assert (flat == 77).all()
    with pytest.raises(ValueError):
        mm._resize_array(arr, 7, 8, "box")          # non-integral factor


def test_video_container_roundtrip():
    frames = [encode_png(_ramp(8, 8)), encode_png(_ramp(4, 4)),
              b"third-frame-opaque"]
    packed = mm.pack_video(frames)
    assert mm.unpack_video(packed) == frames
    with pytest.raises(ValueError):
        mm.unpack_video(b"nope")


def test_band_split_lossless_bound():
    with pytest.raises(ValueError):
        mm.ahash_neardup_pairs(None, max_hamming=8)


def test_wav_codec_roundtrip_and_errors():
    s = (np.arange(1000) % 97 - 48).astype(np.int16)
    w = mm.encode_wav(s, 8000)
    a, r = mm.decode_wav(w)
    assert r == 8000 and (a == s).all() and a.dtype == np.int32
    st2 = np.stack([s, -s], axis=1).astype(np.int16)
    a2, r2 = mm.decode_wav(mm.encode_wav(st2, 44100))
    assert r2 == 44100 and a2.shape == (1000, 2) and (a2[:, 1] == -s).all()
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFFxxxxNOPE" + b"\0" * 32)
    # 8-bit PCM path: unsigned bytes recenter to [-128, 127]
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + 4, b"WAVE",
                      b"fmt ", 16, 1, 1, 8000, 8000, 1, 8, b"data", 4)
    a3, _ = mm.decode_wav(hdr + bytes([0, 128, 255, 64]))
    assert a3.tolist() == [-128, 0, 127, -64]


def test_mp4_box_walk_and_frame_ranges():
    """ISO-BMFF fixture: box sizes/types parse, mvhd/tkhd/mdhd/hdlr
    metadata is recovered, and every stsz/stco frame byte range slices
    the exact PNG payload back out of mdat."""
    import numpy as np

    from gdal_spark.operators import multimodal as M
    from gdal_spark.sources.png import encode_png

    frames = [encode_png(((np.arange(64).reshape(8, 8) * (i + 1)) % 256)
                         .astype(np.uint8)) for i in range(5)]
    mp4 = M.write_mp4(frames, fps=10, width=8, height=8)
    assert mp4[4:8] == b"ftyp"
    meta = M.parse_mp4(mp4)
    assert (meta["timescale"], meta["duration"]) == (10, 5)
    t = meta["tracks"][0]
    assert t["handler"] == "vide"
    assert (t["width"], t["height"]) == (8.0, 8.0)
    assert len(t["sizes"]) == 5
    for i, (o, sz) in enumerate(M.mp4_frame_ranges(meta, t)):
        assert mp4[o:o + sz] == frames[i]


def test_mp4_metadata_and_sampling(spark):
    import numpy as np
    import pandas as pd

    from gdal_spark.operators import multimodal as M
    from gdal_spark.sources.png import encode_png

    def payload(did, n):
        y, x = np.mgrid[0:8, 0:8]
        return M.write_mp4([encode_png(((did + 3 * f + x + y) % 256)
                                       .astype(np.uint8))
                            for f in range(n)], fps=5)

    df = spark.createDataFrame(
        [(1, bytearray(payload(1, 4))), (2, bytearray(payload(2, 7)))],
        "doc_id long, payload binary")
    m = {r.doc_id: r for r in M.mp4_metadata(df).collect()}
    assert (m[1].n_frames, m[2].n_frames) == (4, 7)
    assert m[2].duration_s == 1.4           # 7 frames at 5 fps
    s = M.mp4_frame_sample(df, every=3, max_frames=8).collect()
    got = sorted((r.doc_id, r.frame_idx) for r in s)
    assert got == [(1, 0), (1, 3), (2, 0), (2, 3), (2, 6)]
    for r in s:
        assert (r.width, r.height) == (8, 8) and r.px_sum > 0
