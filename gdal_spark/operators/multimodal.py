"""Multimodal (image / opaque-binary) column operators — real decode.

Pattern for image/audio/video payloads at 100 TB: carry them as `binary`
columns with typed metadata alongside, and run decode / feature-extraction /
resize / frame-sampling as Arrow-batched ``mapInPandas`` stages — map-only
passes that fuse with the scan, no shuffle, no driver round-trips.

Unlike the round-3 stub, decode here is REAL, built on the repo's own
pure-numpy codecs:

  * PNG  — sources/png.py  (decode_png / encode_png)
  * JPEG — sources/jpeg.py (decode_jpeg / encode_jpeg, baseline DCT with
           libjpeg integer arithmetic)
  * BMP / binary PNM (P5/P6) — compact in-memory decoders below (the
    path-based tile readers live in sources/bmp.py, sources/pnm.py; these
    operate on in-row payload bytes instead).

Video remains container-level only: this container has no ffmpeg, so
``frame_sample`` operates on the engine's own trivial frame container
(``pack_video``: magic + length-prefixed PNG frames). The sampling shape —
1->N explode, every-k selection, per-frame decode — is the shape an
ffmpeg-backed sampler has; only the codec behind each frame would change.

Reference parity: GDAL models exactly this as in-memory raster datasets
("/vsimem/" + frmts/png, frmts/jpeg, frmts/bmp, frmts/raw/pnmdataset.cpp);
the average-hash near-dup mirrors the webtext dedup family in
operators/textops.py (SimHash) applied to pixels.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# format sniffing + in-memory decode
# ---------------------------------------------------------------------------

def sniff_format(b: bytes) -> str | None:
    """Magic-number sniff: png / jpeg / bmp / pnm / vid (our frame
    container) / None."""
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:3] == b"\xFF\xD8\xFF" or b[:2] == b"\xFF\xD8":
        return "jpeg"
    if b[:2] == b"BM":
        return "bmp"
    if len(b) >= 2 and b[0:1] == b"P" and b[1:2] in b"456":
        return "pnm"
    if b[:4] == b"VID0":
        return "vid"
    return None


def _decode_bmp_bytes(b: bytes) -> np.ndarray:
    """Uncompressed BITMAPINFOHEADER 8/24-bit BMP bytes -> array.

    In-memory sibling of sources/bmp.py (same layout constants:
    bottom-up rows, 4-byte row padding, BGR order;
    /root/reference/frmts/bmp/bmpdataset.cpp BMPInfoHeader).
    """
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", b, 10)
    (hdr_sz, w, h, _planes, bpp, comp) = struct.unpack_from("<IiihHI", b, 14)
    if comp != 0:
        raise ValueError(f"compressed BMP (BI code {comp}) unsupported")
    if bpp not in (8, 24):
        raise ValueError(f"BMP bpp {bpp} unsupported")
    bottom_up = h > 0
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    raw = np.frombuffer(b, np.uint8, count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, : w * nb]
    if bottom_up:
        rows = rows[::-1]
    if nb == 1:
        return np.ascontiguousarray(rows)
    arr = rows.reshape(h, w, 3)[:, :, ::-1]          # BGR -> RGB
    return np.ascontiguousarray(arr)


def _decode_pnm_bytes(b: bytes) -> np.ndarray:
    """Binary PNM (P5 gray / P6 RGB, maxval<=255) bytes -> array.
    In-memory sibling of sources/pnm.py (frmts/raw/pnmdataset.cpp)."""
    if b[0:1] != b"P" or b[1:2] not in b"56":
        raise ValueError("not a binary P5/P6 PNM")
    rgb = b[1:2] == b"6"
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":
            while pos < len(b) and b[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1                                          # single ws after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PNM payloads unsupported here")
    n = w * h * (3 if rgb else 1)
    arr = np.frombuffer(b, np.uint8, count=n, offset=pos)
    return arr.reshape(h, w, 3) if rgb else arr.reshape(h, w)


def decode_image_bytes(b: bytes) -> tuple[np.ndarray, str]:
    """Payload bytes -> (uint8 array (h,w) or (h,w,samples), format tag).
    Dispatches on magic number across the four in-repo codecs."""
    fmt = sniff_format(b)
    if fmt == "png":
        from ..sources.png import decode_png
        arr, _meta = decode_png(b)
        return np.asarray(arr), fmt
    if fmt == "jpeg":
        from ..sources.jpeg import decode_jpeg
        arr, _meta = decode_jpeg(b)
        return np.asarray(arr), fmt
    if fmt == "bmp":
        return _decode_bmp_bytes(b), fmt
    if fmt == "pnm":
        return _decode_pnm_bytes(b), fmt
    raise ValueError("unrecognized image payload (png/jpeg/bmp/pnm)")


# ---------------------------------------------------------------------------
# metadata / decode / features
# ---------------------------------------------------------------------------

def binary_meta(df: DataFrame, payload_col: str = "html",
                key_col: str = "url") -> DataFrame:
    """(key, n_bytes, payload_md5) per row via mapInPandas — a map-only
    Arrow-batched pass, no shuffle."""
    schema = f"{key_col} string, n_bytes long, payload_md5 string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[payload_col]
            yield pd.DataFrame({
                key_col: pdf[key_col],
                "n_bytes": payload.map(len).astype("int64"),
                "payload_md5": payload.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
            })

    return df.select(key_col, payload_col).mapInPandas(gen, schema=schema)


def decode_image(df: DataFrame, payload_col: str = "payload",
                 key_col: str = "doc_id") -> DataFrame:
    """Real image decode -> (key, fmt, width, height, channels, px_sum).

    ``px_sum`` is the integer sum of every sample — a cheap whole-image
    checksum that an external oracle can recompute. Map-only Arrow pass;
    the per-image numpy decode is the vectorized unit of work.
    """
    schema = (f"{key_col} long, fmt string, width int, height int, "
              f"channels int, px_sum long")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, fmts, ws, hs, cs, sums = [], [], [], [], [], []
            for k, b in zip(pdf[key_col], pdf[payload_col]):
                arr, fmt = decode_image_bytes(bytes(b))
                keys.append(k)
                fmts.append(fmt)
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                cs.append(1 if arr.ndim == 2 else arr.shape[2])
                sums.append(int(arr.astype(np.int64).sum()))
            yield pd.DataFrame({
                key_col: pd.Series(keys, dtype="int64"),
                "fmt": pd.Series(fmts, dtype="object"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "channels": pd.Series(cs, dtype="int32"),
                "px_sum": pd.Series(sums, dtype="int64"),
            })

    return df.select(key_col, payload_col).mapInPandas(gen, schema=schema)


def _to_gray_i64(arr: np.ndarray) -> np.ndarray:
    """uint8 image -> int64 'gray' plane. Multi-band uses the integer
    BT.601 luma numerator 299R+587G+114B (no division: the average-hash
    comparison below is scale-invariant, so the x1000 factor cancels)."""
    a = arr.astype(np.int64)
    if a.ndim == 2:
        return a
    return 299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]


def ahash64(arr: np.ndarray) -> tuple[int, int]:
    """Average hash (aHash) of an image, integer-exact, as two uint32 words
    (hi, lo) so both Spark and SQL oracles avoid int64 sign pitfalls.

    The image is cropped to a multiple of 8, partitioned into an 8x8 grid of
    equal blocks; bit (by*8+bx) is set iff that block's pixel sum * 64 >
    the total sum (equivalent to block mean > mean of block means, with no
    float division anywhere). Bit 0 is the top-left block in the LO word;
    the HI word carries bits 32..63.
    """
    g = _to_gray_i64(arr)
    h, w = g.shape
    bh, bw = h // 8, w // 8
    if bh == 0 or bw == 0:
        raise ValueError("image smaller than 8x8")
    g = g[: bh * 8, : bw * 8]
    blocks = g.reshape(8, bh, 8, bw).sum(axis=(1, 3))     # (by, bx) sums
    total = int(blocks.sum())
    bits = (blocks * 64 > total)
    word = 0
    for by in range(8):
        for bx in range(8):
            if bits[by, bx]:
                word |= 1 << (by * 8 + bx)
    return (word >> 32) & 0xFFFFFFFF, word & 0xFFFFFFFF


def image_features(df: DataFrame, payload_col: str = "payload",
                   key_col: str = "doc_id") -> DataFrame:
    """Decode + feature-extract: (key, width, height, channels, px_sum,
    ahash_hi, ahash_lo). One Arrow-batched map-only pass."""
    schema = (f"{key_col} long, width int, height int, channels int, "
              f"px_sum long, ahash_hi long, ahash_lo long")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, b in zip(pdf[key_col], pdf[payload_col]):
                arr, _fmt = decode_image_bytes(bytes(b))
                hi, lo = ahash64(arr)
                rows.append((int(k), arr.shape[1], arr.shape[0],
                             1 if arr.ndim == 2 else arr.shape[2],
                             int(arr.astype(np.int64).sum()), hi, lo))
            yield pd.DataFrame(rows, columns=[key_col, "width", "height",
                                              "channels", "px_sum",
                                              "ahash_hi", "ahash_lo"])

    return df.select(key_col, payload_col).mapInPandas(gen, schema=schema)


def ahash_neardup_pairs(feat: DataFrame, key_col: str = "doc_id",
                        max_hamming: int = 6) -> DataFrame:
    """Near-duplicate image pairs by aHash Hamming distance, WITHOUT the
    all-pairs join: the 64-bit hash splits into eight 8-bit bands; two
    hashes within Hamming distance <= 7 must agree on at least one band
    (pigeonhole), so candidates come from an equi-join on (band_id,
    band_value) and only candidates pay the exact popcount check.

    At 10^12 rows this is the image twin of the MinHash-LSH text path
    (operators/textops.py): band explode -> shuffle on short keys ->
    bounded verify. Requires max_hamming <= 7 for losslessness.
    """
    if max_hamming > 7:
        raise ValueError("8-band split is only lossless for max_hamming<=7")
    f0 = feat.select(F.col(key_col).alias("k"),
                     F.col("ahash_hi").alias("hi"),
                     F.col("ahash_lo").alias("lo"))
    bands = []
    for i in range(4):
        bands.append(F.struct(F.lit(i).alias("band_id"),
                              F.shiftrightunsigned("hi", 8 * i)
                              .bitwiseAND(F.lit(255)).alias("bv")))
        bands.append(F.struct(F.lit(4 + i).alias("band_id"),
                              F.shiftrightunsigned("lo", 8 * i)
                              .bitwiseAND(F.lit(255)).alias("bv")))
    e = f0.select("k", "hi", "lo",
                  F.explode(F.array(*bands)).alias("b")) \
          .select("k", "hi", "lo", "b.band_id", "b.bv")
    l = e.alias("l")
    r = e.alias("r")
    cand = (l.join(r, on=["band_id", "bv"])
             .where(F.col("l.k") < F.col("r.k"))
             .select(F.col("l.k").alias("k1"), F.col("r.k").alias("k2"),
                     F.col("l.hi").alias("hi1"), F.col("l.lo").alias("lo1"),
                     F.col("r.hi").alias("hi2"), F.col("r.lo").alias("lo2"))
             .dropDuplicates(["k1", "k2"]))
    dist = (F.bit_count(F.col("hi1").bitwiseXOR(F.col("hi2")))
            + F.bit_count(F.col("lo1").bitwiseXOR(F.col("lo2"))))
    return (cand.withColumn("hamming", dist.cast("int"))
                .where(F.col("hamming") <= max_hamming)
                .select("k1", "k2", "hamming"))


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------

def _resize_array(arr: np.ndarray, ow: int, oh: int,
                  mode: str) -> np.ndarray:
    """uint8 (h,w[,s]) -> (oh,ow[,s]). Modes: 'nearest' (GDAL NEAR center
    rule: src = floor((i+0.5)*scale)), 'box' (exact area mean for integral
    downscale factors), 'bilinear' (float, center-aligned)."""
    h, w = arr.shape[:2]
    if mode == "nearest":
        xs = np.minimum(((np.arange(ow) + 0.5) * (w / ow)).astype(np.int64),
                        w - 1)
        ys = np.minimum(((np.arange(oh) + 0.5) * (h / oh)).astype(np.int64),
                        h - 1)
        return arr[ys][:, xs]
    if mode == "box":
        if w % ow or h % oh:
            raise ValueError("box mode needs integral downscale factors")
        fx, fy = w // ow, h // oh
        a = arr.astype(np.int64)
        if a.ndim == 2:
            s = a.reshape(oh, fy, ow, fx).sum(axis=(1, 3))
        else:
            s = a.reshape(oh, fy, ow, fx, a.shape[2]).sum(axis=(1, 3))
        return (s // (fx * fy)).astype(np.uint8)
    if mode == "bilinear":
        xs = np.clip((np.arange(ow) + 0.5) * (w / ow) - 0.5, 0, w - 1)
        ys = np.clip((np.arange(oh) + 0.5) * (h / oh) - 0.5, 0, h - 1)
        x0 = np.floor(xs).astype(np.int64)
        y0 = np.floor(ys).astype(np.int64)
        x1 = np.minimum(x0 + 1, w - 1)
        y1 = np.minimum(y0 + 1, h - 1)
        wx = (xs - x0)[None, :]
        wy = (ys - y0)[:, None]
        if arr.ndim == 3:
            wx = wx[:, :, None]
            wy = wy[:, :, None]
        a = arr.astype(np.float64)
        top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
        bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
        out = top * (1 - wy) + bot * wy
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)
    raise ValueError(f"unknown resize mode {mode!r}")


def resize_image(df: DataFrame, payload_col: str = "payload",
                 key_col: str = "doc_id",
                 target: tuple[int, int] = (224, 224),
                 mode: str = "bilinear") -> DataFrame:
    """Real resize: decode -> resample -> re-encode PNG. Output
    (key, resized binary, out_w, out_h). Map-only Arrow pass."""
    ow, oh = target
    schema = f"{key_col} long, resized binary, out_w int, out_h int"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.png import encode_png
        for pdf in batches:
            keys, outs = [], []
            for k, b in zip(pdf[key_col], pdf[payload_col]):
                arr, _fmt = decode_image_bytes(bytes(b))
                keys.append(int(k))
                outs.append(encode_png(_resize_array(arr, ow, oh, mode)))
            yield pd.DataFrame({
                key_col: pd.Series(keys, dtype="int64"),
                "resized": pd.Series(outs, dtype="object"),
                "out_w": pd.Series(ow, index=range(len(keys)), dtype="int32"),
                "out_h": pd.Series(oh, index=range(len(keys)), dtype="int32"),
            })

    return df.select(key_col, payload_col).mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# video frame container + sampling
# ---------------------------------------------------------------------------

def pack_video(frames: list[bytes]) -> bytes:
    """Length-prefixed frame container: b'VID0' + u32 n + n*u32 lengths +
    concatenated frame payloads (each frame any decodable image, PNG by
    convention). Stands in for a real video codec — no ffmpeg in this
    container; the Spark-side sampling shape is identical."""
    out = bytearray(b"VID0")
    out += struct.pack("<I", len(frames))
    for fr in frames:
        out += struct.pack("<I", len(fr))
    for fr in frames:
        out += fr
    return bytes(out)


def unpack_video(b: bytes) -> list[bytes]:
    if b[:4] != b"VID0":
        raise ValueError("not a VID0 container")
    (n,) = struct.unpack_from("<I", b, 4)
    lens = struct.unpack_from(f"<{n}I", b, 8)
    off = 8 + 4 * n
    frames = []
    for ln in lens:
        frames.append(bytes(b[off:off + ln]))
        off += ln
    return frames


def frame_sample(df: DataFrame, payload_col: str = "payload",
                 key_col: str = "doc_id", every: int = 2,
                 max_frames: int = 8) -> DataFrame:
    """Sample every k-th frame from a VID0 container and DECODE each sampled
    frame: 1->N explode to (key, frame_idx, frame binary, width, height,
    px_sum). The explode happens executor-side inside the Arrow batch —
    no shuffle; downstream ops see an ordinary DataFrame."""
    schema = (f"{key_col} long, frame_idx int, frame binary, "
              f"width int, height int, px_sum long")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, b in zip(pdf[key_col], pdf[payload_col]):
                frames = unpack_video(bytes(b))
                idxs = list(range(0, len(frames), every))[:max_frames]
                for i in idxs:
                    arr, _fmt = decode_image_bytes(frames[i])
                    rows.append((int(k), i, frames[i], arr.shape[1],
                                 arr.shape[0],
                                 int(arr.astype(np.int64).sum())))
            yield pd.DataFrame(rows, columns=[key_col, "frame_idx", "frame",
                                              "width", "height", "px_sum"])

    return df.select(key_col, payload_col).mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# audio: RIFF/WAVE PCM decode + windowed features (no external libs —
# PCM16/PCM8 parse is pure struct/numpy, the audio twin of the image path)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono/stereo samples (n,) or (n, ch) -> RIFF/WAVE PCM bytes."""
    a = np.asarray(samples, np.int16)
    ch = 1 if a.ndim == 1 else a.shape[1]
    data = a.astype("<i2").tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data),
                      b"WAVE", b"fmt ", 16, 1, ch, rate,
                      rate * ch * 2, ch * 2, 16, b"data", len(data))
    return hdr + data


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> (int32 samples (n,) or (n, ch), rate).
    PCM 8-bit (unsigned) and 16-bit (signed LE) supported."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off = 12
    fmt = None
    data = None
    while off + 8 <= len(b):
        cid = b[off:off + 4]
        (ln,) = struct.unpack_from("<I", b, off + 4)
        body = b[off + 8:off + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        off += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunks")
    codec, ch, rate, _br, _ba, bits = fmt
    if codec != 1 or bits not in (8, 16):
        raise ValueError(f"only PCM 8/16-bit supported (codec {codec}, "
                         f"{bits}-bit)")
    if bits == 16:
        a = np.frombuffer(data, "<i2").astype(np.int32)
    else:
        a = np.frombuffer(data, np.uint8).astype(np.int32) - 128
    if ch > 1:
        a = a[: len(a) // ch * ch].reshape(-1, ch)
    return a, rate


def decode_audio(df: DataFrame, payload_col: str = "payload",
                 key_col: str = "doc_id") -> DataFrame:
    """(key, rate, channels, n_samples, duration_ms, sum_abs) per WAV
    payload — the audio analogue of decode_image (integer-exact features
    an external oracle can recompute). Map-only Arrow pass."""
    schema = (f"{key_col} long, rate int, channels int, n_samples long, "
              f"duration_ms long, sum_abs long")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, b in zip(pdf[key_col], pdf[payload_col]):
                a, rate = decode_wav(bytes(b))
                n = a.shape[0]
                ch = 1 if a.ndim == 1 else a.shape[1]
                rows.append((int(k), rate, ch, n, n * 1000 // rate,
                             int(np.abs(a.astype(np.int64)).sum())))
            yield pd.DataFrame(rows, columns=[key_col, "rate", "channels",
                                              "n_samples", "duration_ms",
                                              "sum_abs"])

    return df.select(key_col, payload_col).mapInPandas(gen, schema=schema)


def audio_window_energy(df: DataFrame, payload_col: str = "payload",
                        key_col: str = "doc_id",
                        window: int = 256) -> DataFrame:
    """Windowed sum-of-squares energy: 1->N explode to (key, win_idx,
    energy) — the framing shape of any acoustic featurizer (MFCC etc.),
    with an integer-exact reduction per window. Tail windows pad with 0."""
    schema = f"{key_col} long, win_idx int, energy long"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, b in zip(pdf[key_col], pdf[payload_col]):
                a, _rate = decode_wav(bytes(b))
                if a.ndim > 1:
                    a = a[:, 0]
                a = a.astype(np.int64)
                nwin = (len(a) + window - 1) // window
                pad = np.zeros(nwin * window, np.int64)
                pad[: len(a)] = a
                en = (pad * pad).reshape(nwin, window).sum(axis=1)
                rows.extend((int(k), i, int(e)) for i, e in enumerate(en))
            yield pd.DataFrame(rows, columns=[key_col, "win_idx",
                                              "energy"])

    return df.select(key_col, payload_col).mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# ISO-BMFF (MP4) video metadata + byte-range frame sampling
# (ISO/IEC 14496-12 box structure; the reference exposes the same
#  metadata surface through its frmts/ sidecars. Parsing and the
#  stsz/stco byte-range frame extraction are REAL; only the per-frame
#  payload codec is the engine's PNG stand-in — no ffmpeg in any
#  container this runs in.)
# ---------------------------------------------------------------------------

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk_boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the box sequence in
    [start, end); recursion is the caller's choice via _MP4_CONTAINERS."""
    o = start
    while o + 8 <= end:
        (size,) = struct.unpack_from(">I", b, o)
        btype = b[o + 4:o + 8]
        if size == 1:                       # 64-bit largesize
            (size,) = struct.unpack_from(">Q", b, o + 8)
            yield btype, o + 16, o + size
        elif size == 0:                     # to end of file
            yield btype, o + 8, end
            size = end - o
        else:
            yield btype, o + 8, o + size
        if size < 8:
            break
        o += size


def parse_mp4(b: bytes) -> dict:
    """Minimal ISO-BMFF reader: mvhd movie timescale/duration plus one
    entry per track (tkhd id + 16.16 fixed width/height, mdhd timescale/
    duration, hdlr handler, stsz sample sizes, stco chunk offsets,
    stsc samples-per-chunk)."""
    out: dict = {"timescale": 0, "duration": 0, "tracks": []}

    def walk(start, end, depth=0):
        for btype, ps, pe in _walk_boxes(b, start, end):
            if btype == b"mvhd":
                ver = b[ps]
                if ver == 1:
                    out["timescale"], out["duration"] = struct.unpack_from(
                        ">IQ", b, ps + 4 + 16)
                else:
                    _c, _m, ts, du = struct.unpack_from(">IIII", b, ps + 4)
                    out["timescale"], out["duration"] = ts, du
            elif btype == b"trak":
                out["tracks"].append({})
                walk(ps, pe, depth + 1)
            elif btype == b"tkhd":
                t = out["tracks"][-1]
                t["track_id"] = struct.unpack_from(">I", b, ps + 12)[0]
                t["width"] = struct.unpack_from(">I", b, pe - 8)[0] / 65536.0
                t["height"] = struct.unpack_from(">I", b, pe - 4)[0] / 65536.0
            elif btype == b"mdhd":
                t = out["tracks"][-1]
                _c, _m, ts, du = struct.unpack_from(">IIII", b, ps + 4)
                t["timescale"], t["duration"] = ts, du
            elif btype == b"hdlr":
                out["tracks"][-1]["handler"] = b[ps + 8:ps + 12].decode(
                    "latin-1")
            elif btype == b"stsz":
                t = out["tracks"][-1]
                fixed, n = struct.unpack_from(">II", b, ps + 4)
                t["sizes"] = [fixed] * n if fixed else list(
                    struct.unpack_from(f">{n}I", b, ps + 12))
            elif btype == b"stco":
                (n,) = struct.unpack_from(">I", b, ps + 4)
                out["tracks"][-1]["chunk_offsets"] = list(
                    struct.unpack_from(f">{n}I", b, ps + 8))
            elif btype == b"stsc":
                (n,) = struct.unpack_from(">I", b, ps + 4)
                out["tracks"][-1]["stsc"] = [
                    struct.unpack_from(">III", b, ps + 8 + 12 * i)
                    for i in range(n)]
            elif btype in _MP4_CONTAINERS:
                walk(ps, pe, depth + 1)

    walk(0, len(b))
    return out


def mp4_frame_ranges(meta: dict, track: dict) -> list[tuple[int, int]]:
    """(offset, size) of every sample, resolved through stsc/stco/stsz —
    the byte ranges a seeking reader fetches (frame extraction without
    decoding)."""
    sizes = track.get("sizes") or []
    offs = track.get("chunk_offsets") or []
    stsc = track.get("stsc") or [(1, 1, 1)]
    ranges = []
    si = 0
    for ci, base in enumerate(offs):
        per = 1
        for first, n_per, _d in stsc:
            if ci + 1 >= first:
                per = n_per
        o = base
        for _ in range(per):
            if si >= len(sizes):
                break
            ranges.append((o, sizes[si]))
            o += sizes[si]
            si += 1
    return ranges


def write_mp4(frames: list[bytes], fps: int = 10, width: int = 8,
              height: int = 8) -> bytes:
    """Deterministic minimal MP4: ftyp + mdat (concatenated frame
    payloads) + moov/trak/stbl with correct stts/stsc/stsz/stco. The
    sample-entry fourcc is 'png ' — each sample payload is one of the
    engine's PNG frames (codec stand-in, documented)."""
    def box(t, payload):
        return struct.pack(">I", 8 + len(payload)) + t + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(frames)
    mdat_off = len(ftyp) + 8
    mdat = box(b"mdat", mdat_payload)
    n = len(frames)
    ts = fps
    dur = n
    mvhd = box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, ts, dur)
               + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
               + b"\x00" * 10
               + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000)
               + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = box(b"tkhd", struct.pack(">IIIIII", 0x7, 0, 0, 1, 0, dur)
               + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
               + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000)
               + struct.pack(">II", width << 16, height << 16))
    mdhd = box(b"mdhd", struct.pack(">IIIII", 0, 0, 0, ts, dur)
               + struct.pack(">HH", 0x55c4, 0))
    hdlr = box(b"hdlr", struct.pack(">II", 0, 0) + b"vide"
               + b"\x00" * 12 + b"gdal_spark\x00")
    entry = box(b"png ", b"\x00" * 6 + struct.pack(">H", 1)
                + b"\x00" * 16
                + struct.pack(">HH", width, height) + b"\x00" * 50)
    stsd = box(b"stsd", struct.pack(">II", 0, 1) + entry)
    stts = box(b"stts", struct.pack(">IIII", 0, 1, n, 1))
    stsc = box(b"stsc", struct.pack(">IIIII", 0, 1, 1, n, 1))
    stsz = box(b"stsz", struct.pack(">III", 0, 0, n)
               + b"".join(struct.pack(">I", len(f)) for f in frames))
    stco = box(b"stco", struct.pack(">II", 0, 1)
               + struct.pack(">I", mdat_off))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def mp4_metadata(df: DataFrame, payload_col: str = "payload",
                 key_col: str = "doc_id") -> DataFrame:
    """Per MP4 payload: movie duration, track count, first video track's
    dimensions and frame count. Map-only Arrow batches."""
    schema = (f"{key_col} long, duration_s double, n_tracks int, "
              f"width int, height int, n_frames int")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, b in zip(pdf[key_col], pdf[payload_col]):
                m = parse_mp4(bytes(b))
                vid = next((t for t in m["tracks"]
                            if t.get("handler") == "vide"), None)
                rows.append((
                    int(k),
                    m["duration"] / m["timescale"] if m["timescale"] else 0.0,
                    len(m["tracks"]),
                    int(vid["width"]) if vid else 0,
                    int(vid["height"]) if vid else 0,
                    len(vid.get("sizes") or []) if vid else 0))
            yield pd.DataFrame(rows, columns=[
                key_col, "duration_s", "n_tracks", "width", "height",
                "n_frames"])

    return df.select(key_col, payload_col).mapInPandas(gen, schema=schema)


def mp4_frame_sample(df: DataFrame, payload_col: str = "payload",
                     key_col: str = "doc_id", every: int = 2,
                     max_frames: int = 8) -> DataFrame:
    """Sample every k-th frame of the first video track by stsz/stco
    BYTE RANGE (no transcode) and decode the sampled payloads: the
    1->N explode + bounded selection shape of an ffmpeg-backed sampler,
    executor-side, no shuffle."""
    schema = (f"{key_col} long, frame_idx int, frame binary, "
              f"width int, height int, px_sum long")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, b in zip(pdf[key_col], pdf[payload_col]):
                raw = bytes(b)
                m = parse_mp4(raw)
                vid = next((t for t in m["tracks"]
                            if t.get("handler") == "vide"), None)
                if vid is None:
                    continue
                ranges = mp4_frame_ranges(m, vid)
                idxs = list(range(0, len(ranges), every))[:max_frames]
                for i in idxs:
                    o, sz = ranges[i]
                    fr = raw[o:o + sz]
                    arr, _fmt = decode_image_bytes(fr)
                    rows.append((int(k), i, fr, arr.shape[1], arr.shape[0],
                                 int(arr.astype(np.int64).sum())))
            yield pd.DataFrame(rows, columns=[
                key_col, "frame_idx", "frame", "width", "height",
                "px_sum"])

    return df.select(key_col, payload_col).mapInPandas(gen, schema=schema)
