"""Multimodal (opaque binary) column handling.

Pattern for image/audio/video payloads at 100 TB: carry them as `binary`
columns with typed metadata alongside, and run decode / feature-extraction /
resize as Arrow-batched `mapInPandas` stages. The decode step itself is
STUBBED here (no image/audio libs in this container — clearly marked); the
Spark-side plumbing (schema, batching, partition-preserving map) is real.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


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


def decode_image_stub(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB: image decode -> (width, height, channels) feature columns.

    The real implementation would Pillow/libvips-decode inside the same
    mapInPandas generator; this container has no imaging libs, so we emit a
    deterministic fake derived from the byte length and fail loudly for
    payloads claiming a real image magic number.
    """
    schema = "n_bytes long, width int, height int, channels int"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[payload_col]
            magics = payload.map(lambda b: bytes(b[:4]))
            if magics.isin([b"\x89PNG", b"\xff\xd8\xff\xe0"]).any():
                raise NotImplementedError(
                    "real image decode not available in this environment")
            n = payload.map(len).astype("int64")
            yield pd.DataFrame({
                "n_bytes": n,
                "width": (n % 640).astype("int32"),
                "height": (n % 480).astype("int32"),
                "channels": pd.Series(3, index=pdf.index, dtype="int32"),
            })

    return df.select(payload_col).mapInPandas(gen, schema=schema)


def resize_image_stub(df: DataFrame, payload_col: str = "payload",
                      key_col: str = "url",
                      target: tuple[int, int] = (224, 224)) -> DataFrame:
    """STUB resize: (key, resized binary, out_w, out_h). Real impl would
    decode+resample inside this same generator (Pillow/libvips); here the
    'resized' payload is a deterministic fake — a tag + truncated digest of
    the source bytes — so the Spark plumbing (binary in, binary out, Arrow
    batch shapes, partition-preserving map) is fully exercised and tested.
    """
    schema = f"{key_col} string, resized binary, out_w int, out_h int"
    w, h = target

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[payload_col]
            fake = payload.map(lambda b: b"RSZ%dx%d:" % (w, h)
                               + hashlib.sha1(bytes(b)).digest())
            yield pd.DataFrame({
                key_col: pdf[key_col],
                "resized": fake,
                "out_w": pd.Series(w, index=pdf.index, dtype="int32"),
                "out_h": pd.Series(h, index=pdf.index, dtype="int32"),
            })

    return df.select(key_col, payload_col).mapInPandas(gen, schema=schema)


def frame_sample_stub(df: DataFrame, payload_col: str = "payload",
                      key_col: str = "url", fps_every: int = 10,
                      max_frames: int = 4) -> DataFrame:
    """STUB video frame sampling: one output ROW per sampled frame
    (key, frame_idx, frame binary) — the 1->N exploding shape a real
    ffmpeg-based sampler has. Frame count derives deterministically from
    the payload length; frame bytes are tagged slices of the source."""
    schema = f"{key_col} string, frame_idx int, frame binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, idxs, frames = [], [], []
            for k, b in zip(pdf[key_col], pdf[payload_col]):
                b = bytes(b)
                n_frames = min(max_frames, max(1, len(b) // (fps_every * 64)))
                for i in range(n_frames):
                    keys.append(k)
                    idxs.append(i)
                    frames.append(b"FRM%d:" % i + b[i::max(1, n_frames)][:64])
            yield pd.DataFrame({key_col: pd.Series(keys, dtype="object"),
                                "frame_idx": pd.Series(idxs, dtype="int32"),
                                "frame": pd.Series(frames, dtype="object")})

    return df.select(key_col, payload_col).mapInPandas(gen, schema=schema)
