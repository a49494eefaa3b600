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
