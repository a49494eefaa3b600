"""Erdas 7.x LAN/GIS raw raster source/sink (frmts/raw/landataset.cpp).

128-byte header ("HEAD74" new / "HEADER" old — the old form stores width
and height as float32), then band-interleaved-by-line pixel data; byte
order is sniffed from the band-count field exactly like the reference
(header byte 8 == 0 means big-endian). Pixel types: 0 = 8-bit, 1 = 4-bit
(two pixels per byte, high nibble first), 2 = 16-bit.

Distribution: line-strip tasks — each Spark task preads the line range
of its tile row for each band (offsets are closed-form in the BIL
layout), the same pattern as the other raw-raster drivers; the writer
pwrites per tile-row strip into a preallocated file.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..raster.tiles import TILE_SCHEMA, decode_px, encode_px

HEADER_SIZE = 128


def parse_header(path: str) -> dict:
    with open(path, "rb") as f:
        h = f.read(HEADER_SIZE)
        size = os.fstat(f.fileno()).st_size
    magic = h[:6]
    if magic not in (b"HEAD74", b"HEADER"):
        raise ValueError("not an Erdas LAN/GIS file")
    bo = ">" if h[8] == 0 else "<"        # reference sniff: byte 8
    pix, nbands = struct.unpack(bo + "hh", h[6:10])
    if magic == b"HEADER":                # old form: float32 dims
        w = int(struct.unpack(bo + "f", h[16:20])[0])
        hgt = int(struct.unpack(bo + "f", h[20:24])[0])
    else:
        w, hgt = struct.unpack(bo + "ii", h[16:24])
    ulx, uly, pw, ph = struct.unpack(bo + "ffff", h[112:128])
    if pix == 0:
        dt, line_bytes = "u1", w
    elif pix == 1:
        dt, line_bytes = "u4bit", (w + 1) // 2
    elif pix == 2:
        dt, line_bytes = "i2", 2 * w
    else:
        raise ValueError(f"unsupported LAN pixel type {pix}")
    gt = None
    if pw != 0.0 and ph != 0.0:
        gt = (float(ulx) - pw / 2.0, float(pw), 0.0,
              float(uly) + ph / 2.0, 0.0, -float(ph))
    return {"bo": bo, "pix": pix, "nbands": nbands, "width": w,
            "height": hgt, "dt": dt, "line_bytes": line_bytes,
            "gt": gt, "size": size}


def read_lan(spark: SparkSession, path: str, tile: int = 256):
    """.lan/.gis -> (engine tile table, header dict)."""
    meta = parse_header(path)
    w, hgt, nb = meta["width"], meta["height"], meta["nbands"]
    lb = meta["line_bytes"]
    strips = [(b + 1, ty, ty * tile, min(hgt, (ty + 1) * tile))
              for b in range(nb) for ty in range(-(-hgt // tile))]
    sdf = spark.createDataFrame(
        strips, "band long, ty long, r0 long, r1 long")
    bo, pix = meta["bo"], meta["pix"]

    def gen(batches):
        cols = [f.name for f in TILE_SCHEMA.fields]
        for pdf in batches:
            out = []
            with open(path, "rb") as f:
                for s in pdf.itertuples(index=False):
                    rows_here = int(s.r1 - s.r0)
                    arr = np.zeros((rows_here, w), np.float64)
                    for r in range(rows_here):
                        line = int(s.r0) + r
                        off = HEADER_SIZE + (line * nb
                                             + int(s.band) - 1) * lb
                        f.seek(off)
                        raw = f.read(lb)
                        if len(raw) < lb:
                            raw = raw + b"\x00" * (lb - len(raw))
                        if pix == 1:        # 4-bit, high nibble first
                            b8 = np.frombuffer(raw, np.uint8)
                            v = np.empty(len(b8) * 2, np.uint8)
                            v[0::2] = b8 >> 4
                            v[1::2] = b8 & 0x0F
                            arr[r] = v[:w]
                        elif pix == 2:
                            arr[r] = np.frombuffer(raw, bo + "i2",
                                                   count=w)
                        else:
                            arr[r] = np.frombuffer(raw, np.uint8,
                                                   count=w)
                    for tx in range(-(-w // tile)):
                        blk = np.zeros((tile, tile), np.float64)
                        sub = arr[:, tx * tile:(tx + 1) * tile]
                        blk[:sub.shape[0], :sub.shape[1]] = sub
                        out.append((int(s.band), 0, tx, int(s.ty),
                                    "float64", None, encode_px(blk)))
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame(columns=cols))

    return sdf.mapInPandas(gen, TILE_SCHEMA), meta


def write_lan(tiles: DataFrame, path: str, width_px: int, height_px: int,
              tile: int = 256, nbands: int = 1, pix: int = 0,
              ulx: float = 0.5, uly: float = -0.5,
              pw: float = 1.0, ph: float = 1.0) -> None:
    """Tile table -> HEAD74 LAN (8-bit or 16-bit), parallel per
    (band, tile-row) pwrite at closed-form BIL offsets."""
    if pix not in (0, 2):
        raise ValueError("writer supports 8-bit (0) and 16-bit (2)")
    lb = width_px if pix == 0 else 2 * width_px
    hdr = bytearray(HEADER_SIZE)
    hdr[0:6] = b"HEAD74"
    struct.pack_into("<hh", hdr, 6, pix, nbands)
    struct.pack_into("<ii", hdr, 16, width_px, height_px)
    struct.pack_into("<ffff", hdr, 112, ulx, uly, pw, ph)
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.truncate(HEADER_SIZE + lb * nbands * height_px)

    out_schema = T.StructType([T.StructField("k", T.StringType()),
                               T.StructField("n", T.LongType())])
    np_dt = np.uint8 if pix == 0 else np.dtype("<i2")

    def emit(key, pdf):
        band, ty = int(key[0]), int(key[1])
        r0 = ty * tile
        rows_here = min(height_px - r0, tile)
        strip = np.zeros((rows_here, width_px), np.float64)
        for r in pdf.itertuples(index=False):
            arr = decode_px(r.px, r.dtype, tile).astype(np.float64)
            x0 = int(r.tile_x) * tile
            ww = min(tile, width_px - x0)
            strip[:, x0:x0 + ww] = arr[:rows_here, :ww]
        raw = strip.astype(np_dt)
        fd = os.open(path, os.O_WRONLY)
        try:
            for r in range(rows_here):
                off = HEADER_SIZE + ((r0 + r) * nbands + band - 1) * lb
                os.pwrite(fd, raw[r].tobytes(), off)
        finally:
            os.close(fd)
        return pd.DataFrame({"k": [f"{band}/{ty}"], "n": [rows_here]})

    tiles.groupBy("band", "tile_y").applyInPandas(
        emit, out_schema).collect()
