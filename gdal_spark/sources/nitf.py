"""NITF 2.1 raster source (frmts/nitf/nitfdataset.cpp, MIL-STD-2500C) —
uncompressed (IC=NC) image segments.

The fixed-width ASCII file header and image subheader parse on the
driver; pixel data is NBPR x NBPC blocks of NPPBH x NPPBV pixels at
closed-form offsets, so — like ISIS3 tiled cores — every Spark task
pread()s exactly its block. IMODE B (band-interleaved by block), S
(band sequential), P (pixel interleaved within block) and R (row
interleaved) all reduce to per-block offset+stride math. PVTYPE
INT/SI/R x NBPP -> dtype (big-endian per spec).

Pinned against the reference autotest fixture rgb.ntf (3 bands,
checksum 21349 — autotest/gdrivers/nitf.py:375).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from ..raster.tiles import TILE_SCHEMA, encode_px

_COLS = [f.name for f in TILE_SCHEMA.fields]


class _R:
    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.p = pos

    def take(self, n: int) -> str:
        s = self.d[self.p:self.p + n].decode("ascii", errors="replace")
        self.p += n
        return s

    def num(self, n: int) -> int:
        return int(self.take(n) or 0)


def parse_nitf_header(data: bytes) -> dict:
    r = _R(data)
    fhdr = r.take(9)
    if not fhdr.startswith("NITF02.1"):
        raise ValueError(f"unsupported NITF version {fhdr!r}")
    r.take(2 + 4 + 10 + 14 + 80 + 1)        # CLEVEL..FSCLAS
    r.take(2 + 11 + 2 + 20 + 2 + 8 + 4 + 1 + 8 + 43 + 1 + 40 + 1
           + 8 + 15)                         # security block
    r.take(5 + 5 + 1 + 3 + 24 + 18)          # FSCOP..OPHONE
    r.num(12)                                # FL
    hl = r.num(6)
    numi = r.num(3)
    segs = []
    for _ in range(numi):
        lish = r.num(6)
        li = r.num(10)
        segs.append((lish, li))
    nums = r.num(3)
    for _ in range(nums):
        r.take(4 + 6)
    r.num(3)                                 # NUMX (reserved)
    numt = r.num(3)
    for _ in range(numt):
        r.take(4 + 5)
    numdes = r.num(3)
    for _ in range(numdes):
        r.take(4 + 9)
    numres = r.num(3)
    for _ in range(numres):
        r.take(4 + 7)
    return {"hl": hl, "segments": segs}


def parse_image_subheader(data: bytes, pos: int) -> dict:
    r = _R(data, pos)
    if r.take(2) != "IM":
        raise ValueError("not an image segment")
    r.take(10 + 14 + 17 + 80 + 1)            # IID1..ISCLAS
    r.take(2 + 11 + 2 + 20 + 2 + 8 + 4 + 1 + 8 + 43 + 1 + 40 + 1
           + 8 + 15)                         # security block
    r.take(1 + 42)                           # ENCRYP, ISORCE
    nrows = r.num(8)
    ncols = r.num(8)
    pvtype = r.take(3).strip()
    r.take(8 + 8)                            # IREP, ICAT
    r.num(2)                                 # ABPP
    r.take(1)                                # PJUST
    icords = r.take(1)
    igeolo = r.take(60) if icords.strip() else ""
    nicom = r.num(1)
    for _ in range(nicom):
        r.take(80)
    ic = r.take(2)
    if ic not in ("NC", "NM", "C8", "M8"):
        raise ValueError(f"unsupported NITF compression (IC={ic})")
    if ic != "NC":
        r.take(4)                            # COMRAT
    nbands = r.num(1)
    if nbands == 0:
        nbands = r.num(5)                    # XBANDS
    for _ in range(nbands):
        r.take(2 + 6 + 1 + 3)                # IREPBAND..IMFLT
        nluts = r.num(1)
        if nluts:
            nelut = r.num(5)
            r.p += nluts * nelut
    r.num(1)                                 # ISYNC
    imode = r.take(1)
    nbpr = r.num(4)
    nbpc = r.num(4)
    nppbh = r.num(4)
    nppbv = r.num(4)
    nbpp = r.num(2)
    r.take(3 + 3 + 10 + 4)                   # IDLVL, IALVL, ILOC, IMAG
    udidl = r.num(5)
    if udidl:
        r.take(3)
        r.p += udidl - 3
    ixshdl = r.num(5)
    if ixshdl:
        r.take(3)
        r.p += ixshdl - 3
    if pvtype == "SI":
        kind = "i"
    elif pvtype == "R":
        kind = "f"
    else:
        kind = "u"
    return {"nrows": nrows, "ncols": ncols, "nbands": nbands,
            "imode": imode, "nbpr": nbpr, "nbpc": nbpc,
            "nppbh": nppbh, "nppbv": nppbv, "nbpp": nbpp,
            "dtype": f"{kind}{max(1, nbpp // 8)}", "ic": ic,
            "igeolo": igeolo, "subheader_end": r.p, "mask": ic == "NM"}


def _read_nitf_jp2(spark, path, hdr, sub, data0):
    """IC=C8/M8 image segment -> tile table via the J2K decoder."""
    li = hdr["segments"][0][1]
    nb = sub["nbands"]
    tile = 256
    dst = np.dtype(sub["dtype"]).str.lstrip("<>=|")
    sdf = spark.createDataFrame([(0,)], "i long")

    def parse(batches):
        from ..core import vsi
        from ..raster.j2k import decode_j2k, extract_codestream
        for pdf in batches:
            out = []
            for _ in pdf.itertuples(index=False):
                raw = vsi.pread(path, data0, li)
                arr = decode_j2k(extract_codestream(raw))
                for b in range(arr.shape[0]):
                    plane = arr[b].astype(dst)
                    h, w = plane.shape
                    for ty in range(-(-h // tile)):
                        for tx in range(-(-w // tile)):
                            blk = np.zeros((tile, tile), plane.dtype)
                            s = plane[ty * tile:(ty + 1) * tile,
                                      tx * tile:(tx + 1) * tile]
                            blk[:s.shape[0], :s.shape[1]] = s
                            out.append((b + 1, 0, tx, ty,
                                        blk.dtype.str[1:], None,
                                        encode_px(blk)))
            yield pd.DataFrame(out, columns=_COLS)

    meta = {"width": sub["ncols"], "height": sub["nrows"],
            "bands": nb, "tile": tile, "imode": sub["imode"],
            "dtype": sub["dtype"], "igeolo": sub["igeolo"],
            "ic": sub["ic"]}
    return sdf.mapInPandas(parse, TILE_SCHEMA), meta


def read_nitf(spark: SparkSession, path: str):
    """.ntf (first image segment, IC=NC) -> (tile table, meta); one
    task per stored block, engine tile size = NPPBH (blocks must be
    square, the common case)."""
    with open(path, "rb") as f:
        head = f.read(1 << 20)
    hdr = parse_nitf_header(head)
    seg_off = hdr["hl"]
    sub = parse_image_subheader(head, seg_off)
    # data start comes from the file header's LISH (subheader length),
    # exactly like the reference (nitflib segment table) — writers pad
    # subheaders, so the parsed field walk is metadata-only
    data0 = seg_off + hdr["segments"][0][0]
    if sub["mask"] or sub["ic"] == "M8":
        # NM/M8: a block-mask table precedes the data (IMDATOFF u32)
        imdatoff = int.from_bytes(head[data0:data0 + 4], "big")
        data0 += imdatoff
    if sub["ic"] in ("C8", "M8"):
        # JP2-in-NITF (the reference's JPEG2000 codestream segment,
        # nitfdataset.cpp IC=C8): the whole segment is one JP2/J2K
        # codestream — decode through the from-scratch T.800 decoder
        # (5/3 AND 9/7) in one executor task; multi-tile codestreams
        # could fan out by SOT chain like sources/jp2.py.
        return _read_nitf_jp2(spark, path, hdr, sub, data0)
    if sub["nppbh"] != sub["nppbv"]:
        raise ValueError("non-square NITF blocks unsupported")
    tile = sub["nppbh"]
    item = max(1, sub["nbpp"] // 8)
    dt = np.dtype(">" + sub["dtype"])
    nb, nbpr, nbpc = sub["nbands"], sub["nbpr"], sub["nbpc"]
    blockpx = tile * tile
    imode = sub["imode"]

    jobs = []
    for by in range(nbpc):
        for bx in range(nbpr):
            bi = by * nbpr + bx
            jobs.append((bx, by, bi))
    sdf = spark.createDataFrame(jobs, "bx long, by long, bi long")

    def parse(batches):
        for pdf in batches:
            out = []
            for s in pdf.itertuples(index=False):
                with open(path, "rb") as f:
                    if imode == "S":          # all blocks of band b
                        planes = []
                        for b in range(nb):
                            f.seek(data0 + (b * nbpr * nbpc + s.bi)
                                   * blockpx * item)
                            raw = f.read(blockpx * item)
                            planes.append(np.frombuffer(
                                raw, dt).reshape(tile, tile))
                    elif imode == "B":        # bands within the block
                        f.seek(data0 + s.bi * blockpx * item * nb)
                        raw = f.read(blockpx * item * nb)
                        a = np.frombuffer(raw, dt).reshape(
                            nb, tile, tile)
                        planes = [a[b] for b in range(nb)]
                    elif imode == "P":        # pixel-interleaved block
                        f.seek(data0 + s.bi * blockpx * item * nb)
                        raw = f.read(blockpx * item * nb)
                        a = np.frombuffer(raw, dt).reshape(
                            tile, tile, nb)
                        planes = [a[:, :, b] for b in range(nb)]
                    elif imode == "R":        # row-interleaved block
                        f.seek(data0 + s.bi * blockpx * item * nb)
                        raw = f.read(blockpx * item * nb)
                        a = np.frombuffer(raw, dt).reshape(
                            tile, nb, tile)
                        planes = [a[:, b, :] for b in range(nb)]
                    else:
                        raise ValueError(f"IMODE {imode!r} unsupported")
                for b, plane in enumerate(planes, 1):
                    block = np.ascontiguousarray(plane).astype(
                        dt.newbyteorder("=").str.lstrip("<>=|"))
                    out.append((b, 0, s.bx, s.by, block.dtype.str[1:],
                                None, encode_px(block)))
            yield pd.DataFrame(out, columns=_COLS)

    meta = {"width": sub["ncols"], "height": sub["nrows"],
            "bands": nb, "tile": tile, "imode": imode,
            "dtype": sub["dtype"], "igeolo": sub["igeolo"]}
    return sdf.mapInPandas(parse, TILE_SCHEMA), meta


def write_nitf(tiles, path: str, *, width: int, height: int,
               tile: int = 256, dtype: str = "u1") -> None:
    """Tile table (band 1) -> one NITF 2.1 file, IC=NC, IMODE=B, one
    image segment, square NPPBH=NPPBV=tile blocks. Blocks pwrite in
    parallel at closed-form offsets (the same layout the reader
    preads); the header carries exact FL/HL/LISH/LI lengths."""
    import os

    import pandas as pd
    from pyspark.sql import types as T

    nbpr, nbpc = -(-width // tile), -(-height // tile)
    item = np.dtype(dtype).itemsize
    nbpp = item * 8
    pvtype = {"u": "INT", "i": "SI", "f": "R"}[dtype[0]]
    li = nbpr * nbpc * tile * tile * item

    sec = " " * (2 + 11 + 2 + 20 + 2 + 8 + 4 + 1 + 8 + 43 + 1 + 40
                 + 1 + 8 + 15)
    sub = ("IM" + "gdal_spark".ljust(10) + "20260101000000"
           + " " * 17 + " " * 80 + "U" + sec + "0" + "gdal_spark".ljust(42)
           + f"{height:08d}{width:08d}" + pvtype.ljust(3)
           + "MONO".ljust(8) + "VIS".ljust(8) + f"{nbpp:02d}" + "R" + " "
           + "0" + "NC" + "1" + "M ".ljust(2) + " " * 6 + "N" + " " * 3
           + "0" + "0" + "B" + f"{nbpr:04d}{nbpc:04d}{tile:04d}{tile:04d}"
           + f"{nbpp:02d}" + "001" + "000" + "0" * 10 + "1.0 "
           + "00000" + "00000")
    lish = len(sub)
    # file header: fixed fields up to FL, then lengths
    fh_head = ("NITF02.10" + "03" + "BF01" + "gdal_spark".ljust(10)
               + "20260101000000" + " " * 80 + "U" + sec
               + "00000" + "00000" + "0" + "\x00\x00\x00"
               + " " * 24 + " " * 18)
    tail = (f"{lish:06d}{li:010d}" + "000" + "000" + "000" + "000"
            + "000" + "00000" + "00000")
    hl = len(fh_head) + 12 + 6 + 3 + len(tail)
    fl = hl + lish + li
    header = (fh_head + f"{fl:012d}" + f"{hl:06d}" + "001"
              + tail).encode("latin-1")
    assert len(header) == hl
    data0 = hl + lish
    with open(path, "wb") as f:
        f.write(header + sub.encode("ascii"))
        f.truncate(fl)

    out_schema = T.StructType([T.StructField("tx", T.LongType()),
                               T.StructField("ty", T.LongType())])
    blockbytes = tile * tile * item

    def emit(key, pdf):
        tx, ty = int(key[0]), int(key[1])
        from ..raster.tiles import decode_px
        arr = decode_px(pdf["px"].iloc[0], pdf["dtype"].iloc[0],
                        tile).astype(np.dtype(">" + dtype))
        fd = os.open(path, os.O_WRONLY)
        try:
            os.pwrite(fd, arr.tobytes(),
                      data0 + (ty * nbpr + tx) * blockbytes)
        finally:
            os.close(fd)
        return pd.DataFrame({"tx": [tx], "ty": [ty]})

    tiles.where("band = 1").groupBy("tile_x", "tile_y") \
        .applyInPandas(emit, out_schema).collect()
