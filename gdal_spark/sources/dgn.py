"""MicroStation DGN v7 source (Intergraph ISFF design files).

Reference behavior: ogr/ogrsf_frmts/dgn/dgnread.cpp (4-byte element
headers — level|complex in byte 0, type|deleted in byte 1, following-word
count in bytes 2-3; display header graphic_group@28 properties@32
style/weight@34 color@35; LINE vertices @36, LINE_STRING/SHAPE count@36 +
vertices@38, TEXT rotation@46 origin@50 chars@60; TCB units @1112/1116
and global origin doubles @1240 with scale = 1/(uor_per_subunit *
subunits_per_master)), the word-swapped DGN_INT32 layout
(dgnlibp.h:70) and the VAX D-float double codec (port/cpl_vax.cpp), and
ogrdgnlayer.cpp's feature mapping (Type/Level/GraphicGroup/ColorIndex/
Weight/Style/Text attributes; SHAPE closes to a polygon).

Spark-first: the driver scans only the element table of contents (one
4-byte header per element); element parsing fans out to executors by
byte range like the S-57/SpatiaLite readers. v1 scope: 2-D files, LINE /
LINE_STRING / SHAPE / TEXT elements (the types ogr2ogr users hit);
complex chains and shapes (types 12/14) assemble from their
complex-bit components; cells, arcs and 3-D files are skipped, not an
error.
"""

from __future__ import annotations

import math
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

import numpy as np

from ..core import wkb as W

DGNT_TCB = 9
DGNT_LINE = 3
DGNT_LINE_STRING = 4
DGNT_SHAPE = 6
DGNT_TEXT = 17
DGNT_CPLX_CHAIN = 12
DGNT_CPLX_SHAPE = 14


# ---------------------------------------------------------------------------
# primitive codecs
# ---------------------------------------------------------------------------

def dgn_int32(b: bytes, o: int) -> int:
    """Word-swapped int32 (dgnlibp.h DGN_INT32): two LE 16-bit words,
    HIGH word first."""
    v = (b[o] << 16) + (b[o + 1] << 24) + b[o + 2] + (b[o + 3] << 8)
    return v - (1 << 32) if v >= (1 << 31) else v


def enc_int32(v: int) -> bytes:
    v &= 0xffffffff
    return struct.pack("<HH", (v >> 16) & 0xffff, v & 0xffff)


def vax_to_double(b: bytes) -> float:
    """VAX D-float (word-swapped) -> IEEE double (port/cpl_vax.cpp):
    sign<<31 | exp(8, bias 128, hidden 0.1 mantissa) | 55-bit fraction."""
    w = struct.unpack("<4H", b)
    hi = (w[0] << 16) | w[1]
    lo = (w[2] << 16) | w[3]
    sign = -1.0 if (hi >> 31) & 1 else 1.0
    e = (hi >> 23) & 0xff
    if e == 0:
        return 0.0
    m = ((hi & 0x7fffff) << 32) | lo
    return sign * (0.5 + m / float(1 << 56)) * 2.0 ** (e - 128)


def double_to_vax(v: float) -> bytes:
    if v == 0.0:
        return b"\x00" * 8
    sign = 1 if v < 0 else 0
    f, e = math.frexp(abs(v))          # 0.5 <= f < 1, v = f * 2^e
    ebits = e + 128
    if ebits <= 0:
        return b"\x00" * 8
    if ebits > 255:
        raise OverflowError("double out of VAX D range")
    m = int(round((f - 0.5) * (1 << 56)))
    if m >= (1 << 55):                 # rounding overflow: f -> 1.0
        m = 0
        ebits += 1
    hi = (sign << 31) | (ebits << 23) | (m >> 32)
    lo = m & 0xffffffff
    return struct.pack("<4H", (hi >> 16) & 0xffff, hi & 0xffff,
                       (lo >> 16) & 0xffff, lo & 0xffff)


# ---------------------------------------------------------------------------
# element stream
# ---------------------------------------------------------------------------

def scan_elements(path: str) -> list[tuple[int, int, int, int]]:
    """[(offset, byte length, byte0, byte1)] of every element; stops at
    the 0xffff end-of-file marker (dgnread.cpp DGNLoadRawElement).
    Bytes 0/1 carry level|complex and type|deleted — enough for the
    driver to group complex chains without reading bodies."""
    out = []
    with open(path, "rb") as f:
        off = 0
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            if head[0] == 0xff and head[1] == 0xff:
                break
            n_words = head[2] + head[3] * 256
            ln = n_words * 2 + 4
            out.append((off, ln, head[0], head[1]))
            f.seek(off + ln)
            off += ln
    return out


def parse_tcb(rec: bytes) -> tuple[float, float, float, int]:
    """TCB -> (scale, origin_x, origin_y, dimension) in master units."""
    sub_per_master = dgn_int32(rec, 1112)
    uor_per_sub = dgn_int32(rec, 1116)
    dim = 3 if (len(rec) > 1214 and rec[1214] & 0x40) else 2
    denom = float(uor_per_sub * sub_per_master) \
        if uor_per_sub and sub_per_master else 1.0
    ox = vax_to_double(rec[1240:1248]) / denom if len(rec) >= 1256 else 0.0
    oy = vax_to_double(rec[1248:1256]) / denom if len(rec) >= 1256 else 0.0
    return 1.0 / denom, ox, oy, dim


def _parse_element(rec: bytes, scale: float, ox: float, oy: float,
                   allow_complex: bool = False):
    level = rec[0] & 0x3f
    etype = rec[1] & 0x7f
    if rec[1] & 0x80:                        # deleted
        return None
    if (rec[0] & 0x80) and not allow_complex:  # complex component
        return None
    gg = rec[28] + rec[29] * 256 if len(rec) >= 36 else 0
    style = rec[34] & 0x7 if len(rec) >= 36 else 0
    weight = (rec[34] & 0xf8) >> 3 if len(rec) >= 36 else 0
    color = rec[35] if len(rec) >= 36 else 0

    def tx(xu, yu):
        return xu * scale - ox, yu * scale - oy

    if etype == DGNT_LINE and len(rec) >= 52:
        p0 = tx(dgn_int32(rec, 36), dgn_int32(rec, 40))
        p1 = tx(dgn_int32(rec, 44), dgn_int32(rec, 48))
        g = W.Geom(W.LINESTRING, [np.array([p0, p1])])
    elif etype in (DGNT_LINE_STRING, DGNT_SHAPE) and len(rec) >= 40:
        count = rec[36] + rec[37] * 256
        count = min(count, (len(rec) - 38) // 8)
        pts = [tx(dgn_int32(rec, 38 + i * 8), dgn_int32(rec, 42 + i * 8))
               for i in range(count)]
        if count < 2:
            return None
        if etype == DGNT_SHAPE:
            if pts[0] != pts[-1]:
                pts.append(pts[0])
            g = W.Geom(W.POLYGON, [np.array(pts)])
        else:
            g = W.Geom(W.LINESTRING, [np.array(pts)])
    elif etype == DGNT_TEXT and len(rec) >= 60:
        p = tx(dgn_int32(rec, 50), dgn_int32(rec, 54))
        g = W.Geom(W.POINT, [np.array([p])])
        n = rec[58]
        txt = rec[60:60 + n].decode("latin-1", "replace")
        rot = dgn_int32(rec, 46) / 360000.0
        return (etype, level, gg, color, weight, style, txt, rot,
                W.encode(g))
    else:
        return None
    return (etype, level, gg, color, weight, style, None, None,
            W.encode(g))


_SCHEMA = T.StructType([
    T.StructField("etype", T.IntegerType()),
    T.StructField("level", T.IntegerType()),
    T.StructField("graphic_group", T.IntegerType()),
    T.StructField("color", T.IntegerType()),
    T.StructField("weight", T.IntegerType()),
    T.StructField("style", T.IntegerType()),
    T.StructField("text", T.StringType()),
    T.StructField("rotation", T.DoubleType()),
    T.StructField("geom", T.BinaryType()),
])


def read_dgn(spark: SparkSession, path: str) -> DataFrame:
    """DGN v7 -> feature DataFrame (ogrdgnlayer.cpp field mapping).
    Complex chains/shapes (types 12/14): the driver assigns group ids
    from the TOC's complex bits alone (ogrdgnlayer.cpp bInComplexShape
    walk — a header starts a group, following complex-bit elements
    continue it); components parse wherever they land and stitch back
    per group, chain -> LineString, shape -> closed Polygon."""
    toc = scan_elements(path)
    scale, ox, oy, dim = 1.0, 0.0, 0.0, 2
    with open(path, "rb") as f:
        for off, ln, _b0, b1 in toc[:4]:
            if (b1 & 0x7f) == DGNT_TCB:
                f.seek(off)
                scale, ox, oy, dim = parse_tcb(f.read(ln))
                break
    if dim != 2:
        raise NotImplementedError("3-D DGN files not supported (v1)")
    rows = []
    grp, gkind = -1, 0
    for off, ln, b0, b1 in toc:
        t = b1 & 0x7f
        if t in (DGNT_CPLX_CHAIN, DGNT_CPLX_SHAPE) and not (b0 & 0x80):
            grp, gkind = off, t
            continue
        if grp >= 0 and (b0 & 0x80) and not (b1 & 0x80):
            rows.append((off, ln, grp, gkind))
        else:
            grp = -1
            rows.append((off, ln, -1, 0))
    rdf = spark.createDataFrame(rows, "off long, ln int, grp long, gk int") \
        .repartition(max(1, min(32, len(rows) // 128 + 1)))

    def gen(batches):
        for pdf in batches:
            out = []
            with open(path, "rb") as f:
                for off, ln, grp, gk in zip(pdf["off"], pdf["ln"],
                                            pdf["grp"], pdf["gk"]):
                    f.seek(int(off))
                    rec = f.read(int(ln))
                    if (rec[1] & 0x7f) in (DGNT_LINE, DGNT_LINE_STRING,
                                           DGNT_SHAPE, DGNT_TEXT):
                        r = _parse_element(rec, scale, ox, oy,
                                           allow_complex=int(grp) >= 0)
                        if r is not None:
                            out.append((int(off), int(grp), int(gk)) + r)
            yield pd.DataFrame(out, columns=["off", "grp", "gk"]
                               + [f_.name for f_ in _SCHEMA])

    parsed = rdf.mapInPandas(gen, "off long, grp long, gk int, "
                             + ", ".join(f"{f_.name} {f_.dataType.simpleString()}"
                                         for f_ in _SCHEMA))
    simple = parsed.where(F.col("grp") < 0) \
        .select(*[f_.name for f_ in _SCHEMA])

    comp = parsed.where(F.col("grp") >= 0)
    stitched = comp.groupBy("grp", "gk").applyInPandas(
        _stitch_group, _SCHEMA)
    return simple.unionByName(stitched)


def _stitch_group(key, pdf):
    """Concatenate a complex group's component linework in element order
    (shared endpoints dedup); chain (12) -> LineString, shape (14) ->
    closed Polygon (ogrdgnlayer.cpp ConsiderBrush/complex assembly)."""
    import pandas as pd

    pdf = pdf.sort_values("off")
    pts: list[tuple[float, float]] = []
    first = None
    for r in pdf.itertuples(index=False):
        g = W.decode(bytes(r.geom))
        if first is None:
            first = r
        for ring in (g.rings or [p.rings[0] for p in g.parts]):
            seq = [tuple(p) for p in ring]
            if pts and pts[-1] == seq[0]:
                pts.extend(seq[1:])
            else:
                pts.extend(seq)
    if len(pts) < 2 or first is None:
        return pd.DataFrame(columns=[f_.name for f_ in _SCHEMA])
    gk = int(key[1])
    if gk == DGNT_CPLX_SHAPE:
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        g = W.Geom(W.POLYGON, [np.array(pts)])
    else:
        g = W.Geom(W.LINESTRING, [np.array(pts)])
    row = (gk, first.level, first.graphic_group, first.color,
           first.weight, first.style, None, None, W.encode(g))
    return pd.DataFrame([row], columns=[f_.name for f_ in _SCHEMA])


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------

def _elem(etype: int, level: int, body: bytes, color: int = 0,
          gg: int = 0) -> bytes:
    # display header: 24-byte range (zeros ok for the reader) + group +
    # attr index + properties + symbology
    disp = (b"\x00" * 24 + struct.pack("<H", gg)
            + struct.pack("<H", 0) + struct.pack("<H", 0)
            + bytes([0, color]))
    payload = disp + body
    if len(payload) % 2:
        payload += b"\x00"
    n_words = len(payload) // 2
    return bytes([level & 0x3f, etype & 0x7f,
                  n_words & 0xff, n_words >> 8]) + payload


def write_dgn(path: str, elements, uor_per_sub: int = 1000,
              sub_per_master: int = 1000,
              origin: tuple[float, float] = (0.0, 0.0)) -> None:
    """Deterministic v7 fixture encoder. elements: list of
    ('line', [(x,y),(x,y)]) | ('linestring', pts) | ('shape', pts) |
    ('text', (x, y), 'string', rotation_deg); coords in master units."""
    uor = float(uor_per_sub * sub_per_master)
    tcb = bytearray(1536)
    tcb[0] = 8
    tcb[1] = DGNT_TCB
    nw = (1536 - 4) // 2
    tcb[2] = nw & 0xff
    tcb[3] = nw >> 8
    tcb[1112:1116] = enc_int32(sub_per_master)
    tcb[1116:1120] = enc_int32(uor_per_sub)
    tcb[1120:1122] = b"m "
    tcb[1122:1124] = b"mm"
    tcb[1240:1248] = double_to_vax(origin[0] * uor)
    tcb[1248:1256] = double_to_vax(origin[1] * uor)
    recs = [bytes(tcb)]

    def u(v, o):
        return int(round((v + o) * uor))

    for spec in elements:
        kind = spec[0]
        if kind == "line":
            pts = spec[1]
            body = (enc_int32(u(pts[0][0], origin[0]))
                    + enc_int32(u(pts[0][1], origin[1]))
                    + enc_int32(u(pts[1][0], origin[0]))
                    + enc_int32(u(pts[1][1], origin[1])))
            recs.append(_elem(DGNT_LINE, 1, body))
        elif kind in ("linestring", "shape"):
            pts = spec[1]
            body = struct.pack("<H", len(pts)) + b"".join(
                enc_int32(u(x, origin[0])) + enc_int32(u(y, origin[1]))
                for x, y in pts)
            et = DGNT_SHAPE if kind == "shape" else DGNT_LINE_STRING
            recs.append(_elem(et, 2, body))
        elif kind in ("complex_chain", "complex_shape"):
            parts = spec[1]          # list of vertex lists (LINE_STRINGs)
            comp = []
            for pts in parts:
                body = struct.pack("<H", len(pts)) + b"".join(
                    enc_int32(u(x, origin[0])) + enc_int32(u(y, origin[1]))
                    for x, y in pts)
                comp.append(_elem(DGNT_LINE_STRING, 2, body))
            tot_words = sum(len(c) // 2 - 2 for c in comp)
            hdr = struct.pack("<HH", tot_words, len(comp))
            et = DGNT_CPLX_SHAPE if kind == "complex_shape" \
                else DGNT_CPLX_CHAIN
            recs.append(_elem(et, 2, hdr))
            for c in comp:
                recs.append(bytes([c[0] | 0x80]) + c[1:])  # complex bit
        elif kind == "text":
            (x, y), txt, rot = spec[1], spec[2], spec[3]
            body = (bytes([0, 0]) + enc_int32(1) + enc_int32(1)
                    + enc_int32(int(round(rot * 360000.0)))
                    + enc_int32(u(x, origin[0]))
                    + enc_int32(u(y, origin[1]))
                    + bytes([len(txt), 0])
                    + txt.encode("latin-1"))
            recs.append(_elem(DGNT_TEXT, 3, body))
        else:
            raise ValueError(kind)
    with open(path, "wb") as f:
        f.write(b"".join(recs) + b"\xff\xff")
