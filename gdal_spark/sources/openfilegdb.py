"""ESRI File Geodatabase (OpenFileGDB) vector source — .gdb directories.

Reference behavior: ogr/ogrsf_frmts/openfilegdb/filegdbtable.cpp (the
reverse-engineered .gdbtable/.gdbtablx reader: 40-byte header with the
field-descriptor offset at byte 32, UTF-16 field descriptors, per-row
nullable bitmap + packed values, varuint-framed string/binary/geometry
payloads) and ogropenfilegdbdatasource.cpp (GDB_SystemCatalog row FID n
-> layer file a{n:08x}.gdbtable).  Geometry blobs are ESRI extended
shape buffers (filegdbtable.cpp GetAsGeometry): a varuint shape type
whose high bits carry Z/M/curve flags, point coordinates stored as
varuint((v - origin) * scale + 1), and array coordinates stored as
DELTA-coded signed varints of the same quantization, parts framed by
ReadPartDefs (npoints, nparts, 4-varuint bbox, nparts-1 point counts).

Spark-first layout: the driver preads ONLY bounded metadata — the
40-byte header, the field-descriptor section (fd_len bytes, KBs), the
16-byte .gdbtablx header, its 16-byte trailer and (for sparse tables)
the 1-bit-per-1024-rows block map.  Row decode fans out to executors
by 1024-row .gdbtablx blocks: each task preads its slice of the offset
array, coalesces adjacent row spans into ranged reads through the
core.vsi seam, and decodes rows vectorized per Arrow batch.  A
10^9-row table is ~10^6 blocks = one tiny driver array; all row bytes
move executor-side, so the layout survives a 1000-executor cluster
against object storage once a ranged backend is registered in
core.vsi.

v1 contract (documented simplifications vs the reference):
  * curve segment descriptors are ignored — curve geometries decode
    with straight segments between their control points, exactly the
    reference's own fallback when CreateCurveGeometry fails
    (filegdbtable.cpp:3999-4007);
  * Z/M arrays are parsed (to keep the value cursor correct) but the
    emitted WKB is 2-D, the engine-wide v1 geometry contract;
  * multipatch shells decode as MULTIPOLYGON rings without
    triangle-strip/fan expansion.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import vsi
from ..core import wkb as W
from ..core.geomops import points_in_ring, ring_area

# FileGDBFieldType (filegdbtable.h:51-68)
FGFT_INT16 = 0
FGFT_INT32 = 1
FGFT_FLOAT32 = 2
FGFT_FLOAT64 = 3
FGFT_STRING = 4
FGFT_DATETIME = 5
FGFT_OBJECTID = 6
FGFT_GEOMETRY = 7
FGFT_BINARY = 8
FGFT_RASTER = 9
FGFT_GUID = 10
FGFT_GLOBALID = 11
FGFT_XML = 12
FGFT_INT64 = 13
FGFT_DATE = 14
FGFT_TIME = 15
FGFT_DATETIME_OFFSET = 16

# extended shape-type flag bits (filegdbtable.cpp:53-55)
EXT_Z = 0x80000000
EXT_M = 0x40000000
EXT_CURVE = 0x20000000

# shape types (ogr/ogrpgeogeometry.h:20-52)
SHPT_NULL = 0
_POINTS = {1, 9, 11, 21, 52}
_MULTIPOINTS = {8, 18, 20, 28, 53}
_LINES = {3, 10, 13, 23, 50}
_POLYGONS = {5, 15, 19, 25, 51}
_MULTIPATCH = {31, 32, 54}
_HAS_Z = {9, 11, 18, 20, 10, 13, 19, 15}
_HAS_M = {21, 11, 28, 18, 23, 13, 25, 15, 31}

# days between 1899-12-30 (the FileGDB datetime epoch) and 1970-01-01
_EPOCH_DAYS = 25569.0


def _varuint(b: bytes, i: int):
    v = 0
    sh = 0
    while True:
        x = b[i]
        i += 1
        v |= (x & 0x7F) << sh
        if not (x & 0x80):
            return v, i
        sh += 7


def _varint_delta(b: bytes, i: int):
    """Signed varint (filegdbtable.cpp ReadVarIntAndAddNoCheck): first
    byte has 6 value bits + sign bit 0x40, continuations 7 bits."""
    x = b[i]
    i += 1
    v = x & 0x3F
    neg = bool(x & 0x40)
    if x & 0x80:
        sh = 6
        while True:
            x = b[i]
            i += 1
            v |= (x & 0x7F) << sh
            if not (x & 0x80):
                break
            sh += 7
    return (-v if neg else v), i


def _enc_varuint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_varint_delta(v: int) -> bytes:
    neg = v < 0
    v = -v if neg else v
    first = (v & 0x3F) | (0x40 if neg else 0)
    v >>= 6
    if v:
        out = bytearray([first | 0x80])
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)
    return bytes([first])


# ---------------------------------------------------------------------------
# driver-side bounded metadata
# ---------------------------------------------------------------------------

class GdbField:
    __slots__ = ("name", "ftype", "nullable", "width",
                 "xorigin", "yorigin", "xyscale", "zorigin", "zscale",
                 "morigin", "mscale")

    def __init__(self, name, ftype, nullable, width=0):
        self.name = name
        self.ftype = ftype
        self.nullable = nullable
        self.width = width
        self.xorigin = self.yorigin = 0.0
        self.xyscale = 1.0
        self.zorigin = self.morigin = 0.0
        self.zscale = self.mscale = 1.0


class GdbTableInfo:
    """Bounded driver-side view of one .gdbtable/.gdbtablx pair: header,
    field descriptors, offset-array geometry.  Never reads row bytes."""

    def __init__(self, base: str):
        self.base = base
        hdr = vsi.pread(base + ".gdbtable", 0, 40)
        if len(hdr) < 40:
            raise ValueError(f"short .gdbtable header: {base}")
        self.version = struct.unpack_from("<i", hdr, 0)[0]
        if self.version == 3:
            self.n_valid = struct.unpack_from("<i", hdr, 4)[0]
        elif self.version == 4:
            # V4 (ArcGIS Pro 3.2+): 64-bit row count at byte 16
            # (filegdbtable.cpp:869-874)
            self.n_valid = struct.unpack_from("<q", hdr, 16)[0]
        else:
            raise ValueError(
                f"unsupported .gdbtable version {self.version}")
        self.max_row_size = struct.unpack_from("<I", hdr, 8)[0]
        off_fd = struct.unpack_from("<Q", hdr, 32)[0]
        fd_head = vsi.pread(base + ".gdbtable", off_fd, 14)
        fd_len = struct.unpack_from("<I", fd_head, 0)[0]
        if fd_len > 10 * 1024 * 1024 or fd_len < 10:
            raise ValueError(f"implausible field-descriptor length {fd_len}")
        self.geom_type_code = fd_head[8]
        self.utf8 = bool(fd_head[9] & 1)
        self.table_has_m = bool(fd_head[11] & 0x40)
        self.table_has_z = bool(fd_head[11] & 0x80)
        nfields = struct.unpack_from("<H", fd_head, 12)[0]
        body = vsi.pread(base + ".gdbtable", off_fd + 14, fd_len - 10)
        self.fields: list[GdbField] = []
        self.geom_field: GdbField | None = None
        self.wkt = ""
        self._parse_fields(body, nfields)
        self.n_nullable = sum(1 for f in self.fields if f.nullable)
        self.null_bytes = (self.n_nullable + 7) // 8
        self._parse_tablx()

    # -- field descriptors (filegdbtable.cpp:1033-1460) -------------------
    def _parse_fields(self, b: bytes, nfields: int) -> None:
        i = 0
        for _ in range(nfields):
            nc = b[i]
            i += 1
            name = b[i:i + 2 * nc].decode("utf-16-le")
            i += 2 * nc
            nc = b[i]
            i += 1
            i += 2 * nc                      # alias, unused here
            ftype = b[i]
            i += 1
            if ftype not in (FGFT_GEOMETRY, FGFT_RASTER):
                width = 0
                if ftype == FGFT_STRING:
                    width = struct.unpack_from("<i", b, i)[0]
                    flags = b[i + 4]
                    i += 5
                    dlen, i = _varuint(b, i)
                elif ftype in (FGFT_OBJECTID, FGFT_BINARY, FGFT_GUID,
                               FGFT_GLOBALID, FGFT_XML):
                    flags = b[i + 1]
                    i += 2
                    dlen = 0
                else:
                    flags = b[i + 1]
                    dlen = b[i + 2]
                    i += 3
                if flags & 4:                # MASK_EDITABLE: default value
                    i += dlen
                self.fields.append(
                    GdbField(name, ftype, bool(flags & 1), width))
                continue
            # geometry / raster descriptor
            flags = b[i + 1]
            i += 2
            fld = GdbField(name, ftype, bool(flags & 1))
            if ftype == FGFT_RASTER:
                nc = b[i]
                i += 1
                i += 2 * nc
            wkt_len = struct.unpack_from("<H", b, i)[0]
            i += 2
            wkt = b[i:i + wkt_len].decode("utf-16-le")
            i += wkt_len
            gf = b[i]
            i += 1
            g_has_m = bool(gf & 2)
            g_has_z = bool(gf & 4)
            if ftype == FGFT_GEOMETRY or gf > 0:
                fld.xorigin, fld.yorigin, fld.xyscale = \
                    struct.unpack_from("<3d", b, i)
                i += 24
                if g_has_m:
                    fld.morigin, fld.mscale = struct.unpack_from("<2d", b, i)
                    i += 16
                if g_has_z:
                    fld.zorigin, fld.zscale = struct.unpack_from("<2d", b, i)
                    i += 16
                i += 8                       # xy tolerance
                if g_has_m:
                    i += 8
                if g_has_z:
                    i += 8
            if ftype == FGFT_GEOMETRY:
                i += 32                      # xmin ymin xmax ymax
                if self.table_has_z:
                    i += 16
                if self.table_has_m:
                    i += 16
                i += 1                       # zero byte
                ngrid = struct.unpack_from("<I", b, i)[0]
                i += 4 + 8 * ngrid
                self.geom_field = fld
                self.wkt = wkt
            self.fields.append(fld)

    # -- .gdbtablx geometry (ReadTableXHeaderV3/V4) ------------------------
    def _parse_tablx(self) -> None:
        xp = self.base + ".gdbtablx"
        self.tablx = xp
        h = vsi.pread(xp, 0, 16)
        xver = struct.unpack_from("<I", h, 0)[0]
        self.blockmap = b""
        if self.version == 3:
            if xver != 3:
                raise ValueError(f".gdbtablx version {xver} != 3")
            nblocks = struct.unpack_from("<I", h, 4)[0]
            self.total_rows = struct.unpack_from("<i", h, 8)[0]
            self.offset_size = struct.unpack_from("<I", h, 12)[0]
            trailer_off = 16 + self.offset_size * 1024 * nblocks
            if nblocks:
                tr = vsi.pread(xp, trailer_off, 16)
                bitmap_words, bits_for_map = struct.unpack_from("<II", tr, 0)
                if bitmap_words:
                    nb = (bits_for_map + 7) // 8
                    self.blockmap = vsi.pread(xp, trailer_off + 16, nb)
        else:
            nblocks = struct.unpack_from("<Q", h, 4)[0]
            self.offset_size = struct.unpack_from("<I", h, 12)[0]
            trailer_off = 16 + self.offset_size * 1024 * nblocks
            tr = vsi.pread(xp, trailer_off, 12)
            self.total_rows = struct.unpack_from("<q", tr, 0)[0]
            bitmap_size = struct.unpack_from("<I", tr, 8)[0]
            # V4 bitmap section (filegdbtable.cpp:763-800): fixed-layout
            # 22-byte prefix + 32768-byte map + 52-byte suffix
            if bitmap_size == 22 + 32768 + 52:
                sec = vsi.pread(xp, trailer_off + 12, bitmap_size)
                if sec[:6] == b"\x01\x00\x01\x00\x00\x00":
                    self.blockmap = sec[22:22 + 32768]
        self.n_blocks_present = nblocks
        if not (4 <= self.offset_size <= 6):
            raise ValueError(f"bad tablx offset size {self.offset_size}")

    def block_plan(self, rows_per_task: int = 64 * 1024):
        """[(first_block, n_blocks, present_before)] — which 1024-row
        blocks each task decodes and how many present blocks precede it
        (the corrected index base into the offset array)."""
        total_blocks = (self.total_rows + 1023) // 1024
        if not self.blockmap:
            present = np.ones(total_blocks, bool)
        else:
            bm = np.frombuffer(self.blockmap, np.uint8)
            present = ((bm[:, None] >> np.arange(8)) & 1).astype(bool) \
                .reshape(-1)[:total_blocks]
        cum = np.concatenate([[0], np.cumsum(present)])
        per = max(1, rows_per_task // 1024)
        out = []
        for b0 in range(0, total_blocks, per):
            b1 = min(total_blocks, b0 + per)
            if present[b0:b1].any():
                out.append((b0, b1 - b0, int(cum[b0])))
        return out, present

    def read_offsets(self, first_block: int, n_blocks: int,
                     present_before: int, present: np.ndarray):
        """pread the offset-array slice for a run of blocks ->
        (fids int64[], offsets int64[]), absent rows dropped."""
        osz = self.offset_size
        pres = present[first_block:first_block + n_blocks]
        n_present = int(pres.sum())
        if n_present == 0:
            return np.array([], np.int64), np.array([], np.int64)
        raw = vsi.pread(self.tablx, 16 + osz * 1024 * present_before,
                        osz * 1024 * n_present)
        a = np.frombuffer(raw, np.uint8).reshape(-1, osz)
        pad = np.zeros((a.shape[0], 8 - osz), np.uint8)
        offs = np.ascontiguousarray(
            np.hstack([a, pad])).view("<u8").ravel().astype(np.int64)
        blocks = np.nonzero(pres)[0] + first_block
        fids = (blocks[:, None] * 1024
                + np.arange(1024)[None, :]).ravel() + 1
        keep = offs > 0
        # clip fids beyond total_rows (last partial block)
        keep &= fids <= self.total_rows
        return fids[keep], offs[keep]


# ---------------------------------------------------------------------------
# geometry blob decode (filegdbtable.cpp GetAsGeometry)
# ---------------------------------------------------------------------------

def decode_shape(blob: bytes, gf: GdbField):
    """ESRI extended shape buffer -> core.wkb Geom (2-D)."""
    i = 0
    gtype, i = _varuint(blob, i)
    st = gtype & 0xFF
    has_z = bool(gtype & EXT_Z) or st in _HAS_Z
    has_m = bool(gtype & EXT_M) or st in _HAS_M
    has_curves = bool(gtype & EXT_CURVE)
    sc, xo, yo = gf.xyscale, gf.xorigin, gf.yorigin
    if st == SHPT_NULL:
        return None
    if st in _POINTS:
        x, i = _varuint(blob, i)
        y, i = _varuint(blob, i)
        if x == 0 or y == 0:
            return None
        return W.Geom(W.POINT, [np.array(
            [[(x - 1) / sc + xo, (y - 1) / sc + yo]])])
    if st in _MULTIPOINTS:
        n, i = _varuint(blob, i)
        if n == 0:
            return W.Geom(W.MULTIPOINT, parts=[])
        for _ in range(4):
            _, i = _varuint(blob, i)
        dx = dy = 0
        pts = np.empty((n, 2), np.float64)
        for k in range(n):
            d, i = _varint_delta(blob, i)
            dx += d
            d, i = _varint_delta(blob, i)
            dy += d
            pts[k, 0] = dx / sc + xo
            pts[k, 1] = dy / sc + yo
        return W.Geom(W.MULTIPOINT,
                      parts=[W.Geom(W.POINT, [pts[k:k + 1]])
                             for k in range(n)])
    if st in _LINES | _POLYGONS | _MULTIPATCH:
        n, i = _varuint(blob, i)
        is_line = st in _LINES
        if n == 0:
            return W.Geom(W.MULTILINESTRING if is_line else W.MULTIPOLYGON,
                          parts=[])
        if st in _MULTIPATCH:
            _, i = _varuint(blob, i)         # extra varuint (ReadPartDefs)
        nparts, i = _varuint(blob, i)
        if has_curves and st not in _MULTIPATCH:
            _, i = _varuint(blob, i)         # ncurves: descriptors ignored
        for _ in range(4):
            _, i = _varuint(blob, i)         # quantized bbox
        counts = []
        s = 0
        for _ in range(nparts - 1):
            c, i = _varuint(blob, i)
            counts.append(c)
            s += c
        counts.append(n - s)
        if st in _MULTIPATCH:
            # nparts part-type varuints precede the XY array
            # (filegdbtable.cpp:4321-4332); ring organization below
            # treats every part as one ring (v1 simplification)
            for _ in range(nparts):
                _, i = _varuint(blob, i)
        dx = dy = 0
        parts = []
        for c in counts:
            pts = np.empty((c, 2), np.float64)
            for k in range(c):
                d, i = _varint_delta(blob, i)
                dx += d
                d, i = _varint_delta(blob, i)
                dy += d
                pts[k, 0] = dx / sc + xo
                pts[k, 1] = dy / sc + yo
            parts.append(pts)
        # Z/M arrays follow; 2-D WKB contract, cursor need not advance
        if is_line:
            if len(parts) == 1:
                return W.Geom(W.LINESTRING, [parts[0]])
            return W.Geom(W.MULTILINESTRING,
                          parts=[W.Geom(W.LINESTRING, [p]) for p in parts])
        # polygon ring rule: shells CW (negative shoelace), holes CCW —
        # same convention as the shapefile reader (shpopen.c ring rule)
        shells = [r for r in parts if ring_area(r) < 0]
        holes = [r for r in parts if ring_area(r) >= 0]
        if not shells:
            shells, holes = parts, []
        polys = [[sh] for sh in shells]
        for h in holes:
            for cand in polys:
                if points_in_ring(h[:1, 0], h[:1, 1], cand[0])[0]:
                    cand.append(h)
                    break
            else:
                polys[0].append(h)
        if len(polys) == 1:
            return W.Geom(W.POLYGON, polys[0])
        return W.Geom(W.MULTIPOLYGON,
                      parts=[W.Geom(W.POLYGON, rs) for rs in polys])
    raise ValueError(f"unsupported shape type {st}")


def encode_shape(g, gf: GdbField) -> bytes:
    """Geom -> ESRI extended shape buffer (the writer's inverse)."""
    sc, xo, yo = gf.xyscale, gf.xorigin, gf.yorigin

    def q(v, o):
        return int(round((v - o) * sc))

    if g is None:
        return _enc_varuint(SHPT_NULL)
    if g.gtype == W.POINT:
        p = g.rings[0][0]
        return (_enc_varuint(1) + _enc_varuint(q(p[0], xo) + 1)
                + _enc_varuint(q(p[1], yo) + 1))
    if g.gtype == W.MULTIPOINT:
        pts = np.vstack([p.rings[0][0] for p in g.parts]) if g.parts \
            else np.empty((0, 2))
        out = bytearray(_enc_varuint(8) + _enc_varuint(len(pts)))
        if not len(pts):
            return bytes(out)
        qx = np.array([q(v, xo) for v in pts[:, 0]])
        qy = np.array([q(v, yo) for v in pts[:, 1]])
        for v in (qx.min(), qy.min(), qx.max() - qx.min(),
                  qy.max() - qy.min()):
            out += _enc_varuint(int(v))
        dx = dy = 0
        for k in range(len(pts)):
            out += _enc_varint_delta(int(qx[k]) - dx)
            dx = int(qx[k])
            out += _enc_varint_delta(int(qy[k]) - dy)
            dy = int(qy[k])
        return bytes(out)
    if g.gtype in (W.LINESTRING, W.MULTILINESTRING,
                   W.POLYGON, W.MULTIPOLYGON):
        is_line = g.gtype in (W.LINESTRING, W.MULTILINESTRING)
        if is_line:
            parts = [g.rings[0]] if g.gtype == W.LINESTRING else \
                [p.rings[0] for p in g.parts]
        else:
            parts = []
            for ring_set in g.polygons():
                for j, r in enumerate(ring_set):
                    r = np.asarray(r, np.float64)
                    if not np.array_equal(r[0], r[-1]):
                        r = np.vstack([r, r[:1]])
                    a = ring_area(r)
                    if (j == 0 and a > 0) or (j > 0 and a < 0):
                        r = r[::-1]
                    parts.append(r)
        qparts = [(np.array([q(v, xo) for v in p[:, 0]]),
                   np.array([q(v, yo) for v in p[:, 1]])) for p in parts]
        n = sum(len(p[0]) for p in qparts)
        out = bytearray(_enc_varuint(3 if is_line else 5))
        out += _enc_varuint(n) + _enc_varuint(len(parts))
        allx = np.concatenate([p[0] for p in qparts])
        ally = np.concatenate([p[1] for p in qparts])
        for v in (allx.min(), ally.min(), allx.max() - allx.min(),
                  ally.max() - ally.min()):
            out += _enc_varuint(int(v))
        for p in qparts[:-1]:
            out += _enc_varuint(len(p[0]))
        dx = dy = 0
        for qx, qy in qparts:
            for k in range(len(qx)):
                out += _enc_varint_delta(int(qx[k]) - dx)
                dx = int(qx[k])
                out += _enc_varint_delta(int(qy[k]) - dy)
                dy = int(qy[k])
        return bytes(out)
    raise ValueError(f"unsupported geometry type {g.gtype}")


# ---------------------------------------------------------------------------
# row decode
# ---------------------------------------------------------------------------

def decode_rows(info: GdbTableInfo, fids: np.ndarray, offs: np.ndarray,
                want_geom_raw: bool = False):
    """pread + decode a batch of rows -> list of tuples in field order
    (fid first).  Adjacent row spans coalesce into ranged reads."""
    order = np.argsort(offs, kind="stable")
    fids, offs = fids[order], offs[order]
    path = info.base + ".gdbtable"
    max_sz = max(info.max_row_size, 64) + 4
    # coalesce: one pread per run of rows whose spans sit within 256 KiB
    runs = []
    run_start = 0
    for k in range(1, len(offs) + 1):
        if k == len(offs) or offs[k] - offs[run_start] > 256 * 1024:
            runs.append((run_start, k))
            run_start = k
    rows = []
    for r0, r1 in runs:
        lo = int(offs[r0])
        hi = int(offs[r1 - 1]) + max_sz
        buf = vsi.pread(path, lo, hi - lo)
        for k in range(r0, r1):
            base = int(offs[k]) - lo
            if base + 4 > len(buf):
                continue
            blob_len = struct.unpack_from("<i", buf, base)[0]
            if blob_len < 0:
                continue
            if base + 4 + blob_len > len(buf):
                extra = vsi.pread(path, int(offs[k]), 4 + blob_len)
                blob = extra[4:]
            else:
                blob = buf[base + 4:base + 4 + blob_len]
            rows.append((int(fids[k]),) + _decode_row(info, blob,
                                                      want_geom_raw))
    rows.sort(key=lambda r: r[0])            # decode order follows file
    return rows                              # offsets; emit in fid order


def _decode_row(info: GdbTableInfo, blob: bytes, want_geom_raw: bool):
    vals = []
    inull = 0
    p = info.null_bytes
    for f in info.fields:
        if f.nullable:
            isnull = (blob[inull >> 3] >> (inull & 7)) & 1
            inull += 1
            if isnull:
                if f.ftype != FGFT_RASTER:
                    vals.append(None)
                continue
        t = f.ftype
        if t == FGFT_OBJECTID:
            continue                        # fid is computed from tablx
        if t == FGFT_INT16:
            vals.append(struct.unpack_from("<h", blob, p)[0])
            p += 2
        elif t == FGFT_INT32:
            vals.append(struct.unpack_from("<i", blob, p)[0])
            p += 4
        elif t == FGFT_FLOAT32:
            vals.append(struct.unpack_from("<f", blob, p)[0])
            p += 4
        elif t == FGFT_FLOAT64:
            vals.append(struct.unpack_from("<d", blob, p)[0])
            p += 8
        elif t in (FGFT_DATETIME, FGFT_DATE):
            days = struct.unpack_from("<d", blob, p)[0]
            p += 8
            vals.append(pd.Timestamp((days - _EPOCH_DAYS) * 86400.0,
                                     unit="s").round("s"))
        elif t == FGFT_TIME:
            frac = struct.unpack_from("<d", blob, p)[0]
            p += 8
            s = int(round(frac * 86400.0))
            vals.append(f"{s // 3600:02d}:{s % 3600 // 60:02d}:{s % 60:02d}")
        elif t == FGFT_DATETIME_OFFSET:
            days, offm = struct.unpack_from("<dh", blob, p)
            p += 10
            vals.append(pd.Timestamp((days - _EPOCH_DAYS) * 86400.0,
                                     unit="s").round("s"))
        elif t == FGFT_INT64:
            vals.append(struct.unpack_from("<q", blob, p)[0])
            p += 8
        elif t in (FGFT_GUID, FGFT_GLOBALID):
            u = blob[p:p + 16]
            p += 16
            vals.append(
                "{%02X%02X%02X%02X-%02X%02X-%02X%02X-%02X%02X-"
                "%02X%02X%02X%02X%02X%02X}" % (
                    u[3], u[2], u[1], u[0], u[5], u[4], u[7], u[6],
                    u[8], u[9], u[10], u[11], u[12], u[13], u[14], u[15]))
        elif t in (FGFT_STRING, FGFT_XML):
            ln, p = _varuint(blob, p)
            raw = blob[p:p + ln]
            p += ln
            vals.append(raw.decode("utf-8") if info.utf8 or t == FGFT_XML
                        else raw.decode("utf-16-le"))
        elif t == FGFT_GEOMETRY:
            ln, p = _varuint(blob, p)
            raw = blob[p:p + ln]
            p += ln
            if want_geom_raw:
                vals.append(bytes(raw))
            else:
                g = decode_shape(raw, f)
                vals.append(W.encode(g) if g is not None else None)
        elif t == FGFT_BINARY:
            ln, p = _varuint(blob, p)
            vals.append(bytes(blob[p:p + ln]))
            p += ln
        elif t == FGFT_RASTER:
            # managed rasters: int32 id; unsupported in the vector path
            p += 4
        else:
            raise ValueError(f"unhandled field type {t}")
    return tuple(vals)


def _spark_type(f: GdbField):
    return {
        FGFT_INT16: T.ShortType(), FGFT_INT32: T.IntegerType(),
        FGFT_FLOAT32: T.FloatType(), FGFT_FLOAT64: T.DoubleType(),
        FGFT_STRING: T.StringType(), FGFT_DATETIME: T.TimestampType(),
        FGFT_GEOMETRY: T.BinaryType(), FGFT_BINARY: T.BinaryType(),
        FGFT_GUID: T.StringType(), FGFT_GLOBALID: T.StringType(),
        FGFT_XML: T.StringType(), FGFT_INT64: T.LongType(),
        FGFT_DATE: T.TimestampType(), FGFT_TIME: T.StringType(),
        FGFT_DATETIME_OFFSET: T.TimestampType(),
    }[f.ftype]


def table_schema(info: GdbTableInfo) -> T.StructType:
    fields = [T.StructField("fid", T.LongType(), False)]
    for f in info.fields:
        if f.ftype in (FGFT_OBJECTID, FGFT_RASTER):
            continue
        name = "geom" if f.ftype == FGFT_GEOMETRY else f.name
        fields.append(T.StructField(name, _spark_type(f), True))
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# datasource catalog
# ---------------------------------------------------------------------------

def _catalog(path: str):
    """GDB_SystemCatalog (a00000001.gdbtable) -> {name: file base}
    (ogropenfilegdbdatasource.cpp:272-341: catalog FID n -> a{n:08x})."""
    info = GdbTableInfo(os.path.join(path, "a00000001"))
    emitted = [f.name.lower() for f in info.fields
               if f.ftype not in (FGFT_OBJECTID, FGFT_RASTER)]
    name_idx = emitted.index("name")
    plan, present = info.block_plan()
    out = {}
    for b0, nb, before in plan:
        fids, offs = info.read_offsets(b0, nb, before, present)
        for row in decode_rows(info, fids, offs):
            out[str(row[1 + name_idx])] = os.path.join(
                path, f"a{row[0]:08x}")
    return out


def list_layers(path: str) -> dict:
    """User tables in a .gdb directory (system GDB_* tables hidden)."""
    return {n: b for n, b in _catalog(path).items()
            if not n.startswith("GDB_")}


def read_openfilegdb(spark: SparkSession, path: str,
                     layer: str | None = None,
                     rows_per_task: int = 64 * 1024) -> DataFrame:
    """One .gdb layer -> DataFrame (fid, <attrs...>, geom WKB).

    The driver touches only bounded metadata; 1024-row .gdbtablx blocks
    fan out to executors which pread offset slices + coalesced row
    ranges through core.vsi.
    """
    path = path.rstrip("/")
    if path.lower().endswith(".gdbtable"):
        base = path[:-len(".gdbtable")]
    else:
        layers = list_layers(path)
        if layer is None:
            if len(layers) != 1:
                raise ValueError(
                    f"layer required; available: {sorted(layers)}")
            layer = next(iter(layers))
        base = layers.get(layer)
        if base is None:
            cand = {k.lower(): v for k, v in layers.items()}
            base = cand.get(layer.lower())
        if base is None:
            raise ValueError(f"layer {layer!r} not in {sorted(layers)}")
    info = GdbTableInfo(base)
    schema = table_schema(info)
    plan, present = info.block_plan(rows_per_task)
    if not plan:
        return spark.createDataFrame([], schema)
    pdf = spark.createDataFrame(
        [(b0, nb, before) for b0, nb, before in plan],
        "b0 int, nb int, before int")
    pdf = pdf.repartition(min(len(plan), 32))
    present_bytes = np.packbits(present, bitorder="little").tobytes()
    n_total = info.total_rows
    cols = [f.name for f in schema.fields]

    def gen(batches):
        local = GdbTableInfo(base)
        pres = np.unpackbits(
            np.frombuffer(present_bytes, np.uint8),
            bitorder="little").astype(bool)
        for chunk in batches:
            for b0, nb, before in zip(chunk["b0"], chunk["nb"],
                                      chunk["before"]):
                fids, offs = local.read_offsets(int(b0), int(nb),
                                                int(before), pres)
                rows = decode_rows(local, fids, offs)
                yield pd.DataFrame(rows, columns=cols)

    return pdf.mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# minimal writer (v3): system catalog + one user layer
# ---------------------------------------------------------------------------

_GEOM_DEFAULTS = dict(xorigin=-400.0, yorigin=-400.0,
                      xyscale=999999999.9999999, xytolerance=8.983153e-09)


def _enc_utf16_name(s: str) -> bytes:
    raw = s.encode("utf-16-le")
    return bytes([len(s)]) + raw


def _field_desc(fields, geom_code: int, wkt: str) -> bytes:
    """Field-descriptor section body (after the 4-byte length)."""
    out = bytearray()
    out += struct.pack("<I", 4)              # secondary header version (V10)
    out += bytes([geom_code, 1, 0, 0])       # geomtype, utf8, 0, no z/m
    out += struct.pack("<H", len(fields))
    for name, ftype, nullable in fields:
        out += _enc_utf16_name(name)
        out += _enc_utf16_name("")
        out += bytes([ftype])
        flags = (1 if nullable else 0)
        if ftype == FGFT_STRING:
            out += struct.pack("<i", 65536) + bytes([flags]) + b"\x00"
        elif ftype in (FGFT_OBJECTID, FGFT_BINARY, FGFT_GUID,
                       FGFT_GLOBALID, FGFT_XML):
            out += bytes([2 if ftype == FGFT_OBJECTID else 0,
                          flags | (2 if ftype == FGFT_OBJECTID else 0)])
        elif ftype == FGFT_GEOMETRY:
            out += bytes([0, flags])
            wkt_raw = wkt.encode("utf-16-le")
            out += struct.pack("<H", len(wkt_raw)) + wkt_raw
            out += bytes([0])                # no z/m origin blocks
            g = _GEOM_DEFAULTS
            out += struct.pack("<3d", g["xorigin"], g["yorigin"],
                               g["xyscale"])
            out += struct.pack("<d", g["xytolerance"])
            out += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)   # bbox
            out += bytes([0])
            out += struct.pack("<I", 1) + struct.pack("<d", 0.001)
        else:
            out += bytes([_fixed_width(ftype), flags, 0])
    return bytes(out)


def _fixed_width(ftype: int) -> int:
    return {FGFT_INT16: 2, FGFT_INT32: 4, FGFT_FLOAT32: 4,
            FGFT_FLOAT64: 8, FGFT_DATETIME: 8, FGFT_INT64: 8,
            FGFT_DATE: 8, FGFT_TIME: 8, FGFT_DATETIME_OFFSET: 10}[ftype]


def _write_table(base: str, fields, rows, geom_code: int = 0,
                 wkt: str = "") -> None:
    """fields = [(name, ftype, nullable)] excluding row values for
    OBJECTID (computed); rows = list of value tuples in field order
    (None = NULL, OBJECTID positions skipped)."""
    gfield = GdbField("", FGFT_GEOMETRY, True)
    gfield.xorigin = _GEOM_DEFAULTS["xorigin"]
    gfield.yorigin = _GEOM_DEFAULTS["yorigin"]
    gfield.xyscale = _GEOM_DEFAULTS["xyscale"]
    nullable = [f for f in fields if f[2]]
    nbytes_null = (len(nullable) + 7) // 8
    blobs = []
    for row in rows:
        bits = bytearray(nbytes_null)
        body = bytearray()
        inull = 0
        vi = 0
        for name, ftype, isnull_ok in fields:
            v = row[vi]
            vi += 1
            if isnull_ok:
                if v is None:
                    bits[inull >> 3] |= 1 << (inull & 7)
                    inull += 1
                    continue
                inull += 1
            if ftype == FGFT_OBJECTID:
                continue
            if ftype == FGFT_INT16:
                body += struct.pack("<h", v)
            elif ftype == FGFT_INT32:
                body += struct.pack("<i", v)
            elif ftype == FGFT_FLOAT32:
                body += struct.pack("<f", v)
            elif ftype == FGFT_FLOAT64:
                body += struct.pack("<d", v)
            elif ftype == FGFT_DATETIME:
                ts = pd.Timestamp(v)
                body += struct.pack(
                    "<d", ts.timestamp() / 86400.0 + _EPOCH_DAYS)
            elif ftype == FGFT_INT64:
                body += struct.pack("<q", v)
            elif ftype in (FGFT_STRING, FGFT_XML):
                raw = str(v).encode("utf-8")
                body += _enc_varuint(len(raw)) + raw
            elif ftype == FGFT_BINARY:
                body += _enc_varuint(len(v)) + bytes(v)
            elif ftype == FGFT_GEOMETRY:
                g = v if isinstance(v, W.Geom) or v is None else W.decode(v)
                raw = encode_shape(g, gfield)
                body += _enc_varuint(len(raw)) + raw
            else:
                raise ValueError(f"writer: unhandled type {ftype}")
        blobs.append(bytes(bits) + bytes(body))
    fd_body = _field_desc(fields, geom_code, wkt)
    max_sz = max(max([len(b) for b in blobs], default=0), len(fd_body))
    offsets = []
    with open(base + ".gdbtable", "wb") as f:
        f.write(struct.pack("<4i", 3, len(blobs), max_sz, 5))
        f.write(struct.pack("<2i", 0, 0))
        f.write(struct.pack("<Q", 0))        # file size, fixed up below
        f.write(struct.pack("<Q", 40))       # field desc offset
        f.write(struct.pack("<I", len(fd_body)))
        f.write(fd_body)
        for b in blobs:
            offsets.append(f.tell())
            f.write(struct.pack("<i", len(b)))
            f.write(b)
        size = f.tell()
        f.seek(24)                           # u64 file size lives at 24-31
        f.write(struct.pack("<Q", size))
    n = len(blobs)
    nblocks = (n + 1023) // 1024
    with open(base + ".gdbtablx", "wb") as f:
        f.write(struct.pack("<IIiI", 3, nblocks, n, 5))
        for k in range(nblocks * 1024):
            off = offsets[k] if k < n else 0
            f.write(off.to_bytes(5, "little"))
        f.write(struct.pack("<IIII", 0, nblocks, nblocks, 0))


_CATALOG_FIELDS = [("ID", FGFT_OBJECTID, False),
                   ("Name", FGFT_STRING, False),
                   ("FileFormat", FGFT_INT32, False)]

_SYSTEM_TABLES = ["GDB_SystemCatalog", "GDB_DBTune", "GDB_SpatialRefs",
                  "GDB_Items", "GDB_ItemTypes", "GDB_ItemRelationships",
                  "GDB_ItemRelationshipTypes", "GDB_ReplicaLog"]


def write_openfilegdb(path: str, layer: str, fields, rows,
                      geom_code: int = 1, wkt: str = "") -> None:
    """Create a .gdb directory with the 8 standard system-catalog rows
    and ONE user layer at a00000009.  `fields` excludes fid/OBJECTID
    (added automatically at position 1, after geometry if present);
    rows are value tuples matching `fields`."""
    os.makedirs(path, exist_ok=True)
    names = _SYSTEM_TABLES + [layer]
    cat_rows = [(None, n, 0) for n in names]
    _write_table(os.path.join(path, "a00000001"),
                 _CATALOG_FIELDS, cat_rows)
    for sysidx in range(2, 9):
        _write_table(os.path.join(path, f"a{sysidx:08x}"),
                     _CATALOG_FIELDS, [])
    full_fields = [("OBJECTID", FGFT_OBJECTID, False)] + list(fields)
    full_rows = [(None,) + tuple(r) for r in rows]
    _write_table(os.path.join(path, "a00000009"), full_fields, full_rows,
                 geom_code=geom_code, wkt=wkt)
