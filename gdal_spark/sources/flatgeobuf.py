"""FlatGeobuf source: pure-numpy FlatBuffers + packed-Hilbert-R-tree codec,
distributed via byte-range tasks.

Re-expresses the reference's FlatGeobuf driver
(/root/reference/ogr/ogrsf_frmts/flatgeobuf/ogrflatgeobuflayer.cpp feature
stream, packedrtree.h:71-143 packed R-tree, geometryreader.cpp geometry
decode) Spark-first:

  * the DRIVER reads only the magic + header flatbuffer + (for bbox reads)
    the packed R-tree — all tiny next to the feature payload;
  * a bbox filter runs the reference's streamSearch traversal
    (packedrtree.cpp:248: root-first level array, internal node offset =
    first-child index, leaf offset = feature byte offset) over the index
    to get candidate byte ranges;
  * candidate feature ranges partition into tasks; each task opens the
    file, seeks to its range and parses its size-prefixed feature
    flatbuffers — a spatially-filtered scan reads only intersecting
    features, the FGB headline property.

File layout (public FlatGeobuf spec): 8-byte magic fgb\\x03 fgb\\x00,
size-prefixed Header flatbuffer, optional packed R-tree (40-byte nodes:
4 LE doubles bbox + LE uint64 offset), then size-prefixed Feature
flatbuffers. FlatBuffers tables are parsed with a minimal vtable reader —
no external flatbuffers dependency.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..core import vsi
from ..core import wkb

MAGIC = b"fgb\x03fgb\x00"

# FlatGeobuf GeometryType (header_generated.h:27) — NOT the WKB codes
GT_POINT, GT_LINESTRING, GT_POLYGON = 1, 2, 3
GT_MULTIPOINT, GT_MULTILINESTRING, GT_MULTIPOLYGON = 4, 5, 6

# ColumnType (header_generated.h:107)
CT_BOOL, CT_INT, CT_LONG, CT_DOUBLE, CT_STRING = 2, 5, 7, 10, 11

_NODE = np.dtype([("minx", "<f8"), ("miny", "<f8"),
                  ("maxx", "<f8"), ("maxy", "<f8"), ("off", "<u8")])


# ---------------------------------------------------------------------------
# minimal FlatBuffers reader (vtable-driven, little-endian)
# ---------------------------------------------------------------------------

def _u16(b, p):
    return struct.unpack_from("<H", b, p)[0]


def _u32(b, p):
    return struct.unpack_from("<I", b, p)[0]


def _i32(b, p):
    return struct.unpack_from("<i", b, p)[0]


def _fb_field(b, tpos, slot):
    """Absolute position of a table field, or None if absent."""
    vt = tpos - _i32(b, tpos)
    nslots = (_u16(b, vt) - 4) // 2
    if slot >= nslots:
        return None
    off = _u16(b, vt + 4 + 2 * slot)
    return tpos + off if off else None


def _fb_scalar(b, tpos, slot, fmt, default=0):
    p = _fb_field(b, tpos, slot)
    return struct.unpack_from(fmt, b, p)[0] if p is not None else default


def _fb_indirect(b, tpos, slot):
    p = _fb_field(b, tpos, slot)
    return p + _u32(b, p) if p is not None else None


def _fb_vector(b, tpos, slot, dtype):
    vp = _fb_indirect(b, tpos, slot)
    if vp is None:
        return None
    n = _u32(b, vp)
    return np.frombuffer(b, dtype, n, vp + 4)


def _fb_string(b, tpos, slot):
    vp = _fb_indirect(b, tpos, slot)
    if vp is None:
        return None
    n = _u32(b, vp)
    return b[vp + 4:vp + 4 + n].decode("utf-8")


def _fb_table_vector(b, tpos, slot):
    vp = _fb_indirect(b, tpos, slot)
    if vp is None:
        return []
    n = _u32(b, vp)
    return [vp + 4 + 4 * i + _u32(b, vp + 4 + 4 * i) for i in range(n)]


# ---------------------------------------------------------------------------
# minimal FlatBuffers builder — builds a subtree blob whose internal
# offsets are all relative, so it embeds verbatim into a parent heap
# ---------------------------------------------------------------------------

class _Sub:
    __slots__ = ("blob", "root")

    def __init__(self, blob: bytes, root: int):
        self.blob = blob
        self.root = root


def _build_table(slots) -> _Sub:
    """slots: [(slot_id, kind, value)] with kind in {'u8','u16','u32',
    'u64','f64','bool'} (inline scalars), {'str','vec_u8','vec_u32',
    'vec_f64'} (heap blobs), 'sub' (_Sub), 'vec_sub' ([_Sub])."""
    slots = sorted(slots, key=lambda s: s[0])
    max_slot = slots[-1][0] if slots else -1
    vt_size = 4 + 2 * (max_slot + 1)

    scalar_fmt = {"u8": "<B", "bool": "<B", "u16": "<H", "u32": "<I",
                  "u64": "<Q", "i32": "<i", "f64": "<d"}

    # lay the table: soffset + fields in slot order
    field_off = {}
    tbl = bytearray(4)                       # soffset placeholder
    heap_fields = []                         # (pos_in_tbl, heap kind, val)
    for slot, kind, val in slots:
        if kind in scalar_fmt:
            v = int(val) if kind != "f64" else float(val)
            field_off[slot] = len(tbl)
            tbl += struct.pack(scalar_fmt[kind], v)
        else:
            field_off[slot] = len(tbl)
            heap_fields.append((len(tbl), kind, val))
            tbl += b"\x00\x00\x00\x00"       # uoffset placeholder

    # vtable | table | heap
    vt = struct.pack("<HH", vt_size, len(tbl)) + b"".join(
        struct.pack("<H", field_off.get(s, 0))
        for s in range(max_slot + 1))
    tpos = len(vt)
    buf = bytearray(vt) + tbl
    struct.pack_into("<i", buf, tpos, tpos)  # soffset -> vtable at 0

    for pos_in_tbl, kind, val in heap_fields:
        fpos = tpos + pos_in_tbl
        target = len(buf)
        if kind == "str":
            raw = val.encode("utf-8")
            buf += struct.pack("<I", len(raw)) + raw + b"\x00"
        elif kind == "vec_u8":
            raw = bytes(val)
            buf += struct.pack("<I", len(raw)) + raw
        elif kind == "vec_u32":
            arr = np.asarray(val, "<u4")
            buf += struct.pack("<I", len(arr)) + arr.tobytes()
        elif kind == "vec_f64":
            arr = np.asarray(val, "<f8")
            buf += struct.pack("<I", len(arr)) + arr.tobytes()
        elif kind == "sub":
            base = len(buf)
            buf += val.blob
            target = base + val.root
        elif kind == "vec_sub":
            vecpos = len(buf)
            buf += struct.pack("<I", len(val))
            slots_pos = len(buf)
            buf += b"\x00" * (4 * len(val))
            for i, sub in enumerate(val):
                base = len(buf)
                buf += sub.blob
                struct.pack_into("<I", buf, slots_pos + 4 * i,
                                 base + sub.root - (slots_pos + 4 * i))
            target = vecpos
        else:
            raise ValueError(kind)
        struct.pack_into("<I", buf, fpos, target - fpos)
    return _Sub(bytes(buf), tpos)


def _finish(sub: _Sub) -> bytes:
    """_Sub -> standalone size-prefixed flatbuffer."""
    body = struct.pack("<I", 4 + sub.root) + sub.blob
    return struct.pack("<I", len(body)) + body


def _root(b, pos=0):
    """size-prefixed flatbuffer at pos -> (table pos, next pos)."""
    size = _u32(b, pos)
    start = pos + 4
    return start + _u32(b, start), start + size


# ---------------------------------------------------------------------------
# geometry codec (geometryreader.cpp / geometrywriter.cpp semantics)
# ---------------------------------------------------------------------------

def _geom_to_fgb(g) -> tuple[_Sub, int]:
    """Geom -> (Geometry table _Sub, GeometryType)."""
    def simple(xy, gtype, ends=None):
        # the per-geometry type is always written, so heterogeneous
        # (header type Unknown=0) layers decode without guessing
        slots = [(1, "vec_f64", np.asarray(xy, np.float64).ravel()),
                 (6, "u8", gtype)]
        if ends is not None:
            slots.append((0, "vec_u32", ends))
        return _build_table(slots)

    if g.gtype == wkb.POINT:
        return simple(g.rings[0][:1], GT_POINT), GT_POINT
    if g.gtype == wkb.LINESTRING:
        return simple(g.rings[0], GT_LINESTRING), GT_LINESTRING
    if g.gtype == wkb.MULTIPOINT:
        pts = np.vstack([p.rings[0][:1] for p in g.parts])
        return simple(pts, GT_MULTIPOINT), GT_MULTIPOINT
    if g.gtype == wkb.POLYGON:
        rings = [np.asarray(r, np.float64) for r in g.rings]
        ends = np.cumsum([len(r) for r in rings]).astype(np.uint32)
        return simple(np.vstack(rings), GT_POLYGON, ends), GT_POLYGON
    if g.gtype == wkb.MULTILINESTRING:
        lines = [np.asarray(p.rings[0], np.float64) for p in g.parts]
        ends = np.cumsum([len(ln) for ln in lines]).astype(np.uint32)
        return simple(np.vstack(lines), GT_MULTILINESTRING, ends), \
            GT_MULTILINESTRING
    if g.gtype == wkb.MULTIPOLYGON:
        parts = [_build_table(
            [(1, "vec_f64",
              np.vstack([np.asarray(r) for r in p.rings]).ravel()),
             (0, "vec_u32",
              np.cumsum([len(r) for r in p.rings]).astype(np.uint32)),
             (6, "u8", GT_POLYGON)]) for p in g.parts]
        return _build_table([(6, "u8", GT_MULTIPOLYGON),
                             (7, "vec_sub", parts)]), GT_MULTIPOLYGON
    raise ValueError(f"unsupported geometry type {g.gtype}")


def _fgb_to_geom(b, gpos, gtype):
    """Geometry table -> Geom. gtype: header type, overridden by the
    per-geometry type field when present (heterogeneous layers)."""
    own = _fb_scalar(b, gpos, 6, "<B", 0)
    if own:
        gtype = own
    xy = _fb_vector(b, gpos, 1, "<f8")
    pts = xy.reshape(-1, 2) if xy is not None else np.zeros((0, 2))
    ends = _fb_vector(b, gpos, 0, "<u4")
    if gtype == GT_POINT:
        return wkb.Geom(wkb.POINT, [np.array(pts[:1])])
    if gtype == GT_LINESTRING:
        return wkb.Geom(wkb.LINESTRING, [np.array(pts)])
    if gtype == GT_MULTIPOINT:
        return wkb.Geom(wkb.MULTIPOINT,
                        parts=[wkb.Geom(wkb.POINT, [np.array(pts[i:i + 1])])
                               for i in range(len(pts))])
    if gtype in (GT_POLYGON, GT_MULTILINESTRING):
        bounds = np.r_[0, ends] if ends is not None and len(ends) \
            else np.array([0, len(pts)])
        rings = [np.array(pts[bounds[i]:bounds[i + 1]])
                 for i in range(len(bounds) - 1)]
        if gtype == GT_POLYGON:
            return wkb.Geom(wkb.POLYGON, rings)
        return wkb.Geom(wkb.MULTILINESTRING,
                        parts=[wkb.Geom(wkb.LINESTRING, [r])
                               for r in rings])
    if gtype == GT_MULTIPOLYGON:
        parts = [_fgb_to_geom(b, p, GT_POLYGON)
                 for p in _fb_table_vector(b, gpos, 7)]
        return wkb.Geom(wkb.MULTIPOLYGON, parts=parts)
    raise ValueError(f"unsupported FlatGeobuf geometry type {gtype}")


# ---------------------------------------------------------------------------
# properties codec (ogrflatgeobuflayer.cpp parseFeature: u16 column index
# then the value per column type)
# ---------------------------------------------------------------------------

def _props_encode(values, columns) -> bytes:
    out = b""
    for i, ((name, ctype), v) in enumerate(zip(columns, values)):
        if v is None:
            continue
        out += struct.pack("<H", i)
        if ctype == CT_BOOL:
            out += struct.pack("<B", 1 if v else 0)
        elif ctype == CT_INT:
            out += struct.pack("<i", int(v))
        elif ctype == CT_LONG:
            out += struct.pack("<q", int(v))
        elif ctype == CT_DOUBLE:
            out += struct.pack("<d", float(v))
        elif ctype == CT_STRING:
            raw = str(v).encode("utf-8")
            out += struct.pack("<I", len(raw)) + raw
        else:
            raise ValueError(f"unsupported column type {ctype}")
    return out


def _props_decode(raw: bytes, columns):
    vals = [None] * len(columns)
    pos = 0
    while pos + 2 <= len(raw):
        i = struct.unpack_from("<H", raw, pos)[0]
        pos += 2
        ctype = columns[i][1]
        if ctype == CT_BOOL:
            vals[i] = bool(raw[pos])
            pos += 1
        elif ctype == CT_INT:
            vals[i] = struct.unpack_from("<i", raw, pos)[0]
            pos += 4
        elif ctype == CT_LONG:
            vals[i] = struct.unpack_from("<q", raw, pos)[0]
            pos += 8
        elif ctype == CT_DOUBLE:
            vals[i] = struct.unpack_from("<d", raw, pos)[0]
            pos += 8
        elif ctype == CT_STRING:
            n = struct.unpack_from("<I", raw, pos)[0]
            vals[i] = raw[pos + 4:pos + 4 + n].decode("utf-8")
            pos += 4 + n
        else:
            raise ValueError(f"unsupported column type {ctype}")
    return vals


# ---------------------------------------------------------------------------
# packed Hilbert R-tree (packedrtree.cpp twin)
# ---------------------------------------------------------------------------

def _level_bounds(num_items: int, node_size: int):
    """generateLevelBounds (packedrtree.cpp:214): [(start, end)] per level,
    leaves FIRST in the list but LAST in the node array (root at index 0)."""
    sizes = [num_items]
    n = num_items
    while n != 1:
        n = (n + node_size - 1) // node_size
        sizes.append(n)
    total = sum(sizes)
    bounds = []
    n = total
    for s in sizes:
        n -= s
        bounds.append((n, n + s))
    return bounds, total


def _build_rtree(envs: np.ndarray, offsets: np.ndarray,
                 node_size: int = 16) -> bytes:
    """envs (n,4) in feature order, offsets = feature byte offsets ->
    node array bytes (root first, leaves last)."""
    n = len(envs)
    bounds, total = _level_bounds(n, node_size)
    nodes = np.zeros(total, dtype=_NODE)
    leaf0 = bounds[0][0]
    nodes["minx"][leaf0:] = envs[:, 0]
    nodes["miny"][leaf0:] = envs[:, 1]
    nodes["maxx"][leaf0:] = envs[:, 2]
    nodes["maxy"][leaf0:] = envs[:, 3]
    nodes["off"][leaf0:] = offsets
    for lvl in range(len(bounds) - 1):
        pos, end = bounds[lvl]
        newpos = bounds[lvl + 1][0]
        while pos < end:
            j = min(node_size, end - pos)
            nodes["minx"][newpos] = nodes["minx"][pos:pos + j].min()
            nodes["miny"][newpos] = nodes["miny"][pos:pos + j].min()
            nodes["maxx"][newpos] = nodes["maxx"][pos:pos + j].max()
            nodes["maxy"][newpos] = nodes["maxy"][pos:pos + j].max()
            nodes["off"][newpos] = pos
            pos += j
            newpos += 1
    return nodes.tobytes()


def _rtree_search(nodes: np.ndarray, num_items: int, node_size: int,
                  bbox) -> list[tuple[int, int]]:
    """streamSearch twin -> [(feature byte offset, feature index)]."""
    bounds, total = _level_bounds(num_items, node_size)
    leaf0 = bounds[0][0]
    minx, miny, maxx, maxy = bbox
    results = []
    queue = [(0, len(bounds) - 1)]
    while queue:
        node_index, level = queue.pop(0)
        is_leaf = node_index >= total - num_items
        end = min(node_index + node_size, bounds[level][1])
        for pos in range(node_index, end):
            nd = nodes[pos]
            if nd["maxx"] < minx or nd["maxy"] < miny \
                    or nd["minx"] > maxx or nd["miny"] > maxy:
                continue
            if is_leaf:
                results.append((int(nd["off"]), pos - leaf0))
            else:
                queue.append((int(nd["off"]), level - 1))
    return results


def _hilbert(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """32-bit Hilbert index of 16-bit (x, y) — the classical iterative
    xy->d conversion (rot-and-accumulate), vectorized. Any consistent
    space-filling order round-trips; Hilbert matches the reference's
    locality so bbox searches touch contiguous leaf runs."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << 15
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        flip = (ry == 0) & (rx == 1)
        x2 = np.where(flip, s - 1 - x, x)
        y2 = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = (np.where(swap, y2, x2), np.where(swap, x2, y2))
        s >>= 1
    return d.astype(np.uint64)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def infer_columns(attrs: dict):
    cols = []
    for name, v in attrs.items():
        if isinstance(v, bool):
            cols.append((name, CT_BOOL))
        elif isinstance(v, (int, np.integer)):
            cols.append((name, CT_LONG))
        elif isinstance(v, (float, np.floating)):
            cols.append((name, CT_DOUBLE))
        else:
            cols.append((name, CT_STRING))
    return cols


def write_fgb(rows, path: str, name: str = "layer",
              node_size: int = 16, hilbert_sort: bool = True) -> None:
    """rows: [(geom_wkb, {attr: value})] -> a spec-complete .fgb with
    header, packed Hilbert R-tree and size-prefixed features.
    Single-threaded FIXTURE helper — DataFrame layers go through
    write_fgb_dist (per-task pwrite, no driver collect), which is what
    save_vector routes to unconditionally."""
    rows = list(rows)
    if not rows:
        raise ValueError("FlatGeobuf requires at least one feature")
    columns = infer_columns(rows[0][1])
    geoms = [wkb.decode(bytes(b)) for b, _ in rows]
    envs = np.array([g.envelope() for g in geoms], np.float64).reshape(-1, 4)

    if hilbert_sort:
        ext = (envs[:, 0].min(), envs[:, 1].min(),
               envs[:, 2].max(), envs[:, 3].max())
        w = max(ext[2] - ext[0], 1e-300)
        h = max(ext[3] - ext[1], 1e-300)
        cx = (envs[:, 0] + envs[:, 2]) / 2
        cy = (envs[:, 1] + envs[:, 3]) / 2
        hx = np.floor(0xFFFF * (cx - ext[0]) / w).astype(np.uint64)
        hy = np.floor(0xFFFF * (cy - ext[1]) / h).astype(np.uint64)
        order = np.argsort(_hilbert(hx, hy), kind="stable")[::-1]
    else:
        order = np.arange(len(rows))

    feats = []
    for i in order:
        gsub, gtype = _geom_to_fgb(geoms[i])
        props = _props_encode(
            [rows[i][1].get(n) for n, _t in columns], columns)
        slots = [(0, "sub", gsub)]
        if props:
            slots.append((1, "vec_u8", props))
        feats.append(_finish(_build_table(slots)))

    gtypes = {_geom_to_fgb(g)[1] for g in geoms}
    header_gt = gtypes.pop() if len(gtypes) == 1 else 0
    col_subs = [_build_table([(0, "str", n), (1, "u8", t)])
                for n, t in columns]
    header = _finish(_build_table([
        (0, "str", name),
        (1, "vec_f64",
         [float(envs[:, 0].min()), float(envs[:, 1].min()),
          float(envs[:, 2].max()), float(envs[:, 3].max())]),
        (2, "u8", header_gt),
        (7, "vec_sub", col_subs),
        (8, "u64", len(rows)),
        (9, "u16", node_size),
    ]))

    offsets = np.cumsum([0] + [len(f) for f in feats[:-1]]).astype(np.uint64)
    rtree = _build_rtree(envs[order], offsets, node_size)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(header)
        f.write(rtree)
        for feat in feats:
            f.write(feat)


def _spark_columns(schema, geom_col: str):
    """Spark schema -> FGB column descriptors [(name, CT_*)]."""
    from pyspark.sql import types as T
    cols = []
    for f in schema.fields:
        if f.name == geom_col:
            continue
        if isinstance(f.dataType, T.BooleanType):
            cols.append((f.name, CT_BOOL))
        elif isinstance(f.dataType, (T.ByteType, T.ShortType,
                                     T.IntegerType, T.LongType)):
            cols.append((f.name, CT_LONG))
        elif isinstance(f.dataType, (T.FloatType, T.DoubleType)):
            cols.append((f.name, CT_DOUBLE))
        else:
            cols.append((f.name, CT_STRING))
    return cols


def write_fgb_dist(df, path: str, name: str = "layer",
                   node_size: int = 16, geom_col: str = "geom") -> int:
    """DISTRIBUTED .fgb sink — no driver collect of features.

    The engine's Hilbert sort IS the FGB spatial index contract
    (packedrtree.cpp packs leaves in Hilbert order), so the plan is:

    1. one aggregation for the layer extent (4 doubles to the driver);
    2. a DISTRIBUTED ORDER BY on the 32-bit Hilbert key of each bbox
       center (range-partitioned sort — the same shuffle the engine's
       cell layout uses), persisted so both later passes see identical
       partitions;
    3. phase 1: ONE ROW PER PARTITION (count, feature-byte total,
       geometry-type set) -> driver lays out header / index / feature
       regions with prefix sums and preallocates the file;
    4. phase 2: each partition pwrites its feature slice AND its leaf
       nodes of the packed Hilbert R-tree directly (leaf node = bbox +
       feature byte offset, position = leaf0 + global index), and emits
       16-group PARTIAL aggregates of its leaves; a groupBy heals the
       groups that straddle partition boundaries, and only the upper
       tree levels (n/16 nodes and shrinking) are assembled driver-side.

    Scale: driver memory is O(#partitions + n/16) vs the reference's
    single-writer appender (flatgeobuf GeometryWriter). Returns n."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    columns = _spark_columns(df.schema, geom_col)

    @F.pandas_udf("minx double, miny double, maxx double, maxy double")
    def env_of(geom: pd.Series) -> pd.DataFrame:
        rows = []
        for b in geom:
            e = wkb.decode(bytes(b)).envelope()
            rows.append((float(e[0]), float(e[1]),
                         float(e[2]), float(e[3])))
        return pd.DataFrame(rows,
                            columns=["minx", "miny", "maxx", "maxy"])

    with_env = df.withColumn("__env", env_of(F.col(geom_col)))
    ext = with_env.agg(
        F.min("__env.minx"), F.min("__env.miny"),
        F.max("__env.maxx"), F.max("__env.maxy")).collect()[0]
    ext = (float(ext[0]), float(ext[1]), float(ext[2]), float(ext[3]))
    w = max(ext[2] - ext[0], 1e-300)
    h = max(ext[3] - ext[1], 1e-300)

    @F.pandas_udf("long")
    def hkey(minx: pd.Series, miny: pd.Series, maxx: pd.Series,
             maxy: pd.Series) -> pd.Series:
        cx = (minx.values + maxx.values) / 2
        cy = (miny.values + maxy.values) / 2
        hx = np.floor(0xFFFF * (cx - ext[0]) / w).astype(np.uint64)
        hy = np.floor(0xFFFF * (cy - ext[1]) / h).astype(np.uint64)
        return pd.Series(_hilbert(hx, hy).astype(np.int64))

    # descending to match write_fgb's argsort[::-1] leaf order
    sdf = (with_env
           .withColumn("__h", hkey("__env.minx", "__env.miny",
                                   "__env.maxx", "__env.maxy"))
           .orderBy(F.desc("__h"))
           .persist())
    try:
        pid_df = sdf.withColumn("__pid", F.spark_partition_id())

        def encode_feat(t) -> tuple[bytes, int]:
            g = wkb.decode(bytes(getattr(t, geom_col)))
            gsub, gtype = _geom_to_fgb(g)
            props = _props_encode(
                [getattr(t, n) for n, _t in columns], columns)
            slots = [(0, "sub", gsub)]
            if props:
                slots.append((1, "vec_u8", props))
            return _finish(_build_table(slots)), gtype

        stat_schema = "pid int, n long, fbytes long, gtypes array<long>"

        def stats(batches):
            pid, n, fbytes, gtypes = -1, 0, 0, set()
            for pdf in batches:
                if len(pdf):
                    pid = int(pdf["__pid"].iloc[0])
                for t in pdf.itertuples(index=False):
                    feat, gtype = encode_feat(t)
                    fbytes += len(feat)
                    gtypes.add(gtype)
                    n += 1
            yield pd.DataFrame(
                [(pid, n, fbytes, sorted(gtypes))],
                columns=["pid", "n", "fbytes", "gtypes"])

        parts = sorted((r for r in pid_df.mapInPandas(
            stats, stat_schema).collect() if r.n > 0),
            key=lambda r: r.pid)
        total_n = sum(r.n for r in parts)
        if total_n == 0:
            raise ValueError("FlatGeobuf requires at least one feature")
        all_gt = {g for r in parts for g in r.gtypes}
        header_gt = all_gt.pop() if len(all_gt) == 1 else 0

        col_subs = [_build_table([(0, "str", n_), (1, "u8", t_)])
                    for n_, t_ in columns]
        header = _finish(_build_table([
            (0, "str", name),
            (1, "vec_f64", [ext[0], ext[1], ext[2], ext[3]]),
            (2, "u8", header_gt),
            (7, "vec_sub", col_subs),
            (8, "u64", total_n),
            (9, "u16", node_size),
        ]))
        bounds, total_nodes = _level_bounds(total_n, node_size)
        leaf0 = bounds[0][0]
        index_pos = len(MAGIC) + len(header)
        features_pos = index_pos + total_nodes * 40

        base = {}
        rec0, f_off = 0, 0
        for r in parts:
            base[int(r.pid)] = (rec0, f_off)
            rec0 += int(r.n)
            f_off += int(r.fbytes)

        with open(path, "wb") as f:
            f.write(MAGIC)
            f.write(header)
            f.truncate(features_pos + f_off)

        grp_schema = ("g long, minx double, miny double, maxx double, "
                      "maxy double")

        def emit(batches):
            fd = None
            rec = off = None
            leaves = []
            try:
                for pdf in batches:
                    if not len(pdf):
                        continue
                    if fd is None:
                        pid = int(pdf["__pid"].iloc[0])
                        rec, off = base[pid]
                        fd = os.open(path, os.O_WRONLY)
                    env = pdf["__env"]
                    for k, t in enumerate(pdf.itertuples(index=False)):
                        feat, _gt = encode_feat(t)
                        os.pwrite(fd, feat, features_pos + off)
                        e = env.iloc[k]
                        node = struct.pack(
                            "<4dq", e["minx"], e["miny"], e["maxx"],
                            e["maxy"], off)
                        os.pwrite(fd, node,
                                  index_pos + (leaf0 + rec) * 40)
                        leaves.append((rec // node_size, e["minx"],
                                       e["miny"], e["maxx"], e["maxy"]))
                        off += len(feat)
                        rec += 1
            finally:
                if fd is not None:
                    os.close(fd)
            lp = pd.DataFrame(
                leaves, columns=["g", "minx", "miny", "maxx", "maxy"])
            # in-task 16-group partials: one row per R-tree group, not
            # per feature, crosses the shuffle (boundary groups heal in
            # the downstream groupBy)
            yield lp.groupby("g", as_index=False).agg(
                {"minx": "min", "miny": "min",
                 "maxx": "max", "maxy": "max"}) if len(lp) else lp

        lvl1 = (pid_df.mapInPandas(emit, grp_schema)
                .groupBy("g").agg(F.min("minx").alias("minx"),
                                  F.min("miny").alias("miny"),
                                  F.max("maxx").alias("maxx"),
                                  F.max("maxy").alias("maxy"))
                .orderBy("g").collect())

        # upper levels (<= n/16 nodes, shrinking 16x per level) driver-side
        upper = np.zeros(leaf0, dtype=_NODE)
        lpos, lend = bounds[1] if len(bounds) > 1 else (0, 0)
        for r in lvl1:
            i = lpos + int(r.g)
            upper["minx"][i], upper["miny"][i] = r.minx, r.miny
            upper["maxx"][i], upper["maxy"][i] = r.maxx, r.maxy
            upper["off"][i] = leaf0 + int(r.g) * node_size
        for lvl in range(1, len(bounds) - 1):
            pos, end = bounds[lvl]
            newpos = bounds[lvl + 1][0]
            while pos < end:
                j = min(node_size, end - pos)
                upper["minx"][newpos] = upper["minx"][pos:pos + j].min()
                upper["miny"][newpos] = upper["miny"][pos:pos + j].min()
                upper["maxx"][newpos] = upper["maxx"][pos:pos + j].max()
                upper["maxy"][newpos] = upper["maxy"][pos:pos + j].max()
                upper["off"][newpos] = pos
                pos += j
                newpos += 1
        if leaf0:
            fd = os.open(path, os.O_WRONLY)
            try:
                os.pwrite(fd, upper.tobytes(), index_pos)
            finally:
                os.close(fd)
        return total_n
    finally:
        sdf.unpersist()


# ---------------------------------------------------------------------------
# distributed reader
# ---------------------------------------------------------------------------

def _read_header(path: str):
    """-> dict(header fields) + byte positions of index/features."""
    with vsi.open_seekable(path) as f:
        head = f.read(1 << 20)
    if head[:8] != MAGIC[:8]:
        raise ValueError("not a FlatGeobuf file")
    tpos, hend = _root(head, 8)
    gtype = _fb_scalar(head, tpos, 2, "<B", 0)
    count = _fb_scalar(head, tpos, 8, "<Q", 0)
    node_size = _fb_scalar(head, tpos, 9, "<H", 16)
    columns = []
    for cpos in _fb_table_vector(head, tpos, 7):
        columns.append((_fb_string(head, cpos, 0),
                        _fb_scalar(head, cpos, 1, "<B", 0)))
    index_pos = hend
    index_len = 0
    if node_size > 0 and count > 0:
        _b, total = _level_bounds(count, node_size)
        index_len = total * 40
    return {"gtype": gtype, "count": count, "node_size": node_size,
            "columns": columns, "index_pos": index_pos,
            "index_len": index_len,
            "features_pos": index_pos + index_len}


def _spark_type(ctype: int):
    return {CT_BOOL: T.BooleanType(), CT_INT: T.IntegerType(),
            CT_LONG: T.LongType(), CT_DOUBLE: T.DoubleType()} \
        .get(ctype, T.StringType())


def read_fgb(spark: SparkSession, path: str,
             bbox: tuple[float, float, float, float] | None = None,
             features_per_task: int = 65536) -> DataFrame:
    """-> DataFrame(fid, geom WKB, <attrs>). With bbox, the packed R-tree
    prunes to intersecting features BEFORE any task launches (envelope
    test — exact predicates compose downstream, same contract as the
    reference's SetSpatialFilter fast path)."""
    hdr = _read_header(path)
    columns = hdr["columns"]

    # work = runs of CONSECUTIVE features (start_offset, start_fid, n):
    # Hilbert-sorted files make bbox hits contiguous, so the driver holds
    # O(runs) entries — never one entry per feature (the run scans
    # sequentially through the size-prefixed stream, no per-feature seeks)
    if bbox is not None and hdr["index_len"]:
        with vsi.open_seekable(path) as f:
            f.seek(hdr["index_pos"])
            nodes = np.frombuffer(f.read(hdr["index_len"]), _NODE)
        cands = sorted(_rtree_search(nodes, hdr["count"],
                                     hdr["node_size"], bbox),
                       key=lambda c: c[1])
        work = []
        for off, fid in cands:
            if work and fid == work[-1][1] + work[-1][2] \
                    and work[-1][2] < features_per_task:
                work[-1][2] += 1
            else:
                work.append([hdr["features_pos"] + off, fid, 1])
    else:
        # full scan: leaves carry every feature offset in file order
        if hdr["index_len"]:
            with vsi.open_seekable(path) as f:
                f.seek(hdr["index_pos"])
                nodes = np.frombuffer(f.read(hdr["index_len"]), _NODE)
            bounds, total = _level_bounds(hdr["count"], hdr["node_size"])
            offs = np.sort(nodes["off"][bounds[0][0]:].astype(np.int64))
            # one run per task chunk — O(count / features_per_task) rows
            work = [[hdr["features_pos"] + int(offs[i]), i,
                     int(min(features_per_task, len(offs) - i))]
                    for i in range(0, len(offs), features_per_task)]
        else:
            work = None                     # sequential scan fallback

    schema = T.StructType(
        [T.StructField("fid", T.LongType()),
         T.StructField("geom", T.BinaryType())]
        + [T.StructField(n, _spark_type(t)) for n, t in columns])
    cols = [f.name for f in schema.fields]
    gtype_hdr = hdr["gtype"]

    def parse_span(fh, start, fid_start, max_n):
        """Sequential scan of up to max_n size-prefixed features."""
        rows = []
        fid = fid_start
        fh.seek(start)
        while len(rows) < max_n:
            szb = fh.read(4)
            if len(szb) < 4:
                break
            size = struct.unpack("<I", szb)[0]
            buf = szb + fh.read(size)
            tpos = 4 + _u32(buf, 4)
            gp = _fb_indirect(buf, tpos, 0)
            g = _fgb_to_geom(buf, gp, gtype_hdr) if gp is not None else None
            praw = _fb_vector(buf, tpos, 1, "u1")
            vals = _props_decode(praw.tobytes() if praw is not None
                                 else b"", columns)
            rows.append([fid, wkb.encode(g) if g is not None else None]
                        + vals)
            fid += 1
        return rows

    if work is None:
        def parse_all(batches):
            for _pdf in batches:
                with vsi.open_seekable(path) as fh:
                    rows = parse_span(fh, hdr["features_pos"], 0,
                                      1 << 62)
                yield pd.DataFrame(rows, columns=cols) if rows else \
                    pd.DataFrame(columns=cols)
        one = spark.createDataFrame(pd.DataFrame({"x": [1]}))
        out = one.mapInPandas(parse_all, schema)
        if bbox is not None:
            # no R-tree in the file: the bbox contract still holds via a
            # worker-side envelope refine (same envelope-intersects test
            # the index would have applied)
            from ..core.geomops import envelopes as _envs
            from pyspark.sql.functions import pandas_udf

            @pandas_udf(T.BooleanType())
            def _hits(geom: pd.Series) -> pd.Series:
                e = _envs([bytes(b) if b is not None else None
                           for b in geom])
                ok = ~((e[:, 2] < bbox[0]) | (e[:, 0] > bbox[2])
                       | (e[:, 3] < bbox[1]) | (e[:, 1] > bbox[3]))
                return pd.Series(ok & np.isfinite(e).all(axis=1))

            out = out.where(_hits(out.geom))
        return out

    # pack whole runs into tasks of <= features_per_task features each
    ranges: list[list] = []
    cur: list = []
    cur_n = 0
    for run in work:
        if cur and cur_n + run[2] > features_per_task:
            ranges.append(cur)
            cur, cur_n = [], 0
        cur.append(run)
        cur_n += run[2]
    if cur:
        ranges.append(cur)
    if not ranges:
        return spark.createDataFrame([], schema)
    rdf = spark.createDataFrame(
        pd.DataFrame({"task": list(range(len(ranges)))}),
        schema=T.StructType([T.StructField("task", T.LongType())]))
    bc = spark.sparkContext.broadcast(ranges)

    def parse(batches):
        rg = bc.value
        for pdf in batches:
            frames = []
            with vsi.open_seekable(path) as fh:
                for t in pdf["task"]:
                    rows = []
                    for off, fid0, n in rg[int(t)]:
                        rows.extend(parse_span(fh, int(off), int(fid0),
                                               int(n)))
                    frames.append(pd.DataFrame(rows, columns=cols))
            yield pd.concat(frames) if frames else \
                pd.DataFrame(columns=cols)

    return rdf.mapInPandas(parse, schema)
