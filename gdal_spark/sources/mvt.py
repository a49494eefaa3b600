"""Mapbox Vector Tiles (MVT) read/write — z/x/y.pbf directory layout.

Twin of the reference's MVT driver (ogr/ogrsf_frmts/mvt/ogrmvtdataset.cpp,
mvtutils.h; format: the public Mapbox vector-tile-spec 2.1). No protobuf
dependency: the wire format (varints, zigzag, length-delimited messages)
is tiny and hand-coded here, which also keeps the encoder allocation-free
enough to run per tile inside applyInPandas.

Spark-first layout: the writer assigns each feature to the web-mercator
tiles its envelope covers (cell cover = the engine's standard spatial
partitioning), clips to the tile rect with the existing Liang-Barsky /
Sutherland-Hodgman kernels, then ONE groupBy(z,x,y) applyInPandas encodes
each tile's .pbf and writes it — the shuffle is keyed by tile, exactly the
layout the output needs, so encoding is embarrassingly parallel and no
tile is touched by two tasks. The reader plans one task per .pbf file via
spark.read.format("binaryFile") + mapInPandas decode. At 100 TB the same
plan holds: tiles are independent, skew is bounded by per-tile feature
counts (hot tiles can be split by layer), and files stream to object
storage from executors.

Decoded/encoded coordinates follow the spec's screen convention: integer
tile-local coords, y increasing downward, origin at the tile's NW corner;
`extent` pixels per tile side (default 4096). Mercator <-> tile math
matches core/tilemath.py's XYZ (top-origin) scheme.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterable, Optional

import numpy as np

from ..core import wkb
from ..core.tilemath import ORIGIN_SHIFT

# MVT geometry types (spec 4.3.4)
MVT_POINT, MVT_LINESTRING, MVT_POLYGON = 1, 2, 3
# geometry command ids (spec 4.3.5)
CMD_MOVETO, CMD_LINETO, CMD_CLOSEPATH = 1, 2, 7

DEFAULT_EXTENT = 4096
SPAN0 = 2.0 * ORIGIN_SHIFT


# ---------------------------------------------------------------------------
# protobuf wire primitives
# ---------------------------------------------------------------------------

def _put_varint(out: bytearray, n: int) -> None:
    if n < 0:  # proto varints are two's-complement 64-bit
        n += 1 << 64
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _get_varint(buf: bytes, off: int):
    n, shift = 0, 0
    while True:
        b = buf[off]
        off += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, off
        shift += 7


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _put_tag(out: bytearray, field: int, wire: int) -> None:
    _put_varint(out, (field << 3) | wire)


def _put_len_delim(out: bytearray, field: int, payload: bytes) -> None:
    _put_tag(out, field, 2)
    _put_varint(out, len(payload))
    out += payload


def _walk(buf: bytes, off: int = 0, end: Optional[int] = None):
    """Yield (field, wire, value, next_off) over one message's fields.
    wire 0 -> int, 1 -> 8 raw bytes, 2 -> bytes slice, 5 -> 4 raw bytes."""
    end = len(buf) if end is None else end
    while off < end:
        key, off = _get_varint(buf, off)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, off = _get_varint(buf, off)
        elif wire == 1:
            v, off = buf[off:off + 8], off + 8
        elif wire == 5:
            v, off = buf[off:off + 4], off + 4
        elif wire == 2:
            ln, off = _get_varint(buf, off)
            v, off = buf[off:off + ln], off + ln
        else:  # pragma: no cover - groups unused by MVT
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


# ---------------------------------------------------------------------------
# Value messages (spec 4.1) — typed property values
# ---------------------------------------------------------------------------

def _encode_value(v) -> bytes:
    out = bytearray()
    if isinstance(v, bool):
        _put_tag(out, 7, 0)
        _put_varint(out, int(v))
    elif isinstance(v, (int, np.integer)):
        _put_tag(out, 6, 0)               # sint64: compact for negatives
        _put_varint(out, _zigzag(int(v)))
    elif isinstance(v, (float, np.floating)):
        _put_tag(out, 3, 1)
        out += struct.pack("<d", float(v))
    else:
        _put_len_delim(out, 1, str(v).encode("utf-8"))
    return bytes(out)


def _decode_value(buf: bytes):
    for field, wire, v in _walk(buf):
        if field == 1:
            return v.decode("utf-8")
        if field == 2:
            return struct.unpack("<f", v)[0]
        if field == 3:
            return struct.unpack("<d", v)[0]
        if field == 4:                      # int64 (plain varint)
            return v - (1 << 64) if v >> 63 else v
        if field == 5:                      # uint64
            return v
        if field == 6:                      # sint64
            return _unzigzag(v)
        if field == 7:
            return bool(v)
    return None


# ---------------------------------------------------------------------------
# geometry command stream (spec 4.3.5)
# ---------------------------------------------------------------------------

def encode_geometry(gtype: int, parts: list) -> list:
    """Integer command stream for quantized parts (each an (k,2) int array).
    The cursor persists across parts; polygon rings omit the closing vertex
    and end with ClosePath."""
    cmds: list[int] = []
    cx = cy = 0
    if gtype == MVT_POINT:
        pts = np.concatenate(parts) if len(parts) > 1 else parts[0]
        cmds.append((len(pts) << 3) | CMD_MOVETO)
        for x, y in pts:
            cmds.append(_zigzag(int(x) - cx))
            cmds.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        return cmds
    for part in parts:
        part = np.asarray(part)
        if gtype == MVT_POLYGON and len(part) > 1 \
                and tuple(part[-1]) == tuple(part[0]):
            part = part[:-1]                # drop explicit closing vertex
        cmds.append((1 << 3) | CMD_MOVETO)
        cmds.append(_zigzag(int(part[0, 0]) - cx))
        cmds.append(_zigzag(int(part[0, 1]) - cy))
        cx, cy = int(part[0, 0]), int(part[0, 1])
        cmds.append(((len(part) - 1) << 3) | CMD_LINETO)
        for x, y in part[1:]:
            cmds.append(_zigzag(int(x) - cx))
            cmds.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        if gtype == MVT_POLYGON:
            cmds.append((1 << 3) | CMD_CLOSEPATH)
    return cmds


def decode_geometry(gtype: int, cmds: Iterable[int]) -> list:
    """Command stream -> list of (k,2) int arrays (rings closed back up)."""
    cmds = list(cmds)
    parts, cur = [], []
    cx = cy = 0
    i = 0
    while i < len(cmds):
        cmd_id, count = cmds[i] & 7, cmds[i] >> 3
        i += 1
        if cmd_id == CMD_MOVETO:
            for _ in range(count):
                if cur and cmd_id == CMD_MOVETO and gtype != MVT_POINT:
                    parts.append(np.array(cur))
                    cur = []
                cx += _unzigzag(cmds[i]); cy += _unzigzag(cmds[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cmd_id == CMD_LINETO:
            for _ in range(count):
                cx += _unzigzag(cmds[i]); cy += _unzigzag(cmds[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cmd_id == CMD_CLOSEPATH:
            cur.append(cur[0])              # re-close the ring
            parts.append(np.array(cur))
            cur = []
        else:  # pragma: no cover
            raise ValueError(f"bad command id {cmd_id}")
    if cur:
        parts.append(np.array(cur))
    return parts


def _shoelace2(ring: np.ndarray) -> float:
    """2x signed area in SCREEN coords (y down) — spec 4.3.5.3's surveyor
    formula; exterior rings must come out positive."""
    x, y = ring[:, 0].astype(np.float64), ring[:, 1].astype(np.float64)
    return float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


# ---------------------------------------------------------------------------
# layer / tile codec
# ---------------------------------------------------------------------------

def encode_layer(name: str, features: list, extent: int = DEFAULT_EXTENT
                 ) -> bytes:
    """features: list of (fid, gtype, parts, props-dict). Keys and typed
    values are deduplicated layer-wide exactly like the reference writer
    (mvtutils: shared key/value dictionaries per layer)."""
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    vals: list[bytes] = []
    val_idx: dict[bytes, int] = {}
    out = bytearray()
    _put_len_delim(out, 1, name.encode("utf-8"))
    for fid, gtype, parts, props in features:
        f = bytearray()
        if fid is not None:
            _put_tag(f, 1, 0)
            _put_varint(f, int(fid))
        tags = bytearray()
        for k, v in (props or {}).items():
            if v is None:
                continue
            if k not in key_idx:
                key_idx[k] = len(keys)
                keys.append(k)
            vb = _encode_value(v)
            if vb not in val_idx:
                val_idx[vb] = len(vals)
                vals.append(vb)
            _put_varint(tags, key_idx[k])
            _put_varint(tags, val_idx[vb])
        if tags:
            _put_len_delim(f, 2, bytes(tags))
        _put_tag(f, 3, 0)
        _put_varint(f, gtype)
        geom = bytearray()
        for c in encode_geometry(gtype, parts):
            _put_varint(geom, c)
        _put_len_delim(f, 4, bytes(geom))
        _put_len_delim(out, 2, bytes(f))
    for k in keys:
        _put_len_delim(out, 3, k.encode("utf-8"))
    for vb in vals:
        _put_len_delim(out, 4, vb)
    if extent != DEFAULT_EXTENT:
        _put_tag(out, 5, 0)
        _put_varint(out, extent)
    _put_tag(out, 15, 0)
    _put_varint(out, 2)                     # version 2
    return bytes(out)


def encode_tile(layers: dict, extent: int = DEFAULT_EXTENT) -> bytes:
    out = bytearray()
    for name, feats in layers.items():
        _put_len_delim(out, 3, encode_layer(name, feats, extent))
    return bytes(out)


def decode_tile(buf: bytes) -> list:
    """-> list of dicts: {layer, extent, fid, gtype, parts, props}."""
    feats = []
    for field, _, layer_buf in _walk(buf):
        if field != 3:
            continue
        name, extent = "", DEFAULT_EXTENT
        keys, vals, raw_feats = [], [], []
        for f, _, v in _walk(layer_buf):
            if f == 1:
                name = v.decode("utf-8")
            elif f == 2:
                raw_feats.append(v)
            elif f == 3:
                keys.append(v.decode("utf-8"))
            elif f == 4:
                vals.append(_decode_value(v))
            elif f == 5:
                extent = v
        for fb in raw_feats:
            fid, gtype, cmds, tags = None, 0, [], []
            for f, wire, v in _walk(fb):
                if f == 1:
                    fid = v
                elif f == 2:
                    off = 0
                    while off < len(v):
                        t, off = _get_varint(v, off)
                        tags.append(t)
                elif f == 3:
                    gtype = v
                elif f == 4:
                    off = 0
                    while off < len(v):
                        c, off = _get_varint(v, off)
                        cmds.append(c)
            props = {keys[tags[i]]: vals[tags[i + 1]]
                     for i in range(0, len(tags), 2)}
            feats.append({"layer": name, "extent": extent, "fid": fid,
                          "gtype": gtype,
                          "parts": decode_geometry(gtype, cmds),
                          "props": props})
    return feats


# ---------------------------------------------------------------------------
# mercator <-> tile-local quantization
# ---------------------------------------------------------------------------

def tile_of_merc(mx, my, zoom: int):
    """XYZ (top-origin) tile indices + fractional tile units. The float
    expressions are kept in this exact order so the SQL oracles can replay
    them bit-for-bit."""
    span = SPAN0 / (1 << zoom)
    u = (np.asarray(mx, np.float64) + ORIGIN_SHIFT) / span
    v = (ORIGIN_SHIFT - np.asarray(my, np.float64)) / span
    return np.floor(u).astype(np.int64), np.floor(v).astype(np.int64), u, v


def quantize(u, v, tx, ty, extent: int = DEFAULT_EXTENT):
    """Fractional tile units -> integer tile-local pixel coords."""
    ix = np.floor((np.asarray(u) - tx) * extent).astype(np.int64)
    iy = np.floor((np.asarray(v) - ty) * extent).astype(np.int64)
    return ix, iy


def _merc_of_local(ix, iy, tx, ty, zoom, extent):
    span = SPAN0 / (1 << zoom)
    mx = -ORIGIN_SHIFT + (tx + np.asarray(ix, np.float64) / extent) * span
    my = ORIGIN_SHIFT - (ty + np.asarray(iy, np.float64) / extent) * span
    return mx, my


def geom_to_mvt(g: wkb.Geom, tx: int, ty: int, zoom: int,
                extent: int = DEFAULT_EXTENT):
    """Quantize a mercator-coordinate Geom into tile (tx,ty): returns
    (mvt_gtype, parts) or None when the geometry degenerates (all points
    collapse / rings thinner than a pixel). Consecutive duplicate
    quantized vertices are dropped; polygon winding is normalized to the
    spec's screen-coord rule (exterior positive shoelace)."""
    span = SPAN0 / (1 << zoom)

    def q(arr):
        arr = np.asarray(arr, np.float64)
        u = (arr[:, 0] + ORIGIN_SHIFT) / span
        v = (ORIGIN_SHIFT - arr[:, 1]) / span
        ix, iy = quantize(u, v, tx, ty, extent)
        return np.stack([ix, iy], axis=1)

    def dedupe(p):
        if len(p) < 2:
            return p
        keep = np.r_[True, np.any(p[1:] != p[:-1], axis=1)]
        return p[keep]

    if g.gtype in (wkb.POINT, wkb.MULTIPOINT):
        pts = dedupe(q(g.points()))
        return (MVT_POINT, [pts]) if len(pts) else None
    if g.gtype in (wkb.LINESTRING, wkb.MULTILINESTRING):
        lines = list(g.rings) + [r for p in g.parts for r in p.rings]
        parts = [p for p in (dedupe(q(r)) for r in lines) if len(p) >= 2]
        return (MVT_LINESTRING, parts) if parts else None
    if g.gtype in (wkb.POLYGON, wkb.MULTIPOLYGON):
        parts = []
        for rings in g.polygons():         # exterior first, then holes
            for j, r in enumerate(rings):
                p = q(r)
                if len(p) > 1 and tuple(p[-1]) == tuple(p[0]):
                    p = p[:-1]
                p = dedupe(p)
                if len(p) >= 2 and tuple(p[-1]) == tuple(p[0]):
                    p = p[:-1]
                if len(p) < 3:
                    if j == 0:
                        break              # shell degenerated: skip holes
                    continue
                a2 = _shoelace2(np.vstack([p, p[:1]]))
                if a2 == 0:
                    if j == 0:
                        break
                    continue
                if (a2 > 0) != (j == 0):   # exterior positive, hole negative
                    p = p[::-1]
                parts.append(np.vstack([p, p[:1]]))
        return (MVT_POLYGON, parts) if parts else None
    return None


# ---------------------------------------------------------------------------
# Spark writer / reader
# ---------------------------------------------------------------------------

def write_mvt(df, out_dir: str, zoom: int, layer: str = "layer0",
              extent: int = DEFAULT_EXTENT, id_col: str = "fid",
              geom_col: str = "geom", prop_cols=(), buffer_px: int = 0):
    """Write (fid, geom-WKB-in-mercator, props...) to an MVT tile pyramid
    level: one .pbf per z/x/y (the reference's directory dataset layout,
    ogrmvtdataset.cpp OGRMVTWriterDataset). Returns the manifest DataFrame
    (z, x, y, n_features, n_bytes) — materializing it performs the write.

    Plan: mapInPandas envelope -> covered-tile explode (cell cover),
    ONE shuffle keyed by (x, y), applyInPandas per tile: clip (exact
    Liang-Barsky / Sutherland-Hodgman kernels) -> quantize -> encode ->
    write. Tiles are written exactly once, so the job is idempotent per
    task attempt (task re-runs overwrite the same bytes)."""
    import pandas as pd
    from pyspark.sql import functions as F, types as T

    from ..core.geomops import clip_geom_rect

    span = SPAN0 / (1 << zoom)
    nmax = (1 << zoom) - 1
    buf_m = buffer_px * span / extent
    props = list(prop_cols)
    base = df.select(F.col(id_col).cast("long").alias("fid"),
                     F.col(geom_col).alias("geom"), *props)

    cov_schema = T.StructType(
        [T.StructField("tx", T.LongType()), T.StructField("ty", T.LongType())]
        + [base.schema[n] for n in ["fid", "geom"] + props])

    def cover(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                g = wkb.decode(bytes(r.geom))
                env = g.envelope()
                if env is None:
                    continue
                x0 = int(np.floor((env[0] - buf_m + ORIGIN_SHIFT) / span))
                x1 = int(np.floor((env[2] + buf_m + ORIGIN_SHIFT) / span))
                y0 = int(np.floor((ORIGIN_SHIFT - (env[3] + buf_m)) / span))
                y1 = int(np.floor((ORIGIN_SHIFT - (env[1] - buf_m)) / span))
                for tx in range(max(0, x0), min(nmax, x1) + 1):
                    for ty in range(max(0, y0), min(nmax, y1) + 1):
                        rows.append((tx, ty) + tuple(r))
            yield pd.DataFrame(rows, columns=[f.name for f in cov_schema]) \
                if rows else pd.DataFrame(
                    {f.name: pd.Series(dtype="object")
                     for f in cov_schema})

    covered = base.mapInPandas(cover, cov_schema)

    out_schema = T.StructType([
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.LongType()), T.StructField("y", T.LongType()),
        T.StructField("n_features", T.LongType()),
        T.StructField("n_bytes", T.LongType())])

    def encode_group(key, pdf):
        tx, ty = int(key[0]), int(key[1])
        x0 = -ORIGIN_SHIFT + tx * span
        y1 = ORIGIN_SHIFT - ty * span
        feats = []
        pdf = pdf.sort_values("fid")
        for r in pdf.itertuples(index=False):
            g = wkb.decode(bytes(r.geom))
            if buf_m or g.gtype not in (wkb.POINT,):
                g = clip_geom_rect(g, x0 - buf_m, y1 - span - buf_m,
                                   x0 + span + buf_m, y1 + buf_m)
                if g is None:
                    continue
            q = geom_to_mvt(g, tx, ty, zoom, extent)
            if q is None:
                continue
            pr = {c: (v.item() if isinstance(v, np.generic) else v)
                  for c in props
                  for v in [getattr(r, c)]
                  if v is not None and v == v}
            feats.append((int(r.fid), q[0], q[1], pr))
        if not feats:
            return pd.DataFrame(columns=[f.name for f in out_schema])
        blob = encode_tile({layer: feats}, extent)
        d = os.path.join(out_dir, str(zoom), str(tx))
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{ty}.pbf"), "wb") as fh:
            fh.write(blob)
        return pd.DataFrame([(zoom, tx, ty, len(feats), len(blob))],
                            columns=[f.name for f in out_schema])

    return covered.groupBy("tx", "ty").applyInPandas(encode_group,
                                                     out_schema)


def write_metadata(out_dir: str, layer: str, zoom: int,
                   bounds=(-180.0, -85.05112878, 180.0, 85.05112878)):
    """metadata.json next to the tile tree (mvtutils: GDAL both writes and
    requires one to open a directory dataset)."""
    meta = {"name": os.path.basename(out_dir.rstrip("/")), "format": "pbf",
            "minzoom": zoom, "maxzoom": zoom,
            "bounds": ",".join(str(b) for b in bounds),
            "json": json.dumps({"vector_layers": [{"id": layer}]})}
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "metadata.json"), "w") as fh:
        json.dump(meta, fh)


def _props_as_str(props: dict) -> dict:
    out = {}
    for k, v in props.items():
        if isinstance(v, bool):
            out[k] = "true" if v else "false"
        elif isinstance(v, float):
            out[k] = repr(v)
        else:
            out[k] = str(v)
    return out


def read_mvt(spark, out_dir: str):
    """Read a z/x/y.pbf tree back: one task per tile file (binaryFile
    scan), mapInPandas decode -> (z, x, y, layer, fid, gtype, geom
    WKB-in-mercator, props as map<string,string> — canonical stringified
    values: ints bare, floats repr, bools true/false)."""
    import pandas as pd
    from pyspark.sql import types as T

    bf = spark.read.format("binaryFile").load(f"{out_dir}/*/*/*.pbf") \
        .select("path", "content")
    schema = T.StructType([
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.LongType()), T.StructField("y", T.LongType()),
        T.StructField("layer", T.StringType()),
        T.StructField("fid", T.LongType()),
        T.StructField("gtype", T.IntegerType()),
        T.StructField("geom", T.BinaryType()),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()))])

    def parse(batches):
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                parts_p = path.rstrip("/").split("/")
                z = int(parts_p[-3])
                tx = int(parts_p[-2])
                ty = int(parts_p[-1].split(".")[0])
                for f in decode_tile(bytes(blob)):
                    g = _mvt_to_geom(f["gtype"], f["parts"], tx, ty, z,
                                     f["extent"])
                    rows.append((z, tx, ty, f["layer"], f["fid"],
                                 f["gtype"],
                                 wkb.encode(g) if g else None,
                                 _props_as_str(f["props"])))
            cols = [s.name for s in schema]
            yield pd.DataFrame(rows, columns=cols) if rows else \
                pd.DataFrame({c: pd.Series(dtype="object") for c in cols})

    return bf.mapInPandas(parse, schema)


def read_mvt_vertices(spark, out_dir: str):
    """Exploded integer-vertex view (z, x, y, layer, fid, part, idx, ix,
    iy) — the tile-local quantized coordinates exactly as stored, which is
    what SQL oracles can recompute closed-form."""
    import pandas as pd
    from pyspark.sql import types as T

    bf = spark.read.format("binaryFile").load(f"{out_dir}/*/*/*.pbf") \
        .select("path", "content")
    schema = T.StructType([
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.LongType()), T.StructField("y", T.LongType()),
        T.StructField("layer", T.StringType()),
        T.StructField("fid", T.LongType()),
        T.StructField("part", T.IntegerType()),
        T.StructField("idx", T.IntegerType()),
        T.StructField("ix", T.LongType()), T.StructField("iy", T.LongType())])

    def parse(batches):
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                parts_p = path.rstrip("/").split("/")
                z = int(parts_p[-3]); tx = int(parts_p[-2])
                ty = int(parts_p[-1].split(".")[0])
                for f in decode_tile(bytes(blob)):
                    for pi, part in enumerate(f["parts"]):
                        for vi, (ix, iy) in enumerate(part):
                            rows.append((z, tx, ty, f["layer"], f["fid"],
                                         pi, vi, int(ix), int(iy)))
            cols = [s.name for s in schema]
            yield pd.DataFrame(rows, columns=cols) if rows else \
                pd.DataFrame({c: pd.Series(dtype="object") for c in cols})

    return bf.mapInPandas(parse, schema)


def _mvt_to_geom(gtype: int, parts: list, tx: int, ty: int, zoom: int,
                 extent: int) -> Optional[wkb.Geom]:
    """Tile-local integer parts -> mercator-coordinate Geom (the
    reference's read path materializes tile CRS coords the same way)."""
    def merc(p):
        mx, my = _merc_of_local(p[:, 0], p[:, 1], tx, ty, zoom, extent)
        return np.stack([mx, my], axis=1)

    if not parts:
        return None
    if gtype == MVT_POINT:
        pts = merc(np.concatenate(parts))
        if len(pts) == 1:
            return wkb.Geom(wkb.POINT, [pts])
        return wkb.Geom(wkb.MULTIPOINT,
                        parts=[wkb.Geom(wkb.POINT, [pts[i:i + 1]])
                               for i in range(len(pts))])
    if gtype == MVT_LINESTRING:
        if len(parts) == 1:
            return wkb.Geom(wkb.LINESTRING, [merc(parts[0])])
        return wkb.Geom(wkb.MULTILINESTRING,
                        parts=[wkb.Geom(wkb.LINESTRING, [merc(p)])
                               for p in parts])
    if gtype == MVT_POLYGON:
        polys = []
        for p in parts:
            if _shoelace2(p) > 0:          # exterior starts a new polygon
                polys.append([merc(p)])
            elif polys:
                polys[-1].append(merc(p))
        if not polys:
            return None
        if len(polys) == 1:
            return wkb.Geom(wkb.POLYGON, polys[0])
        return wkb.Geom(wkb.MULTIPOLYGON,
                        parts=[wkb.Geom(wkb.POLYGON, rs) for rs in polys])
    return None
