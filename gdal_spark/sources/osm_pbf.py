"""OSM PBF source — the protobuf flavor of OpenStreetMap planet files.

Reference: ogr/ogrsf_frmts/osm/osm_parser.cpp reads the same container
(fileformat.proto / osmformat.proto, a public spec): a sequence of

    [int32-BE header length][BlobHeader][Blob]

blobs whose ``OSMData`` payloads are zlib-compressed ``PrimitiveBlock``
messages holding delta-coded DenseNodes, Ways and Relations over a
per-block string table. Like mvt.py, the protobuf wire codec is
hand-rolled (varints + length-delimited messages; no protobuf library
dependency) and shares mvt.py's primitives.

Spark-first layout: the DRIVER reads only the tiny per-blob headers to
build a (path, offset, size) blob index; executors then pread + inflate +
decode their own blobs in parallel (`mapInPandas` over the index — the
same scatter pattern as the GeoTIFF strip reader). Packed varint fields
decode through a vectorized numpy lane (`unpack_varints`: one
``np.add.reduceat`` over 7-bit limbs, no per-byte Python loop) and the
delta chains are ``np.cumsum`` — at planet scale (~70k blobs / 8000-node
groups) the Python overhead per blob is a few microseconds per thousand
primitives.

Output DataFrames use the exact schemas of sources/osm.py (the XML
flavor), so `osm_layers`'s distributed node-join way assembly works
unchanged on either flavor.
"""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from .mvt import (_get_varint, _put_len_delim, _put_tag, _put_varint,
                  _walk, _zigzag)
from .osm import _NODE_SCHEMA, _REL_SCHEMA, _WAY_SCHEMA

_GRAN = 100                      # default granularity: 1e-7 degree units


# ---------------------------------------------------------------------------
# vectorized packed-varint lane
# ---------------------------------------------------------------------------

def unpack_varints(buf: bytes) -> np.ndarray:
    """Decode a packed varint field to int64 without a Python loop:
    split on continuation bits, then one reduceat over shifted 7-bit
    limbs (limbs of one varint occupy disjoint bit ranges, so add == or).
    Values are two's-complement 64-bit like the proto wire format."""
    if not buf:
        return np.zeros(0, np.int64)
    b = np.frombuffer(buf, np.uint8).astype(np.uint64)
    ends = np.flatnonzero(b < 128)
    starts = np.empty(len(ends), np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    idx = np.arange(len(b), dtype=np.int64)
    grp = np.searchsorted(ends, idx)
    pos = (idx - starts[grp]).astype(np.uint64)
    limbs = (b & np.uint64(127)) << (np.uint64(7) * pos)
    vals = np.add.reduceat(limbs, starts)
    return vals.astype(np.int64)          # wraps to two's complement


def unpack_sint(buf: bytes) -> np.ndarray:
    """Packed sint (zigzag) field -> int64."""
    v = unpack_varints(buf).astype(np.uint64)
    return ((v >> np.uint64(1)).astype(np.int64)
            ^ -(v & np.uint64(1)).astype(np.int64))


def _pack_varints(vals) -> bytes:
    out = bytearray()
    for v in vals:
        _put_varint(out, int(v))
    return bytes(out)


def _pack_sints(vals) -> bytes:
    out = bytearray()
    for v in vals:
        _put_varint(out, _zigzag(int(v)))
    return bytes(out)


# ---------------------------------------------------------------------------
# blob container
# ---------------------------------------------------------------------------

def scan_blobs(path: str):
    """Driver-side blob index: [(kind, payload_offset, payload_size)] —
    reads only the 13-50 byte headers, never the data."""
    out = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(4)
            if len(hdr) < 4:
                break
            (hlen,) = struct.unpack(">I", hdr)
            bh = f.read(hlen)
            kind, datasize = "", 0
            for field, _wire, v in _walk(bh):
                if field == 1:
                    kind = v.decode("utf-8")
                elif field == 3:
                    datasize = v
            out.append((kind, f.tell(), datasize))
            f.seek(datasize, 1)
    return out


def _inflate_blob(raw: bytes) -> bytes:
    data = None
    for field, _wire, v in _walk(raw):
        if field == 1:                    # raw (uncompressed)
            data = v
        elif field == 3:                  # zlib_data
            data = zlib.decompress(v)
    if data is None:
        raise ValueError("Blob carries no raw/zlib payload")
    return data


# ---------------------------------------------------------------------------
# PrimitiveBlock decode
# ---------------------------------------------------------------------------

def _tags_json(st, keys, vals) -> str:
    if len(keys) == 0:
        return "{}"
    return json.dumps({st[int(k)]: st[int(v)] for k, v in zip(keys, vals)},
                      sort_keys=True)


def parse_primitive_block(data: bytes):
    """PrimitiveBlock bytes -> (node_rows, way_rows, rel_rows) matching
    the osm.py schemas."""
    st: list[str] = []
    groups = []
    gran, lat_off, lon_off = _GRAN, 0, 0
    for field, _wire, v in _walk(data):
        if field == 1:                    # stringtable
            st = [s.decode("utf-8") for f2, _w, s in _walk(v) if f2 == 1]
        elif field == 2:
            groups.append(v)
        elif field == 17:
            gran = v
        elif field == 19:
            lat_off = v
        elif field == 20:
            lon_off = v
    nodes, ways, rels = [], [], []
    for g in groups:
        for field, _wire, v in _walk(g):
            if field == 2:                # DenseNodes
                ids = lats = lons = None
                kv = np.zeros(0, np.int64)
                for f2, _w, p in _walk(v):
                    if f2 == 1:
                        ids = np.cumsum(unpack_sint(p))
                    elif f2 == 8:
                        lats = np.cumsum(unpack_sint(p))
                    elif f2 == 9:
                        lons = np.cumsum(unpack_sint(p))
                    elif f2 == 10:
                        kv = unpack_varints(p)
                if ids is None:
                    continue
                lat = 1e-9 * (lat_off + gran * lats)
                lon = 1e-9 * (lon_off + gran * lons)
                # keys_vals: k,v pairs per node, 0-terminated
                tag_strs = []
                if kv.size:
                    zeros = np.flatnonzero(kv == 0)
                    start = 0
                    for z in zeros:
                        seg = kv[start:z]
                        tag_strs.append(_tags_json(st, seg[0::2],
                                                   seg[1::2]))
                        start = z + 1
                while len(tag_strs) < len(ids):
                    tag_strs.append("{}")
                nodes.extend(zip(ids.tolist(), lon.tolist(), lat.tolist(),
                                 tag_strs))
            elif field == 3:              # Way
                wid, keys, vals, refs = 0, (), (), np.zeros(0, np.int64)
                for f2, _w, p in _walk(v):
                    if f2 == 1:
                        wid = p
                    elif f2 == 2:
                        keys = unpack_varints(p)
                    elif f2 == 3:
                        vals = unpack_varints(p)
                    elif f2 == 8:
                        refs = np.cumsum(unpack_sint(p))
                ways.append((wid, refs.tolist(),
                             _tags_json(st, keys, vals)))
            elif field == 4:              # Relation
                rid, keys, vals = 0, (), ()
                roles = memids = types = np.zeros(0, np.int64)
                for f2, _w, p in _walk(v):
                    if f2 == 1:
                        rid = p
                    elif f2 == 2:
                        keys = unpack_varints(p)
                    elif f2 == 3:
                        vals = unpack_varints(p)
                    elif f2 == 8:
                        roles = unpack_varints(p)
                    elif f2 == 9:
                        memids = np.cumsum(unpack_sint(p))
                    elif f2 == 10:
                        types = unpack_varints(p)
                keep = types == 1         # way members, like osm.py
                rels.append((rid, memids[keep].tolist(),
                             [st[int(r)] for r in roles[keep]],
                             _tags_json(st, keys, vals)))
    return nodes, ways, rels


def read_osm_pbf(spark: SparkSession, path: str):
    """-> (nodes, ways, relations) DataFrames — blob-parallel decode."""
    blobs = [(o, s) for kind, o, s in scan_blobs(path)
             if kind == "OSMData"]
    bdf = spark.createDataFrame(pd.DataFrame(blobs,
                                             columns=["off", "size"]))
    bdf = bdf.repartition(min(len(blobs), 64) or 1)

    def _decode(batches, want):
        for pdf in batches:
            rows = []
            with open(path, "rb") as f:
                for off, size in zip(pdf["off"], pdf["size"]):
                    f.seek(int(off))
                    data = _inflate_blob(f.read(int(size)))
                    n, w, r = parse_primitive_block(data)
                    rows.extend((n, w, r)[want])
            cols = [[_NODE_SCHEMA, _WAY_SCHEMA, _REL_SCHEMA][want]
                    .fieldNames()]
            yield pd.DataFrame(rows, columns=cols[0])

    nodes = bdf.mapInPandas(lambda it: _decode(it, 0), _NODE_SCHEMA)
    ways = bdf.mapInPandas(lambda it: _decode(it, 1), _WAY_SCHEMA)
    rels = bdf.mapInPandas(lambda it: _decode(it, 2), _REL_SCHEMA)
    return nodes, ways, rels


def osm_pbf_layers(spark: SparkSession, path: str) -> dict:
    """OGR-style layer dict over a .osm.pbf — same assembly as the XML
    flavor (distributed node join)."""
    from .osm import _coords_to_geom, _way_coords, osm_layers  # noqa: F401
    from . import osm as _osm
    nodes, ways, rels = read_osm_pbf(spark, path)
    return _osm._layers_from_parsed(spark, nodes, ways, rels)


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------

def _string_table(strings: list[str]) -> bytes:
    out = bytearray()
    for s in strings:
        _put_len_delim(out, 1, s.encode("utf-8"))
    return bytes(out)


def _blob(kind: str, payload: bytes) -> bytes:
    blob = bytearray()
    _put_tag(blob, 2, 0)                  # raw_size
    _put_varint(blob, len(payload))
    _put_len_delim(blob, 3, zlib.compress(payload, 6))
    bh = bytearray()
    _put_len_delim(bh, 1, kind.encode("utf-8"))
    _put_tag(bh, 3, 0)
    _put_varint(bh, len(blob))
    return struct.pack(">I", len(bh)) + bytes(bh) + bytes(blob)


def write_osm_pbf(nodes, ways=(), relations=(), path: str = "",
                  nodes_per_block: int = 100) -> None:
    """Fixture writer (same argument shapes as osm.write_osm): nodes
    [(id, lon, lat, {tags})], ways [(id, [refs], {tags})], relations
    [(id, [(way_ref, role)], {tags})]. Coordinates quantize to the
    1e-7-degree default granularity via floor(x*1e7 + 0.5). Nodes split
    into DenseNodes blocks of ``nodes_per_block`` so a reader sees real
    multi-blob parallelism."""
    chunks = [list(nodes[i:i + nodes_per_block])
              for i in range(0, len(nodes), nodes_per_block)] or [[]]

    out = bytearray()
    hdr = bytearray()
    _put_len_delim(hdr, 4, b"OsmSchema-V0.6")
    _put_len_delim(hdr, 4, b"DenseNodes")
    out += _blob("OSMHeader", bytes(hdr))

    for ci, chunk in enumerate(chunks):
        strings = [""]
        sidx: dict[str, int] = {"": 0}

        def s_of(s: str) -> int:
            if s not in sidx:
                sidx[s] = len(strings)
                strings.append(s)
            return sidx[s]

        dense = bytearray()
        ids = [int(i) for i, _lo, _la, _t in chunk]
        lons = [int(np.floor(lo * 1e7 + 0.5)) for _i, lo, _la, _t in chunk]
        lats = [int(np.floor(la * 1e7 + 0.5)) for _i, _lo, la, _t in chunk]
        kv: list[int] = []
        for _i, _lo, _la, tg in chunk:
            for k, v in sorted((tg or {}).items()):
                kv.append(s_of(k))
                kv.append(s_of(str(v)))
            kv.append(0)
        _put_len_delim(dense, 1, _pack_sints(np.diff([0] + ids)))
        _put_len_delim(dense, 8, _pack_sints(np.diff([0] + lats)))
        _put_len_delim(dense, 9, _pack_sints(np.diff([0] + lons)))
        if chunk:
            _put_len_delim(dense, 10, _pack_varints(kv))
        group = bytearray()
        _put_len_delim(group, 2, bytes(dense))

        last = ci == len(chunks) - 1
        if last:
            for wid, refs, tg in ways:
                w = bytearray()
                _put_tag(w, 1, 0)
                _put_varint(w, int(wid))
                ks = [s_of(k) for k, _v in sorted((tg or {}).items())]
                vs = [s_of(str(v)) for _k, v in sorted((tg or {}).items())]
                if ks:
                    _put_len_delim(w, 2, _pack_varints(ks))
                    _put_len_delim(w, 3, _pack_varints(vs))
                _put_len_delim(w, 8, _pack_sints(
                    np.diff([0] + [int(r) for r in refs])))
                _put_len_delim(group, 3, bytes(w))
            for rid, members, tg in relations:
                r = bytearray()
                _put_tag(r, 1, 0)
                _put_varint(r, int(rid))
                ks = [s_of(k) for k, _v in sorted((tg or {}).items())]
                vs = [s_of(str(v)) for _k, v in sorted((tg or {}).items())]
                if ks:
                    _put_len_delim(r, 2, _pack_varints(ks))
                    _put_len_delim(r, 3, _pack_varints(vs))
                _put_len_delim(r, 8, _pack_varints(
                    [s_of(role) for _m, role in members]))
                _put_len_delim(r, 9, _pack_sints(
                    np.diff([0] + [int(m) for m, _ro in members])))
                _put_len_delim(r, 10, _pack_varints([1] * len(members)))
                _put_len_delim(group, 4, bytes(r))

        blk = bytearray()
        _put_len_delim(blk, 1, _string_table(strings))
        _put_len_delim(blk, 2, bytes(group))
        _put_tag(blk, 17, 0)
        _put_varint(blk, _GRAN)
        out += _blob("OSMData", bytes(blk))

    with open(path, "wb") as f:
        f.write(bytes(out))
