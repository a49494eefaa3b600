"""Minimal ISO WKB codec (2-D) in pure numpy / struct.

The engine-wide geometry representation is a WKB ``bytes`` column (exactly the
encoding OGR's Arrow interface uses for geometry columns —
/root/reference/ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp encodes geometry as
WKB binary arrays; import/export semantics follow
/root/reference/ogr/ogrgeometry.cpp:1515 (importFromWkb) / :1610 (exportToWkb)).

Supported: Point, LineString, Polygon, MultiPoint, MultiLineString,
MultiPolygon, GeometryCollection — 2-D, little-endian. Curve/TIN types are
linearized or rejected on ingest (documented v1 scope cut, mirroring
ogr2ogr's forceTo linearization, /root/reference/apps/ogr2ogr_lib.cpp:6817-6833).

Internal decoded form: ``Geom`` — a lightweight struct of numpy arrays chosen
for vectorized math, NOT a port of OGRGeometry's class hierarchy.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import List

import numpy as np

POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7
CIRCULARSTRING = 8        # linearized on decode (ingest policy)
COMPOUNDCURVE = 9
CURVEPOLYGON = 10
MULTICURVE = 11
MULTISURFACE = 12

TYPE_NAMES = {
    POINT: "POINT", LINESTRING: "LINESTRING", POLYGON: "POLYGON",
    MULTIPOINT: "MULTIPOINT", MULTILINESTRING: "MULTILINESTRING",
    MULTIPOLYGON: "MULTIPOLYGON", GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
    CIRCULARSTRING: "CIRCULARSTRING", COMPOUNDCURVE: "COMPOUNDCURVE",
    CURVEPOLYGON: "CURVEPOLYGON", MULTICURVE: "MULTICURVE",
    MULTISURFACE: "MULTISURFACE",
}

_HDR = struct.Struct("<BI")
_U32 = struct.Struct("<I")
_PT = struct.Struct("<2d")


@dataclass
class Geom:
    """Decoded 2-D geometry.

    ``rings`` is a list of (n,2) float64 arrays:
      - POINT: one (1,2); LINESTRING: one (n,2)
      - POLYGON: one array per ring (first = exterior, rest = holes)
    ``parts`` (multi/collection): list of child Geom.
    """
    gtype: int
    rings: List[np.ndarray] = field(default_factory=list)
    parts: List["Geom"] = field(default_factory=list)

    # -- convenience ------------------------------------------------------
    def envelope(self):
        xs, ys = [], []
        for r in self.rings:
            if len(r):
                xs.append(r[:, 0]); ys.append(r[:, 1])
        for p in self.parts:
            e = p.envelope()
            if e is not None:
                xs.append(np.array([e[0], e[2]])); ys.append(np.array([e[1], e[3]]))
        if not xs:
            return None
        x = np.concatenate(xs); y = np.concatenate(ys)
        return (float(x.min()), float(y.min()), float(x.max()), float(y.max()))

    def polygons(self) -> List[List[np.ndarray]]:
        """Flatten to list of polygons (each a list of rings)."""
        if self.gtype == POLYGON:
            return [self.rings]
        out = []
        for p in self.parts:
            out.extend(p.polygons())
        return out

    def points(self) -> np.ndarray:
        """All point coordinates as (n,2) (for POINT/MULTIPOINT)."""
        arrs = [r for r in self.rings if len(r)]
        for p in self.parts:
            sub = p.points()
            if len(sub):
                arrs.append(sub)
        return np.concatenate(arrs) if arrs else np.empty((0, 2))


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode(buf: bytes, curves: bool = False) -> Geom:
    """WKB -> Geom. With ``curves=False`` (the ingest default) ISO curve
    types 8-12 linearize on decode (the ogr2ogr forceTo policy); with
    ``curves=True`` they are preserved natively (CIRCULARSTRING keeps its
    arc control points, COMPOUNDCURVE/CURVEPOLYGON/MULTICURVE/MULTISURFACE
    keep child Geoms) so encode() round-trips the input byte-for-byte —
    OGRGeometry's curve model, ogr/ogrgeometry.h OGRCircularString et al."""
    g, _ = _decode_at(buf, 0, curves)
    return g


def _decode_at(buf: bytes, off: int, curves: bool = False):
    byte_order, wkb_type = _HDR.unpack_from(buf, off)
    off += 5
    if byte_order != 1:
        raise ValueError("big-endian WKB not supported (write little-endian)")
    if wkb_type & 0x80000000 or wkb_type & 0x40000000 or wkb_type & 0x20000000:
        raise ValueError("EWKB flag bits not supported; use ISO WKB")
    # strip ISO Z/M/ZM decorations (1xxx=Z, 2xxx=M -> 3 values per point;
    # 3xxx=ZM -> 4); only x,y are kept
    base = wkb_type % 1000
    deco = wkb_type // 1000
    dim = {0: 2, 1: 3, 2: 3, 3: 4}.get(deco)
    if dim is None:
        raise ValueError(f"unsupported WKB type {wkb_type}")
    if base == POINT:
        n = dim
        pt = np.frombuffer(buf, dtype="<f8", count=n, offset=off)[:2].reshape(1, 2)
        return Geom(POINT, [pt.astype(np.float64)]), off + 8 * n
    if base == LINESTRING:
        (npts,) = _U32.unpack_from(buf, off); off += 4
        arr = np.frombuffer(buf, dtype="<f8", count=npts * dim, offset=off).reshape(npts, dim)
        return Geom(LINESTRING, [np.ascontiguousarray(arr[:, :2], dtype=np.float64)]), off + 8 * dim * npts
    if base == POLYGON:
        (nrings,) = _U32.unpack_from(buf, off); off += 4
        rings = []
        for _ in range(nrings):
            (npts,) = _U32.unpack_from(buf, off); off += 4
            arr = np.frombuffer(buf, dtype="<f8", count=npts * dim, offset=off).reshape(npts, dim)
            rings.append(np.ascontiguousarray(arr[:, :2], dtype=np.float64))
            off += 8 * dim * npts
        return Geom(POLYGON, rings), off
    if base in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        (nparts,) = _U32.unpack_from(buf, off); off += 4
        parts = []
        for _ in range(nparts):
            g, off = _decode_at(buf, off, curves)
            parts.append(g)
        return Geom(base, parts=parts), off
    if base == CIRCULARSTRING:
        # linearize on ingest (the ogr2ogr forceTo policy,
        # apps/ogr2ogr_lib.cpp:6817-6833): each arc triple (p0, p1, p2)
        # samples the circle through the three points
        (npts,) = _U32.unpack_from(buf, off); off += 4
        arr = np.frombuffer(buf, dtype="<f8", count=npts * dim,
                            offset=off).reshape(npts, dim)[:, :2]
        off += 8 * dim * npts
        a = np.ascontiguousarray(arr, dtype=np.float64)
        if curves:
            return Geom(CIRCULARSTRING, [a]), off
        return Geom(LINESTRING, [linearize_arcs(a)]), off
    if base == COMPOUNDCURVE:
        (nparts,) = _U32.unpack_from(buf, off); off += 4
        pieces = []
        for _ in range(nparts):
            g, off = _decode_at(buf, off, curves)
            pieces.append(g)
        if curves:
            return Geom(COMPOUNDCURVE, parts=pieces), off
        joined = [pieces[0].rings[0]] + [p.rings[0][1:]
                                         for p in pieces[1:]]
        return Geom(LINESTRING, [np.concatenate(joined)]), off
    if base == CURVEPOLYGON:
        (nrings,) = _U32.unpack_from(buf, off); off += 4
        rings = []
        ring_geoms = []
        for _ in range(nrings):
            g, off = _decode_at(buf, off, curves)
            if curves:
                ring_geoms.append(g)
                continue
            r = g.rings[0]
            if len(r) and not np.array_equal(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            rings.append(r)
        if curves:
            return Geom(CURVEPOLYGON, parts=ring_geoms), off
        return Geom(POLYGON, rings), off
    if base in (MULTICURVE, MULTISURFACE):
        (nparts,) = _U32.unpack_from(buf, off); off += 4
        parts = []
        for _ in range(nparts):
            g, off = _decode_at(buf, off, curves)
            parts.append(g)
        if curves:
            return Geom(base, parts=parts), off
        return Geom(MULTILINESTRING if base == MULTICURVE else MULTIPOLYGON,
                    parts=parts), off
    raise ValueError(f"unsupported WKB type {wkb_type}")


def linearize_arcs(pts: np.ndarray, max_angle_deg: float = 4.0) -> np.ndarray:
    """CircularString -> LineString: every consecutive (p0, p1, p2) triple
    is a circular arc through three points; sample it at <= max_angle_deg
    steps (OGRGeometryFactory::curveToLineString semantics — the ISO
    linearization ogr2ogr applies on forceTo)."""
    if len(pts) < 3:
        return pts
    out = [pts[:1]]
    for k in range(0, len(pts) - 2, 2):
        p0, p1, p2 = pts[k], pts[k + 1], pts[k + 2]
        ax, ay = p0
        bx, by = p1
        cx, cy = p2
        d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if abs(d) < 1e-12:                      # collinear: straight lines
            out.append(np.array([p1, p2]))
            continue
        ux = ((ax ** 2 + ay ** 2) * (by - cy) + (bx ** 2 + by ** 2)
              * (cy - ay) + (cx ** 2 + cy ** 2) * (ay - by)) / d
        uy = ((ax ** 2 + ay ** 2) * (cx - bx) + (bx ** 2 + by ** 2)
              * (ax - cx) + (cx ** 2 + cy ** 2) * (bx - ax)) / d
        r = float(np.hypot(ax - ux, ay - uy))
        a0 = np.arctan2(ay - uy, ax - ux)
        a1 = np.arctan2(by - uy, bx - ux)
        a2 = np.arctan2(cy - uy, cx - ux)
        # go from a0 through a1 to a2 (choose the sweep containing a1)
        def _sweep(s, m, e):
            ccw_m = (m - s) % (2 * np.pi)
            ccw_e = (e - s) % (2 * np.pi)
            if ccw_m <= ccw_e:
                return ccw_e                    # counter-clockwise
            return ccw_e - 2 * np.pi            # clockwise (negative)
        sw = _sweep(a0, a1, a2)
        n = max(2, int(np.ceil(abs(sw) / np.deg2rad(max_angle_deg))))
        ang = a0 + sw * np.linspace(0.0, 1.0, n + 1)[1:]
        out.append(np.stack([ux + r * np.cos(ang),
                             uy + r * np.sin(ang)], axis=1))
    return np.concatenate(out)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode(g: Geom) -> bytes:
    out = bytearray()
    _encode_into(g, out)
    return bytes(out)


def _encode_into(g: Geom, out: bytearray):
    out += _HDR.pack(1, g.gtype)
    if g.gtype == POINT:
        out += _PT.pack(float(g.rings[0][0, 0]), float(g.rings[0][0, 1]))
    elif g.gtype in (LINESTRING, CIRCULARSTRING):
        arr = np.ascontiguousarray(g.rings[0], dtype="<f8")
        out += _U32.pack(len(arr))
        out += arr.tobytes()
    elif g.gtype == POLYGON:
        out += _U32.pack(len(g.rings))
        for r in g.rings:
            arr = np.ascontiguousarray(r, dtype="<f8")
            out += _U32.pack(len(arr))
            out += arr.tobytes()
    else:
        out += _U32.pack(len(g.parts))
        for p in g.parts:
            _encode_into(p, out)


# -- constructors -----------------------------------------------------------

def point(x: float, y: float) -> bytes:
    return encode(Geom(POINT, [np.array([[x, y]], dtype=np.float64)]))


def linestring(coords) -> bytes:
    return encode(Geom(LINESTRING, [np.asarray(coords, dtype=np.float64)]))


def polygon(exterior, holes=()) -> bytes:
    rings = [_close_ring(np.asarray(exterior, dtype=np.float64))]
    rings += [_close_ring(np.asarray(h, dtype=np.float64)) for h in holes]
    return encode(Geom(POLYGON, rings))


def box(xmin, ymin, xmax, ymax) -> bytes:
    return polygon([(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin)])


def multipolygon(polys) -> bytes:
    parts = [decode(p) if isinstance(p, (bytes, bytearray)) else
             Geom(POLYGON, [_close_ring(np.asarray(r, dtype=np.float64)) for r in p])
             for p in polys]
    return encode(Geom(MULTIPOLYGON, parts=parts))


def _close_ring(r: np.ndarray) -> np.ndarray:
    if len(r) and not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


# -- curve model (ISO types 8-12, preserved by decode(curves=True)) ---------

def circularstring(coords) -> bytes:
    """Arc control points (odd count >= 3) -> CIRCULARSTRING WKB."""
    a = np.asarray(coords, dtype=np.float64)
    if len(a) < 3 or len(a) % 2 == 0:
        raise ValueError("CircularString needs an odd point count >= 3")
    return encode(Geom(CIRCULARSTRING, [a]))


def compoundcurve(segments) -> bytes:
    """Segments: list of ('line'|'arc', coords) -> COMPOUNDCURVE WKB.
    Consecutive segments must share endpoints (caller contract, as in
    OGRCompoundCurve::addCurve)."""
    parts = []
    for kind, coords in segments:
        a = np.asarray(coords, dtype=np.float64)
        parts.append(Geom(CIRCULARSTRING if kind == "arc" else LINESTRING,
                          [a]))
    return encode(Geom(COMPOUNDCURVE, parts=parts))


def curvepolygon(rings) -> bytes:
    """Rings: list of Geom (LINESTRING / CIRCULARSTRING / COMPOUNDCURVE,
    closed) or coordinate arrays (-> closed LINESTRING rings)."""
    parts = []
    for r in rings:
        if isinstance(r, Geom):
            parts.append(r)
        else:
            parts.append(Geom(LINESTRING,
                              [_close_ring(np.asarray(r, np.float64))]))
    return encode(Geom(CURVEPOLYGON, parts=parts))


def linearize_geom(g: Geom, max_angle_deg: float = 4.0) -> Geom:
    """Curve-model Geom -> linear-model Geom (OGRGeometryFactory::
    forceTo / curveToLineString semantics — exactly what
    decode(curves=False) produces in one step)."""
    t = g.gtype
    if t == CIRCULARSTRING:
        return Geom(LINESTRING, [linearize_arcs(g.rings[0],
                                                max_angle_deg)])
    if t == COMPOUNDCURVE:
        pieces = [linearize_geom(p, max_angle_deg).rings[0]
                  for p in g.parts]
        joined = [pieces[0]] + [p[1:] for p in pieces[1:]]
        return Geom(LINESTRING, [np.concatenate(joined)])
    if t == CURVEPOLYGON:
        rings = []
        for p in g.parts:
            r = linearize_geom(p, max_angle_deg).rings[0]
            rings.append(_close_ring(r))
        return Geom(POLYGON, rings)
    if t == MULTICURVE:
        return Geom(MULTILINESTRING,
                    parts=[linearize_geom(p, max_angle_deg)
                           for p in g.parts])
    if t == MULTISURFACE:
        return Geom(MULTIPOLYGON,
                    parts=[linearize_geom(p, max_angle_deg)
                           for p in g.parts])
    if g.parts:
        return Geom(t, rings=g.rings,
                    parts=[linearize_geom(p, max_angle_deg)
                           for p in g.parts])
    return g


# -- WKT (tests / debugging, matching ogrgeometry.cpp:1983 exportToWkt) -----

def to_wkt(buf: bytes, ndigits: int = 8) -> str:
    g = decode(buf)
    return _wkt(g, ndigits)


def _fmt(v, nd):
    s = f"{v:.{nd}f}".rstrip("0").rstrip(".")
    return s if s not in ("-0", "") else "0"


def _coords_wkt(arr, nd):
    return ",".join(f"{_fmt(x, nd)} {_fmt(y, nd)}" for x, y in arr)


def _wkt(g: Geom, nd) -> str:
    t = TYPE_NAMES[g.gtype]
    if g.gtype == POINT:
        return f"POINT ({_coords_wkt(g.rings[0], nd)})"
    if g.gtype == LINESTRING:
        return f"LINESTRING ({_coords_wkt(g.rings[0], nd)})"
    if g.gtype == POLYGON:
        inner = ",".join(f"({_coords_wkt(r, nd)})" for r in g.rings)
        return f"POLYGON ({inner})"
    if g.gtype == GEOMETRYCOLLECTION:
        return f"GEOMETRYCOLLECTION ({','.join(_wkt(p, nd) for p in g.parts)})"
    bodies = []
    for p in g.parts:
        b = _wkt(p, nd)
        bodies.append(b[b.index("("):])
    return f"{t} ({','.join(bodies)})"


def from_wkt(wkt: str) -> bytes:
    """Parse a (simple, 2-D) WKT string. Test/fixture helper."""
    wkt = wkt.strip()
    name = wkt.split("(", 1)[0].strip().upper().replace(" Z", "")
    body = wkt[wkt.index("("):] if "(" in wkt else "EMPTY"
    inv = {v: k for k, v in TYPE_NAMES.items()}
    t = inv[name]
    toks = _parse_nested(body)
    if t == POINT:
        return encode(Geom(POINT, [np.asarray(toks, dtype=np.float64).reshape(1, 2)]))
    if t == LINESTRING:
        return encode(Geom(LINESTRING, [np.asarray(toks, dtype=np.float64)]))
    if t == POLYGON:
        return encode(Geom(POLYGON, [np.asarray(r, dtype=np.float64) for r in toks]))
    if t == MULTIPOINT:
        pts = [Geom(POINT, [np.asarray(p, dtype=np.float64).reshape(1, 2)])
               for p in (toks if isinstance(toks[0][0], (list, tuple)) is False else toks)]
        return encode(Geom(MULTIPOINT, parts=pts))
    if t == MULTILINESTRING:
        parts = [Geom(LINESTRING, [np.asarray(ls, dtype=np.float64)]) for ls in toks]
        return encode(Geom(MULTILINESTRING, parts=parts))
    if t == MULTIPOLYGON:
        parts = [Geom(POLYGON, [np.asarray(r, dtype=np.float64) for r in poly]) for poly in toks]
        return encode(Geom(MULTIPOLYGON, parts=parts))
    raise ValueError(f"from_wkt: unsupported {name}")


def _parse_nested(s: str):
    """Parse nested parenthesized coordinate lists into nested python lists."""
    s = s.strip()
    if not s.startswith("("):
        raise ValueError(s)
    stack = [[]]
    i = 0
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == "(":
            stack.append([])
            i += 1
        elif ch == ")":
            done = stack.pop()
            stack[-1].append(done)
            i += 1
        elif ch == ",":
            i += 1
        else:
            j = i
            while j < n and s[j] not in "(),":
                j += 1
            coord = [float(v) for v in s[i:j].split()]
            stack[-1].append(tuple(coord))
            i = j
    result = stack[0][0]
    return result


# ---------------------------------------------------------------------------
# vectorized batch decode — the hot-path fast lanes
# ---------------------------------------------------------------------------
# An ST_-heavy query spends its time decoding WKB. Columns are almost always
# HOMOGENEOUS (all points, or all single-ring polygons), so the batch parsers
# below handle those two layouts with np.frombuffer + offset arithmetic (no
# per-row Python) and return None for anything mixed — callers fall back to
# the scalar decoder, memoized per worker.

_POINT_LEN = 21  # 1 (endian) + 4 (type) + 16 (xy)


def points_batch(wkbs) -> "np.ndarray | None":
    """(n,2) float64 coords if EVERY element is a 2-D LE WKB POINT, else
    None. One concat + one frombuffer — no per-row parsing."""
    n = len(wkbs)
    if n == 0:
        return np.empty((0, 2))
    try:
        buf = b"".join(bytes(b) for b in wkbs)
    except TypeError:
        return None                    # a None snuck in
    if len(buf) != _POINT_LEN * n:
        return None
    raw = np.frombuffer(buf, dtype=np.uint8).reshape(n, _POINT_LEN)
    if not (raw[:, 0] == 1).all() or not \
            (raw[:, 1:5] == np.array([1, 0, 0, 0], np.uint8)).all():
        return None
    return np.ascontiguousarray(raw[:, 5:]).view("<f8").reshape(n, 2)


def encode_points_batch(coords: np.ndarray) -> list[bytes]:
    """Inverse of points_batch: (n, 2) float64 -> n little-endian WKB POINT
    blobs built as ONE numpy buffer, then sliced (slicing a bytes object is
    a cheap memcpy; the per-geometry recursive encoder is ~30x slower)."""
    coords = np.ascontiguousarray(coords, dtype="<f8")
    n = len(coords)
    if n == 0:
        return []
    raw = np.empty((n, _POINT_LEN), dtype=np.uint8)
    raw[:, 0] = 1
    raw[:, 1:5] = np.array([1, 0, 0, 0], np.uint8)
    raw[:, 5:] = coords.view(np.uint8).reshape(n, 16)
    buf = raw.tobytes()
    return [buf[i * _POINT_LEN:(i + 1) * _POINT_LEN] for i in range(n)]


def single_ring_batch(wkbs):
    """(ring_offsets, coords) if EVERY element is a 2-D LE WKB POLYGON with
    exactly one ring, else None. coords is the (total_pts, 2) concatenation;
    ring i spans coords[ring_offsets[i]:ring_offsets[i+1]]."""
    n = len(wkbs)
    if n == 0:
        return np.array([0], dtype=np.int64), np.empty((0, 2))
    lens = np.empty(n, dtype=np.int64)
    try:
        for i, b in enumerate(wkbs):
            if b is None:
                return None
            lens[i] = len(b)
    except TypeError:
        return None
    buf = b"".join(bytes(b) for b in wkbs)
    raw = np.frombuffer(buf, dtype=np.uint8)
    starts = np.r_[0, np.cumsum(lens)[:-1]]
    hdr = raw[starts[:, None] + np.arange(9)[None, :]]
    if not (hdr[:, 0] == 1).all() or not \
            (hdr[:, 1:9] == np.array([3, 0, 0, 0, 1, 0, 0, 0],
                                     np.uint8)).all():
        return None                    # not all single-ring LE polygons
    npts = np.ascontiguousarray(
        raw[starts[:, None] + (9 + np.arange(4))[None, :]]).view(
        "<u4").reshape(n).astype(np.int64)
    if not (lens == 13 + 16 * npts).all():
        return None                    # trailing data (e.g. extra rings)
    total = int(npts.sum())
    # gather every ring's coordinate bytes with one fancy index
    offs = np.repeat(starts + 13, npts * 16) + _ragged_arange(npts * 16)
    coords = np.ascontiguousarray(raw[offs]).view("<f8").reshape(total, 2)
    ring_offsets = np.r_[0, np.cumsum(npts)]
    return ring_offsets, coords


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    """concat([arange(c) for c in counts]) without the Python loop."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    # zero-safe: duplicate fancy indices from 0-length runs would collapse
    # under a scatter (`resets[ends[:-1]] = ...` keeps only the last write),
    # so rebuild each run's start via repeat instead.
    starts = np.r_[0, np.cumsum(counts)[:-1]]
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


_DECODE_CACHE: dict = {}
_DECODE_CACHE_MAX = 65536


def decode_cached(buf: bytes) -> Geom:
    """Per-worker memoized decode — repeated geometries (broadcast method
    layers, dimension tables) decode once per executor, same pattern as the
    pip join's polygon cache (operators/spatial_join.py)."""
    g = _DECODE_CACHE.get(buf)
    if g is None:
        if len(_DECODE_CACHE) >= _DECODE_CACHE_MAX:
            _DECODE_CACHE.clear()
        g = decode(buf)
        _DECODE_CACHE[buf] = g
    return g
