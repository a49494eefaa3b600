"""MapInfo Interchange Format (MIF/MID) source/sink.

Reference: /root/reference/ogr/ogrsf_frmts/mitab/mitab_miffile.cpp
(header parse: VERSION/CHARSET/DELIMITER/COLUMNS/DATA) and
mitab_feature_mif.cpp (per-feature geometry blocks: POINT/LINE/PLINE
[MULTIPLE]/REGION/NONE, with PEN/BRUSH/SYMBOL/SMOOTH/CENTER styling
clauses that readers must skip).

Distribution: the driver runs ONE streaming newline scan over the .mif
to find the DATA offset and the byte offset of every top-level geometry
keyword (a line whose first token is a geometry keyword at feature
level), plus the .mid line offsets — no geometry parsing on the driver.
Feature ranges then chunk into tasks; each task reads only its byte
slices of both files. The reference parses the pair sequentially on one
thread; the byte layout is the same, the work is just partitioned.

REGION ring nesting follows mitab's heuristic for well-formed data: a
ring nests as a hole of the first earlier shell containing its first
vertex; otherwise it starts a new shell (multipolygon)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..core import wkb as W
from ..core.geomops import points_in_ring

_GEOM_KEYWORDS = ("POINT", "LINE", "PLINE", "REGION", "NONE",
                  "MULTIPOINT", "RECT", "ROUNDRECT", "ELLIPSE", "ARC",
                  "TEXT")
_SKIP_CLAUSES = ("PEN", "BRUSH", "SYMBOL", "SMOOTH", "CENTER", "FONT",
                 "ANGLE", "JUSTIFY", "SPACING", "LABEL")

_MIF_TYPES = {"integer": T.LongType(), "smallint": T.LongType(),
              "float": T.DoubleType(), "decimal": T.DoubleType(),
              "char": T.StringType(), "date": T.StringType(),
              "logical": T.BooleanType()}


def _scan(path: str):
    """One streaming pass -> list of (byte_offset, first_token_upper)."""
    out = []
    pos = 0
    with open(path, "rb") as f:
        for line in f:
            tok = line.split(None, 1)
            out.append((pos, tok[0].decode("ascii", "replace").upper()
                        if tok else ""))
            pos += len(line)
    out.append((pos, ""))
    return out


def parse_mif_header(path: str):
    """-> (columns [(name, sparktype)], delimiter, data_line_idx)."""
    cols, delim = [], "\t"       # tab is the spec default delimiter
    with open(path, "r", encoding="latin-1") as f:
        lines = f.readlines()
    i = 0
    while i < len(lines):
        tok = lines[i].split()
        if not tok:
            i += 1
            continue
        kw = tok[0].upper()
        if kw == "DELIMITER":
            delim = lines[i].split('"')[1]
        elif kw == "COLUMNS":
            n = int(tok[1])
            for j in range(1, n + 1):
                ct = lines[i + j].split()
                base = ct[1].split("(")[0].lower()
                cols.append((ct[0], _MIF_TYPES.get(base, T.StringType())))
            i += n
        elif kw == "DATA":
            return cols, delim, i
        i += 1
    raise ValueError("MIF file has no DATA section")


def _nest_rings(rings):
    """mitab REGION nesting: hole of the first containing shell, else a
    new shell. -> Geom (POLYGON or MULTIPOLYGON)."""
    polys = []                    # each: [shell, holes...]
    for r in rings:
        placed = False
        for p in polys:
            if points_in_ring(np.array([r[0, 0]]), np.array([r[0, 1]]),
                              p[0])[0]:
                p.append(r)
                placed = True
                break
        if not placed:
            polys.append([r])
    if len(polys) == 1:
        return W.Geom(W.POLYGON, polys[0])
    return W.Geom(W.MULTIPOLYGON,
                  parts=[W.Geom(W.POLYGON, p) for p in polys])


def _parse_feature(lines, k):
    """Parse one geometry block starting at lines[k] -> (wkb, next_k)."""
    tok = lines[k].split()
    kw = tok[0].upper()
    k += 1

    def _pts(n):
        nonlocal k
        vals = []
        while len(vals) < 2 * n:
            vals.extend(float(v) for v in lines[k].split())
            k += 1
        return np.array(vals, np.float64).reshape(n, 2)

    if kw == "NONE":
        g = None
    elif kw == "POINT":
        g = W.Geom(W.POINT, [np.array([[float(tok[1]), float(tok[2])]])])
    elif kw == "MULTIPOINT":
        pts = _pts(int(tok[1]))
        g = W.Geom(W.MULTIPOINT, parts=[
            W.Geom(W.POINT, [p.reshape(1, 2)]) for p in pts])
    elif kw == "LINE":
        g = W.Geom(W.LINESTRING, [np.array(
            [[float(tok[1]), float(tok[2])],
             [float(tok[3]), float(tok[4])]])])
    elif kw == "PLINE":
        if len(tok) > 2 and tok[1].upper() == "MULTIPLE":
            parts = []
            for _ in range(int(tok[2])):
                n = int(lines[k].split()[0])
                k += 1
                parts.append(W.Geom(W.LINESTRING, [_pts(n)]))
            g = W.Geom(W.MULTILINESTRING, parts=parts)
        else:
            if len(tok) > 1:            # count on the PLINE line
                n = int(tok[1])
            else:
                n = int(lines[k].split()[0])
                k += 1
            g = W.Geom(W.LINESTRING, [_pts(n)])
    elif kw == "REGION":
        rings = []
        for _ in range(int(tok[1])):
            n = int(lines[k].split()[0])
            k += 1
            r = _pts(n)
            if not np.array_equal(r[0], r[-1]):     # MIF rings may be open
                r = np.vstack([r, r[:1]])
            rings.append(r)
        g = _nest_rings(rings)
    elif kw in ("RECT", "ROUNDRECT"):
        # mitab converts these to polygons (mitab_feature_mif.cpp,
        # TABRectangle); corner rounding is dropped like the reference's
        # -mapinfo_quick path
        x1, y1, x2, y2 = (float(v) for v in tok[1:5])
        if kw == "ROUNDRECT" and len(tok) < 6:
            k += 1                       # corner radius on its own line
        xa, xb = sorted((x1, x2))
        ya, yb = sorted((y1, y2))
        ring = np.array([[xa, ya], [xb, ya], [xb, yb], [xa, yb],
                         [xa, ya]], np.float64)
        g = W.Geom(W.POLYGON, [ring])
    elif kw == "ELLIPSE":
        x1, y1, x2, y2 = (float(v) for v in tok[1:5])
        cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        rx, ry = abs(x2 - x1) / 2.0, abs(y2 - y1) / 2.0
        t = np.linspace(0.0, 2.0 * np.pi, 73)
        ring = np.stack([cx + rx * np.cos(t), cy + ry * np.sin(t)], axis=1)
        ring[-1] = ring[0]
        g = W.Geom(W.POLYGON, [ring])
    elif kw == "ARC":
        x1, y1, x2, y2 = (float(v) for v in tok[1:5])
        if len(tok) >= 7:
            a0, a1 = float(tok[5]), float(tok[6])
        else:                            # begin/end angles on next line
            av = lines[k].split()
            a0, a1 = float(av[0]), float(av[1])
            k += 1
        cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        rx, ry = abs(x2 - x1) / 2.0, abs(y2 - y1) / 2.0
        t = np.radians(np.linspace(a0, a1 if a1 > a0 else a1 + 360.0, 72))
        pts = np.stack([cx + rx * np.cos(t), cy + ry * np.sin(t)], axis=1)
        g = W.Geom(W.LINESTRING, [pts])
    elif kw == "TEXT":
        if len(tok) == 1:
            k += 1                       # caption on its own line
        vals = [float(v) for v in lines[k].split()]
        k += 1
        # anchor point = lower-left of the text bounds (mitab TABText)
        g = W.Geom(W.POINT, [np.array(
            [[min(vals[0], vals[2]), min(vals[1], vals[3])]])])
    else:
        raise ValueError(f"unsupported MIF geometry {kw!r}")
    # skip styling clauses
    while k < len(lines):
        t = lines[k].split(None, 1)
        if t and t[0].upper() in _SKIP_CLAUSES:
            k += 1
        else:
            break
    return (W.encode(g) if g is not None else None), k


def _parse_mid_line(line, delim, cols):
    import csv
    import io
    vals = next(csv.reader(io.StringIO(line), delimiter=delim,
                           quotechar='"'))
    out = []
    for (name, t), v in zip(cols, vals):
        v = v.strip()
        if isinstance(t, T.LongType):
            out.append(int(v) if v else None)
        elif isinstance(t, T.DoubleType):
            out.append(float(v) if v else None)
        elif isinstance(t, T.BooleanType):
            out.append(v.upper() in ("T", "TRUE", "1") if v else None)
        else:
            out.append(v)
    while len(out) < len(cols):
        out.append(None)
    return out


def read_mif(spark: SparkSession, path: str,
             features_per_task: int = 65536) -> DataFrame:
    """pair.mif/.mid -> DataFrame(fid, geom WKB, <attrs>)."""
    stem = os.path.splitext(path)[0]
    mif_path = stem + ".mif"
    mid_path = next((stem + e for e in (".mid", ".MID")
                     if os.path.isfile(stem + e)), None)
    cols, delim, data_idx = parse_mif_header(mif_path)
    scan = _scan(mif_path)

    # feature starts: top-level geometry keyword lines after DATA
    # Interior count/coordinate lines always begin with a digit or sign
    # and styling clauses are not in _GEOM_KEYWORDS, so keyword-led lines
    # after DATA are exactly the feature starts.
    starts = [i for i in range(data_idx + 1, len(scan) - 1)
              if scan[i][1] in _GEOM_KEYWORDS]
    feat_ranges = [(scan[s][0],
                    scan[starts[j + 1]][0] if j + 1 < len(starts)
                    else scan[-1][0])
                   for j, s in enumerate(starts)]

    mid_offs = _scan(mid_path) if mid_path else None

    tasks = []
    for t0 in range(0, len(feat_ranges), features_per_task):
        t1 = min(len(feat_ranges), t0 + features_per_task)
        tasks.append((t0, feat_ranges[t0][0], feat_ranges[t1 - 1][1],
                      mid_offs[t0][0] if mid_offs else 0,
                      mid_offs[t1][0] if mid_offs else 0))
    schema = T.StructType(
        [T.StructField("fid", T.LongType()),
         T.StructField("geom", T.BinaryType())]
        + [T.StructField(n, t) for n, t in cols])
    names = [f.name for f in schema.fields]
    if not tasks:
        return spark.createDataFrame([], schema)
    tdf = spark.createDataFrame(
        tasks, "fid0 long, b0 long, b1 long, m0 long, m1 long")

    def parse(batches):
        for pdf in batches:
            frames = []
            for s in pdf.itertuples(index=False):
                with open(mif_path, "r", encoding="latin-1") as f:
                    f.seek(s.b0)
                    lines = f.read(s.b1 - s.b0).splitlines()
                mids = []
                if mid_path:
                    with open(mid_path, "r", encoding="latin-1") as f:
                        f.seek(s.m0)
                        mids = f.read(s.m1 - s.m0).splitlines()
                rows, k, fid = [], 0, int(s.fid0)
                while k < len(lines):
                    if not lines[k].split():
                        k += 1
                        continue
                    g, k = _parse_feature(lines, k)
                    attrs = (_parse_mid_line(mids[fid - int(s.fid0)],
                                             delim, cols)
                             if mid_path and fid - int(s.fid0) < len(mids)
                             else [None] * len(cols))
                    rows.append([fid, g, *attrs])
                    fid += 1
                frames.append(pd.DataFrame(rows, columns=names))
            yield (pd.concat(frames) if frames
                   else pd.DataFrame(columns=names))

    return tdf.mapInPandas(parse, schema)


def _fmt(x: float) -> str:
    return repr(float(x))


def _geom_block(g: "W.Geom | None") -> str:
    if g is None:
        return "NONE"
    if g.gtype == W.POINT:
        p = g.rings[0][0]
        return f"POINT {_fmt(p[0])} {_fmt(p[1])}"
    if g.gtype == W.LINESTRING:
        r = g.rings[0]
        lines = [f"PLINE {len(r)}"]
        lines += [f"{_fmt(x)} {_fmt(y)}" for x, y in r]
        return "\n".join(lines)
    if g.gtype == W.MULTILINESTRING:
        lines = [f"PLINE MULTIPLE {len(g.parts)}"]
        for p in g.parts:
            lines.append(str(len(p.rings[0])))
            lines += [f"{_fmt(x)} {_fmt(y)}" for x, y in p.rings[0]]
        return "\n".join(lines)
    if g.gtype in (W.POLYGON, W.MULTIPOLYGON):
        rings = (g.rings if g.gtype == W.POLYGON
                 else [r for p in g.parts for r in p.rings])
        lines = [f"REGION {len(rings)}"]
        for r in rings:
            lines.append(str(len(r)))
            lines += [f"{_fmt(x)} {_fmt(y)}" for x, y in r]
        return "\n".join(lines)
    if g.gtype == W.MULTIPOINT:
        lines = [f"MULTIPOINT {len(g.parts)}"]
        lines += [f"{_fmt(p.rings[0][0][0])} {_fmt(p.rings[0][0][1])}"
                  for p in g.parts]
        return "\n".join(lines)
    raise ValueError(f"unsupported geometry type {g.gtype}")


def write_mif(rows, path: str, columns=None, delimiter: str = ",") -> None:
    """rows: [(wkb_or_None, {attr: value})] -> pair.mif/.mid. Fixture
    writer / bounded-extract sink (single-file format), like the GPKG
    and SpatiaLite writers — the distributed sink remains parquet."""
    rows = list(rows)
    stem = os.path.splitext(path)[0]
    attrs = columns or (list(rows[0][1].keys()) if rows else [])

    def mif_type(v):
        if isinstance(v, bool):
            return "Logical"
        if isinstance(v, int):
            return "Integer"
        if isinstance(v, float):
            return "Float"
        return "Char(254)"

    types = {a: mif_type(rows[0][1][a]) for a in attrs} if rows else {}
    with open(stem + ".mif", "w", encoding="latin-1") as f:
        f.write("VERSION 300\nCHARSET \"Neutral\"\n")
        f.write(f'DELIMITER "{delimiter}"\n')
        f.write(f"COLUMNS {len(attrs)}\n")
        for a in attrs:
            f.write(f"  {a} {types[a]}\n")
        f.write("DATA\n")
        for g, _a in rows:
            f.write(_geom_block(W.decode(bytes(g))
                                if g is not None else None) + "\n")
    with open(stem + ".mid", "w", encoding="latin-1") as f:
        for _g, a in rows:
            vals = []
            for k in attrs:
                v = a.get(k)
                if isinstance(v, bool):
                    vals.append("T" if v else "F")
                elif isinstance(v, str):
                    vals.append(f'"{v}"')
                elif v is None:
                    vals.append("")
                else:
                    vals.append(repr(v) if isinstance(v, float) else str(v))
            f.write(delimiter.join(vals) + "\n")
