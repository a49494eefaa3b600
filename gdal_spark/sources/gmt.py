"""GMT ASCII vector source/sink (ogr/ogrsf_frmts/gmt/ogrgmtlayer.cpp).

OGR-flavored GMT files: '# @VGMT1.0 @G<TYPE>' signature, '# @N' field
names, '# @T' field types, '# FEATURE_DATA', then features separated by
'>' lines — each with a '# @D' attribute record (|-separated, strings
quoted) and coordinate lines 'x y'. Polygon holes follow an '# @H'
flag, parts of multis repeat '>' within the same '# @D' scope.

One task per file (the reference's sequential granularity; many files
scan in parallel via wholetext). Attributes keep OGR's |-separated
escaping.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import wkb as W

_SCHEMA = T.StructType([
    T.StructField("fid", T.LongType()),
    T.StructField("geom", T.BinaryType()),
    T.StructField("props", T.StringType()),
])

_GMT_TYPES = {"POINT": W.POINT, "MULTIPOINT": W.MULTIPOINT,
              "LINESTRING": W.LINESTRING,
              "MULTILINESTRING": W.MULTILINESTRING,
              "POLYGON": W.POLYGON, "MULTIPOLYGON": W.MULTIPOLYGON}


def _split_d(rec: str):
    """Split an @D record on unquoted '|'."""
    out, cur, q = [], [], False
    for ch in rec:
        if ch == '"':
            q = not q
        elif ch == "|" and not q:
            out.append("".join(cur))
            cur = []
            continue
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def _parse_gmt(text: str):
    """-> (gtype, names, types, [ (attrs, [(is_hole, coords)]) ])."""
    import json

    gtype, names, types = None, [], []
    feats = []
    cur_attrs, cur_parts, cur_coords, cur_hole = None, [], [], False
    started = False

    def flush_part():
        nonlocal cur_coords, cur_hole
        if cur_coords:
            cur_parts.append((cur_hole, np.array(cur_coords, np.float64)))
        cur_coords, cur_hole = [], False

    def flush_feat():
        nonlocal cur_attrs, cur_parts
        flush_part()
        if cur_parts or cur_attrs is not None:
            feats.append((cur_attrs, cur_parts))
        cur_attrs, cur_parts = None, []

    for line in text.splitlines():
        s = line.strip()
        if not s:
            continue
        if s.startswith("#"):
            body = s[1:].strip()
            if body.startswith(("@V", "@G")):
                # signature line: '# @VGMT1.0 @GPOLYGON' — tokens combine
                for tok in body.split():
                    if tok.startswith("@G"):
                        gtype = tok[2:].upper()
            elif body.startswith("@N"):
                names = _split_d(body[2:])
            elif body.startswith("@T"):
                types = _split_d(body[2:])
            elif body.startswith("@D"):
                if started and (cur_parts or cur_coords
                                or cur_attrs is not None):
                    flush_feat()
                started = True
                vals = _split_d(body[2:])
                cur_attrs = {}
                for i, v in enumerate(vals):
                    nm = names[i] if i < len(names) else f"field_{i + 1}"
                    t = (types[i] if i < len(types) else "string").lower()
                    if v == "":
                        cur_attrs[nm] = None
                    elif t in ("integer", "integer64"):
                        cur_attrs[nm] = int(v)
                    elif t in ("double", "datetime"):
                        cur_attrs[nm] = (float(v) if t == "double" else v)
                    else:
                        cur_attrs[nm] = v
            elif body.startswith("@H"):
                flush_part()
                cur_hole = True
            elif body.startswith("@P"):
                flush_part()
            continue
        if s.startswith(">"):
            flush_part()
            continue
        xy = s.split()
        cur_coords.append((float(xy[0]), float(xy[1])))
        started = True
    flush_feat()
    return gtype, names, types, feats


def _build_geom(gtype: str, parts):
    wt = _GMT_TYPES.get(gtype or "POINT", W.POINT)
    arrs = [a for _h, a in parts]
    if not arrs:
        return None
    if wt == W.POINT:
        return W.Geom(W.POINT, [arrs[0][:1]])
    if wt == W.MULTIPOINT:
        pts = np.vstack(arrs)
        return W.Geom(W.MULTIPOINT, parts=[
            W.Geom(W.POINT, [p.reshape(1, 2)]) for p in pts])
    if wt == W.LINESTRING:
        return W.Geom(W.LINESTRING, [arrs[0]])
    if wt == W.MULTILINESTRING:
        return W.Geom(W.MULTILINESTRING,
                      parts=[W.Geom(W.LINESTRING, [a]) for a in arrs])
    # polygonal: holes attach to the preceding shell
    def close(a):
        return a if np.array_equal(a[0], a[-1]) else np.vstack([a, a[:1]])
    polys = []
    for hole, a in parts:
        if hole and polys:
            polys[-1].append(close(a))
        else:
            polys.append([close(a)])
    if wt == W.POLYGON or len(polys) == 1:
        return W.Geom(W.POLYGON, polys[0])
    return W.Geom(W.MULTIPOLYGON,
                  parts=[W.Geom(W.POLYGON, p) for p in polys])


def read_gmt(spark: SparkSession, path: str) -> DataFrame:
    """.gmt file(s) -> (fid, geom WKB, props JSON)."""
    import json

    raw = spark.read.text(path, wholetext=True)

    def parse(batches):
        for pdf in batches:
            rows = []
            for txt in pdf["value"]:
                gtype, _n, _t, feats = _parse_gmt(txt)
                for i, (attrs, parts) in enumerate(feats):
                    g = _build_geom(gtype, parts)
                    rows.append([i, W.encode(g) if g else None,
                                 json.dumps(attrs or {}, sort_keys=True)])
            yield pd.DataFrame(rows, columns=["fid", "geom", "props"]) \
                if rows else pd.DataFrame(columns=["fid", "geom", "props"])

    return raw.mapInPandas(parse, _SCHEMA)


def write_gmt(rows, path: str, gtype: str = "POINT",
              names=None, types=None) -> None:
    """rows: [(wkb_or_None, {attr: value})] -> one .gmt file (fixture
    writer / bounded extract, like the other single-file sinks)."""
    rows = list(rows)
    names = names or (list(rows[0][1].keys()) if rows else [])

    def gmt_type(v):
        if isinstance(v, int):
            return "integer"
        if isinstance(v, float):
            return "double"
        return "string"

    types = types or [gmt_type(rows[0][1][n]) for n in names]
    with open(path, "w", encoding="ascii") as f:
        f.write(f"# @VGMT1.0 @G{gtype.upper()}\n")
        if names:
            f.write("# @N" + "|".join(names) + "\n")
            f.write("# @T" + "|".join(types) + "\n")
        f.write("# FEATURE_DATA\n")
        for g, attrs in rows:
            f.write(">\n")
            vals = []
            for n, t in zip(names, types):
                v = attrs.get(n)
                if v is None:
                    vals.append("")
                elif t == "string":
                    vals.append(f'"{v}"')
                else:
                    vals.append(repr(v) if isinstance(v, float) else str(v))
            f.write("# @D" + "|".join(vals) + "\n")
            if g is None:
                continue
            geom = W.decode(bytes(g))

            def wr(a):
                for x, y in a:
                    f.write(f"{x!r} {y!r}\n")

            if geom.gtype in (W.POINT, W.LINESTRING):
                wr(geom.rings[0])
            elif geom.gtype == W.POLYGON:
                for j, r in enumerate(geom.rings):
                    if j:
                        f.write("# @H\n")
                    wr(r)
            elif geom.gtype == W.MULTIPOINT:
                for p in geom.parts:
                    wr(p.rings[0])
            elif geom.gtype == W.MULTILINESTRING:
                for j, p in enumerate(geom.parts):
                    if j:
                        f.write(">\n")
                    wr(p.rings[0])
            elif geom.gtype == W.MULTIPOLYGON:
                first = True
                for p in geom.parts:
                    for j, r in enumerate(p.rings):
                        if not first:
                            f.write(">\n" if j == 0 else "")
                        if j:
                            f.write("# @H\n")
                        wr(r)
                        first = False
            else:
                raise ValueError(f"unsupported GMT geometry {geom.gtype}")
