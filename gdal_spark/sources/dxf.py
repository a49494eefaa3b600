"""DXF source/sink (ogr/ogrsf_frmts/dxf — AutoCAD DXF, the public ASCII
group-code format).

Subset matching what the reference's reader produces for the common
entity types: POINT, LINE, LWPOLYLINE (closed flag 70 -> ring-closed
linestring), POLYLINE/VERTEX/SEQEND, CIRCLE (linearized, 72 chords like
the reference's default arc step of 5 degrees), TEXT (point + a `text`
attribute); the `8` group carries the layer name. Entities parse from the
ENTITIES section only (the reference also reads blocks/inserts — out of
scope, documented).

Distribution: a DXF file is one sequential group-code stream, so each
FILE is one task (wholetext), the same granularity the reference's parser
gets; a directory of files fans out. The sink writes one complete minimal
DXF document per partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import wkb

_SCHEMA = T.StructType([
    T.StructField("fid", T.LongType()),
    T.StructField("layer", T.StringType()),
    T.StructField("etype", T.StringType()),
    T.StructField("geom", T.BinaryType()),
    T.StructField("text", T.StringType()),
])

_CIRCLE_STEPS = 72


def _pairs(txt: str):
    lines = txt.splitlines()
    for i in range(0, len(lines) - 1, 2):
        yield lines[i].strip(), lines[i + 1].strip()


def parse_entities(txt: str):
    """DXF text -> list of (layer, etype, Geom, text attr)."""
    it = iter(_pairs(txt))
    in_entities = False
    out = []
    cur = None            # (etype, groups list)
    pl = None             # POLYLINE accumulation

    def flush(ent):
        if ent is None:
            return
        etype, g = ent
        layer = g.get("8", ["0"])[0]
        if etype == "POINT":
            out.append((layer, etype, wkb.Geom(
                wkb.POINT, [np.array([[float(g["10"][0]),
                                       float(g["20"][0])]])]), None))
        elif etype == "LINE":
            pts = np.array([[float(g["10"][0]), float(g["20"][0])],
                            [float(g["11"][0]), float(g["21"][0])]])
            out.append((layer, etype, wkb.Geom(wkb.LINESTRING, [pts]),
                        None))
        elif etype == "LWPOLYLINE":
            pts = np.array(list(zip([float(v) for v in g.get("10", [])],
                                    [float(v) for v in g.get("20", [])])))
            if len(pts) >= 2:
                closed = int(g.get("70", ["0"])[0]) & 1
                if closed and tuple(pts[0]) != tuple(pts[-1]):
                    pts = np.vstack([pts, pts[:1]])
                out.append((layer, etype,
                            wkb.Geom(wkb.LINESTRING, [pts]), None))
        elif etype == "CIRCLE":
            cx, cy = float(g["10"][0]), float(g["20"][0])
            r = float(g["40"][0])
            a = np.linspace(0.0, 2.0 * np.pi, _CIRCLE_STEPS + 1)
            ring = np.stack([cx + r * np.cos(a), cy + r * np.sin(a)],
                            axis=1)
            ring[-1] = ring[0]
            out.append((layer, etype, wkb.Geom(wkb.POLYGON, [ring]), None))
        elif etype == "TEXT":
            out.append((layer, etype, wkb.Geom(
                wkb.POINT, [np.array([[float(g["10"][0]),
                                       float(g["20"][0])]])]),
                g.get("1", [None])[0]))

    for code, val in it:
        if code == "0" and val == "SECTION":
            continue
        if code == "2" and val == "ENTITIES":
            in_entities = True
            continue
        if code == "0" and val == "ENDSEC":
            flush(cur)
            cur = None
            in_entities = False
            continue
        if not in_entities:
            continue
        if code == "0":
            if val == "POLYLINE":
                flush(cur)
                cur = None
                pl = {"layer": "0", "pts": [], "closed": 0}
            elif val == "VERTEX" and pl is not None:
                pl["pts"].append([None, None])
            elif val == "SEQEND" and pl is not None:
                pts = np.array([p for p in pl["pts"]
                                if p[0] is not None], np.float64)
                if len(pts) >= 2:
                    if pl["closed"] & 1 and tuple(pts[0]) != tuple(pts[-1]):
                        pts = np.vstack([pts, pts[:1]])
                    out.append((pl["layer"], "POLYLINE",
                                wkb.Geom(wkb.LINESTRING, [pts]), None))
                pl = None
            else:
                flush(cur)
                cur = (val, {})
        elif pl is not None and cur is None:
            if code == "8" and not pl["pts"]:
                pl["layer"] = val
            elif code == "70" and not pl["pts"]:
                pl["closed"] = int(val)
            elif code == "10" and pl["pts"]:
                pl["pts"][-1][0] = float(val)
            elif code == "20" and pl["pts"]:
                pl["pts"][-1][1] = float(val)
        elif cur is not None:
            cur[1].setdefault(code, []).append(val)
    flush(cur)
    return out


def read_dxf(spark: SparkSession, path: str) -> DataFrame:
    """.dxf file(s)/directory -> (fid, layer, etype, geom WKB, text)."""
    raw = spark.read.text(path, wholetext=True)
    cols = [f.name for f in _SCHEMA.fields]

    def parse(batches):
        for pdf in batches:
            rows = []
            for txt in pdf["value"]:
                for layer, etype, g, attr in parse_entities(txt):
                    rows.append((None, layer, etype, wkb.encode(g), attr))
            yield pd.DataFrame(rows, columns=cols) if rows else \
                pd.DataFrame(columns=cols)

    df = raw.mapInPandas(parse, _SCHEMA)
    return df.withColumn("fid", F.monotonically_increasing_id())


def _fmt(v: float) -> str:
    return repr(float(v))


def _entity_dxf(g: wkb.Geom, layer: str) -> list:
    el = []
    if g.gtype == wkb.POINT:
        x, y = g.rings[0][0]
        el += ["0", "POINT", "8", layer, "10", _fmt(x), "20", _fmt(y)]
    elif g.gtype == wkb.LINESTRING:
        pts = g.rings[0]
        closed = len(pts) > 2 and tuple(pts[0]) == tuple(pts[-1])
        body = pts[:-1] if closed else pts
        el += ["0", "LWPOLYLINE", "8", layer, "90", str(len(body)),
               "70", "1" if closed else "0"]
        for x, y in body:
            el += ["10", _fmt(x), "20", _fmt(y)]
    elif g.gtype == wkb.POLYGON:
        # each ring -> one closed LWPOLYLINE (the reference writes HATCH
        # for filled polygons; ring outlines keep the geometry lossless
        # modulo ring-grouping, documented)
        for r in g.rings:
            el += _entity_dxf(wkb.Geom(wkb.LINESTRING,
                                       [np.asarray(r)]), layer)
    else:
        for p in g.parts:
            el += _entity_dxf(p, layer)
    return el


def write_dxf(df: DataFrame, path: str, geom_col: str = "geom",
              layer_col: str | None = "layer") -> None:
    """Write a directory of minimal DXF documents, one per partition."""
    import os

    os.makedirs(path, exist_ok=True)
    cols = df.columns
    out_schema = T.StructType([T.StructField("file", T.StringType()),
                               T.StructField("n", T.LongType())])

    def emit(batches):
        import uuid
        el = []
        n = 0
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                d = dict(zip(cols, r))
                if d.get(geom_col) is None:
                    continue
                layer = str(d.get(layer_col) or "0") if layer_col else "0"
                el += _entity_dxf(wkb.decode(bytes(d[geom_col])), layer)
                n += 1
        if not el:
            yield pd.DataFrame({"file": [], "n": []})
            return
        doc = "\n".join(["0", "SECTION", "2", "ENTITIES"] + el
                        + ["0", "ENDSEC", "0", "EOF"]) + "\n"
        fname = f"part-{uuid.uuid4().hex}.dxf"
        with open(os.path.join(path, fname), "w") as f:
            f.write(doc)
        yield pd.DataFrame({"file": [fname], "n": [n]})

    df.mapInPandas(emit, out_schema).collect()
