"""GPX source/sink (ogr/ogrsf_frmts/gpx — GPX 1.1, Topografix schema).

The reference's GPX driver exposes fixed layers: `waypoints` (<wpt>,
points), `routes` (<rte>, one LINESTRING per route over its <rtept>s) and
`tracks` (<trk>, one MULTILINESTRING per track, one part per <trkseg>).
Coordinates are lat/lon ATTRIBUTES (not element text), <ele>/<name>/<cmt>/
<desc>/<time> are child elements. This reader flattens all three layers
into one DataFrame with a `layer` discriminator column (filter to get the
reference's per-layer view — Catalyst prunes the rest).

Distribution matches the other XML sources: one task per .gpx file
(wholetext; XML has no safe byte split), xml.etree parse in mapInPandas;
the sink writes one complete GPX document per partition.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import wkb

_SCHEMA = T.StructType([
    T.StructField("fid", T.LongType()),
    T.StructField("layer", T.StringType()),
    T.StructField("geom", T.BinaryType()),
    T.StructField("name", T.StringType()),
    T.StructField("ele", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

_FIELD_TAGS = ("cmt", "desc", "time", "sym", "type")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _pt_latlon(el) -> tuple[float, float]:
    return float(el.get("lon")), float(el.get("lat"))


def _child_text(el, name: str):
    for c in el:
        if _local(c.tag) == name:
            return c.text
    return None


def _fields(el) -> tuple:
    name = _child_text(el, "name")
    ele = _child_text(el, "ele")
    props = {t: _child_text(el, t) for t in _FIELD_TAGS
             if _child_text(el, t) is not None}
    return (name, float(ele) if ele is not None else None,
            json.dumps(props, sort_keys=True))


def read_gpx(spark: SparkSession, path: str) -> DataFrame:
    """.gpx file(s)/directory -> (fid, layer, geom WKB, name, ele, props)."""
    import xml.etree.ElementTree as ET

    raw = spark.read.text(path, wholetext=True)
    cols = [f.name for f in _SCHEMA.fields]

    def parse(batches):
        for pdf in batches:
            rows = []
            for txt in pdf["value"]:
                root = ET.fromstring(txt)
                for el in root:
                    t = _local(el.tag)
                    if t == "wpt":
                        x, y = _pt_latlon(el)
                        rows.append((None, "waypoints", wkb.point(x, y))
                                    + _fields(el))
                    elif t == "rte":
                        pts = [_pt_latlon(p) for p in el
                               if _local(p.tag) == "rtept"]
                        if len(pts) >= 2:
                            g = wkb.linestring(
                                np.asarray(pts, dtype=np.float64))
                            rows.append((None, "routes", g) + _fields(el))
                    elif t == "trk":
                        segs = []
                        for seg in el:
                            if _local(seg.tag) != "trkseg":
                                continue
                            pts = [_pt_latlon(p) for p in seg
                                   if _local(p.tag) == "trkpt"]
                            if len(pts) >= 2:
                                segs.append(np.asarray(pts, np.float64))
                        if segs:
                            g = wkb.encode(wkb.Geom(
                                wkb.MULTILINESTRING,
                                parts=[wkb.Geom(wkb.LINESTRING, [s])
                                       for s in segs]))
                            rows.append((None, "tracks", g) + _fields(el))
            yield pd.DataFrame(rows, columns=cols) if rows else \
                pd.DataFrame(columns=cols)

    df = raw.mapInPandas(parse, _SCHEMA)
    return df.withColumn("fid", F.monotonically_increasing_id())


def _pt_xml(tag: str, x: float, y: float, body: str = "") -> str:
    return f'<{tag} lat="{float(y)!r}" lon="{float(x)!r}">{body}</{tag}>'


def write_gpx(df: DataFrame, path: str, geom_col: str = "geom",
              name_col: str | None = "name",
              ele_col: str | None = "ele") -> None:
    """Write a directory of complete GPX documents, one per partition.
    POINT rows -> <wpt>, LINESTRING -> <rte>, MULTILINESTRING -> <trk>
    (one <trkseg> per part) — the reference's layer->element mapping."""
    import os
    from xml.sax.saxutils import escape

    os.makedirs(path, exist_ok=True)
    cols = df.columns
    out_schema = T.StructType([T.StructField("file", T.StringType()),
                               T.StructField("n", T.LongType())])

    def emit(batches):
        import uuid
        els = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                d = dict(zip(cols, r))
                if d.get(geom_col) is None:
                    continue
                g = wkb.decode(bytes(d[geom_col]))
                body = ""
                if ele_col and d.get(ele_col) is not None \
                        and d[ele_col] == d[ele_col] \
                        and g.gtype == wkb.POINT:
                    body += f"<ele>{float(d[ele_col])!r}</ele>"
                if name_col and d.get(name_col) is not None:
                    body += f"<name>{escape(str(d[name_col]))}</name>"
                if g.gtype == wkb.POINT:
                    x, y = g.rings[0][0]
                    els.append(_pt_xml("wpt", x, y, body))
                elif g.gtype == wkb.LINESTRING:
                    pts = "".join(_pt_xml("rtept", x, y)
                                  for x, y in g.rings[0])
                    els.append(f"<rte>{body}{pts}</rte>")
                elif g.gtype == wkb.MULTILINESTRING:
                    segs = "".join(
                        "<trkseg>" + "".join(_pt_xml("trkpt", x, y)
                                             for x, y in p.rings[0])
                        + "</trkseg>" for p in g.parts)
                    els.append(f"<trk>{body}{segs}</trk>")
        if not els:
            yield pd.DataFrame({"file": [], "n": []})
            return
        doc = ('<?xml version="1.0" encoding="UTF-8"?>'
               '<gpx version="1.1" creator="gdal_spark" '
               'xmlns="http://www.topografix.com/GPX/1/1">'
               + "".join(els) + "</gpx>")
        fname = f"part-{uuid.uuid4().hex}.gpx"
        with open(os.path.join(path, fname), "w") as f:
            f.write(doc)
        yield pd.DataFrame({"file": [fname], "n": [len(els)]})

    df.mapInPandas(emit, out_schema).collect()
