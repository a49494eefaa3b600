"""KML source/sink (ogr/ogrsf_frmts/kml + libkml driver parity, OGC KML
2.2): Placemark features with Point/LineString/Polygon/MultiGeometry,
<name> and <ExtendedData><Data name="k"><value>v</value></Data> pairs.

Schema mirrors the GeoJSON reader: (fid long, geom binary WKB, name
string, props string) — ExtendedData stays one sorted-JSON string, to be
flattened lazily with from_json (the reference driver schema-scans the
whole file first; the lazy form keeps the reader single-pass).

Distribution: one task per .kml file (wholetext — XML has no safe byte
split; same granularity the reference's per-file parse gets), parse via
xml.etree with namespace-agnostic tag matching. The sink writes one
complete KML document per partition into a directory of part files, the
multi-file dataset convention every other sink here uses.
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
    T.StructField("geom", T.BinaryType()),
    T.StructField("name", T.StringType()),
    T.StructField("props", T.StringType()),
])


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _coords(text: str) -> np.ndarray:
    """KML coordinates: whitespace-separated 'lon,lat[,alt]' tuples."""
    pts = []
    for tok in (text or "").split():
        parts = tok.split(",")
        pts.append((float(parts[0]), float(parts[1])))
    return np.asarray(pts, dtype=np.float64).reshape(-1, 2)


def _geom_from_kml(el) -> bytes | None:
    t = _local(el.tag)
    if t == "Point":
        c = _coords(_find_text(el, "coordinates"))
        return wkb.point(float(c[0, 0]), float(c[0, 1]))
    if t == "LineString":
        return wkb.linestring(_coords(_find_text(el, "coordinates")))
    if t == "Polygon":
        rings = []
        for child in el:
            lc = _local(child.tag)
            if lc in ("outerBoundaryIs", "innerBoundaryIs"):
                for lr in child:
                    rings.append(_coords(_find_text(lr, "coordinates")))
        # outer first (KML order is outer then inners by schema)
        return wkb.encode(wkb.Geom(wkb.POLYGON, rings))
    if t == "MultiGeometry":
        parts = [wkb.decode(_geom_from_kml(c)) for c in el
                 if _geom_from_kml(c) is not None]
        if not parts:
            return None
        kinds = {p.gtype for p in parts}
        mt = {frozenset({wkb.POINT}): wkb.MULTIPOINT,
              frozenset({wkb.LINESTRING}): wkb.MULTILINESTRING,
              frozenset({wkb.POLYGON}): wkb.MULTIPOLYGON} \
            .get(frozenset(kinds), wkb.GEOMETRYCOLLECTION)
        return wkb.encode(wkb.Geom(mt, parts=parts))
    return None


def _find_text(el, name: str) -> str | None:
    for child in el.iter():
        if _local(child.tag) == name:
            return child.text
    return None


def _placemark_row(pm):
    name = None
    geom = None
    props = {}
    for child in pm:
        lc = _local(child.tag)
        if lc == "name":
            name = child.text
        elif lc in ("Point", "LineString", "Polygon", "MultiGeometry"):
            geom = _geom_from_kml(child)
        elif lc == "ExtendedData":
            for data in child:
                if _local(data.tag) == "Data":
                    k = data.get("name")
                    v = _find_text(data, "value")
                    if k is not None:
                        props[k] = v
    return (geom, name, json.dumps(props, sort_keys=True))


def read_kml(spark: SparkSession, path: str) -> DataFrame:
    """.kml file(s)/directory -> (fid, geom WKB, name, props)."""
    import xml.etree.ElementTree as ET

    raw = spark.read.text(path, wholetext=True)

    def parse(batches):
        for pdf in batches:
            rows = []
            for txt in pdf["value"]:
                root = ET.fromstring(txt)
                for el in root.iter():
                    if _local(el.tag) == "Placemark":
                        rows.append((None,) + _placemark_row(el))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              _SCHEMA.fields]) \
                if rows else pd.DataFrame(columns=[f.name for f in
                                                   _SCHEMA.fields])

    df = raw.mapInPandas(parse, _SCHEMA)
    # KML has no feature ids; synthesize globally unique monotonic fids
    return df.withColumn("fid", F.monotonically_increasing_id())


def _geom_to_kml(b: bytes) -> str:
    g = wkb.decode(bytes(b))

    def ctext(r):
        return " ".join(f"{float(x)!r},{float(y)!r}" for x, y in r)

    if g.gtype == wkb.POINT:
        return (f"<Point><coordinates>{ctext(g.rings[0])}"
                "</coordinates></Point>")
    if g.gtype == wkb.LINESTRING:
        return (f"<LineString><coordinates>{ctext(g.rings[0])}"
                "</coordinates></LineString>")
    if g.gtype == wkb.POLYGON:
        out = ["<Polygon>"]
        for i, r in enumerate(g.rings):
            tag = "outerBoundaryIs" if i == 0 else "innerBoundaryIs"
            out.append(f"<{tag}><LinearRing><coordinates>{ctext(r)}"
                       f"</coordinates></LinearRing></{tag}>")
        out.append("</Polygon>")
        return "".join(out)
    parts = "".join(_geom_to_kml(wkb.encode(p)) for p in g.parts)
    return f"<MultiGeometry>{parts}</MultiGeometry>"


def write_kml(df: DataFrame, path: str, geom_col: str = "geom",
              name_col: str | None = "name",
              props_col: str | None = "props") -> None:
    """Write a directory of complete KML documents, one per partition.
    Non-geom/name/props columns become ExtendedData entries."""
    import os
    from xml.sax.saxutils import escape

    os.makedirs(path, exist_ok=True)
    cols = df.columns
    out_schema = T.StructType([T.StructField("file", T.StringType()),
                               T.StructField("n", T.LongType())])

    def emit(batches):
        import uuid
        pms = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                d = dict(zip(cols, r))
                buf = ["<Placemark>"]
                if name_col and d.get(name_col) is not None:
                    buf.append(f"<name>{escape(str(d[name_col]))}</name>")
                props = json.loads(d[props_col]) if props_col and \
                    d.get(props_col) else {
                        k: (v.item() if hasattr(v, "item") else v)
                        for k, v in d.items()
                        if k not in (geom_col, name_col, props_col)}
                if props:
                    buf.append("<ExtendedData>")
                    for k in sorted(props):
                        buf.append(f'<Data name="{escape(str(k))}">'
                                   f"<value>{escape(str(props[k]))}"
                                   "</value></Data>")
                    buf.append("</ExtendedData>")
                if d.get(geom_col) is not None:
                    buf.append(_geom_to_kml(d[geom_col]))
                buf.append("</Placemark>")
                pms.append("".join(buf))
        if not pms:
            yield pd.DataFrame({"file": [], "n": []})
            return
        doc = ('<?xml version="1.0" encoding="UTF-8"?>'
               '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>'
               + "".join(pms) + "</Document></kml>")
        fname = f"part-{uuid.uuid4().hex}.kml"
        with open(os.path.join(path, fname), "w") as f:
            f.write(doc)
        yield pd.DataFrame({"file": [fname], "n": [len(pms)]})

    df.mapInPandas(emit, out_schema).collect()
