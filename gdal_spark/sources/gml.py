"""GML source/sink (ogr/ogrsf_frmts/gml driver parity, OGC GML 3.2
simple features profile): one feature per gml:featureMember, scalar
child elements as attributes, geometry as gml:Point/LineString/Polygon/
MultiGeometry with pos/posList coordinates (space-separated, x y order).

Schema mirrors the other XML reader: (fid long, geom binary WKB, props
string JSON of the scalar attributes). Distribution: one task per .gml
file (wholetext; XML has no safe byte split — the granularity the
reference's per-file SAX parse gets), namespace-agnostic tag matching.
The sink writes one complete document per partition."""

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
    T.StructField("props", T.StringType()),
])

_GEOM_TAGS = ("Point", "LineString", "Polygon", "MultiPoint",
              "MultiLineString", "MultiPolygon", "MultiGeometry",
              "MultiSurface", "MultiCurve")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _poslist(el) -> np.ndarray:
    """gml:posList / gml:pos / deprecated gml:coordinates -> (n,2)."""
    for child in el.iter():
        lc = _local(child.tag)
        if lc in ("posList", "pos"):
            vals = [float(v) for v in (child.text or "").split()]
            return np.asarray(vals, np.float64).reshape(-1, 2)
        if lc == "coordinates":     # GML2: "x,y x,y" tuples
            pts = [tuple(float(v) for v in tok.split(",")[:2])
                   for tok in (child.text or "").split()]
            return np.asarray(pts, np.float64).reshape(-1, 2)
    return np.empty((0, 2))


def _geom_from_gml(el) -> bytes | None:
    t = _local(el.tag)
    if t == "Point":
        c = _poslist(el)
        return wkb.point(float(c[0, 0]), float(c[0, 1]))
    if t in ("LineString", "Curve"):
        return wkb.linestring(_poslist(el))
    if t == "Polygon":
        rings: list[np.ndarray] = []
        for child in el:
            lc = _local(child.tag)
            if lc in ("exterior", "outerBoundaryIs"):
                rings.insert(0, _poslist(child))
            elif lc in ("interior", "innerBoundaryIs"):
                rings.append(_poslist(child))
        return wkb.encode(wkb.Geom(wkb.POLYGON, rings))
    if t in ("MultiPoint", "MultiLineString", "MultiPolygon",
             "MultiGeometry", "MultiSurface", "MultiCurve"):
        parts = []
        for member in el.iter():
            if _local(member.tag) in ("Point", "LineString", "Polygon") \
                    and member is not el:
                parts.append(wkb.decode(_geom_from_gml(member)))
        if not parts:
            return None
        mt = {"MultiPoint": wkb.MULTIPOINT,
              "MultiLineString": wkb.MULTILINESTRING,
              "MultiCurve": wkb.MULTILINESTRING,
              "MultiPolygon": wkb.MULTIPOLYGON,
              "MultiSurface": wkb.MULTIPOLYGON} \
            .get(t, wkb.GEOMETRYCOLLECTION)
        return wkb.encode(wkb.Geom(mt, parts=parts))
    return None


def _feature_row(feat):
    """A feature element -> (fid, geom, props json)."""
    fid = None
    for k, v in feat.attrib.items():
        if _local(k) in ("id", "fid"):   # gml:id (3.2) or GML2 fid=
            digits = "".join(ch for ch in v if ch.isdigit())
            fid = int(digits) if digits else None
    geom = None
    props = {}
    for child in feat:
        lc = _local(child.tag)
        sub = [c for c in child if _local(c.tag) in _GEOM_TAGS]
        if lc in _GEOM_TAGS:
            geom = _geom_from_gml(child)
        elif sub:                       # geometry property wrapper
            geom = _geom_from_gml(sub[0])
        elif len(child) == 0:
            props[lc] = child.text
    return (fid, geom, json.dumps(props, sort_keys=True))


def read_gml(spark: SparkSession, path: str) -> DataFrame:
    """.gml file(s)/directory -> (fid, geom WKB, props)."""
    import xml.etree.ElementTree as ET

    raw = spark.read.text(path, wholetext=True)

    def parse(batches):
        for pdf in batches:
            rows = []
            for txt in pdf["value"]:
                root = ET.fromstring(txt)
                for el in root.iter():
                    if _local(el.tag) in ("featureMember", "member",
                                          "featureMembers"):
                        for feat in el:
                            rows.append(_feature_row(feat))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              _SCHEMA.fields]) \
                if rows else pd.DataFrame(columns=[f.name for f in
                                                   _SCHEMA.fields])

    df = raw.mapInPandas(parse, _SCHEMA)
    return df.withColumn(
        "fid", F.when(F.col("fid").isNotNull(), F.col("fid"))
        .otherwise(F.monotonically_increasing_id() + F.lit(1 << 62)))


def _geom_to_gml(b: bytes) -> str:
    g = wkb.decode(bytes(b))

    def pl(r):
        return ("<gml:posList>"
                + " ".join(f"{float(x)!r} {float(y)!r}" for x, y in r)
                + "</gml:posList>")

    if g.gtype == wkb.POINT:
        x, y = g.rings[0][0]
        return (f"<gml:Point><gml:pos>{float(x)!r} {float(y)!r}</gml:pos>"
                "</gml:Point>")
    if g.gtype == wkb.LINESTRING:
        return f"<gml:LineString>{pl(g.rings[0])}</gml:LineString>"
    if g.gtype == wkb.POLYGON:
        out = ["<gml:Polygon>"]
        for i, r in enumerate(g.rings):
            tag = "exterior" if i == 0 else "interior"
            out.append(f"<gml:{tag}><gml:LinearRing>{pl(r)}"
                       f"</gml:LinearRing></gml:{tag}>")
        out.append("</gml:Polygon>")
        return "".join(out)
    name = {wkb.MULTIPOINT: "MultiGeometry",
            wkb.MULTILINESTRING: "MultiGeometry",
            wkb.MULTIPOLYGON: "MultiGeometry"} \
        .get(g.gtype, "MultiGeometry")
    parts = "".join(f"<gml:geometryMember>{_geom_to_gml(wkb.encode(p))}"
                    "</gml:geometryMember>" for p in g.parts)
    return f"<gml:{name}>{parts}</gml:{name}>"


def write_gml(df: DataFrame, path: str, geom_col: str = "geom",
              props_col: str | None = "props",
              feature_name: str = "feature") -> None:
    """Write a directory of complete GML documents, one per partition."""
    import os
    from xml.sax.saxutils import escape

    os.makedirs(path, exist_ok=True)
    cols = df.columns
    out_schema = T.StructType([T.StructField("file", T.StringType()),
                               T.StructField("n", T.LongType())])

    def emit(batches):
        import uuid
        feats = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                d = dict(zip(cols, r))
                props = json.loads(d[props_col]) if props_col and \
                    d.get(props_col) else {
                        k: (v.item() if hasattr(v, "item") else v)
                        for k, v in d.items()
                        if k not in (geom_col, props_col, "fid")}
                buf = ["<gml:featureMember>",
                       f'<{feature_name} gml:id="f{d.get("fid", len(feats))}">']
                for k in sorted(props):
                    if props[k] is not None:
                        buf.append(f"<{k}>{escape(str(props[k]))}</{k}>")
                if d.get(geom_col) is not None:
                    buf.append("<geometry>"
                               + _geom_to_gml(d[geom_col]) + "</geometry>")
                buf.append(f"</{feature_name}></gml:featureMember>")
                feats.append("".join(buf))
        if not feats:
            yield pd.DataFrame({"file": [], "n": []})
            return
        doc = ('<?xml version="1.0" encoding="UTF-8"?>'
               '<gml:FeatureCollection '
               'xmlns:gml="http://www.opengis.net/gml/3.2">'
               + "".join(feats) + "</gml:FeatureCollection>")
        fname = f"part-{uuid.uuid4().hex}.gml"
        with open(os.path.join(path, fname), "w") as f:
            f.write(doc)
        yield pd.DataFrame({"file": [fname], "n": [len(feats)]})

    df.mapInPandas(emit, out_schema).collect()
