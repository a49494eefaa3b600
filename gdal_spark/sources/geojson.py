"""GeoJSON source/sink (ogr/ogrsf_frmts/geojson/ driver parity, RFC 7946).

Schema: (fid long, geom binary WKB, props string) — properties stay one
JSON string (OGR's driver flattens them to fields after a schema scan; a
Spark pipeline does the same lazily with `from_json` once it knows the
schema, keeping the reader itself schema-free and single-pass).
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
    T.StructField("props", T.StringType()),
])


def geom_from_geojson(d: dict) -> bytes | None:
    """GeoJSON geometry object -> ISO WKB."""
    if d is None:
        return None
    t = d["type"]
    c = d.get("coordinates")

    def ring(r):
        return np.asarray([p[:2] for p in r], dtype=np.float64)

    if t == "Point":
        return wkb.point(float(c[0]), float(c[1]))
    if t == "LineString":
        return wkb.linestring(ring(c))
    if t == "Polygon":
        return wkb.encode(wkb.Geom(wkb.POLYGON, [ring(r) for r in c]))
    if t == "MultiPoint":
        return wkb.encode(wkb.Geom(wkb.MULTIPOINT, parts=[
            wkb.Geom(wkb.POINT, [ring([p])]) for p in c]))
    if t == "MultiLineString":
        return wkb.encode(wkb.Geom(wkb.MULTILINESTRING, parts=[
            wkb.Geom(wkb.LINESTRING, [ring(ls)]) for ls in c]))
    if t == "MultiPolygon":
        return wkb.encode(wkb.Geom(wkb.MULTIPOLYGON, parts=[
            wkb.Geom(wkb.POLYGON, [ring(r) for r in poly]) for poly in c]))
    if t == "GeometryCollection":
        return wkb.encode(wkb.Geom(wkb.GEOMETRYCOLLECTION, parts=[
            wkb.decode(geom_from_geojson(g)) for g in d["geometries"]]))
    raise ValueError(f"unsupported GeoJSON geometry {t}")


def geom_to_geojson(b: bytes) -> dict:
    """ISO WKB -> GeoJSON geometry object."""
    g = wkb.decode(bytes(b))

    def coords(r):
        return [[float(x), float(y)] for x, y in r]

    if g.gtype == wkb.POINT:
        p = g.rings[0][0]
        return {"type": "Point", "coordinates": [float(p[0]), float(p[1])]}
    if g.gtype == wkb.LINESTRING:
        return {"type": "LineString", "coordinates": coords(g.rings[0])}
    if g.gtype == wkb.POLYGON:
        return {"type": "Polygon",
                "coordinates": [coords(r) for r in g.rings]}
    if g.gtype == wkb.MULTIPOINT:
        return {"type": "MultiPoint",
                "coordinates": [coords(p.rings[0])[0] for p in g.parts]}
    if g.gtype == wkb.MULTILINESTRING:
        return {"type": "MultiLineString",
                "coordinates": [coords(p.rings[0]) for p in g.parts]}
    if g.gtype == wkb.MULTIPOLYGON:
        return {"type": "MultiPolygon",
                "coordinates": [[coords(r) for r in p.rings]
                                for p in g.parts]}
    return {"type": "GeometryCollection",
            "geometries": [geom_to_geojson(wkb.encode(p))
                           for p in g.parts]}


def _feature_rows(features):
    """Features without an `id` yield fid=None so the readers' deterministic
    monotonic-id fallback actually fires — batch-local counters would collide
    across Arrow batches / partitions / files."""
    rows = []
    for f in features:
        fid = f.get("id")
        rows.append((int(fid) if isinstance(fid, int) else None,
                     geom_from_geojson(f.get("geometry")),
                     json.dumps(f.get("properties") or {},
                                sort_keys=True)))
    return rows


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """RFC 7946 FeatureCollection file(s) -> (fid, geom, props). One task
    per file (wholetext), like the reference driver's per-file parse."""
    raw = spark.read.text(path, wholetext=True)

    def parse(batches):
        for pdf in batches:
            rows = []
            for txt in pdf["value"]:
                doc = json.loads(txt)
                feats = doc["features"] if doc.get("type") \
                    == "FeatureCollection" else [doc]
                rows.extend(_feature_rows(feats))
            yield pd.DataFrame(rows, columns=["fid", "geom", "props"]) \
                if rows else pd.DataFrame(columns=["fid", "geom", "props"])

    df = raw.mapInPandas(parse, _SCHEMA)
    # id-less features need a globally unique fid across files/partitions;
    # the 1<<62 offset keeps synthesized fids out of the explicit-id range
    return df.withColumn(
        "fid", F.when(F.col("fid").isNotNull(), F.col("fid"))
        .otherwise(F.monotonically_increasing_id() + F.lit(1 << 62)))


def read_geojson_seq(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited GeoJSON (GeoJSONSeq driver) — one feature per
    line, parsed per Arrow batch: fully distributed, the scale path."""
    raw = spark.read.text(path)

    def parse(batches):
        for pdf in batches:
            feats = [json.loads(s) for s in pdf["value"]
                     if s and s.strip()]
            rows = _feature_rows(feats)
            yield pd.DataFrame(rows, columns=["fid", "geom", "props"]) \
                if rows else pd.DataFrame(columns=["fid", "geom", "props"])

    df = raw.mapInPandas(parse, _SCHEMA)
    # line-position fids are not globally stable across partitions; replace
    # with a deterministic monotonic id when the features carry none (the
    # 1<<62 offset keeps synthesized fids out of the explicit-id range)
    return df.withColumn(
        "fid", F.when(F.col("fid").isNotNull(), F.col("fid"))
        .otherwise(F.monotonically_increasing_id() + F.lit(1 << 62)))


def write_geojson_seq(df: DataFrame, path: str, geom_col: str = "geom",
                      props_col: str | None = "props") -> None:
    """(.., geom WKB, ..) -> newline-delimited GeoJSON feature lines."""
    cols = df.columns

    def emit(batches):
        for pdf in batches:
            lines = []
            for r in pdf.itertuples(index=False):
                d = dict(zip(cols, r))
                props = json.loads(d[props_col]) if props_col and \
                    d.get(props_col) else {
                        k: (v.item() if hasattr(v, "item") else v)
                        for k, v in d.items()
                        if k not in (geom_col, props_col)}
                feat = {"type": "Feature",
                        "geometry": geom_to_geojson(d[geom_col])
                        if d[geom_col] is not None else None,
                        "properties": props}
                lines.append(json.dumps(feat, sort_keys=True))
            yield pd.DataFrame({"value": lines})

    out_schema = T.StructType([T.StructField("value", T.StringType())])
    df.mapInPandas(emit, out_schema).write.mode("overwrite").text(path)
