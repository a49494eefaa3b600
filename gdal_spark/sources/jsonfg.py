"""OGC JSON-FG source/sink (ogr/ogrsf_frmts/jsonfg/ driver parity;
OGC 21-045 "Features and Geometries JSON").

JSON-FG extends GeoJSON features with:
  * ``time`` — an instant ({"date"} / {"timestamp"}) or an
    {"interval": [lo, hi]} with ".." for open ends;
  * ``place`` — the native-CRS geometry (``coordRefSys``), while
    ``geometry`` stays WGS84 (or null when not representable);
  * ``conformsTo`` on the collection.

Schema: (fid, geom = place if present else geometry, geom_wgs84,
coord_ref_sys, time_start, time_end, props) — the reference similarly
prefers place for the layer geometry and keeps the WGS84 twin
(ogrjsonfgreader.cpp). Newline-delimited parse is fully distributed;
a FeatureCollection document parses one task per file, same granularity
the reference gets.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .geojson import geom_from_geojson, geom_to_geojson

_SCHEMA = T.StructType([
    T.StructField("fid", T.LongType()),
    T.StructField("geom", T.BinaryType()),
    T.StructField("geom_wgs84", T.BinaryType()),
    T.StructField("coord_ref_sys", T.StringType()),
    T.StructField("time_start", T.StringType()),
    T.StructField("time_end", T.StringType()),
    T.StructField("props", T.StringType()),
])
_COLS = [f.name for f in _SCHEMA.fields]


def _time_bounds(t) -> tuple:
    if not t:
        return None, None
    if "date" in t:
        return t["date"], t["date"]
    if "timestamp" in t:
        return t["timestamp"], t["timestamp"]
    if "interval" in t:
        lo, hi = t["interval"]
        return (None if lo == ".." else lo), (None if hi == ".." else hi)
    return None, None


def _feature_row(f: dict):
    wgs = (geom_from_geojson(f.get("geometry"))
           if f.get("geometry") else None)
    place = f.get("place")
    native = geom_from_geojson(place) if place else None
    crs = None
    if place and "coordRefSys" in place:
        crs = (place["coordRefSys"] if isinstance(place["coordRefSys"], str)
               else json.dumps(place["coordRefSys"]))
    elif "coordRefSys" in f:
        crs = f["coordRefSys"]
    ts, te = _time_bounds(f.get("time"))
    fid = f.get("id")
    return [int(fid) if isinstance(fid, (int, float)) else None,
            native if native is not None else wgs, wgs, crs, ts, te,
            json.dumps(f.get("properties") or {}, sort_keys=True)]


def read_jsonfg(spark: SparkSession, path: str) -> DataFrame:
    """.jsonfg / newline-delimited JSON-FG -> DataFrame. Accepts both a
    FeatureCollection document and one-feature-per-line layouts."""
    import os
    head = b""
    if "*" not in path and os.path.isfile(path):
        with open(path, "rb") as f:
            head = f.read(4096).lstrip()
    if head.startswith(b"{") and b'"FeatureCollection"' in head[:2048]:
        with open(path, "r", encoding="utf-8") as f:
            doc = json.load(f)
        rows = [_feature_row(ft) for ft in doc.get("features", [])]
        pdf = pd.DataFrame(rows, columns=_COLS)
        df = spark.createDataFrame(pdf, _SCHEMA) if rows else \
            spark.createDataFrame([], _SCHEMA)
    else:
        raw = spark.read.text(path)

        def parse(batches):
            for pdf in batches:
                rows = [_feature_row(json.loads(s)) for s in pdf["value"]
                        if s and s.strip()]
                yield (pd.DataFrame(rows, columns=_COLS) if rows
                       else pd.DataFrame(columns=_COLS))

        df = raw.mapInPandas(parse, _SCHEMA)
    return df.withColumn(
        "fid", F.when(F.col("fid").isNotNull(), F.col("fid"))
        .otherwise(F.monotonically_increasing_id() + F.lit(1 << 62)))


def write_jsonfg(df: DataFrame, path: str, geom_col: str = "geom",
                 crs: str | None = None,
                 time_cols: tuple | None = None,
                 props_col: str | None = "props") -> None:
    """(.., geom WKB, ..) -> newline-delimited JSON-FG features. When
    `crs` names a non-WGS84 CRS the geometry goes into ``place`` (with
    coordRefSys) and ``geometry`` is null, per OGC 21-045 §7.3; otherwise
    it is plain GeoJSON + time."""
    cols = df.columns
    ts_col, te_col = time_cols or (None, None)

    def emit(batches):
        for pdf in batches:
            lines = []
            for r in pdf.itertuples(index=False):
                d = dict(zip(cols, r))
                props = (json.loads(d[props_col])
                         if props_col and d.get(props_col) else
                         {k: (v.item() if hasattr(v, "item") else v)
                          for k, v in d.items()
                          if k not in (geom_col, props_col, "fid",
                                       ts_col, te_col)})
                gj = (geom_to_geojson(d[geom_col])
                      if d.get(geom_col) is not None else None)
                ft = {"type": "Feature", "properties": props}
                if "fid" in d and d["fid"] is not None:
                    ft["id"] = int(d["fid"])
                if crs:
                    ft["place"] = (dict(gj, coordRefSys=crs)
                                   if gj else None)
                    ft["geometry"] = None
                else:
                    ft["geometry"] = gj
                ts = d.get(ts_col) if ts_col else None
                te = d.get(te_col) if te_col else None
                if ts is not None or te is not None:
                    if ts == te or te is None:
                        key = "date" if ts and len(str(ts)) == 10 \
                            else "timestamp"
                        ft["time"] = {key: str(ts)}
                    else:
                        ft["time"] = {"interval":
                                      [str(ts) if ts is not None else "..",
                                       str(te) if te is not None else ".."]}
                lines.append(json.dumps(ft, sort_keys=True))
            yield pd.DataFrame({"value": lines})

    df.mapInPandas(emit, "value string").write.mode("overwrite").text(path)
