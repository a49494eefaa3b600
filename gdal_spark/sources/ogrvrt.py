"""OGR VRT virtual vector layers (ogr/ogrsf_frmts/vrt/ogrvrtlayer.cpp,
ogrvrtdatasource.cpp — the XML "view" driver every ogr2ogr pipeline
leans on for renaming/retyping fields and building geometries from
attribute columns without rewriting data).

Supported elements (the working core of vrtdataset.xsd):

- ``<OGRVRTLayer name=..>`` with ``<SrcDataSource>`` (any path
  open_vector/parquet recognizes), optional ``<SrcLayer>`` (parquet
  table name inside a directory), optional ``<SrcSQL>`` (runs through
  engine.sql with the source registered as its layer name),
- ``<GeometryField encoding="WKB|WKT|PointFromColumns" field=../
  x=.. y=..>`` — PointFromColumns builds WKB points from numeric
  columns in one vectorized batch (encode_points_batch lane),
- ``<Field name=.. src=.. type=..>`` projections with OGR type map
  (Integer/Integer64/Real/String),
- ``<OGRVRTUnionLayer>`` — unionByName of member layers with missing
  columns null-filled (allowMissingColumns), the OGR union contract.

Everything is a lazy DataFrame view: the VRT adds zero materialization,
so Catalyst pushes filters/pruning straight through to the source scan
— the exact reason the reference driver exists.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

_OGR_TYPES = {"integer": "int", "integer64": "long", "real": "double",
              "string": "string", "date": "date", "datetime": "timestamp"}


@pandas_udf(BinaryType())
def _pts_from_cols(x: pd.Series, y: pd.Series) -> pd.Series:
    from ..core import wkb
    pts = np.stack([x.to_numpy(dtype="float64"),
                    y.to_numpy(dtype="float64")], axis=1)
    return pd.Series(wkb.encode_points_batch(pts))


def _open_source(spark: SparkSession, src: str, layer: str | None):
    low = src.lower()
    if low.endswith(".parquet") or layer is not None:
        path = src if low.endswith(".parquet") \
            else f"{src.rstrip('/')}/{layer}.parquet"
        return spark.read.parquet(path)
    from . import open_vector
    return open_vector(spark, src)


def _apply_layer(spark: SparkSession, el: ET.Element) -> DataFrame:
    src = el.findtext("SrcDataSource")
    if src is None:
        raise ValueError("OGRVRTLayer requires <SrcDataSource>")
    df = _open_source(spark, src.strip(), el.findtext("SrcLayer"))
    sql = el.findtext("SrcSQL")
    if sql is not None:
        from ..sql import OgrSqlEngine
        name = (el.findtext("SrcLayer") or el.get("name") or "src").strip()
        df.createOrReplaceTempView(name)
        df = OgrSqlEngine(spark).sql(sql.strip())

    gf = el.find("GeometryField")
    if gf is not None:
        enc = (gf.get("encoding") or "WKB").lower()
        if enc == "pointfromcolumns":
            df = df.withColumn(
                "geom", _pts_from_cols(F.col(gf.get("x")).cast("double"),
                                       F.col(gf.get("y")).cast("double")))
        elif enc == "wkt":
            from .csv_wkt import _wkt_to_wkb
            df = df.withColumn("geom",
                               _wkt_to_wkb(F.col(gf.get("field"))))
        else:                                   # WKB passthrough/rename
            fld = gf.get("field") or "geom"
            if fld != "geom":
                df = df.withColumnRenamed(fld, "geom")

    fields = el.findall("Field")
    if fields:
        cols = [F.col("geom")] if "geom" in df.columns else []
        for f in fields:
            name = f.get("name")
            c = F.col(f.get("src") or name)
            t = (f.get("type") or "").lower()
            if t in _OGR_TYPES:
                c = c.cast(_OGR_TYPES[t])
            cols.append(c.alias(name))
        df = df.select(*cols)
    return df


def _apply_union(spark: SparkSession, el: ET.Element) -> DataFrame:
    members = [_build(spark, ch) for ch in el
               if ch.tag in ("OGRVRTLayer", "OGRVRTUnionLayer")]
    if not members:
        raise ValueError("empty OGRVRTUnionLayer")
    out = members[0]
    for m in members[1:]:
        out = out.unionByName(m, allowMissingColumns=True)
    return out


def _build(spark: SparkSession, el: ET.Element) -> DataFrame:
    if el.tag == "OGRVRTLayer":
        return _apply_layer(spark, el)
    if el.tag == "OGRVRTUnionLayer":
        return _apply_union(spark, el)
    raise ValueError(f"unsupported VRT element <{el.tag}>")


def read_ogrvrt(spark: SparkSession, path_or_xml: str,
                layer: str | None = None) -> DataFrame:
    """.vrt (OGRVRTDataSource XML) -> lazy DataFrame view. Pass either
    a file path or the XML text itself; ``layer`` picks one
    OGRVRTLayer by name when the datasource holds several (default:
    first)."""
    xml = path_or_xml
    if not path_or_xml.lstrip().startswith("<"):
        with open(path_or_xml) as f:
            xml = f.read()
    root = ET.fromstring(xml)
    if root.tag != "OGRVRTDataSource":
        raise ValueError("not an OGRVRTDataSource document")
    layers = [ch for ch in root
              if ch.tag in ("OGRVRTLayer", "OGRVRTUnionLayer")]
    if not layers:
        raise ValueError("OGRVRTDataSource has no layers")
    if layer is not None:
        layers = [ch for ch in layers if ch.get("name") == layer]
        if not layers:
            raise ValueError(f"no VRT layer named {layer!r}")
    return _build(spark, layers[0])
