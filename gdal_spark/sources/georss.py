"""GeoRSS source/sink (ogr/ogrsf_frmts/georss/ogrgeorsslayer.cpp).

RSS 2.0 <item> / Atom <entry> elements carrying geometry as either
GeoRSS-Simple (<georss:point>lat lon</georss:point>, <georss:line>,
<georss:polygon> — lat-first coordinate order!) or W3C geo
(<geo:lat>/<geo:long>). Attributes: title, link, description/summary,
pubDate/updated.

One task per file (wholetext), the reference's sequential granularity;
namespace handling is local-name based like the KML/GML readers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..core import wkb as W

_SCHEMA = T.StructType([
    T.StructField("fid", T.LongType()),
    T.StructField("geom", T.BinaryType()),
    T.StructField("title", T.StringType()),
    T.StructField("link", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("pub_date", T.StringType()),
])
_COLS = [f.name for f in _SCHEMA.fields]


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _item_row(fid: int, el) -> list:
    title = link = desc = date = None
    geom = None
    lat = lon = None
    for ch in el.iter():
        ln = _local(ch.tag)
        tx = (ch.text or "").strip()
        if ln == "title":
            title = tx
        elif ln == "link":
            link = tx or ch.get("href")
        elif ln in ("description", "summary"):
            desc = tx
        elif ln in ("pubDate", "updated", "date"):
            date = tx
        elif ln == "point" and tx:
            la, lo = (float(v) for v in tx.split()[:2])
            geom = W.Geom(W.POINT, [np.array([[lo, la]])])
        elif ln == "line" and tx:
            v = np.array(tx.split(), np.float64).reshape(-1, 2)
            geom = W.Geom(W.LINESTRING, [v[:, ::-1].copy()])
        elif ln == "polygon" and tx:
            v = np.array(tx.split(), np.float64).reshape(-1, 2)[:, ::-1]
            ring = v if np.array_equal(v[0], v[-1]) else \
                np.vstack([v, v[:1]])
            geom = W.Geom(W.POLYGON, [ring.copy()])
        elif ln == "lat" and tx:
            lat = float(tx)
        elif ln in ("long", "lon") and tx:
            lon = float(tx)
    if geom is None and lat is not None and lon is not None:
        geom = W.Geom(W.POINT, [np.array([[lon, lat]])])
    return [fid, W.encode(geom) if geom else None, title, link, desc,
            date]


def read_georss(spark: SparkSession, path: str) -> DataFrame:
    import xml.etree.ElementTree as ET

    raw = spark.read.text(path, wholetext=True)

    def parse(batches):
        for pdf in batches:
            rows = []
            for txt in pdf["value"]:
                root = ET.fromstring(txt)
                fid = 0
                for el in root.iter():
                    if _local(el.tag) in ("item", "entry"):
                        rows.append(_item_row(fid, el))
                        fid += 1
            yield (pd.DataFrame(rows, columns=_COLS) if rows
                   else pd.DataFrame(columns=_COLS))

    return raw.mapInPandas(parse, _SCHEMA)


def write_georss(rows, path: str, flavor: str = "rss") -> None:
    """rows: [(wkb_or_None, {title, link, description, pub_date})] ->
    one RSS 2.0 GeoRSS-Simple document (fixture writer / bounded
    extract). Lat-first coordinate order per the GeoRSS spec."""
    from xml.sax.saxutils import escape

    def coords(a):
        return " ".join(f"{y!r} {x!r}" for x, y in a)

    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<rss version="2.0" '
           'xmlns:georss="http://www.georss.org/georss">',
           "<channel><title>gdal_spark</title>"]
    for g, a in rows:
        out.append("<item>")
        for k, tag in (("title", "title"), ("link", "link"),
                       ("description", "description"),
                       ("pub_date", "pubDate")):
            if a.get(k) is not None:
                out.append(f"<{tag}>{escape(str(a[k]))}</{tag}>")
        if g is not None:
            geom = W.decode(bytes(g))
            if geom.gtype == W.POINT:
                out.append(f"<georss:point>{coords(geom.rings[0])}"
                           "</georss:point>")
            elif geom.gtype == W.LINESTRING:
                out.append(f"<georss:line>{coords(geom.rings[0])}"
                           "</georss:line>")
            elif geom.gtype == W.POLYGON:
                out.append(f"<georss:polygon>{coords(geom.rings[0])}"
                           "</georss:polygon>")
            else:
                raise ValueError("GeoRSS-Simple supports point/line/"
                                 "polygon")
        out.append("</item>")
    out.append("</channel></rss>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out))
