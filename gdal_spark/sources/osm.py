"""OSM XML source (ogr/ogrsf_frmts/osm/ — the XML flavor).

The reference materializes a giant on-disk node cache
(osm2osm / ogrosmlayer.cpp) and streams ways through it sequentially.
Spark-first, the node cache IS a join:

  nodes(id, lon, lat, tags)                      <- element parse
  ways(id, refs[], tags)                         <- element parse
  way geometry = explode(refs with position)
                 JOIN nodes ON ref = node id     <- the "cache lookup"
                 groupBy way, sort by position   <- reassembly

so a planet-sized ways layer builds with two shuffles and no
driver-side state. Layers follow OGR's model: `points` (tagged nodes),
`lines` (open ways), `polygons` (closed ways), `multipolygons`
(type=multipolygon relations, outer/inner rings stitched per relation
inside one applyInPandas group).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import wkb as W

_NODE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("lon", T.DoubleType()),
    T.StructField("lat", T.DoubleType()),
    T.StructField("tags", T.StringType()),
])
_WAY_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("refs", T.ArrayType(T.LongType())),
    T.StructField("tags", T.StringType()),
])
_REL_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("member_ways", T.ArrayType(T.LongType())),
    T.StructField("roles", T.ArrayType(T.StringType())),
    T.StructField("tags", T.StringType()),
])


def parse_osm(spark: SparkSession, path: str):
    """-> (nodes, ways, relations) DataFrames."""
    import xml.etree.ElementTree as ET

    raw = spark.read.text(path, wholetext=True)

    def parse_nodes(batches):
        for pdf in batches:
            rows = []
            for txt in pdf["value"]:
                for el in ET.fromstring(txt):
                    if el.tag == "node":
                        tags = {t.get("k"): t.get("v")
                                for t in el if t.tag == "tag"}
                        rows.append([int(el.get("id")),
                                     float(el.get("lon")),
                                     float(el.get("lat")),
                                     json.dumps(tags, sort_keys=True)])
            yield pd.DataFrame(rows, columns=["id", "lon", "lat", "tags"]) \
                if rows else pd.DataFrame(
                    columns=["id", "lon", "lat", "tags"])

    def parse_ways(batches):
        for pdf in batches:
            rows = []
            for txt in pdf["value"]:
                for el in ET.fromstring(txt):
                    if el.tag == "way":
                        refs = [int(n.get("ref"))
                                for n in el if n.tag == "nd"]
                        tags = {t.get("k"): t.get("v")
                                for t in el if t.tag == "tag"}
                        rows.append([int(el.get("id")), refs,
                                     json.dumps(tags, sort_keys=True)])
            yield pd.DataFrame(rows, columns=["id", "refs", "tags"]) \
                if rows else pd.DataFrame(columns=["id", "refs", "tags"])

    def parse_rels(batches):
        for pdf in batches:
            rows = []
            for txt in pdf["value"]:
                for el in ET.fromstring(txt):
                    if el.tag == "relation":
                        mw = [int(m.get("ref")) for m in el
                              if m.tag == "member"
                              and m.get("type") == "way"]
                        ro = [m.get("role") or "" for m in el
                              if m.tag == "member"
                              and m.get("type") == "way"]
                        tags = {t.get("k"): t.get("v")
                                for t in el if t.tag == "tag"}
                        rows.append([int(el.get("id")), mw, ro,
                                     json.dumps(tags, sort_keys=True)])
            yield pd.DataFrame(
                rows, columns=["id", "member_ways", "roles", "tags"]) \
                if rows else pd.DataFrame(
                    columns=["id", "member_ways", "roles", "tags"])

    return (raw.mapInPandas(parse_nodes, _NODE_SCHEMA),
            raw.mapInPandas(parse_ways, _WAY_SCHEMA),
            raw.mapInPandas(parse_rels, _REL_SCHEMA))


def _way_coords(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """(way_id, tags, xs[], ys[]) — the distributed node-cache join."""
    w = ways.select(F.col("id").alias("way_id"), "tags",
                    F.posexplode("refs").alias("pos", "ref"))
    j = w.join(nodes.select(F.col("id").alias("ref"), "lon", "lat"),
               "ref")
    return (j.groupBy("way_id", "tags")
            .agg(F.array_sort(F.collect_list(
                F.struct("pos", "lon", "lat"))).alias("pts"))
            .select("way_id", "tags",
                    F.transform("pts", lambda p: p.lon).alias("xs"),
                    F.transform("pts", lambda p: p.lat).alias("ys")))


_GEOM_SCHEMA = T.StructType([
    T.StructField("fid", T.LongType()),
    T.StructField("geom", T.BinaryType()),
    T.StructField("tags", T.StringType()),
])


def _coords_to_geom(wc: DataFrame, closed: bool) -> DataFrame:
    def build(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = np.stack([np.asarray(r.xs), np.asarray(r.ys)], axis=1)
                is_ring = len(a) >= 4 and (a[0] == a[-1]).all()
                if closed != is_ring:
                    continue
                g = W.Geom(W.POLYGON if closed else W.LINESTRING, [a])
                rows.append([int(r.way_id), W.encode(g), r.tags])
            yield pd.DataFrame(rows, columns=["fid", "geom", "tags"]) \
                if rows else pd.DataFrame(columns=["fid", "geom", "tags"])

    return wc.mapInPandas(build, _GEOM_SCHEMA)


def _stitch_rings(segs):
    """Greedy endpoint stitching of way segments into closed rings —
    per-relation work, bounded by the relation's own size."""
    segs = [np.asarray(s) for s in segs if len(s) >= 2]
    segs.sort(key=lambda s: (s[0, 0], s[0, 1], len(s)))
    rings, cur = [], None
    while segs:
        if cur is None:
            cur = segs.pop(0)
        if (cur[0] == cur[-1]).all() and len(cur) >= 4:
            rings.append(cur)
            cur = None
            continue
        endpt = cur[-1]
        hit = None
        for i, s in enumerate(segs):
            if (s[0] == endpt).all():
                hit, flip = i, False
                break
            if (s[-1] == endpt).all():
                hit, flip = i, True
                break
        if hit is None:          # open chain: drop
            cur = None
            continue
        nxt = segs.pop(hit)
        if flip:
            nxt = nxt[::-1]
        cur = np.vstack([cur, nxt[1:]])
    return rings


def osm_layers(spark: SparkSession, path: str) -> dict:
    """-> {'points', 'lines', 'polygons', 'multipolygons'} DataFrames,
    OGR's osm layer model."""
    nodes, ways, rels = parse_osm(spark, path)
    return _layers_from_parsed(spark, nodes, ways, rels)


def _layers_from_parsed(spark: SparkSession, nodes: DataFrame,
                        ways: DataFrame, rels: DataFrame) -> dict:
    """Layer assembly shared by the XML and PBF flavors (osm_pbf.py)."""
    from ..core.geomops import points_in_ring
    points = (nodes.where(F.col("tags") != "{}")
              .select(F.col("id").alias("fid"), "lon", "lat", "tags"))
    wc = _way_coords(ways, nodes)
    lines = _coords_to_geom(wc, closed=False)
    polygons = _coords_to_geom(wc, closed=True)

    # multipolygon relations: member ways join their coords, each
    # relation stitches its own rings in one group
    m = rels.where(F.get_json_object("tags", "$.type")
                   == "multipolygon") \
        .select(F.col("id").alias("rel_id"), "tags",
                F.posexplode("member_ways").alias("mpos", "way_id"))
    mj = m.join(wc.select("way_id", "xs", "ys"), "way_id")

    def assemble(key, pdf):
        rel_id = int(key[0])
        pdf = pdf.sort_values("mpos")
        segs = [np.stack([np.asarray(r.xs), np.asarray(r.ys)], axis=1)
                for r in pdf.itertuples(index=False)]
        rings = _stitch_rings(segs)
        if not rings:
            return pd.DataFrame(columns=["fid", "geom", "tags"])
        # outer = not contained in any other ring; inners attach to the
        # first outer containing them
        outers, inners = [], []
        for r in rings:
            inside = any(points_in_ring(np.array([r[0, 0]]),
                                        np.array([r[0, 1]]), o)[0]
                         for o in rings if o is not r)
            (inners if inside else outers).append(r)
        polys = [[o] for o in outers]
        for h in inners:
            for p in polys:
                if points_in_ring(np.array([h[0, 0]]),
                                  np.array([h[0, 1]]), p[0])[0]:
                    p.append(h)
                    break
        g = (W.Geom(W.POLYGON, polys[0]) if len(polys) == 1
             else W.Geom(W.MULTIPOLYGON,
                         parts=[W.Geom(W.POLYGON, p) for p in polys]))
        return pd.DataFrame([[rel_id, W.encode(g),
                              pdf.iloc[0]["tags"]]],
                            columns=["fid", "geom", "tags"])

    mps = mj.groupBy("rel_id", "tags").applyInPandas(
        lambda key, pdf: assemble(key, pdf), _GEOM_SCHEMA)
    return {"points": points, "lines": lines, "polygons": polygons,
            "multipolygons": mps}


def write_osm(nodes, ways=(), relations=(), path: str = "") -> None:
    """Fixture writer: nodes [(id, lon, lat, {tags})], ways
    [(id, [refs], {tags})], relations [(id, [(way_ref, role)], {tags})]
    -> one .osm XML document."""
    from xml.sax.saxutils import quoteattr

    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<osm version="0.6" generator="gdal_spark">']

    def tags(d):
        return [f"  <tag k={quoteattr(k)} v={quoteattr(str(v))}/>"
                for k, v in sorted(d.items())]

    for i, lon, lat, tg in nodes:
        if tg:
            out.append(f'<node id="{i}" lat="{lat!r}" lon="{lon!r}">')
            out += tags(tg)
            out.append("</node>")
        else:
            out.append(f'<node id="{i}" lat="{lat!r}" lon="{lon!r}"/>')
    for i, refs, tg in ways:
        out.append(f'<way id="{i}">')
        out += [f'  <nd ref="{r}"/>' for r in refs]
        out += tags(tg)
        out.append("</way>")
    for i, members, tg in relations:
        out.append(f'<relation id="{i}">')
        out += [f'  <member type="way" ref="{r}" role="{ro}"/>'
                for r, ro in members]
        out += tags(tg)
        out.append("</relation>")
    out.append("</osm>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out))
