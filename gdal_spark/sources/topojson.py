"""TopoJSON source (shared-arc topology encoding of GeoJSON).

Reference behavior: ogr/ogrsf_frmts/geojson/ogrtopojsonreader.cpp —
quantized arcs are per-arc delta-encoded and decode by running sum then
`x*scale + translate` (ParseArc:107-170); a negative arc index i means
arc ~i traversed in reverse; consecutive arcs in a ring share their
junction vertex, so every arc after the first drops its first point
(ParseArc nBaseIndice logic); objects are named layers inside one
`objects` member.

Spark-first: a topology is ONE JSON document whose `arcs` table is
typically far smaller than its feature set, so the driver parses the
header, broadcasts the decoded arc table (pure numpy cumsum), and the
FEATURES fan out across executors — geometry assembly (arc stitching,
reversal, junction dedup) runs inside Arrow batches. For a topology too
big for one broadcast, split by object/layer.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..core import wkb as W


def decode_arcs(topo: dict) -> list[np.ndarray]:
    """arcs table -> list of absolute-coordinate (n,2) float64 arrays."""
    tr = topo.get("transform")
    out = []
    for arc in topo.get("arcs", []):
        a = np.asarray(arc, dtype=np.float64).reshape(-1, 2)
        if tr is not None:
            a = np.cumsum(a, axis=0)
            a = a * np.asarray(tr["scale"]) + np.asarray(tr["translate"])
        out.append(a)
    return out


def _pt(coords, topo):
    p = np.asarray(coords, dtype=np.float64)
    tr = topo.get("transform")
    if tr is not None:
        p = p * np.asarray(tr["scale"]) + np.asarray(tr["translate"])
    return p


def stitch(arc_ids, arcs: list[np.ndarray]) -> np.ndarray:
    """One ring/linestring from its arc index list (negative = ~i
    reversed); every arc after the first drops its duplicated junction
    vertex."""
    parts = []
    for j, aid in enumerate(arc_ids):
        a = arcs[aid] if aid >= 0 else arcs[~aid][::-1]
        parts.append(a if j == 0 else a[1:])
    return np.vstack(parts)


def _geom(obj: dict, arcs, topo) -> W.Geom | None:
    t = obj.get("type")
    if t == "Point":
        return W.Geom(W.POINT, [_pt(obj["coordinates"], topo)
                                .reshape(1, 2)])
    if t == "MultiPoint":
        return W.Geom(W.MULTIPOINT, parts=[
            W.Geom(W.POINT, [_pt(c, topo).reshape(1, 2)])
            for c in obj["coordinates"]])
    if t == "LineString":
        return W.Geom(W.LINESTRING, [stitch(obj["arcs"], arcs)])
    if t == "MultiLineString":
        return W.Geom(W.MULTILINESTRING, parts=[
            W.Geom(W.LINESTRING, [stitch(r, arcs)])
            for r in obj["arcs"]])
    if t == "Polygon":
        return W.Geom(W.POLYGON, [stitch(r, arcs)
                                  for r in obj["arcs"]])
    if t == "MultiPolygon":
        return W.Geom(W.MULTIPOLYGON, parts=[
            W.Geom(W.POLYGON, [stitch(r, arcs) for r in poly])
            for poly in obj["arcs"]])
    return None


def read_topojson(spark: SparkSession, path: str,
                  object_name: str | None = None) -> DataFrame:
    """-> (fid, layer, props json string, geom WKB). Geometries of every
    (or one named) object decode executor-side against the broadcast
    arc table."""
    with open(path) as f:
        topo = json.load(f)
    names = [object_name] if object_name else sorted(topo["objects"])
    feats = []
    fid = 0
    for name in names:
        o = topo["objects"][name]
        geoms = o["geometries"] if o.get("type") == "GeometryCollection" \
            else [o]
        for g in geoms:
            feats.append((g.get("id", fid), name,
                          json.dumps(g.get("properties") or {},
                                     sort_keys=True),
                          json.dumps({k: g[k] for k in
                                      ("type", "coordinates", "arcs")
                                      if k in g})))
            fid += 1
    fdf = spark.createDataFrame(
        feats, "fid long, layer string, props string, spec string") \
        .repartition(max(1, min(32, len(feats) // 64 + 1)))
    arcs_bc = spark.sparkContext.broadcast(decode_arcs(topo))
    tr_bc = spark.sparkContext.broadcast(
        {"transform": topo.get("transform")})

    def gen(batches):
        arcs = arcs_bc.value
        tctx = tr_bc.value
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                g = _geom(json.loads(r.spec), arcs, tctx)
                if g is None:
                    continue
                rows.append((r.fid, r.layer, r.props, W.encode(g)))
            yield pd.DataFrame(rows, columns=["fid", "layer", "props",
                                              "geom"])

    return fdf.mapInPandas(
        gen, "fid long, layer string, props string, geom binary")


def write_topojson(path: str, layers: dict, quantum: float = 1e-7) -> None:
    """Deterministic fixture writer: layers = {name: [(fid, props dict,
    Geom)]}; every linestring/ring becomes its own delta-encoded arc
    (valid TopoJSON without topology extraction — sharing is the
    reader's concern and is tested against hand-built topologies),
    points quantize straight into the transform grid."""
    arcs: list[list[list[int]]] = []

    def q(v):
        return int(np.floor(v / quantum + 0.5))

    def add_arc(ring: np.ndarray) -> int:
        qs = [[q(x), q(y)] for x, y in ring]
        deltas = [qs[0]] + [[b[0] - a[0], b[1] - a[1]]
                            for a, b in zip(qs, qs[1:])]
        arcs.append(deltas)
        return len(arcs) - 1

    def enc(g: W.Geom):
        if g.gtype == W.POINT:
            x, y = g.rings[0][0]
            return {"type": "Point", "coordinates": [q(x), q(y)]}
        if g.gtype == W.LINESTRING:
            return {"type": "LineString", "arcs": [add_arc(g.rings[0])]}
        if g.gtype == W.POLYGON:
            return {"type": "Polygon",
                    "arcs": [[add_arc(r)] for r in g.rings]}
        if g.gtype == W.MULTIPOINT:
            return {"type": "MultiPoint",
                    "coordinates": [[q(p.rings[0][0][0]),
                                     q(p.rings[0][0][1])]
                                    for p in g.parts]}
        raise ValueError(f"unsupported fixture gtype {g.gtype}")

    objects = {}
    for name, feats in layers.items():
        objects[name] = {"type": "GeometryCollection", "geometries": [
            dict(enc(g), id=fid, properties=props)
            for fid, props, g in feats]}
    topo = {"type": "Topology",
            "transform": {"scale": [quantum, quantum],
                          "translate": [0.0, 0.0]},
            "objects": objects, "arcs": arcs}
    with open(path, "w") as f:
        json.dump(topo, f)
