"""Distributed sieve filter: remove raster polygons smaller than a threshold.

Re-expresses GDALSieveFilter (/root/reference/alg/gdalsievefilter.cpp —
two-row connected components, merge small polygons into their largest
neighbour) on the tile table:

    1. per-tile labeling + cross/intra-tile neighbor graph (shares the
       polygonize machinery)
    2. resolve global components, sizes, and the component neighbor graph
    3. iteratively merge every small component into its largest neighbour
       until none is below the threshold (graph-only work — tiny next to
       the raster; driver-side under the same smallness assumption as the
       polygonize union-find fast path)
    4. rewrite tile pixels with the merged values (map-only applyInPandas)

Tie-break divergence from the reference: when two neighbours have equal
size we pick the one with the smaller component id (deterministic); GDAL
keeps the first polygon enumerated by its scan order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .polygonize import (_label_tile, _node_base, _node_id,
                         _union_find_pdf, adjacency_pairs, tile_components)
from .tiles import TILE_SCHEMA, decode_px, encode_px

_NBR_SCHEMA = T.StructType([
    T.StructField("node", T.LongType()),
    T.StructField("node2", T.LongType()),
])


def _neighbor_pairs(tiles_df: DataFrame, tile: int,
                    connect: int = 4) -> DataFrame:
    """Adjacent same-tile components with DIFFERENT labels (any values) —
    the intra-tile part of the sieve neighbour graph."""

    def emit(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out = set()
        for r in pdf.itertuples():
            arr = decode_px(r.px, r.dtype, tile)
            valid = np.ones_like(arr, dtype=bool) if r.nodata is None or \
                np.isnan(r.nodata) else arr != np.array(r.nodata, arr.dtype)
            lbl = _label_tile(arr, valid, connect)
            base = _node_base(int(r.tile_x), int(r.tile_y), tile)
            h, w = arr.shape
            pairs = [((slice(0, -1), slice(None)),
                      (slice(1, None), slice(None))),
                     ((slice(None), slice(0, -1)),
                      (slice(None), slice(1, None)))]
            if connect == 8:
                pairs += [((slice(0, h - 1), slice(0, w - 1)),
                           (slice(1, h), slice(1, w))),
                          ((slice(0, h - 1), slice(1, w)),
                           (slice(1, h), slice(0, w - 1)))]
            for a, b in pairs:
                la, lb = lbl[a], lbl[b]
                ok = (la >= 0) & (lb >= 0) & (la != lb)
                for x, y in zip(la[ok].ravel(), lb[ok].ravel()):
                    out.add((base + int(x), base + int(y)))
        return pd.DataFrame(sorted(out), columns=["node", "node2"]) if out \
            else pd.DataFrame({"node": pd.Series(dtype="int64"),
                               "node2": pd.Series(dtype="int64")})

    return tiles_df.groupBy("band", "zoom", "tile_x", "tile_y") \
        .applyInPandas(emit, _NBR_SCHEMA)


def _cross_tile_any_value(strips: DataFrame, tile: int,
                          connect: int = 4) -> DataFrame:
    """Cross-tile adjacency WITHOUT the value-equality constraint — facing
    valid pixels of different components are sieve neighbours too.
    connect=8 also pairs diagonal neighbours across the seam (offset +-1)."""
    nid = _node_id(F.col("tile_x"), F.col("tile_y"), F.col("label"), tile)
    e = strips.where(F.col("side") == "E").withColumn("node", nid)
    w = strips.where(F.col("side") == "W").withColumn("node", nid) \
        .select("band", "zoom", (F.col("tile_x") - 1).alias("tile_x"),
                "tile_y", "offset", F.col("node").alias("node2"))
    s = strips.where(F.col("side") == "S").withColumn("node", nid)
    n = strips.where(F.col("side") == "N").withColumn("node", nid) \
        .select("band", "zoom", "tile_x", (F.col("tile_y") - 1).alias("tile_y"),
                "offset", F.col("node").alias("node2"))
    if connect == 8:
        off3 = F.explode(F.array(F.col("offset") - 1, F.col("offset"),
                                 F.col("offset") + 1)).alias("_o3")
        e = e.select("*", off3).drop("offset").withColumnRenamed("_o3", "offset")
        s = s.select("*", off3).drop("offset").withColumnRenamed("_o3", "offset")
    jk = ["band", "zoom", "tile_x", "tile_y", "offset"]
    return (e.join(w, jk).select("node", "node2")
            .unionByName(s.join(n, jk).select("node", "node2"))
            .where(F.col("node") != F.col("node2"))
            .distinct())


def sieve(tiles_df: DataFrame, threshold: int, tile: int = 256,
          connect: int = 4) -> DataFrame:
    """Return a new tile table with every connected region smaller than
    `threshold` pixels merged into its largest neighbour's value.
    connect=4|8 mirrors GDALSieveFilter's CONNECTED option
    (/root/reference/alg/gdalsievefilter.cpp)."""
    spark = tiles_df.sparkSession
    comp, strips = tile_components(tiles_df, tile, connect)
    same_pairs = adjacency_pairs(strips, tile, connect)

    # resolve global components (same machinery as polygonize)
    mapping = _union_find_pdf(
        [(r.node, r.node2) for r in same_pairs.toLocalIterator()])
    if len(mapping):
        lbl = F.broadcast(spark.createDataFrame(mapping))
        comp = comp.join(lbl, "node", "left") \
            .withColumn("comp", F.coalesce("comp", F.col("node")))
    else:
        comp = comp.withColumn("comp", F.col("node"))

    stats = comp.groupBy("comp", "value") \
        .agg(F.sum("n_pixels").alias("size"),
             F.min("canon").alias("canon")).collect()
    size = {int(r.comp): int(r.size) for r in stats}
    value = {int(r.comp): float(r.value) for r in stats}
    # row-major rank of each component's first pixel: the id-scheme-
    # independent tie-break (matches a scan-order reference exactly)
    canon = {int(r.comp): int(r.canon) for r in stats}

    node2comp = {int(r.node): int(r.comp)
                 for r in comp.select("node", "comp").toLocalIterator()}

    # component neighbour graph (nodes -> resolved comps, dedup)
    nbr_edges = set()
    for df in (_neighbor_pairs(tiles_df, tile, connect),
               _cross_tile_any_value(strips, tile, connect)):
        for r in df.toLocalIterator():
            a = node2comp.get(int(r.node), int(r.node))
            b = node2comp.get(int(r.node2), int(r.node2))
            if a != b:
                nbr_edges.add((a, b))
                nbr_edges.add((b, a))
    nbrs: dict[int, set] = {}
    for a, b in nbr_edges:
        nbrs.setdefault(a, set()).add(b)

    # iterative merge: small comp -> largest neighbour (by current size)
    merged_into: dict[int, int] = {}

    def resolve(c):
        while c in merged_into:
            c = merged_into[c]
        return c

    changed = True
    while changed:
        changed = False
        for c in sorted(size, key=lambda k: (size[k], canon[k])):
            if c in merged_into or size[c] >= threshold:
                continue
            cand = {resolve(n) for n in nbrs.get(c, ())} - {c}
            if not cand:
                continue
            target = max(cand, key=lambda k: (size[k], -canon[k]))
            merged_into[c] = target
            size[target] += size[c]
            nbrs.setdefault(target, set()).update(nbrs.get(c, ()))
            changed = True

    final_value = {c: value[resolve(c)] for c in size}

    # node -> final value map, broadcast for the rewrite pass
    node_val = {n: final_value[c] for n, c in node2comp.items()}
    bc = spark.sparkContext.broadcast(node_val)

    def rewrite(key, pdf: pd.DataFrame) -> pd.DataFrame:
        nv = bc.value
        out = []
        for r in pdf.itertuples():
            arr = decode_px(r.px, r.dtype, tile).copy()
            valid = np.ones_like(arr, dtype=bool) if r.nodata is None or \
                np.isnan(r.nodata) else arr != np.array(r.nodata, arr.dtype)
            lbl = _label_tile(arr, valid, connect)
            base = _node_base(int(r.tile_x), int(r.tile_y), tile)
            for lab in np.unique(lbl[lbl >= 0]):
                v = nv.get(base + int(lab))
                if v is not None:
                    arr[lbl == lab] = np.array(v, dtype=arr.dtype)
            out.append((r.band, r.zoom, r.tile_x, r.tile_y, r.dtype,
                        r.nodata, encode_px(arr)))
        return pd.DataFrame(out, columns=[f.name for f in TILE_SCHEMA.fields])

    return tiles_df.groupBy("band", "zoom", "tile_x", "tile_y") \
        .applyInPandas(rewrite, TILE_SCHEMA)
