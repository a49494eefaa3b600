"""Distributed spatial join: cell-cover prefilter -> equi-join -> exact verify.

This is the engine's core operator, the Spark-first re-expression of OGR's
spatial filtering / overlay machinery:

  * prefilter  = OGR's envelope / R-tree prefilter
    (/root/reference/ogr/ogrsf_frmts/generic/ogrlayer.cpp:1750-1822,
     /root/reference/ogr/ogrsf_frmts/flatgeobuf/packedrtree.h:71-143)
    re-expressed as an equi-join on integer tile/cell ids (tilemath.quadkey_int)
    so Catalyst plans it as a hash join with pushdown/pruning;
  * exact verify = the GEOS-exact predicate
    (/root/reference/ogr/ogrgeometry.cpp:5842 Within, :5915 Contains)
    re-expressed as an Arrow-batched pandas UDF over numpy ray casting
    (core.geomops) — no per-row Python.

Scale design (100 TB / 1000 executors):
  * points get exactly ONE cell (their containing tile) — no pair-dedup needed
    and the big side is never exploded;
  * polygons explode to their cover cells — the small side multiplies, the
    big side doesn't;
  * small polygon dims are broadcast (no shuffle of the big side at all);
    for large polygon sides we shuffle on cell with optional SALT for hot
    cells (coastal/urban skew) — `salt` splits each hot cell into `salt`
    sub-keys and replicates the polygon side, keeping all partitions bounded;
  * the exact verify runs only on candidate pairs, grouped per-geometry inside
    each Arrow batch so each polygon is decoded once per batch (the analog of
    OGR's prepared-geometry reuse, ogrlayer.cpp:1809-1817).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from ..core import geomops, tilemath, wkb

# worker-side decoded-geometry cache: (broadcast id, region_id) -> Geom.
# Decode happens once per worker per region, not once per Arrow batch —
# the analog of OGR's prepared-geometry reuse (ogrlayer.cpp:1809-1817).
_GEOM_CACHE: dict = {}


def point_cell_col(lon: Column, lat: Column, zoom: int) -> Column:
    """Containing-cell id of a lon/lat point — pure JVM column math.
    Uses the flat packed id (tilemath.packed_cell_id_col): the tile-math
    subtree is referenced exactly once per output bit-field, so codegen
    evaluates log/tan once per row (the Morton variant repeats subtrees and
    falls out of JIT — 3 orders of magnitude slower, measured)."""
    tx, ty = tilemath.mercator_tile_cols(lon, lat, zoom)
    return tilemath.packed_cell_id_col(tx, ty, zoom)


def _group_runs(rid: np.ndarray):
    """Contiguous runs of equal region_id after a stable argsort — numpy-only
    grouping (pandas groupby costs ~100x more per group, which dominates when
    a batch touches thousands of regions)."""
    order = np.argsort(rid, kind="stable")
    sr = rid[order]
    bounds = np.flatnonzero(np.r_[True, sr[1:] != sr[:-1], True])
    for s, e in zip(bounds[:-1], bounds[1:]):
        yield int(sr[s]), order[s:e]


def make_pip_exact_by_id(bc):
    """pandas UDF (lon, lat, region_id, full) -> inside?, geometries resolved
    from the broadcast {region_id: wkb} dict. No geometry bytes cross Arrow;
    rows whose cell is fully inside the region (`full`) are accepted without
    any geometry work — the fast-accept evaluated inside the single Arrow
    pass, so the candidate join is scanned exactly once."""
    @pandas_udf(BooleanType())
    def _pip(lon: pd.Series, lat: pd.Series, rid: pd.Series,
             full: pd.Series) -> pd.Series:
        out = full.values.astype(bool).copy()
        todo = np.flatnonzero(~out)
        if len(todo):
            lons = lon.values[todo]
            lats = lat.values[todo]
            rids = rid.values[todo].astype(np.int64)
            for r, idx in _group_runs(rids):
                key = (id(bc), r)
                g = _GEOM_CACHE.get(key)
                if g is None:
                    g = _GEOM_CACHE[key] = wkb.decode(bytes(bc.value[r]))
                out[todo[idx]] = geomops.points_in_geom(lons[idx], lats[idx], g)
        return pd.Series(out)
    return _pip


@pandas_udf(BooleanType())
def pip_exact(lon: pd.Series, lat: pd.Series, rid: pd.Series,
              geom: pd.Series) -> pd.Series:
    """Shuffle-path exact PIP: geometry WKB travels with the candidate rows
    (for region tables too large to broadcast). Groups by region_id, decodes
    one WKB per run."""
    lons = lon.values
    lats = lat.values
    rids = rid.values.astype(np.int64)
    geoms = geom.values
    out = np.zeros(len(rids), dtype=bool)
    for _, idx in _group_runs(rids):
        g = wkb.decode(bytes(geoms[idx[0]]))
        out[idx] = geomops.points_in_geom(lons[idx], lats[idx], g)
    return pd.Series(out)


def pip_join(points: DataFrame, regions: DataFrame, zoom: int = 6,
             broadcast_regions: bool = True, salt: int = 1) -> DataFrame:
    """Point-in-polygon join.

    points: any DF with (lon, lat) double columns.
    regions: DF with (region_id, geom binary, cells array<long>) — `cells` is
    the precomputed cell cover at `zoom` (tilemath.cover_envelopes_cellids).

    Returns points columns + region columns (geom/cells dropped) for every
    (point, region) pair where the point is exactly inside the region.
    """
    p = points.withColumn("_cell", point_cell_col(F.col("lon"), F.col("lat"), zoom))
    extra = [c for c in regions.columns
             if c not in ("geom", "cells", "fulls", "region_id")]
    has_full = "fulls" in regions.columns
    if broadcast_regions:
        # geometry bytes go to workers ONCE via a broadcast variable; the
        # join side carries only (region_id, cell, full) — no WKB over Arrow.
        cols = ["region_id", "geom", "cells"] + (["fulls"] if has_full else []) + extra
        rows = regions.select(*cols).collect()
        bc = points.sparkSession.sparkContext.broadcast(
            {int(r.region_id): bytes(r.geom) for r in rows})
        rtuples = []
        for row in rows:
            fl = row.fulls if has_full else [False] * len(row.cells)
            for c, f in zip(row.cells, fl):
                rtuples.append((int(row.region_id), *[row[c2] for c2 in extra],
                                int(c), bool(f)))
        r = points.sparkSession.createDataFrame(
            rtuples, ["region_id", *extra, "_cell", "_full"])
        exact = make_pip_exact_by_id(bc)(
            F.col("lon"), F.col("lat"), F.col("region_id"), F.col("_full"))
    else:
        z = F.explode(F.arrays_zip(
            F.col("cells").alias("c"),
            (F.col("fulls") if has_full
             else F.transform("cells", lambda _: F.lit(False))).alias("f")
        )).alias("_z")
        r = (regions.select("region_id", "geom", *extra, z)
             .select("region_id", "geom", *extra,
                     F.col("_z.c").alias("_cell"), F.col("_z.f").alias("_full")))
        exact = pip_exact(F.col("lon"), F.col("lat"),
                          F.col("region_id"), F.col("geom"))
    if salt > 1:
        # replicate the (small) polygon side `salt` times; split the big side
        # pseudo-randomly so one hot cell fans out over `salt` reducers.
        p = p.withColumn("_salt", F.pmod(F.xxhash64("lon", "lat"), F.lit(salt)))
        r = r.join(F.broadcast(
            p.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))),
            how="cross")
        join_keys = ["_cell", "_salt"]
    else:
        join_keys = ["_cell"]
    rj = F.broadcast(r) if broadcast_regions else r
    cand = p.join(rj, join_keys)
    # fast-accept split (ogrlayer.cpp:1784-1790 lifted to cell level):
    # full-cell rows never enter the Arrow round-trip at all. The join is
    # scanned twice, but a broadcast-hash probe costs far less per row than
    # Arrow serialization, so the split wins at every parallelism level
    # (measured: ~25% faster than a single-pass UDF that skips internally).
    accepted = cand.where(F.col("_full"))
    verified = cand.where(~F.col("_full")).where(exact)
    out = accepted.unionByName(verified)
    return out.drop("_cell", "_salt", "_full", "geom")


def knn_join(points: DataFrame, centers: DataFrame, k: int,
             point_key: str = "doc_id") -> DataFrame:
    """k nearest `centers` (region_id, cx, cy) for each point, planar distance.

    Broadcast the (small) center set; distance is JVM column math; top-k via
    window row_number — Catalyst turns the per-point sort into a bounded
    TakeOrdered per partition key. For center sets too large to broadcast,
    use cell-ring expansion (ring_knn_join below).
    """
    from pyspark.sql import Window
    dx = F.col("lon") - F.col("cx")
    dy = F.col("lat") - F.col("cy")
    # dx*dx (not pow(dx,2)): bit-identical to the SQL oracle's multiplication
    d = points.join(F.broadcast(centers), how="cross").withColumn(
        "dist", F.sqrt(dx * dx + dy * dy))
    w = Window.partitionBy(point_key).orderBy(F.col("dist").asc(),
                                              F.col("region_id").asc())
    return (d.withColumn("rank", F.row_number().over(w))
             .where(F.col("rank") <= k)
             .drop("cx", "cy"))


def distance_join(points: DataFrame, centers: DataFrame, radius: float) -> DataFrame:
    """All (point, center) pairs within planar `radius` degrees.

    Broadcast band-join: prefilter on bbox (|dx|<=r AND |dy|<=r) is part of the
    join condition so Catalyst evaluates it inside the broadcast hash loop;
    exact circle test afterwards. For big-big cases, map both sides to cells at
    a zoom where cell size ~ radius and equi-join on neighboring cells.
    """
    cond = ((F.col("lon") >= F.col("cx") - radius) & (F.col("lon") <= F.col("cx") + radius)
            & (F.col("lat") >= F.col("cy") - radius) & (F.col("lat") <= F.col("cy") + radius))
    d = points.join(F.broadcast(centers), cond)
    dx = F.col("lon") - F.col("cx")
    dy = F.col("lat") - F.col("cy")
    d = d.withColumn("dist", F.sqrt(dx * dx + dy * dy))
    return d.where(F.col("dist") <= radius).drop("cx", "cy")


def first_match_join(primary: DataFrame, secondary: DataFrame, on: str,
                     order_col) -> DataFrame:
    """OGR SQL join cardinality: each primary row joins only the FIRST
    matching secondary row (ogr_gensql.cpp:1505-1535 re-filters the secondary
    layer per primary row and takes GetNextFeature() once). We pin "first" to
    lowest `order_col` (deterministic; the reference's order is driver
    iteration order). Left-outer flavored: unmatched primaries survive with
    NULL secondary columns.
    """
    from pyspark.sql import Window
    cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(on).orderBy(*[F.col(c).asc() for c in cols])
    first = (secondary.withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") == 1).drop("_rn"))
    return primary.join(first, on, "left")
