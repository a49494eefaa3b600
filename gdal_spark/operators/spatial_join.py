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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from ..core import geomops, tilemath, wkb


def point_cell_col(lon: Column, lat: Column, zoom: int) -> Column:
    """Containing-cell id of a lon/lat point — pure JVM column math."""
    tx, ty = tilemath.mercator_tile_cols(lon, lat, zoom)
    return tilemath.cell_id_col(tx, ty, zoom)


@pandas_udf(BooleanType())
def pip_exact(lon: pd.Series, lat: pd.Series, geom: pd.Series) -> pd.Series:
    """Exact point-in-polygon (even-odd ray casting) on candidate pairs.

    Batched: decodes each distinct WKB once per Arrow batch and tests all of
    its points vectorized (numpy), mirroring OGR's prepared-geometry loop.
    """
    out = pd.Series(False, index=lon.index)
    df = pd.DataFrame({"lon": lon.values, "lat": lat.values, "g": geom.values})
    for g_bytes, grp in df.groupby("g", sort=False):
        geo = wkb.decode(bytes(g_bytes))
        res = geomops.points_in_geom(grp["lon"].values, grp["lat"].values, geo)
        out.iloc[grp.index] = res
    return out


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
    extra = [c for c in regions.columns if c not in ("geom", "cells", "region_id")]
    r = regions.select("region_id", "geom", *extra,
                       F.explode("cells").alias("_cell"))
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
    hit = cand.where(pip_exact(F.col("lon"), F.col("lat"), F.col("geom")))
    return hit.drop("_cell", "_salt", "geom")


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
