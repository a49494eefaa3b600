"""Sample a raster at point locations (GDALRasterBand::InterpolateAtPoint).

Re-expresses /root/reference/alg/gdal_interpolateatpoint.cpp:394-397
(near / bilinear / cubic point sampling, pixel centers at i+0.5) as a
RELATIONAL join instead of a per-point gather: each point explodes to the
k x k pixel keys its kernel touches (1 for near, 4 for bilinear), equi-joins
the sparse pixel table, and the weighted sum is a groupBy aggregation. All
JVM column math — no UDF, no per-point Python — so sampling a trillion
points against a raster table is one broadcast-or-shuffle join Catalyst can
plan freely. Absent pixels contribute `fill` (0 for density rasters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pixels_from_density(density: DataFrame, value_col: str = "burn") -> DataFrame:
    """(tile_x, tile_y, px, py, value) -> (gpx, gpy, value) global pixels."""
    return density.select(
        (F.shiftleft("tile_x", 8) + F.col("px")).alias("gpx"),
        (F.shiftleft("tile_y", 8) + F.col("py")).alias("gpy"),
        F.col(value_col).cast("double").alias("value"))


def interpolate_at_points(pixels: DataFrame, points: DataFrame,
                          x_col: str, y_col: str, mode: str = "bilinear",
                          fill: float = 0.0,
                          out_col: str = "value") -> DataFrame:
    """points + continuous pixel coords (x_col, y_col; pixel centers at
    i+0.5) -> points with `out_col` sampled from the (gpx, gpy, value)
    pixel table. mode: 'near' or 'bilinear'.

    Rows identical in every column stay distinct: an internal unique row id
    is attached before the corner explode so the final aggregation is
    per-input-row, not per-distinct-value."""
    out_cols = list(points.columns)
    points = points.withColumn("_rid", F.monotonically_increasing_id())
    x = F.col(x_col)
    y = F.col(y_col)
    if mode == "near":
        # GDAL near: floor of the continuous coord selects the pixel
        p = points.withColumn("_jx", F.floor(x).cast("long")) \
                  .withColumn("_jy", F.floor(y).cast("long")) \
                  .withColumn("_w", F.lit(1.0))
        keys = p
    elif mode == "bilinear":
        # centers at i+0.5: shift by 0.5, take floor + frac
        xs = x - 0.5
        ys = y - 0.5
        x0 = F.floor(xs).cast("long")
        y0 = F.floor(ys).cast("long")
        fx = xs - x0
        fy = ys - y0
        p = (points.withColumn("_x0", x0).withColumn("_y0", y0)
             .withColumn("_fx", fx).withColumn("_fy", fy))
        corners = F.array(
            F.struct(F.lit(0).alias("dx"), F.lit(0).alias("dy")),
            F.struct(F.lit(1).alias("dx"), F.lit(0).alias("dy")),
            F.struct(F.lit(0).alias("dx"), F.lit(1).alias("dy")),
            F.struct(F.lit(1).alias("dx"), F.lit(1).alias("dy")))
        keys = (p.select("*", F.explode(corners).alias("_c"))
                .withColumn("_jx", F.col("_x0") + F.col("_c.dx"))
                .withColumn("_jy", F.col("_y0") + F.col("_c.dy"))
                .withColumn("_w", (F.when(F.col("_c.dx") == 1, F.col("_fx"))
                                   .otherwise(1.0 - F.col("_fx")))
                            * (F.when(F.col("_c.dy") == 1, F.col("_fy"))
                               .otherwise(1.0 - F.col("_fy"))))
                .drop("_c", "_x0", "_y0", "_fx", "_fy"))
    else:
        raise ValueError("mode must be 'near' or 'bilinear'")

    px = pixels.select(F.col("gpx").alias("_jx"), F.col("gpy").alias("_jy"),
                       "value")
    joined = keys.join(px, ["_jx", "_jy"], "left") \
        .withColumn("_v", F.coalesce(F.col("value"), F.lit(fill)) * F.col("_w"))
    return (joined.groupBy("_rid", *out_cols)
            .agg(F.sum("_v").alias(out_col))
            .drop("_rid"))


def tile_pixels(tiles: DataFrame, tile: int = 256,
                band: int = 1) -> DataFrame:
    """Tile table -> (gpx, gpy, value) global sparse pixels — the input
    shape interpolate_at_points expects (gdallocationinfo's lookup path)."""
    from .tiles import gdal2xyz
    rows = gdal2xyz(tiles, tile=tile, band=band)
    return rows.select(F.col("x").cast("long").alias("gpx"),
                       F.col("y").cast("long").alias("gpy"), "value")
