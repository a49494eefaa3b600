"""ogrinfo / gdalinfo twins — the reference's report apps as one-row
DataFrames (apps/ogrinfo_lib.cpp ReportOnLayer: feature count, extent,
geometry type, field list; apps/gdalinfo_lib.cpp: size, per-band
statistics/nodata/type).

Spark-first: everything data-dependent (count, extent, type promotion,
band stats) is a single mapInPandas partial pass + one tiny combine —
the driver never sees geometry bytes, only per-partition summaries.
Schema-derived parts (field list) come from DataFrame metadata, which is
already driver-side and free."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LAYER_PART = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("n_null_geom", T.LongType()),
    T.StructField("types", T.StringType()),
    T.StructField("minx", T.DoubleType()),
    T.StructField("miny", T.DoubleType()),
    T.StructField("maxx", T.DoubleType()),
    T.StructField("maxy", T.DoubleType()),
])


def layer_info(df: DataFrame, geom_col: str = "geom",
               name: str = "layer") -> DataFrame:
    """ogrinfo -so twin: one row with feature count, promoted geometry
    type (mixed layers report GEOMETRY, the reference's wkbUnknown
    rendering), null-geometry count, extent, and the field list as
    `name: Type` pairs (ogrinfo_lib.cpp ReportOnLayer order)."""
    from ..core import geomops, wkb as wkblib

    fields = ", ".join(f"{f.name}: {f.dataType.simpleString()}"
                       for f in df.schema.fields if f.name != geom_col)

    def partials(batches):
        import numpy as np
        n = nnull = 0
        types: set[str] = set()
        env = [np.inf, np.inf, -np.inf, -np.inf]
        for pdf in batches:
            col = pdf[geom_col]
            n += len(pdf)
            valid = [bytes(b) for b in col if b is not None]
            nnull += len(pdf) - len(valid)
            if not valid:
                continue
            envs = geomops.envelopes(valid)
            with np.errstate(invalid="ignore"):
                env[0] = min(env[0], np.nanmin(envs[:, 0]))
                env[1] = min(env[1], np.nanmin(envs[:, 1]))
                env[2] = max(env[2], np.nanmax(envs[:, 2]))
                env[3] = max(env[3], np.nanmax(envs[:, 3]))
            for b in valid:
                types.add(wkblib.TYPE_NAMES.get(
                    wkblib.decode(b).gtype, "GEOMETRY"))
        yield pd.DataFrame([(n, nnull, ",".join(sorted(types)),
                             env[0], env[1], env[2], env[3])],
                           columns=[f.name for f in _LAYER_PART.fields])

    p = df.mapInPandas(partials, _LAYER_PART)
    agg = p.agg(F.sum("n").alias("feature_count"),
                F.sum("n_null_geom").alias("n_null_geom"),
                F.array_sort(F.array_distinct(F.flatten(F.collect_list(
                    F.split("types", ","))))).alias("_types"),
                F.min("minx").alias("minx"), F.min("miny").alias("miny"),
                F.max("maxx").alias("maxx"), F.max("maxy").alias("maxy"))
    tset = F.array_remove(F.col("_types"), "")
    geom_type = F.when(F.size(tset) == 1, F.element_at(tset, 1)) \
        .when(F.size(tset) == 0, F.lit("NONE")).otherwise(F.lit("GEOMETRY"))
    return agg.select(F.lit(name).alias("layer"),
                      "feature_count", "n_null_geom",
                      geom_type.alias("geom_type"),
                      "minx", "miny", "maxx", "maxy",
                      F.lit(fields).alias("fields"))


def raster_info(tiles_df: DataFrame, tile: int = 256) -> DataFrame:
    """gdalinfo twin: one row per band — pixel size from the tile extent
    (gdalinfo_lib.cpp "Size is W, H"), dtype/nodata, and the exact
    ComputeStatistics numbers (min/max/mean/stddev)."""
    from ..raster.stats import band_statistics

    dims = tiles_df.groupBy("band").agg(
        ((F.max("tile_x") + 1) * tile).alias("width"),
        ((F.max("tile_y") + 1) * tile).alias("height"),
        F.count("*").alias("n_tiles"),
        F.first("dtype").alias("dtype"),
        F.first("nodata").alias("nodata"))
    stats = band_statistics(tiles_df, tile=tile)
    return dims.join(stats, "band", "left").select(
        "band", "width", "height", "n_tiles", "dtype", "nodata",
        "n_valid", "min", "max", "mean", "stddev")
