"""ogrmerge / ogrtindex utility twins.

References: /root/reference/apps/ogrmerge.py (merge N vector datasets
into one, -single mode adds a source-dataset field) and
/root/reference/apps/ogrtindex.cpp (tile index: one feature per source
layer carrying its extent polygon and a location attribute — MapServer's
TILEINDEX contract).

Both are pure plan composition: Open() every input through its
registered distributed reader, then unionByName / per-file envelope
aggregation. No driver loops over features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ogrmerge(spark: SparkSession, paths, single: bool = True,
             src_field: str = "source_ds") -> DataFrame:
    """apps/ogrmerge.py -single twin: every input dataset's layer,
    schema-harmonized (missing columns null-filled) and tagged with its
    source path. Lazy — nothing reads until the result is acted on."""
    from ..sources import open_vector

    out = None
    for p in paths:
        df = open_vector(spark, p).withColumn(src_field, F.lit(p))
        out = df if out is None else out.unionByName(
            df, allowMissingColumns=True)
    if out is None:
        raise ValueError("ogrmerge needs at least one input")
    if not single:
        return out      # multi-layer mode: caller splits by src_field
    return out


def ogrtindex(spark: SparkSession, paths,
              location_field: str = "LOCATION") -> DataFrame:
    """apps/ogrtindex.cpp twin: (LOCATION, minx, miny, maxx, maxy,
    geom bbox-polygon WKB) — one row per input dataset, each extent
    computed by a distributed envelope aggregation over that dataset's
    own reader (the reference scans every feature sequentially for the
    same numbers)."""
    import numpy as np
    import pandas as pd

    from ..core import wkb as W
    from ..sources import open_vector

    @F.pandas_udf("double")
    def _minx(geom):
        from ..core.geomops import envelopes
        return pd.Series(envelopes(list(geom))[:, 0])

    @F.pandas_udf("double")
    def _miny(geom):
        from ..core.geomops import envelopes
        return pd.Series(envelopes(list(geom))[:, 1])

    @F.pandas_udf("double")
    def _maxx(geom):
        from ..core.geomops import envelopes
        return pd.Series(envelopes(list(geom))[:, 2])

    @F.pandas_udf("double")
    def _maxy(geom):
        from ..core.geomops import envelopes
        return pd.Series(envelopes(list(geom))[:, 3])

    parts = []
    for p in paths:
        df = open_vector(spark, p)
        parts.append(df.select(
            F.lit(p).alias(location_field),
            _minx("geom").alias("x0"), _miny("geom").alias("y0"),
            _maxx("geom").alias("x1"), _maxy("geom").alias("y1")))
    allp = parts[0]
    for q in parts[1:]:
        allp = allp.unionByName(q)
    ext = allp.groupBy(location_field).agg(
        F.min("x0").alias("minx"), F.min("y0").alias("miny"),
        F.max("x1").alias("maxx"), F.max("y1").alias("maxy"))

    @F.pandas_udf("binary")
    def _bbox(minx, miny, maxx, maxy):
        out = []
        for a, b, c, d in zip(minx, miny, maxx, maxy):
            ring = np.array([[a, b], [c, b], [c, d], [a, d], [a, b]],
                            np.float64)
            out.append(W.encode(W.Geom(W.POLYGON, [ring])))
        return pd.Series(out)

    return ext.select(location_field, "minx", "miny", "maxx", "maxy",
                      _bbox("minx", "miny", "maxx", "maxy").alias("geom"))
