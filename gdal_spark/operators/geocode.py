"""ogr_geocode / ogr_geocode_reverse twins (ogrsqlitesqlfunctions.cpp
ogr_geocode registration; ogr/ogrgeocoding.cpp OGRGeocode /
OGRGeocodeReverse).

The reference calls a network service (Nominatim et al.) and caches
results in a local table; a Spark pipeline can't block a 1000-executor
stage on a rate-limited HTTP API, so the engine inverts the design: the
gazetteer IS a table, shipped to every worker once (driver collect of a
small dim + task-closure broadcast), and both directions are pure
vectorized lookups — forward by case-insensitive name (the service's
top-hit contract), reverse by nearest entry (squared-euclidean argmin,
one numpy matrix op per batch). Deterministic, offline, and exactly the
cached-table semantics the reference persists after its first call."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType


def make_geocoder(gazetteer: DataFrame, name_col: str = "name",
                  lon_col: str = "lon", lat_col: str = "lat"):
    """-> (geocode_x, geocode_y, geocode_reverse) pandas UDFs bound to
    the gazetteer. Unknown names -> NULL (the service's no-result)."""
    rows = gazetteer.select(name_col, lon_col, lat_col).collect()
    names = [str(r[0]) for r in rows]
    table = {n.lower(): (float(r[1]), float(r[2]))
             for n, r in zip(names, rows)}
    pts = np.array([[float(r[1]), float(r[2])] for r in rows],
                   dtype=np.float64)

    def _lookup(series: pd.Series, idx: int) -> pd.Series:
        return pd.Series(
            [table.get(str(n).lower(), (None, None))[idx]
             if n is not None else None for n in series],
            dtype="object").astype("float64")

    @pandas_udf(DoubleType())
    def geocode_x(name: pd.Series) -> pd.Series:
        return _lookup(name, 0)

    @pandas_udf(DoubleType())
    def geocode_y(name: pd.Series) -> pd.Series:
        return _lookup(name, 1)

    @pandas_udf(StringType())
    def geocode_reverse(lon: pd.Series, lat: pd.Series) -> pd.Series:
        q = np.column_stack([lon.to_numpy(np.float64),
                             lat.to_numpy(np.float64)])
        # (batch, gazetteer) squared distances in one matrix op
        d2 = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
        best = d2.argmin(axis=1)
        out = [names[i] for i in best]
        return pd.Series(out, dtype="object").where(
            ~(np.isnan(q).any(axis=1)), None)

    return geocode_x, geocode_y, geocode_reverse


def register_geocoder(spark, gazetteer: DataFrame, **kwargs) -> None:
    """Register ogr_geocode_x/ogr_geocode_y/ogr_geocode_reverse for
    spark.sql — the SQLITE-dialect surface bound to a gazetteer table."""
    gx, gy, rev = make_geocoder(gazetteer, **kwargs)
    spark.udf.register("ogr_geocode_x", gx)
    spark.udf.register("ogr_geocode_y", gy)
    spark.udf.register("ogr_geocode_reverse", rev)
