"""CSV with a WKT geometry column (ogr/ogrsf_frmts/csv/ driver parity:
GEOMETRY=AS_WKT). Attribute columns come from Spark's CSV reader (header +
schema inference, exactly the driver's field-type scan); the WKT column
converts to the engine's WKB representation in one Arrow batch pass."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, StringType

from ..core import wkb


@pandas_udf(BinaryType())
def _wkt_to_wkb(s: pd.Series) -> pd.Series:
    return pd.Series([wkb.from_wkt(v) if v is not None else None
                      for v in s], dtype="object")


@pandas_udf(StringType())
def _wkb_to_wkt(b: pd.Series) -> pd.Series:
    return pd.Series([wkb.to_wkt(bytes(v)) if v is not None else None
                      for v in b], dtype="object")


def read_csv_wkt(spark: SparkSession, path: str,
                 wkt_col: str = "WKT") -> DataFrame:
    df = spark.read.csv(path, header=True, inferSchema=True)
    return df.withColumn("geom", _wkt_to_wkb(F.col(wkt_col))) \
        .drop(wkt_col)


def write_csv_wkt(df: DataFrame, path: str, geom_col: str = "geom",
                  wkt_col: str = "WKT") -> None:
    out = df.withColumn(wkt_col, _wkb_to_wkt(F.col(geom_col))) \
        .drop(geom_col)
    out.write.mode("overwrite").option("header", True).csv(path)
