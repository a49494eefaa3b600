"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship point-in-polygon spatial join at sf0.001.
queries()    — every implemented operator (SURVEY.md §2) as (spark, sf_dir) -> DF.
oracle_sql() — DuckDB-equivalent SQL for EVERY query (round 3: all 91
               entries fully value-hash oracled — zero rows-only checks;
               even the approximate LSH top-k is SQL-expressible because
               its in-bucket brute-force re-rank is deterministic).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: pages x admin-grid
    point-in-polygon join (cell-cover prefilter -> broadcast cell join ->
    exact ray-cast PIP pandas UDF), counts per region."""
    from gdal_spark.queries import Q
    return Q["pip_grid"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gdal_spark.queries import Q
    return dict(Q)


def oracle_sql() -> dict[str, str]:
    from gdal_spark.queries import ORACLE
    return dict(ORACLE)
