"""JDBC database source (PostGIS-style) — read-only, pushdown-first.

Re-expresses the reference's PostgreSQL/PostGIS driver front door
(/root/reference/ogr/ogrsf_frmts/pg/ogrpgtablelayer.cpp: attribute and
spatial filters compile into the SQL sent to the server) Spark-first:
the layer maps onto `spark.read.format("jdbc")` with

  * a **dbtable subquery** that projects the geometry through
    ``ST_AsBinary(geom)`` server-side (the reference requests WKB the
    same way) and applies any caller predicate INSIDE the database —
    the moral equivalent of OGR's SetAttributeFilter pushdown;
  * Spark's own JDBC **filter + column pushdown** on top (Catalyst
    pushes WHERE clauses and the column list into the generated SQL —
    `PushedFilters` visible in the scan plan);
  * **partitioned parallel reads** on a numeric column
    (partitionColumn/lowerBound/upperBound/numPartitions), so a
    billion-row table scans as N concurrent range queries — the scale
    analog of the reference's single-cursor read.

No PostGIS server exists in this container; the plan-contract tests run
against the in-container Derby JDBC driver (plain tables, same code
path), and `postgis_layer` stays the documented entry point for real
deployments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_table(spark: SparkSession, url: str, dbtable: str, *,
               driver: str | None = None,
               partition_col: str | None = None,
               bounds: tuple[int, int] | None = None,
               num_partitions: int = 8,
               **options) -> DataFrame:
    """Generic JDBC read with optional range-partitioned parallelism."""
    r = spark.read.format("jdbc").option("url", url) \
        .option("dbtable", dbtable)
    if driver:
        r = r.option("driver", driver)
    if partition_col is not None:
        if bounds is None:
            raise ValueError("partition_col requires bounds=(lo, hi)")
        r = (r.option("partitionColumn", partition_col)
             .option("lowerBound", str(bounds[0]))
             .option("upperBound", str(bounds[1]))
             .option("numPartitions", str(num_partitions)))
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def postgis_layer(spark: SparkSession, url: str, table: str, *,
                  geom_col: str = "geom", fid_col: str = "fid",
                  columns: list[str] | None = None,
                  predicate: str | None = None,
                  num_partitions: int = 8,
                  fid_bounds: tuple[int, int] | None = None,
                  driver: str = "org.postgresql.Driver") -> DataFrame:
    """One PostGIS table/view -> DataFrame(fid, geom WKB, <attrs>).

    The geometry is fetched as WKB via ST_AsBinary server-side and any
    `predicate` is evaluated INSIDE PostGIS (it can use the table's GiST
    index — e.g. ``geom && ST_MakeEnvelope(...)`` for a bbox filter,
    exactly what the reference's SetSpatialFilter compiles to in
    ogrpgtablelayer.cpp). Catalyst pushes further WHERE clauses and
    prunes columns into the wire SQL."""
    collist = "*" if columns is None else ", ".join(
        [fid_col] + [c for c in columns if c not in (fid_col, geom_col)])
    where = f" WHERE {predicate}" if predicate else ""
    sub = (f"(SELECT {collist}, ST_AsBinary({geom_col}) AS {geom_col} "
           f"FROM {table}{where}) AS gdal_spark_sub")
    return jdbc_table(
        spark, url, sub, driver=driver,
        partition_col=fid_col if fid_bounds else None,
        bounds=fid_bounds, num_partitions=num_partitions)
