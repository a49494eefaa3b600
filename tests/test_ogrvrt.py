"""OGR VRT virtual vector layers: field remap/retype, WKT geometry,
union layers, lazy-plan contract."""

import json

import pytest
from pyspark.sql import functions as F

from gdal_spark.sources.ogrvrt import read_ogrvrt


@pytest.fixture(scope="module")
def src_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("vrt") / "pts.parquet")
    spark.createDataFrame(
        [(1, 10.0, 20.0, "POINT (1 2)", "a"),
         (2, 30.0, 40.0, "POINT (3 4)", "b")],
        "id long, cx double, cy double, wkt string, tag string") \
        .write.parquet(p)
    return p


def test_point_from_columns_and_retype(spark, src_parquet):
    xml = f"""<OGRVRTDataSource>
  <OGRVRTLayer name="l">
    <SrcDataSource>{src_parquet}</SrcDataSource>
    <GeometryField encoding="PointFromColumns" x="cx" y="cy"/>
    <Field name="fid" src="id" type="Integer"/>
    <Field name="tag"/>
  </OGRVRTLayer>
</OGRVRTDataSource>"""
    df = read_ogrvrt(spark, xml)
    assert [f.name for f in df.schema.fields] == ["geom", "fid", "tag"]
    assert dict(df.dtypes)["fid"] == "int"
    from gdal_spark.core import wkb
    rows = {r.fid: wkb.decode(bytes(r.geom)).points()[0]
            for r in df.collect()}
    assert tuple(rows[1]) == (10.0, 20.0)


def test_wkt_geometry_field(spark, src_parquet):
    xml = f"""<OGRVRTDataSource>
  <OGRVRTLayer name="l">
    <SrcDataSource>{src_parquet}</SrcDataSource>
    <GeometryField encoding="WKT" field="wkt"/>
  </OGRVRTLayer>
</OGRVRTDataSource>"""
    df = read_ogrvrt(spark, xml)
    from gdal_spark.core import wkb
    pts = sorted(tuple(wkb.decode(bytes(r.geom)).points()[0])
                 for r in df.select("geom").collect())
    assert pts == [(1.0, 2.0), (3.0, 4.0)]


def test_union_layer_missing_columns(spark, src_parquet):
    xml = f"""<OGRVRTDataSource>
  <OGRVRTUnionLayer name="u">
    <OGRVRTLayer name="a">
      <SrcDataSource>{src_parquet}</SrcDataSource>
      <Field name="fid" src="id" type="Integer64"/>
      <Field name="tag"/>
    </OGRVRTLayer>
    <OGRVRTLayer name="b">
      <SrcDataSource>{src_parquet}</SrcDataSource>
      <Field name="fid" src="id" type="Integer64"/>
    </OGRVRTLayer>
  </OGRVRTUnionLayer>
</OGRVRTDataSource>"""
    df = read_ogrvrt(spark, xml)
    assert df.count() == 4
    # second member lacks tag -> nulls
    assert df.where(F.col("tag").isNull()).count() == 2


def test_lazy_plan_prunes_to_scan(spark, src_parquet):
    xml = f"""<OGRVRTDataSource>
  <OGRVRTLayer name="l">
    <SrcDataSource>{src_parquet}</SrcDataSource>
    <Field name="fid" src="id" type="Integer64"/>
    <Field name="tag"/>
  </OGRVRTLayer>
</OGRVRTDataSource>"""
    df = read_ogrvrt(spark, xml).where(F.col("fid") == 1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the filter must reach the parquet scan as a pushed filter
    assert "PushedFilters: [IsNotNull(id), EqualTo(id,1)]" in plan \
        or "PushedFilters: [IsNotNull(id), EqualTo(id,1)" in plan
