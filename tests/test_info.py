"""ogrinfo/gdalinfo twins: type promotion, null geometry counting,
extent aggregation, band dimensioning."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.core import wkb
from gdal_spark.operators.info import layer_info, raster_info


def test_layer_info_mixed_types_and_nulls(spark):
    rows = [
        (0, wkb.box(0.0, 0.0, 2.0, 2.0)),
        (1, wkb.point(5.0, -3.0)),
        (2, None),
        (3, wkb.linestring([(-1.0, 4.0), (7.0, 4.0)])),
    ]
    out = layer_info(
        spark.createDataFrame(rows, ["fid", "geom"]).repartition(3),
        name="mixed").collect()[0]
    assert out.layer == "mixed"
    assert out.feature_count == 4 and out.n_null_geom == 1
    assert out.geom_type == "GEOMETRY"
    assert (out.minx, out.miny, out.maxx, out.maxy) == (-1.0, -3.0, 7.0, 4.0)
    assert out.fields == "fid: bigint"


def test_layer_info_single_type_promotes_to_it(spark):
    rows = [(i, wkb.point(float(i), float(-i))) for i in range(10)]
    out = layer_info(spark.createDataFrame(rows, ["fid", "geom"])).collect()[0]
    assert out.geom_type == "POINT"
    assert out.feature_count == 10 and out.n_null_geom == 0
    assert (out.minx, out.maxx) == (0.0, 9.0)
    assert (out.miny, out.maxy) == (-9.0, 0.0)


def test_raster_info_dimensions_and_stats(spark):
    from gdal_spark.raster.tiles import raster_to_tiles
    arr = np.arange(256, dtype=np.float64).reshape(16, 16)
    t = raster_to_tiles(spark, arr, tile=8)
    out = raster_info(t, tile=8).collect()[0]
    assert (out.width, out.height, out.n_tiles) == (16, 16, 4)
    assert out.dtype == "float64" and out.n_valid == 256
    assert (out.min, out.max) == (0.0, 255.0)
    assert out.mean == pytest.approx(127.5)
    assert out.stddev == pytest.approx(np.std(arr))


def test_geocoder_forward_reverse(spark):
    """Offline gazetteer geocode: case-insensitive forward, nearest-entry
    reverse, NULL for unknown names."""
    from gdal_spark.operators.geocode import register_geocoder
    gaz = spark.createDataFrame(
        [("Paris", 2.35, 48.85), ("Lima", -77.04, -12.05),
         ("Oslo", 10.75, 59.91)], ["name", "lon", "lat"])
    register_geocoder(spark, gaz)
    r = spark.sql("""
        SELECT ogr_geocode_x('paris') x, ogr_geocode_y('PARIS') y,
               ogr_geocode_x('atlantis') miss,
               ogr_geocode_reverse(10.0, 58.0) near_oslo,
               ogr_geocode_reverse(-70.0, -10.0) near_lima
    """).collect()[0]
    assert (r.x, r.y) == (2.35, 48.85)
    assert r.miss is None
    assert r.near_oslo == "Oslo" and r.near_lima == "Lima"


def test_ogrmerge_schema_harmonize_and_tindex_bbox(spark, tmp_path):
    """ogrmerge unions mismatched schemas null-filled; ogrtindex emits a
    closed bbox ring per source (apps/ogrmerge.py, apps/ogrtindex.cpp)."""
    import numpy as np

    from gdal_spark.core import wkb as W
    from gdal_spark.operators.ogrutils import ogrmerge, ogrtindex
    from gdal_spark.sources.csv_wkt import write_csv_wkt

    a = spark.createDataFrame(
        [(1, W.encode(W.Geom(W.POINT, [np.array([[0.0, 0.0]])])), "x")],
        "fid long, geom binary, name string")
    b = spark.createDataFrame(
        [(2, W.encode(W.Geom(W.POINT, [np.array([[10.0, 5.0]])])), 7.5)],
        "fid long, geom binary, score double")
    pa, pb = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
    write_csv_wkt(a, pa)
    write_csv_wkt(b, pb)
    m = ogrmerge(spark, [pa, pb]).collect()
    assert len(m) == 2
    rows = {r.fid: r for r in m}
    assert rows[1].name == "x" and rows[1].score is None
    assert rows[2].score == 7.5 and rows[2].name is None
    assert rows[1].source_ds.endswith("a.csv")

    idx = {r.LOCATION.split("/")[-1]: r
           for r in ogrtindex(spark, [pa, pb]).collect()}
    g = W.decode(bytes(idx["b.csv"].geom))
    assert idx["b.csv"].minx == 10.0 and idx["b.csv"].maxy == 5.0
    assert len(g.rings[0]) == 5 and np.array_equal(g.rings[0][0],
                                                   g.rings[0][-1])
