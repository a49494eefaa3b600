"""Source formats: GeoJSON (FeatureCollection + newline-delimited) and
CSV/WKT — round trips must preserve geometry exactly (WKB-equal after the
engine's canonical little-endian re-encoding)."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from gdal_spark.core import geomops, wkb
from gdal_spark.sources import (read_csv_wkt, read_geojson,
                                read_geojson_seq, write_csv_wkt,
                                write_geojson_seq)
from gdal_spark.sources.geojson import geom_from_geojson, geom_to_geojson

GEOMS = {
    "pt": wkb.point(3.5, -2.25),
    "ls": wkb.linestring([(0, 0), (5, 5), (10, 0)]),
    "poly": wkb.polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                        holes=[[(2, 2), (4, 2), (4, 4), (2, 4)]]),
    "mpoly": wkb.multipolygon([[[(0, 0), (4, 0), (4, 4), (0, 4)]],
                               [[(10, 0), (14, 0), (14, 4), (10, 4)]]]),
}


@pytest.mark.parametrize("name", sorted(GEOMS))
def test_geojson_geometry_roundtrip(name):
    b = GEOMS[name]
    d = geom_to_geojson(b)
    back = geom_from_geojson(json.loads(json.dumps(d)))
    assert back == b


def test_geojson_seq_roundtrip(spark, tmp_path):
    schema = T.StructType([T.StructField("fid", T.LongType()),
                           T.StructField("geom", T.BinaryType()),
                           T.StructField("props", T.StringType())])
    rows = [(i, g, json.dumps({"name": n}))
            for i, (n, g) in enumerate(sorted(GEOMS.items()))]
    df = spark.createDataFrame(pd.DataFrame(rows,
                                            columns=["fid", "geom",
                                                     "props"]),
                               schema=schema)
    path = str(tmp_path / "seq")
    write_geojson_seq(df, path)
    back = read_geojson_seq(spark, path)
    got = {json.loads(r.props)["name"]: bytes(r.geom)
           for r in back.collect()}
    assert got == {n: g for n, g in GEOMS.items()}


def test_geojson_featurecollection_read(spark, tmp_path):
    feats = [{"type": "Feature", "id": 7,
              "geometry": geom_to_geojson(GEOMS["poly"]),
              "properties": {"kind": "holed"}},
             {"type": "Feature",
              "geometry": geom_to_geojson(GEOMS["pt"]),
              "properties": {"kind": "pt"}}]
    fc = {"type": "FeatureCollection", "features": feats}
    p = tmp_path / "fc.geojson"
    p.write_text(json.dumps(fc))
    df = read_geojson(spark, str(p))
    rows = {json.loads(r.props)["kind"]: (r.fid, bytes(r.geom))
            for r in df.collect()}
    assert rows["holed"][0] == 7                 # feature id preserved
    assert rows["holed"][1] == GEOMS["poly"]
    assert rows["pt"][1] == GEOMS["pt"]
    # geometry survives an area computation
    g = wkb.decode(rows["holed"][1])
    assert geomops.geom_area(g) == pytest.approx(100 - 4)


def test_csv_wkt_roundtrip(spark, tmp_path):
    schema = T.StructType([T.StructField("rid", T.LongType()),
                           T.StructField("label", T.StringType()),
                           T.StructField("geom", T.BinaryType())])
    rows = [(1, "a", GEOMS["poly"]), (2, "b", GEOMS["pt"])]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["rid", "label",
                                                           "geom"]),
                               schema=schema)
    path = str(tmp_path / "csv")
    write_csv_wkt(df, path)
    back = read_csv_wkt(spark, path)
    got = {r.rid: (r.label, bytes(r.geom)) for r in back.collect()}
    assert got[1][0] == "a"
    # WKT is a decimal text round trip — geometry equal to float precision
    a = wkb.decode(got[1][1])
    assert geomops.geom_equals(a, wkb.decode(GEOMS["poly"]))
    assert geomops.geom_equals(wkb.decode(got[2][1]),
                               wkb.decode(GEOMS["pt"]))


def test_open_vector_dispatch(spark, tmp_path):
    """The Open() front door routes by extension to every registered
    driver (ogrsfdriverregistrar.cpp semantics)."""
    import numpy as np
    from gdal_spark.core import wkb
    from gdal_spark.sources import open_vector, open_raster
    from gdal_spark.sources.shapefile import write_shapefile
    from gdal_spark.sources.flatgeobuf import write_fgb
    from gdal_spark.sources.gpkg import write_gpkg
    from gdal_spark.sources.geotiff import write_gtiff

    rows = [(wkb.encode(wkb.Geom(wkb.POINT, [np.array([[1.0 * i, 2.0]])])),
             {"k": i}) for i in range(5)]
    write_shapefile(rows, str(tmp_path / "v"))
    write_fgb(rows, str(tmp_path / "v.fgb"))
    write_gpkg(rows, str(tmp_path / "v.gpkg"))
    assert open_vector(spark, str(tmp_path / "v.shp")).count() == 5
    assert open_vector(spark, str(tmp_path / "v.fgb")).count() == 5
    assert open_vector(spark, str(tmp_path / "v.gpkg")).count() == 5
    write_gtiff(np.zeros((8, 8), np.uint8), str(tmp_path / "r.tif"))
    assert open_raster(spark, str(tmp_path / "r.tif"), tile=8).count() == 1
    import pytest as _pt
    with _pt.raises(ValueError):
        open_vector(spark, "x.unknown")


def test_canonical_url_rules(spark):
    """RFC 3986 safe normalizations: case, default ports, fragment,
    trailing slash, query order — and the things that must NOT change
    (path case, non-default ports, '/' vs empty path handling)."""
    from pyspark.sql import functions as F

    from gdal_spark.operators.urlops import canonical_url_col

    cases = [
        ("HTTPS://Example.COM/A/b", "https://example.com/A/b"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("http://example.com:80/x", "http://example.com/x"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        ("https://example.com/x/", "https://example.com/x"),
        ("https://example.com/x#frag", "https://example.com/x"),
        ("https://example.com/x?b=2&a=1", "https://example.com/x?a=1&b=2"),
        ("https://example.com/x?a=1#f", "https://example.com/x?a=1"),
        ("https://example.com/", "https://example.com"),
        ("https://example.com:443/", "https://example.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r.c for r in
           df.select(canonical_url_col(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_vsizip_shapefile_and_geojsonl(spark, tmp_path):
    """/vsizip/ twin: zipped shapefile (with sidecars) and zipped
    GeoJSONSeq open through the same front door."""
    import zipfile

    import numpy as np

    from gdal_spark.core import wkb
    from gdal_spark.sources import open_vector
    from gdal_spark.sources.shapefile import write_shapefile

    rows = [(wkb.encode(wkb.Geom(wkb.POINT,
                                 [np.array([[float(i), float(-i)]])])),
             {"doc_id": i}) for i in range(5)]
    base = str(tmp_path / "pts")
    write_shapefile(rows, base)
    zp = str(tmp_path / "arc.zip")
    with zipfile.ZipFile(zp, "w") as z:
        for ext in (".shp", ".shx", ".dbf"):
            z.write(base + ext, "pts" + ext)

    for spec in (f"/vsizip/{zp}/pts.shp", f"{zp}!pts.shp", zp):
        df = open_vector(spark, spec)
        got = sorted(r.doc_id for r in df.collect())
        assert got == [0, 1, 2, 3, 4], spec

    gj = "\n".join('{"type":"Feature","id":%d,"geometry":{"type":"Point",'
                   '"coordinates":[%d,1]},"properties":{}}' % (i, i)
                   for i in range(3))
    (tmp_path / "f.geojsonl").write_text(gj)
    zp2 = str(tmp_path / "gj.zip")
    with zipfile.ZipFile(zp2, "w") as z:
        z.write(str(tmp_path / "f.geojsonl"), "f.geojsonl")
    df = open_vector(spark, f"/vsizip/{zp2}/f.geojsonl")
    assert df.count() == 3


def test_jsonfg_roundtrip_place_and_time(spark, tmp_path):
    """JSON-FG (OGC 21-045; ogr/ogrsf_frmts/jsonfg): place/coordRefSys,
    time instants and intervals, fid preservation."""
    import json

    import numpy as np

    from gdal_spark.core import wkb as W
    from gdal_spark.sources.jsonfg import read_jsonfg, write_jsonfg

    pts = [(i, W.encode(W.Geom(W.POINT,
                               [np.array([[i * 10.0, -i * 5.0]])])),
            f"2024-01-0{i + 1}", f"2024-02-0{i + 1}",
            json.dumps({"name": f"f{i}"}))
           for i in range(4)]
    df = spark.createDataFrame(
        pts, "fid long, geom binary, t0 string, t1 string, props string")
    out = str(tmp_path / "fg")
    write_jsonfg(df, out, crs="[EPSG:3857]", time_cols=("t0", "t1"))
    import glob
    lines = []
    for p in sorted(glob.glob(out + "/part-*")):
        with open(p) as f:
            lines += [json.loads(ln) for ln in f if ln.strip()]
    assert all(ft["geometry"] is None for ft in lines)
    assert all(ft["place"]["coordRefSys"] == "[EPSG:3857]" for ft in lines)
    assert all(ft["time"]["interval"][0].startswith("2024-01")
               for ft in lines)

    back = read_jsonfg(spark, out + "/part-*").collect()
    assert len(back) == 4
    by = {r.fid: r for r in back}
    for i in range(4):
        g = W.decode(bytes(by[i].geom))
        assert g.rings[0][0][0] == i * 10.0
        assert by[i].coord_ref_sys == "[EPSG:3857]"
        assert by[i].time_start == f"2024-01-0{i + 1}"
        assert by[i].time_end == f"2024-02-0{i + 1}"
        assert by[i].geom_wgs84 is None

    # instant flavor + FeatureCollection document read
    doc = {"type": "FeatureCollection", "conformsTo": ["[ogc-json-fg-1]"],
           "features": [{"type": "Feature", "id": 7,
                         "geometry": {"type": "Point",
                                      "coordinates": [1.0, 2.0]},
                         "time": {"date": "2020-05-05"},
                         "properties": {"a": 1}}]}
    p2 = tmp_path / "doc.json"
    p2.write_text(json.dumps(doc))
    r = read_jsonfg(spark, str(p2)).collect()[0]
    assert r.fid == 7 and r.time_start == "2020-05-05" == r.time_end
    assert W.decode(bytes(r.geom)).rings[0][0][1] == 2.0
