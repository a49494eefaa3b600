"""GML round-trip: featureMember parse, posList/pos/GML2-coordinates,
polygon interiors, attribute properties, gml:id fids."""

from __future__ import annotations

import json

import numpy as np

from gdal_spark.core import wkb
from gdal_spark.sources.gml import read_gml, write_gml


def test_roundtrip_geometries_and_props(spark, tmp_path):
    poly = wkb.encode(wkb.Geom(wkb.POLYGON, [
        np.array([[0.0, 0.0], [8.0, 0.0], [8.0, 8.0], [0.0, 0.0]]),
        np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 1.0]])]))
    mp = wkb.encode(wkb.Geom(wkb.MULTIPOINT, parts=[
        wkb.Geom(wkb.POINT, [np.array([[1.5, 2.5]])]),
        wkb.Geom(wkb.POINT, [np.array([[-3.0, 4.0]])])]))
    rows = [
        (10, wkb.point(5.0, -1.25), json.dumps({"name": "a", "pop": "3"})),
        (11, wkb.linestring([(0.0, 0.0), (1.0, 2.0)]),
         json.dumps({"name": "b"})),
        (12, poly, json.dumps({"name": "c"})),
        (13, mp, json.dumps({"name": "d"})),
    ]
    df = spark.createDataFrame(rows, ["fid", "geom", "props"]).repartition(2)
    path = str(tmp_path / "layer.gmldir")
    write_gml(df, path)
    out = {json.loads(r.props)["name"]: r
           for r in read_gml(spark, path).collect()}
    assert len(out) == 4
    assert out["a"].fid == 10 and json.loads(out["a"].props)["pop"] == "3"
    np.testing.assert_allclose(
        wkb.decode(bytes(out["a"].geom)).rings[0], [[5.0, -1.25]])
    g = wkb.decode(bytes(out["c"].geom))
    assert g.gtype == wkb.POLYGON and len(g.rings) == 2
    np.testing.assert_allclose(g.rings[1],
                               [[1, 1], [2, 1], [2, 2], [1, 1]])
    gm = wkb.decode(bytes(out["d"].geom))
    assert len(gm.parts) == 2


def test_reads_external_gml2_coordinates(spark, tmp_path):
    doc = """<?xml version="1.0"?>
<ogr:FeatureCollection xmlns:ogr="http://ogr.maptools.org/"
    xmlns:gml="http://www.opengis.net/gml">
 <gml:featureMember>
  <ogr:poly fid="7">
   <ogr:AREA>215229.266</ogr:AREA>
   <ogr:geometryProperty><gml:Polygon><gml:outerBoundaryIs>
     <gml:LinearRing><gml:coordinates>0,0 4,0 4,3 0,0</gml:coordinates>
     </gml:LinearRing></gml:outerBoundaryIs></gml:Polygon>
   </ogr:geometryProperty>
  </ogr:poly>
 </gml:featureMember>
</ogr:FeatureCollection>"""
    p = tmp_path / "gml2.gml"
    p.write_text(doc)
    rows = read_gml(spark, str(p)).collect()
    assert len(rows) == 1
    assert json.loads(rows[0].props) == {"AREA": "215229.266"}
    g = wkb.decode(bytes(rows[0].geom))
    assert g.gtype == wkb.POLYGON
    np.testing.assert_allclose(g.rings[0], [[0, 0], [4, 0], [4, 3], [0, 0]])


def test_gml2_fid_attribute_parses(spark, tmp_path):
    doc = """<?xml version="1.0"?>
<ogr:FeatureCollection xmlns:ogr="http://ogr.maptools.org/"
    xmlns:gml="http://www.opengis.net/gml">
 <gml:featureMember><ogr:t fid="t.42"><ogr:v>1</ogr:v>
  <ogr:geometryProperty><gml:Point><gml:coordinates>2,3
  </gml:coordinates></gml:Point></ogr:geometryProperty>
 </ogr:t></gml:featureMember>
</ogr:FeatureCollection>"""
    p = tmp_path / "fid.gml"
    p.write_text(doc)
    r = read_gml(spark, str(p)).collect()[0]
    assert r.fid == 42
