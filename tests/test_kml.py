"""KML round-trip: Placemark geometries (point/line/polygon-with-hole/
multi), name + ExtendedData, namespace handling."""

from __future__ import annotations

import json

import numpy as np

from gdal_spark.core import wkb
from gdal_spark.sources.kml import read_kml, write_kml


def _mk(parts):
    return wkb.encode(wkb.Geom(wkb.MULTIPOINT, parts=[
        wkb.Geom(wkb.POINT, [np.array([[float(x), float(y)]])])
        for x, y in parts]))


def test_roundtrip_all_geometry_kinds(spark, tmp_path):
    poly_hole = wkb.encode(wkb.Geom(wkb.POLYGON, [
        np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0],
                  [0.0, 0.0]]),
        np.array([[2.0, 2.0], [2.0, 4.0], [4.0, 4.0], [2.0, 2.0]])]))
    rows = [
        ("a", wkb.point(5.5, -3.25), json.dumps({"k": "1"})),
        ("b", wkb.linestring([(0.0, 0.0), (2.5, 1.0), (4.0, -1.0)]),
         json.dumps({"k": "2"})),
        ("c", poly_hole, json.dumps({"k": "3", "z": "x y"})),
        ("d", _mk([(1, 2), (3, 4)]), json.dumps({})),
    ]
    df = spark.createDataFrame(rows, ["name", "geom", "props"]) \
        .repartition(2)
    path = str(tmp_path / "layer.kmldir")
    write_kml(df, path)
    out = {r["name"]: r for r in read_kml(spark, path).collect()}
    assert len(out) == 4
    assert wkb.decode(bytes(out["a"].geom)).rings[0][0].tolist() \
        == [5.5, -3.25]
    assert json.loads(out["a"].props) == {"k": "1"}
    g = wkb.decode(bytes(out["b"].geom))
    assert g.gtype == wkb.LINESTRING and len(g.rings[0]) == 3
    gc = wkb.decode(bytes(out["c"].geom))
    assert gc.gtype == wkb.POLYGON and len(gc.rings) == 2
    np.testing.assert_allclose(
        gc.rings[1], [[2, 2], [2, 4], [4, 4], [2, 2]])
    assert json.loads(out["c"].props) == {"k": "3", "z": "x y"}
    gm = wkb.decode(bytes(out["d"].geom))
    assert gm.gtype == wkb.MULTIPOINT and len(gm.parts) == 2
    fids = [r.fid for r in out.values()]
    assert len(set(fids)) == 4


def test_reads_namespaced_external_kml(spark, tmp_path):
    doc = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
 <Placemark><name>ext</name>
  <ExtendedData><Data name="pop"><value>42</value></Data></ExtendedData>
  <Point><coordinates>-71.08,42.36,0</coordinates></Point>
 </Placemark>
</Document></kml>"""
    p = tmp_path / "ext.kml"
    p.write_text(doc)
    rows = read_kml(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0]["name"] == "ext"
    assert json.loads(rows[0].props) == {"pop": "42"}
    g = wkb.decode(bytes(rows[0].geom))
    np.testing.assert_allclose(g.rings[0][0], [-71.08, 42.36])


def test_attribute_columns_become_extended_data(spark, tmp_path):
    df = spark.createDataFrame(
        [(7, "x", wkb.point(1.0, 2.0))], ["doc_id", "tag", "geom"])
    path = str(tmp_path / "attrs.kmldir")
    write_kml(df, path, name_col=None, props_col=None)
    r = read_kml(spark, path).collect()[0]
    assert json.loads(r.props) == {"doc_id": "7", "tag": "x"}
