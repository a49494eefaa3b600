"""GPX source/sink (ogr/ogrsf_frmts/gpx: waypoints/routes/tracks)."""

import numpy as np

from gdal_spark.core import wkb
from gdal_spark.sources.gpx import read_gpx, write_gpx


def test_gpx_roundtrip_three_layers(spark, tmp_path):
    out = str(tmp_path / "gpx")
    track = wkb.encode(wkb.Geom(wkb.MULTILINESTRING, parts=[
        wkb.Geom(wkb.LINESTRING,
                 [np.array([[0.0, 0.0], [1.0, 1.0]])]),
        wkb.Geom(wkb.LINESTRING,
                 [np.array([[2.0, 2.0], [3.0, 2.5], [4.0, 3.0]])])]))
    rows = [
        (wkb.point(11.25, 48.12), "summit", 1234.5),
        (wkb.linestring(np.array([[0.0, 0.0], [0.5, 0.25], [1.0, 1.0]])),
         "route-a", None),
        (track, "trk-1", None),
    ]
    df = spark.createDataFrame(rows, "geom binary, name string, ele double")
    write_gpx(df.repartition(1), out)

    back = {r.layer: r for r in read_gpx(spark, out).collect()}
    assert set(back) == {"waypoints", "routes", "tracks"}
    w = back["waypoints"]
    assert w.name == "summit" and w.ele == 1234.5
    g = wkb.decode(bytes(w.geom))
    assert g.gtype == wkb.POINT
    np.testing.assert_allclose(g.rings[0][0], [11.25, 48.12])
    r = wkb.decode(bytes(back["routes"].geom))
    assert r.gtype == wkb.LINESTRING and len(r.rings[0]) == 3
    t = wkb.decode(bytes(back["tracks"].geom))
    assert t.gtype == wkb.MULTILINESTRING and len(t.parts) == 2
    assert len(t.parts[1].rings[0]) == 3


def test_gpx_reference_fixture_semantics(spark, tmp_path):
    # mirrors autotest/ogr/ogr_gpx.py expectations: lat/lon attributes,
    # ele/name/cmt children, namespace tolerated
    doc = """<?xml version="1.0"?>
<gpx version="1.1" creator="t" xmlns="http://www.topografix.com/GPX/1/1">
 <wpt lat="1.5" lon="2.5"><ele>3.5</ele><name>p1</name><cmt>hi</cmt></wpt>
 <wpt lat="-10.0" lon="20.0"><name>p2</name></wpt>
 <rte><name>r</name>
  <rtept lat="0" lon="0"/><rtept lat="1" lon="1"/><rtept lat="1" lon="2"/>
 </rte>
</gpx>"""
    p = tmp_path / "fix.gpx"
    p.write_text(doc)
    rows = read_gpx(spark, str(p)).collect()
    wpts = sorted((r for r in rows if r.layer == "waypoints"),
                  key=lambda r: r.name)
    assert len(wpts) == 2 and wpts[0].ele == 3.5
    assert '"cmt": "hi"' in wpts[0].props
    g = wkb.decode(bytes(wpts[1].geom))
    np.testing.assert_allclose(g.rings[0][0], [20.0, -10.0])
    rte = next(r for r in rows if r.layer == "routes")
    assert len(wkb.decode(bytes(rte.geom)).rings[0]) == 3
