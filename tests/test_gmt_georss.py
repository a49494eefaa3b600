"""GMT ASCII and GeoRSS drivers (ogr/ogrsf_frmts/gmt/ogrgmtlayer.cpp,
ogr/ogrsf_frmts/georss/ogrgeorsslayer.cpp)."""

import json

import numpy as np
import pytest

from gdal_spark.core import wkb
from gdal_spark.sources.georss import read_georss, write_georss
from gdal_spark.sources.gmt import read_gmt, write_gmt


def test_gmt_points_roundtrip(spark, tmp_path):
    p = str(tmp_path / "pts.gmt")
    rows = [(wkb.encode(wkb.Geom(wkb.POINT,
                                 [np.array([[i * 2.0, -i * 1.0]])])),
             {"name": f"p{i}", "rank": i, "score": i / 4.0})
            for i in range(12)]
    write_gmt(rows, p, gtype="POINT")
    out = sorted(read_gmt(spark, p).collect(), key=lambda r: r.fid)
    assert len(out) == 12
    for i, r in enumerate(out):
        g = wkb.decode(bytes(r.geom))
        assert g.rings[0][0][0] == i * 2.0
        pr = json.loads(r.props)
        assert pr["name"] == f"p{i}" and pr["rank"] == i
        assert pr["score"] == pytest.approx(i / 4.0)


def test_gmt_polygon_holes_and_multiline(spark, tmp_path):
    shell = np.array([[0, 0], [8, 0], [8, 6], [0, 6], [0, 0]], np.float64)
    hole = np.array([[2, 2], [3, 2], [3, 3], [2, 3], [2, 2]], np.float64)
    poly = wkb.Geom(wkb.POLYGON, [shell, hole])
    ml = wkb.Geom(wkb.MULTILINESTRING, parts=[
        wkb.Geom(wkb.LINESTRING, [np.array([[0, 0], [1, 1]], np.float64)]),
        wkb.Geom(wkb.LINESTRING, [np.array([[5, 5], [7, 8]], np.float64)])])
    pp = str(tmp_path / "poly.gmt")
    write_gmt([(wkb.encode(poly), {"k": 1})], pp, gtype="POLYGON")
    g = wkb.decode(bytes(read_gmt(spark, pp).collect()[0].geom))
    from gdal_spark.core.geomops import geom_area
    assert len(g.rings) == 2 and geom_area(g) == pytest.approx(47.0)
    pm = str(tmp_path / "ml.gmt")
    write_gmt([(wkb.encode(ml), {"k": 1})], pm, gtype="MULTILINESTRING")
    g2 = wkb.decode(bytes(read_gmt(spark, pm).collect()[0].geom))
    assert g2.gtype == wkb.MULTILINESTRING and len(g2.parts) == 2


def test_georss_roundtrip_and_w3c_geo(spark, tmp_path):
    p = str(tmp_path / "feed.xml")
    line = wkb.Geom(wkb.LINESTRING,
                    [np.array([[10, 20], [30, 40]], np.float64)])
    poly = wkb.Geom(wkb.POLYGON, [np.array(
        [[0, 0], [4, 0], [4, 4], [0, 0]], np.float64)])
    rows = [
        (wkb.encode(wkb.Geom(wkb.POINT, [np.array([[2.5, 48.9]])])),
         {"title": "paris", "link": "http://a", "description": "d1",
          "pub_date": "Tue, 01 Jan 2024 00:00:00 GMT"}),
        (wkb.encode(line), {"title": "a line"}),
        (wkb.encode(poly), {"title": "a poly"}),
    ]
    write_georss(rows, p)
    out = sorted(read_georss(spark, p).collect(), key=lambda r: r.fid)
    assert [r.title for r in out] == ["paris", "a line", "a poly"]
    g0 = wkb.decode(bytes(out[0].geom))
    # lat-first in the file, lon-first in WKB
    assert g0.rings[0][0][0] == 2.5 and g0.rings[0][0][1] == 48.9
    assert out[0].pub_date.startswith("Tue")
    g1 = wkb.decode(bytes(out[1].geom))
    np.testing.assert_array_equal(g1.rings[0], line.rings[0])
    g2 = wkb.decode(bytes(out[2].geom))
    assert np.array_equal(g2.rings[0][0], g2.rings[0][-1])

    # W3C geo flavor + Atom entries parse too
    atom = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom"
      xmlns:geo="http://www.w3.org/2003/01/geo/wgs84_pos#">
  <entry><title>w3c</title>
    <geo:lat>51.5</geo:lat><geo:long>-0.12</geo:long>
    <updated>2024-02-02</updated></entry>
</feed>"""
    p2 = tmp_path / "atom.xml"
    p2.write_text(atom)
    r = read_georss(spark, str(p2)).collect()[0]
    g = wkb.decode(bytes(r.geom))
    assert g.rings[0][0][0] == -0.12 and g.rings[0][0][1] == 51.5
    assert r.title == "w3c" and r.pub_date == "2024-02-02"
