"""MapInfo MIF/MID driver (ogr/ogrsf_frmts/mitab/mitab_miffile.cpp,
mitab_feature_mif.cpp)."""

import numpy as np
import pytest

from gdal_spark.core import wkb
from gdal_spark.sources.mif import parse_mif_header, read_mif, write_mif


def _poly():
    shell = np.array([[0, 0], [8, 0], [8, 6], [0, 6], [0, 0]], np.float64)
    hole = np.array([[2, 2], [3, 2], [3, 3], [2, 3], [2, 2]], np.float64)
    return wkb.Geom(wkb.POLYGON, [shell, hole])


def test_roundtrip_all_types(spark, tmp_path):
    path = str(tmp_path / "layer.mif")
    geoms = [
        wkb.Geom(wkb.POINT, [np.array([[1.5, -2.5]])]),
        wkb.Geom(wkb.LINESTRING,
                 [np.array([[0, 0], [1, 2], [4, 4]], np.float64)]),
        _poly(),
        wkb.Geom(wkb.MULTILINESTRING, parts=[
            wkb.Geom(wkb.LINESTRING,
                     [np.array([[0, 0], [1, 1]], np.float64)]),
            wkb.Geom(wkb.LINESTRING,
                     [np.array([[5, 5], [6, 7], [8, 8]], np.float64)])]),
        wkb.Geom(wkb.MULTIPOINT, parts=[
            wkb.Geom(wkb.POINT, [np.array([[1.0, 2.0]])]),
            wkb.Geom(wkb.POINT, [np.array([[3.0, 4.0]])])]),
        None,
    ]
    rows = [(wkb.encode(g) if g else None,
             {"name": f"f{i}", "rank": i, "score": i / 3.0, "ok": i % 2 == 0})
            for i, g in enumerate(geoms)]
    write_mif(rows, path)
    cols, delim, _ = parse_mif_header(path)
    assert [c[0] for c in cols] == ["name", "rank", "score", "ok"]
    assert delim == ","
    out = sorted(read_mif(spark, path).collect(), key=lambda r: r.fid)
    assert len(out) == len(geoms)
    for i, (r, g) in enumerate(zip(out, geoms)):
        assert r.name == f"f{i}" and r.rank == i
        assert r.score == pytest.approx(i / 3.0)
        assert r.ok == (i % 2 == 0)
        if g is None:
            assert r.geom is None
        else:
            back = wkb.decode(bytes(r.geom))
            assert back.gtype == g.gtype
    # polygon ring nesting: hole preserved (area = 48 - 1)
    from gdal_spark.core.geomops import geom_area
    assert geom_area(wkb.decode(bytes(out[2].geom))) == pytest.approx(47.0)


def test_multipolygon_region_nesting(spark, tmp_path):
    path = str(tmp_path / "mp.mif")
    two = wkb.Geom(wkb.MULTIPOLYGON, parts=[
        _poly(),
        wkb.Geom(wkb.POLYGON, [np.array(
            [[20, 20], [25, 20], [25, 25], [20, 25], [20, 20]],
            np.float64)])])
    write_mif([(wkb.encode(two), {"k": 1})], path)
    out = read_mif(spark, path).collect()
    g = wkb.decode(bytes(out[0].geom))
    assert g.gtype == wkb.MULTIPOLYGON and len(g.parts) == 2
    assert len(g.parts[0].rings) == 2        # hole stayed with shell 1
    from gdal_spark.core.geomops import geom_area
    assert geom_area(g) == pytest.approx(47.0 + 25.0)


def test_styling_clauses_and_open_rings_skipped(spark, tmp_path):
    mif = """VERSION 300
CHARSET "Neutral"
DELIMITER ","
COLUMNS 1
  name Char(10)
DATA
POINT 10 20
    SYMBOL (34,0,12)
REGION 1
  4
0 0
4 0
4 4
0 4
    PEN (1,2,0)
    BRUSH (2,16777215,16777215)
    CENTER 2 2
"""
    (tmp_path / "s.mif").write_text(mif)
    (tmp_path / "s.mid").write_text('"a"\n"b"\n')
    out = sorted(read_mif(spark, str(tmp_path / "s.mif")).collect(),
                 key=lambda r: r.fid)
    assert [r.name for r in out] == ["a", "b"]
    g = wkb.decode(bytes(out[1].geom))
    # open MIF ring was auto-closed
    assert np.array_equal(g.rings[0][0], g.rings[0][-1])
    from gdal_spark.core.geomops import geom_area
    assert geom_area(g) == pytest.approx(16.0)


def test_mapinfo_object_types_convert(spark, tmp_path):
    """RECT/ROUNDRECT/ELLIPSE/ARC/TEXT must read (mitab converts them:
    rect -> polygon, ellipse -> polygon, arc -> polyline, text ->
    anchor point) instead of aborting the whole file."""
    mif = """Version 300
Charset "Neutral"
Delimiter ","
Columns 1
  name Char(10)
Data

RECT 0 0 4 2
    PEN (1,2,0)
ROUNDRECT 0 0 2 2 0.5
ELLIPSE 0 0 10 6
ARC 0 0 2 2 0 90
TEXT "hello"
0 0 5 1
    FONT ("Arial",0,0,0)
POINT 7 8
"""
    (tmp_path / "t.mif").write_text(mif)
    (tmp_path / "t.mid").write_text('"r"\n"rr"\n"e"\n"a"\n"t"\n"p"\n')
    out = sorted(read_mif(spark, str(tmp_path / "t.mif")).collect(),
                 key=lambda r: r.fid)
    assert [r.name for r in out] == ["r", "rr", "e", "a", "t", "p"]
    from gdal_spark.core.geomops import geom_area
    rect = wkb.decode(bytes(out[0].geom))
    assert rect.gtype == wkb.POLYGON
    assert geom_area(rect) == pytest.approx(8.0)
    rr = wkb.decode(bytes(out[1].geom))
    assert geom_area(rr) == pytest.approx(4.0)
    ell = wkb.decode(bytes(out[2].geom))
    assert ell.gtype == wkb.POLYGON
    # pi*rx*ry with a 72-gon shortfall
    assert geom_area(ell) == pytest.approx(np.pi * 5 * 3, rel=0.01)
    arc = wkb.decode(bytes(out[3].geom))
    assert arc.gtype == wkb.LINESTRING
    # quarter arc from 0 to 90 deg on unit circle centered (1,1)
    np.testing.assert_allclose(arc.rings[0][0], [2.0, 1.0], atol=1e-9)
    np.testing.assert_allclose(arc.rings[0][-1], [1.0, 2.0], atol=1e-9)
    txt = wkb.decode(bytes(out[4].geom))
    assert txt.gtype == wkb.POINT
    np.testing.assert_allclose(txt.rings[0][0], [0.0, 0.0])
    pt = wkb.decode(bytes(out[5].geom))
    np.testing.assert_allclose(pt.rings[0][0], [7.0, 8.0])
