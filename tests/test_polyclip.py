"""General polygon boolean kernel (core.polyclip) vs analytic oracles.

Reference semantics: OGRGeometry Intersection/Union/Difference/SymDifference
(/root/reference/ogr/ogrgeometry.cpp:4893,:5012,:5331,:5451 — GEOS-exact);
shape fixtures follow the spirit of /root/reference/autotest/ogr/ogr_geos.py.

Two independent checks everywhere:
  * boolean_area (trapezoid sum, no stitching) vs an analytic value;
  * geom_area(geom_boolean(...)) — the STITCHED rings re-measured through a
    different code path (shoelace in geomops) must give the same area, which
    pins the ring assembly, orientation and hole handling.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.core import geomops, wkb
from gdal_spark.core.polyclip import OPS, boolean_area, geom_boolean


def G(b):
    return wkb.decode(b)


def rect(x0, y0, x1, y1):
    return G(wkb.box(x0, y0, x1, y1))


def _stitched_area(a, b, op):
    g = geom_boolean(a, b, op)
    return 0.0 if g is None else geomops.geom_area(g)


def _check_all(a, b, inter, area_a, area_b, tol=1e-9):
    want = {
        "intersection": inter,
        "union": area_a + area_b - inter,
        "difference": area_a - inter,
        "symdifference": area_a + area_b - 2 * inter,
    }
    for op in OPS:
        assert boolean_area(a, b, op) == pytest.approx(want[op], abs=tol), op
        assert _stitched_area(a, b, op) == pytest.approx(want[op],
                                                         abs=tol), f"stitch {op}"


def test_rect_rect_overlap():
    _check_all(rect(0, 0, 10, 10), rect(5, 5, 15, 15),
               inter=25.0, area_a=100.0, area_b=100.0)


def test_rect_rect_disjoint():
    _check_all(rect(0, 0, 4, 4), rect(10, 10, 14, 14),
               inter=0.0, area_a=16.0, area_b=16.0)


def test_rect_contained():
    _check_all(rect(0, 0, 10, 10), rect(2, 2, 4, 4),
               inter=4.0, area_a=100.0, area_b=4.0)


def test_rect_shared_edge():
    # degenerate: B shares A's right edge
    _check_all(rect(0, 0, 10, 10), rect(10, 0, 20, 10),
               inter=0.0, area_a=100.0, area_b=100.0)


def test_identical_rects():
    _check_all(rect(0, 0, 6, 4), rect(0, 0, 6, 4),
               inter=24.0, area_a=24.0, area_b=24.0)


def test_polygon_with_hole_vs_rect():
    # A = 10x10 square with a 4x4 hole in the middle
    a = G(wkb.polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                      holes=[[(3, 3), (7, 3), (7, 7), (3, 7)]]))
    b = rect(5, 5, 15, 15)
    # A∩B: [5,10]x[5,10]=25 minus hole overlap [5,7]x[5,7]=4 -> 21
    _check_all(a, b, inter=21.0, area_a=84.0, area_b=100.0)


def test_hole_fully_inside_b():
    a = G(wkb.polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                      holes=[[(4, 4), (6, 4), (6, 6), (4, 6)]]))
    b = rect(2, 2, 8, 8)
    # inter = 36 - 4 = 32
    _check_all(a, b, inter=32.0, area_a=96.0, area_b=36.0)
    # union of A and B fills... no: hole sits inside B, so union has NO hole
    g = geom_boolean(a, b, "union")
    assert geomops.geom_area(g) == pytest.approx(100.0)
    # and intersection DOES have the hole -> multat least one CW ring
    gi = geom_boolean(a, b, "intersection")
    assert gi.gtype in (wkb.POLYGON, wkb.MULTIPOLYGON)


def test_concave_L_shape():
    # L-shaped concave polygon vs a square crossing the notch
    L = G(wkb.polygon([(0, 0), (10, 0), (10, 4), (4, 4), (4, 10), (0, 10)]))
    area_L = 10 * 4 + 4 * 6
    b = rect(2, 2, 8, 8)
    # overlap: x in [2,8]: y in [2,4] full width 6x2=12; plus x in [2,4],
    # y in [4,8] -> 2*4=8  => 20
    _check_all(L, b, inter=20.0, area_a=float(area_L), area_b=36.0)


def test_multipolygon_side():
    a = G(wkb.multipolygon([
        [[(0, 0), (4, 0), (4, 4), (0, 4)]],
        [[(10, 0), (14, 0), (14, 4), (10, 4)]],
    ]))
    b = rect(2, 0, 12, 4)
    # inter: [2,4]x[0,4]=8 + [10,12]x[0,4]=8 = 16
    _check_all(a, b, inter=16.0, area_a=32.0, area_b=40.0)


def test_triangle_rect():
    tri = G(wkb.polygon([(0, 0), (8, 0), (0, 8)]))
    b = rect(0, 0, 4, 4)
    # triangle x<=4, y<=4 region: square minus corner triangle above x+y=8?
    # hypotenuse x+y=8 doesn't cut [0,4]^2 (x+y<=8 always), so inter = 16
    _check_all(tri, b, inter=16.0, area_a=32.0, area_b=16.0)


def test_triangle_rect_cut():
    tri = G(wkb.polygon([(0, 0), (4, 0), (0, 4)]))
    b = rect(1, 1, 5, 5)
    # inter region: x>=1,y>=1,x+y<=4 -> triangle with legs 2 -> area 2
    _check_all(tri, b, inter=2.0, area_a=8.0, area_b=16.0)


def test_union_disjoint_is_multipolygon():
    g = geom_boolean(rect(0, 0, 2, 2), rect(5, 5, 7, 7), "union")
    assert g.gtype == wkb.MULTIPOLYGON
    assert len(g.polygons()) == 2
    assert geomops.geom_area(g) == pytest.approx(8.0)


def test_symdiff_produces_hole():
    # B strictly inside A: symdiff = A with hole B
    a, b = rect(0, 0, 10, 10), rect(3, 3, 7, 7)
    g = geom_boolean(a, b, "symdifference")
    assert geomops.geom_area(g) == pytest.approx(84.0)
    polys = g.polygons()
    assert len(polys) == 1 and len(polys[0]) == 2   # shell + hole


def test_stitched_rings_are_clean_rects():
    # rect∩rect must stitch back to a single 4-corner ring (collinear slab
    # vertices removed)
    g = geom_boolean(rect(0, 0, 10, 10), rect(5, 5, 15, 15), "intersection")
    assert g.gtype == wkb.POLYGON
    assert len(g.rings) == 1
    assert len(g.rings[0]) == 5     # 4 corners + closure


def test_empty_sides():
    a = rect(0, 0, 1, 1)
    assert geom_boolean(None, a, "union") is a
    assert geom_boolean(a, None, "union") is a
    assert geom_boolean(None, a, "intersection") is None
    assert geom_boolean(a, None, "difference") is a
    assert geom_boolean(None, a, "difference") is None


def test_fuzz_random_rect_algebra():
    rng = np.random.RandomState(42)
    for _ in range(40):
        x0, y0 = rng.uniform(-50, 50, 2)
        w1, h1 = rng.uniform(1, 30, 2)
        x2, y2 = rng.uniform(-50, 50, 2)
        w2, h2 = rng.uniform(1, 30, 2)
        a = rect(x0, y0, x0 + w1, y0 + h1)
        b = rect(x2, y2, x2 + w2, y2 + h2)
        ix = max(0.0, min(x0 + w1, x2 + w2) - max(x0, x2))
        iy = max(0.0, min(y0 + h1, y2 + h2) - max(y0, y2))
        _check_all(a, b, inter=ix * iy, area_a=w1 * h1, area_b=w2 * h2,
                   tol=1e-7)


def test_fuzz_random_triangles_identities():
    """No analytic value — check the op algebra is self-consistent and the
    stitched output re-measures to the trapezoid area."""
    rng = np.random.RandomState(7)
    for _ in range(30):
        pa = rng.uniform(-10, 10, (3, 2))
        pb = rng.uniform(-10, 10, (3, 2))
        a = G(wkb.polygon(pa))
        b = G(wkb.polygon(pb))
        area_a = geomops.geom_area(a)
        area_b = geomops.geom_area(b)
        inter = boolean_area(a, b, "intersection")
        assert boolean_area(a, b, "union") == pytest.approx(
            area_a + area_b - inter, abs=1e-7)
        assert boolean_area(a, b, "difference") == pytest.approx(
            area_a - inter, abs=1e-7)
        assert boolean_area(a, b, "symdifference") == pytest.approx(
            area_a + area_b - 2 * inter, abs=1e-7)
        for op in OPS:
            assert _stitched_area(a, b, op) == pytest.approx(
                boolean_area(a, b, op), abs=1e-7), op
