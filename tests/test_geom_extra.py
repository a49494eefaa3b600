"""Round-2 constructive/validity/geodesic surface:

MakeValid (even-odd re-stitch), PointOnSurface, n-ary union, general
Buffer, IsValid/IsSimple/IsRing, geodesic area/length — each against an
independent mathematical oracle (numerical integration, closed forms).

Reference: ogrgeometry.cpp MakeValid :3922, PointOnSurface :6311,
UnionCascaded :5129, Buffer :4526, IsValid :2297, IsSimple :2416,
IsRing :2486; geodesic measures ogrsqlitesqlfunctions.cpp:630-722.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.core import geomops, wkb
from gdal_spark.core.polyclip import (geom_makevalid, geom_union_all,
                                      point_on_surface)


def G(b):
    return wkb.decode(b)


# -- MakeValid ---------------------------------------------------------------

def test_makevalid_bowtie():
    bow = G(wkb.polygon([(0, 0), (4, 4), (4, 0), (0, 4)]))
    fixed = geom_makevalid(bow)
    # two triangular lobes of 2x2/2... lobes: (0,0)-(2,2)-(0,4) and
    # (2,2)-(4,4)-(4,0): each has area 4
    assert geomops.geom_area(fixed) == pytest.approx(8.0)
    assert geomops.geom_is_valid(fixed)
    assert fixed.gtype == wkb.MULTIPOLYGON


def test_makevalid_keeps_valid_polygon():
    sq = G(wkb.box(0, 0, 5, 5))
    fixed = geom_makevalid(sq)
    assert geomops.geom_area(fixed) == pytest.approx(25.0)


def test_makevalid_overlapping_rings_dissolve():
    g = G(wkb.multipolygon([[[(0, 0), (4, 0), (4, 4), (0, 4)]],
                            [[(2, 2), (6, 2), (6, 6), (2, 6)]]]))
    fixed = geom_makevalid(g)
    # even-odd: the overlap region [2,4]^2 counts as a HOLE (parity 2)
    assert geomops.geom_area(fixed) == pytest.approx(16 + 16 - 2 * 4)


# -- PointOnSurface ----------------------------------------------------------

def test_point_on_surface_concave():
    # C-shape whose centroid falls in the notch (outside the polygon)
    c = G(wkb.polygon([(0, 0), (10, 0), (10, 2), (2, 2), (2, 8),
                       (10, 8), (10, 10), (0, 10)]))
    p = point_on_surface(c)
    assert p is not None
    inside = geomops.points_in_geom(np.array([p[0]]), np.array([p[1]]), c)
    assert bool(inside[0])


def test_point_on_surface_with_hole():
    g = G(wkb.polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                      holes=[[(2, 2), (8, 2), (8, 8), (2, 8)]]))
    p = point_on_surface(g)
    assert geomops.points_in_geom(np.array([p[0]]), np.array([p[1]]), g)[0]


# -- n-ary union -------------------------------------------------------------

def test_union_all_three_squares():
    gs = [G(wkb.box(0, 0, 4, 4)), G(wkb.box(2, 0, 6, 4)),
          G(wkb.box(4, 0, 8, 4))]
    u = geom_union_all(gs)
    assert geomops.geom_area(u) == pytest.approx(8 * 4)
    assert u.gtype == wkb.POLYGON


def test_union_all_disjoint():
    gs = [G(wkb.box(0, 0, 1, 1)), G(wkb.box(3, 3, 4, 4)),
          G(wkb.box(6, 0, 7, 1))]
    u = geom_union_all(gs)
    assert geomops.geom_area(u) == pytest.approx(3.0)
    assert len(u.polygons()) == 3


# -- general buffer ----------------------------------------------------------

def test_buffer_point_area():
    g = G(wkb.point(3, 4))
    b = geomops.buffer_geom(g, 2.0, quadsegs=16)
    assert geomops.geom_area(b) == pytest.approx(np.pi * 4, rel=2e-3)


def test_buffer_line_capsule_area():
    g = G(wkb.linestring([(0, 0), (10, 0)]))
    b = geomops.buffer_geom(g, 1.5, quadsegs=16)
    want = 2 * 1.5 * 10 + np.pi * 1.5 ** 2
    assert geomops.geom_area(b) == pytest.approx(want, rel=3e-3)


def test_buffer_polygon_positive():
    g = G(wkb.box(0, 0, 6, 6))
    b = geomops.buffer_geom(g, 1.0, quadsegs=16)
    want = 8 * 8 - (4 - np.pi) * 1.0    # rounded corners
    assert geomops.geom_area(b) == pytest.approx(want, rel=3e-3)
    # contains the original
    assert geomops.geom_contains(b, g)


def test_buffer_polygon_negative():
    g = G(wkb.box(0, 0, 6, 6))
    b = geomops.buffer_geom(g, -1.0, quadsegs=16)
    assert geomops.geom_area(b) == pytest.approx(16.0, rel=1e-6)


def test_buffer_multisegment_line():
    g = G(wkb.linestring([(0, 0), (5, 0), (5, 5)]))
    b = geomops.buffer_geom(g, 1.0, quadsegs=16)
    # two capsules overlapping at the corner: 2*(2*5) + pi - overlap(2x2-ish)
    a = geomops.geom_area(b)
    assert 20.0 < a < 20.0 + np.pi + 1.0


# -- validity predicates -----------------------------------------------------

def test_is_simple_and_ring():
    line = G(wkb.linestring([(0, 0), (5, 5), (10, 0)]))
    assert geomops.geom_is_simple(line)
    crossing = G(wkb.linestring([(0, 0), (4, 4), (4, 0), (0, 4)]))
    assert not geomops.geom_is_simple(crossing)
    ring = G(wkb.linestring([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]))
    assert geomops.geom_is_ring(ring)
    assert not geomops.geom_is_ring(line)         # open
    bow = G(wkb.linestring([(0, 0), (4, 4), (4, 0), (0, 4), (0, 0)]))
    assert not geomops.geom_is_ring(bow)          # closed but self-crossing


def test_is_valid():
    assert geomops.geom_is_valid(G(wkb.box(0, 0, 5, 5)))
    bow = G(wkb.polygon([(0, 0), (4, 4), (4, 0), (0, 4)]))
    assert not geomops.geom_is_valid(bow)
    holed = G(wkb.polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                          holes=[[(2, 2), (4, 2), (4, 4), (2, 4)]]))
    assert geomops.geom_is_valid(holed)
    hole_outside = G(wkb.polygon([(0, 0), (5, 0), (5, 5), (0, 5)],
                                 holes=[[(7, 7), (8, 7), (8, 8), (7, 8)]]))
    assert not geomops.geom_is_valid(hole_outside)


# -- geodesic measures -------------------------------------------------------

A = 6378137.0
F = 1 / 298.257223563
E2 = F * (2 - F)


def _ellipsoid_rect_area(lon0, lon1, lat0, lat1):
    """Numerical integration oracle (independent of the authalic identity)."""
    phi = np.linspace(np.deg2rad(lat0), np.deg2rad(lat1), 400001)
    dens = A * A * (1 - E2) * np.cos(phi) / (1 - E2 * np.sin(phi) ** 2) ** 2
    return np.deg2rad(lon1 - lon0) * np.trapz(dens, phi)


@pytest.mark.parametrize("lat0,lat1", [(0.0, 1.0), (45.0, 46.0),
                                       (70.0, 75.0), (-10.0, 10.0)])
def test_geodesic_area_latlon_rect(lat0, lat1):
    g = G(wkb.polygon([(10, lat0), (12, lat0), (12, lat1), (10, lat1)]))
    got = geomops.geom_area_geodesic(g)
    want = _ellipsoid_rect_area(10, 12, lat0, lat1)
    assert got == pytest.approx(want, rel=1e-9)


def test_geodesic_area_hole_subtracts():
    g = G(wkb.polygon([(0, 0), (2, 0), (2, 2), (0, 2)],
                      holes=[[(0.5, 0.5), (1.5, 0.5), (1.5, 1.5),
                              (0.5, 1.5)]]))
    outer = geomops.geom_area_geodesic(
        G(wkb.polygon([(0, 0), (2, 0), (2, 2), (0, 2)])))
    inner = geomops.geom_area_geodesic(
        G(wkb.polygon([(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5)])))
    assert geomops.geom_area_geodesic(g) == pytest.approx(outer - inner,
                                                          rel=1e-12)


def test_vincenty_equator_and_meridian():
    # along the equator the geodesic is the equator: a * dlon exactly
    d = geomops.vincenty_distance(0.0, 0.0, 1.0, 0.0)
    assert float(d) == pytest.approx(A * np.deg2rad(1.0), rel=1e-9)
    # one degree of meridian arc vs numerical integration
    phi = np.linspace(0, np.deg2rad(1.0), 200001)
    m = A * (1 - E2) / (1 - E2 * np.sin(phi) ** 2) ** 1.5
    want = np.trapz(m, phi)
    d = geomops.vincenty_distance(10.0, 0.0, 10.0, 1.0)
    assert float(d) == pytest.approx(want, rel=1e-7)


def test_geodesic_length_polyline():
    g = G(wkb.linestring([(0, 0), (1, 0), (1, 1)]))
    d1 = float(geomops.vincenty_distance(0, 0, 1, 0))
    d2 = float(geomops.vincenty_distance(1, 0, 1, 1))
    assert geomops.geom_length_geodesic(g) == pytest.approx(d1 + d2,
                                                            rel=1e-12)


def test_st_delaunay_covers_polygon(spark):
    """ST_DelaunayTriangulation over a convex polygon's vertices: triangle
    areas must sum to the polygon area."""
    from gdal_spark.functions import st
    import pandas as pd
    st.register_all(spark)
    pdf = pd.DataFrame({"geom": [wkb.polygon(
        [(0, 0), (10, 0), (10, 6), (5, 9), (0, 6)])]})
    spark.createDataFrame(pdf).createOrReplaceTempView("dl_v")
    row = spark.sql(
        "SELECT ST_Area(ST_DelaunayTriangulation(geom)) AS a, "
        "ST_Area(geom) AS b FROM dl_v").collect()[0]
    assert row.a == pytest.approx(row.b)


def test_concave_hull_notch():
    from gdal_spark.core.delaunay import concave_hull
    rng = np.random.RandomState(0)
    pts = []
    for _ in range(2500):
        x, y = rng.uniform(0, 10, 2)
        if not (2 < x and 3 < y < 7):          # carve a notch
            pts.append((x, y))
    pts = np.array(pts)
    ch = concave_hull(pts, max_edge=1.2)
    cvx = geomops.convex_hull(pts)
    assert abs(geomops.ring_area(ch)) < 0.8 * abs(geomops.ring_area(cvx))
    assert not geomops.points_in_ring(np.array([8.0]), np.array([5.0]),
                                      ch)[0]
    # every input point stays inside-or-on the concave hull
    inside = geomops.points_in_ring(pts[:, 0], pts[:, 1], ch)
    onb = geomops._points_on_lines_mask(pts, [ch])
    assert (inside | onb).all()


def test_st_setprecision_and_makepoint(spark):
    from gdal_spark.functions import st
    import pandas as pd
    st.register_all(spark)
    pdf = pd.DataFrame({"geom": [wkb.polygon(
        [(0.04, 0.04), (9.96, 0.01), (10.02, 9.98), (0.01, 10.04)])]})
    spark.createDataFrame(pdf).createOrReplaceTempView("sp_v")
    row = spark.sql("""
        SELECT ST_AsText(ST_SetPrecision(geom, 0.5)) AS wkt,
               ST_AsText(ST_MakePoint(3.5, -2.0)) AS pt,
               ST_Area(ST_GeomFromWKB(ST_AsBinary(geom))) AS a
        FROM sp_v""").collect()[0]
    assert row.wkt == "POLYGON ((0 0,10 0,10 10,0 10,0 0))"
    assert row.pt == "POINT (3.5 -2)"
    assert row.a == pytest.approx(99.595, abs=0.5)


def test_clip_line_rect_exact():
    """Liang-Barsky line clipping: exact entry/exit points, split pieces."""
    from gdal_spark.core.geomops import clip_geom_rect
    # line crosses the rect, exits, re-enters
    line = G(wkb.linestring([(-5, 5), (5, 5), (5, 15), (15, 15), (15, 5),
                             (25, 5)]))
    out = clip_geom_rect(line, 0.0, 0.0, 20.0, 10.0)
    assert out is not None
    pieces = [p.rings[0] for p in (out.parts if out.gtype ==
                                   wkb.MULTILINESTRING else [out])]
    assert len(pieces) == 2
    total = sum(float(np.hypot(*np.diff(p, axis=0).T).sum())
                for p in pieces)
    # inside pieces: (0,5)-(5,5)-(5,10) = 10 ; (15,10)-(15,5)-(20,5) = 10
    assert total == pytest.approx(20.0)
    ends = sorted(tuple(np.round(p[0], 9)) + tuple(np.round(p[-1], 9))
                  for p in pieces)
    assert ends == [(0.0, 5.0, 5.0, 10.0), (15.0, 10.0, 20.0, 5.0)]


def test_clip_line_fully_inside_and_outside():
    from gdal_spark.core.geomops import clip_geom_rect
    inside = G(wkb.linestring([(1, 1), (2, 2)]))
    out = clip_geom_rect(inside, 0, 0, 5, 5)
    np.testing.assert_allclose(out.rings[0], [[1, 1], [2, 2]])
    outside = G(wkb.linestring([(10, 10), (12, 12)]))
    assert clip_geom_rect(outside, 0, 0, 5, 5) is None


def test_envelope_accessor_sql_surface(spark):
    """ST_MinX/MinY/MaxX/MaxY + ST_Envelope + ST_NPoints/ST_NumGeometries
    over mixed types incl. multis and NULL (ogrsqlitesqlfunctions.cpp
    OGR2SQLITE_ST_MinX family semantics)."""
    from gdal_spark.functions import st as stf
    import numpy as np
    stf.register_all(spark)
    mp = wkb.Geom(wkb.MULTIPOINT, parts=[
        G(wkb.point(1.0, 2.0)), G(wkb.point(-3.0, 7.0)),
        G(wkb.point(5.0, -1.0))])
    ml = wkb.Geom(wkb.MULTILINESTRING, parts=[
        G(wkb.linestring([(0, 0), (2, 2), (4, 0)])),
        G(wkb.linestring([(10, 10), (12, 10)]))])
    rows = [(0, wkb.box(3.0, 4.0, 8.0, 9.0)),
            (1, wkb.encode(mp)), (2, wkb.encode(ml)), (3, None)]
    spark.createDataFrame(rows, ["i", "geom"]) \
        .createOrReplaceTempView("env_acc_v")
    got = {r.i: r for r in spark.sql("""
        SELECT i, ST_MinX(geom) a, ST_MinY(geom) b, ST_MaxX(geom) c,
               ST_MaxY(geom) d, ST_NPoints(geom) np,
               ST_NumGeometries(geom) ng,
               ST_AsText(ST_Envelope(geom)) env
        FROM env_acc_v""").collect()}
    assert (got[0].a, got[0].b, got[0].c, got[0].d) == (3.0, 4.0, 8.0, 9.0)
    assert got[0].np == 5 and got[0].ng == 1
    assert (got[1].a, got[1].b, got[1].c, got[1].d) == (-3.0, -1.0, 5.0, 7.0)
    assert got[1].np == 3 and got[1].ng == 3
    assert (got[2].a, got[2].b, got[2].c, got[2].d) == (0.0, 0.0, 12.0, 10.0)
    assert got[2].np == 5 and got[2].ng == 2
    assert got[3].a is None and got[3].np is None and got[3].env is None
    assert got[1].env == wkb.to_wkt(wkb.box(-3.0, -1.0, 5.0, 7.0))


def test_closest_pair_and_shortest_line():
    import numpy as np

    from gdal_spark.core import wkb
    from gdal_spark.core.geomops import closest_pair, geom_distance
    sq = wkb.Geom(wkb.POLYGON, [np.array(
        [[0., 0.], [4., 0.], [4., 4.], [0., 4.], [0., 0.]])])
    pt = wkb.Geom(wkb.POINT, [np.array([[6.0, 2.0]])])
    pa, pb = closest_pair(pt, sq)
    assert pa == (6.0, 2.0) and pb == (4.0, 2.0)
    # symmetric call gives the mirrored pair, same distance
    qa, qb = closest_pair(sq, pt)
    assert qa == (4.0, 2.0) and qb == (6.0, 2.0)
    d = np.hypot(pa[0] - pb[0], pa[1] - pb[1])
    assert abs(d - geom_distance(pt, sq)) < 1e-12
    # two segments crossing region: closest via segment-segment feet
    l1 = wkb.Geom(wkb.LINESTRING, [np.array([[0., 10.], [10., 10.]])])
    l2 = wkb.Geom(wkb.LINESTRING, [np.array([[5., 0.], [5., 8.]])])
    pa, pb = closest_pair(l1, l2)
    assert pa == (5.0, 10.0) and pb == (5.0, 8.0)


def test_geom_snap_semantics():
    import numpy as np

    from gdal_spark.core import wkb
    from gdal_spark.core.geomops import geom_snap
    sq = wkb.Geom(wkb.POLYGON, [np.array(
        [[0., 0.], [4., 0.], [4., 4.], [0., 4.], [0., 0.]])])
    # vertex snap: near-corner vertex moves onto the corner
    line = wkb.Geom(wkb.LINESTRING,
                    [np.array([[0.05, -0.02], [3.0, 0.04], [5.0, 1.0]])])
    r = geom_snap(line, sq, 0.2).rings[0]
    assert r[0].tolist() == [0.0, 0.0]
    assert r[1].tolist() == [3.0, 0.04]      # no vertex within tol
    assert r[2].tolist() == [5.0, 1.0]
    # segment snap: b vertex near an a-edge interior is inserted
    sq2 = wkb.Geom(wkb.POLYGON, [np.array(
        [[0., 0.], [2., 0.05], [4., 0.], [4., 4.], [0., 4.], [0., 0.]])])
    r = geom_snap(sq, sq2, 0.1).rings[0]
    assert [2.0, 0.05] in r.tolist()
    assert len(r) == 6
    # out of tolerance: unchanged
    r = geom_snap(sq, sq2, 0.01).rings[0]
    assert len(r) == 5


def test_hausdorff_distance():
    import numpy as np

    from gdal_spark.core import wkb
    from gdal_spark.core.geomops import hausdorff_distance
    a = wkb.Geom(wkb.LINESTRING, [np.array([[0., 0.], [10., 0.]])])
    b = wkb.Geom(wkb.LINESTRING, [np.array([[0., 1.], [10., 3.]])])
    assert hausdorff_distance(a, b) == 3.0
    assert hausdorff_distance(b, a) == 3.0    # symmetric
    assert hausdorff_distance(a, a) == 0.0
    sq = wkb.Geom(wkb.POLYGON, [np.array(
        [[0., 0.], [4., 0.], [4., 4.], [0., 4.], [0., 0.]])])
    pt = wkb.Geom(wkb.POINT, [np.array([[6., 2.]])])
    assert abs(hausdorff_distance(pt, sq) - np.sqrt(40.0)) < 1e-12


def test_curve_measures_closed_form():
    """Exact arc math: semicircle length, full-circle area/perimeter,
    clockwise arcs, compound curves, collinear degeneracy, holes."""
    import math
    import struct

    import numpy as np

    from gdal_spark.core import wkb as W
    from gdal_spark.core.geomops import curve_area, curve_length

    def cs(pts):
        out = struct.pack("<BII", 1, 8, len(pts))
        for x, y in pts:
            out += struct.pack("<2d", x, y)
        return out

    c, R = (3.0, -2.0), 1.5
    p = lambda a: (c[0] + R * math.cos(a), c[1] + R * math.sin(a))
    semi = W.decode(cs([p(0), p(math.pi / 2), p(math.pi)]), curves=True)
    assert abs(curve_length(semi) - R * math.pi) < 1e-9
    cw = W.decode(cs([p(0), p(-math.pi / 2), p(-math.pi)]), curves=True)
    assert abs(curve_length(cw) - R * math.pi) < 1e-9
    ring = cs([p(0), p(math.pi / 2), p(math.pi),
               p(3 * math.pi / 2), p(2 * math.pi)])
    circle = W.decode(struct.pack("<BII", 1, 10, 1) + ring, curves=True)
    assert abs(curve_area(circle) - math.pi * R * R) < 1e-9
    assert abs(curve_length(circle) - 2 * math.pi * R) < 1e-9
    # curvepolygon with a straight square outer and circular hole
    sq = struct.pack("<BII", 1, 2, 5) + struct.pack(
        "<10d", -10, -10, 10, -10, 10, 10, -10, 10, -10, -10)
    holed = W.decode(struct.pack("<BII", 1, 10, 2) + sq + ring,
                     curves=True)
    assert abs(curve_area(holed) - (400 - math.pi * R * R)) < 1e-9
    col = W.decode(cs([(0, 0), (1, 1), (2, 2)]), curves=True)
    assert abs(curve_length(col) - math.hypot(2, 2)) < 1e-12
