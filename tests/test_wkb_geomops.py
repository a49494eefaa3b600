"""WKB codec round-trips + geometry-kernel unit tests.

WKT cases follow the shape of the reference's ogr_geom.py / ogr_geos.py
suites (area/centroid/contains/intersects/distance on small fixtures)."""

import numpy as np
import pytest

from gdal_spark.core import geomops as G
from gdal_spark.core import wkb


def test_wkb_point_roundtrip():
    b = wkb.point(1.5, -2.25)
    g = wkb.decode(b)
    assert g.gtype == wkb.POINT
    assert g.rings[0].tolist() == [[1.5, -2.25]]
    assert wkb.encode(g) == b


def test_wkt_roundtrip():
    cases = [
        "POINT (1 2)",
        "LINESTRING (0 0,1 1,2 0)",
        "POLYGON ((0 0,10 0,10 10,0 10,0 0))",
        "POLYGON ((0 0,10 0,10 10,0 10,0 0),(2 2,4 2,4 4,2 4,2 2))",
        "MULTIPOLYGON (((0 0,1 0,1 1,0 1,0 0)),((5 5,6 5,6 6,5 6,5 5)))",
        "MULTILINESTRING ((0 0,1 1),(2 2,3 3))",
    ]
    for w in cases:
        b = wkb.from_wkt(w)
        assert wkb.to_wkt(b) == w


def test_area_with_hole():
    b = wkb.from_wkt("POLYGON ((0 0,10 0,10 10,0 10,0 0),(2 2,4 2,4 4,2 4,2 2))")
    assert G.geom_area(wkb.decode(b)) == pytest.approx(100 - 4)


def test_length():
    b = wkb.from_wkt("LINESTRING (0 0,3 4)")
    assert G.geom_length(wkb.decode(b)) == pytest.approx(5.0)


def test_centroid_square():
    b = wkb.from_wkt("POLYGON ((0 0,2 0,2 2,0 2,0 0))")
    cx, cy = G.geom_centroid(wkb.decode(b))
    assert (cx, cy) == (pytest.approx(1.0), pytest.approx(1.0))


def test_pip_basic():
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    px = np.array([5.0, 15.0, -1.0, 9.99])
    py = np.array([5.0, 5.0, 5.0, 9.99])
    res = G.points_in_ring(px, py, ring)
    assert res.tolist() == [True, False, False, True]


def test_pip_hole():
    rings = [np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float),
             np.array([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]], dtype=float)]
    res = G.points_in_polygon([3.0, 5.0], [3.0, 5.0], rings)
    assert res.tolist() == [False, True]


def test_pip_concave():
    # concave "L" polygon
    ring = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4], [0, 0]], dtype=float)
    res = G.points_in_ring(np.array([0.5, 2.0, 2.0]), np.array([2.0, 0.5, 2.0]), ring)
    assert res.tolist() == [True, True, False]


def test_intersects_polygons():
    a = wkb.decode(wkb.from_wkt("POLYGON ((0 0,5 0,5 5,0 5,0 0))"))
    b = wkb.decode(wkb.from_wkt("POLYGON ((4 4,8 4,8 8,4 8,4 4))"))
    c = wkb.decode(wkb.from_wkt("POLYGON ((6 0,8 0,8 2,6 2,6 0))"))
    inner = wkb.decode(wkb.from_wkt("POLYGON ((1 1,2 1,2 2,1 2,1 1))"))
    assert G.geom_intersects(a, b)
    assert not G.geom_intersects(a, c)
    assert G.geom_intersects(a, inner)  # containment, no edge crossing
    assert G.geom_contains(a, inner)
    assert G.geom_within(inner, a)
    assert not G.geom_contains(a, b)


def test_intersects_point_poly_line():
    poly = wkb.decode(wkb.from_wkt("POLYGON ((0 0,5 0,5 5,0 5,0 0))"))
    pt_in = wkb.decode(wkb.from_wkt("POINT (1 1)"))
    pt_out = wkb.decode(wkb.from_wkt("POINT (9 9)"))
    line_cross = wkb.decode(wkb.from_wkt("LINESTRING (-1 2,6 2)"))
    line_out = wkb.decode(wkb.from_wkt("LINESTRING (6 6,9 9)"))
    assert G.geom_intersects(poly, pt_in)
    assert not G.geom_intersects(poly, pt_out)
    assert G.geom_intersects(poly, line_cross)
    assert not G.geom_intersects(poly, line_out)
    assert G.geom_contains(poly, pt_in)


def test_distance():
    a = wkb.decode(wkb.from_wkt("POINT (0 0)"))
    b = wkb.decode(wkb.from_wkt("POINT (3 4)"))
    assert G.geom_distance(a, b) == pytest.approx(5.0)
    poly = wkb.decode(wkb.from_wkt("POLYGON ((2 0,4 0,4 2,2 2,2 0))"))
    assert G.geom_distance(a, poly) == pytest.approx(2.0)
    assert G.geom_distance(b, poly) == pytest.approx(2.0)  # (3,4) above edge y=2


def test_clip_rect():
    g = wkb.decode(wkb.from_wkt("POLYGON ((0 0,10 0,10 10,0 10,0 0))"))
    c = G.clip_geom_rect(g, 5, 5, 15, 15)
    assert c is not None
    assert G.geom_area(c) == pytest.approx(25.0)
    assert G.clip_geom_rect(g, 20, 20, 30, 30) is None


def test_simplify():
    r = np.array([[0, 0], [1, 0.01], [2, 0], [3, 0.01], [4, 0]], dtype=float)
    s = G.simplify_ring(r, 0.1)
    assert len(s) == 2
    s2 = G.simplify_ring(r, 0.001)
    assert len(s2) == 5


def test_convex_hull():
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.5]], dtype=float)
    h = G.convex_hull(pts)
    assert abs(G.ring_area(h)) == pytest.approx(4.0)


def test_envelopes_batch():
    wkbs = [wkb.from_wkt("POLYGON ((0 0,4 0,4 2,0 2,0 0))"), None, wkb.point(7, 8)]
    e = G.envelopes(wkbs)
    assert e[0].tolist() == [0, 0, 4, 2]
    assert np.isnan(e[1]).all()
    assert e[2].tolist() == [7, 8, 7, 8]


def test_buffer_point_area():
    ring = G.buffer_point(0, 0, 1.0)
    # area of 120-gon approximates pi
    assert abs(G.ring_area(ring)) == pytest.approx(np.pi, rel=1e-3)


def test_segmentize():
    r = np.array([[0, 0], [10, 0]], dtype=float)
    s = G.segmentize_ring(r, 3.0)
    assert len(s) == 5
    d = np.hypot(*np.diff(s, axis=0).T)
    assert (d <= 3.0 + 1e-9).all()


def test_clip_and_erase_convex_partition_property():
    """clip_geom_convex + erase_geom_convex partition the subject exactly:
    areas sum, and sampled points land in the piece that their (subject,
    hull) membership dictates (the OGRLayer Intersection/Erase kernels,
    ogrlayer.cpp:2633/:5094)."""
    rng = np.random.default_rng(12)
    for _ in range(50):
        x0, y0 = rng.uniform(-50, 50, 2)
        w, h = rng.uniform(1, 30, 2)
        subj = wkb.decode(wkb.box(x0, y0, x0 + w, y0 + h))
        pts = rng.normal(size=(rng.integers(5, 12), 2)) \
            * rng.uniform(2, 20) + rng.uniform(-40, 40, 2)
        hull = G.convex_hull(pts)
        inter = G.clip_geom_convex(subj, hull)
        erase = G.erase_geom_convex(subj, hull)
        a_s = G.geom_area(subj)
        a_i = G.geom_area(inter) if inter else 0.0
        a_e = G.geom_area(erase) if erase else 0.0
        assert a_i + a_e == pytest.approx(a_s, abs=1e-6 * max(a_s, 1))
        sx = rng.uniform(x0 - 2, x0 + w + 2, 200)
        sy = rng.uniform(y0 - 2, y0 + h + 2, 200)
        in_subj = G.points_in_geom(sx, sy, subj)
        in_hull = G.points_in_geom(sx, sy, wkb.Geom(wkb.POLYGON, [hull]))
        in_int = G.points_in_geom(sx, sy, inter) if inter \
            else np.zeros(200, bool)
        in_er = G.points_in_geom(sx, sy, erase) if erase \
            else np.zeros(200, bool)
        assert (in_int != (in_subj & in_hull)).sum() <= 2
        assert (in_er != (in_subj & ~in_hull)).sum() <= 2


def test_triangulate_ring_partitions_polygon():
    """Ear-clipping (overlay's concave-method decomposition): triangle
    areas sum to the polygon area and membership matches, for random
    star-shaped simple polygons."""
    rng = np.random.default_rng(21)
    for _ in range(40):
        n = rng.integers(4, 14)
        # full-sweep star polygon about the origin => simple by construction
        steps = rng.uniform(0.1, 1.0, n)
        ang = np.cumsum(steps) / steps.sum() * 2 * np.pi
        rad = rng.uniform(1.0, 10.0, n)
        ring = np.column_stack([np.cos(ang) * rad, np.sin(ang) * rad])
        ring = np.vstack([ring, ring[:1]])
        tris = G.triangulate_ring(ring)
        area = abs(G.ring_area(ring))
        tri_area = sum(abs(G.ring_area(t)) for t in tris)
        assert tri_area == pytest.approx(area, rel=1e-9)
        # membership: a point is in the polygon iff in exactly one triangle
        px = rng.uniform(-10, 10, 300)
        py = rng.uniform(-10, 10, 300)
        in_poly = G.points_in_ring(px, py, ring)
        cnt = np.zeros(300, int)
        for t in tris:
            cnt += G.points_in_ring(px, py, t).astype(int)
        # interior points: count==1; boundary/shared-edge points may differ
        mism = (in_poly != (cnt > 0)).sum()
        assert mism <= 3


def test_wkb_m_and_zm_variants_decode():
    """ISO 2xxx (M) and 3xxx (ZM) carry 3 resp. 4 values per point — the
    decoder must stride correctly and keep x,y."""
    import struct
    # POINT M (2001): x=1, y=2, m=9
    b = struct.pack("<BI3d", 1, 2001, 1.0, 2.0, 9.0)
    g = wkb.decode(b)
    assert g.gtype == wkb.POINT
    np.testing.assert_array_equal(g.rings[0], [[1.0, 2.0]])
    # LINESTRING ZM (3002): 2 points x 4 values
    b = struct.pack("<BII8d", 1, 3002, 2,
                    0.0, 0.0, 5.0, 7.0, 3.0, 4.0, 5.0, 7.0)
    g = wkb.decode(b)
    np.testing.assert_array_equal(g.rings[0], [[0.0, 0.0], [3.0, 4.0]])


def test_circularstring_linearizes_to_half_circle():
    """CIRCULARSTRING (0 0, 1 1, 2 0): half circle of radius 1 around
    (1, 0) — linearized points must all sit on that circle and the length
    must approach pi."""
    import struct
    b = struct.pack("<BII6d", 1, 8, 3, 0.0, 0.0, 1.0, 1.0, 2.0, 0.0)
    g = wkb.decode(b)
    assert g.gtype == wkb.LINESTRING
    r = g.rings[0]
    assert len(r) > 20
    d = np.hypot(r[:, 0] - 1.0, r[:, 1])
    np.testing.assert_allclose(d, 1.0, atol=1e-9)
    seg = np.diff(r, axis=0)
    length = np.hypot(seg[:, 0], seg[:, 1]).sum()
    assert abs(length - np.pi) < 0.01
    np.testing.assert_allclose(r[0], [0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(r[-1], [2.0, 0.0], atol=1e-9)


def test_curvepolygon_area():
    """CURVEPOLYGON with a full-circle CIRCULARSTRING ring -> polygon whose
    area approaches pi*r^2."""
    import struct
    # circle radius 2 centered (0,0): arcs (2,0)->(0,2)->(-2,0)->(0,-2)->(2,0)
    ring = struct.pack("<BII10d", 1, 8, 5,
                       2.0, 0.0, 0.0, 2.0, -2.0, 0.0, 0.0, -2.0, 2.0, 0.0)
    b = struct.pack("<BII", 1, 10, 1) + ring
    g = wkb.decode(b)
    assert g.gtype == wkb.POLYGON
    from gdal_spark.core import geomops
    assert abs(geomops.geom_area(g) - np.pi * 4) < 0.02


# ---------------------------------------------------------------------------
# ISO curve model: decode(curves=True) preserves types 8-12 byte-for-byte
# ---------------------------------------------------------------------------

def test_curve_decode_preserves_and_roundtrips():
    import numpy as np

    from gdal_spark.core import wkb as W
    cs = W.circularstring([(0, 0), (3, 3), (6, 0), (9, -3), (12, 0)])
    g = W.decode(cs, curves=True)
    assert g.gtype == W.CIRCULARSTRING and len(g.rings[0]) == 5
    assert W.encode(g) == cs
    # default decode still linearizes, identically to linearize_geom
    lin = W.linearize_geom(g)
    leg = W.decode(cs)
    assert lin.gtype == W.LINESTRING
    assert np.array_equal(lin.rings[0], leg.rings[0])

    cc = W.compoundcurve([("line", [(0, 0), (10, 0)]),
                          ("arc", [(10, 0), (13, 3), (16, 0)])])
    g2 = W.decode(cc, curves=True)
    assert g2.gtype == W.COMPOUNDCURVE
    assert [p.gtype for p in g2.parts] == [W.LINESTRING,
                                           W.CIRCULARSTRING]
    assert W.encode(g2) == cc
    assert np.array_equal(W.linearize_geom(g2).rings[0],
                          W.decode(cc).rings[0])

    ring = W.Geom(W.COMPOUNDCURVE, parts=[
        W.Geom(W.LINESTRING, [np.array([(16., 0.), (0., 0.)])]),
        W.Geom(W.CIRCULARSTRING, [np.array([(0., 0.), (8., 8.),
                                            (16., 0.)])])])
    cp = W.curvepolygon([ring])
    g3 = W.decode(cp, curves=True)
    assert g3.gtype == W.CURVEPOLYGON and W.encode(g3) == cp
    l3 = W.linearize_geom(g3)
    assert l3.gtype == W.POLYGON
    assert np.array_equal(l3.rings[0], W.decode(cp).rings[0])
    # linearized curve-polygon ring is closed
    assert np.array_equal(l3.rings[0][0], l3.rings[0][-1])

    mc = W.encode(W.Geom(W.MULTICURVE, parts=[
        W.decode(cs, curves=True),
        W.Geom(W.LINESTRING, [np.array([(0., 0.), (1., 1.)])])]))
    g4 = W.decode(mc, curves=True)
    assert g4.gtype == W.MULTICURVE and W.encode(g4) == mc
    assert W.linearize_geom(g4).gtype == W.MULTILINESTRING

    ms = W.encode(W.Geom(W.MULTISURFACE, parts=[g3]))
    g5 = W.decode(ms, curves=True)
    assert g5.gtype == W.MULTISURFACE and W.encode(g5) == ms
    assert W.linearize_geom(g5).gtype == W.MULTIPOLYGON


def test_circularstring_constructor_validates():
    import pytest as _pytest

    from gdal_spark.core import wkb as W
    with _pytest.raises(ValueError):
        W.circularstring([(0, 0), (1, 1)])          # even / short
    with _pytest.raises(ValueError):
        W.circularstring([(0, 0), (1, 1), (2, 0), (3, -1)])
