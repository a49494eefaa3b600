"""Full 8-predicate surface vs hand-derived DE-9IM truth.

Reference semantics: OGRGeometry Equals (ogrgeometry.cpp:1251), Touches
(:5661), Crosses (:5734), Overlaps (:5989), plus the already-covered
Intersects/Within/Contains/Disjoint; fixture spirit follows
/root/reference/autotest/ogr/ogr_geom.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.core import geomops, wkb


def G(b):
    return wkb.decode(b)


SQ = G(wkb.box(0, 0, 10, 10))                      # base square
SQ_OVER = G(wkb.box(5, 5, 15, 15))                 # overlapping
SQ_EDGE = G(wkb.box(10, 0, 20, 10))                # shares the x=10 edge
SQ_CORNER = G(wkb.box(10, 10, 20, 20))             # touches at (10,10)
SQ_SAME = G(wkb.box(0, 0, 10, 10))
SQ_IN = G(wkb.box(2, 2, 8, 8))                     # strictly inside
SQ_FAR = G(wkb.box(50, 50, 60, 60))
L_CROSS = G(wkb.linestring([(-5, 5), (15, 5)]))    # crosses SQ
L_EDGE = G(wkb.linestring([(10, 2), (10, 8)]))     # along SQ's right edge
L_OUT = G(wkb.linestring([(20, 20), (30, 30)]))
L_A = G(wkb.linestring([(0, 0), (10, 10)]))
L_B = G(wkb.linestring([(0, 10), (10, 0)]))        # proper crossing with L_A
L_SHARE_END = G(wkb.linestring([(10, 10), (20, 0)]))   # endpoint of L_A
L_COLL = G(wkb.linestring([(5, 5), (15, 15)]))     # collinear overlap w/ L_A
L_SAME = G(wkb.linestring([(0, 0), (10, 10)]))
L_TJUNC = G(wkb.linestring([(5, 5), (5, -5)]))     # endpoint on L_A interior
P_IN = G(wkb.point(5, 5))
P_ON = G(wkb.point(10, 5))                         # on SQ boundary
P_OUT = G(wkb.point(30, 30))
MP_STRADDLE = G(wkb.encode(wkb.Geom(wkb.MULTIPOINT, parts=[
    wkb.Geom(wkb.POINT, [np.array([[5.0, 5.0]])]),
    wkb.Geom(wkb.POINT, [np.array([[30.0, 30.0]])])])))


CASES = [
    # (a, b, intersects, touches, crosses, overlaps, equals, contains, within)
    ("sq/overlap", SQ, SQ_OVER, True, False, False, True, False, False, False),
    ("sq/edge", SQ, SQ_EDGE, True, True, False, False, False, False, False),
    ("sq/corner", SQ, SQ_CORNER, True, True, False, False, False, False, False),
    ("sq/same", SQ, SQ_SAME, True, False, False, False, True, True, True),
    ("sq/inside", SQ, SQ_IN, True, False, False, False, False, True, False),
    ("sq/far", SQ, SQ_FAR, False, False, False, False, False, False, False),
    ("line-cross-sq", L_CROSS, SQ, True, False, True, False, False, False, False),
    ("line-on-edge", L_EDGE, SQ, True, True, False, False, False, False, False),
    ("line-out", L_OUT, SQ, False, False, False, False, False, False, False),
    ("lines-cross", L_A, L_B, True, False, True, False, False, False, False),
    ("lines-share-end", L_A, L_SHARE_END, True, True, False, False, False, False, False),
    ("lines-collinear", L_A, L_COLL, True, False, False, True, False, False, False),
    ("lines-same", L_A, L_SAME, True, False, False, False, True, True, True),
    ("line-tjunction", L_TJUNC, L_A, True, True, False, False, False, False, False),
    ("pt-in-sq", P_IN, SQ, True, False, False, False, False, False, True),
    ("pt-on-sq", P_ON, SQ, True, True, False, False, False, False, False),
    ("pt-out-sq", P_OUT, SQ, False, False, False, False, False, False, False),
    ("mp-straddle-sq", MP_STRADDLE, SQ, True, False, True, False, False, False, False),
]


@pytest.mark.parametrize("name,a,b,i,t,c,o,e,cn,wn",
                         CASES, ids=[c[0] for c in CASES])
def test_predicate_matrix(name, a, b, i, t, c, o, e, cn, wn):
    assert geomops.geom_intersects(a, b) is i, "intersects"
    assert geomops.geom_intersects(b, a) is i, "intersects sym"
    assert geomops.geom_touches(a, b) is t, "touches"
    assert geomops.geom_touches(b, a) is t, "touches sym"
    assert geomops.geom_crosses(a, b) is c, "crosses"
    assert geomops.geom_crosses(b, a) is c, "crosses sym"
    assert geomops.geom_overlaps(a, b) is o, "overlaps"
    assert geomops.geom_overlaps(b, a) is o, "overlaps sym"
    assert geomops.geom_equals(a, b) is e, "equals"
    assert geomops.geom_equals(b, a) is e, "equals sym"
    assert geomops.geom_contains(a, b) is cn, "contains"
    assert geomops.geom_within(a, b) is wn, "within"
    assert geomops.geom_within(b, a) is cn, "within=contains-flipped"


def test_equals_ignores_structure():
    """Equals is geometric, not structural: same square with redundant
    collinear vertex and different start point."""
    a = G(wkb.polygon([(0, 0), (10, 0), (10, 10), (0, 10)]))
    b = G(wkb.polygon([(10, 0), (10, 10), (5, 10), (0, 10), (0, 0), (5, 0)]))
    assert geomops.geom_equals(a, b)


def test_touches_hole_boundary():
    """Polygon sitting exactly inside a hole touches the holed polygon."""
    a = G(wkb.polygon([(0, 0), (20, 0), (20, 20), (0, 20)],
                      holes=[[(5, 5), (15, 5), (15, 15), (5, 15)]]))
    b = G(wkb.box(5, 5, 15, 15))   # fills the hole exactly
    assert geomops.geom_touches(a, b)
    assert not geomops.geom_overlaps(a, b)


def test_overlaps_multipolygon():
    a = G(wkb.multipolygon([[[(0, 0), (4, 0), (4, 4), (0, 4)]],
                            [[(10, 0), (14, 0), (14, 4), (10, 4)]]]))
    b = G(wkb.box(2, 0, 12, 4))
    assert geomops.geom_overlaps(a, b)


def test_predicate_batch_lane_matches_scalar_on_boundary_points():
    """The point-vs-polygon batch lane (functions/st.py _predicate_batch)
    must agree with the scalar DE-9IM kernel including ON-boundary and
    vertex-coincident points (it reuses the same points_in_polygon /
    _points_on_lines_mask helpers)."""
    import numpy as np
    import pandas as pd
    from gdal_spark.core import geomops, wkb
    from gdal_spark.functions.st import _predicate_batch

    poly = wkb.encode(wkb.Geom(wkb.POLYGON, [np.array(
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], np.float64),
        np.array([[4, 4], [4, 6], [6, 6], [6, 4], [4, 4]], np.float64)]))
    pts = [(5.0, 1.0),    # inside shell
           (5.0, 5.0),    # inside hole -> outside
           (0.0, 5.0),    # on shell edge
           (0.0, 0.0),    # on shell vertex
           (4.0, 5.0),    # on hole edge
           (20.0, 20.0),  # far outside (envelope short-circuit)
           (10.0, 10.0)]  # on far corner
    a = pd.Series([wkb.encode(wkb.Geom(wkb.POINT,
                                       [np.array([[x, y]])]))
                   for x, y in pts])
    b = pd.Series([poly] * len(pts))
    lane = list(_predicate_batch(a, b, geomops.geom_intersects, False,
                                 point_lane="intersects"))
    scalar = [geomops.geom_intersects(wkb.decode(bytes(g)),
                                      wkb.decode(poly))
              for g in a]
    assert lane == scalar
    lane_d = list(_predicate_batch(a, b, geomops.geom_disjoint, True,
                                   point_lane="disjoint"))
    assert lane_d == [not v for v in scalar]
    # mixed batch (a polygon amid the points) must fall back and still
    # agree with the scalar kernel
    a2 = pd.concat([a, pd.Series([poly])], ignore_index=True)
    b2 = pd.concat([b, pd.Series([poly])], ignore_index=True)
    lane2 = list(_predicate_batch(a2, b2, geomops.geom_intersects, False,
                                  point_lane="intersects"))
    assert lane2 == scalar + [True]
