"""chain_edges / build_polygon_from_edges / line_merge —
OGRBuildPolygonFromEdges (ogr/ogrgeometryfactory.cpp:446) and GEOS
LineMerger twins, plus their ST_ SQL registrations."""

import numpy as np
import pytest

from gdal_spark.core import wkb
from gdal_spark.core.geomops import (build_polygon_from_edges, chain_edges,
                                     line_merge, ring_area)


def _seg(a, b):
    return np.array([a, b], dtype=np.float64)


def test_chain_edges_shuffled_reversed_square():
    e = [_seg((1, 0), (0, 0)), _seg((1, 1), (1, 0)),
         _seg((0, 1), (1, 1)), _seg((0, 0), (0, 1))]
    rings = chain_edges(e)
    assert len(rings) == 1
    assert abs(abs(ring_area(rings[0])) - 1.0) < 1e-12
    # canonical start: lexicographically smallest vertex
    assert rings[0][0].tolist() == [0.0, 0.0]


def test_chain_edges_order_invariant():
    ring = np.array([[0, 0], [2, 0], [3, 1], [2, 2], [0, 2], [0, 0]],
                    dtype=np.float64)
    edges = [_seg(ring[k], ring[k + 1]) for k in range(len(ring) - 1)]
    a = chain_edges(edges)
    b = chain_edges([e[::-1] for e in reversed(edges)])
    assert np.array_equal(a[0], b[0])


def test_chain_edges_unclosable_raises():
    with pytest.raises(ValueError):
        chain_edges([_seg((0, 0), (1, 0)), _seg((1, 0), (2, 0))])


def test_build_polygon_with_hole():
    outer = [_seg((0, 0), (4, 0)), _seg((4, 0), (4, 4)),
             _seg((4, 4), (0, 4)), _seg((0, 4), (0, 0))]
    inner = [_seg((1, 1), (2, 1)), _seg((2, 1), (2, 2)),
             _seg((2, 2), (1, 2)), _seg((1, 2), (1, 1))]
    g = build_polygon_from_edges(outer + inner)
    assert g.gtype == wkb.POLYGON
    assert len(g.rings) == 2
    assert ring_area(g.rings[0]) > 0       # shell CCW
    assert ring_area(g.rings[1]) < 0       # hole CW
    assert abs(ring_area(g.rings[0]) - 16.0) < 1e-12
    assert abs(ring_area(g.rings[1]) + 1.0) < 1e-12


def test_chain_edges_tolerance():
    e = [_seg((0, 0), (1, 0)), _seg((1.0 + 1e-7, 0), (1, 1)),
         _seg((1, 1), (0, 0))]
    with pytest.raises(ValueError):
        chain_edges(e)
    rings = chain_edges(e, tolerance=1e-5)
    assert len(rings) == 1


def test_line_merge_degree2_chain_and_branch():
    m = line_merge([_seg((0, 0), (1, 0)), _seg((1, 0), (2, 0)),
                    _seg((2, 0), (3, 0)), _seg((2, 0), (2, 1))])
    # (2,0) has degree 3: merge stops there
    assert len(m) == 3
    assert m[0].tolist() == [[0, 0], [1, 0], [2, 0]]


def test_line_merge_direction_invariant():
    a = line_merge([_seg((0, 0), (1, 1)), _seg((1, 1), (2, 0))])
    b = line_merge([_seg((2, 0), (1, 1)), _seg((1, 1), (0, 0))])
    assert len(a) == len(b) == 1
    assert np.array_equal(a[0], b[0])


def test_st_functions_sql(spark):
    from gdal_spark.functions import st
    st.register_all(spark)
    parts = [wkb.Geom(wkb.LINESTRING, [_seg((0, 0), (3, 0))]),
             wkb.Geom(wkb.LINESTRING, [_seg((3, 0), (3, 2))]),
             wkb.Geom(wkb.LINESTRING, [_seg((0, 2), (3, 2))]),
             wkb.Geom(wkb.LINESTRING, [_seg((0, 0), (0, 2))])]
    ml = wkb.encode(wkb.Geom(wkb.MULTILINESTRING, parts=parts))
    df = spark.createDataFrame([(bytearray(ml),)], "g binary")
    df.createOrReplaceTempView("t_edges")
    row = spark.sql(
        "SELECT ST_Area(ST_Polygonize(g)) AS a, "
        "ST_GeometryType(ST_LineMerge(g)) AS t FROM t_edges").collect()[0]
    assert abs(row.a - 6.0) < 1e-12
    assert row.t == "LINESTRING"      # closed ring merges into one line
