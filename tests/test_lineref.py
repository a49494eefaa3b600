"""ogrlineref twin (apps/ogrlineref.cpp): locate / interpolate / parts."""

import numpy as np

from gdal_spark.operators.lineref import (create_parts, interpolate_point,
                                          locate_points, locate_points_df)

L = np.array([[0.0, 0.0], [50.0, 0.0], [50.0, 40.0]])


def test_locate_points_analytic():
    m, d = locate_points(L, [10.0, 50.0, 55.0, -3.0, 50.0],
                         [5.0, 20.0, 10.0, 4.0, 45.0])
    np.testing.assert_allclose(m, [10.0, 70.0, 60.0, 0.0, 90.0])
    np.testing.assert_allclose(d, [5.0, 0.0, 5.0, 5.0, 5.0])


def test_interpolate_point_roundtrip():
    ms = np.array([0.0, 25.0, 50.0, 72.5, 90.0, 120.0])
    x, y = interpolate_point(L, ms)
    np.testing.assert_allclose(x, [0, 25, 50, 50, 50, 50])
    np.testing.assert_allclose(y, [0, 0, 0, 22.5, 40, 40])
    # locating an on-line point returns its milepost exactly
    m2, d2 = locate_points(L, x[:5], y[:5])
    np.testing.assert_allclose(m2, ms[:5])
    np.testing.assert_allclose(d2, 0.0, atol=1e-12)


def test_create_parts_step():
    parts = create_parts(L, 30.0)
    assert [(p[0], p[1]) for p in parts] == [(0.0, 30.0), (30.0, 60.0),
                                             (60.0, 90.0)]
    # the middle part crosses the corner vertex: it must be preserved
    np.testing.assert_allclose(parts[1][2],
                               [[30, 0], [50, 0], [50, 10]])
    total = sum(np.hypot(*np.diff(p[2], axis=0).T).sum() for p in parts)
    np.testing.assert_allclose(total, 90.0)


def test_locate_points_df(spark):
    df = spark.createDataFrame([(1, 10.0, 5.0), (2, 55.0, 10.0)],
                               "id long, x double, y double")
    rows = {r.id: r for r in locate_points_df(df, L).collect()}
    assert rows[1].mpos == 10.0 and rows[1].offset == 5.0
    assert rows[2].mpos == 60.0 and rows[2].offset == 5.0
