"""gdal_grid interpolation algorithms vs numpy brute force.

Reference: alg/gdalgrid.cpp (GDALGridInverseDistanceToAPower,
GDALGridMovingAverage, GDALGridNearestNeighbor, data metrics).
"""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.raster.gridding import grid_interpolate

X0, Y0, DX, DY, NX, NY, R = 0.0, 0.0, 1.0, 1.0, 12, 10, 2.5


@pytest.fixture(scope="module")
def pts_pdf():
    rng = np.random.default_rng(8)
    n = 300
    return pd.DataFrame({
        "x": rng.uniform(-1, NX + 1, n),
        "y": rng.uniform(-1, NY + 1, n),
        "z": rng.uniform(0, 100, n),
    })


def brute(pts, algorithm, power=2.0):
    out = {}
    for i in range(NX):
        for j in range(NY):
            cx, cy = X0 + (i + 0.5) * DX, Y0 + (j + 0.5) * DY
            d = np.hypot(pts.x.values - cx, pts.y.values - cy)
            m = d <= R
            if not m.any():
                continue
            z = pts.z.values[m]
            dd = d[m]
            if algorithm == "invdist":
                if (dd == 0).any():
                    out[(i, j)] = float(z[dd == 0][0])
                else:
                    w = dd ** -power
                    out[(i, j)] = float((w * z).sum() / w.sum())
            elif algorithm == "average":
                out[(i, j)] = float(z.mean())
            elif algorithm == "count":
                out[(i, j)] = float(m.sum())
            elif algorithm == "min":
                out[(i, j)] = float(z.min())
            elif algorithm == "max":
                out[(i, j)] = float(z.max())
            elif algorithm == "nearest":
                k = np.lexsort((z, dd))[0]
                out[(i, j)] = float(z[k])
    return out


@pytest.mark.parametrize("algorithm", ["invdist", "average", "count",
                                       "min", "max", "nearest"])
def test_grid_algorithms_match_brute_force(spark, pts_pdf, algorithm):
    df = spark.createDataFrame(pts_pdf)
    got = {(r.i, r.j): r.value for r in grid_interpolate(
        df, X0, Y0, DX, DY, NX, NY, radius=R,
        algorithm=algorithm).collect()}
    want = brute(pts_pdf, algorithm)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), (k, algorithm)


# ---------------------------------------------------------------------------
# round 2: linear (Delaunay) interpolation — alg/gdalgrid.cpp GDALGridLinear
# ---------------------------------------------------------------------------

def test_grid_linear_reproduces_plane(spark):
    """Any valid triangulation interpolates an affine field exactly — the
    implementation-independent invariant, checked through the DISTRIBUTED
    multi-block path."""
    import pandas as pd
    from gdal_spark.raster.gridding import grid_linear
    rng = np.random.RandomState(9)
    pts = rng.uniform(0, 64, (500, 2))
    pdf = pd.DataFrame({"x": pts[:, 0], "y": pts[:, 1],
                        "z": 2.0 + 0.5 * pts[:, 0] - 0.25 * pts[:, 1]})
    df = spark.createDataFrame(pdf)
    out = grid_linear(df, x0=0.0, y0=0.0, dx=1.0, dy=1.0, nx=64, ny=64,
                      block=16, margin=16.0)
    rows = out.collect()
    assert len(rows) > 2000           # most of the grid is inside the hull
    for r in rows:
        want = 2.0 + 0.5 * (r.i + 0.5) - 0.25 * (r.j + 0.5)
        assert abs(r.value - want) < 1e-9, (r.i, r.j)


def test_grid_linear_outside_hull_absent(spark):
    import pandas as pd
    from gdal_spark.raster.gridding import grid_linear
    # points only in the left half
    rng = np.random.RandomState(2)
    pts = rng.uniform(0, 30, (200, 2))
    pdf = pd.DataFrame({"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 0]})
    df = spark.createDataFrame(pdf)
    out = grid_linear(df, x0=0.0, y0=0.0, dx=1.0, dy=1.0, nx=64, ny=64,
                      block=64)
    rows = out.collect()
    assert all(r.i < 31 for r in rows)
    assert len(rows) > 0


def test_delaunay_empty_circumcircle():
    from gdal_spark.core.delaunay import _circumcircles, delaunay
    rng = np.random.RandomState(4)
    pts = rng.uniform(-50, 50, (300, 2))
    tris = delaunay(pts)
    ctr, r2 = _circumcircles(pts, tris.astype(np.int64))
    for k in range(len(tris)):
        d2 = ((pts - ctr[k]) ** 2).sum(1)
        inside = d2 < r2[k] * (1 - 1e-9) - 1e-9
        inside[tris[k]] = False
        assert not inside.any(), f"triangle {k} violates Delaunay"


# ---------------------------------------------------------------------------
# round 3: data-metrics family in one pass — alg/gdalgrid.cpp:1722 ff.
# ---------------------------------------------------------------------------

def test_grid_data_metrics_match_brute_force(spark, pts_pdf):
    from gdal_spark.raster.gridding import grid_data_metrics
    df = spark.createDataFrame(pts_pdf)
    got = {(r.i, r.j): r for r in grid_data_metrics(
        df, X0, Y0, DX, DY, NX, NY, radius=R).collect()}
    want_cnt = brute(pts_pdf, "count")
    want_min = brute(pts_pdf, "min")
    want_max = brute(pts_pdf, "max")
    want_avg = brute(pts_pdf, "average")
    assert set(got) == set(want_cnt)
    for k, r in got.items():
        assert r.n == int(want_cnt[k])
        assert r.zmin == pytest.approx(want_min[k], rel=1e-12)
        assert r.zmax == pytest.approx(want_max[k], rel=1e-12)
        assert r.zrange == pytest.approx(want_max[k] - want_min[k], rel=1e-9)
        assert r.zavg == pytest.approx(want_avg[k], rel=1e-12)
        cx, cy = X0 + (k[0] + 0.5) * DX, Y0 + (k[1] + 0.5) * DY
        d = np.hypot(pts_pdf.x.values - cx, pts_pdf.y.values - cy)
        assert r.dmin == pytest.approx(float(d[d <= R].min()), rel=1e-12)
