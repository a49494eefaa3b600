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
