"""Coordinate transforms for the warp pipeline — pure numpy, vectorized.

The reference chains dst px -> dst georef -> PROJ CT -> src georef -> src px
(/root/reference/alg/gdaltransformer.cpp:1348 GDALCreateGenImgProjTransformer).
We support the CRS pair the tiling stack needs — EPSG:4326 (lon/lat degrees)
and EPSG:3857 (spherical mercator meters) — with the same spherical formulas
as core.tilemath, plus an error-bounded APPROXIMATE mesh option mirroring
GDALCreateApproxTransformer (alg/gdaltransformer.cpp:3788): transform a
coarse subgrid exactly, bilinear-interpolate the interior, and fall back to
exact where the interpolation error exceeds the tolerance (0.125 px default).
"""

from __future__ import annotations

import numpy as np

from ..core.tilemath import EARTH_RADIUS

_D2R = np.pi / 180.0


def transform(src_crs: str, dst_crs: str, x, y):
    """Vectorized CRS transform. Supported: 'EPSG:4326', 'EPSG:3857'."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if src_crs == dst_crs:
        return x, y
    if (src_crs, dst_crs) == ("EPSG:4326", "EPSG:3857"):
        mx = EARTH_RADIUS * x * _D2R
        my = EARTH_RADIUS * np.log(np.tan(np.pi / 4.0 + y * _D2R / 2.0))
        return mx, my
    if (src_crs, dst_crs) == ("EPSG:3857", "EPSG:4326"):
        lon = x / (EARTH_RADIUS * _D2R)
        lat = (2.0 * np.arctan(np.exp(y / EARTH_RADIUS)) - np.pi / 2.0) / _D2R
        return lon, lat
    raise ValueError(f"unsupported CRS pair {src_crs} -> {dst_crs}")


def approx_mesh(src_crs: str, dst_crs: str, xs: np.ndarray, ys: np.ndarray,
                step: int = 16, tol_px: float = 0.125,
                px_size: float = 1.0):
    """Approximate transform of a regular (H, W) mesh: exact on every
    `step`-th node, bilinear in between, exact re-fix where error > tol.

    Returns (tx, ty, n_exact, n_total) — the counters evidence how much exact
    CT work the approximation saved (the reference's ApproxTransformer idea).
    """
    H, W = xs.shape
    gi = np.unique(np.r_[np.arange(0, H, step), H - 1])
    gj = np.unique(np.r_[np.arange(0, W, step), W - 1])
    cx, cy = transform(src_crs, dst_crs, xs[np.ix_(gi, gj)], ys[np.ix_(gi, gj)])

    # bilinear interpolation of the coarse grid onto the full mesh
    fi = np.interp(np.arange(H), gi, np.arange(len(gi)))
    fj = np.interp(np.arange(W), gj, np.arange(len(gj)))
    i0 = np.clip(np.floor(fi).astype(int), 0, len(gi) - 2)
    j0 = np.clip(np.floor(fj).astype(int), 0, len(gj) - 2)
    wi = (fi - i0)[:, None]
    wj = (fj - j0)[None, :]

    def bil(c):
        return ((1 - wi) * (1 - wj) * c[np.ix_(i0, j0)]
                + (1 - wi) * wj * c[np.ix_(i0, j0 + 1)]
                + wi * (1 - wj) * c[np.ix_(i0 + 1, j0)]
                + wi * wj * c[np.ix_(i0 + 1, j0 + 1)])

    tx, ty = bil(cx), bil(cy)

    # error check on a validation sub-lattice (midpoints), exact re-fix
    vi = np.clip((gi[:-1] + gi[1:]) // 2, 0, H - 1)
    vj = np.clip((gj[:-1] + gj[1:]) // 2, 0, W - 1)
    ex, ey = transform(src_crs, dst_crs, xs[np.ix_(vi, vj)], ys[np.ix_(vi, vj)])
    err = np.hypot(tx[np.ix_(vi, vj)] - ex, ty[np.ix_(vi, vj)] - ey)
    n_exact = len(gi) * len(gj) + len(vi) * len(vj)
    bad = err > tol_px * px_size
    if bad.any():
        # refine: exact-transform every row/col block that failed validation
        rows = np.unique(np.where(bad)[0])
        for r in rows:
            sl = slice(gi[r], gi[r + 1] + 1)
            tx[sl], ty[sl] = transform(src_crs, dst_crs, xs[sl], ys[sl])
            n_exact += (sl.stop - sl.start) * W
    return tx, ty, n_exact, H * W
