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

import os
import re

import numpy as np

from ..core.tilemath import EARTH_RADIUS

_D2R = np.pi / 180.0


def transform(src_crs: str, dst_crs: str, x, y):
    """Vectorized CRS transform, chained through EPSG:4326 (the transformer
    chain of alg/gdaltransformer.cpp:1348). Supported: 'EPSG:4326',
    'EPSG:3857' (spherical mercator), 'EPSG:326xx'/'EPSG:327xx' (UTM
    north/south, ellipsoidal Krueger-series Transverse Mercator),
    'EPSG:3035' (LAEA Europe) and generic 'LAEA:lon0,lat0'."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if src_crs == dst_crs:
        return x, y
    # fitted transformers (GCP polynomial / TPS) on either chain end —
    # the reference's GENIMGPROJ GCP/TPS variants (gdaltransformer.cpp:1348)
    if _is_fitted_crs(src_crs):
        target, fwd = _fitted(src_crs, True)
        x, y = fwd(x, y)
        return transform(target, dst_crs, x, y)
    if _is_fitted_crs(dst_crs):
        target, inv = _fitted(dst_crs, False)
        x, y = transform(src_crs, target, x, y)
        return inv(x, y)
    lon, lat = _to_4326(src_crs, x, y)
    return _from_4326(dst_crs, lon, lat)


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


# ---------------------------------------------------------------------------
# ellipsoidal CRS support beyond the spherical-mercator pair
# (reference chains arbitrary PROJ CTs at alg/gdaltransformer.cpp:1348;
#  pyproj is unavailable in this environment, so the two workhorse families
#  are implemented from the public formulas: Transverse Mercator via the
#  6th-order Krueger series [Krueger 1912; Karney, J. Geodesy 2011] and
#  Lambert Azimuthal Equal-Area via the authalic-latitude form
#  [Snyder, Map Projections: A Working Manual, USGS PP 1395, 1987])
# ---------------------------------------------------------------------------

_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_E2 = _WGS84_F * (2.0 - _WGS84_F)
_E = np.sqrt(_E2)
_N = _WGS84_F / (2.0 - _WGS84_F)

# Krueger series coefficients (6th order in n) — public series
_A_BAR = _WGS84_A / (1 + _N) * (1 + _N ** 2 / 4 + _N ** 4 / 64
                                + _N ** 6 / 256)
_ALPHA = [
    _N / 2 - 2 * _N ** 2 / 3 + 5 * _N ** 3 / 16 + 41 * _N ** 4 / 180
    - 127 * _N ** 5 / 288 + 7891 * _N ** 6 / 37800,
    13 * _N ** 2 / 48 - 3 * _N ** 3 / 5 + 557 * _N ** 4 / 1440
    + 281 * _N ** 5 / 630 - 1983433 * _N ** 6 / 1935360,
    61 * _N ** 3 / 240 - 103 * _N ** 4 / 140 + 15061 * _N ** 5 / 26880
    + 167603 * _N ** 6 / 181440,
    49561 * _N ** 4 / 161280 - 179 * _N ** 5 / 168
    + 6601661 * _N ** 6 / 7257600,
    34729 * _N ** 5 / 80640 - 3418889 * _N ** 6 / 1995840,
    212378941 * _N ** 6 / 319334400,
]
_BETA = [
    _N / 2 - 2 * _N ** 2 / 3 + 37 * _N ** 3 / 96 - _N ** 4 / 360
    - 81 * _N ** 5 / 512 + 96199 * _N ** 6 / 604800,
    _N ** 2 / 48 + _N ** 3 / 15 - 437 * _N ** 4 / 1440
    + 46 * _N ** 5 / 105 - 1118711 * _N ** 6 / 3870720,
    17 * _N ** 3 / 480 - 37 * _N ** 4 / 840 - 209 * _N ** 5 / 4480
    + 5569 * _N ** 6 / 90720,
    4397 * _N ** 4 / 161280 - 11 * _N ** 5 / 504
    - 830251 * _N ** 6 / 7257600,
    4583 * _N ** 5 / 161280 - 108847 * _N ** 6 / 3991680,
    20648693 * _N ** 6 / 638668800,
]
_TM_K0 = 0.9996


def tm_coeffs(a: float, f: float):
    """Krueger 6th-order series coefficients for an arbitrary ellipsoid:
    (A_bar, alpha[6], beta[6], e, e2). The WGS84 module constants above are
    this function evaluated at (WGS84_A, WGS84_F) — pinned by test."""
    return _tm_coeffs_cached(float(a), float(f))


def _tm_series(n: float):
    alpha = [
        n / 2 - 2 * n ** 2 / 3 + 5 * n ** 3 / 16 + 41 * n ** 4 / 180
        - 127 * n ** 5 / 288 + 7891 * n ** 6 / 37800,
        13 * n ** 2 / 48 - 3 * n ** 3 / 5 + 557 * n ** 4 / 1440
        + 281 * n ** 5 / 630 - 1983433 * n ** 6 / 1935360,
        61 * n ** 3 / 240 - 103 * n ** 4 / 140 + 15061 * n ** 5 / 26880
        + 167603 * n ** 6 / 181440,
        49561 * n ** 4 / 161280 - 179 * n ** 5 / 168
        + 6601661 * n ** 6 / 7257600,
        34729 * n ** 5 / 80640 - 3418889 * n ** 6 / 1995840,
        212378941 * n ** 6 / 319334400,
    ]
    beta = [
        n / 2 - 2 * n ** 2 / 3 + 37 * n ** 3 / 96 - n ** 4 / 360
        - 81 * n ** 5 / 512 + 96199 * n ** 6 / 604800,
        n ** 2 / 48 + n ** 3 / 15 - 437 * n ** 4 / 1440
        + 46 * n ** 5 / 105 - 1118711 * n ** 6 / 3870720,
        17 * n ** 3 / 480 - 37 * n ** 4 / 840 - 209 * n ** 5 / 4480
        + 5569 * n ** 6 / 90720,
        4397 * n ** 4 / 161280 - 11 * n ** 5 / 504
        - 830251 * n ** 6 / 7257600,
        4583 * n ** 5 / 161280 - 108847 * n ** 6 / 3991680,
        20648693 * n ** 6 / 638668800,
    ]
    return alpha, beta


def _tm_coeffs_impl(a: float, f: float):
    n = f / (2.0 - f)
    e2 = f * (2.0 - f)
    a_bar = a / (1 + n) * (1 + n ** 2 / 4 + n ** 4 / 64 + n ** 6 / 256)
    alpha, beta = _tm_series(n)
    return a_bar, alpha, beta, float(np.sqrt(e2)), e2


from functools import lru_cache as _tm_lru


@_tm_lru(maxsize=None)
def _tm_coeffs_cached(a: float, f: float):
    return _tm_coeffs_impl(a, f)


def _tm_xi0(lat0: float, alpha, e) -> float:
    """Rectifying latitude of the projection origin: the meridian-arc
    offset M0 = k0*A_bar*xi0 subtracted when lat_0 != 0 (EPSG 9807
    'Transverse Mercator' natural-origin northing)."""
    if lat0 == 0.0:
        return 0.0
    s0 = np.sin(lat0 * _D2R)
    t0 = np.sinh(np.arctanh(s0) - e * np.arctanh(e * s0))
    xi_p0 = np.arctan(t0)
    xi0 = xi_p0
    for j, aj in enumerate(alpha, start=1):
        xi0 = xi0 + aj * np.sin(2 * j * xi_p0)
    return float(xi0)


def tm_forward(lon, lat, lon0: float, k0: float = _TM_K0,
               fe: float = 500000.0, fn: float = 0.0,
               ellps: tuple[float, float] | None = None,
               lat0: float = 0.0):
    """Ellipsoidal Transverse Mercator forward (Krueger series, ~nm
    accuracy within a UTM zone). ``ellps=(a, f)`` selects a non-WGS84
    ellipsoid (e.g. Airy 1830 for OSGB36 grids); ``lat0`` the latitude of
    natural origin (its meridian arc is subtracted from the northing)."""
    if ellps is None:
        a_bar, alpha, e, e2 = _A_BAR, _ALPHA, _E, _E2
    else:
        a_bar, alpha, _beta, e, e2 = tm_coeffs(*ellps)
    if lat0 != 0.0:
        fn = fn - k0 * a_bar * _tm_xi0(lat0, alpha, e)
    lam = (np.asarray(lon, dtype=np.float64) - lon0) * _D2R
    phi = np.asarray(lat, dtype=np.float64) * _D2R
    sphi = np.sin(phi)
    # conformal latitude tangent
    t = np.sinh(np.arctanh(sphi) - e * np.arctanh(e * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, aj in enumerate(alpha, start=1):
        xi = xi + aj * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta = eta + aj * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return fe + k0 * a_bar * eta, fn + k0 * a_bar * xi


def tm_inverse(x, y, lon0: float, k0: float = _TM_K0,
               fe: float = 500000.0, fn: float = 0.0,
               ellps: tuple[float, float] | None = None,
               lat0: float = 0.0):
    """Ellipsoidal Transverse Mercator inverse (Krueger series + Newton
    iteration for the conformal-to-geodetic latitude)."""
    if ellps is None:
        a_bar, beta, e, e2 = _A_BAR, _BETA, _E, _E2
        alpha = _ALPHA
    else:
        a_bar, alpha, beta, e, e2 = tm_coeffs(*ellps)
    if lat0 != 0.0:
        fn = fn - k0 * a_bar * _tm_xi0(lat0, alpha, e)
    eta = (np.asarray(x, dtype=np.float64) - fe) / (k0 * a_bar)
    xi = (np.asarray(y, dtype=np.float64) - fn) / (k0 * a_bar)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(beta, start=1):
        xi_p = xi_p - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p = eta_p - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    # Newton: solve tau (= tan phi) such that conformal tangent == tau_p
    tau = tau_p.copy()
    for _ in range(6):
        sig = np.sinh(e * np.arctanh(e * tau / np.sqrt(1 + tau * tau)))
        tau_i = tau * np.sqrt(1 + sig * sig) \
            - sig * np.sqrt(1 + tau * tau)
        dtau = (tau_p - tau_i) * (1 + (1 - e2) * tau * tau) \
            / ((1 - e2) * np.sqrt((1 + tau_i * tau_i)
                                  * (1 + tau * tau)))
        tau = tau + dtau
    phi = np.arctan(tau)
    return lon0 + lam / _D2R, phi / _D2R


# ---------------------------------------------------------------------------
# datum shifts: ellipsoid table + geocentric (Helmert) transformation
# (reference: OGRCoordinateTransformation assembles the PROJ pipeline
#  ogr/ogrct.cpp:919-948; the 3/7-parameter geocentric chain here follows
#  the classic PROJ +towgs84 position-vector semantics
#  pj_geocentric_to_wgs84 / pj_geocentric_from_wgs84. Grid-file shifts
#  (NTv2/NADCON, e.g. NAD27) need grid data this container does not carry
#  — documented out of scope; Helmert covers the common national datums.)
# ---------------------------------------------------------------------------

ELLIPSOIDS: dict[str, tuple[float, float]] = {
    # name -> (a, f)
    "WGS84":    (6378137.0, 1.0 / 298.257223563),
    "GRS80":    (6378137.0, 1.0 / 298.257222101),
    "airy":     (6377563.396, 1.0 / 299.3249646),
    "mod_airy": (6377340.189, 1.0 / 299.3249646),
    "intl":     (6378388.0, 1.0 / 297.0),
    "bessel":   (6377397.155, 1.0 / 299.1528128),
    "clrk66":   (6378206.4, 1.0 - 6356583.8 / 6378206.4),
    "krass":    (6378245.0, 1.0 / 298.3),
    "evrstSS":  (6377298.556, 1.0 / 300.8017),   # Everest (Sabah/Sarawak)
    "GRS67":    (6378160.0, 1.0 / 298.247167427),
}

# +datum= shorthand -> (ellps_name, towgs84 7-tuple) — the classic PROJ
# datum table entries that are pure Helmert (grid-shift datums excluded).
DATUM_DEFS: dict[str, tuple[str, tuple[float, ...]]] = {
    "WGS84": ("WGS84", (0.0,) * 7),
    "OSGB36": ("airy", (446.448, -125.157, 542.060,
                        0.1502, 0.2470, 0.8421, -20.4894)),
    "ire65": ("mod_airy", (482.530, -130.596, 564.557,
                           -1.042, -0.214, -0.631, 8.15)),
    "GGRS87": ("GRS80", (-199.87, 74.79, 246.62, 0.0, 0.0, 0.0, 0.0)),
    "potsdam": ("bessel", (598.1, 73.7, 418.2,
                           0.202, 0.045, -2.455, 6.7)),
    "hermannskogel": ("bessel", (577.326, 90.129, 463.919,
                                 5.137, 1.474, 5.297, 2.4232)),
    "nzgd49": ("intl", (59.47, -5.04, 187.44,
                        0.47, -0.1, 1.024, -4.5993)),
}

_AS2R = np.pi / (180.0 * 3600.0)       # arcsec -> radians


def geodetic_to_geocentric(lon, lat, a: float, f: float):
    """(lon, lat) degrees at h=0 -> geocentric (X, Y, Z) meters."""
    lam = np.asarray(lon, np.float64) * _D2R
    phi = np.asarray(lat, np.float64) * _D2R
    e2 = f * (2.0 - f)
    sphi = np.sin(phi)
    nn = a / np.sqrt(1.0 - e2 * sphi * sphi)
    cphi = np.cos(phi)
    return (nn * cphi * np.cos(lam), nn * cphi * np.sin(lam),
            nn * (1.0 - e2) * sphi)


def geocentric_to_geodetic(x, y, z, a: float, f: float, iters: int = 4):
    """Geocentric (X, Y, Z) -> (lon, lat) degrees, fixed-point latitude
    iteration (exactly ``iters`` rounds so an external SQL oracle can
    replay the identical arithmetic; 4 rounds converge to <1e-11 rad)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    e2 = f * (2.0 - f)
    p = np.sqrt(x * x + y * y)
    lam = np.arctan2(y, x)
    phi = np.arctan2(z, p * (1.0 - e2))
    for _ in range(iters):
        sphi = np.sin(phi)
        nn = a / np.sqrt(1.0 - e2 * sphi * sphi)
        phi = np.arctan2(z + e2 * nn * sphi, p)
    return lam / _D2R, phi / _D2R


def helmert_to_wgs84(x, y, z, p: tuple[float, ...]):
    """Geocentric source-datum -> WGS84, position-vector convention
    (dx dy dz meters, rx ry rz arcsec, s ppm):
      X' = M*(X - rz*Y + ry*Z) + dx   with M = 1 + s*1e-6."""
    dx, dy, dz = p[0], p[1], p[2]
    rx, ry, rz = (v * _AS2R for v in p[3:6]) if len(p) > 3 else (0., 0., 0.)
    m = 1.0 + (p[6] * 1e-6 if len(p) > 6 else 0.0)
    if len(p) == 3 or (rx == ry == rz == 0.0 and m == 1.0):
        return x + dx, y + dy, z + dz
    return (m * (x - rz * y + ry * z) + dx,
            m * (rz * x + y - rx * z) + dy,
            m * (-ry * x + rx * y + z) + dz)


def helmert_from_wgs84(x, y, z, p: tuple[float, ...]):
    """WGS84 geocentric -> source datum: the classic small-angle reverse
    (un-translate, un-scale, transposed rotation)."""
    dx, dy, dz = p[0], p[1], p[2]
    rx, ry, rz = (v * _AS2R for v in p[3:6]) if len(p) > 3 else (0., 0., 0.)
    m = 1.0 + (p[6] * 1e-6 if len(p) > 6 else 0.0)
    if len(p) == 3 or (rx == ry == rz == 0.0 and m == 1.0):
        return x - dx, y - dy, z - dz
    xt = (x - dx) / m
    yt = (y - dy) / m
    zt = (z - dz) / m
    return (xt + rz * yt - ry * zt,
            -rz * xt + yt + rx * zt,
            ry * xt - rx * yt + zt)


def _is_wgs84_ellps(a: float, f: float) -> bool:
    """WGS84 and GRS80 are treated as identical (flattening differs at
    1e-10 — sub-0.1mm; the repo's NAD83/ETRS89 kernels already do so)."""
    return abs(a - 6378137.0) < 1e-6 and f != 0.0 \
        and abs(1.0 / f - 298.2572) < 1e-3


def _datum_identity(ellps: tuple[float, float],
                    towgs84: tuple[float, ...] | None) -> bool:
    return _is_wgs84_ellps(*ellps) and (
        towgs84 is None or all(v == 0.0 for v in towgs84))


def _authalic_q(sphi):
    return (1 - _E2) * (sphi / (1 - _E2 * sphi * sphi)
                        - np.log((1 - _E * sphi) / (1 + _E * sphi))
                        / (2 * _E))


_QP = float(_authalic_q(np.float64(1.0)))
_RQ = _WGS84_A * np.sqrt(_QP / 2.0)


def laea_forward(lon, lat, lon0: float, lat0: float,
                 fe: float = 0.0, fn: float = 0.0):
    """Ellipsoidal Lambert Azimuthal Equal-Area forward (Snyder 1987,
    eqs. 24-2..24-14: authalic latitude on the authalic sphere)."""
    lam = (np.asarray(lon, dtype=np.float64) - lon0) * _D2R
    phi = np.asarray(lat, dtype=np.float64) * _D2R
    q = _authalic_q(np.sin(phi))
    beta = np.arcsin(np.clip(q / _QP, -1.0, 1.0))
    q0 = _authalic_q(np.sin(lat0 * _D2R))
    beta0 = np.arcsin(np.clip(q0 / _QP, -1.0, 1.0))
    sb0, cb0 = np.sin(beta0), np.cos(beta0)
    # Snyder's D: shape correction so the projection stays equal-area
    m0 = np.cos(lat0 * _D2R) / np.sqrt(1 - _E2 * np.sin(lat0 * _D2R) ** 2)
    d = _WGS84_A * m0 / (_RQ * cb0) if cb0 > 1e-12 else 1.0
    denom = 1 + sb0 * np.sin(beta) + cb0 * np.cos(beta) * np.cos(lam)
    with np.errstate(divide="ignore", invalid="ignore"):
        b = _RQ * np.sqrt(2.0 / denom)
    x = fe + b * d * np.cos(beta) * np.sin(lam)
    y = fn + (b / d) * (cb0 * np.sin(beta)
                        - sb0 * np.cos(beta) * np.cos(lam))
    return x, y


def laea_inverse(x, y, lon0: float, lat0: float,
                 fe: float = 0.0, fn: float = 0.0):
    """Ellipsoidal LAEA inverse (Snyder 1987, eqs. 24-16..24-21 + the
    authalic-to-geodetic latitude series 3-18)."""
    xx = (np.asarray(x, dtype=np.float64) - fe)
    yy = (np.asarray(y, dtype=np.float64) - fn)
    q0 = _authalic_q(np.sin(lat0 * _D2R))
    beta0 = np.arcsin(np.clip(q0 / _QP, -1.0, 1.0))
    sb0, cb0 = np.sin(beta0), np.cos(beta0)
    m0 = np.cos(lat0 * _D2R) / np.sqrt(1 - _E2 * np.sin(lat0 * _D2R) ** 2)
    d = _WGS84_A * m0 / (_RQ * cb0) if cb0 > 1e-12 else 1.0
    rho = np.sqrt((xx / d) ** 2 + (d * yy) ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        ce = 2 * np.arcsin(np.clip(rho / (2 * _RQ), -1.0, 1.0))
        sce, cce = np.sin(ce), np.cos(ce)
        beta = np.where(
            rho > 1e-12,
            np.arcsin(np.clip(cce * sb0 + (d * yy * sce * cb0)
                              / np.where(rho == 0, 1.0, rho), -1, 1)),
            beta0)
        lam = np.arctan2(xx * sce,
                         d * rho * cb0 * cce - d * d * yy * sb0 * sce)
    # authalic -> geodetic latitude (Snyder 3-18 series)
    e2, e4, e6 = _E2, _E2 ** 2, _E2 ** 3
    phi = beta + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) \
        * np.sin(2 * beta) \
        + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta) \
        + (761 * e6 / 45360) * np.sin(6 * beta)
    return lon0 + lam / _D2R, phi / _D2R


# ---------------------------------------------------------------------------
# Conic + polar families (Snyder 1987; the reference resolves these through
# the PROJ method table, ogr/ogrct.cpp:919-948): Lambert Conformal Conic
# (1SP and 2SP), Albers Equal-Area and Polar Stereographic (variant A with
# k0 at the pole, variant B with a standard parallel). All ellipsoidal on
# WGS84/GRS80 (the two differ by ~1e-10 in flattening — sub-mm).
# ---------------------------------------------------------------------------

def _wrap_rad(lam):
    """Wrap a longitude difference into (-pi, pi] (PROJ's adjlon)."""
    return lam - 2 * np.pi * np.floor((lam + np.pi) / (2 * np.pi))


def _conf_m(phi):
    """Snyder 14-15: radius of the parallel / a."""
    sphi = np.sin(phi)
    return np.cos(phi) / np.sqrt(1 - _E2 * sphi * sphi)


def _conf_t(phi):
    """Snyder 15-9: isometric co-latitude function t(phi)."""
    sphi = np.sin(phi)
    return np.tan(np.pi / 4 - phi / 2) \
        / ((1 - _E * sphi) / (1 + _E * sphi)) ** (_E / 2)


def _phi_from_t(t):
    """Snyder 7-9 fixed-point: geodetic latitude from t (conformal)."""
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(15):
        sphi = np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(
            t * ((1 - _E * sphi) / (1 + _E * sphi)) ** (_E / 2))
    return phi


def _phi_from_q(q):
    """Authalic -> geodetic latitude (Snyder 3-18 series)."""
    beta = np.arcsin(np.clip(q / _QP, -1.0, 1.0))
    e2, e4, e6 = _E2, _E2 ** 2, _E2 ** 3
    return beta + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) \
        * np.sin(2 * beta) \
        + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta) \
        + (761 * e6 / 45360) * np.sin(6 * beta)


def lcc_constants(lat0: float, lat1: float, lat2: float,
                  k0: float = 1.0):
    """-> (n, aF, rho0) for LCC (Snyder 15-1..15-3): scalar projection
    constants. 1SP = lat1 == lat2 (n = sin(lat1), k0 scales); these are
    inlined into the SQL oracles so Spark and DuckDB run literally the
    same per-row formula."""
    p0, p1, p2 = (np.float64(v) * _D2R for v in (lat0, lat1, lat2))
    t0, t1, t2 = _conf_t(p0), _conf_t(p1), _conf_t(p2)
    if abs(lat1 - lat2) < 1e-12:
        n = float(np.sin(p1))
    else:
        n = float((np.log(_conf_m(p1)) - np.log(_conf_m(p2)))
                  / (np.log(t1) - np.log(t2)))
    f_ = float(_conf_m(p1) / (n * t1 ** n))
    a_f = _WGS84_A * k0 * f_
    rho0 = float(a_f * t0 ** n)
    return n, a_f, rho0


def lcc_forward(lon, lat, lon0: float, lat0: float, lat1: float,
                lat2: float, k0: float = 1.0,
                fe: float = 0.0, fn: float = 0.0):
    """Ellipsoidal Lambert Conformal Conic forward (Snyder 15-1..15-7)."""
    n, a_f, rho0 = lcc_constants(lat0, lat1, lat2, k0)
    phi = np.asarray(lat, np.float64) * _D2R
    th = n * _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    rho = a_f * _conf_t(phi) ** n
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def lcc_inverse(x, y, lon0: float, lat0: float, lat1: float,
                lat2: float, k0: float = 1.0,
                fe: float = 0.0, fn: float = 0.0):
    """Ellipsoidal LCC inverse (Snyder 15-10 + 7-9 iteration)."""
    n, a_f, rho0 = lcc_constants(lat0, lat1, lat2, k0)
    xx = np.asarray(x, np.float64) - fe
    yy = rho0 - (np.asarray(y, np.float64) - fn)
    rho = np.sign(n) * np.sqrt(xx * xx + yy * yy)
    th = np.arctan2(np.sign(n) * xx, np.sign(n) * yy)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (rho / a_f) ** (1.0 / n)
    phi = _phi_from_t(t)
    lon = _wrap_rad(lon0 * _D2R + th / n) / _D2R
    return lon, phi / _D2R


def aea_constants(lat0: float, lat1: float, lat2: float):
    """-> (n, C, rho0) for Albers (Snyder 14-14..14-16)."""
    p0, p1, p2 = (np.float64(v) * _D2R for v in (lat0, lat1, lat2))
    m1, m2 = _conf_m(p1), _conf_m(p2)
    q0, q1, q2 = (_authalic_q(np.sin(p)) for p in (p0, p1, p2))
    if abs(lat1 - lat2) < 1e-12:
        n = float(np.sin(p1))
    else:
        n = float((m1 * m1 - m2 * m2) / (q2 - q1))
    c = float(m1 * m1 + n * q1)
    rho0 = float(_WGS84_A * np.sqrt(c - n * q0) / n)
    return n, c, rho0


def aea_forward(lon, lat, lon0: float, lat0: float, lat1: float,
                lat2: float, fe: float = 0.0, fn: float = 0.0):
    """Ellipsoidal Albers Equal-Area forward (Snyder 14-1..14-4)."""
    n, c, rho0 = aea_constants(lat0, lat1, lat2)
    phi = np.asarray(lat, np.float64) * _D2R
    th = n * _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    q = _authalic_q(np.sin(phi))
    rho = _WGS84_A * np.sqrt(c - n * q) / n
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def aea_inverse(x, y, lon0: float, lat0: float, lat1: float,
                lat2: float, fe: float = 0.0, fn: float = 0.0):
    """Ellipsoidal Albers inverse (Snyder 14-19 + 3-18 series)."""
    n, c, rho0 = aea_constants(lat0, lat1, lat2)
    xx = np.asarray(x, np.float64) - fe
    yy = rho0 - (np.asarray(y, np.float64) - fn)
    rho = np.sign(n) * np.sqrt(xx * xx + yy * yy)
    th = np.arctan2(np.sign(n) * xx, np.sign(n) * yy)
    q = (c - (rho * n / _WGS84_A) ** 2) / n
    lon = _wrap_rad(lon0 * _D2R + th / n) / _D2R
    return lon, _phi_from_q(q) / _D2R


def stere_scale(lat_ts: float | None, k0: float = 1.0) -> float:
    """Polar stereographic radial constant: rho = scale * t(phi).
    Variant A (k0 at the pole, EPSG 9810): 2 a k0 / sqrt((1+e)^(1+e)
    (1-e)^(1-e)); variant B (standard parallel lat_ts, EPSG 9829, e.g.
    EPSG:3413/3031): a m(ts) / t(ts)."""
    if lat_ts is None or abs(abs(lat_ts) - 90.0) < 1e-12:
        return float(2 * _WGS84_A * k0 / np.sqrt(
            (1 + _E) ** (1 + _E) * (1 - _E) ** (1 - _E)))
    pts = np.float64(abs(lat_ts)) * _D2R
    return float(_WGS84_A * _conf_m(pts) / _conf_t(pts))


def stere_forward(lon, lat, lon0: float, lat_ts: float | None = None,
                  k0: float = 1.0, south: bool = False,
                  fe: float = 0.0, fn: float = 0.0):
    """Ellipsoidal polar stereographic forward (Snyder 21-33/34; south
    aspect mirrors latitude and the y axis)."""
    s = stere_scale(lat_ts, k0)
    lam = (np.asarray(lon, np.float64) - lon0) * _D2R
    phi = np.asarray(lat, np.float64) * _D2R
    rho = s * _conf_t(-phi if south else phi)
    x = fe + rho * np.sin(lam)
    y = fn + (rho * np.cos(lam) if south else -rho * np.cos(lam))
    return x, y


def stere_inverse(x, y, lon0: float, lat_ts: float | None = None,
                  k0: float = 1.0, south: bool = False,
                  fe: float = 0.0, fn: float = 0.0):
    """Ellipsoidal polar stereographic inverse (Snyder 21-39/40 + 7-9)."""
    s = stere_scale(lat_ts, k0)
    xx = np.asarray(x, np.float64) - fe
    yy = np.asarray(y, np.float64) - fn
    rho = np.sqrt(xx * xx + yy * yy)
    phi = _phi_from_t(rho / s)
    lam = np.arctan2(xx, yy if south else -yy)
    lat = -phi / _D2R if south else phi / _D2R
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, lat


def _conf_t_e(phi, e: float):
    """t(phi) (Snyder 15-9) for an arbitrary eccentricity."""
    sphi = np.sin(phi)
    return np.tan(np.pi / 4 - phi / 2) \
        / ((1 - e * sphi) / (1 + e * sphi)) ** (e / 2)


def _phi_from_t_e(t, e: float):
    """Snyder 7-9 fixed-point for an arbitrary eccentricity."""
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(15):
        sphi = np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(
            t * ((1 - e * sphi) / (1 + e * sphi)) ** (e / 2))
    return phi


def sterea_constants(lat0: float, ellps: tuple[float, float]):
    """Oblique (double) stereographic constants — EPSG method 9809
    (Guidance Note 7-2 §3.2.5; PROJ sterea; the projection of the Dutch
    RD grid): ellipsoid -> conformal sphere of radius R = sqrt(rho0 nu0),
    then spherical stereographic about the conformal origin chi0."""
    a, f = ellps
    e2 = f * (2.0 - f)
    e = np.sqrt(e2)
    p0 = lat0 * _D2R
    s0 = np.sin(p0)
    nu0 = a / np.sqrt(1 - e2 * s0 * s0)
    rho0 = a * (1 - e2) / (1 - e2 * s0 * s0) ** 1.5
    big_r = np.sqrt(rho0 * nu0)
    n = np.sqrt(1 + e2 * np.cos(p0) ** 4 / (1 - e2))
    s1 = (1 + s0) / (1 - s0)
    s2 = (1 - e * s0) / (1 + e * s0)
    w1 = (s1 * s2 ** e) ** n
    sin_chi0 = (w1 - 1) / (w1 + 1)
    c = (n + s0) * (1 - sin_chi0) / ((n - s0) * (1 + sin_chi0))
    w2 = c * w1
    chi0 = np.arcsin((w2 - 1) / (w2 + 1))
    return big_r, n, c, chi0, e, e2


def sterea_forward(lon, lat, lon0: float, lat0: float, k0: float = 1.0,
                   fe: float = 0.0, fn: float = 0.0,
                   ellps: tuple[float, float] | None = None):
    """Oblique stereographic forward (EPSG 9809 worked example:
    Amersfoort / RD New)."""
    big_r, n, c, chi0, e, _ = sterea_constants(lat0,
                                               ellps or ELLIPSOIDS["WGS84"])
    lam0 = lon0 * _D2R
    phi = np.asarray(lat, np.float64) * _D2R
    d_lam = n * _wrap_rad(np.asarray(lon, np.float64) * _D2R - lam0)
    sphi = np.sin(phi)
    sa = (1 + sphi) / (1 - sphi)
    sb = (1 - e * sphi) / (1 + e * sphi)
    w = c * (sa * sb ** e) ** n
    chi = np.arcsin((w - 1) / (w + 1))
    b = 1 + np.sin(chi) * np.sin(chi0) \
        + np.cos(chi) * np.cos(chi0) * np.cos(d_lam)
    x = fe + 2 * big_r * k0 * np.cos(chi) * np.sin(d_lam) / b
    y = fn + 2 * big_r * k0 * (np.sin(chi) * np.cos(chi0)
                               - np.cos(chi) * np.sin(chi0)
                               * np.cos(d_lam)) / b
    return x, y


def sterea_inverse(x, y, lon0: float, lat0: float, k0: float = 1.0,
                   fe: float = 0.0, fn: float = 0.0,
                   ellps: tuple[float, float] | None = None):
    """Oblique stereographic inverse (EPSG 9809; Gauss latitude solved by
    the GN 7-2 isometric-latitude Newton iteration)."""
    big_r, n, c, chi0, e, e2 = sterea_constants(
        lat0, ellps or ELLIPSOIDS["WGS84"])
    lam0 = lon0 * _D2R
    ep = np.asarray(x, np.float64) - fe
    npr = np.asarray(y, np.float64) - fn
    g = 2 * big_r * k0 * np.tan(np.pi / 4 - chi0 / 2)
    h = 4 * big_r * k0 * np.tan(chi0) + g
    i = np.arctan2(ep, h + npr)
    j = np.arctan2(ep, g - npr) - i
    chi = chi0 + 2 * np.arctan((npr - ep * np.tan(j / 2))
                               / (2 * big_r * k0))
    d_lam = (j + 2 * i) / n
    psi = 0.5 * np.log((1 + np.sin(chi)) / (c * (1 - np.sin(chi)))) / n
    phi = 2 * np.arctan(np.exp(psi)) - np.pi / 2
    for _ in range(6):
        sphi = np.sin(phi)
        psi_i = np.log(np.tan(phi / 2 + np.pi / 4)
                       * ((1 - e * sphi) / (1 + e * sphi)) ** (e / 2))
        phi = phi - (psi_i - psi) * np.cos(phi) \
            * (1 - e2 * sphi * sphi) / (1 - e2)
    return _wrap_rad(lam0 + d_lam) / _D2R, phi / _D2R


def omerc_constants(lonc: float, latc: float, alpha: float,
                    k0: float, ellps: tuple[float, float]):
    """Hotine Oblique Mercator constants — EPSG methods 9812 (variant A)
    and 9815 (variant B); Snyder ch. 9. alpha is the azimuth of the
    initial line at the projection centre."""
    a, f = ellps
    e2 = f * (2.0 - f)
    e = np.sqrt(e2)
    pc = latc * _D2R
    sc = np.sin(pc)
    big_b = np.sqrt(1 + e2 * np.cos(pc) ** 4 / (1 - e2))
    big_a = a * big_b * k0 * np.sqrt(1 - e2) / (1 - e2 * sc * sc)
    t0 = _conf_t_e(pc, e)
    big_d = big_b * np.sqrt(1 - e2) \
        / (np.cos(pc) * np.sqrt(1 - e2 * sc * sc))
    d2 = max(float(big_d) ** 2, 1.0)
    sgn = 1.0 if latc >= 0 else -1.0
    big_f = big_d + np.sqrt(d2 - 1) * sgn
    big_h = big_f * t0 ** big_b
    big_g = (big_f - 1.0 / big_f) / 2.0
    ac = alpha * _D2R
    gamma0 = np.arcsin(np.sin(ac) / big_d)
    # alpha = 90 deg makes G tan(gamma0) exactly 1 analytically (the
    # Swiss/Hungarian special case); clip the float residue
    lam0 = lonc * _D2R - np.arcsin(
        np.clip(big_g * np.tan(gamma0), -1.0, 1.0)) / big_b
    if abs(alpha) == 90.0:         # GN 7-2 special case (Swiss/Hungarian)
        uc = big_a * (lonc * _D2R - lam0)
    else:
        uc = (big_a / big_b) * np.arctan2(np.sqrt(d2 - 1), np.cos(ac)) * sgn
    return big_a, big_b, big_h, gamma0, lam0, uc, e, sgn


def omerc_forward(lon, lat, lonc: float, latc: float, alpha: float,
                  gamma: float, k0: float = 1.0,
                  fe: float = 0.0, fn: float = 0.0,
                  variant_b: bool = True,
                  ellps: tuple[float, float] | None = None):
    """Hotine Oblique Mercator forward (EPSG 9812/9815 worked example:
    Timbalai 1948 / RSO Borneo). gamma is the rectified-grid angle."""
    big_a, big_b, big_h, gamma0, lam0, uc, e, sgn = omerc_constants(
        lonc, latc, alpha, k0, ellps or ELLIPSOIDS["WGS84"])
    phi = np.asarray(lat, np.float64) * _D2R
    d_lam = big_b * _wrap_rad(np.asarray(lon, np.float64) * _D2R - lam0)
    t = _conf_t_e(phi, e)
    q = big_h / t ** big_b
    s = (q - 1.0 / q) / 2.0
    big_t = (q + 1.0 / q) / 2.0
    v = np.sin(d_lam)
    u_n = (-v * np.cos(gamma0) + s * np.sin(gamma0)) / big_t
    v_c = big_a * np.log((1 - u_n) / (1 + u_n)) / (2 * big_b)
    u_c = big_a * np.arctan2(s * np.cos(gamma0) + v * np.sin(gamma0),
                             np.cos(d_lam)) / big_b
    if variant_b:
        u_c = u_c - abs(uc) * sgn
    gr = gamma * _D2R
    x = fe + v_c * np.cos(gr) + u_c * np.sin(gr)
    y = fn + u_c * np.cos(gr) - v_c * np.sin(gr)
    return x, y


def omerc_inverse(x, y, lonc: float, latc: float, alpha: float,
                  gamma: float, k0: float = 1.0,
                  fe: float = 0.0, fn: float = 0.0,
                  variant_b: bool = True,
                  ellps: tuple[float, float] | None = None):
    """Hotine Oblique Mercator inverse (EPSG 9812/9815)."""
    big_a, big_b, big_h, gamma0, lam0, uc, e, sgn = omerc_constants(
        lonc, latc, alpha, k0, ellps or ELLIPSOIDS["WGS84"])
    gr = gamma * _D2R
    xx = np.asarray(x, np.float64) - fe
    yy = np.asarray(y, np.float64) - fn
    v_c = xx * np.cos(gr) - yy * np.sin(gr)
    u_c = yy * np.cos(gr) + xx * np.sin(gr)
    if variant_b:
        u_c = u_c + abs(uc) * sgn
    q = np.exp(-big_b * v_c / big_a)
    s = (q - 1.0 / q) / 2.0
    big_t = (q + 1.0 / q) / 2.0
    bu = big_b * u_c / big_a
    v = np.sin(bu)
    u_n = (v * np.cos(gamma0) + s * np.sin(gamma0)) / big_t
    t = (big_h / np.sqrt((1 + u_n) / (1 - u_n))) ** (1.0 / big_b)
    phi = _phi_from_t_e(t, e)
    lam = lam0 - np.arctan2(s * np.cos(gamma0) - v * np.sin(gamma0),
                            np.cos(bu)) / big_b
    return _wrap_rad(lam) / _D2R, phi / _D2R


def krovak_constants(latc: float, alpha: float, lat_p: float, k_p: float,
                     ellps: tuple[float, float]):
    """Krovak oblique conformal conic constants — EPSG method 9819
    (Guidance Note 7-2 §3.2.2; the S-JTSK grid of the Czech and Slovak
    republics). latc = latitude of projection centre, alpha = co-latitude
    of the cone axis, lat_p = latitude of the pseudo standard parallel,
    k_p = scale on it."""
    a, f = ellps
    e2 = f * (2.0 - f)
    e = np.sqrt(e2)
    pc = latc * _D2R
    sc = np.sin(pc)
    big_a = a * np.sqrt(1 - e2) / (1 - e2 * sc * sc)
    big_b = np.sqrt(1 + e2 * np.cos(pc) ** 4 / (1 - e2))
    gamma0 = np.arcsin(sc / big_b)
    t0 = np.tan(np.pi / 4 + gamma0 / 2) \
        * ((1 + e * sc) / (1 - e * sc)) ** (e * big_b / 2) \
        / np.tan(np.pi / 4 + pc / 2) ** big_b
    n = np.sin(lat_p * _D2R)
    r0 = k_p * big_a / np.tan(lat_p * _D2R)
    return big_a, big_b, t0, n, r0, e


def krovak_forward(lon, lat, lon0: float, latc: float, alpha: float,
                   lat_p: float, k_p: float = 0.9999,
                   fe: float = 0.0, fn: float = 0.0,
                   ellps: tuple[float, float] | None = None):
    """Krovak forward (EPSG 9819), GIS axis convention (EPSG:5514:
    easting = -westing, northing = -southing, so Czech points land at
    roughly (-0.6e6, -1.2e6)). lon0 is Greenwich-referenced (the EPSG
    parameter 24d50' is East of Ferro; Ferro = 17d40' W of Greenwich)."""
    _, big_b, t0, n, r0, e = krovak_constants(
        latc, alpha, lat_p, k_p, ellps or ELLIPSOIDS["WGS84"])
    ac = alpha * _D2R
    phi = np.asarray(lat, np.float64) * _D2R
    sphi = np.sin(phi)
    u = 2 * (np.arctan(t0 * np.tan(phi / 2 + np.pi / 4) ** big_b
                       / ((1 + e * sphi) / (1 - e * sphi))
                       ** (e * big_b / 2)) - np.pi / 4)
    v = big_b * _wrap_rad((lon0 - np.asarray(lon, np.float64)) * _D2R)
    t = np.arcsin(np.clip(np.cos(ac) * np.sin(u)
                          + np.sin(ac) * np.cos(u) * np.cos(v),
                          -1.0, 1.0))
    # rotated longitude by full-quadrant atan2 (GN 7-2 prints the asin
    # form, which folds beyond 90 degrees of the cone axis)
    d = np.arctan2(np.cos(u) * np.sin(v),
                   np.cos(ac) * np.cos(u) * np.cos(v)
                   - np.sin(ac) * np.sin(u))
    theta = n * d
    r = r0 * np.tan(np.pi / 4 + lat_p * _D2R / 2) ** n \
        / np.tan(t / 2 + np.pi / 4) ** n
    southing = r * np.cos(theta)    # EPSG:2065 X (positive south)
    westing = r * np.sin(theta)     # EPSG:2065 Y (positive west)
    return fe - westing, fn - southing


def krovak_inverse(x, y, lon0: float, latc: float, alpha: float,
                   lat_p: float, k_p: float = 0.9999,
                   fe: float = 0.0, fn: float = 0.0,
                   ellps: tuple[float, float] | None = None):
    """Krovak inverse (EPSG 9819) from the GIS axis convention."""
    _, big_b, t0, n, r0, e = krovak_constants(
        latc, alpha, lat_p, k_p, ellps or ELLIPSOIDS["WGS84"])
    ac = alpha * _D2R
    westing = -(np.asarray(x, np.float64) - fe)
    southing = -(np.asarray(y, np.float64) - fn)
    r = np.hypot(westing, southing)
    theta = np.arctan2(westing, southing)
    d = theta / n
    t = 2 * (np.arctan((r0 / r) ** (1.0 / n)
                       * np.tan(np.pi / 4 + lat_p * _D2R / 2))
             - np.pi / 4)
    u = np.arcsin(np.clip(np.cos(ac) * np.sin(t)
                          - np.sin(ac) * np.cos(t) * np.cos(d),
                          -1.0, 1.0))
    v = np.arctan2(np.cos(t) * np.sin(d),
                   np.cos(ac) * np.cos(t) * np.cos(d)
                   + np.sin(ac) * np.sin(t))
    lam = lon0 * _D2R - v / big_b
    base = (np.tan(u / 2 + np.pi / 4) / t0) ** (1.0 / big_b)
    phi = u
    for _ in range(6):
        sphi = np.sin(phi)
        phi = 2 * (np.arctan(base * ((1 + e * sphi) / (1 - e * sphi))
                             ** (e / 2)) - np.pi / 4)
    return _wrap_rad(lam) / _D2R, phi / _D2R


# ---------------------------------------------------------------------------
# "World grid" long-tail families (Snyder 1987; the reference resolves all
# of these through the PROJ method table, ogr/ogrct.cpp:919-948): the
# equidistant cylindrical (EPSG 1028, Plate Carree), Lambert cylindrical
# equal-area (EPSG 9835 — the EASE-Grid 2.0 projection, EPSG:6933),
# sinusoidal (the MODIS land grid, +proj=sinu +R=6371007.181),
# Cassini-Soldner (EPSG 9806), American Polyconic (EPSG 9818) and the
# equidistant conic (+proj=eqdc). Every kernel is ellipsoid-parameterized
# (a, f) so spherical +R grids and legacy ellipsoids work; the meridian-arc
# series and its rectifying-latitude inverse are shared.
# ---------------------------------------------------------------------------

def merid_coeffs(e2: float):
    """Meridian-arc series coefficients (Snyder 3-21):
    M = a*(c0*phi - c2*sin 2phi + c4*sin 4phi - c6*sin 6phi)."""
    e4, e6 = e2 * e2, e2 * e2 * e2
    return (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256,
            3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024,
            15 * e4 / 256 + 45 * e6 / 1024,
            35 * e6 / 3072)


def merid_arc(phi, ellps: tuple[float, float]):
    """Meridian arc length M(phi) from the equator, phi in radians."""
    a, f = ellps
    c0, c2, c4, c6 = merid_coeffs(f * (2.0 - f))
    phi = np.asarray(phi, np.float64)
    return a * (c0 * phi - c2 * np.sin(2 * phi) + c4 * np.sin(4 * phi)
                - c6 * np.sin(6 * phi))


def phi_from_m(m, ellps: tuple[float, float]):
    """Footpoint latitude from a meridian arc (Snyder 3-26/7-19:
    rectifying-latitude series), radians."""
    a, f = ellps
    e2 = f * (2.0 - f)
    c0, _, _, _ = merid_coeffs(e2)
    mu = np.asarray(m, np.float64) / (a * c0)
    e1 = (1 - np.sqrt(1 - e2)) / (1 + np.sqrt(1 - e2))
    return mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu) \
        + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu) \
        + (151 * e1 ** 3 / 96) * np.sin(6 * mu) \
        + (1097 * e1 ** 4 / 512) * np.sin(8 * mu)


def _q_e(sphi, e: float):
    """Authalic q(phi) for an arbitrary eccentricity (Snyder 3-12);
    e -> 0 limit is 2*sin(phi) (the sphere)."""
    if e < 1e-12:
        return 2.0 * np.asarray(sphi, np.float64)
    e2 = e * e
    return (1 - e2) * (sphi / (1 - e2 * sphi * sphi)
                       - np.log((1 - e * sphi) / (1 + e * sphi)) / (2 * e))


def _nu_e(sphi, a: float, e2: float):
    """Prime-vertical radius of curvature nu(phi) (Snyder 4-20)."""
    return a / np.sqrt(1 - e2 * sphi * sphi)


def eqc_forward(lon, lat, lon0: float, lat1: float = 0.0,
                fe: float = 0.0, fn: float = 0.0,
                ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Equidistant Cylindrical forward (EPSG 1028 / Snyder ch. 12):
    x = nu(lat1) cos(lat1) lam, y = M(phi). lat1 = 0 is Plate Carree."""
    a, f = ellps
    e2 = f * (2.0 - f)
    p1 = lat1 * _D2R
    r1 = _nu_e(np.sin(p1), a, e2) * np.cos(p1)
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    return fe + r1 * lam, fn + merid_arc(phi, ellps)


def eqc_inverse(x, y, lon0: float, lat1: float = 0.0,
                fe: float = 0.0, fn: float = 0.0,
                ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    a, f = ellps
    e2 = f * (2.0 - f)
    p1 = lat1 * _D2R
    r1 = _nu_e(np.sin(p1), a, e2) * np.cos(p1)
    lam = (np.asarray(x, np.float64) - fe) / r1
    phi = phi_from_m(np.asarray(y, np.float64) - fn, ellps)
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R


def cea_forward(lon, lat, lon0: float, lat_ts: float = 0.0,
                fe: float = 0.0, fn: float = 0.0,
                ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Lambert Cylindrical Equal-Area forward (EPSG 9835 / Snyder
    10-1..10-2): k0 = m(lat_ts); x = a k0 lam, y = a q(phi) / (2 k0).
    EPSG:6933 (NSIDC EASE-Grid 2.0 Global) is lat_ts = 30 on WGS84."""
    a, f = ellps
    e2 = f * (2.0 - f)
    e = np.sqrt(e2)
    pts = lat_ts * _D2R
    k0 = np.cos(pts) / np.sqrt(1 - e2 * np.sin(pts) ** 2)
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    q = _q_e(np.sin(phi), e)
    return fe + a * k0 * lam, fn + a * q / (2 * k0)


def cea_inverse(x, y, lon0: float, lat_ts: float = 0.0,
                fe: float = 0.0, fn: float = 0.0,
                ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    a, f = ellps
    e2 = f * (2.0 - f)
    e = np.sqrt(e2)
    pts = lat_ts * _D2R
    k0 = np.cos(pts) / np.sqrt(1 - e2 * np.sin(pts) ** 2)
    lam = (np.asarray(x, np.float64) - fe) / (a * k0)
    q = 2 * k0 * (np.asarray(y, np.float64) - fn) / a
    if e < 1e-12:
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    else:
        qp = _q_e(np.float64(1.0), e)
        beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
        e4, e6 = e2 ** 2, e2 ** 3
        phi = beta + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) \
            * np.sin(2 * beta) \
            + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta) \
            + (761 * e6 / 45360) * np.sin(6 * beta)
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R


def sinu_forward(lon, lat, lon0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Sinusoidal forward (Snyder 25-1..25-2, ellipsoidal):
    x = a lam cos(phi) / sqrt(1 - e2 sin^2 phi), y = M(phi). The MODIS
    land grid is the spherical case (f = 0, a = 6371007.181)."""
    a, f = ellps
    e2 = f * (2.0 - f)
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    sphi = np.sin(phi)
    return (fe + a * lam * np.cos(phi) / np.sqrt(1 - e2 * sphi * sphi),
            fn + merid_arc(phi, ellps))


def sinu_inverse(x, y, lon0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    a, f = ellps
    e2 = f * (2.0 - f)
    phi = phi_from_m(np.asarray(y, np.float64) - fn, ellps)
    sphi = np.sin(phi)
    cphi = np.cos(phi)
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = np.where(
            np.abs(cphi) > 1e-12,
            (np.asarray(x, np.float64) - fe)
            * np.sqrt(1 - e2 * sphi * sphi) / (a * cphi), 0.0)
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R


def cass_forward(lon, lat, lon0: float, lat0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Cassini-Soldner forward (EPSG 9806 / Snyder 13-7..13-10)."""
    a, f = ellps
    e2 = f * (2.0 - f)
    ep2 = e2 / (1 - e2)
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    sphi, cphi = np.sin(phi), np.cos(phi)
    nu = _nu_e(sphi, a, e2)
    big_t = np.tan(phi) ** 2
    big_a = lam * cphi
    big_c = ep2 * cphi * cphi
    m = merid_arc(phi, ellps)
    m0 = merid_arc(np.float64(lat0 * _D2R), ellps)
    x = nu * (big_a - big_t * big_a ** 3 / 6
              - (8 - big_t + 8 * big_c) * big_t * big_a ** 5 / 120)
    y = m - m0 + nu * np.tan(phi) * (big_a ** 2 / 2
                                     + (5 - big_t + 6 * big_c)
                                     * big_a ** 4 / 24)
    return fe + x, fn + y


def cass_inverse(x, y, lon0: float, lat0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Cassini-Soldner inverse (Snyder 13-11..13-17)."""
    a, f = ellps
    e2 = f * (2.0 - f)
    m0 = merid_arc(np.float64(lat0 * _D2R), ellps)
    m1 = m0 + (np.asarray(y, np.float64) - fn)
    phi1 = phi_from_m(m1, ellps)
    sp1 = np.sin(phi1)
    t1 = np.tan(phi1) ** 2
    nu1 = _nu_e(sp1, a, e2)
    rho1 = a * (1 - e2) / (1 - e2 * sp1 * sp1) ** 1.5
    big_d = (np.asarray(x, np.float64) - fe) / nu1
    phi = phi1 - (nu1 * np.tan(phi1) / rho1) \
        * (big_d ** 2 / 2 - (1 + 3 * t1) * big_d ** 4 / 24)
    lam = (big_d - t1 * big_d ** 3 / 3
           + (1 + 3 * t1) * t1 * big_d ** 5 / 15) / np.cos(phi1)
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R


def poly_forward(lon, lat, lon0: float, lat0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """American Polyconic forward (EPSG 9818 / Snyder 18-12..18-14)."""
    a, f = ellps
    e2 = f * (2.0 - f)
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    m0 = merid_arc(np.float64(lat0 * _D2R), ellps)
    sphi = np.sin(phi)
    nu = _nu_e(sphi, a, e2)
    m = merid_arc(phi, ellps)
    big_e = lam * sphi
    with np.errstate(divide="ignore", invalid="ignore"):
        cot = np.cos(phi) / np.where(np.abs(sphi) < 1e-12, 1.0, sphi)
        x = np.where(np.abs(phi) < 1e-12, a * lam,
                     nu * cot * np.sin(big_e))
        y = np.where(np.abs(phi) < 1e-12, -m0,
                     m - m0 + nu * cot * (1 - np.cos(big_e)))
    return fe + x, fn + y


def poly_inverse(x, y, lon0: float, lat0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"],
                 iters: int = 12):
    """Polyconic inverse (Snyder 18-18..18-21, Newton on phi)."""
    a, f = ellps
    e2 = f * (2.0 - f)
    c0, c2, c4, c6 = merid_coeffs(e2)
    xx = np.asarray(x, np.float64) - fe
    yy = np.asarray(y, np.float64) - fn
    m0 = merid_arc(np.float64(lat0 * _D2R), ellps)
    big_a = (m0 + yy) / a
    big_b = xx * xx / (a * a) + big_a * big_a
    phi = np.asarray(big_a, np.float64).copy()
    for _ in range(iters):
        with np.errstate(divide="ignore", invalid="ignore"):
            sphi = np.sin(phi)
            big_c = np.sqrt(1 - e2 * sphi * sphi) * np.tan(phi)
            ma = merid_arc(phi, ellps) / a
            # dM/dphi / a (Snyder 18-17)
            mnp = c0 - 2 * c2 * np.cos(2 * phi) + 4 * c4 * np.cos(4 * phi) \
                - 6 * c6 * np.cos(6 * phi)
            # Newton step (Snyder 18-21); NaNs from the phi = 0 poles of
            # C and 1/sin(2 phi) zero the step (equator rows are exact)
            num = big_a * (big_c * ma + 1) - ma \
                - 0.5 * (ma * ma + big_b) * big_c
            den = e2 * np.sin(2 * phi) \
                * (ma * ma + big_b - 2 * big_a * ma) / (4 * big_c) \
                + (big_a - ma) * (big_c * mnp - 2 / np.sin(2 * phi)) - mnp
            step = num / den
        phi = phi - np.where(np.isfinite(step), step, 0.0)
    sphi = np.sin(phi)
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = np.where(
            np.abs(phi) < 1e-12, xx / a,
            np.arcsin(np.clip(xx * np.sqrt(1 - e2 * sphi * sphi)
                              * np.tan(phi) / a, -1, 1)) / sphi)
    # equator rows: phi stays 0, lam = x/a (Snyder 18-22)
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R


def eqdc_constants(lat0: float, lat1: float, lat2: float,
                   ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """-> (n, G, rho0) for the Equidistant Conic (Snyder 16-1..16-4)."""
    a, f = ellps
    e2 = f * (2.0 - f)
    p0, p1, p2 = (np.float64(v) * _D2R for v in (lat0, lat1, lat2))
    m1 = np.cos(p1) / np.sqrt(1 - e2 * np.sin(p1) ** 2)
    mm0, mm1, mm2 = (merid_arc(p, ellps) for p in (p0, p1, p2))
    if abs(lat1 - lat2) < 1e-12:
        n = float(np.sin(p1))
    else:
        m2 = np.cos(p2) / np.sqrt(1 - e2 * np.sin(p2) ** 2)
        n = float(a * (m1 - m2) / (mm2 - mm1))
    g = float(m1 / n + mm1 / a)
    rho0 = float(a * g - mm0)
    return n, g, rho0


def eqdc_forward(lon, lat, lon0: float, lat0: float, lat1: float,
                 lat2: float, fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Equidistant Conic forward (Snyder 16-1..16-6): meridian distances
    are exact (rho differences equal meridian-arc differences)."""
    a, _ = ellps
    n, g, rho0 = eqdc_constants(lat0, lat1, lat2, ellps)
    phi = np.asarray(lat, np.float64) * _D2R
    th = n * _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    rho = a * g - merid_arc(phi, ellps)
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def eqdc_inverse(x, y, lon0: float, lat0: float, lat1: float,
                 lat2: float, fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    a, _ = ellps
    n, g, rho0 = eqdc_constants(lat0, lat1, lat2, ellps)
    xx = np.asarray(x, np.float64) - fe
    yy = rho0 - (np.asarray(y, np.float64) - fn)
    rho = np.sign(n) * np.sqrt(xx * xx + yy * yy)
    th = np.arctan2(np.sign(n) * xx, np.sign(n) * yy)
    phi = phi_from_m(a * g - rho, ellps)
    return _wrap_rad(lon0 * _D2R + th / n) / _D2R, phi / _D2R


# ---------------------------------------------------------------------------
# World-map pseudo-cylindrical family (Snyder ch. 31/32 + Robinson 1974;
# PROJ treats all four as spherical projections on radius a): Mollweide,
# Eckert IV, Miller cylindrical and Robinson. Mollweide/Eckert solve
# their parametric angle with a fixed-count Newton iteration (quadratic
# convergence — 8 steps from theta0 = phi reach double precision; the
# SQL oracles replay the identical unrolled iteration). Robinson is
# Robinson's published 5-degree table evaluated through a natural cubic
# spline fitted at import time (PROJ ships precomputed spline
# coefficients for the same table; agreement is to the table's own
# precision, ~1e-4 of R).
# ---------------------------------------------------------------------------

_MOLL_ITERS = 8


def _moll_theta(phi):
    """Newton for 2 theta + sin 2 theta = pi sin phi (Snyder 31-3).
    The poles are the (removable) Newton singularity — patched to
    theta = +-pi/2 exactly; non-pole rows keep the plain iteration so
    SQL oracles can replay it verbatim."""
    phi = np.asarray(phi, np.float64)
    at_pole = np.abs(phi) >= np.pi / 2.0 - 1e-12
    th = np.where(at_pole, 0.0, phi)
    ps = np.pi * np.sin(phi)
    for _ in range(_MOLL_ITERS):
        th = th - (2.0 * th + np.sin(2.0 * th) - ps) \
            / (2.0 + 2.0 * np.cos(2.0 * th))
    return np.where(at_pole, np.sign(phi) * np.pi / 2.0, th)


def moll_forward(lon, lat, lon0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Mollweide forward (Snyder 31-1..31-3, equal-area sphere)."""
    a, _f = ellps
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    th = _moll_theta(phi)
    sq2 = np.sqrt(2.0)
    return (fe + 2.0 * sq2 / np.pi * a * lam * np.cos(th),
            fn + sq2 * a * np.sin(th))


def moll_inverse(x, y, lon0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    a, _f = ellps
    sq2 = np.sqrt(2.0)
    th = np.arcsin(np.clip((np.asarray(y, np.float64) - fn)
                           / (sq2 * a), -1.0, 1.0))
    phi = np.arcsin(np.clip((2.0 * th + np.sin(2.0 * th)) / np.pi,
                            -1.0, 1.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = np.where(np.abs(np.cos(th)) < 1e-12, 0.0,
                       np.pi * (np.asarray(x, np.float64) - fe)
                       / (2.0 * sq2 * a * np.cos(th)))
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R


def _eck4_theta(phi):
    """Newton for theta + sin th cos th + 2 sin th = (2 + pi/2) sin phi
    (Snyder 32-4); poles patched like _moll_theta."""
    phi = np.asarray(phi, np.float64)
    at_pole = np.abs(phi) >= np.pi / 2.0 - 1e-12
    th = np.where(at_pole, 0.0, phi / 2.0)
    cs = (2.0 + np.pi / 2.0) * np.sin(phi)
    for _ in range(_MOLL_ITERS):
        th = th - (th + np.sin(th) * np.cos(th) + 2.0 * np.sin(th) - cs) \
            / (1.0 + np.cos(th) * np.cos(th) - np.sin(th) * np.sin(th)
               + 2.0 * np.cos(th))
    return np.where(at_pole, np.sign(phi) * np.pi / 2.0, th)


def eck4_forward(lon, lat, lon0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Eckert IV forward (Snyder 32-1..32-4, equal-area sphere)."""
    a, _f = ellps
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    th = _eck4_theta(phi)
    cx = 2.0 / np.sqrt(4.0 * np.pi + np.pi * np.pi)
    cy = 2.0 * np.sqrt(np.pi / (4.0 + np.pi))
    return (fe + cx * a * lam * (1.0 + np.cos(th)),
            fn + cy * a * np.sin(th))


def eck4_inverse(x, y, lon0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    a, _f = ellps
    cx = 2.0 / np.sqrt(4.0 * np.pi + np.pi * np.pi)
    cy = 2.0 * np.sqrt(np.pi / (4.0 + np.pi))
    th = np.arcsin(np.clip((np.asarray(y, np.float64) - fn) / (cy * a),
                           -1.0, 1.0))
    phi = np.arcsin(np.clip(
        (th + np.sin(th) * np.cos(th) + 2.0 * np.sin(th))
        / (2.0 + np.pi / 2.0), -1.0, 1.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = (np.asarray(x, np.float64) - fe) \
            / (cx * a * (1.0 + np.cos(th)))
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R


def mill_forward(lon, lat, lon0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Miller Cylindrical forward (Snyder 33-1..33-2, sphere)."""
    a, _f = ellps
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    return (fe + a * lam,
            fn + a * np.log(np.tan(np.pi / 4.0 + 0.4 * phi)) * 1.25)


def mill_inverse(x, y, lon0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    a, _f = ellps
    lam = (np.asarray(x, np.float64) - fe) / a
    phi = 2.5 * (np.arctan(np.exp(0.8 * (np.asarray(y, np.float64) - fn)
                                  / a)) - np.pi / 4.0)
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R


# Robinson's published table (Robinson 1974; Snyder "Flattening the
# Earth" table; also the table PROJ's robin.cpp spline is fitted to):
# X = parallel length multiplier, Y = parallel distance multiplier, at
# 5-degree latitude steps 0..90.
_ROBIN_X = np.array([
    1.0000, 0.9986, 0.9954, 0.9900, 0.9822, 0.9730, 0.9600, 0.9427,
    0.9216, 0.8962, 0.8679, 0.8350, 0.7986, 0.7597, 0.7186, 0.6732,
    0.6213, 0.5722, 0.5322])
_ROBIN_Y = np.array([
    0.0000, 0.0620, 0.1240, 0.1860, 0.2480, 0.3100, 0.3720, 0.4340,
    0.4958, 0.5571, 0.6176, 0.6769, 0.7346, 0.7903, 0.8435, 0.8936,
    0.9394, 0.9761, 1.0000])


def _natural_spline_coeffs(ys: np.ndarray):
    """Natural cubic spline through (i*5, ys[i]) -> per-segment
    (c0, c1, c2, c3) for y = c0 + c1 t + c2 t^2 + c3 t^3, t in [0, 5]
    degrees past the segment start."""
    n = len(ys)
    h = 5.0
    # tridiagonal solve for second derivatives m[1..n-2]; m[0]=m[n-1]=0
    rhs = np.zeros(n)
    rhs[1:-1] = 6.0 * (ys[2:] - 2 * ys[1:-1] + ys[:-2]) / h
    m = np.zeros(n)
    # Thomas algorithm on the interior (diag 4h, off-diag h)
    cp = np.zeros(n)
    dp = np.zeros(n)
    for i in range(1, n - 1):
        denom = 4.0 * h - h * cp[i - 1]
        cp[i] = h / denom
        dp[i] = (rhs[i] - h * dp[i - 1]) / denom
    for i in range(n - 2, 0, -1):
        m[i] = dp[i] - cp[i] * m[i + 1]
    c0 = ys[:-1]
    c1 = (ys[1:] - ys[:-1]) / h - h * (2 * m[:-1] + m[1:]) / 6.0
    c2 = m[:-1] / 2.0
    c3 = (m[1:] - m[:-1]) / (6.0 * h)
    return np.stack([c0, c1, c2, c3], axis=1)


_ROBIN_CX = _natural_spline_coeffs(_ROBIN_X)
_ROBIN_CY = _natural_spline_coeffs(_ROBIN_Y)


def _robin_eval(coeffs: np.ndarray, alat):
    seg = np.minimum(np.floor(alat / 5.0), 17.0).astype(np.int64)
    t = alat - 5.0 * seg
    c = coeffs[seg]
    return ((c[..., 3] * t + c[..., 2]) * t + c[..., 1]) * t + c[..., 0]


def robin_forward(lon, lat, lon0: float = 0.0,
                  fe: float = 0.0, fn: float = 0.0,
                  ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Robinson forward: x = 0.8487 R X(|phi|) lam,
    y = 1.3523 R Y(|phi|) sign(phi) over the published 5-degree table."""
    a, _f = ellps
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    latv = np.asarray(lat, np.float64)
    alat = np.abs(latv)
    xm = _robin_eval(_ROBIN_CX, alat)
    ym = _robin_eval(_ROBIN_CY, alat)
    return (fe + 0.8487 * a * xm * lam,
            fn + 1.3523 * a * ym * np.sign(latv))


def robin_inverse(x, y, lon0: float = 0.0,
                  fe: float = 0.0, fn: float = 0.0,
                  ellps: tuple[float, float] = ELLIPSOIDS["WGS84"],
                  iters: int = 20):
    a, _f = ellps
    yy = (np.asarray(y, np.float64) - fn) / (1.3523 * a)
    sgn = np.where(yy < 0, -1.0, 1.0)
    ay = np.abs(yy)
    # Newton on the Y spline (monotone): seed by linear table lookup
    alat = np.interp(ay, _ROBIN_Y, np.arange(19) * 5.0)
    for _ in range(iters):
        f0 = _robin_eval(_ROBIN_CY, alat) - ay
        h = 1e-6
        f1 = _robin_eval(_ROBIN_CY, np.minimum(alat + h, 90.0)) - ay
        d = (f1 - f0) / h
        step = np.where(np.abs(d) > 1e-12, f0 / np.where(
            np.abs(d) > 1e-12, d, 1.0), 0.0)
        alat = np.clip(alat - step, 0.0, 90.0)
    xm = _robin_eval(_ROBIN_CX, alat)
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = (np.asarray(x, np.float64) - fe) / (0.8487 * a * xm)
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, sgn * alat


# Equal Earth (Savric, Patterson & Jenny 2018; EPSG:8857, PROJ +proj=eqearth).
# Polynomial pseudo-cylindrical on the AUTHALIC sphere: theta = asin(M sin
# beta) with M = sqrt(3)/2, x/y from the published A1..A4 polynomial, scaled
# by the authalic radius Rq = a sqrt(qp/2) (exactly equal-area on WGS84).
_EE_A1, _EE_A2, _EE_A3, _EE_A4 = 1.340264, -0.081106, 0.000893, 0.003796
_EE_M = float(np.sqrt(3.0) / 2.0)
_EE_ITERS = 10


def _ee_poly(th):
    t2 = th * th
    t6 = t2 * t2 * t2
    return th * (_EE_A1 + _EE_A2 * t2 + t6 * (_EE_A3 + _EE_A4 * t2))


def _ee_dpoly(th):
    t2 = th * th
    t6 = t2 * t2 * t2
    return _EE_A1 + 3.0 * _EE_A2 * t2 + t6 * (7.0 * _EE_A3
                                              + 9.0 * _EE_A4 * t2)


def eqearth_forward(lon, lat, lon0: float = 0.0,
                    fe: float = 0.0, fn: float = 0.0,
                    ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    a, f = ellps
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    if f == 0.0:
        beta, rq = phi, a
    else:
        beta = np.arcsin(np.clip(_authalic_q(np.sin(phi)) / _QP,
                                 -1.0, 1.0))
        rq = _RQ
    th = np.arcsin(np.clip(_EE_M * np.sin(beta), -1.0, 1.0))
    return (fe + rq * lam * np.cos(th) / (_EE_M * _ee_dpoly(th)),
            fn + rq * _ee_poly(th))


def eqearth_inverse(x, y, lon0: float = 0.0,
                    fe: float = 0.0, fn: float = 0.0,
                    ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    a, f = ellps
    rq = a if f == 0.0 else _RQ
    yc = (np.asarray(y, np.float64) - fn) / rq
    th = np.copy(yc)
    for _ in range(_EE_ITERS):           # fixed count: SQL-replayable
        th = th - (_ee_poly(th) - yc) / _ee_dpoly(th)
    beta = np.arcsin(np.clip(np.sin(th) / _EE_M, -1.0, 1.0))
    if f == 0.0:
        phi = beta
    else:
        e2, e4, e6 = _E2, _E2 ** 2, _E2 ** 3
        phi = beta + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) \
            * np.sin(2 * beta) \
            + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta) \
            + (761 * e6 / 45360) * np.sin(6 * beta)
    lam = (np.asarray(x, np.float64) - fe) * _EE_M * _ee_dpoly(th) \
        / (rq * np.cos(th))
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R


def vandg_forward(lon, lat, lon0: float = 0.0,
                  fe: float = 0.0, fn: float = 0.0,
                  ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Van der Grinten I forward (Snyder 29-6..29-17, sphere) — the
    classic circular world map (the old NatGeo reference map)."""
    a, _f = ellps
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    th = np.arcsin(np.clip(np.abs(2.0 * phi / np.pi), 0.0, 1.0))
    sth, cth = np.sin(th), np.cos(th)
    with np.errstate(divide="ignore", invalid="ignore"):
        big_a = 0.5 * np.abs(np.pi / lam - lam / np.pi)
        g = cth / (sth + cth - 1.0)
        p = g * (2.0 / sth - 1.0)
        q = big_a * big_a + g
        p2 = p * p
        a2 = big_a * big_a
        den = p2 + a2
        x = (np.sign(lam) * np.pi * a
             * (big_a * (g - p2)
                + np.sqrt(np.maximum(a2 * (g - p2) ** 2
                                     - den * (g * g - p2), 0.0))) / den)
        y = (np.sign(phi) * np.pi * a
             * (p * q - big_a
                * np.sqrt(np.maximum((a2 + 1.0) * den - q * q, 0.0)))
             / den)
    # special rows: equator -> (R lam, 0); central meridian / poles ->
    # (0, +-pi R tan(theta/2))
    on_eq = np.abs(phi) < 1e-12
    on_cm = (np.abs(lam) < 1e-12) | (np.abs(np.abs(phi) - np.pi / 2)
                                     < 1e-12)
    x = np.where(on_eq, a * lam, np.where(on_cm, 0.0, x))
    y = np.where(on_eq, 0.0,
                 np.where(on_cm, np.sign(phi) * np.pi * a
                          * np.tan(0.5 * th), y))
    return fe + x, fn + y


def vandg_inverse(x, y, lon0: float = 0.0,
                  fe: float = 0.0, fn: float = 0.0,
                  ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Van der Grinten I inverse — Snyder's closed cubic solution
    (29-18..29-25)."""
    a, _f = ellps
    bx = (np.asarray(x, np.float64) - fe) / (np.pi * a)
    by = (np.asarray(y, np.float64) - fn) / (np.pi * a)
    x2 = bx * bx
    y2 = by * by
    c1 = -np.abs(by) * (1.0 + x2 + y2)
    c2 = c1 - 2.0 * y2 + x2
    c3 = -2.0 * c1 + 1.0 + 2.0 * y2 + (x2 + y2) ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        d = y2 / c3 + (2.0 * c2 ** 3 / c3 ** 3
                       - 9.0 * c1 * c2 / (c3 * c3)) / 27.0
        a1 = (c1 - c2 * c2 / (3.0 * c3)) / c3
        m1 = 2.0 * np.sqrt(np.maximum(-a1 / 3.0, 0.0))
        th1 = np.arccos(np.clip(3.0 * d / (a1 * m1), -1.0, 1.0)) / 3.0
        phi = np.sign(by) * np.pi * (-m1 * np.cos(th1 + np.pi / 3.0)
                                     - c2 / (3.0 * c3))
        lam = np.where(
            np.abs(bx) < 1e-12, 0.0,
            np.pi * (x2 + y2 - 1.0
                     + np.sqrt(1.0 + 2.0 * (x2 - y2)
                               + (x2 + y2) ** 2)) / (2.0 * bx))
    phi = np.where(np.abs(by) < 1e-12, 0.0, phi)
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R


def bonne_forward(lon, lat, lat1: float, lon0: float = 0.0,
                  fe: float = 0.0, fn: float = 0.0,
                  ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Bonne forward (EPSG 9827 / Snyder 14-1..14-5, ellipsoidal) — the
    equal-area heart-shaped projection of classic national atlases
    (France pre-Lambert, Switzerland pre-omerc)."""
    a, f = ellps
    e2 = f * (2.0 - f)
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    p1 = lat1 * _D2R
    m1 = np.cos(p1) / np.sqrt(1 - e2 * np.sin(p1) ** 2)
    am1 = a * m1 / np.sin(p1)
    big_m1 = merid_arc(np.float64(p1), ellps)
    sphi = np.sin(phi)
    m = np.cos(phi) / np.sqrt(1 - e2 * sphi * sphi)
    rho = am1 + big_m1 - merid_arc(phi, ellps)
    with np.errstate(divide="ignore", invalid="ignore"):
        e_ang = np.where(np.abs(rho) > 1e-9, a * m * lam / rho, 0.0)
    return (fe + rho * np.sin(e_ang),
            fn + am1 - rho * np.cos(e_ang))


def bonne_inverse(x, y, lat1: float, lon0: float = 0.0,
                  fe: float = 0.0, fn: float = 0.0,
                  ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Bonne inverse (Snyder 14-6..14-9)."""
    a, f = ellps
    e2 = f * (2.0 - f)
    p1 = lat1 * _D2R
    m1 = np.cos(p1) / np.sqrt(1 - e2 * np.sin(p1) ** 2)
    am1 = a * m1 / np.sin(p1)
    big_m1 = merid_arc(np.float64(p1), ellps)
    xx = np.asarray(x, np.float64) - fe
    yy = am1 - (np.asarray(y, np.float64) - fn)
    rho = np.sign(p1) * np.sqrt(xx * xx + yy * yy)
    big_m = am1 + big_m1 - rho
    phi = phi_from_m(big_m, ellps)
    sphi = np.sin(phi)
    m = np.cos(phi) / np.sqrt(1 - e2 * sphi * sphi)
    sgn = np.sign(p1)
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = np.where(np.abs(m) > 1e-12,
                       rho * np.arctan2(sgn * xx, sgn * yy) / (a * m),
                       0.0)
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R


# Goode homolosine (interrupted; PROJ +proj=igh) — sinusoidal inside
# +-40d44'11.8" (where sinu and moll scale match), Mollweide lobes outside,
# 2 northern / 4 southern lobes at the standard interruptions. Spherical
# (PROJ forces es = 0 for igh).
_IGH_PHI_B = (40.0 + 44.0 / 60.0 + 11.8 / 3600.0) * np.pi / 180.0
# moll y(phi_b) - sinu y(phi_b) on the unit sphere (continuity offset)
_IGH_DY0 = float(np.sqrt(2.0)
                 * np.sin(_moll_theta(np.float64(_IGH_PHI_B)))
                 - _IGH_PHI_B)
_IGH_CM_N = (-100.0, 30.0)                     # lobe central meridians (deg)
_IGH_CM_S = (-160.0, -60.0, 20.0, 140.0)
_IGH_SPLIT_N = (-40.0,)                        # interruptions (deg)
_IGH_SPLIT_S = (-100.0, -20.0, 80.0)


def _igh_zone_cm(val_deg: np.ndarray, south: np.ndarray) -> np.ndarray:
    """Lobe central meridian (radians) for a longitude-like value."""
    cm_n = np.where(val_deg <= _IGH_SPLIT_N[0],
                    _IGH_CM_N[0], _IGH_CM_N[1])
    cm_s = np.select(
        [val_deg <= _IGH_SPLIT_S[0], val_deg <= _IGH_SPLIT_S[1],
         val_deg <= _IGH_SPLIT_S[2]],
        [_IGH_CM_S[0], _IGH_CM_S[1], _IGH_CM_S[2]], _IGH_CM_S[3])
    return np.where(south, cm_s, cm_n) * _D2R


def igh_forward(lon, lat, lon0: float = 0.0,
                fe: float = 0.0, fn: float = 0.0,
                ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    a, _f = ellps
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    cm = _igh_zone_cm(lam / _D2R, phi < 0.0)
    lamz = lam - cm
    # sinusoidal band
    xs = lamz * np.cos(phi)
    ys = phi
    # mollweide lobes, shifted for continuity at the band edge
    th = _moll_theta(phi)
    xm = 2.0 * np.sqrt(2.0) / np.pi * lamz * np.cos(th)
    ym = np.sqrt(2.0) * np.sin(th) - np.sign(phi) * _IGH_DY0
    moll = np.abs(phi) > _IGH_PHI_B
    return (fe + a * (np.where(moll, xm, xs) + cm),
            fn + a * np.where(moll, ym, ys))


def igh_inverse(x, y, lon0: float = 0.0,
                fe: float = 0.0, fn: float = 0.0,
                ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    a, _f = ellps
    xx = (np.asarray(x, np.float64) - fe) / a
    yy = (np.asarray(y, np.float64) - fn) / a
    cm = _igh_zone_cm(xx / _D2R, yy < 0.0)
    xz = xx - cm
    moll = np.abs(yy) > _IGH_PHI_B
    # sinusoidal band
    phs = yy
    with np.errstate(divide="ignore", invalid="ignore"):
        lms = np.where(np.abs(np.cos(phs)) > 1e-12,
                       xz / np.cos(phs), 0.0)
    # mollweide lobes (undo the continuity shift)
    ym = yy + np.sign(yy) * _IGH_DY0
    th = np.arcsin(np.clip(ym / np.sqrt(2.0), -1.0, 1.0))
    phm = np.arcsin(np.clip((2.0 * th + np.sin(2.0 * th)) / np.pi,
                            -1.0, 1.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        lmm = np.where(np.abs(np.cos(th)) > 1e-12,
                       np.pi * xz / (2.0 * np.sqrt(2.0) * np.cos(th)),
                       0.0)
    phi = np.where(moll, phm, phs)
    lam = np.where(moll, lmm, lms) + cm
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R



# New Zealand Map Grid (EPSG 9811, +proj=nzmg; EPSG:27200) — the Reeves
# (1978) / DOSLI sixth-order complex-polynomial conformal projection on
# International 1924 (the projection DEFINITION fixes the ellipsoid, like
# PROJ's nzmg which forces a = 6378388). Published series: psi(dphi) with
# dphi in 1e-5 arcsec, then w = sum B_k z^k over z = psi + i dlam.
# Constants verified here by NZMG's defining fit property: point scale
# within 2.6e-4 of 1 over the NZ land extent (tests/test_nzmg.py) and
# exact conformality of the analytic series.
_NZMG_A = np.array([0.6399175073, -0.1358797613, 0.063294409,
                    -0.02526853, 0.0117879, -0.0055161, 0.0026906,
                    -0.001333, 0.00067, -0.00034])
_NZMG_B = np.array([0.7557853228 + 0j, 0.249204646 + 0.003371507j,
                    -0.001541739 + 0.041058560j,
                    -0.10162907 + 0.01727609j,
                    -0.26623489 - 0.36249218j, -0.6870983 - 1.1651967j])
_NZMG_A0 = 6378388.0
_NZMG_LAT0, _NZMG_LON0 = -41.0, 173.0


def nzmg_forward(lon, lat, fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["intl"]):
    dphi = (np.asarray(lat, np.float64) - _NZMG_LAT0) * 0.036
    psi = np.zeros_like(dphi)
    for k in range(9, -1, -1):             # Horner over the psi series
        psi = (psi + _NZMG_A[k]) * dphi
    lam = _wrap_rad((np.asarray(lon, np.float64) - _NZMG_LON0) * _D2R)
    z = psi + 1j * lam
    w = np.zeros_like(z)
    for k in range(5, -1, -1):
        w = (w + _NZMG_B[k]) * z
    return fe + _NZMG_A0 * w.imag, fn + _NZMG_A0 * w.real


def nzmg_inverse(x, y, fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["intl"],
                 iters: int = 10):
    w = ((np.asarray(y, np.float64) - fn)
         + 1j * (np.asarray(x, np.float64) - fe)) / _NZMG_A0
    z = w / _NZMG_B[0]
    for _ in range(iters):                 # complex Newton on the series
        f = np.zeros_like(z)
        df = np.zeros_like(z)
        for k in range(5, -1, -1):
            f = (f + _NZMG_B[k]) * z
            df = df * z + (k + 1) * _NZMG_B[k]
        z = z - (f - w) / df
    psi = z.real
    dphi = psi / _NZMG_A[0]
    for _ in range(iters):                 # scalar Newton psi -> dphi
        f = np.zeros_like(dphi)
        df = np.zeros_like(dphi)
        for k in range(9, -1, -1):
            f = (f + _NZMG_A[k]) * dphi
            df = df * dphi + (k + 1) * _NZMG_A[k]
        dphi = dphi - (f - psi) / df
    return (_wrap_rad(_NZMG_LON0 * _D2R + z.imag) / _D2R,
            _NZMG_LAT0 + dphi / 0.036)


# ---------------------------------------------------------------------------
# Geostationary satellite view (+proj=geos; the CGMS LRIT/HRIT normalized
# geostationary projection used by GOES-R fixed grids, sweep axis x, and
# Meteosat SEVIRI grids, sweep axis y). Planar coordinates are
# h * scan_angle (meters). Points beyond the visible disc map to NaN.
# ---------------------------------------------------------------------------

def geos_forward(lon, lat, lon0: float, h: float = 35785831.0,
                 sweep_x: bool = False, fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Geostationary forward: geodetic -> geocentric surface vector
    (normalized by a) -> view angles from the satellite at
    (lon0, 0, a + h). x = h atan(.), y = h atan(.) with the sweep axis
    picking which scan angle is measured against the full off-axis
    distance."""
    a, f = ellps
    b_a = 1.0 - f
    rp2 = b_a * b_a
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    phi_c = np.arctan(rp2 * np.tan(phi))
    # sqrt form (not hypot) so SQL oracles replay bit-identical math
    r = b_a / np.sqrt((b_a * np.cos(phi_c)) * (b_a * np.cos(phi_c))
                      + np.sin(phi_c) * np.sin(phi_c))
    vx = r * np.cos(lam) * np.cos(phi_c)
    vy = r * np.sin(lam) * np.cos(phi_c)
    vz = r * np.sin(phi_c)
    rg = 1.0 + h / a
    tmp = rg - vx
    visible = (tmp * vx - vy * vy - vz * vz / rp2) >= 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        if sweep_x:
            x = h * np.arctan(vy / np.sqrt(vz * vz + tmp * tmp))
            y = h * np.arctan(vz / tmp)
        else:
            x = h * np.arctan(vy / tmp)
            y = h * np.arctan(vz / np.sqrt(vy * vy + tmp * tmp))
    nan = np.float64("nan")
    return (fe + np.where(visible, x, nan),
            fn + np.where(visible, y, nan))


def geos_inverse(x, y, lon0: float, h: float = 35785831.0,
                 sweep_x: bool = False, fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Geostationary inverse: ray from the satellite through the scan
    angles intersected with the ellipsoid (quadratic in the ray
    parameter; the near root is the visible surface)."""
    a, f = ellps
    b_a = 1.0 - f
    rp2 = b_a * b_a
    xx = (np.asarray(x, np.float64) - fe) / h
    yy = (np.asarray(y, np.float64) - fn) / h
    rg = 1.0 + h / a
    # unit-free direction: start at satellite (rg, 0, 0), direction
    # components from the scan angles (inverse of the forward's atan
    # pairs)
    if sweep_x:
        vz = np.tan(yy)
        vy = np.tan(xx) * np.hypot(1.0, vz)
    else:
        vy = np.tan(xx)
        vz = np.tan(yy) * np.hypot(1.0, vy)
    # ray: P(t) = (rg - t, t*vy', t*vz') with vy' = vy, vz' = vz scaled
    # so that t is the along-boresight distance: solve
    # (rg - t)^2 + (t vy)^2 + (t vz)^2 / rp2 = 1
    qa = 1.0 + vy * vy + vz * vz / rp2
    qb = -2.0 * rg
    qc = rg * rg - 1.0
    disc = qb * qb - 4.0 * qa * qc
    with np.errstate(invalid="ignore"):
        t = (-qb - np.sqrt(disc)) / (2.0 * qa)
    px = rg - t
    py = t * vy
    pz = t * vz
    phi_c = np.arctan2(pz, np.hypot(px, py))
    phi = np.arctan(np.tan(phi_c) / rp2)
    lam = np.arctan2(py, px)
    return (_wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R)


# ---------------------------------------------------------------------------
# Azimuthal family (Snyder ch. 20/22/25; the reference resolves these via
# the PROJ method table, ogr/ogrct.cpp:919-948): azimuthal equidistant
# (EPSG 9832 semantics — built here on true Vincenty geodesics so the
# defining property "planar distance from the origin == ellipsoidal
# geodesic distance, planar azimuth == forward geodesic azimuth" holds
# exactly), orthographic (EPSG 9840 ellipsoidal closed form) and the
# gnomonic (spherical, as PROJ's +proj=gnom — great circles map to
# straight lines).
# ---------------------------------------------------------------------------

def geodesic_inverse(lon1, lat1, lon2, lat2,
                     ellps: tuple[float, float] = ELLIPSOIDS["WGS84"],
                     iters: int = 32):
    """Vincenty (1975) inverse problem, vectorized: geodesic distance s
    (m) and forward/reverse azimuths (degrees clockwise from north)
    between two points. f = 0 collapses to the exact great-circle
    solution (C = 0, one fixed-point step). Near-antipodal pairs are the
    classic Vincenty non-convergence zone (~0.5 deg around the antipode)
    — iteration is capped, results there are approximate."""
    a, f = ellps
    b = a * (1.0 - f)
    phi1 = np.asarray(lat1, np.float64) * _D2R
    phi2 = np.asarray(lat2, np.float64) * _D2R
    ll = _wrap_rad((np.asarray(lon2, np.float64)
                    - np.asarray(lon1, np.float64)) * _D2R)
    u1 = np.arctan((1.0 - f) * np.tan(phi1))
    u2_ = np.arctan((1.0 - f) * np.tan(phi2))
    su1, cu1 = np.sin(u1), np.cos(u1)
    su2, cu2 = np.sin(u2_), np.cos(u2_)
    lam = np.array(ll, np.float64, copy=True, ndmin=0) + 0.0
    sin_sig = cos_sig = sig = sin_al = cos2_al = c2sm = 0.0
    for _ in range(iters):
        sl, cl = np.sin(lam), np.cos(lam)
        sin_sig = np.hypot(cu2 * sl, cu1 * su2 - su1 * cu2 * cl)
        cos_sig = su1 * su2 + cu1 * cu2 * cl
        sig = np.arctan2(sin_sig, cos_sig)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_al = np.where(sin_sig == 0.0, 0.0,
                              cu1 * cu2 * sl
                              / np.where(sin_sig == 0.0, 1.0, sin_sig))
        cos2_al = 1.0 - sin_al * sin_al
        # equatorial lines: cos^2 alpha = 0 -> cos(2 sigma_m) = 0
        c2sm = np.where(cos2_al == 0.0, 0.0,
                        cos_sig - 2.0 * su1 * su2
                        / np.where(cos2_al == 0.0, 1.0, cos2_al))
        cc = f / 16.0 * cos2_al * (4.0 + f * (4.0 - 3.0 * cos2_al))
        lam = ll + (1.0 - cc) * f * sin_al * (
            sig + cc * sin_sig * (c2sm + cc * cos_sig
                                  * (-1.0 + 2.0 * c2sm * c2sm)))
    usq = cos2_al * (a * a - b * b) / (b * b)
    aa = 1.0 + usq / 16384.0 * (4096.0 + usq * (-768.0 + usq
                                                * (320.0 - 175.0 * usq)))
    bb = usq / 1024.0 * (256.0 + usq * (-128.0 + usq
                                        * (74.0 - 47.0 * usq)))
    dsig = bb * sin_sig * (c2sm + bb / 4.0 * (
        cos_sig * (-1.0 + 2.0 * c2sm * c2sm)
        - bb / 6.0 * c2sm * (-3.0 + 4.0 * sin_sig * sin_sig)
        * (-3.0 + 4.0 * c2sm * c2sm)))
    s = b * aa * (sig - dsig)
    sl, cl = np.sin(lam), np.cos(lam)
    az1 = np.arctan2(cu2 * sl, cu1 * su2 - su1 * cu2 * cl) / _D2R
    az2 = np.arctan2(cu1 * sl, -su1 * cu2 + cu1 * su2 * cl) / _D2R
    return s, az1, az2


def geodesic_direct(lon1, lat1, az1, s,
                    ellps: tuple[float, float] = ELLIPSOIDS["WGS84"],
                    iters: int = 32):
    """Vincenty (1975) direct problem, vectorized: destination
    (lon2, lat2) and reverse azimuth from a start point, initial azimuth
    (degrees) and geodesic distance (m)."""
    a, f = ellps
    b = a * (1.0 - f)
    phi1 = np.asarray(lat1, np.float64) * _D2R
    al1 = np.asarray(az1, np.float64) * _D2R
    s = np.asarray(s, np.float64)
    u1 = np.arctan((1.0 - f) * np.tan(phi1))
    su1, cu1 = np.sin(u1), np.cos(u1)
    sa1, ca1 = np.sin(al1), np.cos(al1)
    sig1 = np.arctan2(np.tan(u1), ca1)
    sin_al = cu1 * sa1
    cos2_al = 1.0 - sin_al * sin_al
    usq = cos2_al * (a * a - b * b) / (b * b)
    aa = 1.0 + usq / 16384.0 * (4096.0 + usq * (-768.0 + usq
                                                * (320.0 - 175.0 * usq)))
    bb = usq / 1024.0 * (256.0 + usq * (-128.0 + usq
                                        * (74.0 - 47.0 * usq)))
    sig = s / (b * aa)
    c2sm = np.cos(2.0 * sig1 + sig)
    for _ in range(iters):
        c2sm = np.cos(2.0 * sig1 + sig)
        ssig, csig = np.sin(sig), np.cos(sig)
        dsig = bb * ssig * (c2sm + bb / 4.0 * (
            csig * (-1.0 + 2.0 * c2sm * c2sm)
            - bb / 6.0 * c2sm * (-3.0 + 4.0 * ssig * ssig)
            * (-3.0 + 4.0 * c2sm * c2sm)))
        sig = s / (b * aa) + dsig
    ssig, csig = np.sin(sig), np.cos(sig)
    phi2 = np.arctan2(
        su1 * csig + cu1 * ssig * ca1,
        (1.0 - f) * np.hypot(sin_al,
                             su1 * ssig - cu1 * csig * ca1))
    lam = np.arctan2(ssig * sa1, cu1 * csig - su1 * ssig * ca1)
    cc = f / 16.0 * cos2_al * (4.0 + f * (4.0 - 3.0 * cos2_al))
    ll = lam - (1.0 - cc) * f * sin_al * (
        sig + cc * ssig * (c2sm + cc * csig
                           * (-1.0 + 2.0 * c2sm * c2sm)))
    lon2 = _wrap_rad(np.asarray(lon1, np.float64) * _D2R + ll) / _D2R
    az2 = np.arctan2(sin_al, -(su1 * ssig - cu1 * csig * ca1)) / _D2R
    return lon2, phi2 / _D2R, az2


def _aeqd_sphere_fwd(lon, lat, lon0, lat0, r):
    """Spherical azimuthal equidistant (Snyder 25-2, k' = c / sin c)."""
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    p0 = lat0 * _D2R
    cos_c = np.clip(np.sin(p0) * np.sin(phi)
                    + np.cos(p0) * np.cos(phi) * np.cos(lam), -1.0, 1.0)
    c = np.arccos(cos_c)
    sin_c = np.sin(c)
    k = np.where(sin_c < 1e-14, 1.0, c / np.where(sin_c < 1e-14, 1.0,
                                                  sin_c))
    x = r * k * np.cos(phi) * np.sin(lam)
    y = r * k * (np.cos(p0) * np.sin(phi)
                 - np.sin(p0) * np.cos(phi) * np.cos(lam))
    return x, y


def aeqd_forward(lon, lat, lon0: float, lat0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Azimuthal Equidistant forward. Sphere (f = 0): Snyder 25-2
    closed form. Ellipsoid: true geodesic polar coordinates — x = s
    sin(az), y = s cos(az) from the Vincenty inverse (PROJ's +proj=aeqd
    does the same via Karney geodesics; EPSG 9832's series is the
    near-field approximation of this)."""
    a, f = ellps
    if f == 0.0:
        x, y = _aeqd_sphere_fwd(lon, lat, lon0, lat0, a)
        return fe + x, fn + y
    s, az1, _ = geodesic_inverse(np.full_like(np.asarray(lon, np.float64),
                                              lon0),
                                 np.full_like(np.asarray(lat, np.float64),
                                              lat0),
                                 lon, lat, ellps)
    al = np.asarray(az1, np.float64) * _D2R
    return fe + s * np.sin(al), fn + s * np.cos(al)


def aeqd_inverse(x, y, lon0: float, lat0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    a, f = ellps
    xx = np.asarray(x, np.float64) - fe
    yy = np.asarray(y, np.float64) - fn
    if f == 0.0:
        rho = np.hypot(xx, yy)
        c = rho / a
        p0 = lat0 * _D2R
        sin_c, cos_c = np.sin(c), np.cos(c)
        with np.errstate(divide="ignore", invalid="ignore"):
            phi = np.arcsin(np.clip(
                cos_c * np.sin(p0)
                + np.where(rho < 1e-12, 0.0,
                           yy * sin_c * np.cos(p0)
                           / np.where(rho < 1e-12, 1.0, rho)), -1.0, 1.0))
            lam = np.arctan2(xx * sin_c,
                             rho * np.cos(p0) * cos_c
                             - yy * np.sin(p0) * sin_c)
        lam = np.where(rho < 1e-12, 0.0, lam)
        phi = np.where(rho < 1e-12, p0, phi)
        return _wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R
    s = np.hypot(xx, yy)
    az = np.arctan2(xx, yy) / _D2R
    lon0a = np.full_like(s, lon0)
    lat0a = np.full_like(s, lat0)
    lon2, lat2, _ = geodesic_direct(lon0a, lat0a, az, s, ellps)
    lon2 = np.where(s < 1e-9, lon0, lon2)
    lat2 = np.where(s < 1e-9, lat0, lat2)
    return lon2, lat2


def ortho_forward(lon, lat, lon0: float, lat0: float = 0.0,
                  fe: float = 0.0, fn: float = 0.0,
                  ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Orthographic forward (EPSG 9840 ellipsoidal closed form; reduces
    to Snyder 20-3..20-5 for f = 0):
    E = FE + nu cos(phi) sin(lam), N = FN + nu [sin(phi) cos(phi0) -
    cos(phi) sin(phi0) cos(lam)] + e2 (nu0 sin(phi0) - nu sin(phi))
    cos(phi0). Only the near hemisphere is meaningful."""
    a, f = ellps
    e2 = f * (2.0 - f)
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    p0 = lat0 * _D2R
    sphi, cphi = np.sin(phi), np.cos(phi)
    nu = _nu_e(sphi, a, e2)
    nu0 = _nu_e(np.sin(p0), a, e2)
    x = nu * cphi * np.sin(lam)
    y = nu * (sphi * np.cos(p0) - cphi * np.sin(p0) * np.cos(lam)) \
        + e2 * (nu0 * np.sin(p0) - nu * sphi) * np.cos(p0)
    return fe + x, fn + y


def ortho_inverse(x, y, lon0: float, lat0: float = 0.0,
                  fe: float = 0.0, fn: float = 0.0,
                  ellps: tuple[float, float] = ELLIPSOIDS["WGS84"],
                  iters: int = 10):
    """Orthographic inverse: spherical closed form (Snyder 20-14..20-17)
    as the seed, then damped Newton on the ellipsoidal forward with a
    finite-difference Jacobian (the GN7-2 iteration, made generic)."""
    a, f = ellps
    xx = np.asarray(x, np.float64) - fe
    yy = np.asarray(y, np.float64) - fn
    p0 = lat0 * _D2R
    rho = np.hypot(xx, yy)
    c = np.arcsin(np.clip(rho / a, -1.0, 1.0))
    sin_c, cos_c = np.sin(c), np.cos(c)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.arcsin(np.clip(
            cos_c * np.sin(p0)
            + np.where(rho < 1e-12, 0.0,
                       yy * sin_c * np.cos(p0)
                       / np.where(rho < 1e-12, 1.0, rho)), -1.0, 1.0))
        lam = np.arctan2(xx * sin_c,
                         rho * np.cos(p0) * cos_c
                         - yy * np.sin(p0) * sin_c)
    lam = np.where(rho < 1e-12, 0.0, lam)
    phi = np.where(rho < 1e-12, p0, phi)
    if f != 0.0:
        h = 1e-7            # radians; ~0.6 m FD step
        for _ in range(iters):
            lon_d = _wrap_rad(lam) / _D2R + lon0
            lat_d = phi / _D2R
            fx, fy = ortho_forward(lon_d, lat_d, lon0, lat0, 0.0, 0.0,
                                   ellps)
            fx1, fy1 = ortho_forward(lon_d + h / _D2R, lat_d, lon0, lat0,
                                     0.0, 0.0, ellps)
            fx2, fy2 = ortho_forward(lon_d, lat_d + h / _D2R, lon0, lat0,
                                     0.0, 0.0, ellps)
            j11, j21 = (fx1 - fx) / h, (fy1 - fy) / h
            j12, j22 = (fx2 - fx) / h, (fy2 - fy) / h
            det = j11 * j22 - j12 * j21
            with np.errstate(divide="ignore", invalid="ignore"):
                dl = (j22 * (xx - fx) - j12 * (yy - fy)) / det
                dp = (-j21 * (xx - fx) + j11 * (yy - fy)) / det
            lam = lam + np.where(np.isfinite(dl), dl, 0.0)
            phi = phi + np.where(np.isfinite(dp), dp, 0.0)
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R


def gnom_forward(lon, lat, lon0: float, lat0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    """Gnomonic forward (Snyder 22-4..22-5, spherical on radius a, as
    PROJ's +proj=gnom): great circles project to straight lines."""
    a, _f = ellps
    lam = _wrap_rad((np.asarray(lon, np.float64) - lon0) * _D2R)
    phi = np.asarray(lat, np.float64) * _D2R
    p0 = lat0 * _D2R
    cos_c = np.sin(p0) * np.sin(phi) \
        + np.cos(p0) * np.cos(phi) * np.cos(lam)
    with np.errstate(divide="ignore", invalid="ignore"):
        x = a * np.cos(phi) * np.sin(lam) / cos_c
        y = a * (np.cos(p0) * np.sin(phi)
                 - np.sin(p0) * np.cos(phi) * np.cos(lam)) / cos_c
    return fe + x, fn + y


def gnom_inverse(x, y, lon0: float, lat0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0,
                 ellps: tuple[float, float] = ELLIPSOIDS["WGS84"]):
    a, _f = ellps
    xx = np.asarray(x, np.float64) - fe
    yy = np.asarray(y, np.float64) - fn
    p0 = lat0 * _D2R
    rho = np.hypot(xx, yy)
    c = np.arctan2(rho, a)
    sin_c, cos_c = np.sin(c), np.cos(c)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.arcsin(np.clip(
            cos_c * np.sin(p0)
            + np.where(rho < 1e-12, 0.0,
                       yy * sin_c * np.cos(p0)
                       / np.where(rho < 1e-12, 1.0, rho)), -1.0, 1.0))
        lam = np.arctan2(xx * sin_c,
                         rho * np.cos(p0) * cos_c
                         - yy * np.sin(p0) * sin_c)
    lam = np.where(rho < 1e-12, 0.0, lam)
    phi = np.where(rho < 1e-12, p0, phi)
    return _wrap_rad(lon0 * _D2R + lam) / _D2R, phi / _D2R


# kind-tuple tails align positionally with the kernel signatures, so the
# dispatch below is table-driven: ("eqc", lon0, lat1, fe, fn), ("cea",
# lon0, lat_ts, fe, fn), ("sinu", lon0, fe, fn), ("cass"/"poly"/"aeqd"/
# "ortho"/"gnom", lon0, lat0, fe, fn), ("eqdc", lon0, lat0, lat1, lat2,
# fe, fn)
_LONGTAIL_FWD = {"eqc": eqc_forward, "cea": cea_forward,
                 "sinu": sinu_forward, "cass": cass_forward,
                 "poly": poly_forward, "eqdc": eqdc_forward,
                 "aeqd": aeqd_forward, "ortho": ortho_forward,
                 "gnom": gnom_forward, "moll": moll_forward,
                 "eck4": eck4_forward, "mill": mill_forward,
                 "robin": robin_forward, "geos": geos_forward,
                 "eqearth": eqearth_forward, "vandg": vandg_forward,
                 "igh": igh_forward, "bonne": bonne_forward,
                 "nzmg": nzmg_forward}
_LONGTAIL_INV = {"eqc": eqc_inverse, "cea": cea_inverse,
                 "sinu": sinu_inverse, "cass": cass_inverse,
                 "poly": poly_inverse, "eqdc": eqdc_inverse,
                 "aeqd": aeqd_inverse, "ortho": ortho_inverse,
                 "gnom": gnom_inverse, "moll": moll_inverse,
                 "eck4": eck4_inverse, "mill": mill_inverse,
                 "robin": robin_inverse, "geos": geos_inverse,
                 "eqearth": eqearth_inverse, "vandg": vandg_inverse,
                 "igh": igh_inverse, "bonne": bonne_inverse,
                 "nzmg": nzmg_inverse}
_LONGTAIL_FAMS = tuple(_LONGTAIL_FWD)


def _parse_proj_string(crs: str):
    """'+proj=... +key=val [+flag]' -> parameterized kind tuple.

    Composes the existing numpy kernels from parsed proj parameters (the
    reference delegates this to the PROJ database, ogr/ogrct.cpp:919-948;
    here the supported projection families are longlat, merc (spherical,
    web-mercator datum), tmerc (ellipsoidal Krueger, WGS84), utm and laea
    (WGS84 authalic) — covering arbitrary central meridians, scale factors
    and false origins the fixed EPSG whitelist cannot name)."""
    kv: dict[str, str | bool] = {}
    for tok in crs.split():
        if not tok.startswith("+"):
            continue
        body = tok[1:]
        if "=" in body:
            k, v = body.split("=", 1)
            kv[k] = v
        else:
            kv[body] = True

    # datum components: +ellps / +datum (classic PROJ table) / +towgs84
    ellps_name = kv.get("ellps")
    towgs84: tuple[float, ...] | None = None
    if "datum" in kv:
        dd = DATUM_DEFS.get(str(kv["datum"]))
        if dd is None:
            return None            # grid-shift datums (NAD27...) unsupported
        ellps_name = ellps_name or dd[0]
        towgs84 = dd[1]
    if "towgs84" in kv:
        towgs84 = tuple(float(v) for v in str(kv["towgs84"]).split(","))
    if ellps_name is not None and str(ellps_name) not in ELLIPSOIDS:
        return None
    ellps = ELLIPSOIDS[str(ellps_name)] if ellps_name else \
        ELLIPSOIDS["WGS84"]
    if "a" in kv:
        a_val = float(kv["a"])
        rf = float(kv["rf"]) if "rf" in kv else (
            1.0 / ellps[1] if ellps[1] else 0.0)
        ellps = (a_val, 1.0 / rf if rf else 0.0)
    if "R" in kv:                       # perfect sphere (+R=radius)
        ellps = (float(kv["R"]), 0.0)

    inner = _proj_inner_kind(kv)
    nad = kv.get("nadgrids")
    if nad == "@null" and inner is not None and isinstance(inner, tuple) \
            and inner[0] in _LONGTAIL_FAMS and not _is_wgs84_ellps(*ellps):
        # PROJ's "+nadgrids=@null": NO datum shift — the projected
        # coordinates reinterpret directly as WGS84 lon/lat after the
        # inverse projection (the MODIS sinusoidal convention,
        # +proj=sinu +R=6371007.181 +nadgrids=@null)
        return ("datum", inner, ellps, None)
    if nad and nad != "@null":
        # NTv2 grid-shift datum (raster/ntv2.py; PROJ hgridshift) —
        # takes precedence over +towgs84, like PROJ
        if inner is None:
            return None
        if inner == "4326":
            inner = "geog"
        elif not (isinstance(inner, tuple)
                  and inner[0] in ("tmerc", "utm")) \
                and not _is_wgs84_ellps(*ellps):
            return None
        return ("grid", inner, ellps, str(nad))
    return _wrap_datum(inner, ellps, towgs84)


def _wrap_datum(inner, ellps: tuple[float, float],
                towgs84: tuple[float, ...] | None):
    """Attach a ('datum', inner, (a,f), towgs84_7) wrapper to a parsed
    projection kind when the source datum is not plain WGS84. Non-WGS84
    ellipsoids are only ported for the tmerc/utm/geographic kernels."""
    if inner is None or _datum_identity(ellps, towgs84):
        return inner
    p = tuple(towgs84 or ())
    if len(p) == 3:
        p = p + (0.0, 0.0, 0.0, 0.0)
    elif len(p) == 0:
        p = (0.0,) * 7
    elif len(p) != 7:
        return None
    if inner == "4326":
        inner = "geog"
    elif isinstance(inner, tuple) and inner[0] in (
            ("tmerc", "utm", "sterea", "omerc", "krovak")
            + _LONGTAIL_FAMS):
        pass            # these kernels are ellipsoid-parameterized
    elif not _is_wgs84_ellps(*ellps):
        return None     # e.g. LCC on Bessel: kernel not ellipsoid-ported
    return ("datum", inner, ellps, p)


def _proj_inner_kind(kv: dict):
    proj = kv.get("proj")
    if proj in ("longlat", "latlong"):
        return "4326"
    f = lambda k, d: float(kv.get(k, d))        # noqa: E731
    k0 = float(kv.get("k_0", kv.get("k", 1.0)))
    if proj == "merc":
        return ("merc", f("lon_0", 0.0), k0, f("x_0", 0.0), f("y_0", 0.0))
    if proj == "tmerc":
        lat0 = f("lat_0", 0.0)
        base = ("tmerc", f("lon_0", 0.0), k0, f("x_0", 0.0), f("y_0", 0.0))
        return base + (lat0,) if lat0 != 0.0 else base
    if proj == "utm":
        zone = int(kv.get("zone", 0))
        if 1 <= zone <= 60:
            return ("utm", -183.0 + 6.0 * zone, "south" in kv)
    if proj == "laea":
        return ("laea", f("lon_0", 0.0), f("lat_0", 0.0),
                f("x_0", 0.0), f("y_0", 0.0))
    if proj == "lcc":
        lat1 = f("lat_1", 0.0)
        return ("lcc", f("lon_0", 0.0), f("lat_0", 0.0), lat1,
                f("lat_2", lat1), k0, f("x_0", 0.0), f("y_0", 0.0))
    if proj == "aea":
        lat1 = f("lat_1", 0.0)
        return ("aea", f("lon_0", 0.0), f("lat_0", 0.0), lat1,
                f("lat_2", lat1), f("x_0", 0.0), f("y_0", 0.0))
    if proj == "stere":
        lat0 = f("lat_0", 90.0)
        if abs(abs(lat0) - 90.0) > 1e-9:
            # PROJ's +proj=stere oblique aspect is spherical-composite;
            # the ellipsoidal double projection is +proj=sterea (below)
            return None
        lat_ts = float(kv["lat_ts"]) if "lat_ts" in kv else None
        return ("stere", f("lon_0", 0.0), lat_ts, k0, lat0 < 0,
                f("x_0", 0.0), f("y_0", 0.0))
    if proj == "sterea":
        return ("sterea", f("lon_0", 0.0), f("lat_0", 0.0), k0,
                f("x_0", 0.0), f("y_0", 0.0))
    if proj == "omerc":
        alpha = f("alpha", 90.0)
        return ("omerc", f("lonc", f("lon_0", 0.0)), f("lat_0", 0.0),
                alpha, f("gamma", alpha), k0, f("x_0", 0.0), f("y_0", 0.0),
                not ("no_uoff" in kv or "no_off" in kv))
    if proj == "somerc":
        # Swiss Oblique Mercator == Hotine variant B with
        # alpha = gamma = 90 deg (EPSG 9815 parameterization of CH1903)
        return ("omerc", f("lon_0", 0.0), f("lat_0", 0.0), 90.0, 90.0,
                k0, f("x_0", 0.0), f("y_0", 0.0), True)
    if proj == "eqc":
        return ("eqc", f("lon_0", 0.0), f("lat_ts", 0.0),
                f("x_0", 0.0), f("y_0", 0.0))
    if proj == "cea":
        return ("cea", f("lon_0", 0.0), f("lat_ts", 0.0),
                f("x_0", 0.0), f("y_0", 0.0))
    if proj in ("sinu", "moll", "eck4", "mill", "robin", "eqearth",
                "vandg", "igh"):
        return (proj, f("lon_0", 0.0), f("x_0", 0.0), f("y_0", 0.0))
    if proj == "bonne":
        return ("bonne", f("lat_1", 0.0), f("lon_0", 0.0),
                f("x_0", 0.0), f("y_0", 0.0))
    if proj == "nzmg":
        return ("nzmg", f("x_0", 2510000.0), f("y_0", 6023150.0))
    if proj == "geos":
        return ("geos", f("lon_0", 0.0), f("h", 35785831.0),
                kv.get("sweep", "y") == "x", f("x_0", 0.0), f("y_0", 0.0))
    if proj in ("cass", "aeqd", "ortho", "gnom"):
        return (proj, f("lon_0", 0.0), f("lat_0", 0.0),
                f("x_0", 0.0), f("y_0", 0.0))
    if proj == "poly":
        return ("poly", f("lon_0", 0.0), f("lat_0", 0.0),
                f("x_0", 0.0), f("y_0", 0.0))
    if proj == "eqdc":
        lat1 = f("lat_1", 0.0)
        return ("eqdc", f("lon_0", 0.0), f("lat_0", 0.0), lat1,
                f("lat_2", lat1), f("x_0", 0.0), f("y_0", 0.0))
    if proj == "krovak":
        lon0 = f("lon_0", 24.0 + 50.0 / 60)
        if kv.get("pm") == "ferro":        # Ferro = 17d40' W of Greenwich
            lon0 -= 17.0 + 40.0 / 60
        return ("krovak", lon0, f("lat_0", 49.5),
                f("alpha", 30.0 + 17.0 / 60 + 17.3031 / 3600),
                78.5, float(kv.get("k_0", kv.get("k", 0.9999))),
                f("x_0", 0.0), f("y_0", 0.0))
    return None


def _wkt_node(s: str, pos: int = 0):
    """Minimal OGC WKT1 reader (OGRSpatialReference::importFromWkt,
    ogr/ogrspatialreference.cpp — keyword[val, val, ...] trees with quoted
    strings and numbers). -> ((name, children), next_pos); children are
    nested nodes, strings, or floats."""
    m = re.match(r'\s*([A-Za-z_][A-Za-z_0-9]*)\s*\[', s[pos:])
    if not m:
        raise ValueError(f"bad WKT at {pos}: {s[pos:pos + 30]!r}")
    name = m.group(1).upper()
    pos += m.end()
    children = []
    while True:
        mq = re.match(r'\s*"([^"]*)"', s[pos:])
        if mq:
            children.append(mq.group(1))
            pos += mq.end()
        elif re.match(r'\s*[A-Za-z_][A-Za-z_0-9]*\s*\[', s[pos:]):
            node, pos = _wkt_node(s, pos)
            children.append(node)
        else:
            mn = re.match(r'\s*([-+][0-9.][-+0-9.eE]*|[0-9.][-+0-9.eE]*)',
                          s[pos:])
            if mn:
                children.append(float(mn.group(1)))
                pos += mn.end()
            else:
                # WKT2 bare enum keyword (CS[Cartesian,2], AXIS[...,east])
                mb = re.match(r'\s*([A-Za-z_][A-Za-z_0-9]*)', s[pos:])
                if not mb:
                    raise ValueError(f"bad WKT value at {pos}")
                children.append(mb.group(1))
                pos += mb.end()
        ms = re.match(r'\s*([,\]])', s[pos:])
        if not ms:
            raise ValueError(f"expected , or ] at {pos}")
        pos += ms.end()
        if ms.group(1) == "]":
            return (name, children), pos


_WKT_METHODS = {
    "TRANSVERSE_MERCATOR": "tmerc",
    "MERCATOR_1SP": "merc",
    "MERCATOR_(VARIANT_A)": "merc",
    "LAMBERT_AZIMUTHAL_EQUAL_AREA": "laea",
    "LAMBERT_CONFORMAL_CONIC_1SP": "lcc1",
    "LAMBERT_CONFORMAL_CONIC_2SP": "lcc",
    "LAMBERT_CONIC_CONFORMAL_(1SP)": "lcc1",
    "LAMBERT_CONIC_CONFORMAL_(2SP)": "lcc",
    "ALBERS_CONIC_EQUAL_AREA": "aea",
    "ALBERS_EQUAL_AREA": "aea",
    "POLAR_STEREOGRAPHIC": "stere",
    "POLAR_STEREOGRAPHIC_(VARIANT_A)": "stere",
    "POLAR_STEREOGRAPHIC_(VARIANT_B)": "stereB",
    "OBLIQUE_STEREOGRAPHIC": "sterea",
    "DOUBLE_STEREOGRAPHIC": "sterea",
    "HOTINE_OBLIQUE_MERCATOR": "omercA",
    "HOTINE_OBLIQUE_MERCATOR_(VARIANT_A)": "omercA",
    "HOTINE_OBLIQUE_MERCATOR_(VARIANT_B)": "omercB",
    "HOTINE_OBLIQUE_MERCATOR_AZIMUTH_CENTER": "omercB",
    "SWISS_OBLIQUE_CYLINDRICAL": "somerc",
    "SWISS_OBLIQUE_MERCATOR": "somerc",
    "KROVAK": "krovak",
    "KROVAK_(EAST_NORTH_ORIENTATED)": "krovak",
    "EQUIRECTANGULAR": "eqc",
    "EQUIDISTANT_CYLINDRICAL": "eqc",
    "PLATE_CARREE": "eqc",
    "CYLINDRICAL_EQUAL_AREA": "cea",
    "LAMBERT_CYLINDRICAL_EQUAL_AREA": "cea",
    "LAMBERT_CYLINDRICAL_EQUAL_AREA_(SPHERICAL)": "cea",
    "SINUSOIDAL": "sinu",
    "CASSINI_SOLDNER": "cass",
    "CASSINI-SOLDNER": "cass",
    "POLYCONIC": "poly",
    "AMERICAN_POLYCONIC": "poly",
    "EQUIDISTANT_CONIC": "eqdc",
    "AZIMUTHAL_EQUIDISTANT": "aeqd",
    "MODIFIED_AZIMUTHAL_EQUIDISTANT": "aeqd",
    "ORTHOGRAPHIC": "ortho",
    "ORTHOGRAPHIC_(SPHERICAL)": "ortho",
    "GNOMONIC": "gnom",
    "MOLLWEIDE": "moll",
    "EQUAL_EARTH": "eqearth",
    "VANDERGRINTEN": "vandg",
    "VAN_DER_GRINTEN_I": "vandg",
    "BONNE": "bonne",
    "NEW_ZEALAND_MAP_GRID": "nzmg",
    "GOODE_HOMOLOSINE": "igh",
    "INTERRUPTED_GOODE_HOMOLOSINE": "igh",
    "ECKERT_IV": "eck4",
    "MILLER_CYLINDRICAL": "mill",
    "ROBINSON": "robin",
    "GEOSTATIONARY_SATELLITE": "geos",
    "GEOSTATIONARY_SATELLITE_(SWEEP_X)": "geosx",
    "GEOSTATIONARY_SATELLITE_(SWEEP_Y)": "geos",
}


def _wkt_find_deep(node, name: str):
    """Depth-first search of a parsed WKT tuple tree for a node name."""
    if isinstance(node, tuple) and len(node) == 2 \
            and isinstance(node[1], list):
        if node[0] == name:
            return node
        for c in node[1]:
            hit = _wkt_find_deep(c, name)
            if hit is not None:
                return hit
    return None


def _parse_wkt_crs(crs: str):
    """OGC WKT1 GEOGCS/PROJCS -> kind tuple, honoring the DATUM node:
    SPHEROID[a, 1/f] selects the ellipsoid, TOWGS84[dx,dy,dz(,rx,ry,rz,s)]
    the Helmert shift (OGRSpatialReference::GetTOWGS84,
    ogr/ogrspatialreference.cpp). A WKT whose datum is plain WGS84
    parses exactly as before."""
    kind = _parse_wkt_kind(crs)
    if kind is None or (isinstance(kind, tuple) and kind[0] == "datum"):
        return kind          # AUTHORITY whitelist already datum-qualified
    root, _ = _wkt_node(crs)
    sph = _wkt_find_deep(root, "SPHEROID") or _wkt_find_deep(root,
                                                             "ELLIPSOID")
    tow = _wkt_find_deep(root, "TOWGS84")
    ellps = ELLIPSOIDS["WGS84"]
    if sph is not None:
        vals = [v for v in sph[1] if isinstance(v, float)]
        if len(vals) >= 2:
            a_val, invf = vals[0], vals[1]
            ellps = (a_val, 1.0 / invf if invf else 0.0)
    towgs84 = None
    if tow is not None:
        towgs84 = tuple(v for v in tow[1] if isinstance(v, float))
    return _wrap_datum(kind, ellps, towgs84)


def _parse_wkt_kind(crs: str):
    """OGC WKT1 GEOGCS/PROJCS -> the same parameterized kind tuples the
    proj-string path produces (the reference's importFromWkt +
    exportToProj4 round trip collapsed to the families this engine
    implements). Projection method and PARAMETER nodes drive the kernel
    choice; a trailing EPSG AUTHORITY is honored as a shortcut."""
    (name, children), _ = _wkt_node(crs)
    if name in ("GEOGCS", "GEOGCRS", "GEODCRS"):
        return "4326"
    if name not in ("PROJCS", "PROJCRS"):
        return None
    nodes = [c for c in children if isinstance(c, tuple)]

    def find(*names):
        return [n for n in nodes if n[0] in names]

    auth = find("AUTHORITY", "ID")
    if auth and str(auth[-1][1][0]).upper() == "EPSG":
        code = auth[-1][1][1]
        code = str(int(code)) if isinstance(code, float) else str(code)
        parsed = _parse_crs(f"EPSG:{code}")
        if parsed is not None:
            return parsed
    proj = find("PROJECTION", "CONVERSION", "METHOD")
    if proj and proj[0][0] == "CONVERSION":      # WKT2: METHOD nested inside
        nodes = [c for c in proj[0][1] if isinstance(c, tuple)] + nodes
        proj = [n for n in nodes if n[0] == "METHOD"]
    if not proj:
        return None
    method = str(proj[0][1][0]).strip().upper().replace(" ", "_")
    fam = _WKT_METHODS.get(method)
    if fam is None:
        return None
    params = {str(p[1][0]).strip().lower().replace(" ", "_"): float(p[1][1])
              for p in nodes if p[0] == "PARAMETER"
              and len(p[1]) >= 2 and isinstance(p[1][1], float)}

    def g(keys, d=0.0):
        for k in keys:
            if k in params:
                return params[k]
        return d

    lon0 = g(("central_meridian", "longitude_of_center",
              "longitude_of_origin", "longitude_of_natural_origin"))
    k0 = g(("scale_factor", "scale_factor_at_natural_origin"), 1.0)
    fe = g(("false_easting",))
    fn = g(("false_northing",))
    if fam == "laea":
        lat0 = g(("latitude_of_center", "latitude_of_origin",
                  "latitude_of_natural_origin"))
        return ("laea", lon0, lat0, fe, fn)
    if fam in ("lcc", "lcc1", "aea"):
        lat0 = g(("latitude_of_origin", "latitude_of_center",
                  "latitude_of_natural_origin",
                  "latitude_of_false_origin"))
        lon0c = g(("central_meridian", "longitude_of_center",
                   "longitude_of_origin", "longitude_of_natural_origin",
                   "longitude_of_false_origin"), lon0)
        if fam == "lcc1":
            return ("lcc", lon0c, lat0, lat0, lat0, k0, fe, fn)
        lat1 = g(("standard_parallel_1",
                  "latitude_of_1st_standard_parallel"), lat0)
        lat2 = g(("standard_parallel_2",
                  "latitude_of_2nd_standard_parallel"), lat1)
        fe = g(("false_easting", "easting_at_false_origin"), fe)
        fn = g(("false_northing", "northing_at_false_origin"), fn)
        if fam == "aea":
            return ("aea", lon0c, lat0, lat1, lat2, fe, fn)
        return ("lcc", lon0c, lat0, lat1, lat2, k0, fe, fn)
    if fam in ("stere", "stereB"):
        lat0 = g(("latitude_of_origin", "latitude_of_natural_origin"),
                 90.0)
        lat_ts = g(("standard_parallel_1", "latitude_of_standard_parallel",
                    "latitude_of_true_scale"), float("nan"))
        # GDAL WKT1 packs the standard parallel into latitude_of_origin
        # when it is not a pole (ogr_srs exports EPSG:3413 that way)
        if lat_ts != lat_ts and abs(abs(lat0) - 90.0) > 1e-9:
            lat_ts = lat0
        if fam == "stereB" and lat_ts != lat_ts:
            lat_ts = lat0             # variant B: the origin IS lat_ts
        south = (lat0 < 0) or (lat_ts == lat_ts and lat_ts < 0)
        return ("stere", lon0, None if lat_ts != lat_ts else lat_ts,
                k0, south, fe, fn)
    if fam == "sterea":
        lat0 = g(("latitude_of_origin", "latitude_of_natural_origin"))
        return ("sterea", lon0, lat0, k0, fe, fn)
    if fam in ("omercA", "omercB", "somerc"):
        latc = g(("latitude_of_center", "latitude_of_origin",
                  "latitude_of_projection_centre"))
        lonc = g(("longitude_of_center", "central_meridian",
                  "longitude_of_projection_centre"), lon0)
        if fam == "somerc":
            alpha = gamma = 90.0
        else:
            alpha = g(("azimuth", "azimuth_of_initial_line",
                       "azimuth_at_projection_centre"), 90.0)
            gamma = g(("rectified_grid_angle",
                       "angle_from_rectified_to_skew_grid"), alpha)
        k0 = g(("scale_factor", "scale_factor_on_initial_line"), k0)
        fe = g(("false_easting", "easting_at_projection_centre"), fe)
        fn = g(("false_northing", "northing_at_projection_centre"), fn)
        return ("omerc", lonc, latc, alpha, gamma, k0, fe, fn,
                fam != "omercA")
    if fam == "krovak":
        latc = g(("latitude_of_center",
                  "latitude_of_projection_centre"), 49.5)
        lonc = g(("longitude_of_center", "central_meridian",
                  "longitude_of_origin"), 24.0 + 50.0 / 60)
        al = g(("azimuth", "co-latitude_of_cone_axis",
                "azimuth_of_initial_line"), 30.0 + 17.0 / 60
               + 17.3031 / 3600)
        lp = g(("pseudo_standard_parallel_1",
                "latitude_of_pseudo_standard_parallel"), 78.5)
        k0 = g(("scale_factor",
                "scale_factor_on_pseudo_standard_parallel"), 0.9999)
        return ("krovak", lonc, latc, al, lp, k0, fe, fn)
    if fam == "eqc":
        lat1 = g(("standard_parallel_1",
                  "latitude_of_1st_standard_parallel",
                  "latitude_of_origin"))
        return ("eqc", lon0, lat1, fe, fn)
    if fam == "cea":
        lat_ts = g(("standard_parallel_1",
                    "latitude_of_1st_standard_parallel"))
        return ("cea", lon0, lat_ts, fe, fn)
    if fam in ("sinu", "moll", "eck4", "mill", "robin", "eqearth",
               "vandg", "igh"):
        return (fam, lon0, fe, fn)
    if fam == "bonne":
        lat1 = g(("standard_parallel_1",
                  "latitude_of_1st_standard_parallel"))
        return ("bonne", lat1, lon0, fe, fn)
    if fam == "nzmg":
        return ("nzmg", fe, fn)
    if fam in ("geos", "geosx"):
        hh = g(("satellite_height",), 35785831.0)
        return ("geos", lon0, hh, fam == "geosx", fe, fn)
    if fam in ("cass", "poly", "aeqd", "ortho", "gnom"):
        lat0 = g(("latitude_of_origin", "latitude_of_natural_origin",
                  "latitude_of_center"))
        lon0c = g(("central_meridian", "longitude_of_center",
                   "longitude_of_origin",
                   "longitude_of_natural_origin"), lon0)
        return (fam, lon0c, lat0, fe, fn)
    if fam == "eqdc":
        lat0 = g(("latitude_of_origin", "latitude_of_center",
                  "latitude_of_natural_origin"))
        lat1 = g(("standard_parallel_1",
                  "latitude_of_1st_standard_parallel"), lat0)
        lat2 = g(("standard_parallel_2",
                  "latitude_of_2nd_standard_parallel"), lat1)
        return ("eqdc", lon0, lat0, lat1, lat2, fe, fn)
    if fam == "tmerc":
        lat0 = g(("latitude_of_origin", "latitude_of_natural_origin"))
        if lat0 != 0.0:
            return ("tmerc", lon0, k0, fe, fn, lat0)
    return (fam, lon0, k0, fe, fn)


def _parse_crs(crs: str):
    """-> ('4326'|'3857'|('utm', lon0, south)|('laea', lon0, lat0, fe, fn)
    |('merc', lon0, k0, fe, fn)|('tmerc', lon0, k0, fe, fn)); proj strings
    ('+proj=...') parse via _parse_proj_string, OGC WKT via
    _parse_wkt_crs."""
    if crs.startswith("+"):
        return _parse_proj_string(crs)
    head = crs.lstrip()[:8].upper()
    if head.startswith(("PROJCS", "GEOGCS", "PROJCRS", "GEOGCRS",
                        "GEODCRS")):
        return _parse_wkt_crs(crs)
    if crs == "EPSG:4326":
        return "4326"
    if crs == "EPSG:3857":
        return "3857"
    if crs.startswith("EPSG:326") and len(crs) == 10:
        zone = int(crs[8:])
        if 1 <= zone <= 60:
            return ("utm", -183.0 + 6.0 * zone, False)
    if crs.startswith("EPSG:327") and len(crs) == 10:
        zone = int(crs[8:])
        if 1 <= zone <= 60:
            return ("utm", -183.0 + 6.0 * zone, True)
    if crs == "EPSG:8857":       # WGS84 / Equal Earth Greenwich
        return ("eqearth", 0.0, 0.0, 0.0)
    if crs == "EPSG:3035":        # ETRS89-extended / LAEA Europe
        return ("laea", 10.0, 52.0, 4321000.0, 3210000.0)
    if crs == "EPSG:2154":        # RGF93 / Lambert-93 (LCC 2SP)
        return ("lcc", 3.0, 46.5, 49.0, 44.0, 1.0, 700000.0, 6600000.0)
    if crs == "EPSG:3347":        # NAD83 / Statistics Canada Lambert
        return ("lcc", -91.866667, 63.390675, 49.0, 77.0, 1.0,
                6200000.0, 3000000.0)
    if crs == "EPSG:5070":        # NAD83 / Conus Albers
        return ("aea", -96.0, 23.0, 29.5, 45.5, 0.0, 0.0)
    if crs == "EPSG:3413":        # WGS84 / NSIDC Polar Stereographic N
        return ("stere", -45.0, 70.0, 1.0, False, 0.0, 0.0)
    if crs == "EPSG:3031":        # WGS84 / Antarctic Polar Stereographic
        return ("stere", 0.0, -71.0, 1.0, True, 0.0, 0.0)
    if crs == "EPSG:3995":        # WGS84 / Arctic Polar Stereographic
        return ("stere", 0.0, 71.0, 1.0, False, 0.0, 0.0)
    if crs == "EPSG:28992":       # Amersfoort / RD New (double stereographic)
        return ("datum",
                ("sterea", 5.0 + 23.0 / 60 + 15.5 / 3600,
                 52.0 + 9.0 / 60 + 22.178 / 3600, 0.9999079,
                 155000.0, 463000.0),
                ELLIPSOIDS["bessel"],
                (565.417, 50.3319, 465.552,
                 -0.398957, 0.343988, -1.8774, 4.0725))
    if crs in ("EPSG:21781", "EPSG:2056"):
        # CH1903 / LV03 and CH1903+ / LV95 (Swiss Oblique Mercator ==
        # Hotine variant B with alpha = gamma = 90)
        lv95 = crs == "EPSG:2056"
        return ("datum",
                ("omerc", 7.0 + 26.0 / 60 + 22.5 / 3600,
                 46.0 + 57.0 / 60 + 8.66 / 3600, 90.0, 90.0, 1.0,
                 2600000.0 if lv95 else 600000.0,
                 1200000.0 if lv95 else 200000.0, True),
                ELLIPSOIDS["bessel"], (674.374, 15.056, 405.346))
    if crs == "EPSG:5514":       # S-JTSK / Krovak East North
        return ("datum",
                ("krovak", 24.0 + 50.0 / 60, 49.5,
                 30.0 + 17.0 / 60 + 17.3031 / 3600, 78.5, 0.9999,
                 0.0, 0.0),
                ELLIPSOIDS["bessel"], (589.0, 76.0, 480.0))
    if crs == "EPSG:23700":      # HD72 / EOV (Hungarian national grid)
        return ("datum",
                ("omerc", 19.0 + 2.0 / 60 + 54.8584 / 3600,
                 47.0 + 8.0 / 60 + 39.8174 / 3600, 90.0, 90.0, 0.99993,
                 650000.0, 200000.0, True),
                ELLIPSOIDS["GRS67"], (52.17, -71.82, -14.9))
    if crs == "EPSG:29873":       # Timbalai 1948 / RSO Borneo (m)
        return ("datum",
                ("omerc", 115.0, 4.0, 53.0 + 18.0 / 60 + 56.9537 / 3600,
                 53.0 + 7.0 / 60 + 48.3685 / 3600, 0.99984,
                 590476.87, 442857.65, True),
                ELLIPSOIDS["evrstSS"], (-679.0, 669.0, -48.0))
    if crs == "EPSG:27700":       # OSGB36 / British National Grid
        return ("datum",
                ("tmerc", -2.0, 0.9996012717, 400000.0, -100000.0, 49.0),
                ELLIPSOIDS["airy"], DATUM_DEFS["OSGB36"][1])
    if crs == "EPSG:4277":        # OSGB36 geographic
        return ("datum", "geog", ELLIPSOIDS["airy"],
                DATUM_DEFS["OSGB36"][1])
    if crs == "EPSG:4230":        # ED50 geographic (mean-European shift)
        return ("datum", "geog", ELLIPSOIDS["intl"],
                (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0))
    if crs.startswith("EPSG:230") and len(crs) == 10:
        zone = int(crs[8:])       # ED50 / UTM 28N..38N (EPSG:23028-23038)
        if 28 <= zone <= 38:
            return ("datum", ("utm", -183.0 + 6.0 * zone, False),
                    ELLIPSOIDS["intl"],
                    (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0))
    if crs == "EPSG:6933":        # WGS84 / NSIDC EASE-Grid 2.0 Global
        return ("cea", 0.0, 30.0, 0.0, 0.0)
    if crs in ("EPSG:4087", "EPSG:32662"):
        # WGS84 / World Equidistant Cylindrical (and the deprecated
        # Plate Carree code 32662): lat_ts = 0
        return ("eqc", 0.0, 0.0, 0.0, 0.0)
    if crs.startswith("LAEA:"):   # generic: LAEA:lon0,lat0
        lon0, lat0 = (float(v) for v in crs[5:].split(","))
        return ("laea", lon0, lat0, 0.0, 0.0)
    return None


def _to_4326(crs, x, y):
    return _kind_to_4326(_parse_crs(crs), x, y, crs)


def _kind_to_4326(kind, x, y, crs="?"):
    if isinstance(kind, tuple) and kind[0] == "datum":
        # source-datum projected -> source geodetic -> geocentric ->
        # Helmert -> WGS84 geodetic (ogrct.cpp chain; PROJ +towgs84)
        _, inner, ellps, p = kind
        if inner == "geog":
            lon = np.asarray(x, np.float64)
            lat = np.asarray(y, np.float64)
        elif isinstance(inner, tuple) and inner[0] == "utm" \
                and not _is_wgs84_ellps(*ellps):
            _k, lon0, south = inner
            lon, lat = tm_inverse(x, y, lon0,
                                  fn=10000000.0 if south else 0.0,
                                  ellps=ellps)
        elif isinstance(inner, tuple) and inner[0] == "tmerc" \
                and not _is_wgs84_ellps(*ellps):
            _k, lon0, k0, fe, fn = inner[:5]
            lon, lat = tm_inverse(x, y, lon0, k0=k0, fe=fe, fn=fn,
                                  ellps=ellps,
                                  lat0=inner[5] if len(inner) > 5 else 0.0)
        elif isinstance(inner, tuple) and inner[0] == "sterea":
            _k, lon0, lat0, k0, fe, fn = inner
            lon, lat = sterea_inverse(x, y, lon0, lat0, k0, fe, fn,
                                      ellps=ellps)
        elif isinstance(inner, tuple) and inner[0] == "omerc":
            _k, lonc, latc, al, ga, k0, fe, fn, vb = inner
            lon, lat = omerc_inverse(x, y, lonc, latc, al, ga, k0, fe, fn,
                                     vb, ellps=ellps)
        elif isinstance(inner, tuple) and inner[0] == "krovak":
            _k, lon0, latc, al, lp, k0, fe, fn = inner
            lon, lat = krovak_inverse(x, y, lon0, latc, al, lp, k0, fe, fn,
                                      ellps=ellps)
        elif isinstance(inner, tuple) and inner[0] in _LONGTAIL_INV:
            lon, lat = _LONGTAIL_INV[inner[0]](x, y, *inner[1:],
                                               ellps=ellps)
        else:
            lon, lat = _kind_to_4326(inner, x, y, crs)
        if p is None:
            # ballpark (+nadgrids=@null): no geocentric hop — the
            # geographic coordinates pass through as WGS84
            return lon, lat
        gx, gy, gz = geodetic_to_geocentric(lon, lat, *ellps)
        gx, gy, gz = helmert_to_wgs84(gx, gy, gz, p)
        return geocentric_to_geodetic(gx, gy, gz, *ELLIPSOIDS["WGS84"])
    if isinstance(kind, tuple) and kind[0] == "grid":
        # NTv2: shift applies directly in geographic space (no
        # geocentric hop) — sampled at the source coordinates
        from .ntv2 import apply_gridshift
        _, inner, ellps, path = kind
        if inner == "geog":
            lon = np.asarray(x, np.float64)
            lat = np.asarray(y, np.float64)
        elif isinstance(inner, tuple) and inner[0] == "utm" \
                and not _is_wgs84_ellps(*ellps):
            _k, lon0, south = inner
            lon, lat = tm_inverse(x, y, lon0,
                                  fn=10000000.0 if south else 0.0,
                                  ellps=ellps)
        elif isinstance(inner, tuple) and inner[0] == "tmerc" \
                and not _is_wgs84_ellps(*ellps):
            _k, lon0, k0, fe, fn = inner[:5]
            lon, lat = tm_inverse(x, y, lon0, k0=k0, fe=fe, fn=fn,
                                  ellps=ellps,
                                  lat0=inner[5] if len(inner) > 5 else 0.0)
        else:
            lon, lat = _kind_to_4326(inner, x, y, crs)
        return apply_gridshift(path, lon, lat)
    if kind == "4326":
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    if kind == "3857":
        lon = np.asarray(x, np.float64) / (EARTH_RADIUS * _D2R)
        lat = (2.0 * np.arctan(np.exp(np.asarray(y, np.float64)
                                      / EARTH_RADIUS)) - np.pi / 2.0) / _D2R
        return lon, lat
    if isinstance(kind, tuple) and kind[0] == "utm":
        _, lon0, south = kind
        return tm_inverse(x, y, lon0, fn=10000000.0 if south else 0.0)
    if isinstance(kind, tuple) and kind[0] == "laea":
        _, lon0, lat0, fe, fn = kind
        return laea_inverse(x, y, lon0, lat0, fe, fn)
    if isinstance(kind, tuple) and kind[0] == "tmerc":
        _, lon0, k0, fe, fn = kind[:5]
        return tm_inverse(x, y, lon0, k0=k0, fe=fe, fn=fn,
                          lat0=kind[5] if len(kind) > 5 else 0.0)
    if isinstance(kind, tuple) and kind[0] == "merc":
        _, lon0, k0, fe, fn = kind
        lon = lon0 + (np.asarray(x, np.float64) - fe) \
            / (k0 * EARTH_RADIUS * _D2R)
        lat = (2.0 * np.arctan(np.exp((np.asarray(y, np.float64) - fn)
                                      / (k0 * EARTH_RADIUS)))
               - np.pi / 2.0) / _D2R
        return lon, lat
    if isinstance(kind, tuple) and kind[0] == "lcc":
        _, lon0, lat0, lat1, lat2, k0, fe, fn = kind
        return lcc_inverse(x, y, lon0, lat0, lat1, lat2, k0, fe, fn)
    if isinstance(kind, tuple) and kind[0] == "aea":
        _, lon0, lat0, lat1, lat2, fe, fn = kind
        return aea_inverse(x, y, lon0, lat0, lat1, lat2, fe, fn)
    if isinstance(kind, tuple) and kind[0] == "stere":
        _, lon0, lat_ts, k0, south, fe, fn = kind
        return stere_inverse(x, y, lon0, lat_ts, k0, south, fe, fn)
    if isinstance(kind, tuple) and kind[0] == "sterea":
        _, lon0, lat0, k0, fe, fn = kind
        return sterea_inverse(x, y, lon0, lat0, k0, fe, fn)
    if isinstance(kind, tuple) and kind[0] == "omerc":
        _, lonc, latc, al, ga, k0, fe, fn, vb = kind
        return omerc_inverse(x, y, lonc, latc, al, ga, k0, fe, fn, vb)
    if isinstance(kind, tuple) and kind[0] == "krovak":
        _, lon0, latc, al, lp, k0, fe, fn = kind
        return krovak_inverse(x, y, lon0, latc, al, lp, k0, fe, fn)
    if isinstance(kind, tuple) and kind[0] in _LONGTAIL_INV:
        return _LONGTAIL_INV[kind[0]](x, y, *kind[1:])
    raise ValueError(f"unsupported CRS {crs}")


def _from_4326(crs, lon, lat):
    return _kind_from_4326(_parse_crs(crs), lon, lat, crs)


def _kind_from_4326(kind, lon, lat, crs="?"):
    if isinstance(kind, tuple) and kind[0] == "datum":
        _, inner, ellps, p = kind
        if p is None:       # ballpark (+nadgrids=@null): no datum hop
            lon2 = np.asarray(lon, np.float64)
            lat2 = np.asarray(lat, np.float64)
        else:
            gx, gy, gz = geodetic_to_geocentric(lon, lat,
                                                *ELLIPSOIDS["WGS84"])
            gx, gy, gz = helmert_from_wgs84(gx, gy, gz, p)
            lon2, lat2 = geocentric_to_geodetic(gx, gy, gz, *ellps)
        if inner == "geog":
            return lon2, lat2
        if isinstance(inner, tuple) and inner[0] == "utm" \
                and not _is_wgs84_ellps(*ellps):
            _k, lon0, south = inner
            return tm_forward(lon2, lat2, lon0,
                              fn=10000000.0 if south else 0.0, ellps=ellps)
        if isinstance(inner, tuple) and inner[0] == "tmerc" \
                and not _is_wgs84_ellps(*ellps):
            _k, lon0, k0, fe, fn = inner[:5]
            return tm_forward(lon2, lat2, lon0, k0=k0, fe=fe, fn=fn,
                              ellps=ellps,
                              lat0=inner[5] if len(inner) > 5 else 0.0)
        if isinstance(inner, tuple) and inner[0] == "sterea":
            _k, lon0, lat0, k0, fe, fn = inner
            return sterea_forward(lon2, lat2, lon0, lat0, k0, fe, fn,
                                  ellps=ellps)
        if isinstance(inner, tuple) and inner[0] == "omerc":
            _k, lonc, latc, al, ga, k0, fe, fn, vb = inner
            return omerc_forward(lon2, lat2, lonc, latc, al, ga, k0,
                                 fe, fn, vb, ellps=ellps)
        if isinstance(inner, tuple) and inner[0] == "krovak":
            _k, lon0, latc, al, lp, k0, fe, fn = inner
            return krovak_forward(lon2, lat2, lon0, latc, al, lp, k0,
                                  fe, fn, ellps=ellps)
        if isinstance(inner, tuple) and inner[0] in _LONGTAIL_FWD:
            return _LONGTAIL_FWD[inner[0]](lon2, lat2, *inner[1:],
                                           ellps=ellps)
        return _kind_from_4326(inner, lon2, lat2, crs)
    if isinstance(kind, tuple) and kind[0] == "grid":
        from .ntv2 import apply_gridshift
        _, inner, ellps, path = kind
        lon2, lat2 = apply_gridshift(path, lon, lat, inverse=True)
        if inner == "geog":
            return lon2, lat2
        if isinstance(inner, tuple) and inner[0] == "utm" \
                and not _is_wgs84_ellps(*ellps):
            _k, lon0, south = inner
            return tm_forward(lon2, lat2, lon0,
                              fn=10000000.0 if south else 0.0, ellps=ellps)
        if isinstance(inner, tuple) and inner[0] == "tmerc" \
                and not _is_wgs84_ellps(*ellps):
            _k, lon0, k0, fe, fn = inner[:5]
            return tm_forward(lon2, lat2, lon0, k0=k0, fe=fe, fn=fn,
                              ellps=ellps,
                              lat0=inner[5] if len(inner) > 5 else 0.0)
        return _kind_from_4326(inner, lon2, lat2, crs)
    if kind == "4326":
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    if kind == "3857":
        mx = EARTH_RADIUS * np.asarray(lon, np.float64) * _D2R
        my = EARTH_RADIUS * np.log(np.tan(
            np.pi / 4.0 + np.asarray(lat, np.float64) * _D2R / 2.0))
        return mx, my
    if isinstance(kind, tuple) and kind[0] == "utm":
        _, lon0, south = kind
        return tm_forward(lon, lat, lon0, fn=10000000.0 if south else 0.0)
    if isinstance(kind, tuple) and kind[0] == "laea":
        _, lon0, lat0, fe, fn = kind
        return laea_forward(lon, lat, lon0, lat0, fe, fn)
    if isinstance(kind, tuple) and kind[0] == "tmerc":
        _, lon0, k0, fe, fn = kind[:5]
        return tm_forward(lon, lat, lon0, k0=k0, fe=fe, fn=fn,
                          lat0=kind[5] if len(kind) > 5 else 0.0)
    if isinstance(kind, tuple) and kind[0] == "merc":
        _, lon0, k0, fe, fn = kind
        mx = fe + k0 * EARTH_RADIUS * (np.asarray(lon, np.float64)
                                       - lon0) * _D2R
        my = fn + k0 * EARTH_RADIUS * np.log(np.tan(
            np.pi / 4.0 + np.asarray(lat, np.float64) * _D2R / 2.0))
        return mx, my
    if isinstance(kind, tuple) and kind[0] == "lcc":
        _, lon0, lat0, lat1, lat2, k0, fe, fn = kind
        return lcc_forward(lon, lat, lon0, lat0, lat1, lat2, k0, fe, fn)
    if isinstance(kind, tuple) and kind[0] == "aea":
        _, lon0, lat0, lat1, lat2, fe, fn = kind
        return aea_forward(lon, lat, lon0, lat0, lat1, lat2, fe, fn)
    if isinstance(kind, tuple) and kind[0] == "stere":
        _, lon0, lat_ts, k0, south, fe, fn = kind
        return stere_forward(lon, lat, lon0, lat_ts, k0, south, fe, fn)
    if isinstance(kind, tuple) and kind[0] == "sterea":
        _, lon0, lat0, k0, fe, fn = kind
        return sterea_forward(lon, lat, lon0, lat0, k0, fe, fn)
    if isinstance(kind, tuple) and kind[0] == "omerc":
        _, lonc, latc, al, ga, k0, fe, fn, vb = kind
        return omerc_forward(lon, lat, lonc, latc, al, ga, k0, fe, fn, vb)
    if isinstance(kind, tuple) and kind[0] == "krovak":
        _, lon0, latc, al, lp, k0, fe, fn = kind
        return krovak_forward(lon, lat, lon0, latc, al, lp, k0, fe, fn)
    if isinstance(kind, tuple) and kind[0] in _LONGTAIL_FWD:
        return _LONGTAIL_FWD[kind[0]](lon, lat, *kind[1:])
    raise ValueError(f"unsupported CRS {crs}")


# ---------------------------------------------------------------------------
# GCP polynomial + thin-plate-spline transformers
# (alg/gdaltransformer.cpp:1348 GENIMGPROJ variants: GDALCreateGCPTransformer
#  alg/gdal_crs.cpp — least-squares polynomial order 1..3 fit in BOTH
#  directions; GDALCreateTPSTransformer alg/gdal_tps.cpp /
#  alg/thinplatespline.cpp — radial-basis r^2 ln r^2 + affine part)
#
# A transformer is DEFINED by its control points, so it serializes into the
# CRS string itself: "GCP<order>@<target_crs>:px,py,X,Y;..." and
# "TPS@<target_crs>:px,py,X,Y;...". transform() recognizes these on either
# side of the chain; the dense solve runs once per worker (lru_cache on the
# string) — no broadcast plumbing, the string ships with the task closure.
# ---------------------------------------------------------------------------

from functools import lru_cache as _lru_cache


def gcp_crs(gcps, order: int = 2, crs: str = "EPSG:4326") -> str:
    """[(px, py, X, Y)] -> 'GCP<order>@crs:...' transformer string."""
    body = ";".join(f"{a!r},{b!r},{c!r},{d!r}" for a, b, c, d in gcps)
    return f"GCP{order}@{crs}|{body}"


def tps_crs(gcps, crs: str = "EPSG:4326") -> str:
    body = ";".join(f"{a!r},{b!r},{c!r},{d!r}" for a, b, c, d in gcps)
    return f"TPS@{crs}|{body}"


def _is_fitted_crs(crs: str) -> bool:
    return crs.startswith("GCP") or crs.startswith("TPS@") \
        or crs.startswith("RPC@") or crs.startswith("RPCDEM@")


def _poly_terms(x, y, order: int):
    t = [np.ones_like(x), x, y]
    if order >= 2:
        t += [x * y, x * x, y * y]
    if order >= 3:
        t += [x * x * y, x * y * y, x ** 3, y ** 3]
    return np.stack(t, axis=-1)


def _fit_poly(src: np.ndarray, dst: np.ndarray, order: int):
    """Least-squares polynomial fit (gdal_crs.cpp CRS_compute): src (n,2)
    -> dst (n,2); returns (cx, cy) coefficient vectors."""
    A = _poly_terms(src[:, 0], src[:, 1], order)
    cx, *_ = np.linalg.lstsq(A, dst[:, 0], rcond=None)
    cy, *_ = np.linalg.lstsq(A, dst[:, 1], rcond=None)
    return cx, cy


def _tps_u(r2):
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(r2 > 0, r2 * np.log(r2), 0.0)


def _fit_tps(src: np.ndarray, dst: np.ndarray):
    """Thin-plate-spline solve (alg/thinplatespline.cpp): kernel
    U = r^2 ln r^2 plus an affine part; exact at every control point."""
    n = len(src)
    d2 = ((src[:, None, :] - src[None, :, :]) ** 2).sum(-1)
    K = _tps_u(d2)
    P = np.column_stack([np.ones(n), src])
    A = np.zeros((n + 3, n + 3))
    A[:n, :n] = K
    A[:n, n:] = P
    A[n:, :n] = P.T
    b = np.zeros((n + 3, 2))
    b[:n] = dst
    w = np.linalg.solve(A, b)
    return src.copy(), w


def _apply_tps(ctrl, w, x, y):
    pts = np.stack([np.asarray(x, np.float64).ravel(),
                    np.asarray(y, np.float64).ravel()], axis=-1)
    d2 = ((pts[:, None, :] - ctrl[None, :, :]) ** 2).sum(-1)
    U = _tps_u(d2)
    n = len(ctrl)
    out = U @ w[:n] + w[n] + pts @ w[n + 1:]
    shape = np.asarray(x, np.float64).shape
    return out[:, 0].reshape(shape), out[:, 1].reshape(shape)


@_lru_cache(maxsize=64)
def _fitted(crs: str, forward: bool):
    """-> (target_crs, fn(x, y) -> (x2, y2)). forward maps control-source
    (pixel) space to the target CRS; the reverse direction is an
    independent fit on the swapped pairs, exactly like gdal_crs.cpp
    computing both CRS_georef directions."""
    head, body = crs.split("|", 1)
    kind, target = head.split("@", 1) if "@" in head else (head, "EPSG:4326")
    if kind == "RPC":
        # forward = image (pixel) -> ground CRS = iterative inversion;
        # reverse = ground -> image = direct rational evaluation
        if forward:
            return target, lambda x, y: _rpc_image_to_ground(crs, x, y)
        return target, lambda x, y: _rpc_ground_to_image(crs, x, y)
    if kind == "RPCDEM":
        if forward:
            return target, lambda x, y: _rpc_dem_image_to_ground(crs, x, y)
        return target, lambda x, y: _rpc_dem_ground_to_image(crs, x, y)
    pts = np.array([[float(v) for v in row.split(",")]
                    for row in body.split(";")], np.float64)
    src, dst = pts[:, :2], pts[:, 2:]
    if not forward:
        src, dst = dst, src
    if kind == "TPS":
        ctrl, w = _fit_tps(src, dst)

        def fn(x, y):
            return _apply_tps(ctrl, w, x, y)
    else:
        order = int(kind[3:] or 1)
        cx, cy = _fit_poly(src, dst, order)

        def fn(x, y):
            A = _poly_terms(np.asarray(x, np.float64),
                            np.asarray(y, np.float64), order)
            return A @ cx, A @ cy
    return target, fn


# ---------------------------------------------------------------------------
# RPC transformer (alg/gdal_rpc.cpp GDALCreateRPCTransformer): RPC00B
# rational polynomials image<->ground. Ground->image is the direct 20-term
# cubic rational evaluation (gdal_rpc.cpp RPCComputeTerms/RPCEvaluate);
# image->ground is the iterative inversion. Serialized like GCP/TPS:
# "RPC@<crs>|height;LINE_OFF,...;line_num;line_den;samp_num;samp_den".
# ---------------------------------------------------------------------------

def rpc_crs(meta: dict, line_num, line_den, samp_num, samp_den,
            height: float = 0.0, crs: str = "EPSG:4326") -> str:
    """meta keys: LINE_OFF, SAMP_OFF, LAT_OFF, LONG_OFF, HEIGHT_OFF,
    LINE_SCALE, SAMP_SCALE, LAT_SCALE, LONG_SCALE, HEIGHT_SCALE."""
    keys = ("LINE_OFF", "SAMP_OFF", "LAT_OFF", "LONG_OFF", "HEIGHT_OFF",
            "LINE_SCALE", "SAMP_SCALE", "LAT_SCALE", "LONG_SCALE",
            "HEIGHT_SCALE")
    m = ",".join(repr(float(meta[k])) for k in keys)
    cs = ";".join(",".join(repr(float(v)) for v in c)
                  for c in (line_num, line_den, samp_num, samp_den))
    return f"RPC@{crs}|{height!r};{m};{cs}"


def _rpc_terms(L, P, H):
    """RPC00B 20-term ordering (gdal_rpc.cpp RPCComputeTerms)."""
    one = np.ones_like(L)
    return np.stack([
        one, L, P, H, L * P, L * H, P * H, L * L, P * P, H * H,
        L * P * H, L ** 3, L * P * P, L * H * H, L * L * P, P ** 3,
        P * H * H, L * L * H, P * P * H, H ** 3], axis=-1)


def _parse_rpc(crs: str):
    body = crs.split("|", 1)[1]
    parts = body.split(";")
    height = float(parts[0])
    meta = [float(v) for v in parts[1].split(",")]
    coefs = [np.array([float(v) for v in p.split(",")], np.float64)
             for p in parts[2:6]]
    return height, meta, coefs


def _rpc_ground_to_image(crs: str, lon, lat):
    height, meta, (ln, ld, sn, sd) = _parse_rpc(crs)
    (line_off, samp_off, lat_off, long_off, h_off,
     line_sc, samp_sc, lat_sc, long_sc, h_sc) = meta
    L = (np.asarray(lon, np.float64) - long_off) / long_sc
    P = (np.asarray(lat, np.float64) - lat_off) / lat_sc
    H = np.full_like(L, (height - h_off) / h_sc)
    t = _rpc_terms(L, P, H)
    samp = (t @ sn) / (t @ sd) * samp_sc + samp_off
    line = (t @ ln) / (t @ ld) * line_sc + line_off
    return samp, line


def rpc_dem_crs(meta: dict, line_num, line_den, samp_num, samp_den,
                dem_path: str, crs: str = "EPSG:4326") -> str:
    """RPC transformer with per-point heights sampled from a DEM file
    (alg/gdal_rpc.cpp RPC_DEM + RPCDEMINTERPOLATION=bilinear). The DEM
    path ships inside the CRS string like the GCP/TPS control points;
    each worker loads it once (lru_cache) — the scale contract is a
    single-file DEM readable from every executor (local/NFS), same as
    the reference's per-process DEM dataset handle."""
    if ";" in dem_path or "|" in dem_path:
        raise ValueError("DEM path must not contain ';' or '|'")
    keys = ("LINE_OFF", "SAMP_OFF", "LAT_OFF", "LONG_OFF", "HEIGHT_OFF",
            "LINE_SCALE", "SAMP_SCALE", "LAT_SCALE", "LONG_SCALE",
            "HEIGHT_SCALE")
    m = ",".join(repr(float(meta[k])) for k in keys)
    cs = ";".join(",".join(repr(float(v)) for v in c)
                  for c in (line_num, line_den, samp_num, samp_den))
    return f"RPCDEM@{crs}|{dem_path};{m};{cs}"


@_lru_cache(maxsize=16)
def _load_dem_local(path: str):
    """Plain local DEM load for transformer workers (NO SparkSession —
    this runs inside executor tasks): AAIGrid .asc or SRTM .hgt.
    -> (array float64 rows top-down, geotransform 6-tuple)."""
    low = path.lower()
    if low.endswith(".hgt"):
        import math as _m
        size = os.path.getsize(path)
        n = int(_m.isqrt(size // 2))
        arr = np.fromfile(path, dtype=">i2").reshape(n, n).astype(
            np.float64)
        return arr, (0.0, 1.0, 0.0, float(n), 0.0, -1.0)
    hdr, vals = {}, []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0].lower() in ("ncols", "nrows", "xllcorner",
                                  "yllcorner", "cellsize",
                                  "nodata_value"):
                hdr[tok[0].lower()] = float(tok[1])
            else:
                vals.extend(float(v) for v in tok)
    w, h = int(hdr["ncols"]), int(hdr["nrows"])
    arr = np.array(vals, np.float64).reshape(h, w)
    cs = hdr["cellsize"]
    gt = (hdr["xllcorner"], cs, 0.0,
          hdr["yllcorner"] + h * cs, 0.0, -cs)
    return arr, gt


def _dem_sample(path: str, lon, lat):
    """Bilinear DEM sample at ground coordinates, edge-clamped (the
    reference's GDALRPCGetHeightAtLongLat bilinear path)."""
    arr, gt = _load_dem_local(path)
    h, w = arr.shape
    gx = (np.asarray(lon, np.float64) - gt[0]) / gt[1] - 0.5
    gy = (np.asarray(lat, np.float64) - gt[3]) / gt[5] - 0.5
    gx = np.clip(gx, 0.0, w - 1.0)
    gy = np.clip(gy, 0.0, h - 1.0)
    i0 = np.minimum(np.floor(gx).astype(np.int64), w - 2)
    j0 = np.minimum(np.floor(gy).astype(np.int64), h - 2)
    fx = gx - i0
    fy = gy - j0
    return ((1 - fx) * (1 - fy) * arr[j0, i0]
            + fx * (1 - fy) * arr[j0, i0 + 1]
            + (1 - fx) * fy * arr[j0 + 1, i0]
            + fx * fy * arr[j0 + 1, i0 + 1])


def _parse_rpc_dem(crs: str):
    body = crs.split("|", 1)[1]
    parts = body.split(";")
    dem_path = parts[0]
    meta = [float(v) for v in parts[1].split(",")]
    coefs = [np.array([float(v) for v in p.split(",")], np.float64)
             for p in parts[2:6]]
    return dem_path, meta, coefs


def _rpc_dem_ground_to_image(crs: str, lon, lat):
    dem_path, meta, (ln, ld, sn, sd) = _parse_rpc_dem(crs)
    (line_off, samp_off, lat_off, long_off, h_off,
     line_sc, samp_sc, lat_sc, long_sc, h_sc) = meta
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    L = (lon - long_off) / long_sc
    P = (lat - lat_off) / lat_sc
    H = (_dem_sample(dem_path, lon, lat) - h_off) / h_sc
    t = _rpc_terms(L, P, H)
    samp = (t @ sn) / (t @ sd) * samp_sc + samp_off
    line = (t @ ln) / (t @ ld) * line_sc + line_off
    return samp, line


def _rpc_dem_image_to_ground(crs: str, samp, line, iters: int = 12):
    """Iterative inversion with the DEM height refreshed at the current
    ground estimate every round (gdal_rpc.cpp RPCInverseTransformPoint
    with RPC_DEM)."""
    _dem, meta, _ = _parse_rpc_dem(crs)
    (_lo, _so, lat_off, long_off, _ho,
     _ls, _ss, lat_sc, long_sc, _hs) = meta
    lon = np.full_like(np.asarray(samp, np.float64), long_off)
    lat = np.full_like(np.asarray(line, np.float64), lat_off)
    eps_lon, eps_lat = 1e-7 * long_sc, 1e-7 * lat_sc
    for _ in range(iters):
        s0, l0 = _rpc_dem_ground_to_image(crs, lon, lat)
        fx, fy = s0 - samp, l0 - line
        s1, l1 = _rpc_dem_ground_to_image(crs, lon + eps_lon, lat)
        s2, l2 = _rpc_dem_ground_to_image(crs, lon, lat + eps_lat)
        a = (s1 - s0) / eps_lon
        b = (s2 - s0) / eps_lat
        c = (l1 - l0) / eps_lon
        d = (l2 - l0) / eps_lat
        det = a * d - b * c
        det = np.where(np.abs(det) < 1e-30, 1e-30, det)
        lon = lon - (d * fx - b * fy) / det
        lat = lat - (-c * fx + a * fy) / det
    return lon, lat


def _rpc_image_to_ground(crs: str, samp, line, iters: int = 12):
    """Iterative inversion (gdal_rpc.cpp reverse transform): damped Newton
    on the normalized ground coords with a numeric 2x2 Jacobian."""
    height, meta, _ = _parse_rpc(crs)
    (_lo, _so, lat_off, long_off, _ho,
     _ls, _ss, lat_sc, long_sc, _hs) = meta
    lon = np.full_like(np.asarray(samp, np.float64), long_off)
    lat = np.full_like(np.asarray(line, np.float64), lat_off)
    eps_lon, eps_lat = 1e-7 * long_sc, 1e-7 * lat_sc
    for _ in range(iters):
        s0, l0 = _rpc_ground_to_image(crs, lon, lat)
        fx, fy = s0 - samp, l0 - line
        s1, l1 = _rpc_ground_to_image(crs, lon + eps_lon, lat)
        s2, l2 = _rpc_ground_to_image(crs, lon, lat + eps_lat)
        a = (s1 - s0) / eps_lon
        b = (s2 - s0) / eps_lat
        c = (l1 - l0) / eps_lon
        d = (l2 - l0) / eps_lat
        det = a * d - b * c
        det = np.where(np.abs(det) < 1e-30, 1e-30, det)
        lon = lon - (d * fx - b * fy) / det
        lat = lat - (-c * fx + a * fy) / det
    return lon, lat


# ---------------------------------------------------------------------------
# gdalsrsinfo twin — format any accepted CRS as proj4 / OGC WKT1
# ---------------------------------------------------------------------------

_WGS84_GEOGCS = ('GEOGCS["WGS 84",DATUM["WGS_1984",'
                 'SPHEROID["WGS 84",6378137,298.257223563]],'
                 'PRIMEM["Greenwich",0],'
                 'UNIT["degree",0.0174532925199433],'
                 'AUTHORITY["EPSG","4326"]]')


def format_proj4(crs: str) -> str:
    """CRS in any accepted spelling -> proj4 string (the reference's
    OGRSpatialReference::exportToProj4, ogr/ogrspatialreference.cpp; only
    the families this engine implements). Round-trips through
    _parse_proj_string."""
    kind = _parse_crs(crs)
    if kind is None:
        raise ValueError(f"unsupported CRS {crs!r}")
    return format_proj4_kind(kind)


def format_proj4_kind(kind) -> str:
    if kind == "4326":
        return "+proj=longlat +datum=WGS84 +no_defs"
    if kind == "3857":
        return ("+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 "
                "+x_0=0 +y_0=0 +k=1 +units=m +nadgrids=@null +no_defs")
    fam = kind[0]
    if fam == "utm":
        _, lon0, south = kind
        zone = int(round((lon0 + 183.0) / 6.0))
        s = " +south" if south else ""
        return f"+proj=utm +zone={zone}{s} +datum=WGS84 +units=m +no_defs"
    if fam == "laea":
        _, lon0, lat0, fe, fn = kind
        return (f"+proj=laea +lat_0={lat0:.10g} +lon_0={lon0:.10g} "
                f"+x_0={fe:.10g} +y_0={fn:.10g} +datum=WGS84 +units=m +no_defs")
    if fam == "lcc":
        _, lon0, lat0, lat1, lat2, k0, fe, fn = kind
        return (f"+proj=lcc +lat_1={lat1:.10g} +lat_2={lat2:.10g} "
                f"+lat_0={lat0:.10g} +lon_0={lon0:.10g} +k_0={k0:.10g} "
                f"+x_0={fe:.10g} +y_0={fn:.10g} +datum=WGS84 +units=m +no_defs")
    if fam == "aea":
        _, lon0, lat0, lat1, lat2, fe, fn = kind
        return (f"+proj=aea +lat_1={lat1:.10g} +lat_2={lat2:.10g} "
                f"+lat_0={lat0:.10g} +lon_0={lon0:.10g} "
                f"+x_0={fe:.10g} +y_0={fn:.10g} +datum=WGS84 +units=m +no_defs")
    if fam == "stere":
        _, lon0, lat_ts, k0, south, fe, fn = kind
        ts = f" +lat_ts={lat_ts:.10g}" if lat_ts is not None else ""
        return (f"+proj=stere +lat_0={-90 if south else 90}{ts} "
                f"+lon_0={lon0:.10g} +k_0={k0:.10g} +x_0={fe:.10g} +y_0={fn:.10g} "
                "+datum=WGS84 +units=m +no_defs")
    if fam == "sterea":
        _, lon0, lat0, k0, fe, fn = kind
        return (f"+proj=sterea +lat_0={lat0:.12g} +lon_0={lon0:.12g} "
                f"+k_0={k0:.10g} +x_0={fe:.10g} +y_0={fn:.10g} "
                "+datum=WGS84 +units=m +no_defs")
    if fam == "omerc":
        _, lonc, latc, al, ga, k0, fe, fn, vb = kind
        off = "" if vb else " +no_uoff"
        return (f"+proj=omerc +lat_0={latc:.12g} +lonc={lonc:.12g} "
                f"+alpha={al:.12g} +gamma={ga:.12g} +k_0={k0:.10g} "
                f"+x_0={fe:.10g} +y_0={fn:.10g}{off} "
                "+datum=WGS84 +units=m +no_defs")
    if fam == "krovak":
        _, lon0, latc, al, lp, k0, fe, fn = kind
        return (f"+proj=krovak +lat_0={latc:.12g} +lon_0={lon0:.12g} "
                f"+alpha={al:.12g} +k={k0:.10g} "
                f"+x_0={fe:.10g} +y_0={fn:.10g} +datum=WGS84 +units=m +no_defs")
    if fam == "eqc":
        _, lon0, lat1, fe, fn = kind
        return (f"+proj=eqc +lat_ts={lat1:.10g} +lon_0={lon0:.10g} "
                f"+x_0={fe:.10g} +y_0={fn:.10g} +datum=WGS84 +units=m +no_defs")
    if fam == "cea":
        _, lon0, lat_ts, fe, fn = kind
        return (f"+proj=cea +lat_ts={lat_ts:.10g} +lon_0={lon0:.10g} "
                f"+x_0={fe:.10g} +y_0={fn:.10g} +datum=WGS84 +units=m +no_defs")
    if fam == "bonne":
        _, lat1, lon0, fe, fn = kind
        return (f"+proj=bonne +lat_1={lat1:.10g} +lon_0={lon0:.10g} "
                f"+x_0={fe:.10g} +y_0={fn:.10g} +datum=WGS84 +units=m +no_defs")
    if fam == "nzmg":
        _, fe, fn = kind
        return (f"+proj=nzmg +x_0={fe:.10g} +y_0={fn:.10g} "
                f"+units=m +no_defs")
    if fam in ("sinu", "moll", "eck4", "mill", "robin", "eqearth",
               "vandg", "igh"):
        _, lon0, fe, fn = kind
        return (f"+proj={fam} +lon_0={lon0:.10g} "
                f"+x_0={fe:.10g} +y_0={fn:.10g} +datum=WGS84 +units=m +no_defs")
    if fam == "geos":
        _, lon0, hh, sx, fe, fn = kind
        return (f"+proj=geos +h={hh:.10g} +lon_0={lon0:.10g} "
                f"+sweep={'x' if sx else 'y'} "
                f"+x_0={fe:.10g} +y_0={fn:.10g} +datum=WGS84 +units=m +no_defs")
    if fam in ("cass", "poly", "aeqd", "ortho", "gnom"):
        _, lon0, lat0, fe, fn = kind
        return (f"+proj={fam} +lat_0={lat0:.10g} +lon_0={lon0:.10g} "
                f"+x_0={fe:.10g} +y_0={fn:.10g} +datum=WGS84 +units=m +no_defs")
    if fam == "eqdc":
        _, lon0, lat0, lat1, lat2, fe, fn = kind
        return (f"+proj=eqdc +lat_1={lat1:.10g} +lat_2={lat2:.10g} "
                f"+lat_0={lat0:.10g} +lon_0={lon0:.10g} "
                f"+x_0={fe:.10g} +y_0={fn:.10g} +datum=WGS84 +units=m +no_defs")
    if fam == "datum":
        _, inner, ellps, p = kind
        base = ("+proj=longlat" if inner == "geog"
                else format_proj4_kind(inner).rsplit(" +datum=", 1)[0])
        en = next((nm for nm, ab in ELLIPSOIDS.items()
                   if ab == tuple(ellps)), None)
        if ellps[1] == 0.0:
            ell = f" +R={ellps[0]:.10g}"
        elif en:
            ell = f" +ellps={en}"
        else:
            ell = f" +a={ellps[0]:.10g} +rf={1.0 / ellps[1]:.10g}"
        if p is None:       # ballpark: no datum shift
            return f"{base}{ell} +nadgrids=@null +units=m +no_defs"
        tow = ",".join(f"{v:.10g}" for v in p)
        return f"{base}{ell} +towgs84={tow} +units=m +no_defs"
    _, lon0, k0, fe, fn = kind[:5]
    lat0 = kind[5] if fam == "tmerc" and len(kind) > 5 else 0.0
    return (f"+proj={fam} +lat_0={lat0:.10g} +lon_0={lon0:.10g} "
            f"+k_0={k0:.10g} "
            f"+x_0={fe:.10g} +y_0={fn:.10g} +datum=WGS84 +units=m +no_defs")


_WKT_FAM_METHOD = {"tmerc": "Transverse_Mercator", "merc": "Mercator_1SP",
                   "laea": "Lambert_Azimuthal_Equal_Area"}


def format_wkt1(crs: str) -> str:
    """CRS -> OGC WKT1 (exportToWkt twin); round-trips through
    _parse_wkt_crs."""
    kind = _parse_crs(crs)
    if kind is None:
        raise ValueError(f"unsupported CRS {crs!r}")
    if kind == "4326":
        return _WGS84_GEOGCS
    if kind == "3857":
        return ('PROJCS["WGS 84 / Pseudo-Mercator",' + _WGS84_GEOGCS
                + ',PROJECTION["Mercator_1SP"],'
                  'PARAMETER["central_meridian",0],'
                  'PARAMETER["scale_factor",1],'
                  'PARAMETER["false_easting",0],'
                  'PARAMETER["false_northing",0],UNIT["metre",1],'
                  'AUTHORITY["EPSG","3857"]]')
    fam = kind[0]
    if fam == "utm":
        _, lon0, south = kind
        zone = int(round((lon0 + 183.0) / 6.0))
        code = (32700 if south else 32600) + zone
        return (f'PROJCS["WGS 84 / UTM zone {zone}{"S" if south else "N"}",'
                + _WGS84_GEOGCS
                + ',PROJECTION["Transverse_Mercator"],'
                  'PARAMETER["latitude_of_origin",0],'
                  f'PARAMETER["central_meridian",{lon0:.10g}],'
                  'PARAMETER["scale_factor",0.9996],'
                  'PARAMETER["false_easting",500000],'
                  f'PARAMETER["false_northing",{10000000 if south else 0}],'
                  f'UNIT["metre",1],AUTHORITY["EPSG","{code}"]]')
    if fam == "laea":
        _, lon0, lat0, fe, fn = kind
        return ('PROJCS["unnamed",' + _WGS84_GEOGCS
                + ',PROJECTION["Lambert_Azimuthal_Equal_Area"],'
                  f'PARAMETER["latitude_of_center",{lat0:.10g}],'
                  f'PARAMETER["longitude_of_center",{lon0:.10g}],'
                  f'PARAMETER["false_easting",{fe:.10g}],'
                  f'PARAMETER["false_northing",{fn:.10g}],UNIT["metre",1]]')
    if fam in ("lcc", "aea"):
        if fam == "lcc":
            _, lon0, lat0, lat1, lat2, k0, fe, fn = kind
            method, extra = "Lambert_Conformal_Conic_2SP", \
                f'PARAMETER["scale_factor",{k0:.10g}],'
        else:
            _, lon0, lat0, lat1, lat2, fe, fn = kind
            method, extra = "Albers_Conic_Equal_Area", ""
        return ('PROJCS["unnamed",' + _WGS84_GEOGCS
                + f',PROJECTION["{method}"],'
                  f'PARAMETER["standard_parallel_1",{lat1:.10g}],'
                  f'PARAMETER["standard_parallel_2",{lat2:.10g}],'
                  f'PARAMETER["latitude_of_origin",{lat0:.10g}],'
                  f'PARAMETER["central_meridian",{lon0:.10g}],' + extra
                + f'PARAMETER["false_easting",{fe:.10g}],'
                  f'PARAMETER["false_northing",{fn:.10g}],UNIT["metre",1]]')
    if fam == "stere":
        _, lon0, lat_ts, k0, south, fe, fn = kind
        lat0 = -90 if south else 90
        ts = lat_ts if lat_ts is not None else lat0
        return ('PROJCS["unnamed",' + _WGS84_GEOGCS
                + ',PROJECTION["Polar_Stereographic"],'
                  f'PARAMETER["latitude_of_origin",{lat0:.10g}],'
                  f'PARAMETER["standard_parallel_1",{ts:.10g}],'
                  f'PARAMETER["central_meridian",{lon0:.10g}],'
                  f'PARAMETER["scale_factor",{k0:.10g}],'
                  f'PARAMETER["false_easting",{fe:.10g}],'
                  f'PARAMETER["false_northing",{fn:.10g}],UNIT["metre",1]]')
    if fam == "sterea":
        _, lon0, lat0, k0, fe, fn = kind
        return ('PROJCS["unnamed",' + _WGS84_GEOGCS
                + ',PROJECTION["Oblique_Stereographic"],'
                  f'PARAMETER["latitude_of_origin",{lat0:.12g}],'
                  f'PARAMETER["central_meridian",{lon0:.12g}],'
                  f'PARAMETER["scale_factor",{k0:.10g}],'
                  f'PARAMETER["false_easting",{fe:.10g}],'
                  f'PARAMETER["false_northing",{fn:.10g}],UNIT["metre",1]]')
    if fam == "omerc":
        _, lonc, latc, al, ga, k0, fe, fn, vb = kind
        method = "Hotine_Oblique_Mercator_Azimuth_Center" if vb \
            else "Hotine_Oblique_Mercator"
        return ('PROJCS["unnamed",' + _WGS84_GEOGCS
                + f',PROJECTION["{method}"],'
                  f'PARAMETER["latitude_of_center",{latc:.12g}],'
                  f'PARAMETER["longitude_of_center",{lonc:.12g}],'
                  f'PARAMETER["azimuth",{al:.12g}],'
                  f'PARAMETER["rectified_grid_angle",{ga:.12g}],'
                  f'PARAMETER["scale_factor",{k0:.10g}],'
                  f'PARAMETER["false_easting",{fe:.10g}],'
                  f'PARAMETER["false_northing",{fn:.10g}],UNIT["metre",1]]')
    if fam == "krovak":
        _, lon0, latc, al, lp, k0, fe, fn = kind
        return ('PROJCS["unnamed",' + _WGS84_GEOGCS
                + ',PROJECTION["Krovak"],'
                  f'PARAMETER["latitude_of_center",{latc:.12g}],'
                  f'PARAMETER["longitude_of_center",{lon0:.12g}],'
                  f'PARAMETER["azimuth",{al:.12g}],'
                  f'PARAMETER["pseudo_standard_parallel_1",{lp:.12g}],'
                  f'PARAMETER["scale_factor",{k0:.10g}],'
                  f'PARAMETER["false_easting",{fe:.10g}],'
                  f'PARAMETER["false_northing",{fn:.10g}],UNIT["metre",1]]')
    if fam in ("eqc", "cea"):
        _, lon0, lat1, fe, fn = kind
        method = "Equirectangular" if fam == "eqc" \
            else "Cylindrical_Equal_Area"
        return ('PROJCS["unnamed",' + _WGS84_GEOGCS
                + f',PROJECTION["{method}"],'
                  f'PARAMETER["standard_parallel_1",{lat1:.10g}],'
                  f'PARAMETER["central_meridian",{lon0:.10g}],'
                  f'PARAMETER["false_easting",{fe:.10g}],'
                  f'PARAMETER["false_northing",{fn:.10g}],UNIT["metre",1]]')
    if fam == "geos":
        _, lon0, hh, sx, fe, fn = kind
        method = ("Geostationary_Satellite_(Sweep_X)" if sx
                  else "Geostationary_Satellite")
        return ('PROJCS["unnamed",' + _WGS84_GEOGCS
                + f',PROJECTION["{method}"],'
                  f'PARAMETER["central_meridian",{lon0:.10g}],'
                  f'PARAMETER["satellite_height",{hh:.10g}],'
                  f'PARAMETER["false_easting",{fe:.10g}],'
                  f'PARAMETER["false_northing",{fn:.10g}],UNIT["metre",1]]')
    if fam == "nzmg":
        _, fe, fn = kind
        return ('PROJCS["unnamed",' + _WGS84_GEOGCS
                + ',PROJECTION["New_Zealand_Map_Grid"],'
                  'PARAMETER["latitude_of_origin",-41],'
                  'PARAMETER["central_meridian",173],'
                  f'PARAMETER["false_easting",{fe:.10g}],'
                  f'PARAMETER["false_northing",{fn:.10g}],UNIT["metre",1]]')
    if fam == "bonne":
        _, lat1, lon0, fe, fn = kind
        return ('PROJCS["unnamed",' + _WGS84_GEOGCS
                + ',PROJECTION["Bonne"],'
                  f'PARAMETER["standard_parallel_1",{lat1:.10g}],'
                  f'PARAMETER["central_meridian",{lon0:.10g}],'
                  f'PARAMETER["false_easting",{fe:.10g}],'
                  f'PARAMETER["false_northing",{fn:.10g}],UNIT["metre",1]]')
    if fam in ("sinu", "moll", "eck4", "mill", "robin", "eqearth",
               "vandg", "igh"):
        _, lon0, fe, fn = kind
        method = {"sinu": "Sinusoidal", "moll": "Mollweide",
                  "eck4": "Eckert_IV", "mill": "Miller_Cylindrical",
                  "robin": "Robinson", "eqearth": "Equal_Earth",
                  "vandg": "VanDerGrinten",
                  "igh": "Interrupted_Goode_Homolosine"}[fam]
        return ('PROJCS["unnamed",' + _WGS84_GEOGCS
                + f',PROJECTION["{method}"],'
                  f'PARAMETER["central_meridian",{lon0:.10g}],'
                  f'PARAMETER["false_easting",{fe:.10g}],'
                  f'PARAMETER["false_northing",{fn:.10g}],UNIT["metre",1]]')
    if fam in ("cass", "poly", "aeqd", "ortho", "gnom"):
        _, lon0, lat0, fe, fn = kind
        method = {"cass": "Cassini_Soldner", "poly": "Polyconic",
                  "aeqd": "Azimuthal_Equidistant",
                  "ortho": "Orthographic", "gnom": "Gnomonic"}[fam]
        return ('PROJCS["unnamed",' + _WGS84_GEOGCS
                + f',PROJECTION["{method}"],'
                  f'PARAMETER["latitude_of_origin",{lat0:.10g}],'
                  f'PARAMETER["central_meridian",{lon0:.10g}],'
                  f'PARAMETER["false_easting",{fe:.10g}],'
                  f'PARAMETER["false_northing",{fn:.10g}],UNIT["metre",1]]')
    if fam == "eqdc":
        _, lon0, lat0, lat1, lat2, fe, fn = kind
        return ('PROJCS["unnamed",' + _WGS84_GEOGCS
                + ',PROJECTION["Equidistant_Conic"],'
                  f'PARAMETER["standard_parallel_1",{lat1:.10g}],'
                  f'PARAMETER["standard_parallel_2",{lat2:.10g}],'
                  f'PARAMETER["latitude_of_origin",{lat0:.10g}],'
                  f'PARAMETER["central_meridian",{lon0:.10g}],'
                  f'PARAMETER["false_easting",{fe:.10g}],'
                  f'PARAMETER["false_northing",{fn:.10g}],UNIT["metre",1]]')
    _, lon0, k0, fe, fn = kind
    return ('PROJCS["unnamed",' + _WGS84_GEOGCS
            + f',PROJECTION["{_WKT_FAM_METHOD[fam]}"],'
              'PARAMETER["latitude_of_origin",0],'
              f'PARAMETER["central_meridian",{lon0:.10g}],'
              f'PARAMETER["scale_factor",{k0:.10g}],'
              f'PARAMETER["false_easting",{fe:.10g}],'
              f'PARAMETER["false_northing",{fn:.10g}],UNIT["metre",1]]')


def srs_info(crs: str) -> dict:
    """gdalsrsinfo twin (apps/gdalsrsinfo.cpp): one dict with the parsed
    family tuple plus proj4 and WKT1 spellings, each of which re-parses to
    the same kernels."""
    return {"kind": _parse_crs(crs), "proj4": format_proj4(crs),
            "wkt": format_wkt1(crs)}
