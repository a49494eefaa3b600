"""New Zealand Map Grid (EPSG 9811) — the complex-polynomial conformal
projection. Constants are pinned by the projection's DEFINING
properties: exact conformality of the analytic series, point scale
within the published 2.6e-4 of unity over the NZ land extent, and the
known NZMG coordinates of major cities."""

import numpy as np

from gdal_spark.raster import transforms as tr

FE, FN = 2510000.0, 6023150.0


def _scale(lon, lat):
    h = 1e-6
    x0, y0 = tr.nzmg_forward(np.array([lon]), np.array([lat]))
    x1, y1 = tr.nzmg_forward(np.array([lon + h]), np.array([lat]))
    x2, y2 = tr.nzmg_forward(np.array([lon]), np.array([lat + h]))
    phi = np.radians(lat)
    a, f = tr.ELLIPSOIDS["intl"]
    e2 = f * (2.0 - f)
    w2 = 1 - e2 * np.sin(phi) ** 2
    n = a / np.sqrt(w2)
    m = a * (1 - e2) / w2 ** 1.5
    k_par = float(np.hypot(x1 - x0, y1 - y0)
                  / (np.radians(h) * n * np.cos(phi)))
    k_mer = float(np.hypot(x2 - x0, y2 - y0) / (np.radians(h) * m))
    return k_par, k_mer


CITIES = {  # (lon, lat) -> known NZMG (E, N), +-150 m
    (174.77, -36.85): (2668260, 6482202),     # Auckland
    (174.78, -41.29): (2659088, 5989425),     # Wellington
    (172.64, -43.53): (2480921, 5742062),     # Christchurch
    (170.50, -45.87): (2315762, 5479186),     # Dunedin
}


def test_city_coordinates():
    for (lon, lat), (e, n) in CITIES.items():
        x, y = tr.nzmg_forward(np.array([lon]), np.array([lat]), FE, FN)
        assert abs(x[0] - e) < 150.0
        assert abs(y[0] - n) < 150.0


def test_land_scale_within_published_bound():
    # NZMG was fitted so scale error over NZ land < 2.6e-4
    for lon, lat in [(173.26, -35.11), (174.77, -36.85), (178.02, -38.66),
                     (174.78, -41.29), (172.64, -43.53), (170.50, -45.87),
                     (168.35, -46.41), (166.7, -45.6)]:
        k_par, k_mer = _scale(lon, lat)
        assert abs(k_par - 1) < 2.6e-4, (lon, lat, k_par)


def test_conformality():
    # complex-analytic => parallel and meridian scales agree everywhere
    for lon, lat in [(167.0, -46.0), (171.5, -42.0), (176.0, -38.0),
                     (178.5, -36.0)]:
        k_par, k_mer = _scale(lon, lat)
        assert abs(k_par - k_mer) < 1e-7


def test_roundtrip():
    rng = np.random.RandomState(9)
    lon = rng.uniform(166.0, 179.0, 50)
    lat = rng.uniform(-47.5, -34.5, 50)
    x, y = tr.nzmg_forward(lon, lat, FE, FN)
    lo, la = tr.nzmg_inverse(x, y, FE, FN)
    assert np.allclose(lo, lon, atol=1e-9)
    assert np.allclose(la, lat, atol=1e-9)


def test_crs_dispatch():
    k = tr._parse_crs("+proj=nzmg")
    assert k == ("nzmg", 2510000.0, 6023150.0)
    assert tr._parse_crs(tr.format_proj4_kind(k)) == k
    assert tr._parse_crs(tr.format_wkt1("+proj=nzmg")) == k
