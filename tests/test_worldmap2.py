"""Round-4 world-map CRS additions: Equal Earth, Van der Grinten I,
Bonne, interrupted Goode homolosine — Snyder worked examples, the
projections' defining invariants (equal-area Jacobians, lobe
continuity), roundtrips, and CRS-string dispatch."""

import numpy as np
import pytest

from gdal_spark.raster import transforms as tr

LON = np.array([2.0, -75.3, 150.1, -120.7, 12.5, 179.2, -0.4])
LAT = np.array([48.0, -33.2, 60.5, -60.1, 0.5, 82.3, -84.1])


def _jacobian(fwd, lon, lat, **kw):
    h = 1e-6
    x0, y0 = fwd(lon, lat, **kw)
    x1, y1 = fwd(lon + h, lat, **kw)
    x2, y2 = fwd(lon, lat + h, **kw)
    d2r = np.pi / 180.0
    return ((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)) / (h * d2r) ** 2


def _ellipsoidal_cell_area(lat):
    """a^2 (1-e2) cos(phi) / (1 - e2 sin^2 phi)^2 — the true area element."""
    phi = lat * np.pi / 180.0
    a, e2 = 6378137.0, tr._E2
    return a * a * (1 - e2) * np.cos(phi) / (1 - e2 * np.sin(phi) ** 2) ** 2


def test_vandg_snyder_worked_example():
    # Snyder p. 368 numerical example (sphere R = 1, lon_0 = -85):
    # phi = -50, lam = -160 -> x = -1.1954154, y = -0.9960733
    x, y = tr.vandg_forward(np.array([-160.0]), np.array([-50.0]), -85.0,
                            ellps=(1.0, 0.0))
    assert abs(x[0] - (-1.1954154)) < 5e-7
    assert abs(y[0] - (-0.9960733)) < 5e-7


def test_bonne_snyder_worked_example_x():
    # Snyder Appendix A Bonne example (Clarke 1866, phi1 = 40N,
    # lon0 = -75): phi = 30N, lam = -85 -> x = -962,915.1 m
    x, _y = tr.bonne_forward(np.array([-85.0]), np.array([30.0]), 40.0,
                             -75.0, ellps=tr.ELLIPSOIDS["clrk66"])
    assert abs(x[0] - (-962915.1)) < 0.2


@pytest.mark.parametrize("fam", ["eqearth", "bonne"])
def test_equal_area_jacobian_ellipsoidal(fam):
    if fam == "eqearth":
        det = _jacobian(tr.eqearth_forward, LON, LAT, lon0=0.0)
    else:
        det = _jacobian(lambda lo, la, lon0: tr.bonne_forward(
            lo, la, 45.0, lon0), LON, LAT, lon0=0.0)
    assert np.allclose(det, _ellipsoidal_cell_area(LAT), rtol=2e-4)


def test_igh_equal_area_spherical():
    # igh is spherical (PROJ forces es = 0): det J = a^2 cos(phi),
    # checked away from lobe seams and the sinu/moll band edge
    lon = np.array([-150.0, -60.0, 50.0, 120.0])
    lat = np.array([55.0, -20.0, 10.0, -70.0])
    det = _jacobian(tr.igh_forward, lon, lat, lon0=0.0)
    a = 6378137.0
    assert np.allclose(det, a * a * np.cos(lat * np.pi / 180), rtol=1e-6)


def test_igh_band_edge_continuity():
    pb = 40.0 + 44.0 / 60.0 + 11.8 / 3600.0
    for lo in (-170.0, -50.0, 100.0, 35.0):
        xa, ya = tr.igh_forward(np.array([lo]), np.array([pb - 1e-9]), 0.0)
        xb, yb = tr.igh_forward(np.array([lo]), np.array([pb + 1e-9]), 0.0)
        # seam bounded by the published constant's precision (~2 m),
        # same as PROJ's igh
        assert abs(xa[0] - xb[0]) < 3.0
        assert abs(ya[0] - yb[0]) < 0.1


def test_roundtrips():
    for fwd, inv, kw in [
            (tr.eqearth_forward, tr.eqearth_inverse, {}),
            (tr.vandg_forward, tr.vandg_inverse, {}),
            (tr.igh_forward, tr.igh_inverse, {}),
    ]:
        x, y = fwd(LON, LAT, 0.0, **kw)
        lo, la = inv(x, y, 0.0, **kw)
        assert np.allclose(lo, LON, atol=1e-6)
        assert np.allclose(la, LAT, atol=1e-6)
    x, y = tr.bonne_forward(LON, LAT, 45.0, 2.0)
    lo, la = tr.bonne_inverse(x, y, 45.0, 2.0)
    assert np.allclose(lo, LON, atol=1e-6)
    assert np.allclose(la, LAT, atol=1e-6)


def test_crs_dispatch_and_exports():
    assert tr._parse_crs("EPSG:8857") == ("eqearth", 0.0, 0.0, 0.0)
    for crs in ("+proj=eqearth +datum=WGS84",
                "+proj=vandg +datum=WGS84",
                "+proj=igh +datum=WGS84",
                "+proj=bonne +lat_1=45 +lon_0=2 +datum=WGS84"):
        kind = tr._parse_crs(crs)
        assert kind is not None
        # proj4 and WKT exports parse back to the same kind
        assert tr._parse_crs(tr.format_proj4_kind(kind)) == kind
        assert tr._parse_crs(tr.format_wkt1(crs)) == kind


def test_eqearth_matches_published_shape():
    # Savric et al. 2018: projection height/width ratio 1:2.05458
    # (pole y over pi*R-scaled equator half-width on the sphere)
    x_eq, _ = tr.eqearth_forward(np.array([180.0 - 1e-9]), np.array([0.0]),
                                 0.0, ellps=(1.0, 0.0))
    _, y_pole = tr.eqearth_forward(np.array([0.0]), np.array([90.0]),
                                   0.0, ellps=(1.0, 0.0))
    assert abs(x_eq[0] / y_pole[0] - 2.05458) < 1e-4
