"""Ellipsoidal CRS transforms (UTM/Transverse Mercator, LAEA) vs
independent mathematical oracles — no pyproj in this environment, so the
checks are: known anchors, numerical meridian-arc integration, the
equal-area property, and machine-precision round trips.

Reference behavior: the PROJ CT chain of alg/gdaltransformer.cpp:1348;
formulas from the public Krueger series (Karney 2011) and Snyder (1987).
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.raster import transforms as T
from gdal_spark.raster import tiles, warp
from gdal_spark.raster.rasterize import GridSpec

A = 6378137.0
F = 1 / 298.257223563
E2 = F * (2 - F)


def test_utm_natural_origin():
    x, y = T.transform("EPSG:4326", "EPSG:32631",
                       np.array([3.0]), np.array([0.0]))
    assert x[0] == pytest.approx(500000.0, abs=1e-6)
    assert y[0] == pytest.approx(0.0, abs=1e-6)


def test_utm_roundtrip_machine_precision():
    lon = np.linspace(0.5, 5.5, 50)
    lat = np.linspace(-80, 80, 50)
    x, y = T.transform("EPSG:4326", "EPSG:32631", lon, lat)
    lon2, lat2 = T.transform("EPSG:32631", "EPSG:4326", x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-11)
    np.testing.assert_allclose(lat2, lat, atol=1e-11)


def test_utm_northing_equals_scaled_meridian_arc():
    """On the central meridian, northing = k0 * meridian arc length —
    checked against brute-force numerical integration of the meridian
    curvature radius (an implementation-independent oracle)."""
    for lat in (15.0, 37.5, 60.0):
        _, y = T.transform("EPSG:4326", "EPSG:32631",
                           np.array([3.0]), np.array([lat]))
        phi = np.linspace(0.0, np.deg2rad(lat), 200001)
        m = A * (1 - E2) / (1 - E2 * np.sin(phi) ** 2) ** 1.5
        arc = np.trapz(m, phi)
        assert y[0] == pytest.approx(0.9996 * arc, abs=0.01), lat


def test_utm_south_false_northing():
    x, y = T.transform("EPSG:4326", "EPSG:32731",
                       np.array([3.0]), np.array([-0.0001]))
    assert y[0] == pytest.approx(10000000.0, abs=20.0)
    xn, yn = T.transform("EPSG:4326", "EPSG:32631",
                         np.array([3.0]), np.array([0.0001]))
    # same |lat| north/south must mirror around the false northing
    assert (10000000.0 - y[0]) == pytest.approx(yn[0], abs=1e-6)


def test_laea_3035_center_anchor():
    x, y = T.transform("EPSG:4326", "EPSG:3035",
                       np.array([10.0]), np.array([52.0]))
    assert x[0] == pytest.approx(4321000.0, abs=1e-6)
    assert y[0] == pytest.approx(3210000.0, abs=1e-6)


def test_laea_roundtrip():
    lon = np.linspace(-10, 30, 40)
    lat = np.linspace(35, 70, 40)
    x, y = T.transform("EPSG:4326", "EPSG:3035", lon, lat)
    lon2, lat2 = T.transform("EPSG:3035", "EPSG:4326", x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-7)
    np.testing.assert_allclose(lat2, lat, atol=1e-7)


def test_laea_preserves_area():
    """THE property of the projection: a small geodetic quad's projected
    planar area equals its ellipsoidal surface area (to first order)."""
    for lon0, lat0 in ((10.0, 52.0), (25.0, 40.0), (-5.0, 65.0)):
        d = 0.05
        lons = np.array([lon0, lon0 + d, lon0 + d, lon0])
        lats = np.array([lat0, lat0, lat0 + d, lat0 + d])
        x, y = T.transform("EPSG:4326", "EPSG:3035", lons, lats)
        planar = 0.5 * abs(np.dot(x, np.roll(y, -1))
                           - np.dot(np.roll(x, -1), y))
        phi = np.deg2rad(lat0 + d / 2)
        dens = (A ** 2 * (1 - E2) * np.cos(phi)
                / (1 - E2 * np.sin(phi) ** 2) ** 2)
        true = dens * np.deg2rad(d) ** 2
        assert planar == pytest.approx(true, rel=1e-4), (lon0, lat0)


def test_generic_laea_crs_string():
    lon = np.array([12.0])
    lat = np.array([48.0])
    x, y = T.transform("EPSG:4326", "LAEA:12,48", lon, lat)
    assert x[0] == pytest.approx(0.0, abs=1e-6)
    assert y[0] == pytest.approx(0.0, abs=1e-6)


def test_chain_consistency_through_mercator():
    lon = np.linspace(0.5, 5.5, 20)
    lat = np.linspace(-60, 60, 20)
    mx, my = T.transform("EPSG:4326", "EPSG:3857", lon, lat)
    ux, uy = T.transform("EPSG:3857", "EPSG:32631", mx, my)
    ux2, uy2 = T.transform("EPSG:4326", "EPSG:32631", lon, lat)
    np.testing.assert_allclose(ux, ux2, atol=1e-6)
    np.testing.assert_allclose(uy, uy2, atol=1e-6)


def test_unknown_crs_raises():
    with pytest.raises(ValueError):
        T.transform("EPSG:4326", "EPSG:9999", np.array([0.0]),
                    np.array([0.0]))


def test_warp_through_utm_matches_single_array_oracle(spark):
    """End-to-end distributed warp 4326 -> UTM 31N == one-shot numpy warp
    with the same mesh (the new CT wired through the whole warp path)."""
    TILE = 16
    h, w = 2 * TILE, 2 * TILE
    yv, xv = np.mgrid[0:h, 0:w]
    arr = np.sin(xv / 5.0) * 20 + yv * 1.5 + 50.0
    src = GridSpec(x0=0.0, y0=8.0, dx=6.0 / w, dy=-8.0 / h,
                   width=w, height=h, tile=TILE)     # lon 0..6, lat 0..8
    dst = GridSpec(x0=166000.0, y0=884000.0, dx=(834000.0 - 166000.0) / w,
                   dy=-880000.0 / h, width=w, height=h, tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    spec = warp.WarpSpec(src, "EPSG:4326", dst, "EPSG:32631",
                         resample="bilinear", fill=-1.0)
    got = tiles.tiles_to_raster(warp.warp(df, spec), tile=TILE)
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    dwx = dst.x0 + (jj + 0.5) * dst.dx
    dwy = dst.y0 + (ii + 0.5) * dst.dy
    swx, swy = T.transform("EPSG:32631", "EPSG:4326", dwx, dwy)
    sx = (swx - src.x0) / src.dx
    sy = (swy - src.y0) / src.dy
    want = warp._sample_point(arr, np.ones_like(arr, dtype=bool), 0, 0,
                              sx, sy, "bilinear", -1.0, use_mask=False)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_proj_string_tmerc_matches_utm():
    """A '+proj=tmerc' string with UTM-zone parameters must reproduce the
    EPSG:326xx whitelist entry exactly (ogr/ogrct.cpp:919-948 — PROJ-string
    CRS composition, round-3 addition)."""
    import numpy as np
    from gdal_spark.raster.transforms import transform
    lon = np.array([2.5, 3.0, 5.9])
    lat = np.array([48.0, 0.5, -3.0])
    x1, y1 = transform("EPSG:4326", "EPSG:32631", lon, lat)
    x2, y2 = transform(
        "EPSG:4326", "+proj=tmerc +lon_0=3 +k_0=0.9996 +x_0=500000",
        lon, lat)
    assert np.allclose(x1, x2) and np.allclose(y1, y2)


def test_proj_string_roundtrips_and_utm_south():
    import numpy as np
    from gdal_spark.raster.transforms import _parse_crs, transform
    lon = np.array([17.0, 25.5])
    lat = np.array([-30.0, 4.0])
    for crs in ("+proj=tmerc +lon_0=7 +k_0=1.0 +x_0=200000 +y_0=100000",
                "+proj=merc +lon_0=25 +k_0=0.9",
                "+proj=laea +lon_0=20 +lat_0=5 +x_0=10000",
                "+proj=utm +zone=33 +south"):
        x, y = transform("EPSG:4326", crs, lon, lat)
        lo, la = transform(crs, "EPSG:4326", x, y)
        assert np.allclose(lo, lon) and np.allclose(la, lat), crs
    assert _parse_crs("+proj=utm +zone=33 +south") == ("utm", 15.0, True)
    assert _parse_crs("+proj=longlat +datum=WGS84") == "4326"


def test_st_transform_srid_isempty(spark):
    """ST_Transform / ST_SRID / ST_IsEmpty SQL registrations
    (ogrsqlitesqlfunctions.cpp:723,1060) — round-3 registry additions."""
    import numpy as np
    from gdal_spark.functions import st
    from gdal_spark.core import wkb
    st.register_all(spark)
    g = wkb.encode(wkb.Geom(wkb.POINT, [np.array([[30.0, 10.0]])]))
    spark.createDataFrame([(g,)], "geom binary") \
        .createOrReplaceTempView("t_st3")
    row = spark.sql(
        "SELECT ST_SRID(geom) AS srid, ST_IsEmpty(geom) AS emp, "
        "ST_X(ST_Transform(geom, 'EPSG:4326', '+proj=merc +lon_0=25')) "
        "AS tx FROM t_st3").collect()[0]
    assert row.srid == 4326 and row.emp is False
    assert row.tx == pytest.approx(6378137.0 * np.radians(5.0))


def test_gcp_polynomial_recovers_exact_maps():
    """GDALCreateGCPTransformer semantics (alg/gdal_crs.cpp): a least-
    squares order-n polynomial fitted on an analytic GCP grid reproduces
    the generating polynomial exactly, in both directions."""
    import numpy as np
    from gdal_spark.raster.transforms import gcp_crs, transform
    gx, gy = np.meshgrid(np.arange(0, 50, 7), np.arange(0, 40, 6))
    px, py = gx.ravel().astype(float), gy.ravel().astype(float)
    # affine generator for order 1
    X = 10.0 + 0.5 * px - 0.1 * py
    Y = -5.0 + 0.05 * px + 0.4 * py
    crs1 = gcp_crs(list(zip(px, py, X, Y)), order=1)
    qx, qy = np.array([3.3, 21.0]), np.array([8.8, 17.5])
    tx, ty = transform(crs1, "EPSG:4326", qx, qy)
    assert np.allclose(tx, 10.0 + 0.5 * qx - 0.1 * qy)
    assert np.allclose(ty, -5.0 + 0.05 * qx + 0.4 * qy)
    # inverse direction (independent reverse fit, gdal_crs.cpp both-ways)
    bx, by = transform("EPSG:4326", crs1, tx, ty)
    assert np.allclose(bx, qx) and np.allclose(by, qy)
    # quadratic generator for order 2
    X2 = 1.0 + 0.2 * px + 0.3 * py + 0.001 * px * py + 0.002 * px * px
    Y2 = 2.0 - 0.1 * px + 0.25 * py + 0.0005 * py * py
    crs2 = gcp_crs(list(zip(px, py, X2, Y2)), order=2)
    tx2, ty2 = transform(crs2, "EPSG:4326", qx, qy)
    assert np.allclose(tx2, 1.0 + 0.2 * qx + 0.3 * qy
                       + 0.001 * qx * qy + 0.002 * qx * qx)
    assert np.allclose(ty2, 2.0 - 0.1 * qx + 0.25 * qy + 0.0005 * qy * qy)


def test_tps_exact_at_controls_and_affine_everywhere():
    """TPS (alg/gdal_tps.cpp): exact interpolation at every control point;
    an affine control set is reproduced affinely everywhere (the radial
    weights vanish)."""
    import numpy as np
    from gdal_spark.raster.transforms import tps_crs, transform
    rng = np.random.default_rng(9)
    px = rng.uniform(0, 100, 25)
    py = rng.uniform(0, 100, 25)
    X = 3.0 + 1.2 * px - 0.3 * py
    Y = -1.0 + 0.2 * px + 0.9 * py
    crs = tps_crs(list(zip(px, py, X, Y)))
    tx, ty = transform(crs, "EPSG:4326", px, py)
    assert np.allclose(tx, X) and np.allclose(ty, Y)
    qx = np.array([12.5, 77.0]); qy = np.array([33.0, 5.0])
    tx2, ty2 = transform(crs, "EPSG:4326", qx, qy)
    assert np.allclose(tx2, 3.0 + 1.2 * qx - 0.3 * qy)
    assert np.allclose(ty2, -1.0 + 0.2 * qx + 0.9 * qy)
    # non-affine control set: still exact at the controls
    Xw = X + np.sin(px / 20.0)
    crs2 = tps_crs(list(zip(px, py, Xw, Y)))
    tw, _ = transform(crs2, "EPSG:4326", px, py)
    assert np.allclose(tw, Xw)


def test_warp_through_gcp_matches_affine_warp(spark):
    """gdalwarp with -gcp semantics (autotest/alg/warp.py GCP fixtures):
    warping through an affine GCP transformer must equal warping through
    the identical closed-form grid mapping."""
    import numpy as np
    from gdal_spark.raster import tiles
    from gdal_spark.raster.rasterize import GridSpec
    from gdal_spark.raster.transforms import gcp_crs
    from gdal_spark.raster.warp import WarpSpec, warp
    rng = np.random.default_rng(3)
    arr = rng.uniform(0, 100, size=(32, 32))
    t = tiles.raster_to_tiles(spark, arr, zoom=0, tile=8)
    # src world == pixel space; GCPs encode world = px * 2 + 10 shift
    gcps = [(float(i), float(j), 10.0 + 2.0 * i, 20.0 + 2.0 * j)
            for i in range(0, 33, 8) for j in range(0, 33, 8)]
    src = GridSpec(x0=0.0, y0=0.0, dx=1.0, dy=1.0, width=32, height=32,
                   tile=8)
    dst = GridSpec(x0=10.0, y0=20.0, dx=2.0, dy=2.0, width=32, height=32,
                   tile=8)
    out = warp(t, WarpSpec(src, gcp_crs(gcps, order=1), dst,
                           "EPSG:4326", "near", fill=-1.0))
    got = tiles.tiles_to_raster(out, tile=8)[:32, :32]
    # world = 2*px + 10 and the dst grid is exactly that image -> identity
    assert np.allclose(got, arr)


def test_rpc_transformer_affine_exact_and_nonlinear_roundtrip():
    """RPC00B rational-polynomial transformer (alg/gdal_rpc.cpp
    RPCComputeTerms/RPCEvaluate + iterative reverse): an affine RPC
    evaluates exactly in the ground->image direction, and the Newton
    inversion round-trips nonlinear models to ~1e-8 deg."""
    import numpy as np
    from gdal_spark.raster.transforms import rpc_crs, transform
    meta = dict(LINE_OFF=512, SAMP_OFF=512, LAT_OFF=45.0, LONG_OFF=10.0,
                HEIGHT_OFF=0.0, LINE_SCALE=512, SAMP_SCALE=512,
                LAT_SCALE=0.5, LONG_SCALE=0.5, HEIGHT_SCALE=100.0)
    z = [0.0] * 20
    sn = z.copy(); sn[1] = 0.9; sn[2] = -0.1
    ln = z.copy(); ln[1] = 0.2; ln[2] = 0.8
    den = z.copy(); den[0] = 1.0
    crs = rpc_crs(meta, ln, den, sn, den)
    lon = np.array([10.1, 9.8, 10.3])
    lat = np.array([45.05, 44.9, 45.2])
    sx, sy = transform("EPSG:4326", crs, lon, lat)
    L = (lon - 10) / 0.5
    P = (lat - 45) / 0.5
    assert np.allclose(sx, (0.9 * L - 0.1 * P) * 512 + 512)
    assert np.allclose(sy, (0.2 * L + 0.8 * P) * 512 + 512)
    lo, la = transform(crs, "EPSG:4326", sx, sy)
    assert np.allclose(lo, lon, atol=1e-9) and np.allclose(la, lat,
                                                           atol=1e-9)
    sn2 = sn.copy(); sn2[7] = 0.02
    ln2 = ln.copy(); ln2[8] = 0.03
    crs2 = rpc_crs(meta, ln2, den, sn2, den)
    sx2, sy2 = transform("EPSG:4326", crs2, lon, lat)
    lo2, la2 = transform(crs2, "EPSG:4326", sx2, sy2)
    assert np.allclose(lo2, lon, atol=1e-8)
    assert np.allclose(la2, lat, atol=1e-8)


# -- OGC WKT1 CRS parsing (OGRSpatialReference::importFromWkt twin) ---------

_UTM31_WKT = ('PROJCS["WGS 84 / UTM zone 31N", GEOGCS["WGS 84",'
              ' DATUM["WGS_1984", SPHEROID["WGS 84",6378137,298.257223563]],'
              ' PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],'
              ' PROJECTION["Transverse_Mercator"],'
              ' PARAMETER["latitude_of_origin",0],'
              ' PARAMETER["central_meridian",3],'
              ' PARAMETER["scale_factor",0.9996],'
              ' PARAMETER["false_easting",500000],'
              ' PARAMETER["false_northing",0], UNIT["metre",1],'
              ' AUTHORITY["EPSG","32631"]]')


def test_wkt_crs_matches_epsg_twin():
    from gdal_spark.raster.transforms import transform
    x1, y1 = transform("EPSG:4326", _UTM31_WKT,
                       np.array([4.5, -1.0]), np.array([51.2, 40.0]))
    x2, y2 = transform("EPSG:4326", "EPSG:32631",
                       np.array([4.5, -1.0]), np.array([51.2, 40.0]))
    np.testing.assert_allclose(x1, x2)
    np.testing.assert_allclose(y1, y2)


def test_wkt_crs_parameter_driven_without_authority():
    from gdal_spark.raster.transforms import _parse_crs, transform
    wkt = ('PROJCS["custom", GEOGCS["WGS 84", DATUM["WGS_1984",'
           ' SPHEROID["WGS 84",6378137,298.257223563]], PRIMEM["Greenwich",0],'
           ' UNIT["degree",0.0174532925199433]],'
           ' PROJECTION["Mercator_1SP"], PARAMETER["central_meridian",25],'
           ' PARAMETER["scale_factor",1], PARAMETER["false_easting",100000],'
           ' PARAMETER["false_northing",0], UNIT["metre",1]]')
    assert _parse_crs(wkt) == ("merc", 25.0, 1.0, 100000.0, 0.0)
    x1, y1 = transform("EPSG:4326", wkt, np.array([30.0]), np.array([10.0]))
    x2, y2 = transform("EPSG:4326", "+proj=merc +lon_0=25 +x_0=100000",
                       np.array([30.0]), np.array([10.0]))
    np.testing.assert_allclose(x1, x2)
    np.testing.assert_allclose(y1, y2)


def test_wkt_geogcs_and_roundtrip():
    from gdal_spark.raster.transforms import _parse_crs, transform
    geog = ('GEOGCS["WGS 84", DATUM["WGS_1984", SPHEROID["WGS 84",'
            '6378137,298.257223563]], PRIMEM["Greenwich",0],'
            ' UNIT["degree",0.0174532925199433]]')
    assert _parse_crs(geog) == "4326"
    lon = np.linspace(-3.0, 8.0, 7)
    lat = np.linspace(38.0, 55.0, 7)
    x, y = transform(geog, _UTM31_WKT, lon, lat)
    lon2, lat2 = transform(_UTM31_WKT, geog, x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


# ---------------------------------------------------------------------------
# gdalsrsinfo twin (apps/gdalsrsinfo.cpp)
# ---------------------------------------------------------------------------

def _canon_kind(t):
    from gdal_spark.raster import transforms as tr
    if t == "3857":
        return ("merc", 0.0, 1.0, 0.0, 0.0)
    if isinstance(t, tuple) and t[0] == "utm":
        return ("tmerc", t[1], 0.9996, 500000.0,
                10000000.0 if t[2] else 0.0)
    return t


def test_srsinfo_roundtrips_all_families():
    from gdal_spark.raster.transforms import srs_info, _parse_crs
    for c in ["EPSG:4326", "EPSG:3857", "EPSG:32633", "EPSG:32719",
              "EPSG:3035", "LAEA:10,52",
              "+proj=tmerc +lon_0=9 +k_0=0.9996 +x_0=500000",
              "+proj=merc +lon_0=110 +k_0=0.97 +y_0=200"]:
        s = srs_info(c)
        want = _canon_kind(_parse_crs(c))
        assert _canon_kind(_parse_crs(s["proj4"])) == want, c
        assert _canon_kind(_parse_crs(s["wkt"])) == want, c


def test_srsinfo_numeric_equivalence():
    import numpy as np
    from gdal_spark.raster.transforms import srs_info, transform
    lon = np.array([9.1, 15.7, -70.2])
    lat = np.array([48.3, -33.9, 12.0])
    for c in ["EPSG:3857", "EPSG:32633", "EPSG:3035"]:
        s = srs_info(c)
        x0, y0 = transform("EPSG:4326", c, lon, lat)
        x1, y1 = transform("EPSG:4326", s["proj4"], lon, lat)
        x2, y2 = transform("EPSG:4326", s["wkt"], lon, lat)
        np.testing.assert_allclose(x1, x0, rtol=0, atol=1e-6)
        np.testing.assert_allclose(y1, y0, rtol=0, atol=1e-6)
        np.testing.assert_allclose(x2, x0, rtol=0, atol=1e-6)
        np.testing.assert_allclose(y2, y0, rtol=0, atol=1e-6)


def test_wkt2_parse_families():
    """WKT2:2019 grammar (ISO 19162): CONVERSION/METHOD nesting,
    unit-annotated PARAMETERs, CS/AXIS bare enum keywords, ID shortcut."""
    from gdal_spark.raster.transforms import _parse_crs
    utm = ('PROJCRS["x",BASEGEOGCRS["WGS 84",DATUM["World Geodetic '
           'System 1984",ELLIPSOID["WGS 84",6378137,298.257223563,'
           'LENGTHUNIT["metre",1]]]],CONVERSION["UTM zone 33N",'
           'METHOD["Transverse Mercator",ID["EPSG",9807]],'
           'PARAMETER["Latitude of natural origin",0,'
           'ANGLEUNIT["degree",0.0174532925199433]],'
           'PARAMETER["Longitude of natural origin",15,'
           'ANGLEUNIT["degree",0.0174532925199433]],'
           'PARAMETER["Scale factor at natural origin",0.9996,'
           'SCALEUNIT["unity",1]],'
           'PARAMETER["False easting",500000,LENGTHUNIT["metre",1]],'
           'PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],'
           'CS[Cartesian,2],AXIS["(E)",east,ORDER[1]],'
           'AXIS["(N)",north,ORDER[2]]')
    # without the ID node: pure structural parse -> tmerc params
    assert _parse_crs(utm + "]") == ("tmerc", 15.0, 0.9996, 500000.0, 0.0)
    # with the ID node: EPSG shortcut -> the utm family
    assert _parse_crs(utm + ',ID["EPSG",32633]]') == ("utm", 15.0, False)
    geog = ('GEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
            'ELLIPSOID["WGS 84",6378137,298.257223563]],'
            'CS[ellipsoidal,2],AXIS["latitude",north],'
            'AXIS["longitude",east],ID["EPSG",4326]]')
    assert _parse_crs(geog) == "4326"
    laea = ('PROJCRS["laea",BASEGEOGCRS["ETRS89",DATUM["ETRS89",'
            'ELLIPSOID["GRS 1980",6378137,298.257222101]]],'
            'CONVERSION["eu",METHOD["Lambert Azimuthal Equal Area"],'
            'PARAMETER["Latitude of natural origin",52],'
            'PARAMETER["Longitude of natural origin",10],'
            'PARAMETER["False easting",4321000],'
            'PARAMETER["False northing",3210000]],CS[Cartesian,2],'
            'AXIS["northing (Y)",north],AXIS["easting (X)",east]]')
    assert _parse_crs(laea) == ("laea", 10.0, 52.0, 4321000.0, 3210000.0)


# ---------------------------------------------------------------------------
# Round 4: conic + polar families (Snyder 1987 ch. 14/15/21; reference
# resolves via the PROJ method table, ogr/ogrct.cpp:919-948)
# ---------------------------------------------------------------------------

def test_polar_stereographic_epsg_guidance_examples():
    """EPSG Guidance Note 7-2 worked examples, WGS84.

    Variant A (UPS North, EPSG:5041 parameters: k0=0.994, FE=FN=2e6):
    (73N, 44E) -> E 3320416.75, N 632668.43.
    Variant B (Australian Antarctic, EPSG:3032 parameters: lat_ts=-71,
    lon0=70, FE=FN=6e6): (75S, 120E) -> E 7255380.79, N 7053389.56."""
    x, y = T.stere_forward(44.0, 73.0, lon0=0.0, k0=0.994,
                           fe=2000000.0, fn=2000000.0)
    assert abs(float(x) - 3320416.75) < 0.02
    assert abs(float(y) - 632668.43) < 0.02
    lon, lat = T.stere_inverse(x, y, lon0=0.0, k0=0.994,
                               fe=2000000.0, fn=2000000.0)
    assert abs(float(lon) - 44.0) < 1e-9 and abs(float(lat) - 73.0) < 1e-9

    x, y = T.stere_forward(120.0, -75.0, lon0=70.0, lat_ts=-71.0,
                           south=True, fe=6000000.0, fn=6000000.0)
    assert abs(float(x) - 7255380.79) < 0.02
    assert abs(float(y) - 7053389.56) < 0.02
    lon, lat = T.stere_inverse(x, y, lon0=70.0, lat_ts=-71.0, south=True,
                               fe=6000000.0, fn=6000000.0)
    assert abs(float(lon) - 120.0) < 1e-9 and abs(float(lat) + 75.0) < 1e-9


def test_lcc_lambert93_invariants():
    """EPSG:2154: the grid origin projects to the false origin exactly;
    scale along both standard parallels is 1 (conformal 2SP property);
    forward/inverse round-trip to sub-nanometer."""
    x, y = T._from_4326("EPSG:2154", 3.0, 46.5)
    assert abs(float(x) - 700000.0) < 1e-6
    assert abs(float(y) - 6600000.0) < 1e-6
    # point scale h along a standard parallel == 1 (finite differences)
    for sp in (49.0, 44.0):
        d = 1e-6
        (x1, y1) = T._from_4326("EPSG:2154", 2.0, sp)
        (x2, y2) = T._from_4326("EPSG:2154", 2.0 + d, sp)
        sphi = np.sin(np.radians(sp))
        nu = 6378137.0 / np.sqrt(1 - 0.0066943799901413165 * sphi ** 2)
        along = np.hypot(float(x2 - x1), float(y2 - y1))
        truth = nu * np.cos(np.radians(sp)) * np.radians(d)
        assert abs(along / truth - 1.0) < 1e-7
    lons = np.array([-4.5, 2.35, 8.1]); lats = np.array([42.2, 48.85, 50.9])
    xs, ys = T._from_4326("EPSG:2154", lons, lats)
    lo, la = T._to_4326("EPSG:2154", xs, ys)
    np.testing.assert_allclose(lo, lons, atol=1e-11)
    np.testing.assert_allclose(la, lats, atol=1e-11)


def test_lcc_is_conformal_albers_is_equal_area():
    """Differential invariants over random points: LCC local scale is
    isotropic (h == k); Albers meridian/parallel scales satisfy
    h * k == 1 (Snyder 14-5/14-6)."""
    rng = np.random.RandomState(7)
    lons = rng.uniform(-110, -80, 20)
    lats = rng.uniform(25, 48, 20)
    d = 1e-7
    e2 = 0.0066943799901413165
    sphi = np.sin(np.radians(lats))
    nu = 6378137.0 / np.sqrt(1 - e2 * sphi ** 2)          # prime vertical
    rho_m = 6378137.0 * (1 - e2) / (1 - e2 * sphi ** 2) ** 1.5  # meridian
    for crs, kind in (("+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 "
                       "+lon_0=-96", "conformal"),
                      ("EPSG:5070", "equal_area")):
        x0, y0 = T._from_4326(crs, lons, lats)
        xp, yp = T._from_4326(crs, lons + d, lats)
        xm, ym = T._from_4326(crs, lons, lats + d)
        k = np.hypot(xp - x0, yp - y0) \
            / (nu * np.cos(np.radians(lats)) * np.radians(d))
        h = np.hypot(xm - x0, ym - y0) / (rho_m * np.radians(d))
        if kind == "conformal":
            np.testing.assert_allclose(h, k, rtol=1e-5)
        else:
            np.testing.assert_allclose(h * k, 1.0, rtol=1e-5)


def test_conic_parsers_all_spellings_agree():
    """EPSG code, +proj string and WKT1 must land on the same kernel
    tuples; format_proj4/format_wkt1 round-trip through the parsers."""
    assert T._parse_crs("EPSG:2154") == T._parse_crs(
        "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
        "+x_0=700000 +y_0=6600000")
    assert T._parse_crs("EPSG:5070") == T._parse_crs(
        "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96")
    assert T._parse_crs("EPSG:3413") == T._parse_crs(
        "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45")
    assert T._parse_crs("EPSG:3031") == T._parse_crs(
        "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0")
    for code in ("EPSG:2154", "EPSG:5070", "EPSG:3413", "EPSG:3031",
                 "EPSG:3347", "EPSG:3995"):
        kind = T._parse_crs(code)
        assert T._parse_crs(T.format_proj4(code)) == kind, code
        assert T._parse_crs(T.format_wkt1(code)) == kind, code
    # GDAL-style WKT1 Polar_Stereographic: standard parallel packed into
    # latitude_of_origin
    wkt = ('PROJCS["NSIDC North",GEOGCS["WGS 84",DATUM["WGS_1984",'
           'SPHEROID["WGS 84",6378137,298.257223563]],'
           'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
           'PROJECTION["Polar_Stereographic"],'
           'PARAMETER["latitude_of_origin",70],'
           'PARAMETER["central_meridian",-45],'
           'PARAMETER["false_easting",0],PARAMETER["false_northing",0],'
           'UNIT["metre",1]]')
    assert T._parse_crs(wkt) == T._parse_crs("EPSG:3413")


def test_conic_inverse_roundtrips():
    rng = np.random.RandomState(11)
    lons = rng.uniform(-170, 170, 50)
    for crs, lats in (
            ("EPSG:5070", rng.uniform(20, 50, 50)),
            ("EPSG:3347", rng.uniform(42, 83, 50)),
            ("EPSG:3413", rng.uniform(35, 89.5, 50)),
            ("EPSG:3031", rng.uniform(-89.5, -50, 50)),
            ("+proj=lcc +lat_1=-10 +lat_2=-40 +lat_0=-25 +lon_0=135 "
             "+k_0=1.0 +x_0=1000 +y_0=2000", rng.uniform(-44, -8, 50))):
        x, y = T._from_4326(crs, lons, lats)
        lo, la = T._to_4326(crs, x, y)
        # compare longitudes modulo the +-180 wrap (PROJ adjlon
        # semantics); latitude tolerance 5e-8 deg ~ 5 mm covers the
        # Snyder 3-18 authalic series truncation in the Albers inverse
        dlon = (np.asarray(lo) - lons + 180.0) % 360.0 - 180.0
        np.testing.assert_allclose(dlon, 0.0, atol=1e-9, err_msg=crs)
        np.testing.assert_allclose(la, lats, atol=5e-8, err_msg=crs)


# ---------------------------------------------------------------------------
# datum shifts (towgs84 Helmert) — OSGB36 / ED50
# ---------------------------------------------------------------------------

def test_tm_coeffs_wgs84_pins_module_constants():
    from gdal_spark.raster import transforms as tr
    a_bar, alpha, beta, e, e2 = tr.tm_coeffs(tr._WGS84_A, tr._WGS84_F)
    assert a_bar == tr._A_BAR
    assert alpha == tr._ALPHA and beta == tr._BETA
    assert e == tr._E and e2 == tr._E2


def test_osgb36_os_worked_example():
    """The Ordnance Survey 'worked example' point (OSGB36 geographic
    52d39'27.2531\"N 1d43'4.5177\"E -> E 651409.903 N 313177.270): our
    Airy Krueger tmerc with lat_0=49 must land within 1.5 mm."""
    import numpy as np

    from gdal_spark.raster import transforms as tr
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    x, y = tr.transform("EPSG:4277", "EPSG:27700",
                        np.array([lon]), np.array([lat]))
    assert abs(x[0] - 651409.903) < 1.5e-3
    assert abs(y[0] - 313177.270) < 1.5e-3
    # true origin maps to the false origin exactly (sub-mm through the
    # double Helmert round trip)
    x0, y0 = tr.transform("EPSG:4277", "EPSG:27700",
                          np.array([-2.0]), np.array([49.0]))
    assert abs(x0[0] - 400000.0) < 1e-2 and abs(y0[0] + 100000.0) < 1e-2


def test_osgb_spellings_agree_and_roundtrip():
    import numpy as np

    from gdal_spark.raster import transforms as tr
    lon = np.array([-1.5, -4.0, 0.5])
    lat = np.array([50.5, 57.0, 52.25])
    ex, ey = tr.transform("EPSG:4326", "EPSG:27700", lon, lat)
    p4 = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
          "+y_0=-100000 +ellps=airy "
          "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894")
    x2, y2 = tr.transform("EPSG:4326", p4, lon, lat)
    assert np.abs(x2 - ex).max() == 0.0 and np.abs(y2 - ey).max() == 0.0
    x3, y3 = tr.transform("EPSG:4326", "+datum=OSGB36 +proj=tmerc "
                          "+lat_0=49 +lon_0=-2 +k=0.9996012717 "
                          "+x_0=400000 +y_0=-100000", lon, lat)
    assert np.abs(x3 - ex).max() == 0.0
    wkt = ('PROJCS["British National Grid",GEOGCS["OSGB36",'
           'DATUM["OSGB_1936",'
           'SPHEROID["Airy 1830",6377563.396,299.3249646],'
           'TOWGS84[446.448,-125.157,542.06,0.1502,0.247,0.8421,'
           '-20.4894]],PRIMEM["Greenwich",0],'
           'UNIT["degree",0.0174532925199433]],'
           'PROJECTION["Transverse_Mercator"],'
           'PARAMETER["latitude_of_origin",49],'
           'PARAMETER["central_meridian",-2],'
           'PARAMETER["scale_factor",0.9996012717],'
           'PARAMETER["false_easting",400000],'
           'PARAMETER["false_northing",-100000],UNIT["metre",1]]')
    x4, y4 = tr.transform("EPSG:4326", wkt, lon, lat)
    assert np.abs(x4 - ex).max() == 0.0 and np.abs(y4 - ey).max() == 0.0
    # format_proj4 re-parses to the same kernel
    x5, y5 = tr.transform("EPSG:4326", tr.format_proj4("EPSG:27700"),
                          lon, lat)
    assert np.abs(x5 - ex).max() == 0.0
    # inverse round trip through the full datum chain
    bl, bb = tr.transform("EPSG:27700", "EPSG:4326", ex, ey)
    assert np.abs(bl - lon).max() < 1e-7 and np.abs(bb - lat).max() < 1e-7


def test_ed50_shift_and_utm():
    """ED50 is ~100m NE of WGS84 in central Europe; the 3-param shift and
    the intl-ellipsoid UTM round trip both hold."""
    import numpy as np

    from gdal_spark.raster import transforms as tr
    lon, lat = np.array([2.3522]), np.array([48.8566])
    wl, wb = tr.transform("EPSG:4230", "EPSG:4326", lon, lat)
    dlon = (wl[0] - lon[0]) * 111320 * np.cos(np.radians(48.8566))
    dlat = (wb[0] - lat[0]) * 110540
    # WGS84 coords of an ED50-labelled point sit SW: shift magnitude 80-150m
    assert -150 < dlon < -40 and -150 < dlat < -40
    ex, ey = tr.transform("EPSG:4326", "EPSG:23031", lon, lat)
    bl, bb = tr.transform("EPSG:23031", "EPSG:4326", ex, ey)
    assert abs(bl[0] - lon[0]) < 1e-7 and abs(bb[0] - lat[0]) < 1e-7
    # differs from the WGS84 UTM31 easting/northing by the datum shift
    wx, wy = tr.transform("EPSG:4326", "EPSG:32631", lon, lat)
    assert 40 < abs(ex[0] - wx[0]) + abs(ey[0] - wy[0]) < 400


def test_helmert_position_vector_roundtrip():
    import numpy as np

    from gdal_spark.raster import transforms as tr
    rng = np.random.default_rng(7)
    x = rng.uniform(-6.4e6, 6.4e6, 50)
    y = rng.uniform(-6.4e6, 6.4e6, 50)
    z = rng.uniform(-6.4e6, 6.4e6, 50)
    p = tr.DATUM_DEFS["OSGB36"][1]
    fx, fy, fz = tr.helmert_to_wgs84(*tr.helmert_from_wgs84(x, y, z, p), p)
    # the classic small-angle reverse is approximate at the rotation^2
    # level: |r|~4e-6 rad -> ~1e-11 relative, micrometers at earth radius
    assert np.abs(fx - x).max() < 1e-3
    assert np.abs(fy - y).max() < 1e-3
    assert np.abs(fz - z).max() < 1e-3
    p3 = (100.0, -50.0, 25.0)
    gx, gy, gz = tr.helmert_to_wgs84(x, y, z, p3)
    assert np.allclose(gx, x + 100) and np.allclose(gz, z + 25)


def test_geocentric_geodetic_roundtrip_all_ellipsoids():
    import numpy as np

    from gdal_spark.raster import transforms as tr
    lon = np.linspace(-179.0, 179.0, 41)
    lat = np.linspace(-89.0, 89.0, 41)
    for a, f in tr.ELLIPSOIDS.values():
        x, y, z = tr.geodetic_to_geocentric(lon, lat, a, f)
        bl, bb = tr.geocentric_to_geodetic(x, y, z, a, f)
        assert np.abs(bl - lon).max() < 1e-9
        assert np.abs(bb - lat).max() < 1e-9


def test_ntv2_gridshift_read_write_apply(tmp_path):
    import numpy as np

    from gdal_spark.raster import ntv2, transforms as tr
    i, j = np.mgrid[0:41, 0:41]
    lat_s = ((i * 3 + j * 5) % 64) * 0.25
    lon_w = ((i * 7 + j * 11) % 64) * 0.25 - 4.0
    path = str(tmp_path / "shift.gsb")
    ntv2.write_ntv2(path, lat0=40.0, lat1=60.0, lon0=-10.0, lon1=10.0,
                    inc=0.5, lat_shift_sec=lat_s,
                    lon_shift_west_sec=lon_w)
    g = ntv2.read_ntv2(path)
    assert np.array_equal(g["lat_shift"], lat_s)
    assert np.array_equal(g["lon_shift_east"], -lon_w)

    crs = f"+proj=longlat +ellps=clrk66 +nadgrids={path}"
    lon = np.array([-5.3, 0.0, 7.77, 55.0])       # last outside the grid
    lat = np.array([45.2, 50.0, 58.1, 45.0])
    wl, wb = tr.transform(crs, "EPSG:4326", lon, lat)
    # exact node (0, 50): fx = fy = 20
    assert abs(wb[1] - (50.0 + lat_s[20, 20] / 3600.0)) < 1e-12
    assert abs(wl[1] - (0.0 - lon_w[20, 20] / 3600.0)) < 1e-12
    assert wl[3] == 55.0 and wb[3] == 45.0        # outside passes through
    bl, bb = tr.transform("EPSG:4326", crs, wl, wb)
    assert np.abs(bl - lon).max() < 1e-9
    assert np.abs(bb - lat).max() < 1e-9
    # +nadgrids wins over +towgs84 (PROJ precedence)
    k = tr._parse_crs(crs + " +towgs84=100,0,0")
    assert k[0] == "grid"


def test_oblique_stereographic_rd_new_worked_example():
    """EPSG Guidance Note 7-2 §3.2.5 worked example (Amersfoort / RD New,
    Bessel 1841): (53N, 6E) on the Amersfoort datum -> E 196105.283,
    N 557057.739; inverse recovers the input; conformality: point scale
    is isotropic (same along meridian and parallel) away from the origin."""
    lat0 = 52.0 + 9.0 / 60 + 22.178 / 3600
    lon0 = 5.0 + 23.0 / 60 + 15.5 / 3600
    bes = T.ELLIPSOIDS["bessel"]
    x, y = T.sterea_forward(6.0, 53.0, lon0, lat0, 0.9999079,
                            155000.0, 463000.0, ellps=bes)
    assert abs(float(x) - 196105.283) < 0.002
    assert abs(float(y) - 557057.739) < 0.002
    lon, lat = T.sterea_inverse(x, y, lon0, lat0, 0.9999079,
                                155000.0, 463000.0, ellps=bes)
    assert abs(float(lon) - 6.0) < 1e-9 and abs(float(lat) - 53.0) < 1e-8
    # conformal: scale along parallel == scale along meridian
    d = 1e-6
    args = (lon0, lat0, 0.9999079, 155000.0, 463000.0)
    xa, ya = T.sterea_forward(6.0 + d, 53.0, *args, ellps=bes)
    xb, yb = T.sterea_forward(6.0, 53.0 + d, *args, ellps=bes)
    e2 = bes[1] * (2 - bes[1])
    sphi = np.sin(np.radians(53.0))
    nu = bes[0] / np.sqrt(1 - e2 * sphi ** 2)
    rho = bes[0] * (1 - e2) / (1 - e2 * sphi ** 2) ** 1.5
    h_par = np.hypot(float(xa - x), float(ya - y)) \
        / (nu * np.cos(np.radians(53.0)) * np.radians(d))
    h_mer = np.hypot(float(xb - x), float(yb - y)) \
        / (rho * np.radians(d))
    assert abs(h_par / h_mer - 1.0) < 1e-6


def test_hotine_omerc_borneo_worked_example():
    """EPSG Guidance Note 7-2 §3.2.6 worked example (Timbalai 1948 / RSO
    Borneo, Hotine variant B on Everest Sabah/Sarawak): (5°23'14.1129"N,
    115°48'19.8196"E) -> E 679245.73, N 596562.78."""
    ev = T.ELLIPSOIDS["evrstSS"]
    alpha = 53.0 + 18.0 / 60 + 56.9537 / 3600
    gamma = 53.0 + 7.0 / 60 + 48.3685 / 3600
    phi = 5.0 + 23.0 / 60 + 14.1129 / 3600
    lam = 115.0 + 48.0 / 60 + 19.8196 / 3600
    x, y = T.omerc_forward(lam, phi, 115.0, 4.0, alpha, gamma, 0.99984,
                           590476.87, 442857.65, True, ev)
    assert abs(float(x) - 679245.73) < 0.02
    assert abs(float(y) - 596562.78) < 0.02
    lon, lat = T.omerc_inverse(x, y, 115.0, 4.0, alpha, gamma, 0.99984,
                               590476.87, 442857.65, True, ev)
    assert abs(float(lon) - lam) < 1e-9 and abs(float(lat) - phi) < 1e-9
    # variant A roundtrip on a grid
    lons = np.linspace(113.0, 118.0, 9)
    lats = np.linspace(2.0, 7.0, 9)
    xa, ya = T.omerc_forward(lons, lats, 115.0, 4.0, alpha, gamma,
                             0.99984, 0.0, 0.0, False, ev)
    lo, la = T.omerc_inverse(xa, ya, 115.0, 4.0, alpha, gamma,
                             0.99984, 0.0, 0.0, False, ev)
    np.testing.assert_allclose(lo, lons, atol=1e-11)
    np.testing.assert_allclose(la, lats, atol=1e-11)


def test_swiss_lv03_rigi_reference_point():
    """swisstopo's published LV03 reference point (Rigi): CH1903 datum
    (47°03'28.956592"N, 8°29'11.111272"E) -> E 679520.05, N 212273.44.
    Swiss Oblique Mercator == Hotine variant B with alpha = gamma = 90
    (the EPSG 9815 parameterization of CH1903 / LV03)."""
    bes = T.ELLIPSOIDS["bessel"]
    lat0 = 46.0 + 57.0 / 60 + 8.66 / 3600
    lon0 = 7.0 + 26.0 / 60 + 22.5 / 3600
    rigi_lat = 47.0 + 3.0 / 60 + 28.95659233 / 3600
    rigi_lon = 8.0 + 29.0 / 60 + 11.11127154 / 3600
    x, y = T.omerc_forward(rigi_lon, rigi_lat, lon0, lat0, 90.0, 90.0,
                           1.0, 600000.0, 200000.0, True, bes)
    assert abs(float(x) - 679520.05) < 0.005
    assert abs(float(y) - 212273.44) < 0.005
    # LV95 (EPSG:2056) differs from LV03 (EPSG:21781) by exactly +2e6/+1e6
    x3, y3 = T.transform("EPSG:4326", "EPSG:21781", 8.5, 47.0)
    x9, y9 = T.transform("EPSG:4326", "EPSG:2056", 8.5, 47.0)
    assert abs(float(x9 - x3) - 2000000.0) < 1e-6
    assert abs(float(y9 - y3) - 1000000.0) < 1e-6


def test_sterea_omerc_spellings_agree():
    """EPSG whitelist, +proj string, WKT1 and WKT2 spellings of the new
    families hit the same kernels (srs_info round-trip contract)."""
    k_epsg = T._parse_crs("EPSG:21781")
    k_proj = T._parse_crs(
        "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 "
        "+k_0=1 +x_0=600000 +y_0=200000 +ellps=bessel "
        "+towgs84=674.374,15.056,405.346 +units=m +no_defs")
    assert k_epsg[0] == k_proj[0] == "datum"
    np.testing.assert_allclose(np.array(k_epsg[1][1:-1], dtype=float),
                               np.array(k_proj[1][1:-1], dtype=float),
                               atol=1e-10)
    # WGS84-datum spellings: format -> reparse -> same projected point
    for kind in (("sterea", 5.38, 52.15, 0.9999079, 155000.0, 463000.0),
                 ("omerc", 115.0, 4.0, 53.315, 53.13, 0.99984,
                  0.0, 0.0, True),
                 ("omerc", 115.0, 4.0, 53.315, 53.13, 0.99984,
                  0.0, 0.0, False)):
        for spelled in (T.format_proj4_kind(kind),
                        T.format_wkt1(T.format_proj4_kind(kind))):
            k2 = T._parse_crs(spelled)
            x1, y1 = T._kind_from_4326(kind, 116.0, 5.0)
            x2, y2 = T._kind_from_4326(k2, 116.0, 5.0)
            assert abs(float(x1 - x2)) < 1e-4
            assert abs(float(y1 - y2)) < 1e-4
    # WKT2 method/parameter names (EPSG 9809)
    wkt2 = ('PROJCRS["RD New",BASEGEOGCRS["Amersfoort",DATUM["Amersfoort",'
            'ELLIPSOID["Bessel 1841",6377397.155,299.1528128]]],'
            'CONVERSION["RD New",METHOD["Oblique Stereographic",'
            'ID["EPSG",9809]],'
            'PARAMETER["Latitude of natural origin",52.1561605555556],'
            'PARAMETER["Longitude of natural origin",5.38763888888889],'
            'PARAMETER["Scale factor at natural origin",0.9999079],'
            'PARAMETER["False easting",155000],'
            'PARAMETER["False northing",463000]],CS[Cartesian,2]]')
    k = T._parse_crs(wkt2)
    assert k[0] == "datum" and k[1][0] == "sterea"
    assert abs(k[1][3] - 0.9999079) < 1e-12


def test_krovak_sjtsk_invariants_and_example():
    """Krovak (EPSG 9819, S-JTSK): the GN 7-2 worked example point
    (50°12'32.442"N, 16°50'59.179"E Greenwich) reproduces to <=0.25 m
    (southing to <=0.02 m), the defining invariant holds exactly — scale
    on the pseudo standard parallel (T = 78°30') is 0.9999 — the
    projection is conformal at interior points, and forward/inverse
    round-trips at machine precision."""
    bes = T.ELLIPSOIDS["bessel"]
    args = (24.0 + 50.0 / 60, 49.5, 30.0 + 17.0 / 60 + 17.3031 / 3600,
            78.5, 0.9999, 0.0, 0.0)
    phi = 50 + 12 / 60 + 32.442 / 3600
    lam = 16 + 50 / 60 + 59.179 / 3600
    x, y = T.krovak_forward(lam, phi, *args, ellps=bes)
    assert abs(float(-y) - 1050538.64) < 0.02      # southing
    assert abs(float(-x) - 568991.20) < 0.25       # westing
    lo, la = T.krovak_inverse(x, y, *args, ellps=bes)
    assert abs(float(lo) - lam) < 1e-12 and abs(float(la) - phi) < 1e-12
    # scale on the pseudo standard parallel: solve U for T = 78.5 at the
    # centre meridian (V=0 -> sin(U + alpha) = sin(T)), invert U -> phi
    a_r = np.radians(args[2])
    u = np.radians(78.5) - a_r
    _A, big_b, t0, _n, _r0, e = T.krovak_constants(49.5, 0, 78.5,
                                                   0.9999, bes)
    base = (np.tan(u / 2 + np.pi / 4) / t0) ** (1 / big_b)
    p = u
    for _ in range(12):
        s = np.sin(p)
        p = 2 * (np.arctan(base * ((1 + e * s) / (1 - e * s)) ** (e / 2))
                 - np.pi / 4)
    lat_on, lon_on = np.degrees(p), args[0]
    d = 1e-7
    x0, y0 = T.krovak_forward(lon_on, lat_on, *args, ellps=bes)
    xa, ya = T.krovak_forward(lon_on + d, lat_on, *args, ellps=bes)
    xb, yb = T.krovak_forward(lon_on, lat_on + d, *args, ellps=bes)
    e2 = bes[1] * (2 - bes[1])
    s = np.sin(np.radians(lat_on))
    nu = bes[0] / np.sqrt(1 - e2 * s * s)
    rho = bes[0] * (1 - e2) / (1 - e2 * s * s) ** 1.5
    k_par = np.hypot(float(xa - x0), float(ya - y0)) \
        / (nu * np.cos(np.radians(lat_on)) * np.radians(d))
    k_mer = np.hypot(float(xb - x0), float(yb - y0)) / (rho * np.radians(d))
    assert abs(k_par - 0.9999) < 1e-6
    assert abs(k_par / k_mer - 1.0) < 1e-6         # conformal
    # EPSG:5514 chain + spellings
    x5, y5 = T.transform("EPSG:4326", "EPSG:5514", 14.42076, 50.08804)
    assert -744000 < float(x5) < -742000 and -1044000 < float(y5) < -1042000
    lo, la = T.transform("EPSG:5514", "EPSG:4326", x5, y5)
    assert abs(float(lo) - 14.42076) < 1e-8
    k_ferro = T._parse_crs("+proj=krovak +lat_0=49.5 "
                           "+lon_0=42.5 +pm=ferro +k=0.9999 +x_0=0 +y_0=0 "
                           "+datum=WGS84")
    k_gw = T._parse_crs("+proj=krovak +datum=WGS84")
    np.testing.assert_allclose(np.array(k_ferro[1:], dtype=float),
                               np.array(k_gw[1:], dtype=float), atol=1e-9)
    w = T.format_wkt1("+proj=krovak +datum=WGS84")
    assert T._parse_crs(w)[0] == "krovak"


def test_warp_through_rd_new_matches_single_array_oracle(spark):
    """Distributed warp 4326 -> EPSG:28992 (oblique stereographic behind
    the Amersfoort Helmert) == one-shot numpy warp on the same mesh —
    the full CT chain wired through the warp path for the round-4
    oblique family."""
    TILE = 16
    h, w = 2 * TILE, 2 * TILE
    yv, xv = np.mgrid[0:h, 0:w]
    arr = np.cos(yv / 7.0) * 15 + xv * 2.0 + 40.0
    src = GridSpec(x0=3.2, y0=53.6, dx=(7.2 - 3.2) / w, dy=-2.9 / h,
                   width=w, height=h, tile=TILE)   # NL box
    dst = GridSpec(x0=10000.0, y0=620000.0, dx=(280000.0 - 10000.0) / w,
                   dy=-320000.0 / h, width=w, height=h, tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    spec = warp.WarpSpec(src, "EPSG:4326", dst, "EPSG:28992",
                         resample="bilinear", fill=-1.0)
    got = tiles.tiles_to_raster(warp.warp(df, spec), tile=TILE)
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    dwx = dst.x0 + (jj + 0.5) * dst.dx
    dwy = dst.y0 + (ii + 0.5) * dst.dy
    swx, swy = T.transform("EPSG:28992", "EPSG:4326", dwx, dwy)
    sx = (swx - src.x0) / src.dx
    sy = (swy - src.y0) / src.dy
    want = warp._sample_point(arr, np.ones_like(arr, dtype=bool), 0, 0,
                              sx, sy, "bilinear", -1.0, use_mask=False)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_eov_hungarian_grid():
    """HD72 / EOV (EPSG:23700): the Hungarian national grid is the same
    Swiss-style alpha=90 Hotine variant B on GRS67 behind a 3-parameter
    shift. The projection centre maps to the false origin (sub-decimetre
    — the alpha=90 centre is a float singularity of the asin-clip in
    lambda_0; real points are exact, cf. the swisstopo Rigi pin), and
    the full WGS84 chain round-trips."""
    bes = T.ELLIPSOIDS["GRS67"]
    lat0 = 47.0 + 8.0 / 60 + 39.8174 / 3600
    lon0 = 19.0 + 2.0 / 60 + 54.8584 / 3600
    x, y = T.omerc_forward(lon0, lat0, lon0, lat0, 90.0, 90.0, 0.99993,
                           650000.0, 200000.0, True, bes)
    assert abs(float(x) - 650000.0) < 0.1
    assert abs(float(y) - 200000.0) < 0.1
    xs, ys = T.transform("EPSG:4326", "EPSG:23700",
                         np.array([16.2, 19.05, 22.8]),
                         np.array([45.8, 47.5, 48.5]))
    lo, la = T.transform("EPSG:23700", "EPSG:4326", xs, ys)
    np.testing.assert_allclose(lo, [16.2, 19.05, 22.8], atol=1e-8)
    np.testing.assert_allclose(la, [45.8, 47.5, 48.5], atol=1e-8)
    # Budapest lands in the EOV numeric range (E ~650km, N ~240km)
    xb, yb = T.transform("EPSG:4326", "EPSG:23700", 19.0458, 47.5070)
    assert 600000 < float(xb) < 700000 and 200000 < float(yb) < 300000


# ---------------------------------------------------------------------------
# "World grid" long-tail families (round 4): equidistant cylindrical,
# cylindrical equal-area (EASE-Grid 2.0), sinusoidal (MODIS), Cassini-
# Soldner, American Polyconic, equidistant conic. Reference resolves all
# through the PROJ method table (ogr/ogrct.cpp:919-948); pins below are
# the EPSG GN 7-2 worked example (Cassini, Trinidad 1903), Snyder (1987)
# numeric examples, and the projections' defining differential invariants.
# ---------------------------------------------------------------------------

def test_eqc_world_grid_anchors_and_roundtrip():
    # EPSG:4087: x is linear in longitude, y is the meridian arc
    x, y = T.transform("EPSG:4326", "EPSG:4087",
                       np.array([90.0, 0.0]), np.array([0.0, 90.0]))
    assert x[0] == pytest.approx(A * np.pi / 2, rel=1e-12)
    assert y[1] == pytest.approx(10001965.7293, abs=1e-3)  # quadrant
    lon = np.linspace(-179, 179, 41)
    lat = np.linspace(-89, 89, 41)
    x, y = T.transform("EPSG:4326", "EPSG:4087", lon, lat)
    lo, la = T.transform("EPSG:4087", "EPSG:4326", x, y)
    np.testing.assert_allclose(lo, lon, atol=1e-8)
    np.testing.assert_allclose(la, lat, atol=1e-8)
    # deprecated Plate Carree code parses to the same kind
    assert T._parse_crs("EPSG:32662") == T._parse_crs("EPSG:4087")


def test_cea_ease_grid2_anchor_and_equal_area():
    # NSIDC EASE-Grid 2.0 Global (EPSG:6933): the published x half-extent
    x, y = T.transform("EPSG:4326", "EPSG:6933",
                       np.array([180.0 - 1e-9]), np.array([0.0]))
    assert abs(x[0]) == pytest.approx(17367530.4451615, abs=1e-3)
    # global equal-area identity: (x extent) * (y extent) = 4 pi Rq^2,
    # the ellipsoid's authalic-sphere surface area
    _, ytop = T.transform("EPSG:4326", "EPSG:6933",
                          np.array([0.0]), np.array([90.0]))
    qp = T._authalic_q(np.float64(1.0))
    rq2 = A * A * qp / 2
    p30 = np.radians(30.0)
    k0 = np.cos(p30) / np.sqrt(1 - E2 * np.sin(p30) ** 2)
    assert (2 * np.pi * A * k0) * (2 * ytop[0]) == \
        pytest.approx(4 * np.pi * rq2, rel=1e-12)
    lon = np.linspace(-179, 179, 31)
    lat = np.linspace(-85, 85, 31)
    x, y = T.transform("EPSG:4326", "EPSG:6933", lon, lat)
    lo, la = T.transform("EPSG:6933", "EPSG:4326", x, y)
    np.testing.assert_allclose(lo, lon, atol=1e-8)
    np.testing.assert_allclose(la, lat, atol=1e-8)


def test_sinu_modis_sphere_ballpark():
    # the MODIS land-grid CRS: spherical sinusoidal, no datum shift
    crs = "+proj=sinu +R=6371007.181 +nadgrids=@null +units=m +no_defs"
    x, y = T.transform("EPSG:4326", crs,
                       np.array([180.0, 0.0]), np.array([0.0, 50.0]))
    assert abs(x[0]) == pytest.approx(20015109.354, abs=5e-3)
    assert y[1] == pytest.approx(6371007.181 * np.radians(50.0), rel=1e-14)
    # +nadgrids=@null means ballpark: latitude passes through unchanged
    lo, la = T.transform(crs, "EPSG:4326", np.array([0.0]),
                         np.array([6371007.181 * np.radians(50.0)]))
    assert la[0] == pytest.approx(50.0, abs=1e-12)
    # equal-area Jacobian on the sphere: dA = R^2 cos(phi) dlam dphi
    r = 6371007.181
    h = 1e-6
    for phi0 in (-60.0, 0.0, 47.3):
        x1, y1 = T.transform("EPSG:4326", crs, np.array([10.0]),
                             np.array([phi0]))
        x2, _ = T.transform("EPSG:4326", crs, np.array([10.0 + h]),
                            np.array([phi0]))
        _, y3 = T.transform("EPSG:4326", crs, np.array([10.0]),
                            np.array([phi0 + h]))
        jac = (x2[0] - x1[0]) * (y3[0] - y1[0]) / np.radians(h) ** 2
        assert jac == pytest.approx(r * r * np.cos(np.radians(phi0)),
                                    rel=1e-5)


def test_cassini_trinidad_gn72_worked_example():
    """EPSG Guidance Note 7-2 §3.2.2 (Cassini-Soldner, Trinidad 1903 /
    Trinidad Grid, Clarke 1858 in Clarke's links): phi=10N lam=62W ->
    E=66644.94, N=82536.22 links."""
    a = 20926348.0 / 0.66           # 31706587.88 links
    b = 20855233.0 / 0.66
    rf = a / (a - b)
    crs = (f"+proj=cass +lat_0={10 + 26.5 / 60} "
           f"+lon_0={-(61 + 20.0 / 60)} +x_0=430000 +y_0=325000 "
           f"+a={a} +rf={rf} +nadgrids=@null")
    x, y = T.transform("EPSG:4326", crs, np.array([-62.0]),
                       np.array([10.0]))
    assert x[0] == pytest.approx(66644.94, abs=0.01)
    assert y[0] == pytest.approx(82536.22, abs=0.01)
    # inverse round-trips within the projection's validity band
    lon = np.linspace(-64.5, -58.5, 25)
    lat = np.linspace(5.0, 15.0, 25)
    xx, yy = T.transform("EPSG:4326", crs, lon, lat)
    lo, la = T.transform(crs, "EPSG:4326", xx, yy)
    np.testing.assert_allclose(lo, lon, atol=1e-7)
    np.testing.assert_allclose(la, lat, atol=1e-7)


def test_polyconic_snyder_numeric_example():
    """Snyder (1987) p.304: American Polyconic on Clarke 1866,
    lat0=30N lon0=96W, point 40N 75W -> x=1776774.5, y=1319657.8 m."""
    crs = ("+proj=poly +lat_0=30 +lon_0=-96 +a=6378206.4 "
           "+rf=294.9786982 +nadgrids=@null")
    x, y = T.transform("EPSG:4326", crs, np.array([-75.0]),
                       np.array([40.0]))
    assert x[0] == pytest.approx(1776774.5, abs=0.5)
    assert y[0] == pytest.approx(1319657.8, abs=0.5)
    # central-meridian invariant: x = 0 and y = M(phi) - M(phi0) exactly
    crs84 = "+proj=poly +lat_0=30 +lon_0=-96 +datum=WGS84"
    xs, ys = T.transform("EPSG:4326", crs84,
                         np.array([-96.0, -96.0]), np.array([45.0, 10.0]))
    ell = T.ELLIPSOIDS["WGS84"]
    m = T.merid_arc(np.radians(np.array([45.0, 10.0])), ell)
    m0 = T.merid_arc(np.radians(30.0), ell)
    np.testing.assert_allclose(xs, [0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(ys, m - m0, atol=1e-6)
    # Newton inverse round-trips, including equator rows
    lon = np.concatenate([np.linspace(-110, -82, 27), [-96.0, -90.0]])
    lat = np.concatenate([np.linspace(-55, 55, 27), [0.0, 0.0]])
    xx, yy = T.transform("EPSG:4326", crs84, lon, lat)
    lo, la = T.transform(crs84, "EPSG:4326", xx, yy)
    np.testing.assert_allclose(lo, lon, atol=1e-8)
    np.testing.assert_allclose(la, lat, atol=1e-8)


def test_eqdc_meridian_and_parallel_invariants():
    crs = "+proj=eqdc +lat_0=40 +lat_1=34 +lat_2=45 +lon_0=-100 +datum=WGS84"
    # equidistant along meridians: northing differences on the central
    # meridian equal meridian-arc differences EXACTLY
    lats = np.array([20.0, 34.0, 40.0, 45.0, 60.0])
    _, y = T.transform("EPSG:4326", crs, np.full(5, -100.0), lats)
    m = T.merid_arc(np.radians(lats), T.ELLIPSOIDS["WGS84"])
    np.testing.assert_allclose(np.diff(y), np.diff(m), atol=1e-9)
    # standard parallels are true to scale: arc length along lat1 equals
    # the ellipsoidal parallel arc a*m(lat1)*dlam
    n, g, rho0 = T.eqdc_constants(40.0, 34.0, 45.0)
    p1 = np.radians(34.0)
    m1 = np.cos(p1) / np.sqrt(1 - E2 * np.sin(p1) ** 2)
    rho1 = A * g - float(T.merid_arc(p1, T.ELLIPSOIDS["WGS84"]))
    dlam = np.radians(1.0)
    assert rho1 * n * dlam == pytest.approx(A * m1 * dlam, rel=1e-12)
    lon = np.linspace(-130, -70, 25)
    lat = np.linspace(-20, 75, 25)
    xx, yy = T.transform("EPSG:4326", crs, lon, lat)
    lo, la = T.transform(crs, "EPSG:4326", xx, yy)
    np.testing.assert_allclose(lo, lon, atol=1e-8)
    np.testing.assert_allclose(la, lat, atol=1e-8)


def test_longtail_spellings_agree_and_proj4_roundtrip():
    """EPSG code, proj string and WKT1 spell the same kernels; and
    format_proj4 round-trips every new family through _parse_crs."""
    pts = (np.array([-40.0, 25.0, 140.0]), np.array([-35.0, 12.0, 55.0]))
    wkt_cea = (
        'PROJCS["WGS 84 / NSIDC EASE-Grid 2.0 Global",'
        'GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Cylindrical_Equal_Area"],'
        'PARAMETER["standard_parallel_1",30],'
        'PARAMETER["central_meridian",0],'
        'PARAMETER["false_easting",0],PARAMETER["false_northing",0],'
        'UNIT["metre",1]]')
    x1, y1 = T.transform("EPSG:4326", "EPSG:6933", *pts)
    x2, y2 = T.transform("EPSG:4326",
                         "+proj=cea +lat_ts=30 +lon_0=0 +datum=WGS84", *pts)
    x3, y3 = T.transform("EPSG:4326", wkt_cea, *pts)
    np.testing.assert_allclose(x2, x1, atol=1e-9)
    np.testing.assert_allclose(y2, y1, atol=1e-9)
    np.testing.assert_allclose(x3, x1, atol=1e-9)
    np.testing.assert_allclose(y3, y1, atol=1e-9)
    wkt_sinu = (
        'PROJCS["World Sinusoidal",GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Sinusoidal"],PARAMETER["central_meridian",10],'
        'PARAMETER["false_easting",3],PARAMETER["false_northing",4],'
        'UNIT["metre",1]]')
    x4, y4 = T.transform("EPSG:4326", wkt_sinu, *pts)
    x5, y5 = T.transform(
        "EPSG:4326", "+proj=sinu +lon_0=10 +x_0=3 +y_0=4 +datum=WGS84",
        *pts)
    np.testing.assert_allclose(x4, x5, atol=1e-9)
    np.testing.assert_allclose(y4, y5, atol=1e-9)
    for crs in ("EPSG:6933", "EPSG:4087",
                "+proj=sinu +lon_0=10 +x_0=3 +y_0=4 +datum=WGS84",
                "+proj=cass +lat_0=10 +lon_0=-61 +x_0=1 +y_0=2 +datum=WGS84",
                "+proj=poly +lat_0=30 +lon_0=-96 +datum=WGS84",
                "+proj=eqdc +lat_0=40 +lat_1=34 +lat_2=45 +lon_0=-100 "
                "+datum=WGS84",
                "+proj=sinu +R=6371007.181 +nadgrids=@null"):
        kind = T._parse_crs(crs)
        assert kind is not None, crs
        p4 = T.format_proj4_kind(kind)
        assert T._parse_crs(p4) == kind, (crs, p4)
    # srs_info's WKT1 spelling re-parses to the same kernels too
    for crs in ("EPSG:6933", "EPSG:4087",
                "+proj=sinu +lon_0=10 +datum=WGS84",
                "+proj=cass +lat_0=10 +lon_0=-61 +x_0=1 +y_0=2 +datum=WGS84",
                "+proj=poly +lat_0=30 +lon_0=-96 +datum=WGS84",
                "+proj=eqdc +lat_0=40 +lat_1=34 +lat_2=45 +lon_0=-100 "
                "+datum=WGS84"):
        s = T.srs_info(crs)
        assert T._parse_crs(s["wkt"]) == T._parse_crs(crs), crs


# ---------------------------------------------------------------------------
# Azimuthal family: Vincenty geodesics + aeqd / ortho / gnom
# ---------------------------------------------------------------------------

def _dms(d, m, s):
    sign = -1.0 if d < 0 else 1.0
    return sign * (abs(d) + m / 60.0 + s / 3600.0)


def test_vincenty_flinders_buninyong_worked_example():
    """The Geoscience Australia GDA worked example (GRS80): Flinders
    Peak -> Buninyong, s = 54 972.271 m, forward azimuth
    306d52'05.37", azimuth of the geodesic at Buninyong =
    127d10'25.07" + 180."""
    grs80 = T.ELLIPSOIDS["GRS80"]
    lat1 = _dms(-37, 57, 3.72030)
    lon1 = _dms(144, 25, 29.52440)
    lat2 = _dms(-37, 39, 10.15610)
    lon2 = _dms(143, 55, 35.38390)
    s, az1, az2 = T.geodesic_inverse(lon1, lat1, lon2, lat2, grs80)
    assert float(s) == pytest.approx(54972.271, abs=2e-3)
    assert float(az1) % 360 == pytest.approx(_dms(306, 52, 5.37),
                                             abs=1e-4)
    assert float(az2) % 360 == pytest.approx(_dms(127, 10, 25.07) + 180,
                                             abs=1e-4)
    # direct problem reproduces the destination
    lon2b, lat2b, _ = T.geodesic_direct(lon1, lat1, float(az1), float(s),
                                        grs80)
    assert float(lon2b) == pytest.approx(lon2, abs=1e-9)
    assert float(lat2b) == pytest.approx(lat2, abs=1e-9)


def test_vincenty_sphere_equals_great_circle():
    r = 6371000.0
    rng = np.random.default_rng(7)
    lon1 = rng.uniform(-180, 180, 40)
    lat1 = rng.uniform(-80, 80, 40)
    lon2 = rng.uniform(-180, 180, 40)
    lat2 = rng.uniform(-80, 80, 40)
    s, _, _ = T.geodesic_inverse(lon1, lat1, lon2, lat2, (r, 0.0))
    d2r = np.pi / 180
    cosc = (np.sin(lat1 * d2r) * np.sin(lat2 * d2r)
            + np.cos(lat1 * d2r) * np.cos(lat2 * d2r)
            * np.cos((lon2 - lon1) * d2r))
    np.testing.assert_allclose(s, r * np.arccos(np.clip(cosc, -1, 1)),
                               rtol=1e-12, atol=1e-6)


def test_aeqd_ellipsoidal_equidistance_and_roundtrip():
    """Defining property: planar distance from the projection origin
    equals the geodesic distance, planar azimuth equals the forward
    geodesic azimuth (exact by construction; this pins the plumbing)."""
    lon0, lat0 = 10.0, 20.0
    rng = np.random.default_rng(11)
    lon = rng.uniform(-60, 80, 60)
    lat = rng.uniform(-45, 70, 60)
    x, y = T.aeqd_forward(lon, lat, lon0, lat0)
    s, az1, _ = T.geodesic_inverse(np.full_like(lon, lon0),
                                   np.full_like(lat, lat0), lon, lat)
    np.testing.assert_allclose(np.hypot(x, y), s, rtol=1e-12)
    np.testing.assert_allclose(np.arctan2(x, y) * 180 / np.pi % 360,
                               np.asarray(az1) % 360, atol=1e-9)
    lon2, lat2 = T.aeqd_inverse(x, y, lon0, lat0)
    np.testing.assert_allclose(lon2, lon, atol=1e-8)
    np.testing.assert_allclose(lat2, lat, atol=1e-8)


def test_aeqd_sphere_closed_form_and_proj_string():
    crs = "+proj=aeqd +R=6371000 +lat_0=20 +lon_0=10 +nadgrids=@null"
    lon = np.array([30.0, -40.0, 10.0, 110.0])
    lat = np.array([-10.0, 55.0, 20.0, -60.0])
    x, y = T.transform("EPSG:4326", crs, lon, lat)
    d2r = np.pi / 180
    r = 6371000.0
    lam = (lon - 10.0) * d2r
    p0 = 20.0 * d2r
    phi = lat * d2r
    cosc = np.clip(np.sin(p0) * np.sin(phi)
                   + np.cos(p0) * np.cos(phi) * np.cos(lam), -1, 1)
    c = np.arccos(cosc)
    k = np.where(c < 1e-14, 1.0, c / np.where(c < 1e-14, 1.0, np.sin(c)))
    np.testing.assert_allclose(x, r * k * np.cos(phi) * np.sin(lam),
                               atol=1e-6)
    np.testing.assert_allclose(
        y, r * k * (np.cos(p0) * np.sin(phi)
                    - np.sin(p0) * np.cos(phi) * np.cos(lam)), atol=1e-6)
    # distance from origin == great-circle distance (equidistance)
    np.testing.assert_allclose(np.hypot(x, y), r * c, rtol=1e-12)
    lon2, lat2 = T.transform(crs, "EPSG:4326", x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_ortho_ellipsoidal_origin_scale_and_roundtrip():
    lon0, lat0 = 5.0, 40.0
    # origin maps to (FE, FN)
    x, y = T.ortho_forward(np.array([lon0]), np.array([lat0]), lon0, lat0,
                           100.0, 200.0)
    assert float(x[0]) == pytest.approx(100.0, abs=1e-9)
    assert float(y[0]) == pytest.approx(200.0, abs=1e-9)
    # meridional scale at the origin is 1: dN = rho(phi0) dphi
    d = 1e-6
    _, yp = T.ortho_forward(np.array([lon0]), np.array([lat0 + d]),
                            lon0, lat0)
    _, ym = T.ortho_forward(np.array([lon0]), np.array([lat0 - d]),
                            lon0, lat0)
    d2r = np.pi / 180
    s0 = np.sin(lat0 * d2r)
    rho0 = A * (1 - E2) / (1 - E2 * s0 * s0) ** 1.5
    assert float((yp[0] - ym[0]) / (2 * d * d2r)) \
        == pytest.approx(rho0, rel=1e-6)
    # near-hemisphere round trip (ellipsoidal Newton inverse)
    rng = np.random.default_rng(3)
    lon = lon0 + rng.uniform(-60, 60, 50)
    lat = lat0 + rng.uniform(-45, 40, 50)
    x, y = T.ortho_forward(lon, lat, lon0, lat0)
    lon2, lat2 = T.ortho_inverse(x, y, lon0, lat0)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_ortho_sphere_matches_snyder():
    lon0, lat0 = -100.0, -35.0
    r = 6370997.0
    lon = np.array([-80.0, -120.0, -100.0])
    lat = np.array([-20.0, -55.0, -35.0])
    x, y = T.ortho_forward(lon, lat, lon0, lat0, ellps=(r, 0.0))
    d2r = np.pi / 180
    lam = (lon - lon0) * d2r
    phi = lat * d2r
    p0 = lat0 * d2r
    np.testing.assert_allclose(x, r * np.cos(phi) * np.sin(lam),
                               atol=1e-6)
    np.testing.assert_allclose(
        y, r * (np.cos(p0) * np.sin(phi)
                - np.sin(p0) * np.cos(phi) * np.cos(lam)), atol=1e-6)


def test_gnom_great_circles_are_straight_lines():
    """Three points of one great circle must be collinear in the
    projection — the gnomonic's defining property."""
    lon0, lat0 = 15.0, 45.0
    # great circle through two anchor points: interpolate on the sphere
    d2r = np.pi / 180
    p1 = np.array([np.cos(30 * d2r) * np.cos(-20 * d2r),
                   np.sin(30 * d2r) * np.cos(-20 * d2r),
                   np.sin(-20 * d2r)])
    p2 = np.array([np.cos(-10 * d2r) * np.cos(60 * d2r),
                   np.sin(-10 * d2r) * np.cos(60 * d2r),
                   np.sin(60 * d2r)])
    pts = []
    for t in (0.15, 0.5, 0.85):
        v = (1 - t) * p1 + t * p2
        v = v / np.linalg.norm(v)
        pts.append((np.arctan2(v[1], v[0]) / d2r,
                    np.arcsin(v[2]) / d2r))
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    x, y = T.gnom_forward(lon, lat, lon0, lat0)
    cross = (x[1] - x[0]) * (y[2] - y[0]) - (x[2] - x[0]) * (y[1] - y[0])
    span2 = max(np.hypot(x[2] - x[0], y[2] - y[0]) ** 2, 1.0)
    assert abs(cross) / span2 < 1e-9
    lon2, lat2 = T.gnom_inverse(x, y, lon0, lat0)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_azimuthal_spellings_agree_and_proj4_roundtrip():
    lon = np.array([12.0, -30.0, 55.0])
    lat = np.array([48.0, 10.0, -25.0])
    for proj4, method in [
        ("+proj=aeqd +lat_0=20 +lon_0=10 +x_0=3 +y_0=4 +datum=WGS84",
         "Azimuthal_Equidistant"),
        ("+proj=ortho +lat_0=40 +lon_0=5 +x_0=0 +y_0=0 +datum=WGS84",
         "Orthographic"),
        ("+proj=gnom +lat_0=45 +lon_0=15 +x_0=0 +y_0=0 +datum=WGS84",
         "Gnomonic"),
    ]:
        x1, y1 = T.transform("EPSG:4326", proj4, lon, lat)
        wkt = T.format_wkt1(proj4)
        assert method in wkt
        x2, y2 = T.transform("EPSG:4326", wkt, lon, lat)
        np.testing.assert_allclose(x2, x1, rtol=1e-12)
        np.testing.assert_allclose(y2, y1, rtol=1e-12)
        p4 = T.format_proj4(proj4)
        x3, y3 = T.transform("EPSG:4326", p4, lon, lat)
        np.testing.assert_allclose(x3, x1, rtol=1e-12)
        np.testing.assert_allclose(y3, y1, rtol=1e-12)


# ---------------------------------------------------------------------------
# World-map pseudo-cylindrical family: moll / eck4 / mill / robin
# ---------------------------------------------------------------------------

def test_mollweide_anchors_and_equal_area():
    # poles map to (0, +-sqrt(2) R); equator edge x = +-2 sqrt(2) R
    x, y = T.moll_forward(np.array([0.0, 0.0, 180.0 - 1e-9]),
                          np.array([90.0, -90.0, 0.0]), 0.0,
                          ellps=(A, 0.0))
    assert float(y[0]) == pytest.approx(np.sqrt(2) * A, rel=1e-9)
    assert float(y[1]) == pytest.approx(-np.sqrt(2) * A, rel=1e-9)
    assert float(x[2]) == pytest.approx(2 * np.sqrt(2) * A, rel=1e-9)
    # equal-area: the Jacobian of (x, y) wrt (lam, phi) is R^2 cos(phi)
    d = 1e-6
    for lat in (10.0, 47.0, -63.0):
        x0, y0 = T.moll_forward(20.0, lat, 0.0)
        x1, y1 = T.moll_forward(20.0 + d, lat, 0.0)
        x2, y2 = T.moll_forward(20.0, lat + d, 0.0)
        d2r = np.pi / 180
        jac = ((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)) \
            / (d * d2r) ** 2
        assert float(jac) == pytest.approx(
            A * A * np.cos(lat * d2r), rel=1e-5)
    # roundtrip
    rng = np.random.default_rng(5)
    lon = rng.uniform(-179, 179, 50)
    lat = rng.uniform(-88, 88, 50)
    x, y = T.moll_forward(lon, lat, 0.0)
    lon2, lat2 = T.moll_inverse(x, y, 0.0)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_eckert4_anchors_and_equal_area():
    # poles: y = +-2 sqrt(pi/(4+pi)) R, x halves to pole-line length
    x, y = T.eck4_forward(np.array([0.0]), np.array([90.0]), 0.0)
    assert float(y[0]) == pytest.approx(
        2 * np.sqrt(np.pi / (4 + np.pi)) * A, rel=1e-9)
    d = 1e-6
    d2r = np.pi / 180
    for lat in (5.0, 38.0, -71.0):
        x0, y0 = T.eck4_forward(20.0, lat, 0.0)
        x1, y1 = T.eck4_forward(20.0 + d, lat, 0.0)
        x2, y2 = T.eck4_forward(20.0, lat + d, 0.0)
        jac = ((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)) \
            / (d * d2r) ** 2
        assert float(jac) == pytest.approx(
            A * A * np.cos(lat * d2r), rel=1e-5)
    rng = np.random.default_rng(6)
    lon = rng.uniform(-179, 179, 50)
    lat = rng.uniform(-88, 88, 50)
    x, y = T.eck4_forward(lon, lat, 0.0)
    lon2, lat2 = T.eck4_inverse(x, y, 0.0)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_miller_closed_form_and_roundtrip():
    lon = np.array([-120.0, 0.0, 66.0])
    lat = np.array([-50.0, 0.0, 80.0])
    x, y = T.mill_forward(lon, lat, 0.0)
    d2r = np.pi / 180
    np.testing.assert_allclose(x, A * lon * d2r, rtol=1e-12)
    np.testing.assert_allclose(
        y, A * 1.25 * np.log(np.tan(np.pi / 4 + 0.4 * lat * d2r)),
        rtol=1e-12)
    lon2, lat2 = T.mill_inverse(x, y, 0.0)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_robinson_table_knots_and_roundtrip():
    # at the exact 5-degree knots the spline reproduces Robinson's
    # published multipliers
    for i, latk in enumerate(range(0, 95, 5)):
        x, y = T.robin_forward(np.array([30.0]), np.array([float(latk)]),
                               0.0)
        d2r = np.pi / 180
        assert float(x[0]) == pytest.approx(
            0.8487 * A * T._ROBIN_X[i] * 30 * d2r, rel=1e-12)
        assert float(y[0]) == pytest.approx(
            1.3523 * A * T._ROBIN_Y[i], rel=1e-12, abs=1e-9)
    rng = np.random.default_rng(9)
    lon = rng.uniform(-179, 179, 60)
    lat = rng.uniform(-89, 89, 60)
    x, y = T.robin_forward(lon, lat, 0.0)
    lon2, lat2 = T.robin_inverse(x, y, 0.0)
    np.testing.assert_allclose(lat2, lat, atol=1e-6)
    np.testing.assert_allclose(lon2, lon, atol=1e-6)


def test_worldmap_spellings_agree_and_proj4_roundtrip():
    lon = np.array([12.0, -130.0, 55.0])
    lat = np.array([48.0, 10.0, -65.0])
    for proj4, method in [
        ("+proj=moll +lon_0=10 +x_0=1 +y_0=2 +datum=WGS84", "Mollweide"),
        ("+proj=eck4 +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84", "Eckert_IV"),
        ("+proj=mill +lon_0=-20 +x_0=0 +y_0=0 +datum=WGS84",
         "Miller_Cylindrical"),
        ("+proj=robin +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84", "Robinson"),
    ]:
        x1, y1 = T.transform("EPSG:4326", proj4, lon, lat)
        wkt = T.format_wkt1(proj4)
        assert method in wkt
        x2, y2 = T.transform("EPSG:4326", wkt, lon, lat)
        np.testing.assert_allclose(x2, x1, rtol=1e-12)
        np.testing.assert_allclose(y2, y1, rtol=1e-12)
        p4 = T.format_proj4(proj4)
        x3, y3 = T.transform("EPSG:4326", p4, lon, lat)
        np.testing.assert_allclose(x3, x1, rtol=1e-12)
        np.testing.assert_allclose(y3, y1, rtol=1e-12)


# ---------------------------------------------------------------------------
# Geostationary satellite view (+proj=geos)
# ---------------------------------------------------------------------------

def test_geos_roundtrip_both_sweeps_and_anchors():
    rng = np.random.default_rng(2)
    lon = rng.uniform(-60, 60, 120) - 75.0
    lat = rng.uniform(-60, 60, 120)
    for sweep in (True, False):
        x, y = T.geos_forward(lon, lat, -75.0, sweep_x=sweep)
        assert np.isfinite(x).all()
        lon2, lat2 = T.geos_inverse(x, y, -75.0, sweep_x=sweep)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # sub-satellite point maps to the origin
    x, y = T.geos_forward(np.array([-75.0]), np.array([0.0]), -75.0)
    assert float(x[0]) == 0.0 and float(y[0]) == 0.0
    # near nadir the planar coordinate approaches ground distance a*lam
    d2r = np.pi / 180
    x, y = T.geos_forward(np.array([-75.0 + 1e-4]), np.array([0.0]),
                          -75.0)
    assert float(x[0]) == pytest.approx(A * 1e-4 * d2r, rel=1e-8)
    # beyond the limb -> NaN
    x, y = T.geos_forward(np.array([105.0]), np.array([0.0]), -75.0)
    assert not np.isfinite(x[0])


def test_geos_geocentric_identity():
    """The kernel's (r, phi_c) polar form must equal the classic
    N-based geocentric coordinates of the surface point — two
    independent formulations of the same ellipsoid point."""
    a, f = T.ELLIPSOIDS["WGS84"]
    e2 = f * (2 - f)
    b_a = 1 - f
    rp2 = b_a * b_a
    phi = np.radians(np.array([-70.0, -33.0, 0.0, 12.0, 45.0, 88.0]))
    nn = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    phic = np.arctan(rp2 * np.tan(phi))
    r = b_a / np.hypot(b_a * np.cos(phic), np.sin(phic))
    np.testing.assert_allclose(r * np.cos(phic), nn * np.cos(phi) / a,
                               rtol=1e-14)
    np.testing.assert_allclose(r * np.sin(phic),
                               nn * (1 - e2) * np.sin(phi) / a,
                               rtol=1e-13, atol=1e-16)


def test_geos_spellings_agree():
    lon = np.array([-70.0, -100.0, -50.0])
    lat = np.array([30.0, -15.0, 5.0])
    crs = ("+proj=geos +h=35785831 +lon_0=-75 +sweep=x "
           "+datum=WGS84 +units=m +no_defs")
    x1, y1 = T.transform("EPSG:4326", crs, lon, lat)
    wkt = T.format_wkt1(crs)
    assert "Sweep_X" in wkt and "satellite_height" in wkt
    x2, y2 = T.transform("EPSG:4326", wkt, lon, lat)
    np.testing.assert_allclose(x2, x1, rtol=0)
    x3, y3 = T.transform("EPSG:4326", T.format_proj4(crs), lon, lat)
    np.testing.assert_allclose(x3, x1, rtol=0)
    # sweep axes really differ (and swap roles off-axis)
    crs_y = crs.replace("+sweep=x", "+sweep=y")
    xy, yy = T.transform("EPSG:4326", crs_y, lon, lat)
    assert not np.allclose(xy, x1)


def test_st_geodesic_functions_sql(spark):
    from gdal_spark.functions import st
    st.register_all(spark)
    row = spark.sql("""
        SELECT ST_DistanceSpheroid(ST_MakePoint(144.42486788888888,
                                                -37.95103341666667),
                                   ST_MakePoint(143.92649552777777,
                                                -37.65282113888889))
                 AS d,
               ST_Azimuth(ST_MakePoint(0.0, 0.0),
                          ST_MakePoint(1.0, 0.0)) AS az_e,
               ST_Azimuth(ST_MakePoint(0.0, 0.0),
                          ST_MakePoint(0.0, 1.0)) AS az_n,
               ST_DistanceSphere(ST_MakePoint(0.0, 0.0),
                                 ST_MakePoint(0.0, 90.0)) AS quarter,
               ST_DistanceSpheroid(
                   ST_Project(ST_MakePoint(5.0, 45.0), 100000.0,
                              radians(30.0)),
                   ST_MakePoint(5.0, 45.0)) AS back
        """).collect()[0]
    # GA worked example is on GRS80; WGS84 differs at the 0.1 mm level
    assert row.d == pytest.approx(54972.271, abs=0.01)
    assert row.az_e == pytest.approx(np.pi / 2, abs=1e-12)
    assert row.az_n == pytest.approx(0.0, abs=1e-12)
    assert row.quarter == pytest.approx(6371000 * np.pi / 2, rel=1e-12)
    assert row.back == pytest.approx(100000.0, abs=1e-3)


# ---------------------------------------------------------------------------
# RPC_DEM transformer (alg/gdal_rpc.cpp RPC_DEM)
# ---------------------------------------------------------------------------

def _write_plane_asc(path, h0=80.0, gx=2.0, gy=-1.5):
    """5x5-degree AAIGrid whose value is a plane in cell indices."""
    w, h = 73, 35
    lines = [f"ncols {w}", f"nrows {h}", "xllcorner -182.5",
             "yllcorner -87.5", "cellsize 5", "NODATA_value -9999"]
    for j in range(h):
        lines.append(" ".join(
            repr(h0 + gx * i + gy * j) for i in range(w)))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def _affine_rpc_dem(dem):
    # samp = L + 0.5 H, line = P (normalized), den = 1
    meta = dict(LINE_OFF=32.0, SAMP_OFF=32.0, LAT_OFF=84.0, LONG_OFF=74.0,
                HEIGHT_OFF=0.0, LINE_SCALE=32.0, SAMP_SCALE=32.0,
                LAT_SCALE=64.0, LONG_SCALE=64.0, HEIGHT_SCALE=100.0)
    z = [0.0] * 20
    sn = z.copy(); sn[1] = 1.0; sn[3] = 0.5
    ln = z.copy(); ln[2] = 1.0
    den = z.copy(); den[0] = 1.0
    return T.rpc_dem_crs(meta, ln, den, sn, den, dem)


def test_rpc_dem_plane_matches_analytic(tmp_path):
    dem = _write_plane_asc(str(tmp_path / "plane.asc"))
    crs = _affine_rpc_dem(dem)
    rng = np.random.default_rng(4)
    lon = rng.uniform(-170, 170, 40)
    lat = rng.uniform(-80, 80, 40)
    samp, line = T._rpc_dem_ground_to_image(crs, lon, lat)
    # bilinear interp of a plane == the plane: value at (lon, lat) is
    # h0 + gx*(px_x) + gy*(px_y) with px = (coord - ll)/5 - 0.5
    hx = (lon - (-182.5)) / 5.0 - 0.5
    hy = (lat - 87.5) / (-5.0) - 0.5
    hgt = 80.0 + 2.0 * hx + (-1.5) * hy
    want_s = ((lon - 74.0) / 64.0 + 0.5 * (hgt / 100.0)) * 32.0 + 32.0
    want_l = (lat - 84.0) / 64.0 * 32.0 + 32.0
    np.testing.assert_allclose(samp, want_s, rtol=1e-10)
    np.testing.assert_allclose(line, want_l, rtol=1e-10)
    # iterative inverse closes the loop (DEM height refreshed per round)
    lon2, lat2 = T._rpc_dem_image_to_ground(crs, samp, line)
    np.testing.assert_allclose(lon2, lon, atol=1e-7)
    np.testing.assert_allclose(lat2, lat, atol=1e-7)


def test_rpc_dem_constant_dem_equals_fixed_height(tmp_path):
    """An RPC_DEM transform over a constant-100m DEM must agree exactly
    with the fixed-height RPC transformer at height=100."""
    dem = str(tmp_path / "flat.asc")
    _write_plane_asc(dem, h0=100.0, gx=0.0, gy=0.0)
    meta = dict(LINE_OFF=32.0, SAMP_OFF=32.0, LAT_OFF=84.0, LONG_OFF=74.0,
                HEIGHT_OFF=0.0, LINE_SCALE=32.0, SAMP_SCALE=32.0,
                LAT_SCALE=64.0, LONG_SCALE=64.0, HEIGHT_SCALE=100.0)
    z = [0.0] * 20
    sn = z.copy(); sn[1] = 1.0; sn[3] = 0.5
    ln = z.copy(); ln[2] = 1.0; ln[9] = 0.25   # quadratic H term too
    den = z.copy(); den[0] = 1.0
    crs_dem = T.rpc_dem_crs(meta, ln, den, sn, den, dem)
    crs_h = T.rpc_crs(meta, ln, den, sn, den, height=100.0)
    lon = np.array([10.0, -50.0, 120.0])
    lat = np.array([20.0, -33.0, 71.0])
    s1, l1 = T._rpc_dem_ground_to_image(crs_dem, lon, lat)
    s2, l2 = T._rpc_ground_to_image(crs_h, lon, lat)
    np.testing.assert_allclose(s1, s2, rtol=0)
    np.testing.assert_allclose(l1, l2, rtol=0)


def test_rpc_dem_bilinear_nonplane(tmp_path):
    """On a non-plane DEM the sample must be the true bilinear blend of
    the four surrounding cells."""
    path = str(tmp_path / "bumpy.asc")
    w, h = 10, 8
    rng = np.random.default_rng(8)
    vals = rng.uniform(0, 500, (h, w))
    lines = [f"ncols {w}", f"nrows {h}", "xllcorner 0",
             "yllcorner 0", "cellsize 1", "NODATA_value -9999"]
    for j in range(h):
        lines.append(" ".join(repr(v) for v in vals[j]))
    open(path, "w").write("\n".join(lines) + "\n")
    lon, lat = np.array([3.7]), np.array([5.2])
    got = T._dem_sample(path, lon, lat)
    gx = 3.7 - 0.5
    gy = (5.2 - 8.0) / (-1.0) - 0.5   # rows top-down from yll+h
    i0, j0 = int(gx), int(gy)
    fx, fy = gx - i0, gy - j0
    want = ((1 - fx) * (1 - fy) * vals[j0, i0]
            + fx * (1 - fy) * vals[j0, i0 + 1]
            + (1 - fx) * fy * vals[j0 + 1, i0]
            + fx * fy * vals[j0 + 1, i0 + 1])
    assert float(got[0]) == pytest.approx(want, rel=1e-12)
    # transform() end-to-end through the fitted-CRS dispatch
    crs = _affine_rpc_dem(path)
    s, li = T.transform("EPSG:4326", crs, np.array([3.7]),
                        np.array([5.2]))
    assert np.isfinite(s[0]) and np.isfinite(li[0])
