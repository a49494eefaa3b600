"""Property-based tests (hypothesis) over the pure-numpy kernels —
the fuzzing layer the reference gets from autotest's random fixtures.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.core import geomops, tilemath, wkb

lat_s = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False)
lon_s = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
zoom_s = st.integers(min_value=0, max_value=16)


@settings(max_examples=60, deadline=None)
@given(lat=lat_s, lon=lon_s)
def test_mercator_roundtrip(lat, lon):
    mx, my = tilemath.latlon_to_meters(lat, lon)
    lat2, lon2 = tilemath.meters_to_latlon(mx, my)
    assert abs(float(lat2) - lat) < 1e-9
    assert abs(float(lon2) - lon) < 1e-9


@settings(max_examples=60, deadline=None)
@given(lat=lat_s, lon=lon_s, zoom=zoom_s)
def test_packed_cell_id_roundtrips_and_nests(lat, lon, zoom):
    tx, ty = tilemath.latlon_to_tile_xyz(lat, lon, zoom)
    cid = int(tilemath.packed_cell_id(tx, ty, zoom))
    assert cid >> 58 == zoom
    assert (cid >> 29) & ((1 << 29) - 1) == int(ty)
    assert cid & ((1 << 29) - 1) == int(tx)
    if zoom < 16:
        # child tile at zoom+1 nests inside the parent
        cx, cy = tilemath.latlon_to_tile_xyz(lat, lon, zoom + 1)
        assert int(cx) >> 1 == int(tx) and int(cy) >> 1 == int(ty)


@settings(max_examples=60, deadline=None)
@given(lat=lat_s, lon=lon_s, zoom=st.integers(min_value=1, max_value=14))
def test_point_inside_its_tile_bounds(lat, lon, zoom):
    tx, ty = tilemath.latlon_to_tile_xyz(lat, lon, zoom)
    lon0, lat0, lon1, lat1 = tilemath.tile_bounds_latlon_xyz(
        int(tx), int(ty), zoom)
    assert lon0 - 1e-9 <= lon <= lon1 + 1e-9
    assert lat0 - 1e-9 <= lat <= lat1 + 1e-9


ring_pts = st.lists(
    st.tuples(st.floats(-100, 100, allow_nan=False, width=32),
              st.floats(-80, 80, allow_nan=False, width=32)),
    min_size=5, max_size=12)


@settings(max_examples=60, deadline=None)
@given(pts=ring_pts)
def test_wkb_roundtrip_polygon(pts):
    arr = np.array(pts, dtype=np.float64)
    hull = geomops.convex_hull(arr)
    if len(hull) < 4:
        return
    g = wkb.Geom(wkb.POLYGON, [hull])
    g2 = wkb.decode(wkb.encode(g))
    assert g2.gtype == wkb.POLYGON
    assert np.array_equal(g2.rings[0], hull)


@settings(max_examples=60, deadline=None)
@given(pts=ring_pts,
       x=st.floats(-90, 90, allow_nan=False),
       y=st.floats(-70, 70, allow_nan=False))
def test_clip_never_grows_area(pts, x, y):
    arr = np.array(pts, dtype=np.float64)
    hull = geomops.convex_hull(arr)
    if len(hull) < 4:
        return
    g = wkb.Geom(wkb.POLYGON, [hull])
    clipped = geomops.clip_geom_rect(g, x, y, x + 30, y + 30)
    a = geomops.geom_area(g)
    ac = geomops.geom_area(clipped) if clipped else 0.0
    assert ac <= a + 1e-9


@settings(max_examples=40, deadline=None)
@given(pts=ring_pts, px=st.floats(-110, 110, allow_nan=False),
       py=st.floats(-90, 90, allow_nan=False))
def test_pip_orientation_invariant(pts, px, py):
    """Even-odd ray casting must not depend on ring orientation."""
    arr = np.array(pts, dtype=np.float64)
    hull = geomops.convex_hull(arr)
    if len(hull) < 4:
        return
    fwd = wkb.Geom(wkb.POLYGON, [hull])
    rev = wkb.Geom(wkb.POLYGON, [hull[::-1].copy()])
    # points ON the boundary are edge-convention-dependent (half-open
    # edges) in ANY even-odd implementation — exclude them
    d = geomops.point_segment_distance(
        np.array([px]), np.array([py]), hull[:-1], hull[1:])
    if float(np.min(d)) < 1e-9:
        return
    a = geomops.points_in_geom(np.array([px]), np.array([py]), fwd)[0]
    b = geomops.points_in_geom(np.array([px]), np.array([py]), rev)[0]
    assert a == b


# ---------------------------------------------------------------------------
# round 2: boolean-kernel properties (core.polyclip)
# ---------------------------------------------------------------------------

coord_s = st.floats(min_value=-100.0, max_value=100.0,
                    allow_nan=False, allow_infinity=False)


def _rand_tri(draw_pts):
    # 1e-3 coordinate granularity: fuzz the full shape space while staying
    # far above the kernel's documented 1e-9*scale resolution floor (where
    # sub-quantum slivers may legitimately drop from stitched rings)
    pts = np.round(np.array(draw_pts, dtype=np.float64).reshape(3, 2), 3)
    return wkb.decode(wkb.polygon(pts))


@settings(max_examples=50, deadline=None)
@given(a=st.lists(coord_s, min_size=6, max_size=6),
       b=st.lists(coord_s, min_size=6, max_size=6))
def test_boolean_inclusion_exclusion(a, b):
    """area(A∪B) + area(A∩B) == area(A) + area(B) and the four ops stay
    self-consistent for arbitrary (possibly degenerate) triangles."""
    from gdal_spark.core.polyclip import boolean_area
    ga, gb = _rand_tri(a), _rand_tri(b)
    area_a = geomops.geom_area(ga)
    area_b = geomops.geom_area(gb)
    inter = boolean_area(ga, gb, "intersection")
    union = boolean_area(ga, gb, "union")
    diff = boolean_area(ga, gb, "difference")
    sym = boolean_area(ga, gb, "symdifference")
    tol = 1e-6 * max(1.0, area_a + area_b)
    assert abs(union + inter - area_a - area_b) < tol
    assert abs(diff - (area_a - inter)) < tol
    assert abs(sym - (union - inter)) < tol
    assert -tol <= inter <= min(area_a, area_b) + tol


@settings(max_examples=50, deadline=None)
@given(a=st.lists(coord_s, min_size=6, max_size=6),
       b=st.lists(coord_s, min_size=6, max_size=6))
def test_boolean_stitched_area_matches_trapezoid_sum(a, b):
    """Ring stitching must conserve the trapezoid-sum area for every op."""
    from gdal_spark.core.polyclip import OPS, boolean_area, geom_boolean
    ga, gb = _rand_tri(a), _rand_tri(b)
    # stitched resolution: the kernel quantizes vertices at 1e-9 * scale,
    # so features thinner than that quantum (times the perimeter) may drop
    # from the RINGS while still counting in the trapezoid-sum area
    tol = 1e-9 * 100.0 * 1000.0 + 1e-6 * max(
        geomops.geom_area(ga), geomops.geom_area(gb), 1.0)
    for op in OPS:
        want = boolean_area(ga, gb, op)
        g = geom_boolean(ga, gb, op)
        got = geomops.geom_area(g) if g is not None else 0.0
        assert abs(got - want) < tol, op


@settings(max_examples=40, deadline=None)
@given(pts=st.lists(st.tuples(coord_s, coord_s), min_size=4, max_size=10,
                    unique=True))
def test_makevalid_is_valid_and_idempotent(pts):
    """MakeValid of an arbitrary (usually self-intersecting) ring yields a
    valid geometry whose area is stable under a second MakeValid."""
    from gdal_spark.core.polyclip import geom_makevalid
    g = wkb.decode(wkb.polygon(np.round(np.array(pts, dtype=np.float64),
                                        3)))
    fixed = geom_makevalid(g)
    if fixed is None:
        return
    a1 = geomops.geom_area(fixed)
    again = geom_makevalid(fixed)
    a2 = geomops.geom_area(again) if again is not None else 0.0
    assert abs(a1 - a2) < 1e-6 * max(1.0, a1)


# -- XML geometry codecs (KML / GML) round-trip exactly ---------------------

coord_s = st.floats(min_value=-1e7, max_value=1e7, allow_nan=False,
                    allow_infinity=False)


def _ring_strategy(min_pts=3):
    return st.lists(st.tuples(coord_s, coord_s), min_size=min_pts,
                    max_size=8).map(
        lambda pts: np.array(pts + [pts[0]], dtype=np.float64))


@settings(max_examples=40, deadline=None)
@given(rings=st.lists(_ring_strategy(), min_size=1, max_size=3))
def test_kml_polygon_codec_roundtrips_exactly(rings):
    import xml.etree.ElementTree as ET
    from gdal_spark.sources.kml import _geom_from_kml, _geom_to_kml
    g = wkb.Geom(wkb.POLYGON, rings)
    xml = _geom_to_kml(wkb.encode(g))
    back = wkb.decode(_geom_from_kml(ET.fromstring(xml)))
    assert back.gtype == wkb.POLYGON and len(back.rings) == len(rings)
    for a, b in zip(rings, back.rings):
        np.testing.assert_array_equal(a, b)     # repr round-trips doubles


@settings(max_examples=40, deadline=None)
@given(pts=st.lists(st.tuples(coord_s, coord_s), min_size=2, max_size=10))
def test_gml_linestring_codec_roundtrips_exactly(pts):
    import xml.etree.ElementTree as ET
    from gdal_spark.sources.gml import _geom_from_gml, _geom_to_gml
    arr = np.array(pts, dtype=np.float64)
    xml = _geom_to_gml(wkb.linestring(arr)).replace(
        "gml:", "")  # namespace-prefix-free parse (reader is agnostic)
    back = wkb.decode(_geom_from_gml(ET.fromstring(xml)))
    np.testing.assert_array_equal(back.rings[0], arr)


@settings(max_examples=40, deadline=None)
@given(lon=st.floats(min_value=-179.0, max_value=179.0, allow_nan=False),
       lat=st.floats(min_value=-80.0, max_value=80.0, allow_nan=False))
def test_wkt_crs_utm_roundtrip_property(lon, lat):
    from gdal_spark.raster.transforms import transform
    wkt = ('PROJCS["tm", GEOGCS["WGS 84", DATUM["WGS_1984",'
           ' SPHEROID["WGS 84",6378137,298.257223563]],'
           ' PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],'
           ' PROJECTION["Transverse_Mercator"],'
           ' PARAMETER["central_meridian",%r],'
           ' PARAMETER["scale_factor",0.9996],'
           ' PARAMETER["false_easting",500000], UNIT["metre",1]]'
           % round(lon))
    x, y = transform("EPSG:4326", wkt, np.array([lon]), np.array([lat]))
    lon2, lat2 = transform(wkt, "EPSG:4326", x, y)
    assert abs(float(lon2) - lon) < 1e-8
    assert abs(float(lat2) - lat) < 1e-8


@settings(max_examples=40, deadline=None)
@given(rings=st.lists(_ring_strategy(), min_size=1, max_size=3))
def test_spatialite_blob_codec_roundtrips_exactly(rings):
    """SpatiaLite BLOB codec: byte-exact WKB round trip + exact MBR
    header for arbitrary polygons (holes included)."""
    import struct

    from gdal_spark.sources.spatialite import (spatialite_to_wkb,
                                               wkb_to_spatialite)
    g = wkb.Geom(wkb.POLYGON, rings)
    iso = wkb.encode(g)
    blob = wkb_to_spatialite(iso, srid=31370)
    assert spatialite_to_wkb(blob) == iso
    assert struct.unpack_from("<i", blob, 2)[0] == 31370
    env = g.envelope()
    assert struct.unpack_from("<4d", blob, 6) == env


@settings(max_examples=40, deadline=None)
@given(rings=st.lists(_ring_strategy(min_pts=3), min_size=1, max_size=2),
       mode=st.sampled_from(["gmt", "mif"]))
def test_mif_gmt_polygon_codecs_roundtrip(rings, mode):
    """MIF REGION and GMT @GPOLYGON writers emit repr() doubles, so the
    parsers must return bit-identical coordinates. Ring 0 is the shell;
    further rings only count as holes when they nest (both formats
    reconstruct nesting geometrically), so this only pins ring 0 +
    total vertex count for non-nesting inputs."""
    import os
    import tempfile

    from gdal_spark.sources.gmt import _parse_gmt, write_gmt
    from gdal_spark.sources.mif import _parse_feature, write_mif

    g = wkb.Geom(wkb.POLYGON, rings)
    d = tempfile.mkdtemp(prefix=f"codec_{mode}_")
    path = os.path.join(d, f"x.{'gmt' if mode == 'gmt' else 'mif'}")
    if mode == "gmt":
        write_gmt([(wkb.encode(g), {"k": 1})], path, gtype="POLYGON")
        with open(path) as f:
            _gt, _n, _t, feats = _parse_gmt(f.read())
        parts = feats[0][1]
        got0 = parts[0][1]
        n_back = sum(len(a) for _h, a in parts)
    else:
        write_mif([(wkb.encode(g), {"k": 1})], path)
        with open(path, encoding="latin-1") as f:
            lines = f.read().splitlines()
        k = lines.index("DATA") + 1
        while not lines[k].split() or \
                lines[k].split()[0].upper() != "REGION":
            k += 1
        wkb_bytes, _k2 = _parse_feature(lines, k)
        back = wkb.decode(wkb_bytes)
        backr = (back.rings if back.gtype == wkb.POLYGON
                 else [r for p in back.parts for r in p.rings])
        got0 = backr[0]
        n_back = sum(len(r) for r in backr)
    np.testing.assert_array_equal(got0, rings[0])
    assert n_back == sum(len(r) for r in rings)


@settings(max_examples=40, deadline=None)
@given(lon=st.floats(-6.0, 20.0), lat=st.floats(40.0, 58.0))
def test_oblique_crs_kernels_roundtrip(lon, lat):
    """Forward/inverse round-trips of the round-4 CRS kernels (oblique
    stereographic, Hotine omerc A/B incl. the Swiss alpha=90 case,
    Krovak) over their service areas, on both WGS84 and Bessel."""
    import numpy as np

    from gdal_spark.raster import transforms as T
    bes = T.ELLIPSOIDS["bessel"]
    x, y = T.sterea_forward(lon, lat, 5.387639, 52.156161, 0.9999079,
                            155000.0, 463000.0, ellps=bes)
    lo, la = T.sterea_inverse(x, y, 5.387639, 52.156161, 0.9999079,
                              155000.0, 463000.0, ellps=bes)
    assert abs(float(lo) - lon) < 1e-9 and abs(float(la) - lat) < 1e-9
    for vb in (True, False):
        x, y = T.omerc_forward(lon, lat, 7.439583, 46.952406, 90.0, 90.0,
                               1.0, 600000.0, 200000.0, vb, bes)
        lo, la = T.omerc_inverse(x, y, 7.439583, 46.952406, 90.0, 90.0,
                                 1.0, 600000.0, 200000.0, vb, bes)
        assert abs(float(lo) - lon) < 1e-9 and abs(float(la) - lat) < 1e-9
    x, y = T.krovak_forward(lon, lat, 24.833333, 49.5, 30.288139, 78.5,
                            0.9999, 0.0, 0.0, ellps=bes)
    lo, la = T.krovak_inverse(x, y, 24.833333, 49.5, 30.288139, 78.5,
                              0.9999, 0.0, 0.0, ellps=bes)
    assert abs(float(lo) - lon) < 1e-9 and abs(float(la) - lat) < 1e-9


@settings(max_examples=60, deadline=None)
@given(v=st.floats(min_value=-1e30, max_value=1e30,
                   allow_nan=False, allow_infinity=False))
def test_vax_double_codec_roundtrips_representable(v):
    """IEEE doubles inside VAX D range (|v| >= ~2.9e-39) round-trip
    exactly; magnitudes below the VAX exponent floor flush to zero
    (the VAX has no subnormals)."""
    from gdal_spark.sources import dgn as D
    got = D.vax_to_double(D.double_to_vax(v))
    if v == 0.0 or abs(v) >= 1e-38:
        assert got == v
    else:
        assert got in (v, 0.0)
