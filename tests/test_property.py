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
