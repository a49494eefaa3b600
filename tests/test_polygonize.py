"""Polygonize (raster -> vector connected components) vs a BFS reference.

Reference semantics: GDALPolygonize, /root/reference/alg/polygonize.cpp:170
(4-connected regions of equal pixel value, nodata masked out). The local
oracle is an independent BFS flood fill over the full raster; the engine
must produce the identical component multiset (value, size, pixel bbox)
regardless of tile boundaries and for both merge strategies (driver
union-find fast path and distributed min-label propagation).
"""

from collections import deque

import numpy as np
import pytest

from gdal_spark.raster.polygonize import _label_tile, polygonize
from gdal_spark.raster.tiles import raster_to_tiles


def ref_components(arr, nodata):
    valid = arr != nodata
    seen = np.zeros(arr.shape, bool)
    comps = []
    for y in range(arr.shape[0]):
        for x in range(arr.shape[1]):
            if valid[y, x] and not seen[y, x]:
                q = deque([(y, x)])
                seen[y, x] = True
                px = []
                v = arr[y, x]
                while q:
                    cy, cx = q.popleft()
                    px.append((cy, cx))
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        ny, nx = cy + dy, cx + dx
                        if 0 <= ny < arr.shape[0] and 0 <= nx < arr.shape[1] \
                           and valid[ny, nx] and not seen[ny, nx] \
                           and arr[ny, nx] == v:
                            seen[ny, nx] = True
                            q.append((ny, nx))
                comps.append((float(v), len(px),
                              min(p[1] for p in px), min(p[0] for p in px),
                              max(p[1] for p in px), max(p[0] for p in px)))
    return sorted(comps)


def ref_label_count(arr, valid):
    lbl = _label_tile(arr, valid)
    # every valid pixel labeled with its component's min flat index
    assert (lbl[valid] >= 0).all() and (lbl[~valid] == -1).all()
    return len(np.unique(lbl[valid]))


def test_label_tile_matches_bfs_counts():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 3, size=(16, 16)).astype(np.int32)
    assert ref_label_count(arr, arr != 0) == len(ref_components(arr, 0))


@pytest.mark.parametrize("seed,shape,hi", [
    (3, (40, 56), 3),      # multi-tile, 3 values
    (1, (30, 17), 4),      # ragged edge tiles (padding path)
    (5, (16, 16), 2),      # binary mask
])
def test_polygonize_matches_bfs(spark, seed, shape, hi):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, hi, size=shape).astype(np.int32)
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8, nodata=0.0)
    out = polygonize(tiles, tile=8).collect()
    got = sorted((float(r.value), int(r.n_pixels),
                  int(r.px_xmin), int(r.px_ymin),
                  int(r.px_xmax), int(r.px_ymax)) for r in out)
    assert got == ref_components(arr, 0)


def test_polygonize_distributed_merge_path(spark):
    """Force the distributed min-label propagation (threshold 0) and check
    it agrees with the driver union-find fast path."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 3, size=(24, 24)).astype(np.int32)
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8, nodata=0.0)
    out = polygonize(tiles, tile=8, driver_merge_threshold=0).collect()
    got = sorted((float(r.value), int(r.n_pixels),
                  int(r.px_xmin), int(r.px_ymin),
                  int(r.px_xmax), int(r.px_ymax)) for r in out)
    assert got == ref_components(arr, 0)


def test_polygonize_single_component_spanning_tiles(spark):
    """One region crossing every tile seam must merge into one component."""
    arr = np.ones((24, 24), np.int32)
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8, nodata=0.0)
    rows = polygonize(tiles, tile=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_pixels, r.px_xmin, r.px_ymin, r.px_xmax, r.px_ymax) == \
        (24 * 24, 0, 0, 23, 23)


def ref_components8(arr, nodata):
    valid = arr != nodata
    seen = np.zeros(arr.shape, bool)
    comps = []
    for y in range(arr.shape[0]):
        for x in range(arr.shape[1]):
            if valid[y, x] and not seen[y, x]:
                q = deque([(y, x)])
                seen[y, x] = True
                px = []
                v = arr[y, x]
                while q:
                    cy, cx = q.popleft()
                    px.append((cy, cx))
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            if dy == 0 and dx == 0:
                                continue
                            ny, nx = cy + dy, cx + dx
                            if 0 <= ny < arr.shape[0] \
                               and 0 <= nx < arr.shape[1] \
                               and valid[ny, nx] and not seen[ny, nx] \
                               and arr[ny, nx] == v:
                                seen[ny, nx] = True
                                q.append((ny, nx))
                comps.append((float(v), len(px),
                              min(p[1] for p in px), min(p[0] for p in px),
                              max(p[1] for p in px), max(p[0] for p in px)))
    return sorted(comps)


@pytest.mark.parametrize("seed,shape", [(3, (40, 56)), (8, (25, 18))])
def test_polygonize_8connect_matches_bfs(spark, seed, shape):
    """CONNECTED=8 (alg/polygonize.cpp:485): diagonal adjacency inside
    tiles, across straight seams (offset +-1) and across tile corners."""
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 3, size=shape).astype(np.int32)
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8, nodata=0.0)
    out = polygonize(tiles, tile=8, connect=8).collect()
    got = sorted((float(r.value), int(r.n_pixels),
                  int(r.px_xmin), int(r.px_ymin),
                  int(r.px_xmax), int(r.px_ymax)) for r in out)
    assert got == ref_components8(arr, 0)


def test_polygonize_8connect_corner_merge(spark):
    """Two pixels touching ONLY at a tile-corner diagonal must merge under
    8-connectivity and stay separate under 4."""
    arr = np.zeros((16, 16), np.int32)
    arr[7, 7] = 5     # SE corner of tile (0,0)
    arr[8, 8] = 5     # NW corner of tile (1,1)
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8, nodata=0.0)
    assert polygonize(tiles, tile=8, connect=8).count() == 1
    assert polygonize(tiles, tile=8, connect=4).count() == 2


# ---------------------------------------------------------------------------
# round 2: traced boundary rings (alg/polygonize_polygonizer.cpp parity)
# ---------------------------------------------------------------------------

# the reference's own fixture: autotest/alg/data/polygonize_in.grd
# (5x7, nodata=132) with the expected DN multiset and the DN=156
# polygon-with-hole from autotest/alg/polygonize.py::test_polygonize_1
_REF_GRID = np.array([
    [107, 123, 132, 115, 132],
    [115, 132, 132, 123, 123],
    [115, 132, 140, 132, 123],
    [148, 132, 123, 123, 123],
    [156, 156, 156, 140, 132],
    [156, 100, 156, 101, 102],
    [156, 156, 156, 103, 103],
], dtype=np.float64)
_REF_EXPECT_DN = sorted([107, 123, 115, 115, 140, 148, 123, 140,
                         100, 101, 102, 156, 103])


def _ring_vertex_set(ring):
    return {(int(x), int(y)) for x, y in ring[:-1]}


def _shoelace(r):
    x, y = r[:, 0], r[:, 1]
    return 0.5 * (np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def _run_polygons(spark, arr, tile, nodata):
    from gdal_spark.core import wkb
    from gdal_spark.raster.polygonize import polygonize_polygons
    from gdal_spark.raster.tiles import raster_to_tiles
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=tile, nodata=nodata)
    rows = polygonize_polygons(tiles, tile=tile, nodata=nodata).collect()
    return [(float(r.value), wkb.decode(bytes(r.geom))) for r in rows]


@pytest.mark.parametrize("tile", [4, 8])
def test_polygonize_rings_reference_fixture(spark, tile):
    polys = _run_polygons(spark, _REF_GRID, tile, nodata=132.0)
    assert sorted(int(v) for v, _g in polys) == _REF_EXPECT_DN
    # every component's polygon area (holes subtract) == its pixel count
    px_count = {}
    for v in set(_REF_EXPECT_DN):
        pass
    for value, g in polys:
        area = sum(_shoelace(r) for r in g.rings)
        # count pixels of this component by flood fill on the grid is
        # overkill — the area must be a positive integer and the total
        # must cover all valid pixels
        assert area > 0 and abs(area - round(area)) < 1e-9
    total_area = sum(sum(_shoelace(r) for r in g.rings) for _v, g in polys)
    assert total_area == (_REF_GRID != 132).sum()
    # the DN=156 component: 3x3 exterior with the 1px DN=100 hole — the
    # geometry check_feature_geometry pins in the reference test
    g156 = [g for v, g in polys if v == 156.0]
    assert len(g156) == 1
    g = g156[0]
    assert len(g.rings) == 2
    assert _ring_vertex_set(g.rings[0]) == {(0, 4), (3, 4), (3, 7), (0, 7)}
    assert _ring_vertex_set(g.rings[1]) == {(1, 5), (2, 5), (2, 6), (1, 6)}
    assert _shoelace(g.rings[0]) == pytest.approx(9.0)
    assert _shoelace(g.rings[1]) == pytest.approx(-1.0)


def test_polygonize_rings_tiling_invariant(spark):
    rng = np.random.default_rng(12)
    arr = rng.integers(0, 3, size=(24, 24)).astype(np.float64)

    def norm(polys):
        out = []
        for v, g in polys:
            rings = sorted((tuple(sorted(_ring_vertex_set(r)))
                            for r in g.rings))
            out.append((v, rings))
        return sorted(out)

    a = norm(_run_polygons(spark, arr, 8, nodata=None))
    b = norm(_run_polygons(spark, arr, 6, nodata=None))
    assert a == b


def test_polygonize_rings_multi_tile_component(spark):
    """One rectangle spanning 4 tiles must come back as ONE clean 4-corner
    ring (cross-seam edges correctly suppressed by the halo)."""
    arr = np.zeros((16, 16), dtype=np.float64)
    arr[2:14, 3:13] = 5.0
    polys = _run_polygons(spark, arr, 8, nodata=0.0)
    assert len(polys) == 1
    v, g = polys[0]
    assert v == 5.0
    assert len(g.rings) == 1
    assert _ring_vertex_set(g.rings[0]) == {(3, 2), (13, 2), (13, 14),
                                            (3, 14)}
    assert _shoelace(g.rings[0]) == pytest.approx(12 * 10)


def test_polygonize_rings_pinch_component(spark):
    """Two squares of one component touching at a corner but 4-connected
    through a bridge: the traced boundary must be valid (closed rings,
    area == pixel count)."""
    arr = np.zeros((8, 8), dtype=np.float64)
    arr[1:3, 1:3] = 7.0       # square A (rows 1-2, cols 1-2)
    arr[3:5, 3:5] = 7.0       # square B corner-touches A at vertex (3,3)
    arr[1, 3:6] = 7.0         # bridge: row 1 east...
    arr[1:5, 5] = 7.0         # ...down col 5 into B -> ONE 4-connected comp
    assert arr[2, 3] == 0.0 and arr[3, 2] == 0.0   # a true pinch
    polys = _run_polygons(spark, arr, 8, nodata=0.0)
    vals = [v for v, _ in polys]
    assert vals == [7.0]
    _v, g = polys[0]
    area = sum(_shoelace(r) for r in g.rings)
    assert area == pytest.approx(float((arr == 7.0).sum()))


def test_polygonize_rings_connect8_diagonal(spark):
    """CONNECTED=8: two diagonal pixels form ONE component whose traced
    ring self-touches at the shared corner; CONNECTED=4 keeps them as two
    unit squares. Area == pixel count in both."""
    from gdal_spark.core import wkb as wkbmod
    from gdal_spark.raster.polygonize import polygonize_polygons
    from gdal_spark.raster.tiles import raster_to_tiles
    arr = np.zeros((8, 8), dtype=np.float64)
    arr[2, 2] = 5.0
    arr[3, 3] = 5.0
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8, nodata=0.0)
    four = polygonize_polygons(tiles, tile=8, nodata=0.0,
                               connect=4).collect()
    assert len(four) == 2
    for r in four:
        g = wkbmod.decode(bytes(r.geom))
        assert sum(_shoelace(rg) for rg in g.rings) == pytest.approx(1.0)
    eight = polygonize_polygons(tiles, tile=8, nodata=0.0,
                                connect=8).collect()
    assert len(eight) == 1
    g = wkbmod.decode(bytes(eight[0].geom))
    assert sum(_shoelace(rg) for rg in g.rings) == pytest.approx(2.0)
    # the self-touching ring passes through the shared corner (3,3) twice
    ring = g.rings[0]
    corner_hits = sum(1 for x, y in ring[:-1] if (x, y) == (3.0, 3.0))
    assert corner_hits == 2


def test_polygonize_rings_connect8_random_area_invariant(spark):
    from gdal_spark.core import wkb as wkbmod
    from gdal_spark.raster.polygonize import polygonize, polygonize_polygons
    from gdal_spark.raster.tiles import raster_to_tiles
    rng = np.random.default_rng(8)
    arr = rng.integers(0, 3, size=(20, 20)).astype(np.float64)
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8, nodata=None)
    stats = polygonize(tiles, tile=8, connect=8).collect()
    polys = polygonize_polygons(tiles, tile=8, connect=8).collect()
    want = sorted((float(r.value), int(r.n_pixels)) for r in stats)
    got = sorted((float(r.value),
                  int(round(sum(_shoelace(rg)
                                for rings in
                                wkbmod.decode(bytes(r.geom)).polygons()
                                for rg in rings))))
                 for r in polys)
    assert got == want


def test_polygonize_rings_distributed_merge_path(spark):
    """polygonize_polygons must honor driver_merge_threshold (round-3 fix):
    threshold 0 forces the distributed min-label merge and must yield
    byte-identical polygons to the driver union-find fast path."""
    from gdal_spark.raster.polygonize import polygonize_polygons
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 3, size=(24, 24)).astype(np.int32)
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8, nodata=0.0)
    fast = sorted((r.comp_id, float(r.value), bytes(r.geom))
                  for r in polygonize_polygons(tiles, tile=8,
                                               nodata=0.0).collect())
    dist = sorted((r.comp_id, float(r.value), bytes(r.geom))
                  for r in polygonize_polygons(
                      tiles, tile=8, nodata=0.0,
                      driver_merge_threshold=0).collect())
    assert fast == dist and len(fast) > 1
