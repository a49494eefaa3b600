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
