"""Contour (marching squares) vs analytic and tiling-invariance checks.

Reference: GDALContourGenerate, /root/reference/alg/contour.cpp +
alg/marching_squares/*.h (linear interpolation on cell edges).
"""

import numpy as np
import pytest

from gdal_spark.raster.contour import contour_segments, contour_stats
from gdal_spark.raster.tiles import raster_to_tiles


def _segset(rows):
    out = set()
    for r in rows:
        a = (round(r.x0, 9), round(r.y0, 9))
        b = (round(r.x1, 9), round(r.y1, 9))
        out.add((r.level, min(a, b), max(a, b)))
    return out


def test_linear_ramp_isolines(spark):
    """z = x on a 16x16 ramp: the level-L isoline is the vertical line
    x = L, one segment per cell row it crosses, total length = rows - 1."""
    x = np.arange(16, dtype=np.float64)
    arr = np.tile(x, (16, 1))
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8)
    segs = contour_segments(tiles, levels=[5.5], tile=8).collect()
    assert len(segs) == 15                     # 15 cell rows
    for s in segs:
        assert s.x0 == pytest.approx(5.5) and s.x1 == pytest.approx(5.5)
    stats = contour_stats(tiles, levels=[5.5], tile=8).collect()[0]
    assert stats.n_segments == 15
    assert stats.total_len == pytest.approx(15.0)


def test_tiling_invariance(spark):
    """Same raster through 8-px tiles and through one 32-px tile must give
    the identical segment set — the halo/ownership logic adds or drops
    nothing at seams."""
    rng = np.random.default_rng(6)
    arr = rng.random((32, 32)) * 10
    levels = [2.5, 5.0, 7.5]
    small = raster_to_tiles(spark, arr, zoom=0, tile=8)
    big = raster_to_tiles(spark, arr, zoom=0, tile=32)
    s1 = _segset(contour_segments(small, levels, tile=8).collect())
    s2 = _segset(contour_segments(big, levels, tile=32).collect())
    assert s1 == s2
    assert len(s1) > 100


def test_closed_contour_total_length(spark):
    """A radial cone's isoline approximates a circle; marching-squares
    length converges to the circumference within the cell-size error."""
    n = 64
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    r = np.hypot(xx - 31.5, yy - 31.5)
    tiles = raster_to_tiles(spark, r, zoom=0, tile=16)
    st = contour_stats(tiles, levels=[20.0], tile=16).collect()[0]
    circumference = 2 * np.pi * 20.0
    assert st.total_len == pytest.approx(circumference, rel=0.02)
    # the segment set forms closed loops: every endpoint appears twice
    segs = contour_segments(tiles, [20.0], tile=16).collect()
    from collections import Counter
    ends = Counter()
    for s in segs:
        ends[(round(s.x0, 9), round(s.y0, 9))] += 1
        ends[(round(s.x1, 9), round(s.y1, 9))] += 1
    assert all(c == 2 for c in ends.values())


def test_assemble_polylines_closed_ring(spark):
    """The cone's level-20 segments assemble into exactly ONE closed ring
    whose length matches the segment-set total."""
    from gdal_spark.raster.contour import assemble_polylines
    n = 64
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    r = np.hypot(xx - 31.5, yy - 31.5)
    tiles = raster_to_tiles(spark, r, zoom=0, tile=16)
    segs = [(s.x0, s.y0, s.x1, s.y1)
            for s in contour_segments(tiles, [20.0], tile=16).collect()]
    lines = assemble_polylines(segs)
    assert len(lines) == 1
    ring = lines[0]
    assert ring[0] == ring[-1]                  # closed
    length = sum(np.hypot(ring[i + 1][0] - ring[i][0],
                          ring[i + 1][1] - ring[i][1])
                 for i in range(len(ring) - 1))
    assert length == pytest.approx(2 * np.pi * 20.0, rel=0.02)


def test_assemble_polylines_open_chain(spark):
    """The linear ramp's isoline crosses the raster edge: one OPEN chain."""
    from gdal_spark.raster.contour import assemble_polylines
    x = np.arange(16, dtype=np.float64)
    arr = np.tile(x, (16, 1))
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8)
    segs = [(s.x0, s.y0, s.x1, s.y1)
            for s in contour_segments(tiles, [5.5], tile=8).collect()]
    lines = assemble_polylines(segs)
    assert len(lines) == 1
    assert lines[0][0] != lines[0][-1]          # open
    assert len(lines[0]) == 16                  # 15 segments -> 16 vertices


def test_contour_polygons_bands(spark):
    """Polygon mode: concentric cone bands come back as annuli (exterior +
    hole), classified exactly like np.searchsorted, with band areas summing
    to the raster size."""
    import numpy as np
    from gdal_spark.core import wkb as wkbmod
    from gdal_spark.raster.contour import contour_polygons
    from gdal_spark.raster.tiles import raster_to_tiles
    t = 8
    n = 32
    yy, xx = np.mgrid[0:n, 0:n]
    arr = np.hypot(xx - 15.5, yy - 15.5)          # cone
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=t)
    levels = [5.0, 10.0]
    rows = contour_polygons(tiles, levels, tile=t).collect()

    def area(g):
        total = 0.0
        for rings in g.polygons():
            for k, r in enumerate(rings):
                x, y = r[:, 0], r[:, 1]
                a = 0.5 * (np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))
                total += a
        return total

    # band areas must equal the pixel-count classification
    want = {(-np.inf, 5.0): float((arr < 5).sum()),
            (5.0, 10.0): float(((arr >= 5) & (arr < 10)).sum()),
            (10.0, np.inf): float((arr >= 10).sum())}
    got = {}
    for r in rows:
        key = (r.level_min, r.level_max)
        g = wkbmod.decode(bytes(r.geom))
        got[key] = got.get(key, 0.0) + area(g)
    assert got == pytest.approx(want)
    # the innermost band (disc) has no holes; the middle band is an annulus
    mid = [wkbmod.decode(bytes(r.geom)) for r in rows
           if r.level_min == 5.0]
    assert len(mid) == 1 and len(mid[0].rings) == 2


def _band_area(g):
    import numpy as np
    from gdal_spark.core.geomops import ring_area
    return sum(ring_area(r) for rings in g.polygons() for r in rings)


def test_contour_polygons_interp_ramp_exact(spark):
    """Linear ramp v = x: the level set {v >= L} is the exact half-plane
    x >= L, so band areas are exact rectangles — the analytic pin for the
    sub-pixel polygon writer."""
    import numpy as np
    from gdal_spark.raster.contour import contour_polygons_interp
    from gdal_spark.raster.tiles import raster_to_tiles
    t, n = 8, 32
    yy, xx = np.mgrid[0:n, 0:n]
    arr = xx.astype(np.float64)
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=t)
    bands = contour_polygons_interp(tiles, [10.0, 20.5], tile=t)
    got = {(lo, hi): _band_area(g) for lo, hi, g in bands}
    H = n - 1.0                      # lattice box is (n-1) x (n-1)
    assert got[(float("-inf"), 10.0)] == pytest.approx(10.0 * H, abs=1e-9)
    assert got[(10.0, 20.5)] == pytest.approx(10.5 * H, abs=1e-9)
    assert got[(20.5, float("inf"))] == pytest.approx((n - 1 - 20.5) * H,
                                                      abs=1e-9)


def test_contour_polygons_interp_partition_and_cone(spark):
    """Cone: bands partition the lattice box EXACTLY (shared boundaries
    cancel), the middle band is an annulus (shell + hole), and areas are
    within the segment-approximation error of the analytic circles."""
    import numpy as np
    from gdal_spark.raster.contour import contour_polygons_interp
    from gdal_spark.raster.tiles import raster_to_tiles
    t, n = 8, 40
    yy, xx = np.mgrid[0:n, 0:n]
    arr = np.hypot(xx - 19.5, yy - 19.5)
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=t)
    bands = contour_polygons_interp(tiles, [6.0, 12.0], tile=t)
    got = {(lo, hi): _band_area(g) for lo, hi, g in bands}
    total = sum(got.values())
    assert total == pytest.approx((n - 1.0) ** 2, abs=1e-6)
    assert got[(float("-inf"), 6.0)] == pytest.approx(np.pi * 36, rel=0.02)
    assert got[(6.0, 12.0)] == pytest.approx(np.pi * (144 - 36), rel=0.02)
    # the inner-band region of the middle band is an annulus: its polygon
    # carries a hole
    mid = [g for lo, hi, g in bands if lo == 6.0][0]
    assert any(len(rings) >= 2 for rings in mid.polygons())


def test_contour_polygons_interp_tiling_invariant(spark):
    import numpy as np
    from gdal_spark.raster.contour import contour_polygons_interp
    from gdal_spark.raster.tiles import raster_to_tiles
    n = 24
    rng = np.random.default_rng(3)
    arr = rng.random((n, n)) * 10.0
    outs = []
    for t in (6, 8):
        tiles = raster_to_tiles(spark, arr, zoom=0, tile=t)
        bands = contour_polygons_interp(tiles, [3.0, 7.0], tile=t)
        outs.append(sorted((lo, hi, round(_band_area(g), 9))
                           for lo, hi, g in bands))
    assert outs[0] == outs[1]
