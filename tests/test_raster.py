"""Raster tile pipeline tests — every operator checked against a pure-numpy
single-array oracle computed on the assembled raster (so the distributed
tiling + halo machinery must reproduce the whole-array result exactly)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.core import wkb
from gdal_spark.core.checksum import gdal_checksum
from gdal_spark.core.geomops import points_in_polygon
from gdal_spark.raster import dem, pyramid, rasterize, tiles

TILE = 16  # small tiles so multi-tile paths are exercised


@pytest.fixture(scope="module")
def dem_tiles(spark):
    rng = np.random.RandomState(3)
    arr = np.cumsum(np.cumsum(rng.rand(3 * TILE, 4 * TILE), 0), 1)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE).cache()
    return arr, df


def test_tiles_roundtrip(spark):
    rng = np.random.RandomState(0)
    arr = (rng.rand(40, 55) * 255).astype(np.uint8)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    back = tiles.tiles_to_raster(df, tile=TILE)
    assert back.shape == (3 * TILE, 4 * TILE)
    np.testing.assert_array_equal(back[:40, :55], arr)


def test_checksum_tiles(spark):
    rng = np.random.RandomState(1)
    arr = (rng.rand(TILE, TILE) * 255).astype(np.uint8)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    row = tiles.checksum_tiles(df, tile=TILE).collect()[0]
    assert row.checksum == gdal_checksum(arr)


def _oracle_burn(grid, geoms_burns, merge_add=False):
    """Whole-array numpy oracle for rasterize (polygon center rule)."""
    h, w = grid.height, grid.width
    arr = np.zeros((h, w))
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    cx = grid.x0 + (jj + 0.5) * grid.dx
    cy = grid.y0 + (ii + 0.5) * grid.dy
    for g_wkb, burn in geoms_burns:
        g = wkb.decode(g_wkb)
        inside = np.zeros((h, w), dtype=bool)
        for rings in g.polygons():
            inside |= points_in_polygon(
                cx.ravel(), cy.ravel(), rings).reshape(h, w)
        if merge_add:
            arr[inside] += burn
        else:
            arr[inside] = burn
    return arr


def _mk_geoms_df(spark, geoms_burns):
    import pandas as pd
    pdf = pd.DataFrame(
        [(g, float(b), i) for i, (g, b) in enumerate(geoms_burns)],
        columns=["geom", "burn", "seq"])
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize("merge_alg", ["replace", "add"])
def test_rasterize_polygons(spark, merge_alg):
    grid = rasterize.GridSpec(x0=0.0, y0=48.0, dx=1.0, dy=-1.0,
                              width=3 * TILE, height=3 * TILE, tile=TILE)
    geoms = [
        (wkb.box(2.2, 5.1, 30.7, 40.2), 10.0),
        (wkb.box(20.0, 10.0, 44.5, 30.5), 5.0),       # overlaps first
        (wkb.polygon([(5, 42), (40, 44), (22, 47)]), 7.0),  # triangle
    ]
    df = _mk_geoms_df(spark, geoms)
    # geotransform: y0=48 at top, dy=-1 → world y maps to py=(y-48)/-1
    out = rasterize.rasterize(df, grid, merge_alg=merge_alg)
    got = tiles.tiles_to_raster(out, tile=TILE)
    want = _oracle_burn(grid, geoms, merge_add=(merge_alg == "add"))
    # got only covers touched tiles; pad to full grid
    full = np.zeros_like(want)
    full[:got.shape[0], :got.shape[1]] = got
    np.testing.assert_array_equal(full, want)


def test_rasterize_points_and_checksum(spark):
    grid = rasterize.GridSpec(x0=0.0, y0=float(TILE), dx=1.0, dy=-1.0,
                              width=TILE, height=TILE, tile=TILE)
    pts = [(wkb.point(3.5, 12.5), 9.0), (wkb.point(3.2, 12.1), 4.0)]
    df = _mk_geoms_df(spark, pts)
    out = rasterize.rasterize(df, grid, merge_alg="add")
    arr = tiles.tiles_to_raster(out, tile=TILE)
    # both points land in pixel (px=3, py = (12.x-16)/-1 = 3.x → row 3)
    assert arr[3, 3] == 13.0
    assert arr.sum() == 13.0
    row = tiles.checksum_tiles(out, tile=TILE).collect()[0]
    assert row.checksum == gdal_checksum(arr)


@pytest.mark.parametrize("resampling", ["average", "near", "sum", "min", "max"])
def test_overview_level(spark, resampling):
    rng = np.random.RandomState(7)
    arr = (rng.rand(2 * TILE, 2 * TILE) * 255).astype(np.uint8)
    df = tiles.raster_to_tiles(spark, arr, zoom=3, tile=TILE)
    up = pyramid.overview_level(df, resampling=resampling, tile=TILE)
    rows = up.collect()
    assert len(rows) == 1 and rows[0].zoom == 2
    got = np.frombuffer(rows[0].px, dtype=np.dtype(rows[0].dtype)) \
        .reshape(TILE, TILE)
    b = arr.reshape(TILE, 2, TILE, 2)
    if resampling == "average":
        want = np.floor(b.mean(axis=(1, 3)) + 0.5).astype(np.uint8)
    elif resampling == "near":
        want = b[:, 0, :, 0]
    elif resampling == "sum":
        want = b.astype(np.float64).sum(axis=(1, 3))
    elif resampling == "min":
        want = b.min(axis=(1, 3))
    else:
        want = b.max(axis=(1, 3))
    np.testing.assert_allclose(got, want)


def test_build_pyramid_levels(spark):
    arr = np.arange(4 * TILE * 4 * TILE, dtype=np.float64) \
        .reshape(4 * TILE, 4 * TILE)
    df = tiles.raster_to_tiles(spark, arr, zoom=5, tile=TILE)
    pyr = pyramid.build_pyramid(df, levels=2, resampling="average", tile=TILE)
    counts = {r["zoom"]: r["count"] for r in
              pyr.groupBy("zoom").count().collect()}
    assert counts == {5: 16, 4: 4, 3: 1}


def _dem_oracle(arr, op, **kw):
    pad = np.pad(arr, 1, mode="edge")
    return dem._kernel_outputs(pad.astype(np.float64), op,
                               kw.get("ewres", 1.0), kw.get("nsres", 1.0),
                               kw.get("z_factor", 1.0),
                               kw.get("altitude", 45.0),
                               kw.get("azimuth", 315.0))


@pytest.mark.parametrize("op", ["hillshade", "slope", "aspect",
                                "tri", "tpi", "roughness"])
def test_dem_ops_match_whole_array(spark, dem_tiles, op):
    """Halo-exchange result must equal the kernel run on the full array —
    this is the cross-tile-correctness proof for the stencil machinery."""
    arr, df = dem_tiles
    out = dem.dem_op(df, op, tile=TILE)
    got = tiles.tiles_to_raster(out, tile=TILE)
    want = _dem_oracle(arr, op)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_retile_roundtrip(spark):
    """retile 8 -> 16 -> 8 preserves every pixel (gdal_retile re-blocking)."""
    import numpy as np

    from gdal_spark.raster.tiles import raster_to_tiles, retile, \
        tiles_to_raster

    rng = np.random.default_rng(13)
    arr = rng.integers(0, 100, size=(32, 48)).astype(np.int32)
    t8 = raster_to_tiles(spark, arr, zoom=0, tile=8)
    t16 = retile(t8, 8, 16)
    back = retile(t16, 16, 8)
    assert np.array_equal(tiles_to_raster(back, tile=8), arr)
    assert np.array_equal(tiles_to_raster(t16, tile=16), arr)


def test_viewshed_peak_sees_all_and_wall_blocks(spark):
    """Observer on a peak of a downward cone sees every pixel; a tall wall
    hides exactly the pixels radially behind it (checked against a
    brute-force per-pixel line-of-sight oracle on the assembled raster)."""
    t = 16
    n = 2 * t
    yy, xx = np.mgrid[0:n, 0:n]
    cx = cyc = n / 2.0
    cone = 100.0 - np.hypot(xx + 0.5 - cx, yy + 0.5 - cyc)
    df = tiles.raster_to_tiles(spark, cone, tile=t)
    from gdal_spark.raster.dem import viewshed
    out = viewshed(df, ox=cx, oy=cyc, oz=105.0, tile=t, n_rays=1440)
    vis = {(r.gpx, r.gpy): r.visible for r in out.collect()}
    assert all(v == 1 for v in vis.values())          # peak sees everything

    wall = cone.copy()
    wall[:, 20] = 150.0                               # north-south wall
    df2 = tiles.raster_to_tiles(spark, wall, tile=t)
    out2 = viewshed(df2, ox=cx, oy=cyc, oz=105.0, tile=t, n_rays=1440)
    vis2 = {(r.gpx, r.gpy): r.visible for r in out2.collect()}
    # wall pixels themselves are visible; pixels well behind it are not
    assert vis2[(20, 16)] == 1
    hidden = [vis2[(x, 16)] for x in range(24, 32)]
    assert all(v == 0 for v in hidden)
    # in front of the wall everything is still visible
    front = [vis2[(x, 16)] for x in range(10, 20)]
    assert all(v == 1 for v in front)


def test_rasterize_invert(spark):
    """gdal_rasterize -i: burn OUTSIDE the geometries, leave the covered
    pixels at init; uncovered tiles materialize as all-burn."""
    grid = rasterize.GridSpec(x0=0.0, y0=2.0 * TILE, dx=1.0, dy=-1.0,
                              width=2 * TILE, height=2 * TILE, tile=TILE)
    geoms = [(wkb.box(2.0, 2.0, 10.0, 10.0), 1.0)]
    df = _mk_geoms_df(spark, geoms)
    out = rasterize.rasterize(df, grid, invert=True, invert_burn=9.0)
    arr = tiles.tiles_to_raster(out, tile=TILE)
    assert arr.shape == (2 * TILE, 2 * TILE)       # ALL tiles materialized
    # inside the box (world y 2..10 -> rows 22..30): init (0)
    assert (arr[23:29, 3:9] == 0.0).all()
    # outside: burn
    assert (arr[0:10, 0:10] == 9.0).all()
    assert (arr[:, TILE:] == 9.0).all()            # untouched tile all-burn


def test_los_bresenham_cells_match_reference_loop():
    """Closed-form Bresenham must equal a literal port of los.cpp:36."""
    import numpy as np
    from gdal_spark.raster.dem import _bresenham_cells

    def loop_cells(x1, y1, x2, y2):
        dx = abs(x2 - x1); incx = 1 if x2 >= x1 else -1
        dy = abs(y2 - y1); incy = 1 if y2 >= y1 else -1
        x, y = x1, y1; pts = []
        if dx >= dy:
            dy2 = dy * 2; balance = dy2 - dx; dx2 = dx * 2
            while x != x2:
                pts.append((x, y))
                if balance >= 0:
                    y += incy; balance -= dx2
                balance += dy2; x += incx
            pts.append((x, y))
        else:
            dx2 = dx * 2; balance = dx2 - dy; dy2 = dy * 2
            while y != y2:
                pts.append((x, y))
                if balance >= 0:
                    x += incx; balance -= dy2
                balance += dx2; y += incy
            pts.append((x, y))
        return pts

    rng = np.random.default_rng(5)
    for _ in range(200):
        x1, y1, x2, y2 = (int(v) for v in rng.integers(-25, 25, 4))
        xs, ys = _bresenham_cells(x1, y1, x2, y2)
        assert list(zip(xs, ys)) == loop_cells(x1, y1, x2, y2)


def test_los_wall_blocks_and_flat_sees(spark):
    """GDALIsLineOfSightVisible semantics (alg/los.cpp): flat terrain with
    a tall wall column — sight lines over the wall pass, under it block;
    off-raster targets block."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from gdal_spark.raster.dem import los

    t = 8
    arr = np.zeros((32, 32))
    arr[:, 20] = 70.0
    df = tiles.raster_to_tiles(spark, arr, tile=t)
    pairs = pd.DataFrame(
        [(0, 5, 16, 60.0, 30, 16, 95.0),    # crosses wall high -> visible
         (1, 5, 16, 10.0, 30, 16, 12.0),    # crosses wall low -> blocked
         (2, 5, 2, 60.0, 18, 30, 5.0),      # stays west of wall -> visible
         (3, 5, 16, 60.0, 200, 16, 90.0),   # off-raster target -> blocked
         (4, 25, 4, 1.0, 28, 28, 2.0)],     # east side, no wall -> visible
        columns=["pid", "xa", "ya", "za", "xb", "yb", "zb"])
    sdf = spark.createDataFrame(pairs, schema=T.StructType([
        T.StructField("pid", T.LongType()),
        T.StructField("xa", T.LongType()), T.StructField("ya", T.LongType()),
        T.StructField("za", T.DoubleType()),
        T.StructField("xb", T.LongType()), T.StructField("yb", T.LongType()),
        T.StructField("zb", T.DoubleType())]))
    got = {r.pid: r.visible for r in los(df, sdf, tile=t).collect()}
    # pid 0: line z at x=20 = 60 + (15/25)*(95-60) = 81 > 70 -> visible
    assert got == {0: True, 1: False, 2: True, 3: False, 4: True}


def test_kml_superoverlay_tree(spark, tmp_path):
    """KML SuperOverlay (frmts/kmlsuperoverlay): pyramid PNGs written by
    executors; region-gated kml tree links children; bounds geodetic."""
    import os
    import xml.etree.ElementTree as ET

    import numpy as np

    from gdal_spark.raster.superoverlay import write_kml_superoverlay
    from gdal_spark.raster.tiles import raster_to_tiles
    from gdal_spark.sources.png import decode_png

    rng = np.random.RandomState(9)
    arr = rng.randint(0, 255, (64, 64)).astype("f8")
    base = raster_to_tiles(spark, arr, zoom=2, tile=16)
    out = str(tmp_path / "so")
    tiles = write_kml_superoverlay(base, out, max_zoom=2, tile=16)
    zs = sorted({z for z, _x, _y in tiles})
    assert zs == [0, 1, 2]
    assert len([t for t in tiles if t[0] == 2]) == 16
    assert os.path.isfile(os.path.join(out, "doc.kml"))
    # leaf png round-trips the base tile
    a, _m = decode_png(open(os.path.join(out, "2/0/0.png"), "rb").read())
    np.testing.assert_array_equal(a, arr[:16, :16].astype("u1"))
    # root kml: region + overlay + 4 child links
    root = ET.parse(os.path.join(out, "0/0/0.kml")).getroot()
    ns = "{http://www.opengis.net/kml/2.2}"
    links = root.findall(f".//{ns}NetworkLink")
    assert len(links) == 4
    assert root.find(f".//{ns}Region/{ns}LatLonAltBox/{ns}north") \
        is not None
    assert root.find(f".//{ns}GroundOverlay/{ns}Icon/{ns}href") \
        .text == "0.png"
    # doc.kml points at the top of the tree
    doc = ET.parse(os.path.join(out, "doc.kml")).getroot()
    assert doc.find(f".//{ns}Link/{ns}href").text == "0/0/0.kml"
