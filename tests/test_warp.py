"""Warp tests: identity warp must be exact; reprojection must match a
single-array numpy oracle using the same mesh + kernel (proving the
distributed src-tile routing / canvas assembly is lossless)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.raster import tiles, transforms, warp
from gdal_spark.raster.rasterize import GridSpec

TILE = 16


def _smooth(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return (np.sin(x / 7.0) * 40 + np.cos(y / 9.0) * 25
            + 0.02 * x * y / 10.0 + 100.0)


def test_transform_roundtrip():
    lon = np.linspace(-179, 179, 50)
    lat = np.linspace(-84, 84, 50)
    mx, my = transforms.transform("EPSG:4326", "EPSG:3857", lon, lat)
    lon2, lat2 = transforms.transform("EPSG:3857", "EPSG:4326", mx, my)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_approx_mesh_within_tolerance():
    # realistic case: one 256px dst tile spanning ~5 degrees (the scale at
    # which the reference's ApproxTransformer pays off)
    xs, ys = np.meshgrid(np.linspace(10.0, 15.0, 256),
                         np.linspace(45.0, 50.0, 256))
    tx, ty, n_exact, n_total = transforms.approx_mesh(
        "EPSG:4326", "EPSG:3857", xs, ys, step=16, tol_px=0.125,
        px_size=2000.0)
    ex, ey = transforms.transform("EPSG:4326", "EPSG:3857", xs, ys)
    assert n_exact < n_total / 10  # saved >90% of exact transforms
    np.testing.assert_allclose(tx, ex, atol=0.5 * 2000.0)
    np.testing.assert_allclose(ty, ey, atol=0.5 * 2000.0)


@pytest.mark.parametrize("resample", ["near", "bilinear", "cubic"])
def test_identity_warp(spark, resample):
    arr = _smooth(2 * TILE, 3 * TILE)
    grid = GridSpec(x0=0.0, y0=0.0, dx=1.0, dy=1.0,
                    width=3 * TILE, height=2 * TILE, tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    spec = warp.WarpSpec(src_grid=grid, src_crs="EPSG:4326",
                         dst_grid=grid, dst_crs="EPSG:4326",
                         resample=resample)
    out = warp.warp(df, spec)
    got = tiles.tiles_to_raster(out, tile=TILE)
    # identity mesh: interior must be exact for all kernels (weights hit 0/1)
    interior = (slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(got[interior], arr[interior], atol=1e-9)


@pytest.mark.parametrize("resample", ["near", "bilinear", "cubic"])
def test_reproject_matches_single_array_oracle(spark, resample):
    """3857 -> 4326 warp across multiple tiles == one-shot numpy warp."""
    h, w = 2 * TILE, 4 * TILE
    arr = _smooth(h, w)
    # src: mercator grid covering the world band lat ~ [-66, 66]
    merc = 20037508.342789244
    src = GridSpec(x0=-merc, y0=merc / 2, dx=2 * merc / w, dy=-merc / (h),
                   width=w, height=h, tile=TILE)
    dst = GridSpec(x0=-180.0, y0=60.0, dx=360.0 / w, dy=-120.0 / h,
                   width=w, height=h, tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    spec = warp.WarpSpec(src_grid=src, src_crs="EPSG:3857",
                         dst_grid=dst, dst_crs="EPSG:4326",
                         resample=resample, fill=-1.0)
    got = tiles.tiles_to_raster(warp.warp(df, spec), tile=TILE)

    # single-array oracle with the same mesh and kernel
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    dwx = dst.x0 + (jj + 0.5) * dst.dx
    dwy = dst.y0 + (ii + 0.5) * dst.dy
    swx, swy = transforms.transform("EPSG:4326", "EPSG:3857", dwx, dwy)
    sx = (swx - src.x0) / src.dx
    sy = (swy - src.y0) / src.dy
    want = warp._sample_point(arr, np.ones_like(arr, dtype=bool), 0, 0,
                              sx, sy, resample, -1.0, use_mask=False)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_warp_approx_transformer(spark):
    h, w = 2 * TILE, 2 * TILE
    arr = _smooth(h, w)
    merc = 20037508.342789244
    src = GridSpec(x0=-merc, y0=merc / 2, dx=2 * merc / w, dy=-merc / h,
                   width=w, height=h, tile=TILE)
    dst = GridSpec(x0=-180.0, y0=60.0, dx=360.0 / w, dy=-120.0 / h,
                   width=w, height=h, tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    exact = tiles.tiles_to_raster(warp.warp(df, warp.WarpSpec(
        src, "EPSG:3857", dst, "EPSG:4326", "bilinear", fill=-1.0)),
        tile=TILE)
    approx = tiles.tiles_to_raster(warp.warp(df, warp.WarpSpec(
        src, "EPSG:3857", dst, "EPSG:4326", "bilinear", fill=-1.0,
        approx_tol_px=0.125)), tile=TILE)
    # error bound: 0.125 src px of a smooth field -> tiny value difference
    assert np.abs(exact - approx).max() < 1.0


# ---------------------------------------------------------------------------
# round 2: full GDALResampleAlg kernel surface (gdalwarper.h:37-67)
# ---------------------------------------------------------------------------

def _block_reduce_oracle(arr, f, method):
    """Aligned factor-f downsample reference (centers-in-rect rule makes the
    footprint exactly f x f when grids align)."""
    h, w = arr.shape
    b = arr.reshape(h // f, f, w // f, f)
    flat = b.transpose(0, 2, 1, 3).reshape(h // f, w // f, f * f)
    if method == "average":
        return flat.mean(axis=2)
    if method == "sum":
        return flat.sum(axis=2)
    if method == "min":
        return flat.min(axis=2)
    if method == "max":
        return flat.max(axis=2)
    if method == "rms":
        return np.sqrt((flat.astype(np.float64) ** 2).mean(axis=2))
    if method == "med":
        return np.percentile(flat, 50.0, axis=2)
    if method == "q1":
        return np.percentile(flat, 25.0, axis=2)
    if method == "q3":
        return np.percentile(flat, 75.0, axis=2)
    if method == "mode":
        out = np.empty((h // f, w // f))
        for i in range(h // f):
            for j in range(w // f):
                v, c = np.unique(flat[i, j], return_counts=True)
                out[i, j] = v[np.argmax(c)]   # ties -> smallest value
        return out
    raise ValueError(method)


@pytest.mark.parametrize("method", ["average", "sum", "min", "max", "rms",
                                    "med", "q1", "q3", "mode"])
@pytest.mark.parametrize("factor", [2, 3])
def test_area_kernels_aligned_downsample(spark, method, factor):
    h = w = 2 * TILE * 3          # divisible by 2 and 3
    rng = np.random.RandomState(5)
    arr = rng.randint(0, 6, size=(h, w)).astype(np.float64)
    src = GridSpec(x0=0.0, y0=0.0, dx=1.0, dy=1.0, width=w, height=h,
                   tile=TILE)
    dst = GridSpec(x0=0.0, y0=0.0, dx=float(factor), dy=float(factor),
                   width=w // factor, height=h // factor, tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    spec = warp.WarpSpec(src, "EPSG:4326", dst, "EPSG:4326", method)
    got = tiles.tiles_to_raster(warp.warp(df, spec), tile=TILE)
    got = got[:h // factor, :w // factor]
    want = _block_reduce_oracle(arr, factor, method)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_area_upsample_falls_back_to_containing_pixel(spark):
    arr = _smooth(TILE, TILE)
    src = GridSpec(x0=0.0, y0=0.0, dx=1.0, dy=1.0, width=TILE, height=TILE,
                   tile=TILE)
    dst = GridSpec(x0=0.0, y0=0.0, dx=0.5, dy=0.5, width=2 * TILE,
                   height=2 * TILE, tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    got = tiles.tiles_to_raster(warp.warp(
        df, warp.WarpSpec(src, "EPSG:4326", dst, "EPSG:4326", "average")),
        tile=TILE)
    want = np.repeat(np.repeat(arr, 2, axis=0), 2, axis=1)
    np.testing.assert_allclose(got[:2 * TILE, :2 * TILE], want, atol=1e-9)


@pytest.mark.parametrize("resample", ["cubicspline", "lanczos"])
def test_smooth_kernels_match_single_array_oracle(spark, resample):
    h, w = 2 * TILE, 4 * TILE
    arr = _smooth(h, w)
    merc = 20037508.342789244
    src = GridSpec(x0=-merc, y0=merc / 2, dx=2 * merc / w, dy=-merc / h,
                   width=w, height=h, tile=TILE)
    dst = GridSpec(x0=-180.0, y0=60.0, dx=360.0 / w, dy=-120.0 / h,
                   width=w, height=h, tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    spec = warp.WarpSpec(src, "EPSG:3857", dst, "EPSG:4326", resample,
                         fill=-1.0)
    got = tiles.tiles_to_raster(warp.warp(df, spec), tile=TILE)
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    dwx = dst.x0 + (jj + 0.5) * dst.dx
    dwy = dst.y0 + (ii + 0.5) * dst.dy
    swx, swy = transforms.transform("EPSG:4326", "EPSG:3857", dwx, dwy)
    sx = (swx - src.x0) / src.dx
    sy = (swy - src.y0) / src.dy
    want = warp._sample_point(arr, np.ones_like(arr, dtype=bool), 0, 0,
                              sx, sy, resample, -1.0, use_mask=False)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_lanczos_interpolates_constants():
    """Lanczos weights are normalized: a constant field stays constant."""
    arr = np.full((32, 32), 7.25)
    sx, sy = np.meshgrid(np.linspace(4, 28, 40), np.linspace(4, 28, 40))
    out = warp._sample_point(arr, np.ones_like(arr, dtype=bool), 0, 0,
                             sx, sy, "lanczos", -1.0, use_mask=False)
    np.testing.assert_allclose(out, 7.25, atol=1e-9)


def test_nodata_average_excludes_and_emits_nodata(spark):
    h = w = 2 * TILE
    arr = np.full((h, w), -9.0)
    arr[0, 0] = 8.0               # parent (0,0): one valid of four
    arr[0, 2] = 4.0               # parent (0,1): two valid
    arr[1, 3] = 6.0
    src = GridSpec(x0=0.0, y0=0.0, dx=1.0, dy=1.0, width=w, height=h,
                   tile=TILE)
    dst = GridSpec(x0=0.0, y0=0.0, dx=2.0, dy=2.0, width=w // 2,
                   height=h // 2, tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE, nodata=-9.0)
    got = tiles.tiles_to_raster(warp.warp(
        df, warp.WarpSpec(src, "EPSG:4326", dst, "EPSG:4326", "average",
                          src_nodata=-9.0)), tile=TILE)
    assert got[0, 0] == pytest.approx(8.0)
    assert got[0, 1] == pytest.approx(5.0)
    assert got[2, 2] == pytest.approx(-9.0)   # all-nodata -> nodata out


def test_nodata_bilinear_renormalizes(spark):
    h = w = 2 * TILE
    arr = np.full((h, w), 10.0)
    arr[5, 5] = -9.0              # a nodata hole
    src = GridSpec(x0=0.0, y0=0.0, dx=1.0, dy=1.0, width=w, height=h,
                   tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE, nodata=-9.0)
    got = tiles.tiles_to_raster(warp.warp(
        df, warp.WarpSpec(src, "EPSG:4326", src, "EPSG:4326", "bilinear",
                          src_nodata=-9.0)), tile=TILE)
    # neighbours of the hole renormalize over the valid taps -> still 10
    assert got[5, 6] == pytest.approx(10.0)
    assert got[4, 5] == pytest.approx(10.0)
    # the hole's own pixel center has zero-weight on valid taps at t=0 -> 
    # weight renorm makes it nodata only if ALL taps invalid; t=0 keeps
    # single tap = the hole -> nodata
    assert got[5, 5] == pytest.approx(-9.0)


def test_suggested_warp_output_4326_to_3857():
    src = GridSpec(x0=-180.0, y0=85.0, dx=0.5, dy=-0.5,
                   width=720, height=340, tile=TILE)
    dst = warp.suggested_warp_output(src, "EPSG:4326", "EPSG:3857")
    mx0, my1 = transforms.transform("EPSG:4326", "EPSG:3857",
                                    np.array([-180.0]), np.array([85.0]))
    assert dst.x0 == pytest.approx(float(mx0[0]), rel=1e-9)
    assert dst.y0 == pytest.approx(float(my1[0]), rel=1e-6)
    assert dst.dy < 0 and dst.dx > 0
    # pixel count approximately preserved along the diagonal
    src_diag = np.hypot(src.width, src.height)
    dst_diag = np.hypot(dst.width, dst.height)
    assert abs(dst_diag - src_diag) / src_diag < 0.02


def test_warp_cutline_masks_source(spark):
    """gdalwarp -cutline source-mask semantics: pixels outside the cutline
    polygon never contribute; dst pixels with no valid source emit fill."""
    from gdal_spark.core import wkb as wkbmod
    h = w = 2 * TILE
    arr = np.full((h, w), 7.0)
    grid = GridSpec(x0=0.0, y0=float(h), dx=1.0, dy=-1.0,
                    width=w, height=h, tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    # cutline: a centered rect in world coords covering px [8,24) x [8,24)
    cut = wkbmod.box(8.0, float(h) - 24.0, 24.0, float(h) - 8.0)
    spec = warp.WarpSpec(grid, "EPSG:4326", grid, "EPSG:4326", "near",
                         fill=-1.0, cutline=cut)
    got = tiles.tiles_to_raster(warp.warp(df, spec), tile=TILE)
    inside = got[10:22, 10:22]
    np.testing.assert_array_equal(inside, np.full_like(inside, 7.0))
    assert got[0, 0] == -1.0 and got[31, 31] == -1.0
    # average kernel: a dst pixel half-in/half-out averages only the inside
    dst = GridSpec(x0=0.0, y0=float(h), dx=2.0, dy=-2.0,
                   width=w // 2, height=h // 2, tile=TILE)
    spec2 = warp.WarpSpec(grid, "EPSG:4326", dst, "EPSG:4326", "average",
                          fill=-1.0, cutline=cut)
    got2 = tiles.tiles_to_raster(warp.warp(df, spec2), tile=TILE)
    assert got2[5, 5] == 7.0            # fully inside
    assert got2[0, 0] == -1.0           # fully outside
    assert got2[4, 4] == 7.0            # partial: valid-only average


def test_color_relief_golden(spark):
    from gdal_spark.raster import dem
    rng = np.random.RandomState(3)
    arr = rng.uniform(0, 100, size=(TILE, TILE))
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    colors = [(0.0, 0, 0, 255), (50.0, 0, 255, 0), (100.0, 255, 0, 0)]
    out = dem.color_relief(df, colors, tile=TILE).collect()
    assert len(out) == 3
    chans = {r.band: np.frombuffer(r.px, dtype=np.uint8).reshape(TILE, TILE)
             for r in out}
    cv = np.array([0.0, 50.0, 100.0])
    for band in (1, 2, 3):
        want = np.round(np.interp(arr, cv, [c[band] for c in colors]))
        np.testing.assert_array_equal(chans[band], want.astype(np.uint8))


def test_color_relief_exact_mode(spark):
    from gdal_spark.raster import dem
    arr = np.array([[5.0, 55.0], [99.0, 100.0]])
    full = np.zeros((TILE, TILE))
    full[:2, :2] = arr
    df = tiles.raster_to_tiles(spark, full, tile=TILE)
    colors = [(0.0, 10, 0, 0), (50.0, 20, 0, 0), (100.0, 30, 0, 0)]
    out = dem.color_relief(df, colors, tile=TILE, interpolate=False)
    r = {row.band: np.frombuffer(row.px, dtype=np.uint8).reshape(TILE, TILE)
         for row in out.collect()}
    assert r[1][0, 0] == 10      # 5 -> floor entry 0
    assert r[1][0, 1] == 20      # 55 -> entry 50
    assert r[1][1, 1] == 30      # 100 -> entry 100


def test_reference_autotest_golden_tiles(spark):
    """Warp golden-tile parity against the reference's own committed
    outputs (autotest/alg/data/utmsmall_*.tiff, generated from
    gcore/data/utmsmall.tif by the VRTWarpedDataset fixtures in
    autotest/alg/warp.py): near, cubicspline, lanczos and average are
    BIT-EXACT; bilinear and cubic agree within +-1 8-bit level on >=98%
    of pixels (the residual ties flip inside GDAL's SSE2-specialized
    accumulation order, which has no scalar-visible spec)."""
    import numpy as np
    from gdal_spark.sources.geotiff import (_decode_block, read_gtiff,
                                            read_ifd)

    def read_whole(path):
        info = read_ifd(path)
        h, w = info["height"], info["width"]
        arr = np.zeros((h, w), np.dtype(info["dtype"]))
        with open(path, "rb") as f:
            rps = info["rows_per_strip"]
            for k, off in enumerate(info["offsets"]):
                f.seek(off)
                bh = min(rps, h - k * rps)
                arr[k * rps:k * rps + bh] = _decode_block(
                    f.read(info["counts"][k]), info, bh, w)
        return arr

    src_tiles = read_gtiff(
        spark, "/root/reference/autotest/gcore/data/utmsmall.tif",
        tile=50).localCheckpoint()
    src = GridSpec(x0=440720.0, y0=3751320.0, dx=60.0, dy=-60.0,
                   width=100, height=100, tile=50)
    cases = [("near", "utmsmall_near.tiff", 500, 10.0, 0),
             ("bilinear", "utmsmall_blinear.tiff", 500, 10.0, 1),
             ("cubic", "utmsmall_cubic.tiff", 500, 10.0, 1),
             ("cubicspline", "utmsmall_cubicspline.tiff", 500, 10.0, 0),
             ("lanczos", "utmsmall_lanczos.tiff", 500, 10.0, 0),
             ("average", "utmsmall_average.tiff", 50, 120.0, 0),
             # the ds_ fixtures are 20x20 at 50 m (slight upsample crop);
             # autotest's own bar for them is maxdiff <= 1 (warp.py:314)
             ("cubicspline", "utmsmall_ds_cubicspline.tiff", 20, 50.0, 1),
             ("lanczos", "utmsmall_ds_lanczos.tiff", 20, 50.0, 0)]
    for alg, golden, n, res, tol in cases:
        dst = GridSpec(x0=440720.0, y0=3751320.0, dx=res, dy=-res,
                       width=n, height=n, tile=min(n, 50))
        out = warp.warp(src_tiles, warp.WarpSpec(
            src, "EPSG:4326", dst, "EPSG:4326", alg, fill=0.0),
            out_dtype="float64")
        got = tiles.tiles_to_raster(out, tile=dst.tile)[:n, :n]
        g8 = np.clip(np.floor(got + 0.5), 0, 255).astype(int)  # GDAL
        want = read_whole(
            f"/root/reference/autotest/alg/data/{golden}").astype(int)
        diff = np.abs(g8 - want)
        assert diff.max() <= tol, (alg, diff.max())
        if tol:
            assert (diff == 0).mean() >= 0.96, alg


def test_reduce_area_mode_edges():
    """Run-length mode edge cases: ties -> smallest value, fully masked ->
    fill, single valid tap, NaN-heavy footprints."""
    from gdal_spark.raster.warp import _reduce_area
    vals = np.array([[[[2.0, 2.0], [7.0, 7.0]],      # tie 2x2 vs 7x2 -> 2
                      [[5.0, 1.0], [5.0, 9.0]],      # 5 wins
                      [[3.0, 0.0], [0.0, 0.0]],      # masked except one 3
                      [[4.0, 4.0], [4.0, 8.0]]]])    # 4 wins
    m = np.array([[[[True, True], [True, True]],
                   [[True, True], [True, True]],
                   [[True, False], [False, False]],
                   [[True, True], [True, True]]]])
    out = _reduce_area(vals, m, "mode", fill=-1.0)
    np.testing.assert_array_equal(out, [[2.0, 5.0, 3.0, 4.0]])
    none = _reduce_area(vals, np.zeros_like(m), "mode", fill=-1.0)
    np.testing.assert_array_equal(none, [[-1.0, -1.0, -1.0, -1.0]])


def test_reduce_area_mode_matches_unique_oracle_random():
    from gdal_spark.raster.warp import _reduce_area
    rng = np.random.RandomState(11)
    vals = rng.randint(0, 5, size=(3, 7, 4, 4)).astype(np.float64)
    m = rng.rand(3, 7, 4, 4) < 0.7
    out = _reduce_area(vals, m, "mode", fill=np.nan)
    for c in range(3):
        for j in range(7):
            sel = vals[c, j][m[c, j]]
            if sel.size == 0:
                assert np.isnan(out[c, j])
                continue
            v, n = np.unique(sel, return_counts=True)
            assert out[c, j] == v[np.argmax(n)]  # ties -> smallest value


def test_warp_near_through_conus_albers(spark):
    """gdalwarp through EPSG:5070 (NAD83 / Conus Albers): the distributed
    warp (tile routing + CT chain + near kernel) must equal a pure-numpy
    replay that inverse-projects every destination pixel center with
    aea_inverse and floors into the source grid."""
    from gdal_spark.raster.transforms import aea_inverse

    h, w = 2 * TILE, 2 * TILE
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 1000, (h, w)).astype(np.float64)
    # source: global-ish lon/lat grid; dst: 32x32 Albers meters window
    src = GridSpec(x0=-180.0, y0=85.0, dx=360.0 / w, dy=-170.0 / h,
                   width=w, height=h, tile=TILE)
    dst = GridSpec(x0=-6000000.0, y0=5000000.0, dx=12000000.0 / w,
                   dy=-10000000.0 / h, width=w, height=h, tile=TILE)
    df = tiles.raster_to_tiles(spark, arr, tile=TILE)
    got = tiles.tiles_to_raster(warp.warp(df, warp.WarpSpec(
        src, "EPSG:4326", dst, "EPSG:5070", "near", fill=-1.0)),
        tile=TILE)[:h, :w]

    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    mx = dst.x0 + (jj + 0.5) * dst.dx
    my = dst.y0 + (ii + 0.5) * dst.dy
    lon, lat = aea_inverse(mx, my, -96.0, 23.0, 29.5, 45.5)
    sx = np.floor((lon - src.x0) / src.dx).astype(int)
    sy = np.floor((lat - src.y0) / src.dy).astype(int)
    ok = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h) \
        & np.isfinite(lon) & np.isfinite(lat)
    want = np.full((h, w), -1.0)
    want[ok] = arr[sy[ok], sx[ok]]
    np.testing.assert_array_equal(got, want)
