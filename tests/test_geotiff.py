"""GeoTIFF source round-trips, bit-exact via the autotest checksum oracle.

Reference semantics: /root/reference/frmts/gtiff/ (IFD walk, strip/tile
block decode, DEFLATE, horizontal predictor) and the autotest strategy of
pinning rasters by checksum (gcore/checksum — core/checksum.py twin).
"""

import numpy as np
import pytest

from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster
from gdal_spark.sources.geotiff import read_gtiff, read_ifd, write_gtiff


def _arr(dtype, shape=(40, 56)):
    rng = np.random.default_rng(17)
    if np.dtype(dtype).kind == "f":
        return rng.uniform(-100, 100, shape).astype(dtype)
    info = np.iinfo(dtype)
    return rng.integers(max(info.min, -1000), min(info.max, 1000),
                        shape).astype(dtype)


@pytest.mark.parametrize("dtype,tile,compression,predictor", [
    ("uint8", None, "none", 1),          # baseline strips
    ("int16", None, "deflate", 2),       # strips + deflate + predictor
    ("float64", 16, "none", 1),          # tiled
    ("int32", 16, "deflate", 1),         # tiled + deflate
    ("float32", None, "deflate", 1),
    ("uint16", 16, "none", 2),
])
def test_roundtrip_bit_exact(spark, tmp_path, dtype, tile, compression,
                             predictor):
    arr = _arr(dtype)
    path = str(tmp_path / "r.tif")
    write_gtiff(arr, path, tile=tile, compression=compression,
                predictor=predictor)
    tiles = read_gtiff(spark, path, tile=8)
    got = tiles_to_raster(tiles, tile=8)[:arr.shape[0], :arr.shape[1]]
    assert got.dtype == arr.dtype
    assert np.array_equal(got, arr)


def test_checksum_matches_fixture_path(spark, tmp_path):
    """read_gtiff must produce the same engine tiles (same checksums) as
    the driver-side raster_to_tiles fixture path it replaces."""
    from gdal_spark.raster.tiles import checksum_tiles
    arr = _arr("int32", (32, 32))
    path = str(tmp_path / "c.tif")
    write_gtiff(arr, path, tile=None, compression="deflate")
    a = {(r.tile_x, r.tile_y): r.checksum
         for r in checksum_tiles(read_gtiff(spark, path, tile=8),
                                 tile=8).collect()}
    b = {(r.tile_x, r.tile_y): r.checksum
         for r in checksum_tiles(
             raster_to_tiles(spark, arr, zoom=0, tile=8),
             tile=8).collect()}
    assert a == b and len(a) == 16


def test_geotransform_tags(tmp_path):
    arr = _arr("uint8", (16, 16))
    path = str(tmp_path / "g.tif")
    gt = (-180.0, 5.625, 0.0, 90.0, 0.0, -2.8125)
    write_gtiff(arr, path, geotransform=gt)
    info = read_ifd(path)
    assert info["geotransform"] == pytest.approx(gt)
    assert info["width"] == 16 and info["dtype"] == "uint8"


def test_reference_autotest_fixture_byte_tif(spark):
    """THE canonical autotest fixture: autotest/gcore/data/byte.tif must
    read to band checksum 4672 (autotest/gcore/tiff_read.py:45) with the
    canonical geotransform (440720, 60, 0, 3751320, 0, -60) —
    reference-parity straight through our IFD parse + strip decode +
    bit-exact checksum twin."""
    from gdal_spark.core.checksum import gdal_checksum
    path = "/root/reference/autotest/gcore/data/byte.tif"
    info = read_ifd(path)
    assert info["geotransform"] == pytest.approx(
        (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0))
    tiles = read_gtiff(spark, path, tile=20)
    arr = tiles_to_raster(tiles, tile=20)[:20, :20]
    assert int(gdal_checksum(arr)) == 4672


def test_reference_autotest_fixture_rgba_deflate(spark):
    """Multi-sample chunky decode: autotest/gcore/data/bug4468.tif (RGBA,
    DEFLATE, predictor=2) — band 1 checksum 2923
    (autotest/gcore/tiff_write.py test_tiff_write_105)."""
    from gdal_spark.core.checksum import gdal_checksum
    path = "/root/reference/autotest/gcore/data/bug4468.tif"
    tiles = read_gtiff(spark, path, tile=32)
    bands = {}
    for r in tiles.collect():
        if (r.tile_x, r.tile_y) == (0, 0):
            bands[r.band] = np.frombuffer(r.px, np.uint8).reshape(32, 32)
    assert set(bands) == {1, 2, 3, 4}
    assert int(gdal_checksum(bands[1])) == 2923


def test_distributed_sink_roundtrip(spark, tmp_path):
    """write_gtiff_tiles: tasks pwrite their own tile ranges into one
    preallocated tiled GeoTIFF; reading it back must reproduce the raster
    bit-exactly (absent tiles stay at fill)."""
    from gdal_spark.sources.geotiff import write_gtiff_tiles
    arr = _arr("float64", (40, 56))
    tiles = raster_to_tiles(spark, arr, zoom=0, tile=8)
    path = str(tmp_path / "sink.tif")
    write_gtiff_tiles(tiles, path, width=56, height=40, tile=8,
                      dtype="float64",
                      geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0))
    back = tiles_to_raster(read_gtiff(spark, path, tile=8),
                           tile=8)[:40, :56]
    assert np.array_equal(back, arr)
    info = read_ifd(path)
    assert info["layout"] == "tiled" and info["tile_w"] == 8


@pytest.mark.parametrize("compression", ["packbits", "lzw"])
def test_packbits_lzw_roundtrip(spark, tmp_path, compression):
    arr = _arr("uint8", (40, 56))
    path = str(tmp_path / f"{compression}.tif")
    write_gtiff(arr, path, compression=compression)
    got = tiles_to_raster(read_gtiff(spark, path, tile=8),
                          tile=8)[:40, :56]
    assert np.array_equal(got, arr)


def test_gdal_written_lzw_and_packbits_decode():
    """Cross-implementation parity for the LZW early-change timing and
    PackBits runs: strips/tiles written by the reference's own libtiff
    must decode (autotest/gcore/data/bug_gh_1439_update_lzw.tif uint16
    LZW; 3376.tif RGB PackBits tiles)."""
    from gdal_spark.sources.geotiff import _decode_block
    p = "/root/reference/autotest/gcore/data/bug_gh_1439_update_lzw.tif"
    info = read_ifd(p)
    assert info["compression"] == 5
    with open(p, "rb") as f:
        f.seek(info["offsets"][0])
        raw = f.read(info["counts"][0])
    arr = _decode_block(raw, info, 1, 4096)
    assert arr.shape == (1, 4096) and arr.dtype == np.uint16
    assert int(arr.max()) == 65492       # content decoded, not zeros
    p2 = "/root/reference/autotest/gcore/data/3376.tif"
    info2 = read_ifd(p2)
    assert info2["compression"] == 32773
    with open(p2, "rb") as f:
        f.seek(info2["offsets"][0])
        raw2 = f.read(info2["counts"][0])
    arr2 = _decode_block(raw2, info2, info2["tile_l"], info2["tile_w"])
    assert arr2.shape == (512, 512, 3) and int(arr2.max()) == 255


@pytest.mark.parametrize("fixture,checksum", [
    ("int16.tif", 4672), ("uint16.tif", 4672), ("int32.tif", 4672),
    ("uint32.tif", 4672), ("float32.tif", 4672), ("float64.tif", 4672),
    ("float32_minwhite.tif", 1),
])
def test_reference_checksum_battery(spark, fixture, checksum):
    """The gcore checksum battery (autotest/gcore/tiff_read.py:45 — every
    sample type renders the same 20x20 image, checksum 4672): each
    baseline-readable variant must reproduce its pinned checksum through
    our reader (big-endian and complex/packed-bit variants are outside
    the documented little-endian classic-TIFF scope)."""
    from gdal_spark.core.checksum import gdal_checksum
    path = f"/root/reference/autotest/gcore/data/{fixture}"
    tiles = read_gtiff(spark, path, tile=20)
    arr = tiles_to_raster(tiles, tile=20)[:20, :20]
    assert int(gdal_checksum(arr)) == checksum


@pytest.mark.parametrize("fixture", [
    "separate_tiled.tif", "seperate_strip.tif",
    "contig_tiled.tif", "contig_strip.tif",
])
def test_reference_partial_strip_planar_bigendian(spark, fixture):
    """The #1179 regression quartet (autotest/gcore/tiff_read.py:68-71):
    big-endian TIFFs with PARTIAL final strips/tiles, in both chunky and
    PlanarConfiguration=2 (band-per-block) layouts — band 2 must checksum
    to 15234 through the distributed reader."""
    from gdal_spark.core.checksum import gdal_checksum
    from gdal_spark.raster.tiles import decode_px
    path = f"/root/reference/autotest/gcore/data/{fixture}"
    info = read_ifd(path)
    rows = [r for r in read_gtiff(spark, path, tile=64).collect()
            if r.band == 2]
    xs = max(r.tile_x for r in rows) + 1
    ys = max(r.tile_y for r in rows) + 1
    big = np.zeros((ys * 64, xs * 64),
                   dtype=np.dtype(rows[0].dtype))
    for r in rows:
        big[r.tile_y * 64:(r.tile_y + 1) * 64,
            r.tile_x * 64:(r.tile_x + 1) * 64] = \
            decode_px(r.px, r.dtype, 64)
    arr = big[:info["height"], :info["width"]]
    assert int(gdal_checksum(arr)) == 15234


def test_tile_index_footprints(spark, tmp_path):
    """gdaltindex twin: footprint ring follows the geotransform through the
    pixel corners TL->TR->BR->BL (apps/gdaltindex_lib.cpp:1086-1110);
    north-up rasters (scale+tiepoint georeferencing)."""
    import numpy as np

    from gdal_spark.core import wkb
    from gdal_spark.sources.geotiff import tile_index, write_gtiff

    p1 = str(tmp_path / "a.tif")
    write_gtiff(np.zeros((10, 20), np.uint8), p1,
                geotransform=(100.0, 0.5, 0.0, 50.0, 0.0, -0.25))
    p2 = str(tmp_path / "b.tif")   # north-up only: ModelPixelScale +
    # Tiepoint cannot encode rotation (that needs ModelTransformation,
    # which the writer does not emit), so gt[2]/gt[4] stay 0
    write_gtiff(np.zeros((8, 8), np.uint8), p2,
                geotransform=(0.0, 1.25, 0.0, 0.0, 0.0, -0.75))
    rows = {r.location: r for r in tile_index(spark, [p1, p2]).collect()}
    a = rows[p1]
    assert (a.xmin, a.ymax) == (100.0, 50.0)
    assert (a.xmax, a.ymin) == (100.0 + 20 * 0.5, 50.0 - 10 * 0.25)
    ring = wkb.decode(bytes(a.geom)).rings[0]
    assert ring[0].tolist() == [100.0, 50.0]          # TL first
    assert ring[1].tolist() == [110.0, 50.0]          # then TR
    b = rows[p2]
    rb = wkb.decode(bytes(b.geom)).rings[0]
    assert rb[1].tolist() == [10.0, 0.0]              # TR: 8*gt1
    assert rb[3].tolist() == [0.0, -6.0]              # BL: 8*gt5
    assert b.xmax == 10.0 and b.ymin == -6.0


def test_bigtiff_read(spark):
    """BigTIFF (version 43, 8-byte offsets): golden checksum 4672 on
    byte_bigtiff_strip5lines.tif and the autotest strip-offset layouts."""
    import os

    import numpy as np
    import pytest as _pytest

    from gdal_spark.core.checksum import gdal_checksum
    from gdal_spark.raster.tiles import decode_px
    from gdal_spark.sources.geotiff import read_gtiff, read_ifd
    d = "/root/reference/autotest/gcore/data/"
    if not os.path.exists(d + "byte_bigtiff_strip5lines.tif"):
        _pytest.skip("reference fixtures absent")
    out = read_gtiff(spark, d + "byte_bigtiff_strip5lines.tif")
    t = out[0] if isinstance(out, tuple) else out
    full = np.zeros((20, 20))
    for r in t.collect():
        arr = decode_px(r.px, r.dtype, 256)
        full[:20, :20] = arr[:20, :20]
    assert gdal_checksum(full) == 4672
    # tiff_read.py pinned strip/tile offsets
    assert read_ifd(d + "bigtiff_four_strip_be_short.tif")["offsets"] \
        == [316, 317, 318, 319]
    assert read_ifd(d + "bigtiff_one_block_long8.tif")["offsets"] \
        == [272]
    assert read_ifd(d + "bigtiff_one_block_be_long8.tif")["offsets"] \
        == [272]
