"""Erdas Imagine HFA driver — reference autotest golden checksums
(autotest/gdrivers/hfa.py: int.img 6691, float.img 23529, spill.img
1631 incl. the .ige spill path), the dictionary engine over real
Imagine dictionaries, ESRI GRID decompression, and the writer round
trip."""

import os

import numpy as np
import pandas as pd
import pytest

from gdal_spark.core.checksum import gdal_checksum
from gdal_spark.raster.tiles import TILE_SCHEMA, decode_px, encode_px
from gdal_spark.sources.hfa import HFAFile, read_hfa, write_hfa

FIXDIR = "/root/reference/autotest/gdrivers/data/hfa"

pytestmark = pytest.mark.skipif(not os.path.isdir(FIXDIR),
                                reason="reference fixtures absent")


def _assemble(spark, path, band=1):
    h = HFAFile(path)
    info = h.layer_info(h.layers[band - 1])
    W, H, bw, bh = (info["width"], info["height"], info["bw"],
                    info["bh"])
    tiles, _ = read_hfa(spark, path)
    full = np.zeros((H, W), np.float64)
    for r in tiles.where(f"band = {band}").collect():
        arr = decode_px(r.px, r.dtype, bw)
        y0, x0 = r.tile_y * bh, r.tile_x * bw
        hh, ww = min(bh, H - y0), min(bw, W - x0)
        full[y0:y0 + hh, x0:x0 + ww] = arr[:hh, :ww]
    return h, full


@pytest.mark.parametrize("name,checksum", [
    ("int.img", 6691),           # ESRI GRID RLE, s32
    ("float.img", 23529),        # ESRI GRID RLE, f32 bit-reinterpret
    ("spill.img", 1631),         # uncompressed via .ige spill file
])
def test_reference_golden_checksums(spark, name, checksum):
    _h, full = _assemble(spark, os.path.join(FIXDIR, name))
    assert gdal_checksum(full) == checksum


def test_float_pixel_value(spark):
    _h, full = _assemble(spark, os.path.join(FIXDIR, "float.img"))
    assert full[100, 100] == pytest.approx(41.021659851074219,
                                           abs=0.0001)


def test_int_geotransform():
    h = HFAFile(os.path.join(FIXDIR, "int.img"))
    gt = h.geotransform()
    assert gt == (135362.5, 100.0, 0.0, 7122712.5, 0.0, -100.0)


@pytest.mark.parametrize("name", [
    "small1bit.img", "dem10.img", "87test.img", "i8u_c_i.img",
    "bug_1109.img",
])
def test_fixture_variants_parse_and_read(spark, name):
    h = HFAFile(os.path.join(FIXDIR, name))
    assert h.layers
    info = h.layer_info(h.layers[0])
    assert info["width"] > 0 and info["height"] > 0
    tiles, _ = read_hfa(spark, os.path.join(FIXDIR, name))
    assert tiles.count() > 0


def test_dictionary_parser_grammar():
    from gdal_spark.sources.hfa import parse_dictionary
    t = parse_dictionary(
        "{1:lwidth,1:e2:a,b,kind,0:pcname,1:*oPair,pt,}Thing,"
        "{1:dx,1:dy,}Pair,")
    assert set(t) == {"Thing", "Pair"}
    f = t["Thing"]
    assert [x.name for x in f] == ["width", "kind", "name", "pt"]
    assert f[1].enums == ["a", "b"]
    assert f[3].pointer == "*" and f[3].objname == "Pair"


def test_write_read_roundtrip_exact(spark, tmp_path):
    W, H, t = 100, 90, 32
    rng = np.random.RandomState(7)
    full = rng.randint(-5000, 5000, size=(H, W)).astype(np.int32)
    rows = []
    for ty in range(-(-H // t)):
        for tx in range(-(-W // t)):
            blk = np.zeros((t, t), np.int32)
            sub = full[ty * t:(ty + 1) * t, tx * t:(tx + 1) * t]
            blk[:sub.shape[0], :sub.shape[1]] = sub
            rows.append((1, 0, tx, ty, "i4", None, encode_px(blk)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in TILE_SCHEMA.fields]),
        TILE_SCHEMA)
    path = str(tmp_path / "rt.img")
    write_hfa(df, path, W, H, tile=t, pixel_type=8,
              gt=(500000.0, 10.0, 0.0, 4000000.0, 0.0, -10.0))
    h = HFAFile(path)
    assert h.geotransform() == (500000.0, 10.0, 0.0, 4000000.0, 0.0,
                                -10.0)
    tiles, _ = read_hfa(spark, path)
    back = np.zeros((H, W), np.float64)
    for r in tiles.collect():
        arr = decode_px(r.px, r.dtype, t)
        y0, x0 = r.tile_y * t, r.tile_x * t
        hh, ww = min(t, H - y0), min(t, W - x0)
        back[y0:y0 + hh, x0:x0 + ww] = arr[:hh, :ww]
    assert np.array_equal(back.astype(np.int32), full)


def test_raster_attribute_table_histogram():
    from gdal_spark.sources.hfa import read_rat
    rat = read_rat(os.path.join(FIXDIR, "int.img"))
    assert "Histogram" in rat
    h = rat["Histogram"]
    assert len(h) == 217
    assert h[:5].tolist() == [1.0, 5.0, 9.0, 10.0, 14.0]
    bins = rat["__bins__"]
    assert bins["numBins"] == 217
    assert bins["minLimit"] == 40918.0 and bins["maxLimit"] == 41134.0


def test_rat_histogram_matches_decoded_pixels(spark):
    """The stored descriptor-table histogram of utmsmall.img equals the
    histogram of the decoded pixels in every bin except bin 0 (Imagine
    excluded the two 0-valued pixels when it computed statistics)."""
    from gdal_spark.sources.hfa import read_rat
    path = "/root/reference/autotest/gcore/data/utmsmall.img"
    if not os.path.exists(path):
        pytest.skip("gcore fixture absent")
    _h, full = _assemble(spark, path)
    mine = np.bincount(full.astype(int).ravel(), minlength=256)
    rat = read_rat(path)["Histogram"]
    assert np.array_equal(mine[1:], rat[1:].astype(int))
    assert rat[0] == 0 and mine[0] == 2


def test_multi_gb_img_opens_with_bounded_metadata_reads(spark, tmp_path):
    """Round-5 scale contract: a >4 GiB .img opens driver-side through
    vsi.PagedReader — the node tree + dictionary + block table walk is
    pread-bounded (header + block-table pages only)."""
    import pandas as pd
    from gdal_spark.raster.tiles import TILE_SCHEMA, encode_px
    path = str(tmp_path / "big.img")
    # 28672 x 16384 f64 = 3.5 GiB of pixel blocks (sparse on disk) —
    # classic HFA offsets are u32, so a single .img caps at 4 GiB
    # (bigger rasters spill to .ige, same pread path)
    tiles = spark.createDataFrame(
        pd.DataFrame([(1, 0, 0, 0, "float64", None,
                       encode_px(np.full((64, 64), 7.0)))],
                     columns=[f.name for f in TILE_SCHEMA.fields]),
        TILE_SCHEMA)
    write_hfa(tiles, path, 28672, 16384, tile=64, pixel_type=10)
    assert os.path.getsize(path) >= 3.5 * 1024 ** 3
    hfa = HFAFile(path)
    assert len(hfa.layers) == 1
    info = hfa.layer_info(hfa.layers[0])
    assert (info["width"], info["height"]) == (28672, 16384)
    assert len(info["blocks"]) == 448 * 256
    # block table is ~7 MB of node data; the walk must stay in that
    # order of magnitude, never the 4 GiB file
    assert hfa.buf.bytes_fetched < 32 * 1024 * 1024
