"""NITF 2.1: autotest fixture checksum pin, header walk, IMODE
layouts, write/read roundtrip."""

import numpy as np
import pytest

from gdal_spark.core.checksum import gdal_checksum
from gdal_spark.raster.tiles import TILE_SCHEMA, decode_px, encode_px
from gdal_spark.sources import nitf as N

RGB = "/root/reference/autotest/gdrivers/data/nitf/rgb.ntf"


def _assemble(t, m, band):
    ts = m["tile"]
    img = np.zeros((m["height"], m["width"]))
    for r in t.where(f"band = {band}").collect():
        arr = decode_px(r.px, r.dtype, ts)
        y0, x0 = r.tile_y * ts, r.tile_x * ts
        h = min(ts, m["height"] - y0)
        w = min(ts, m["width"] - x0)
        img[y0:y0 + h, x0:x0 + w] = arr[:h, :w]
    return img


def test_rgb_fixture_checksum(spark):
    # autotest/gdrivers/nitf.py:375 — band 3 checksum 21349
    t, m = N.read_nitf(spark, RGB)
    assert (m["width"], m["height"], m["bands"]) == (50, 50, 3)
    assert m["imode"] == "B"
    assert m["igeolo"].startswith("225557S0445025W")
    assert gdal_checksum(_assemble(t, m, 3)) == 21349


def test_header_walk_matches_lish():
    data = open(RGB, "rb").read()
    hdr = N.parse_nitf_header(data)
    sub = N.parse_image_subheader(data, hdr["hl"])
    # field walk may stop short of writer padding, never long
    assert sub["subheader_end"] <= hdr["hl"] + hdr["segments"][0][0]
    assert sub["nbands"] == 3 and sub["ic"] == "NC"


def test_roundtrip_multiblock(spark, tmp_path):
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (40, 56)).astype(np.float64)
    rows = []
    for ty in range(3):
        for tx in range(4):
            blk = np.zeros((16, 16))
            sub = img[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
            blk[:sub.shape[0], :sub.shape[1]] = sub
            rows.append((1, 0, tx, ty, "f8", None, bytes(encode_px(blk))))
    t = spark.createDataFrame(rows, TILE_SCHEMA)
    p = str(tmp_path / "o.ntf")
    N.write_nitf(t, p, width=56, height=40, tile=16, dtype="u1")
    back, m = N.read_nitf(spark, p)
    assert m["imode"] == "B" and m["tile"] == 16
    got = _assemble(back, m, 1)
    assert np.array_equal(got, img)


def test_jp2_in_nitf_golden_checksums(spark):
    """IC=C8 (JPEG 2000 codestream segment): the three band checksums
    pinned by the reference across JP2MrSID/JP2KAK/JP2OpenJPEG
    (autotest/gdrivers/nitf.py nitf_check_created_file for
    test_jp2_ecw33.ntf: 32398/42502/38882) — bit-exact through the
    from-scratch T.800 decoder."""
    t, m = N.read_nitf(
        spark,
        "/root/reference/autotest/gdrivers/data/nitf/test_jp2_ecw33.ntf")
    assert m["ic"] == "C8"
    assert (m["width"], m["height"], m["bands"]) == (200, 100, 3)
    rows = t.collect()
    for band, want in ((1, 32398), (2, 42502), (3, 38882)):
        img = np.zeros((m["height"], m["width"]))
        for r in rows:
            if r.band != band:
                continue
            arr = decode_px(r.px, r.dtype, m["tile"])
            y0, x0 = r.tile_y * m["tile"], r.tile_x * m["tile"]
            h = min(m["tile"], m["height"] - y0)
            w = min(m["tile"], m["width"] - x0)
            img[y0:y0 + h, x0:x0 + w] = arr[:h, :w]
        assert gdal_checksum(img) == want, f"band {band}"
