"""Baseline JPEG codec (sources/jpeg.py) vs the reference's libjpeg
semantics (frmts/jpeg/jpgdataset.cpp; autotest/gdrivers/jpeg.py)."""

import numpy as np
import pytest

from gdal_spark.core.checksum import gdal_checksum
from gdal_spark.sources.jpeg import (decode_jpeg, encode_jpeg,
                                     h2v1_fancy_upsample,
                                     h2v2_fancy_upsample, idct_islow)

ALBANIA = "/root/reference/autotest/gdrivers/data/jpeg/albania.jpg"


def test_albania_decodes_bit_exact_vs_libjpeg():
    """autotest/gdrivers/jpeg.py test_jpeg_1 pins band 2 of albania.jpg
    at checksum 17016 (libjpeg-turbo / IJG 6b integer decode path).
    Bit-exactness here certifies the whole chain: Huffman -> dequant ->
    jpeg_idct_islow -> h2v2 fancy upsample -> fixed-point YCbCr->RGB."""
    data = open(ALBANIA, "rb").read()
    arr, meta = decode_jpeg(data)
    assert meta["width"] == 361 and meta["height"] == 260
    assert arr.shape == (260, 361, 3)
    assert gdal_checksum(arr[:, :, 1].astype(np.float64)) == 17016
    # the sibling bands, pinned at first green decode for regression
    assert gdal_checksum(arr[:, :, 0].astype(np.float64)) == 61830
    assert gdal_checksum(arr[:, :, 2].astype(np.float64)) == 20715


def _h2v2_scalar(c):
    """Direct transliteration of the jdsample.c scalar loop (oracle)."""
    h, w = c.shape
    out = np.zeros((2 * h, 2 * w), np.int64)
    for outy in range(2 * h):
        near = outy // 2
        far = near - 1 if outy % 2 == 0 else near + 1
        far = min(max(far, 0), h - 1)
        colsum = 3 * c[near].astype(np.int64) + c[far]
        row = []
        row.append((colsum[0] * 4 + 8) >> 4)
        row.append((colsum[0] * 3 + colsum[min(1, w - 1)] + 7) >> 4)
        for x in range(1, w - 1):
            row.append((colsum[x] * 3 + colsum[x - 1] + 8) >> 4)
            row.append((colsum[x] * 3 + colsum[x + 1] + 7) >> 4)
        if w > 1:
            row.append((colsum[w - 1] * 3 + colsum[w - 2] + 8) >> 4)
            row.append((colsum[w - 1] * 4 + 7) >> 4)
        out[outy, :] = row[:2 * w]
    return out


def test_h2v2_fancy_upsample_matches_scalar_loop():
    rng = np.random.RandomState(0)
    c = rng.randint(0, 256, (9, 13)).astype(np.uint8)
    np.testing.assert_array_equal(h2v2_fancy_upsample(c),
                                  _h2v2_scalar(c))


def test_h2v1_fancy_upsample_edges():
    c = np.array([[10, 200, 30, 99]], np.uint8)
    out = h2v1_fancy_upsample(c)
    assert out[0, 0] == 10 and out[0, -1] == 99
    assert out[0, 1] == (3 * 10 + 200 + 2) >> 2
    assert out[0, 2] == (3 * 200 + 10 + 1) >> 2


def test_idct_islow_dc_only_and_vs_float():
    blocks = np.zeros((1, 8, 8), np.int32)
    blocks[0, 0, 0] = 80          # DC-only: flat 80/8 + 128
    out = idct_islow(blocks)
    assert (out == out[0, 0, 0]).all()
    assert abs(int(out[0, 0, 0]) - (80 // 8 + 128)) <= 1
    # vs the float inverse transform on random coefficients
    rng = np.random.RandomState(1)
    co = rng.randint(-200, 200, (4, 8, 8)).astype(np.int32)
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    a = np.where(n == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))
    basis = a[:, None] * c
    ref = np.einsum("ux,nuv,vy->nxy", basis, co.astype(np.float64), basis)
    got = idct_islow(co).astype(np.float64)
    want = np.clip(ref + 128, 0, 255)
    assert np.abs(got - want).max() <= 1.0


@pytest.mark.parametrize("shape,sub", [
    ((64, 64), None),              # grayscale
    ((40, 56, 3), "4:4:4"),
    ((40, 56, 3), "4:2:0"),
    ((33, 41, 3), "4:2:0"),        # odd sizes exercise MCU padding
])
def test_encode_decode_roundtrip(shape, sub):
    rng = np.random.RandomState(7)
    # smooth-ish content (random noise is the JPEG worst case)
    base = rng.randint(0, 255, [s // 8 + 1 for s in shape[:2]])
    yy = np.linspace(0, base.shape[0] - 1, shape[0])
    xx = np.linspace(0, base.shape[1] - 1, shape[1])
    smooth = base[yy.astype(int)][:, xx.astype(int)].astype(np.float64)
    if len(shape) == 3:
        arr = np.stack([np.clip(smooth + 10 * b, 0, 255)
                        for b in range(3)], axis=2).astype(np.uint8)
        blob = encode_jpeg(arr, quality=92, subsampling=sub)
    else:
        arr = smooth.astype(np.uint8)
        blob = encode_jpeg(arr, quality=92)
    back, meta = decode_jpeg(blob)
    assert back.shape == arr.shape
    assert meta["width"] == shape[1] and meta["height"] == shape[0]
    err = np.abs(back.astype(np.float64) - arr.astype(np.float64))
    # blockwise-constant content survives quantization nearly exactly
    assert err.mean() < 4.0, err.mean()
    assert np.percentile(err, 95) < 12.0


def test_encoder_is_deterministic():
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    assert encode_jpeg(arr, 75) == encode_jpeg(arr, 75)


def test_quality_knob_changes_size():
    rng = np.random.RandomState(4)
    arr = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    assert len(encode_jpeg(arr, 30)) < len(encode_jpeg(arr, 95))


def test_jpeg_in_tiff_pinned_checksums():
    """Compression=7 with JPEGTables (TTN2 abbreviated streams) through
    the GTiff reader: autotest pins byte_jpg_unusual_jpegtable.tif at
    4771 (tiff_write.py test_tiff_write_130) and every
    byte_ovr_jpeg_tablesmode{0..3}.tif at 4743
    (tiff_read.py test_tiff_read_jpeg_cloud_optimized)."""
    from gdal_spark.sources.geotiff import _decode_block, read_ifd

    def cs(path):
        info = read_ifd(path)
        assert info["compression"] == 7
        with open(path, "rb") as f:
            f.seek(info["offsets"][0])
            raw = f.read(info["counts"][0])
        h = min(info.get("tile_l", info.get("rows_per_strip",
                                            info["height"])),
                info["height"])
        arr = _decode_block(raw, info, h,
                            info.get("tile_w", info["width"]))
        return gdal_checksum(np.asarray(arr).astype(np.float64))

    base = "/root/reference/autotest/gcore/data/"
    assert cs(base + "byte_jpg_unusual_jpegtable.tif") == 4771
    for i in range(4):
        assert cs(base + f"byte_ovr_jpeg_tablesmode{i}.tif") == 4743, i
