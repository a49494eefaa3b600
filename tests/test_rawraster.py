"""ENVI / ESRI EHdr raw-binary raster drivers (frmts/raw/envidataset.cpp,
frmts/raw/ehdrdataset.cpp)."""

import numpy as np

from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster
from gdal_spark.sources.rawraster import (parse_envi_header, read_ehdr,
                                          read_envi, write_ehdr, write_envi)


def _demo(h, w, dtype="f8", seed=0):
    rng = np.random.RandomState(seed)
    if np.dtype(dtype).kind == "f":
        return (rng.randn(h, w) * 100).astype(dtype)
    info = np.iinfo(dtype)
    return rng.randint(info.min, info.max, (h, w)).astype(dtype)


def test_envi_bsq_roundtrip_multiband(spark, tmp_path):
    path = str(tmp_path / "cube.dat")
    b1, b2, b3 = (_demo(90, 75, "f4", s) for s in (1, 2, 3))
    tiles = raster_to_tiles(spark, b1, band=1, tile=32).unionByName(
        raster_to_tiles(spark, b2, band=2, tile=32)).unionByName(
        raster_to_tiles(spark, b3, band=3, tile=32))
    write_envi(tiles, path, samples=75, lines=90, bands=3, dtype="f4",
               tile=32, nodata=-1.0, map_info="UTM, 1, 1, 0, 0, 30, 30")
    meta = parse_envi_header(str(tmp_path / "cube.hdr"))
    assert meta["interleave"] == "bsq" and int(meta["bands"]) == 3
    assert meta["map info"].startswith("UTM")
    back, _ = read_envi(spark, path, tile=32)
    for b, arr in ((1, b1), (2, b2), (3, b3)):
        got = tiles_to_raster(back.where(f"band = {b}"), tile=32)
        np.testing.assert_array_equal(got[:90, :75], arr)


def test_envi_dtypes_and_hdr_entry(spark, tmp_path):
    for dtype in ("u1", "i2", "u2", "i4", "f8"):
        path = str(tmp_path / f"t_{dtype}.img")
        arr = _demo(40, 40, dtype)
        write_envi(raster_to_tiles(spark, arr, tile=16), path,
                   samples=40, lines=40, dtype=dtype, tile=16)
        # open via the .hdr sidecar too
        back, _ = read_envi(spark, str(tmp_path / f"t_{dtype}.hdr"), tile=16)
        got = tiles_to_raster(back, tile=16)
        assert got.dtype == np.dtype(dtype)
        np.testing.assert_array_equal(got[:40, :40], arr)


def test_envi_bil_bip_and_byteswap(spark, tmp_path):
    # hand-build BIL / BIP / big-endian files; reader must deinterleave
    h, w, nb = 13, 21, 2
    b1, b2 = _demo(h, w, "i2", 5), _demo(h, w, "i2", 6)
    cube = np.stack([b1, b2])                     # (band, row, col)
    for inter, order in [("bil", 0), ("bip", 0), ("bsq", 1)]:
        raw = str(tmp_path / f"x_{inter}_{order}.dat")
        if inter == "bil":
            blob = cube.transpose(1, 0, 2)        # (row, band, col)
        elif inter == "bip":
            blob = cube.transpose(1, 2, 0)        # (row, col, band)
        else:
            blob = cube
        data = blob.astype(">i2" if order else "<i2").tobytes()
        with open(raw, "wb") as f:
            f.write(b"\x00" * 7)                  # header offset 7
            f.write(data)
        with open(raw + ".hdr", "w") as f:
            f.write("ENVI\nsamples = %d\nlines = %d\nbands = %d\n"
                    "header offset = 7\ndata type = 2\n"
                    "interleave = %s\nbyte order = %d\n"
                    % (w, h, nb, inter, order))
        back, meta = read_envi(spark, raw, tile=8)
        for b, arr in ((1, b1), (2, b2)):
            got = tiles_to_raster(back.where(f"band = {b}"), tile=8)
            np.testing.assert_array_equal(got[:h, :w], arr,
                                          err_msg=f"{inter} order={order}")


def test_ehdr_roundtrip_and_nodata(spark, tmp_path):
    path = str(tmp_path / "dem.bil")
    arr = _demo(64, 48, "f4", 9)
    arr[5, 7] = -9999.0
    write_ehdr(raster_to_tiles(spark, arr, tile=32, nodata=-9999.0), path,
               samples=48, lines=64, dtype="f4", tile=32,
               ulx=100.0, uly=200.0, dx=0.5, dy=0.5, nodata=-9999.0)
    hdr = (tmp_path / "dem.hdr").read_text()
    assert "PIXELTYPE FLOAT" in hdr and "NBITS 32" in hdr
    back, meta = read_ehdr(spark, path, tile=32)
    assert float(meta["NODATA"]) == -9999.0
    got = tiles_to_raster(back, tile=32)
    np.testing.assert_array_equal(got[:64, :48], arr)
    # nodata propagates onto the tile table
    assert back.where("nodata = -9999.0").count() == back.count()


def test_bmp_8bit_roundtrip_palette(spark, tmp_path):
    from gdal_spark.sources.bmp import parse_bmp_header, read_bmp, write_bmp
    arr = (_demo(50, 33, "f8", 11) % 256).astype("u1").astype("f8")
    path = str(tmp_path / "g.bmp")
    pal = np.stack([np.arange(256), 255 - np.arange(256),
                    np.arange(256) // 2], axis=1).astype(np.uint8)
    write_bmp(raster_to_tiles(spark, arr, tile=16), path,
              width=33, height=50, tile=16, palette=pal)
    m = parse_bmp_header(path)
    assert m["width"] == 33 and m["height"] == 50 and m["bpp"] == 8
    np.testing.assert_array_equal(m["palette"], pal)
    back, _ = read_bmp(spark, path, tile=16)
    got = tiles_to_raster(back, tile=16)
    np.testing.assert_array_equal(got[:50, :33].astype("f8"), arr)


def test_bmp_24bit_roundtrip(spark, tmp_path):
    from gdal_spark.sources.bmp import read_bmp, write_bmp
    path = str(tmp_path / "rgb.bmp")
    chans = [(_demo(40, 37, "f8", s) % 256).astype("u1") for s in (1, 2, 3)]
    tiles = None
    for b, ch in enumerate(chans, start=1):
        t = raster_to_tiles(spark, ch.astype("f8"), band=b, tile=16)
        tiles = t if tiles is None else tiles.unionByName(t)
    write_bmp(tiles, path, width=37, height=40, bands=3, tile=16)
    back, m = read_bmp(spark, path, tile=16)
    assert m["bpp"] == 24
    for b, ch in enumerate(chans, start=1):
        got = tiles_to_raster(back.where(f"band = {b}"), tile=16)
        np.testing.assert_array_equal(got[:40, :37], ch)


def test_pnm_p5_p6_p2_roundtrip(spark, tmp_path):
    from gdal_spark.sources.pnm import parse_pnm_header, read_pnm, write_pnm
    # P5 8-bit
    arr = (_demo(45, 31, "f8", 4) % 256).astype("u1")
    p5 = str(tmp_path / "g.pgm")
    write_pnm(raster_to_tiles(spark, arr.astype("f8"), tile=16), p5,
              width=31, height=45, tile=16)
    assert parse_pnm_header(p5)[0] == "P5"
    back, m = read_pnm(spark, p5, tile=16)
    np.testing.assert_array_equal(
        tiles_to_raster(back, tile=16)[:45, :31], arr)
    # P5 16-bit (big-endian samples)
    a16 = (_demo(20, 22, "f8", 5) % 60000).astype("u2")
    p16 = str(tmp_path / "g16.pgm")
    write_pnm(raster_to_tiles(spark, a16.astype("f8"), tile=16), p16,
              width=22, height=20, maxval=65535, tile=16)
    back16, _ = read_pnm(spark, p16, tile=16)
    got16 = tiles_to_raster(back16, tile=16)
    assert got16.dtype == np.dtype("u2")
    np.testing.assert_array_equal(got16[:20, :22], a16)
    # P6 RGB
    chans = [(_demo(18, 25, "f8", s) % 256).astype("u1") for s in (6, 7, 8)]
    tiles = None
    for b, ch in enumerate(chans, start=1):
        t = raster_to_tiles(spark, ch.astype("f8"), band=b, tile=16)
        tiles = t if tiles is None else tiles.unionByName(t)
    p6 = str(tmp_path / "rgb.ppm")
    write_pnm(tiles, p6, width=25, height=18, bands=3, tile=16)
    back6, _ = read_pnm(spark, p6, tile=16)
    for b, ch in enumerate(chans, start=1):
        np.testing.assert_array_equal(
            tiles_to_raster(back6.where(f"band = {b}"), tile=16)[:18, :25],
            ch)
    # P2 ascii with comment
    (tmp_path / "a.pgm").write_text(
        "P2\n# comment line\n3 2\n255\n1 2 3\n4 5 6\n")
    backa, ma = read_pnm(spark, str(tmp_path / "a.pgm"), tile=8)
    assert ma["magic"] == "P2"
    np.testing.assert_array_equal(
        tiles_to_raster(backa, tile=8)[:2, :3],
        np.array([[1, 2, 3], [4, 5, 6]], dtype="u1"))


def test_dted_roundtrip_signed_magnitude(spark, tmp_path):
    from gdal_spark.sources.dted import (parse_dted_header, read_dted,
                                         write_dted)
    # elevations incl. negatives (signed-magnitude storage)
    arr = (_demo(40, 28, "f8", 12) % 4000 - 500).astype("i4").astype("f8")
    path = str(tmp_path / "cell.dt1")
    write_dted(raster_to_tiles(spark, arr, tile=16), path,
               ncols=28, nrows=40, lon0=-77.0, lat0=38.0, tile=16)
    m = parse_dted_header(path)
    assert m["ncols"] == 28 and m["nrows"] == 40
    assert m["lon0"] == -77.0 and m["lat0"] == 38.0
    back, _ = read_dted(spark, path, tile=16)
    got = tiles_to_raster(back, tile=16)
    assert (got < 0).any()
    np.testing.assert_array_equal(got[:40, :28].astype("f8"), arr)


def test_dted_record_byte_layout_matches_dted_api(spark, tmp_path):
    """Pin the data-record layout of dted_api.c: sentinel 0252 (octal) =
    0xAA at byte 0, 3-byte big-endian block count, big-endian
    signed-magnitude samples, 4-byte arithmetic checksum trailer."""
    from gdal_spark.sources.dted import _DATA_OFF, _rec_size, write_dted
    nrows, ncols = 8, 4
    arr = np.arange(nrows * ncols, dtype="f8").reshape(nrows, ncols) - 5
    path = str(tmp_path / "layout.dt0")
    write_dted(raster_to_tiles(spark, arr, tile=16), path,
               ncols=ncols, nrows=nrows, lon0=10.0, lat0=20.0, tile=16)
    rec = _rec_size(nrows)
    blob = open(path, "rb").read()
    for col in range(ncols):
        r = blob[_DATA_OFF + col * rec: _DATA_OFF + (col + 1) * rec]
        assert r[0] == 0xAA                       # NOT decimal 252
        assert int.from_bytes(r[1:4], "big") == col
        # last sample of the column = north-most row, south->north storage
        samp = np.frombuffer(r[8:8 + 2 * nrows], ">u2")
        vals = np.where(samp & 0x8000, -(samp & 0x7FFF).astype("i4"),
                        (samp & 0x7FFF).astype("i4"))
        np.testing.assert_array_equal(vals, arr[::-1, col].astype("i4"))
        csum = int.from_bytes(r[-4:], "big")
        assert csum == sum(r[:-4]) & 0xFFFFFFFF


def test_truncated_raw_keeps_partial_item_bytes(spark, tmp_path):
    """A raw file cut mid-item decodes the partial last sample from its
    already-read bytes zero-filled to item width (GDAL RawRasterBand
    keeps the short read and memsets only the remainder), not as 0."""
    path = str(tmp_path / "cut.img")
    arr = np.arange(16, dtype="<i2").reshape(4, 4) + 1000
    write_envi(raster_to_tiles(spark, arr, tile=4), path,
               samples=4, lines=4, dtype="i2", tile=4)
    with open(path, "r+b") as f:
        f.truncate(16 * 2 - 1)            # drop the LAST byte (high byte)
    back, _ = read_envi(spark, path, tile=4)
    got = tiles_to_raster(back, tile=4)[:4, :4]
    np.testing.assert_array_equal(got.ravel()[:15], arr.ravel()[:15])
    # little-endian i2 with high byte zero-filled = low byte value
    assert got[3, 3] == (1015 & 0xFF)
