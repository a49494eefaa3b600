"""GeoPackage reader/writer round-trips.

Reference semantics: /root/reference/ogr/ogrsf_frmts/gpkg/
ogrgeopackagetablelayer.cpp (layer discovery via gpkg_geometry_columns,
GeoPackageBinary header decode per OGC 12-128r15 §2.1.3), mirroring
autotest/ogr/ogr_gpkg.py's write-then-read strategy.
"""

import numpy as np
import pytest

from gdal_spark.core import wkb
from gdal_spark.sources.gpkg import (gpb_to_wkb, list_layers, read_gpkg,
                                     wkb_to_gpb, write_gpkg)


def test_gpb_codec_roundtrip():
    g = wkb.encode(wkb.Geom(wkb.POINT, [np.array([[5.5, -2.25]])]))
    blob = wkb_to_gpb(g, srs_id=4326)
    back, srs = gpb_to_wkb(blob)
    assert back == g and srs == 4326


def test_points_roundtrip_with_attrs(spark, tmp_path):
    path = str(tmp_path / "pts.gpkg")
    rows = [(wkb.encode(wkb.Geom(wkb.POINT,
                                 [np.array([[i * 1.5, -i * 0.5]])])),
             {"name": f"p{i}", "rank": i, "score": i / 3.0})
            for i in range(40)]
    write_gpkg(rows, path, table="pts", geometry_type="POINT")
    assert list_layers(path) == [("pts", "geom", 4326)]
    out = read_gpkg(spark, path, rows_per_task=7).collect()
    assert len(out) == 40
    by = {r.rank: r for r in out}
    for i in range(40):
        g = wkb.decode(bytes(by[i].geom))
        assert g.rings[0][0][0] == pytest.approx(i * 1.5)
        assert by[i].name == f"p{i}"
        assert by[i].score == pytest.approx(i / 3.0)


def test_polygon_and_null_geometry(spark, tmp_path):
    path = str(tmp_path / "poly.gpkg")
    shell = np.array([[0, 0], [8, 0], [8, 6], [0, 6], [0, 0]], np.float64)
    rows = [(wkb.encode(wkb.Geom(wkb.POLYGON, [shell])), {"k": 1}),
            (None, {"k": 2})]
    write_gpkg(rows, path, table="polys", geometry_type="POLYGON")
    out = sorted(read_gpkg(spark, path).collect(), key=lambda r: r.k)
    from gdal_spark.core.geomops import geom_area
    assert geom_area(wkb.decode(bytes(out[0].geom))) == pytest.approx(48.0)
    assert out[1].geom is None


def test_reference_autotest_fixture_poly_golden(spark):
    """autotest/ogr/data/gpkg/poly_golden.gpkg — the GPKG rendering of the
    canonical poly fixture (autotest/ogr/ogr_gpkg.py golden file): 10
    EPSG:27700 polygons whose shoelace areas match their AREA attributes,
    with envelope-carrying GPB headers (flags=3) decoded correctly."""
    from gdal_spark.core.geomops import geom_area
    path = "/root/reference/autotest/ogr/data/gpkg/poly_golden.gpkg"
    assert list_layers(path) == [("poly", "geom", 27700)]
    rows = sorted(read_gpkg(spark, path).collect(), key=lambda r: r.fid)
    assert len(rows) == 10
    for r in rows:
        area = geom_area(wkb.decode(bytes(r.geom)))
        assert area == pytest.approx(abs(float(r.AREA)), rel=1e-3)
    got = [int(r.EAS_ID) for r in rows if r.EAS_ID < 170]
    assert got == [168, 169, 166, 158, 165]


def test_gpkg_raster_tiles_roundtrip(spark, tmp_path):
    """GeoPackage tile pyramid (OGC 12-128r15 §2.2; reference
    gdalgeopackagerasterband.cpp): engine tiles -> PNG blobs in the
    tile_matrix user table -> parallel rowid-range read back."""
    import sqlite3

    from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster
    from gdal_spark.sources.gpkg import read_gpkg_tiles, write_gpkg_tiles

    rng = np.random.RandomState(5)
    arr = rng.randint(0, 255, (64, 64)).astype("u1")
    path = str(tmp_path / "r.gpkg")
    n = write_gpkg_tiles(raster_to_tiles(spark, arr.astype("f8"),
                                         tile=16), path, tile=16, zoom=2)
    assert n == 16
    con = sqlite3.connect(path)
    assert con.execute("SELECT data_type FROM gpkg_contents") \
        .fetchone()[0] == "tiles"
    assert con.execute("SELECT matrix_width, tile_width FROM "
                       "gpkg_tile_matrix").fetchone() == (4, 16)
    # blobs really are PNGs
    blob = con.execute("SELECT tile_data FROM tiles LIMIT 1").fetchone()[0]
    assert bytes(blob[:8]) == b"\x89PNG\r\n\x1a\n"
    con.close()

    back, meta = read_gpkg_tiles(spark, path, tile=16, rows_per_task=3)
    assert meta["table"] == "tiles"
    got = tiles_to_raster(back, tile=16)
    np.testing.assert_array_equal(got[:64, :64], arr)


def test_gpkg_raster_tiles_rgb(spark, tmp_path):
    from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster
    from gdal_spark.sources.gpkg import read_gpkg_tiles, write_gpkg_tiles

    rng = np.random.RandomState(6)
    chans = [rng.randint(0, 255, (32, 48)).astype("u1") for _ in range(3)]
    tiles = None
    for b, ch in enumerate(chans, start=1):
        t = raster_to_tiles(spark, ch.astype("f8"), band=b, tile=16)
        tiles = t if tiles is None else tiles.unionByName(t)
    path = str(tmp_path / "rgb.gpkg")
    write_gpkg_tiles(tiles, path, tile=16, zoom=2)
    back, _ = read_gpkg_tiles(spark, path, tile=16)
    for b, ch in enumerate(chans, start=1):
        got = tiles_to_raster(back.where(f"band = {b}"), tile=16)
        np.testing.assert_array_equal(got[:32, :48], ch)


def test_mbtiles_roundtrip_tms_flip(spark, tmp_path):
    """MBTiles 1.3 (frmts/mbtiles): TMS row flip on write, un-flip on
    read; metadata table round-trips."""
    import sqlite3

    from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster
    from gdal_spark.sources.gpkg import read_mbtiles, write_mbtiles

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 255, (64, 64)).astype("u1")
    path = str(tmp_path / "t.mbtiles")
    n = write_mbtiles(raster_to_tiles(spark, arr.astype("f8"), tile=16),
                      path, tile=16, zoom=2, name="demo")
    assert n == 16
    con = sqlite3.connect(path)
    meta = dict(con.execute("SELECT name, value FROM metadata"))
    assert meta["name"] == "demo" and meta["format"] == "png"
    # XYZ tile (0, 0) (top-left) stored as TMS row 3
    top = con.execute("SELECT tile_row FROM tiles WHERE tile_column=0 "
                      "ORDER BY tile_row DESC LIMIT 1").fetchone()[0]
    assert top == 3
    con.close()
    back, m2 = read_mbtiles(spark, path, tile=16, rows_per_task=5)
    assert m2["maxzoom"] == "2"
    got = tiles_to_raster(back, tile=16)
    np.testing.assert_array_equal(got[:64, :64], arr)


def test_mbtiles_multizoom_pyramid(spark, tmp_path):
    """gdaladdo semantics: the whole pyramid in one MBTiles archive
    (zoom=None multi-level mode); every level reads back at its zoom."""
    import sqlite3

    from gdal_spark.raster.pyramid import build_pyramid
    from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster
    from gdal_spark.sources.gpkg import read_mbtiles, write_mbtiles

    arr = np.full((64, 64), 8.0)
    base = raster_to_tiles(spark, arr, zoom=2, tile=16)
    pyr = build_pyramid(base, levels=2, resampling="average", tile=16)
    path = str(tmp_path / "pyr.mbtiles")
    n = write_mbtiles(pyr, path, tile=16, zoom=None)
    assert n == 16 + 4 + 1
    con = sqlite3.connect(path)
    meta = dict(con.execute("SELECT name, value FROM metadata"))
    assert (meta["minzoom"], meta["maxzoom"]) == ("0", "2")
    con.close()
    back, _ = read_mbtiles(spark, path, tile=16)
    for z, npx in ((2, 64), (1, 32), (0, 16)):
        lvl = tiles_to_raster(back.where(f"zoom = {z}"), tile=16)
        assert (lvl[:npx, :npx] == 8).all()


def test_mbtiles_auto_zoom_derives_valid_rows(spark, tmp_path):
    """save_raster-style call with NO zoom: the writer must derive a
    level that holds the extent — a zoom-0 default would TMS-flip rows
    1..3 of a 4x4 grid to negative tile_row (spec violation)."""
    import sqlite3

    from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster
    from gdal_spark.sources.gpkg import read_mbtiles, write_mbtiles

    arr = np.arange(64 * 64, dtype="f8").reshape(64, 64) % 251
    path = str(tmp_path / "auto.mbtiles")
    n = write_mbtiles(raster_to_tiles(spark, arr, tile=16), path, tile=16)
    assert n == 16
    con = sqlite3.connect(path)
    lo, z = con.execute(
        "SELECT min(tile_row), min(zoom_level) FROM tiles").fetchone()
    con.close()
    assert lo >= 0 and z == 2          # 4x4 grid -> zoom 2
    back, _ = read_mbtiles(spark, path, tile=16)
    np.testing.assert_array_equal(
        tiles_to_raster(back, tile=16)[:64, :64].astype("f8"), arr)


def test_mbtiles_explicit_zoom_too_small_raises(spark, tmp_path):
    from gdal_spark.raster.tiles import raster_to_tiles
    from gdal_spark.sources.gpkg import write_mbtiles

    arr = np.zeros((64, 64))
    with pytest.raises(ValueError, match="out of range"):
        write_mbtiles(raster_to_tiles(spark, arr, tile=16),
                      str(tmp_path / "bad.mbtiles"), tile=16, zoom=0)


def test_gpkg_tiles_auto_zoom_matrix_holds_extent(spark, tmp_path):
    """gpkg_tile_matrix must cover the tile table's indices: with no
    zoom given the writer derives it; with a too-small zoom it raises."""
    import sqlite3

    from gdal_spark.raster.tiles import raster_to_tiles
    from gdal_spark.sources.gpkg import write_gpkg_tiles

    arr = np.zeros((128, 128))
    path = str(tmp_path / "auto.gpkg")
    write_gpkg_tiles(raster_to_tiles(spark, arr, tile=16), path, tile=16)
    con = sqlite3.connect(path)
    w, h, z = con.execute("SELECT matrix_width, matrix_height, zoom_level"
                          " FROM gpkg_tile_matrix").fetchone()
    maxc, maxr = con.execute(
        "SELECT max(tile_column), max(tile_row) FROM tiles").fetchone()
    con.close()
    assert (w, h, z) == (8, 8, 3) and maxc < w and maxr < h
    with pytest.raises(ValueError, match="do not fit"):
        write_gpkg_tiles(raster_to_tiles(spark, arr, tile=16),
                         str(tmp_path / "bad.gpkg"), tile=16, zoom=1)


def test_mbtiles_jpg_tiles(spark, tmp_path):
    """MBTiles with format=jpg (frmts/mbtiles reads both PNG and JPEG
    blobs by magic sniff): blockwise-constant tiles at the encoder's
    DC-exact path round-trip through the archive."""
    import sqlite3

    from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster
    from gdal_spark.sources.gpkg import read_mbtiles, write_mbtiles

    # 16x16-constant blocks -> every 8x8 JPEG block constant
    vals = (np.arange(16).reshape(4, 4).repeat(16, 0).repeat(16, 1)
            * 13 + 20).astype("f8")
    path = str(tmp_path / "t.mbtiles")
    n = write_mbtiles(raster_to_tiles(spark, vals, tile=16), path,
                      tile=16, zoom=2, fmt="jpg")
    assert n == 16
    con = sqlite3.connect(path)
    blob = con.execute("SELECT tile_data FROM tiles LIMIT 1").fetchone()[0]
    meta = dict(con.execute("SELECT name, value FROM metadata"))
    con.close()
    assert bytes(blob[:2]) == b"\xff\xd8" and meta["format"] == "jpg"
    back, _ = read_mbtiles(spark, path, tile=16)
    got = tiles_to_raster(back, tile=16)[:64, :64]
    # default quality 75: constant blocks quantize near-exactly
    assert np.abs(got - vals).max() <= 3.0


def test_gpkg_jp2_tiles_decode(spark, tmp_path):
    """GPKG tile blobs in JPEG 2000 (the gpkg_zoom_other/jp2 extension
    case): write a PNG archive, swap one blob for a lossless JP2 of the
    same pixels, and the reader must sniff + decode it identically."""
    import sqlite3

    from gdal_spark.raster.j2k import encode_j2k
    from gdal_spark.raster.tiles import decode_px, raster_to_tiles
    from gdal_spark.sources.gpkg import read_gpkg_tiles, write_gpkg_tiles

    rng = np.random.RandomState(9)
    arr = rng.randint(0, 255, (32, 32)).astype("u1")
    path = str(tmp_path / "j.gpkg")
    write_gpkg_tiles(raster_to_tiles(spark, arr.astype("f8"), tile=16),
                     path, tile=16, zoom=1)
    jp2 = encode_j2k(arr[:16, 16:32], depth=8)
    con = sqlite3.connect(path)
    table = con.execute("SELECT table_name FROM gpkg_contents "
                        "WHERE data_type='tiles'").fetchone()[0]
    con.execute(f'UPDATE "{table}" SET tile_data=? WHERE '
                "tile_column=1 AND tile_row=0", (jp2,))
    con.commit()
    con.close()
    back, _ = read_gpkg_tiles(spark, path, tile=16)
    got = {(r.tile_x, r.tile_y): decode_px(r.px, r.dtype, 16)
           for r in back.where("band=1 AND zoom=1").collect()}
    np.testing.assert_array_equal(got[(1, 0)].astype("u1"),
                                  arr[:16, 16:32])
    np.testing.assert_array_equal(got[(0, 0)].astype("u1"),
                                  arr[:16, :16])
