"""OpenFileGDB (.gdb) reader/writer vs the reference autotest fixtures.

Golden expectations come from autotest/ogr/ogr_openfilegdb.py (point
attribute battery, sparse-table FIDs, UTF-16 strings, 64-bit-OID V4
tables) run against the same binary fixtures.
"""
import os
import shutil
import zipfile

import numpy as np
import pytest

from gdal_spark.core import wkb as W
from gdal_spark.sources.openfilegdb import (
    FGFT_FLOAT64, FGFT_GEOMETRY, FGFT_INT32, FGFT_STRING,
    GdbTableInfo, decode_rows, list_layers, read_openfilegdb,
    table_schema, write_openfilegdb)

FIXDIR = "/root/reference/autotest/ogr/data/filegdb"


@pytest.fixture(scope="module")
def gdb(tmp_path_factory):
    base = tmp_path_factory.mktemp("gdb")
    for z in ("testopenfilegdb.gdb.zip", "sparse.gdb.zip",
              "test_utf16.gdb.zip"):
        zipfile.ZipFile(os.path.join(FIXDIR, z)).extractall(base)
    return str(base)


def _collect(base, layer):
    info = GdbTableInfo(os.path.join(base, layer))
    plan, present = info.block_plan()
    rows = []
    for p in plan:
        fids, offs = info.read_offsets(*p, present)
        rows += decode_rows(info, fids, offs)
    return info, rows


def _rows(gdb_dir, layer):
    layers = list_layers(gdb_dir)
    return _collect(os.path.dirname(layers[layer]),
                    os.path.basename(layers[layer]))


def test_catalog(gdb):
    layers = list_layers(os.path.join(gdb, "testopenfilegdb.gdb"))
    assert len(layers) == 37
    assert "point" in layers and "multipolygon" in layers
    assert not any(n.startswith("GDB_") for n in layers)


def test_point_attribute_battery(gdb):
    """autotest ogr_openfilegdb.py test_ogr_openfilegdb_1 values."""
    info, rows = _rows(os.path.join(gdb, "testopenfilegdb.gdb"), "point")
    schema = table_schema(info)
    names = [f.name for f in schema.fields]
    assert len(rows) == 5
    r = dict(zip(names, rows[0]))
    assert r["fid"] == 1 and r["id"] == 1
    assert r["str"] == "foo_é"
    assert r["smallint"] == -13
    assert r["int"] == 123
    assert abs(r["float"] - 1.5) < 1e-6
    assert abs(r["real"] - 4.56) < 1e-12
    assert str(r["adate"]) == "2013-12-26 12:34:56"
    assert r["guid"] == "{12345678-9ABC-DEF0-1234-567890ABCDEF}"
    assert r["xml"] == "<foo></fooapos>".replace("apos", "")
    assert r["binary"] == b"\x00\xff\x7f"
    assert r["nullint"] is None
    assert r["binary2"] == b"\x12\x34\x56"
    assert W.to_wkt(r["geom"]) == "POINT (1 2)"


def test_geometry_golden_wkts(gdb):
    base = os.path.join(gdb, "testopenfilegdb.gdb")
    got = {}
    for layer in ("multipoint", "linestring", "multilinestring_multipart",
                  "multipolygon", "several_polygons"):
        info, rows = _rows(base, layer)
        gi = [f.name for f in table_schema(info).fields].index("geom")
        got[layer] = W.to_wkt(rows[0][gi])
    assert got["multipoint"] == "MULTIPOINT ((1 2),(3 4))"
    assert got["linestring"] == "LINESTRING (1 2,3 4)"
    assert got["multilinestring_multipart"] == \
        "MULTILINESTRING ((1 2,3 4),(5 6,7 8))"
    assert got["multipolygon"] == (
        "MULTIPOLYGON (((0 0,0 1,1 1,1 0,0 0),"
        "(0.25 0.25,0.75 0.25,0.75 0.75,0.25 0.75,0.25 0.25)),"
        "((2 0,2 1,3 1,3 0,2 0)))")
    assert got["several_polygons"] == "POLYGON ((0 0,0 1,1 1,1 0,0 0))"


def test_z_layers_xy(gdb):
    """25D layers decode their XY under the 2-D contract."""
    base = os.path.join(gdb, "testopenfilegdb.gdb")
    info, rows = _rows(base, "point25D")
    gi = [f.name for f in table_schema(info).fields].index("geom")
    assert W.to_wkt(rows[0][gi]) == "POINT (1 2)"
    info, rows = _rows(base, "polygonzm")
    gi = [f.name for f in table_schema(info).fields].index("geom")
    assert W.to_wkt(rows[0][gi]) == "POLYGON ((0 0,0 1,1 1,1 0,0 0))"


def test_null_and_empty_geometries(gdb):
    base = os.path.join(gdb, "testopenfilegdb.gdb")
    for layer in ("null_polygon", "hole"):
        info, rows = _rows(base, layer)
        gi = [f.name for f in table_schema(info).fields].index("geom")
        assert rows[0][gi] is None
    info, rows = _rows(base, "testnotnullable")
    assert rows == []


def test_big_layer(gdb):
    """341 rows with real = (fid-1) % 4 (autotest fixture generator)."""
    info, rows = _rows(os.path.join(gdb, "testopenfilegdb.gdb"),
                       "big_layer")
    assert len(rows) == 341
    names = [f.name for f in table_schema(info).fields]
    ri = names.index("real")
    for r in rows:
        assert r[ri] == float((r[0] - 1) % 4)


def test_sparse_blockmap_fids(gdb):
    """sparse.gdb: the .gdbtablx block map must recover the autotest
    FID set across a 10M-row offset table."""
    info, rows = _rows(os.path.join(gdb, "sparse.gdb"), "ogr_fgdb_20")
    assert [r[0] for r in rows] == [2, 3, 4, 7, 8, 9, 10, 2049, 8191,
                                    16384, 10000000, 10000001]
    assert info.blockmap        # the block map path actually exercised


def test_utf16_strings(gdb):
    """UTF-16 string payloads (header utf8 bit clear)."""
    info, rows = _rows(os.path.join(gdb, "test_utf16.gdb"), "foo")
    assert not info.utf8
    names = [f.name for f in table_schema(info).fields]
    assert rows[0][names.index("str")] == "évenéven"


def test_v4_objectid64():
    """V4 (ArcGIS Pro 3.2) tables: 64-bit counts + tablx bitmap."""
    info, rows = _rows(os.path.join(FIXDIR, "objectid64", "3features.gdb"),
                       "testpolygon")
    assert info.version == 4
    assert [r[0] for r in rows] == [1, 2, 3]
    info, rows = _rows(
        os.path.join(FIXDIR, "objectid64", "with_holes_8.gdb"),
        "with_holes_8_a")
    assert info.version == 4 and info.blockmap
    assert [r[0] for r in rows] == [123456]


def test_driver_metadata_is_bounded(gdb, monkeypatch):
    """The driver-side open must pread bounded metadata, never the
    row bytes: opening sparse.gdb's 10M-row layer (a ~50 MB .gdbtablx
    equivalent at scale) reads only header+trailer+blockmap."""
    from gdal_spark.core import vsi
    real = vsi.pread
    seen = []

    def tracking(path, off, size):
        seen.append((os.path.basename(path), size))
        return real(path, off, size)

    monkeypatch.setattr(vsi, "pread", tracking)
    layers = list_layers(os.path.join(gdb, "sparse.gdb"))
    GdbTableInfo(layers["ogr_fgdb_20"])
    gdbtable_reads = [s for n, s in seen if n.endswith(".gdbtable")]
    assert max(gdbtable_reads) < 64 * 1024
    tablx_reads = [s for n, s in seen
                   if n == "a00000009.gdbtablx"]
    # header(16) + trailer(16) + blockmap(~1.2KB for 10M rows) only
    assert sum(tablx_reads) < 8 * 1024


def test_spark_read(spark, gdb):
    from gdal_spark.sources import open_vector
    df = open_vector(spark, os.path.join(gdb, "testopenfilegdb.gdb"),
                     layer="point")
    rows = df.orderBy("fid").collect()
    assert len(rows) == 5
    assert rows[0]["str"] == "foo_é"
    assert W.to_wkt(rows[0]["geom"]) == "POINT (1 2)"
    big = read_openfilegdb(spark, os.path.join(gdb, "testopenfilegdb.gdb"),
                           "big_layer", rows_per_task=1024)
    assert big.count() == 341


def test_writer_roundtrip(spark, tmp_path):
    path = str(tmp_path / "rt.gdb")
    poly = W.Geom(W.POLYGON, [
        np.array([[0.0, 0.0], [0.0, 4.0], [4.0, 4.0], [4.0, 0.0],
                  [0.0, 0.0]]),
        np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0],
                  [1.0, 1.0]])])
    line = W.Geom(W.LINESTRING,
                  [np.array([[-5.0, 1.5], [3.25, -2.75], [10.0, 10.0]])])
    rows = [(1, 0.5, "a", W.encode(poly)),
            (2, None, "bé", W.encode(line)),
            (None, 2.25, None, None)]
    write_openfilegdb(path, "mix",
                      [("id", FGFT_INT32, True),
                       ("val", FGFT_FLOAT64, True),
                       ("name", FGFT_STRING, True),
                       ("SHAPE", FGFT_GEOMETRY, True)],
                      rows, geom_code=4)
    df = read_openfilegdb(spark, path)
    got = df.orderBy("fid").collect()
    assert [r.fid for r in got] == [1, 2, 3]
    assert got[0].id == 1 and got[0].val == 0.5 and got[0].name == "a"
    assert got[1].val is None and got[1].name == "bé"
    assert got[2].id is None and got[2].geom is None
    assert W.to_wkt(got[0].geom) == (
        "POLYGON ((0 0,0 4,4 4,4 0,0 0),(1 1,2 1,2 2,1 2,1 1))")
    # quantization at xyscale~1e9 keeps 8 decimals exactly
    pts = W.decode(got[1].geom).rings[0]
    assert np.allclose(pts, [[-5.0, 1.5], [3.25, -2.75], [10.0, 10.0]],
                       atol=2e-9)


def test_writer_multilayer_catalog(tmp_path):
    path = str(tmp_path / "cat.gdb")
    write_openfilegdb(path, "only", [("id", FGFT_INT32, True)],
                      [(7,)], geom_code=0)
    layers = list_layers(path)
    assert list(layers) == ["only"]
    info, rows = _collect(os.path.dirname(layers["only"]),
                          os.path.basename(layers["only"]))
    assert rows == [(1, 7)]
