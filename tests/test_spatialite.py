"""SpatiaLite reader/writer round-trips.

Reference semantics: /root/reference/ogr/ogrsf_frmts/sqlite/
ogrsqlitelayer.cpp (ImportSpatiaLiteGeometry/ExportSpatiaLiteGeometry,
geometry_columns discovery), mirroring autotest/ogr/ogr_sqlite.py's
write-then-read strategy.
"""

import struct

import numpy as np
import pytest

from gdal_spark.core import wkb
from gdal_spark.sources.spatialite import (list_layers, read_spatialite,
                                           spatialite_to_wkb,
                                           wkb_to_spatialite,
                                           write_spatialite)


def _poly():
    shell = np.array([[0, 0], [8, 0], [8, 6], [0, 6], [0, 0]], np.float64)
    hole = np.array([[2, 2], [3, 2], [3, 3], [2, 3], [2, 2]], np.float64)
    return wkb.Geom(wkb.POLYGON, [shell, hole])


def test_blob_codec_all_classes():
    geoms = [
        wkb.Geom(wkb.POINT, [np.array([[5.5, -2.25]])]),
        wkb.Geom(wkb.LINESTRING,
                 [np.array([[0, 0], [1, 2], [4, 4]], np.float64)]),
        _poly(),
        wkb.Geom(wkb.MULTIPOINT, parts=[
            wkb.Geom(wkb.POINT, [np.array([[1.0, 2.0]])]),
            wkb.Geom(wkb.POINT, [np.array([[3.0, 4.0]])])]),
        wkb.Geom(wkb.MULTIPOLYGON, parts=[_poly()]),
        wkb.Geom(wkb.GEOMETRYCOLLECTION, parts=[
            wkb.Geom(wkb.POINT, [np.array([[9.0, 9.0]])]), _poly()]),
    ]
    for g in geoms:
        iso = wkb.encode(g)
        blob = wkb_to_spatialite(iso, srid=4326)
        # header invariants: markers + little-endian srid + exact MBR
        assert blob[0] == 0x00 and blob[-1] == 0xFE and blob[38] == 0x7C
        assert struct.unpack_from("<i", blob, 2)[0] == 4326
        env = g.envelope()
        assert struct.unpack_from("<4d", blob, 6) == pytest.approx(env)
        assert spatialite_to_wkb(blob) == iso


def test_z_class_rejected():
    blob = bytearray(wkb_to_spatialite(
        wkb.encode(wkb.Geom(wkb.POINT, [np.array([[1.0, 2.0]])]))))
    struct.pack_into("<i", blob, 39, 1001)      # POINT Z class
    with pytest.raises(ValueError, match="2-D"):
        spatialite_to_wkb(bytes(blob))


def test_layer_roundtrip_with_attrs(spark, tmp_path):
    path = str(tmp_path / "db.sqlite")
    rows = [(wkb.encode(wkb.Geom(wkb.POINT,
                                 [np.array([[i * 1.5, -i * 0.5]])])),
             {"name": f"p{i}", "rank": i, "score": i / 3.0})
            for i in range(40)]
    write_spatialite(rows, path, table="pts", geometry_type="POINT")
    assert list_layers(path) == [("pts", "geometry", 4326)]
    out = read_spatialite(spark, path, rows_per_task=7).collect()
    assert len(out) == 40
    by = {r.rank: r for r in out}
    for i in range(40):
        g = wkb.decode(bytes(by[i].geom))
        assert g.rings[0][0][0] == pytest.approx(i * 1.5)
        assert by[i].name == f"p{i}"
        assert by[i].score == pytest.approx(i / 3.0)


def test_polygon_and_null_geometry(spark, tmp_path):
    path = str(tmp_path / "p.sqlite")
    rows = [(wkb.encode(_poly()), {"k": 1}), (None, {"k": 2})]
    write_spatialite(rows, path, table="polys", geometry_type="POLYGON")
    out = sorted(read_spatialite(spark, path).collect(), key=lambda r: r.k)
    from gdal_spark.core.geomops import geom_area
    assert geom_area(wkb.decode(bytes(out[0].geom))) == pytest.approx(47.0)
    assert out[1].geom is None
