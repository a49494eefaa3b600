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
