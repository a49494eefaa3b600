"""Shapefile reader/writer round-trips.

Reference semantics: /root/reference/ogr/ogrsf_frmts/shape/shpopen.c
(SHPReadObject / SHPWriteObject record codec), dbfopen.c (fixed-width
attribute records), and autotest/ogr/ogr_shape.py's round-trip strategy:
what is written must read back identically — geometry, winding-normalized,
and attributes with their dBase types.
"""

import numpy as np
import pytest

from gdal_spark.core import wkb
from gdal_spark.sources.shapefile import (_dbf_header, read_shapefile,
                                          write_shapefile)


def _write_fixture(tmp_path, rows):
    base = str(tmp_path / "layer")
    write_shapefile(rows, base)
    return base


def test_points_roundtrip(spark, tmp_path):
    pts = [(i, 10.0 * i + 0.5, -5.0 + i) for i in range(25)]
    rows = [(wkb.encode(wkb.Geom(wkb.POINT, [np.array([[x, y]])])),
             {"name": f"p{i}", "rank": i, "score": i * 1.5})
            for i, x, y in pts]
    base = _write_fixture(tmp_path, rows)
    out = read_shapefile(spark, base, features_per_task=7).collect()
    assert len(out) == 25
    by_fid = {r.fid: r for r in out}
    for i, x, y in pts:
        g = wkb.decode(bytes(by_fid[i].geom))
        assert g.gtype == wkb.POINT
        assert g.rings[0][0][0] == pytest.approx(x)
        assert by_fid[i].name == f"p{i}"
        assert by_fid[i].rank == i
        assert by_fid[i].score == pytest.approx(i * 1.5)


def test_polygon_roundtrip_with_hole(spark, tmp_path):
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                     np.float64)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], np.float64)
    g = wkb.Geom(wkb.POLYGON, [shell, hole])
    base = _write_fixture(tmp_path, [(wkb.encode(g), {"tag": "a"})])
    out = read_shapefile(spark, base).collect()
    assert len(out) == 1
    back = wkb.decode(bytes(out[0].geom))
    assert back.gtype == wkb.POLYGON and len(back.rings) == 2
    from gdal_spark.core.geomops import geom_area
    assert geom_area(back) == pytest.approx(100.0 - 4.0)


def test_multipolygon_and_lines_roundtrip(spark, tmp_path):
    p1 = wkb.Geom(wkb.POLYGON, [np.array(
        [[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], np.float64)])
    p2 = wkb.Geom(wkb.POLYGON, [np.array(
        [[5, 5], [8, 5], [8, 9], [5, 9], [5, 5]], np.float64)])
    mp = wkb.Geom(wkb.MULTIPOLYGON, parts=[p1, p2])
    base = _write_fixture(tmp_path, [(wkb.encode(mp), {"k": 1})])
    back = wkb.decode(bytes(read_shapefile(spark, base).collect()[0].geom))
    assert back.gtype == wkb.MULTIPOLYGON and len(back.parts) == 2
    from gdal_spark.core.geomops import geom_area
    assert geom_area(back) == pytest.approx(4.0 + 12.0)

    line = wkb.Geom(wkb.LINESTRING,
                    [np.array([[0, 0], [3, 4], [6, 0]], np.float64)])
    base2 = str(tmp_path / "lines")
    write_shapefile([(wkb.encode(line), {"k": 2})], base2)
    lback = wkb.decode(bytes(read_shapefile(spark, base2).collect()[0].geom))
    assert lback.gtype == wkb.LINESTRING
    assert np.allclose(lback.rings[0], line.rings[0])


def test_dbf_header_and_null_geometry(spark, tmp_path):
    rows = [(None, {"n": 1}),
            (wkb.encode(wkb.Geom(wkb.POINT, [np.array([[1.0, 2.0]])])),
             {"n": 2})]
    base = _write_fixture(tmp_path, rows)
    nrec, hsize, rsize, fields = _dbf_header(base + ".dbf")
    assert nrec == 2 and fields[0][0] == "n"
    out = sorted(read_shapefile(spark, base).collect(),
                 key=lambda r: r.fid)
    assert out[0].geom is None and out[0].n == 1
    assert out[1].n == 2


def test_reference_autotest_fixture_poly_shp(spark):
    """The canonical OGR fixture autotest/ogr/data/poly.shp
    (autotest/ogr/ogr_shape.py): 10 polygons with AREA/EAS_ID/PRFEDEA;
    eas_id < 170 in file order must be [168, 169, 166, 158, 165]
    (ogr_shape.py:92), and each feature's shoelace area must match its
    AREA attribute."""
    from gdal_spark.core.geomops import geom_area
    base = "/root/reference/autotest/ogr/data/poly"
    rows = sorted(read_shapefile(spark, base).collect(),
                  key=lambda r: r.fid)
    assert len(rows) == 10
    got = [int(r.EAS_ID) for r in rows if r.EAS_ID < 170]
    assert got == [168, 169, 166, 158, 165]
    for r in rows:
        area = geom_area(wkb.decode(bytes(r.geom)))
        # one fixture row stores AREA negative; the attribute is rounded
        # independently of the ring coords, so compare loosely in |.|
        assert area == pytest.approx(abs(float(r.AREA)), rel=1e-3)
    # the OGRSQL front end over the fixture: DISTINCT + ORDER BY DESC
    # (ogr_shape.py:149 expects 179..158)
    from gdal_spark.sql import OgrSqlEngine
    eng = OgrSqlEngine(spark)
    eng.register("tpoly", read_shapefile(spark, base), fid_col="fid")
    vals = [int(r.EAS_ID) for r in eng.sql(
        "SELECT DISTINCT EAS_ID FROM tpoly ORDER BY EAS_ID DESC"
    ).collect()]
    assert vals == [179, 173, 172, 171, 170, 169, 168, 166, 165, 158]


def test_distributed_writer_no_driver_materialization(spark, tmp_path):
    """write_shapefile_dist: a multi-partition layer writes via per-task
    pwrite with only O(#partitions) rows ever reaching the driver, and
    the result reads back identically (geometry + every DBF type)."""
    from unittest import mock

    from pyspark.sql import functions as F

    from gdal_spark.sources.shapefile import (read_shapefile,
                                              write_shapefile_dist)

    n = 5000
    # build WKB points executor-side with the engine codec
    import pandas as pd

    import gdal_spark.core.wkb as W

    @F.pandas_udf("binary")
    def mk(lon: pd.Series, lat: pd.Series) -> pd.Series:
        import numpy as np
        return pd.Series([W.encode(W.Geom(W.POINT,
                                          [np.array([[x, y]])]))
                          for x, y in zip(lon, lat)])

    df = (spark.range(n).repartition(8)
          .withColumn("lon", (F.col("id") % 360).cast("double") - 180.0
                      + 0.25)
          .withColumn("lat", ((F.col("id") * 7) % 170).cast("double")
                      - 85.0 + 0.25)
          .select(mk("lon", "lat").alias("geom"),
                  F.col("id").alias("rank"),
                  (F.col("id") / 3.0).alias("score"),
                  F.concat(F.lit("name"), F.col("id")).alias("name"),
                  (F.col("id") % 2 == 0).alias("ok")))

    seen = []
    orig = type(df).collect

    def counting(self):
        rows = orig(self)
        seen.append(len(rows))
        return rows

    base = str(tmp_path / "dist")
    with mock.patch.object(type(df), "collect", counting):
        total = write_shapefile_dist(df, base)
    assert total == n
    # phase-1 stats + phase-2 sink count: never more than O(partitions)
    assert max(seen) <= 16

    back = read_shapefile(spark, base)
    assert back.count() == n
    got = {r.rank: (r.score, r.name, r.ok)
           for r in back.collect()}
    assert got[0] == (0.0, "name0", True)
    assert got[4999] == (pytest.approx(4999 / 3.0), "name4999", False)
    # .shx/.dbf strides and .shp record numbering are consistent
    import struct
    with open(base + ".shx", "rb") as f:
        shx = f.read()
    assert (len(shx) - 100) // 8 == n
    off0, ln0 = struct.unpack_from(">2i", shx, 100)
    with open(base + ".shp", "rb") as f:
        f.seek(off0 * 2)
        rec1, ln1 = struct.unpack_from(">2i", f.read(8))
    assert rec1 == 1 and ln1 == ln0
