"""FlatGeobuf reader/writer round-trips + packed R-tree bbox pruning.

Reference semantics: /root/reference/ogr/ogrsf_frmts/flatgeobuf/
ogrflatgeobuflayer.cpp (size-prefixed feature stream, property codec),
packedrtree.cpp (level bounds, streamSearch traversal), geometryreader.cpp
(xy/ends/parts decode), mirroring autotest/ogr/ogr_flatgeobuf.py's
write-then-read strategy.
"""

import numpy as np
import pytest

from gdal_spark.core import wkb
from gdal_spark.sources.flatgeobuf import (_level_bounds, _read_header,
                                           read_fgb, write_fgb)


def _pts_rows(n=40):
    rows = []
    for i in range(n):
        x, y = (i % 8) * 10.0, (i // 8) * 5.0
        g = wkb.Geom(wkb.POINT, [np.array([[x, y]])])
        rows.append((wkb.encode(g),
                     {"name": f"f{i}", "rank": i, "score": i / 4.0}))
    return rows


def test_level_bounds_match_reference_shape():
    """packedrtree.cpp:214 generateLevelBounds: leaves last in the array,
    root at index 0."""
    bounds, total = _level_bounds(40, 16)
    # 40 leaves -> 3 internal -> 1 root = 44 nodes
    assert total == 44
    assert bounds[0] == (4, 44)          # leaves
    assert bounds[-1] == (0, 1)          # root


def test_point_roundtrip_with_attrs(spark, tmp_path):
    path = str(tmp_path / "pts.fgb")
    rows = _pts_rows()
    write_fgb(rows, path)
    hdr = _read_header(path)
    assert hdr["count"] == 40 and len(hdr["columns"]) == 3
    out = read_fgb(spark, path).collect()
    assert len(out) == 40
    got = sorted((r.name, r.rank, r.score,
                  tuple(np.round(wkb.decode(bytes(r.geom)).rings[0][0], 9)))
                 for r in out)
    want = sorted((a["name"], a["rank"], a["score"],
                   tuple(np.round(wkb.decode(bytes(g)).rings[0][0], 9)))
                  for g, a in rows)
    assert got == want


def test_bbox_filter_prunes(spark, tmp_path):
    path = str(tmp_path / "pts.fgb")
    write_fgb(_pts_rows(), path)
    # bbox covering x in [0, 25], y in [0, 6] -> i%8 in {0,1,2}, i//8 in {0,1}
    out = read_fgb(spark, path, bbox=(-1.0, -1.0, 25.0, 6.0)).collect()
    names = sorted(r.name for r in out)
    want = sorted(f"f{i}" for i in range(40)
                  if (i % 8) * 10.0 <= 25.0 and (i // 8) * 5.0 <= 6.0)
    assert names == want and 0 < len(out) < 40


def test_polygon_multipolygon_roundtrip(spark, tmp_path):
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                     np.float64)
    hole = np.array([[4, 4], [4, 6], [6, 6], [6, 4], [4, 4]], np.float64)
    poly = wkb.Geom(wkb.POLYGON, [shell, hole])
    p1 = wkb.Geom(wkb.POLYGON, [np.array(
        [[20, 0], [24, 0], [24, 3], [20, 3], [20, 0]], np.float64)])
    mp = wkb.Geom(wkb.MULTIPOLYGON, parts=[p1, poly])
    line = wkb.Geom(wkb.LINESTRING,
                    [np.array([[0, 20], [5, 25], [9, 20]], np.float64)])
    path = str(tmp_path / "mix.fgb")
    write_fgb([(wkb.encode(poly), {"k": 1}),
               (wkb.encode(mp), {"k": 2}),
               (wkb.encode(line), {"k": 3})], path)
    out = {r.k: wkb.decode(bytes(r.geom))
           for r in read_fgb(spark, path).collect()}
    from gdal_spark.core.geomops import geom_area, geom_length
    assert out[1].gtype == wkb.POLYGON and len(out[1].rings) == 2
    assert geom_area(out[1]) == pytest.approx(100.0 - 4.0)
    assert out[2].gtype == wkb.MULTIPOLYGON and len(out[2].parts) == 2
    assert geom_area(out[2]) == pytest.approx(12.0 + 96.0)
    assert out[3].gtype == wkb.LINESTRING
    assert np.allclose(out[3].rings[0], line.rings[0])


def test_hilbert_sort_changes_file_order_not_results(spark, tmp_path):
    p1 = str(tmp_path / "a.fgb")
    p2 = str(tmp_path / "b.fgb")
    rows = _pts_rows(30)
    write_fgb(rows, p1, hilbert_sort=True)
    write_fgb(rows, p2, hilbert_sort=False)
    a = sorted((r.name, r.rank) for r in read_fgb(spark, p1).collect())
    b = sorted((r.name, r.rank) for r in read_fgb(spark, p2).collect())
    assert a == b


def test_fgb_property_roundtrip_random_geoms(spark, tmp_path):
    """Hypothesis-style randomized round-trip: random rectangles-with-
    holes, multipolygons, lines and points survive the FlatBuffers
    encode/decode byte-for-byte in coordinates and attributes."""
    rng = np.random.default_rng(31)
    rows = []
    for i in range(60):
        kind = i % 4
        cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
        w, h = rng.uniform(0.5, 5, 2)
        if kind == 0:
            g = wkb.Geom(wkb.POINT, [np.array([[cx, cy]])])
        elif kind == 1:
            ln = np.column_stack([cx + np.cumsum(rng.uniform(0, 1, 5)),
                                  cy + rng.uniform(-1, 1, 5)])
            g = wkb.Geom(wkb.LINESTRING, [ln])
        elif kind == 2:
            shell = np.array([[cx, cy], [cx + w, cy], [cx + w, cy + h],
                              [cx, cy + h], [cx, cy]])
            hole = np.array([[cx + w/3, cy + h/3], [cx + w/3, cy + 2*h/3],
                             [cx + 2*w/3, cy + 2*h/3],
                             [cx + 2*w/3, cy + h/3],
                             [cx + w/3, cy + h/3]])
            g = wkb.Geom(wkb.POLYGON, [shell, hole])
        else:
            p1 = wkb.Geom(wkb.POLYGON, [np.array(
                [[cx, cy], [cx + 1, cy], [cx + 1, cy + 1], [cx, cy + 1],
                 [cx, cy]])])
            p2 = wkb.Geom(wkb.POLYGON, [np.array(
                [[cx + 3, cy], [cx + 4, cy], [cx + 4, cy + 1],
                 [cx + 3, cy + 1], [cx + 3, cy]])])
            g = wkb.Geom(wkb.MULTIPOLYGON, parts=[p1, p2])
        rows.append((wkb.encode(g), {"i": i, "tag": f"t{i}"}))
    path = str(tmp_path / "prop.fgb")
    write_fgb(rows, path)
    out = {r.i: r for r in read_fgb(spark, path).collect()}
    assert len(out) == 60
    for i, (gb, attrs) in enumerate(rows):
        want = wkb.decode(gb)
        got = wkb.decode(bytes(out[i].geom))
        assert got.gtype == want.gtype
        assert np.array_equal(got.points(), want.points()) or all(
            np.array_equal(a, b) for a, b in zip(
                [r for r in got.rings] + [r for p in got.parts
                                          for r in p.rings],
                [r for r in want.rings] + [r for p in want.parts
                                           for r in p.rings]))
        assert out[i].tag == f"t{i}"


def test_reference_autotest_fixture_gdal_written_mls(spark):
    """Cross-implementation parity: a GDAL-WRITTEN FlatGeobuf
    (autotest/ogr/data/flatgeobuf/test_ogr_flatgeobuf_singlepart_mls_new
    .fgb — MULTILINESTRING((0 0,1 1)), written by the reference driver)
    must decode through our FlatBuffers reader; features_count=0 in its
    header also exercises the sequential-scan fallback."""
    path = ("/root/reference/autotest/ogr/data/flatgeobuf/"
            "test_ogr_flatgeobuf_singlepart_mls_new.fgb")
    rows = read_fgb(spark, path).collect()
    assert len(rows) == 1
    g = wkb.decode(bytes(rows[0].geom))
    assert g.gtype == wkb.MULTILINESTRING and len(g.parts) == 1
    assert np.allclose(g.parts[0].rings[0], [[0.0, 0.0], [1.0, 1.0]])


def test_bbox_on_unindexed_file_still_filters(spark, tmp_path, monkeypatch):
    """A file without a packed R-tree must still honor bbox via the
    worker-side envelope refine (round-3 review finding)."""
    import gdal_spark.sources.flatgeobuf as fgb
    path = str(tmp_path / "noindex.fgb")
    # write WITHOUT an index by forcing node_size 0 in the header
    rows = _pts_rows(20)
    orig = fgb._build_rtree
    write_fgb(rows, path)
    # rewrite header count/node_size by writing a fresh file sans index
    # (simplest: monkeypatch _read_header to report no index)
    real = fgb._read_header(path)

    def fake_header(p):
        h = dict(real)
        h["index_len"] = 0
        h["node_size"] = 0
        return h

    monkeypatch.setattr(fgb, "_read_header", fake_header)
    # features_pos still points at the index in the REAL file, so also
    # shift it to the feature section
    fake = fake_header(path)
    fake["features_pos"] = real["features_pos"]
    monkeypatch.setattr(fgb, "_read_header", lambda p: fake)
    out = fgb.read_fgb(spark, path, bbox=(-1.0, -1.0, 25.0, 6.0)).collect()
    names = sorted(r.name for r in out)
    want = sorted(f"f{i}" for i in range(20)
                  if (i % 8) * 10.0 <= 25.0 and (i // 8) * 5.0 <= 6.0)
    assert names == want and 0 < len(out) < 20


def test_distributed_fgb_writer_matches_reader_and_index(spark, tmp_path):
    """write_fgb_dist: distributed Hilbert sort + per-task feature/leaf
    pwrite + healed 16-group upper levels. The file must read back
    completely, bbox pruning must work through the distributed-built
    R-tree, and driver-side materialization stays O(partitions + n/16)."""
    from unittest import mock

    import pandas as pd
    from pyspark.sql import functions as F

    import gdal_spark.core.wkb as W
    from gdal_spark.sources.flatgeobuf import read_fgb, write_fgb_dist

    n = 3000

    @F.pandas_udf("binary")
    def mk(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series([W.encode(W.Geom(W.POINT,
                                          [np.array([[x, y]])]))
                          for x, y in zip(lon, lat)])

    df = (spark.range(n).repartition(7)
          .withColumn("lon", ((F.col("id") * 37) % 3600).cast("double")
                      / 10.0 - 180.0 + 0.05)
          .withColumn("lat", ((F.col("id") * 53) % 1700).cast("double")
                      / 10.0 - 85.0 + 0.05)
          .select(mk("lon", "lat").alias("geom"),
                  F.col("id").alias("fidv"),
                  F.col("lon").alias("xlon"), F.col("lat").alias("xlat")))

    seen = []
    orig = type(df).collect

    def counting(self):
        rows = orig(self)
        seen.append(len(rows))
        return rows

    path = str(tmp_path / "dist.fgb")
    with mock.patch.object(type(df), "collect", counting):
        total = write_fgb_dist(df, path)
    assert total == n
    assert max(seen) <= max(16, n // 16 + 16)   # extent/stats/level-1 only

    back = read_fgb(spark, path).collect()
    assert len(back) == n
    got = {int(r.fidv): (r.xlon, r.xlat) for r in back}
    assert got[17] == (pytest.approx((17 * 37 % 3600) / 10 - 180 + .05),
                       pytest.approx((17 * 53 % 1700) / 10 - 85 + .05))
    for r in back[:50]:
        g = W.decode(bytes(r.geom))
        assert g.rings[0][0][0] == pytest.approx(got[int(r.fidv)][0])

    # bbox pruning through the distributed-built packed R-tree
    sub = read_fgb(spark, path, bbox=(-10.0, -10.0, 10.0, 10.0)).collect()
    want = {i for i in range(n)
            if -10 <= (i * 37 % 3600) / 10 - 180 + .05 <= 10
            and -10 <= (i * 53 % 1700) / 10 - 85 + .05 <= 10}
    assert {int(r.fidv) for r in sub} == want
