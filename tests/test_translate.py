"""ogr2ogr-chain tests: stage ORDER is the contract (ogr2ogr_lib.cpp:6287)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.core import wkb
from gdal_spark.operators import translate as tr


def test_explode_collections():
    mp = wkb.multipolygon([
        [[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]],
        [[(10, 10), (12, 10), (12, 12), (10, 12), (10, 10)]],
    ])
    outs = tr.translate_geom(mp, tr.TranslateOptions(explode_collections=True))
    assert len(outs) == 2
    assert all(wkb.decode(o).gtype == wkb.POLYGON for o in outs)


def test_makevalid_closes_rings():
    g = wkb.Geom(wkb.POLYGON, [np.array([(0, 0), (4, 0), (4, 4), (0, 4)],
                                        dtype=np.float64)])  # unclosed
    out = tr.translate_geom(wkb.encode(g), tr.TranslateOptions(make_valid=True))
    ring = wkb.decode(out[0]).rings[0]
    assert np.array_equal(ring[0], ring[-1])


def test_clip_before_reproject_order():
    """clip_src applies in SOURCE coords, clip_dst in DEST coords — wrong
    stage order would clip with the wrong units."""
    sq = wkb.box(10.0, 10.0, 20.0, 20.0)  # degrees
    opts = tr.TranslateOptions(
        clip_src=(0.0, 0.0, 15.0, 15.0),           # degrees (src CRS)
        src_crs="EPSG:4326", dst_crs="EPSG:3857",
    )
    out = tr.translate_geom(sq, opts)
    g = wkb.decode(out[0])
    env = g.envelope()
    # clipped to 10..15 deg, then projected: 15 deg -> ~1669792 m
    assert abs(env[2] - 1669792.36) < 1.0
    assert abs(env[0] - 1113194.91) < 1.0


def test_simplify_and_segmentize():
    line = wkb.linestring([(0, 0), (1, 0.001), (2, 0), (10, 0)])
    out = tr.translate_geom(line, tr.TranslateOptions(simplify=0.01))
    assert len(wkb.decode(out[0]).rings[0]) == 2  # collinear-ish dropped
    out2 = tr.translate_geom(line, tr.TranslateOptions(segmentize=1.0))
    r = wkb.decode(out2[0]).rings[0]
    d = np.hypot(*np.diff(r, axis=0).T)
    assert d.max() <= 1.0 + 1e-9


def test_promote_to_multi_and_clip_dst():
    sq = wkb.box(0.0, 0.0, 10.0, 10.0)
    opts = tr.TranslateOptions(
        src_crs="EPSG:4326", dst_crs="EPSG:3857",
        clip_dst=(0.0, 0.0, 600000.0, 600000.0),   # meters (dst CRS)
        promote_to_multi=True)
    out = tr.translate_geom(sq, opts)
    g = wkb.decode(out[0])
    assert g.gtype == wkb.MULTIPOLYGON
    env = g.envelope()
    assert env[2] <= 600000.0 + 1e-6 and env[3] <= 600000.0 + 1e-6


def test_translate_dataframe_passthrough(spark):
    import pandas as pd
    rows = [(1, wkb.multipolygon([
        [[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]],
        [[(8, 8), (9, 8), (9, 9), (8, 9), (8, 8)]]]), "a"),
        (2, wkb.box(1, 1, 2, 2), "b")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["fid", "geom", "tag"]))
    out = tr.translate(df, tr.TranslateOptions(explode_collections=True))
    got = sorted((r.fid, r.tag) for r in out.collect())
    assert got == [(1, "a"), (1, "a"), (2, "b")]  # fid 1 exploded into 2 rows


def test_wrapdateline_splits_crossing_polygon():
    """A polygon spanning the antimeridian (lon 170..-170 expressed as
    170..190 wrapped) splits into two parts within [-180, 180]
    (OGRGeometryFactory WRAPDATELINE, ogrgeometryfactory.cpp:4022)."""
    import numpy as np

    from gdal_spark.core import geomops, wkb
    from gdal_spark.operators.translate import TranslateOptions, translate_geom

    ring = np.array([[170.0, 10.0], [-170.0, 10.0], [-170.0, 20.0],
                     [170.0, 20.0], [170.0, 10.0]])
    g = wkb.encode(wkb.Geom(wkb.POLYGON, [ring]))
    out = translate_geom(g, TranslateOptions(wrapdateline=True))
    assert len(out) == 1
    parts = wkb.decode(out[0])
    assert parts.gtype == wkb.MULTIPOLYGON and len(parts.parts) == 2
    total = geomops.geom_area(parts)
    assert total == pytest.approx(20.0 * 10.0)          # 20 deg x 10 deg
    for p in parts.parts:
        env = p.envelope()
        assert env[0] >= -180.0 and env[2] <= 180.0
        assert env[2] - env[0] <= 180.0


def test_wrapdateline_leaves_normal_geometry_alone():
    from gdal_spark.core import wkb
    from gdal_spark.operators.translate import TranslateOptions, translate_geom

    g = wkb.box(-10.0, -5.0, 10.0, 5.0)
    out = translate_geom(g, TranslateOptions(wrapdateline=True))
    assert out == [wkb.encode(wkb.decode(g))]


def test_encode_points_batch_inverse():
    coords = np.array([[1.5, -2.25], [0.0, 0.0], [179.9, -89.5]])
    blobs = wkb.encode_points_batch(coords)
    assert wkb.encode_points_batch(np.empty((0, 2))) == []
    back = wkb.points_batch(blobs)
    np.testing.assert_array_equal(back, coords)
    # each blob also decodes through the scalar path
    for b, (x, y) in zip(blobs, coords):
        g = wkb.decode(b)
        assert g.gtype == wkb.POINT
        np.testing.assert_allclose(g.rings[0][0], [x, y])


def test_translate_point_fast_lane_matches_scalar_path(spark):
    """Reproject-only translate over an all-point batch takes the batched
    numpy lane; the result must be bit-identical to the per-feature chain
    (forced here by adding a no-op chain stage that disables the lane)."""
    import pandas as pd
    pts = [(i, wkb.point(-120.0 + i * 3.7, -50.0 + i * 2.1))
           for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["fid", "geom"]))
    fast = tr.translate(df, tr.TranslateOptions(
        src_crs="EPSG:4326", dst_crs="EPSG:3857"))
    # force the scalar path with a chain stage that is a geometric no-op
    slow = tr.translate(df, tr.TranslateOptions(
        src_crs="EPSG:4326", dst_crs="EPSG:3857",
        clip_dst=(-1e9, -1e9, 1e9, 1e9)))
    f = {r.fid: bytes(r.geom) for r in fast.collect()}
    s = {r.fid: bytes(r.geom) for r in slow.collect()}
    assert set(f) == set(s)
    for k in f:
        np.testing.assert_allclose(wkb.decode(f[k]).rings[0][0],
                                   wkb.decode(s[k]).rings[0][0], rtol=1e-12)


def test_translate_mixed_batch_falls_back(spark):
    """A polygon in the batch disables points_batch -> scalar chain; both
    geometry kinds still reproject."""
    import pandas as pd
    rows = [(0, wkb.point(10.0, 20.0)),
            (1, wkb.polygon(np.array([[0.0, 0.0], [1.0, 0.0],
                                      [1.0, 1.0], [0.0, 0.0]])))]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["fid", "geom"]))
    out = tr.translate(df, tr.TranslateOptions(
        src_crs="EPSG:4326", dst_crs="EPSG:3857"))
    got = {r.fid: wkb.decode(bytes(r.geom)) for r in out.collect()}
    assert got[0].gtype == wkb.POINT and got[1].gtype == wkb.POLYGON
    np.testing.assert_allclose(got[0].rings[0][0][0], 1113194.9079327357,
                               rtol=1e-9)
