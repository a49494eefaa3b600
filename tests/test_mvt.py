"""MVT codec + Spark tile writer/reader (vector-tile-spec 2.1;
reference: ogr/ogrsf_frmts/mvt)."""

import os

import numpy as np
import pytest

from gdal_spark.core import wkb
from gdal_spark.sources import mvt


def test_zigzag_varint_roundtrip():
    for n in (0, 1, -1, 2, -2, 4095, -4096, 2**31, -2**31, 2**62, -2**62):
        assert mvt._unzigzag(mvt._zigzag(n)) == n
    out = bytearray()
    for n in (0, 1, 127, 128, 300, 2**32, 2**63 - 1):
        mvt._put_varint(out, n)
    off = 0
    for n in (0, 1, 127, 128, 300, 2**32, 2**63 - 1):
        v, off = mvt._get_varint(bytes(out), off)
        assert v == n


def test_spec_example_polygon_commands():
    # vector-tile-spec 2.1 §4.3.5.3 example: polygon (3,6) (8,12) (20,34)
    ring = np.array([[3, 6], [8, 12], [20, 34], [3, 6]])
    cmds = mvt.encode_geometry(mvt.MVT_POLYGON, [ring])
    assert cmds == [9, 6, 12, 18, 10, 12, 24, 44, 15]
    back = mvt.decode_geometry(mvt.MVT_POLYGON, cmds)
    assert len(back) == 1
    np.testing.assert_array_equal(back[0], ring)


def test_spec_example_multilinestring():
    # §4.3.5.2 example: two linestrings (2,2)->(2,10)->(10,10) and
    # (1,1)->(3,5)
    parts = [np.array([[2, 2], [2, 10], [10, 10]]),
             np.array([[1, 1], [3, 5]])]
    cmds = mvt.encode_geometry(mvt.MVT_LINESTRING, parts)
    assert cmds == [9, 4, 4, 18, 0, 16, 16, 0, 9, 17, 17, 10, 4, 8]
    back = mvt.decode_geometry(mvt.MVT_LINESTRING, cmds)
    assert len(back) == 2
    np.testing.assert_array_equal(back[0], parts[0])
    np.testing.assert_array_equal(back[1], parts[1])


def test_tile_codec_typed_props_and_dedup():
    feats = [
        (1, mvt.MVT_POINT, [np.array([[10, 20]])],
         {"name": "a", "rank": 3, "score": 1.5, "ok": True}),
        (2, mvt.MVT_POINT, [np.array([[30, 40]])],
         {"name": "a", "rank": -7, "ok": False}),
    ]
    blob = mvt.encode_tile({"pois": feats}, extent=4096)
    out = mvt.decode_tile(blob)
    assert [f["fid"] for f in out] == [1, 2]
    assert out[0]["layer"] == "pois" and out[0]["extent"] == 4096
    assert out[0]["props"] == {"name": "a", "rank": 3, "score": 1.5,
                               "ok": True}
    assert out[1]["props"] == {"name": "a", "rank": -7, "ok": False}
    assert isinstance(out[0]["props"]["ok"], bool)
    assert isinstance(out[0]["props"]["rank"], int)
    # layer-wide key/value dictionaries are deduplicated: 'name'->'a'
    # shared; keys stored once
    layer_buf = next(v for f, w, v in mvt._walk(blob) if f == 3)
    keys = [v.decode() for f, w, v in mvt._walk(layer_buf) if f == 3]
    vals = [v for f, w, v in mvt._walk(layer_buf) if f == 4]
    assert sorted(keys) == ["name", "ok", "rank", "score"]
    assert len(vals) == 6  # a, 3, 1.5, true, -7, false


def test_polygon_with_hole_winding():
    # shell CCW in y-up coords -> must be stored positive-shoelace in
    # screen coords; hole must be opposite
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    hole = np.array([[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]])
    cmds = mvt.encode_geometry(mvt.MVT_POLYGON, [shell, hole])
    parts = mvt.decode_geometry(mvt.MVT_POLYGON, cmds)
    assert len(parts) == 2
    assert mvt._shoelace2(parts[0][:-1]) == mvt._shoelace2(shell[:-1])


def test_geom_to_mvt_quantize_and_winding():
    # 1x1-tile world at z0; polygon covering NE quadrant
    ring = np.array([[0.0, 0.0], [mvt.ORIGIN_SHIFT, 0.0],
                     [mvt.ORIGIN_SHIFT, mvt.ORIGIN_SHIFT],
                     [0.0, mvt.ORIGIN_SHIFT], [0.0, 0.0]])
    g = wkb.decode(wkb.polygon(ring))
    gtype, parts = mvt.geom_to_mvt(g, 0, 0, 0, extent=4096)
    assert gtype == mvt.MVT_POLYGON and len(parts) == 1
    p = parts[0]
    assert p[:, 0].min() == 2048 and p[:, 1].min() == 0
    assert mvt._shoelace2(p[:-1]) > 0      # exterior positive in screen
    # degenerate: sliver thinner than a pixel collapses to None
    thin = np.array([[0.0, 0.0], [1e-3, 0.0], [1e-3, mvt.ORIGIN_SHIFT],
                     [0.0, mvt.ORIGIN_SHIFT], [0.0, 0.0]])
    assert mvt.geom_to_mvt(wkb.decode(wkb.polygon(thin)), 0, 0, 0) is None


def test_write_read_mvt_spark(spark, tmp_path):
    out = str(tmp_path / "tiles")
    lon = np.array([-120.0, -60.0, 0.5, 60.0, 120.0, 120.00001])
    lat = np.array([45.0, -30.0, 10.0, 0.5, -45.0, -45.00001])
    from gdal_spark.core.tilemath import latlon_to_meters
    mx, my = latlon_to_meters(lat, lon)
    rows = [(i, wkb.point(mx[i], my[i]), f"site{i}", float(i) / 2)
            for i in range(len(lon))]
    df = spark.createDataFrame(
        rows, "fid long, geom binary, name string, score double")
    manifest = mvt.write_mvt(df, out, zoom=2, layer="pages",
                             prop_cols=("name", "score")).collect()
    assert sum(m.n_features for m in manifest) == 6
    mvt.write_metadata(out, "pages", 2)
    assert os.path.exists(os.path.join(out, "metadata.json"))

    back = mvt.read_mvt(spark, out).collect()
    assert len(back) == 6
    by_fid = {r.fid: r for r in back}
    assert by_fid[0].layer == "pages"
    assert by_fid[0].props["name"] == "site0"
    assert by_fid[3].props["score"] == "1.5"
    # mercator coords survive within one pixel of quantization
    span = mvt.SPAN0 / 4
    for i in range(6):
        g = wkb.decode(bytes(by_fid[i].geom))
        assert abs(g.rings[0][0][0] - mx[i]) <= span / 4096 + 1e-9
        assert abs(g.rings[0][0][1] - my[i]) <= span / 4096 + 1e-9

    verts = mvt.read_mvt_vertices(spark, out).collect()
    assert len(verts) == 6
    assert all(0 <= v.ix < 4096 and 0 <= v.iy < 4096 for v in verts)


def test_write_mvt_polygon_spans_tiles(spark, tmp_path):
    out = str(tmp_path / "ptiles")
    # polygon straddling the z1 tile boundary at mx=0
    O = mvt.ORIGIN_SHIFT
    ring = np.array([[-O / 4, O / 4], [O / 4, O / 4], [O / 4, O / 2],
                     [-O / 4, O / 2], [-O / 4, O / 4]])
    df = spark.createDataFrame([(7, wkb.polygon(ring))],
                               "fid long, geom binary")
    man = {(m.x, m.y): m.n_features
           for m in mvt.write_mvt(df, out, zoom=1).collect()}
    assert set(man) == {(0, 0), (1, 0)}    # clipped into both NW/NE tiles
    back = mvt.read_mvt(spark, out).collect()
    assert len(back) == 2
    areas = []
    from gdal_spark.core.geomops import geom_area
    for r in back:
        areas.append(geom_area(wkb.decode(bytes(r.geom))))
    # two halves of the O/2 x O/4 rect, each O^2/16, quantized
    assert areas[0] == pytest.approx(O * O / 16, rel=1e-2)
    assert sum(areas) == pytest.approx(O * O / 8, rel=1e-2)
