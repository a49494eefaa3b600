"""TopoJSON source (sources/topojson.py) vs hand-built topologies.

Arc semantics pinned against ogrtopojsonreader.cpp ParseArc: quantized
arcs decode by running sum then scale+translate, negative index ~i
reverses, consecutive arcs drop the duplicated junction vertex."""

import json

import numpy as np
import pytest

from gdal_spark.core import wkb as W
from gdal_spark.sources import topojson as TJ


def test_shared_arc_stitching_and_reversal(spark, tmp_path):
    """Two polygons sharing one border arc (the canonical TopoJSON
    example): the left ring uses arc 1 forward, the right ring uses
    ~1 (reversed); junction vertices never duplicate."""
    topo = {
        "type": "Topology",
        "transform": {"scale": [1.0, 1.0], "translate": [0.0, 0.0]},
        "arcs": [
            # arc 0: left ring open part (1,1)->(0,1)->(0,0)->(1,0)
            [[1, 1], [-1, 0], [0, -1], [1, 0]],
            # arc 1: the SHARED border (1,0)->(1,1), delta-encoded
            [[1, 0], [0, 1]],
            # arc 2: right ring open part (1,0)->(2,0)->(2,1)->(1,1)
            [[1, 0], [1, 0], [0, 1], [-1, 0]],
        ],
        "objects": {"zones": {"type": "GeometryCollection", "geometries": [
            {"type": "Polygon", "arcs": [[0, 1]], "id": 1,
             "properties": {"side": "left"}},
            # right ring: the SHARED border reversed (~1: (1,1)->(1,0)),
            # then its own open part back to (1,1)
            {"type": "Polygon", "arcs": [[-2, 2]], "id": 2,
             "properties": {"side": "right"}},
        ]}},
    }
    path = str(tmp_path / "zones.topojson")
    with open(path, "w") as f:
        json.dump(topo, f)
    from gdal_spark.sources import open_vector
    rows = {r.fid: r for r in open_vector(spark, path).collect()}
    left = W.decode(rows[1].geom)
    np.testing.assert_allclose(
        left.rings[0],
        [[1, 1], [0, 1], [0, 0], [1, 0], [1, 1]], atol=1e-12)
    right = W.decode(rows[2].geom)
    # ~1 = shared border reversed (1,1)->(1,0), then arc 2 forward with
    # its first (junction) vertex dropped
    np.testing.assert_allclose(
        right.rings[0],
        [[1, 1], [1, 0], [2, 0], [2, 1], [1, 1]], atol=1e-12)
    assert json.loads(rows[1].props) == {"side": "left"}
    # shoelace: both unit squares
    for fid in (1, 2):
        ring = W.decode(rows[fid].geom).rings[0]
        x, y = ring[:-1, 0], ring[:-1, 1]
        a = 0.5 * abs(np.dot(x, np.roll(y, -1))
                      - np.dot(np.roll(x, -1), y))
        assert a == pytest.approx(1.0)


def test_quantized_roundtrip_writer(spark, tmp_path):
    path = str(tmp_path / "fx.topojson")
    line = W.Geom(W.LINESTRING, [np.array([[4.1, 52.0], [4.2, 52.1],
                                           [4.25, 52.05]])])
    pt = W.Geom(W.POINT, [np.array([[19.0458, 47.507]])])
    poly = W.Geom(W.POLYGON, [np.array([[0.0, 0.0], [1.0, 0.0],
                                        [1.0, 1.0], [0.0, 0.0]])])
    TJ.write_topojson(path, {"layer": [(1, {"k": "v"}, line),
                                       (2, {}, pt), (3, {}, poly)]})
    rows = {r.fid: r for r in TJ.read_topojson(spark, path).collect()}
    np.testing.assert_allclose(W.decode(rows[1].geom).rings[0],
                               line.rings[0], atol=1e-7)
    np.testing.assert_allclose(W.decode(rows[2].geom).rings[0],
                               pt.rings[0], atol=1e-7)
    got = W.decode(rows[3].geom)
    assert got.gtype == W.POLYGON
    np.testing.assert_allclose(got.rings[0], poly.rings[0], atol=1e-7)
