"""OSM XML driver (ogr/ogrsf_frmts/osm — XML flavor; the node cache is
a distributed join here)."""

import json

import numpy as np
import pytest

from gdal_spark.core import wkb
from gdal_spark.core.geomops import geom_area
from gdal_spark.sources.osm import osm_layers, parse_osm, write_osm


@pytest.fixture()
def osm_file(tmp_path):
    nodes = [(1, 0.0, 0.0, {}), (2, 4.0, 0.0, {}), (3, 4.0, 4.0, {}),
             (4, 0.0, 4.0, {}),
             (10, 1.0, 1.0, {}), (11, 2.0, 1.0, {}), (12, 2.0, 2.0, {}),
             (13, 1.0, 2.0, {}),
             (20, 9.0, 9.0, {"amenity": "cafe", "name": "X"}),
             (21, 7.5, 2.5, {})]
    ways = [
        (100, [1, 2, 3], {"highway": "road"}),          # open way
        (101, [1, 2, 3, 4, 1], {"building": "yes"}),    # closed way
        (102, [1, 2], {}),                              # outer part 1
        (103, [2, 3, 4, 1], {}),                        # outer part 2
        (104, [10, 11, 12, 13, 10], {}),                # inner ring
    ]
    rels = [(200, [(102, "outer"), (103, "outer"), (104, "inner")],
             {"type": "multipolygon", "landuse": "park"})]
    p = str(tmp_path / "map.osm")
    write_osm(nodes, ways, rels, p)
    return p


def test_parse_tables(spark, osm_file):
    nodes, ways, rels = parse_osm(spark, osm_file)
    assert nodes.count() == 10
    w = {r.id: r for r in ways.collect()}
    assert w[100].refs == [1, 2, 3]
    assert json.loads(w[101].tags) == {"building": "yes"}
    r = rels.collect()[0]
    assert r.member_ways == [102, 103, 104]
    assert r.roles == ["outer", "outer", "inner"]


def test_layers(spark, osm_file):
    layers = osm_layers(spark, osm_file)
    pts = layers["points"].collect()
    assert len(pts) == 1 and pts[0].fid == 20
    assert json.loads(pts[0].tags)["amenity"] == "cafe"

    lines = {r.fid: r for r in layers["lines"].collect()}
    # ways 100 (3 nodes open), 102, 103 are open chains
    assert set(lines) == {100, 102, 103}
    g = wkb.decode(bytes(lines[100].geom))
    np.testing.assert_array_equal(
        g.rings[0], np.array([[0, 0], [4, 0], [4, 4]], float))

    polys = {r.fid: r for r in layers["polygons"].collect()}
    assert set(polys) == {101, 104}
    assert geom_area(wkb.decode(bytes(polys[101].geom))) == \
        pytest.approx(16.0)

    mps = layers["multipolygons"].collect()
    assert len(mps) == 1 and mps[0].fid == 200
    g = wkb.decode(bytes(mps[0].geom))
    # 4x4 outer stitched from two open ways, minus 1x1 inner
    assert len(g.rings) == 2
    assert geom_area(g) == pytest.approx(15.0)
    assert json.loads(mps[0].tags)["landuse"] == "park"
