"""OSM PBF source tests (sources/osm_pbf.py): the vectorized packed-varint
lane, blob container scan, DenseNodes delta decode, tags, relations, and
layer-assembly parity with the XML flavor."""

import json
import random

import numpy as np
import pytest

from gdal_spark.sources import osm_pbf as P
from gdal_spark.sources.mvt import _put_varint, _zigzag


def test_unpack_varints_matches_scalar_codec():
    random.seed(11)
    vals = ([random.randint(0, 2**64 - 1) for _ in range(1000)]
            + [0, 1, 127, 128, 16383, 16384, 2**63 - 1, 2**64 - 1])
    buf = bytearray()
    for v in vals:
        _put_varint(buf, v if v < 2**63 else v - 2**64)
    dec = P.unpack_varints(bytes(buf))
    exp = [v if v < 2**63 else v - 2**64 for v in vals]
    assert dec.tolist() == exp


def test_unpack_sint_zigzag():
    random.seed(12)
    vals = [random.randint(-2**62, 2**62) for _ in range(500)] \
        + [0, -1, 1, -2**63, 2**63 - 1]
    buf = bytearray()
    for v in vals:
        _put_varint(buf, _zigzag(v))
    assert P.unpack_sint(bytes(buf)).tolist() == vals


def _fixture(tmp_path, n=250, blocks=64):
    nodes = [(i + 1, -3.0 + i * 0.0013, 51.0 + i * 0.0007,
              {"name": f"n{i}"} if i % 5 == 0 else {})
             for i in range(n)]
    ways = [(100 + g, [i + 1 for i in range(n) if i % 4 == g],
             {"highway": "primary", "ref": str(g)}) for g in range(4)]
    rels = [(900, [(100, "outer"), (101, "inner")],
             {"type": "multipolygon"})]
    path = str(tmp_path / "fix.osm.pbf")
    P.write_osm_pbf(nodes, ways, rels, path, nodes_per_block=blocks)
    return path, nodes, ways, rels


def test_blob_scan_and_roundtrip(spark, tmp_path):
    path, nodes, ways, rels = _fixture(tmp_path)
    blobs = P.scan_blobs(path)
    kinds = [k for k, _o, _s in blobs]
    assert kinds[0] == "OSMHeader" and kinds.count("OSMData") == 4

    n, w, r = P.read_osm_pbf(spark, path)
    nr = {row.id: row for row in n.collect()}
    assert len(nr) == len(nodes)
    for i, lon, lat, tg in nodes[::37]:
        # 1e-7-degree quantization, exactly floor(x*1e7+0.5)*100*1e-9
        assert nr[i].lon == 1e-9 * (100 * np.floor(lon * 1e7 + 0.5))
        assert nr[i].lat == 1e-9 * (100 * np.floor(lat * 1e7 + 0.5))
        assert json.loads(nr[i].tags) == tg
    wr = {row.id: row for row in w.collect()}
    for wid, refs, tg in ways:
        assert wr[wid].refs == refs
        assert json.loads(wr[wid].tags) == tg
    rr = r.collect()[0]
    assert rr.id == 900 and rr.member_ways == [100, 101]
    assert rr.roles == ["outer", "inner"]


def test_layer_assembly_matches_xml_flavor(spark, tmp_path):
    """The same fixture written as XML and as PBF must assemble identical
    line layers (modulo the PBF 1e-7 coordinate quantization)."""
    from gdal_spark.core import wkb as W
    from gdal_spark.sources.osm import osm_layers, write_osm

    # quantized coordinates so XML and PBF agree exactly
    nodes = [(i + 1, round(-3.0 + i * 0.0013, 7),
              round(51.0 + i * 0.0007, 7), {}) for i in range(60)]
    ways = [(7, [i + 1 for i in range(60)], {"ref": "x"})]
    xml = str(tmp_path / "a.osm")
    pbf = str(tmp_path / "a.osm.pbf")
    write_osm(nodes, ways, (), xml)
    P.write_osm_pbf(nodes, ways, (), pbf, nodes_per_block=25)
    lx = osm_layers(spark, xml)["lines"].collect()
    lp = P.osm_pbf_layers(spark, pbf)["lines"].collect()
    assert len(lx) == len(lp) == 1
    ax = W.decode(bytes(lx[0].geom)).rings[0]
    ap = W.decode(bytes(lp[0].geom)).rings[0]
    assert np.abs(ax - ap).max() < 5.1e-8


def test_open_dispatch(spark, tmp_path):
    from gdal_spark.sources import open_vector
    path, nodes, _w, _r = _fixture(tmp_path, n=40, blocks=16)
    pts = open_vector(spark, path)
    got = pts.count()
    assert got == sum(1 for _i, _lo, _la, tg in nodes if tg)
