"""S-57 / ISO 8211 source (sources/s57.py) vs a hand-built fixture cell.

Layout semantics pinned against frmts/iso8211/ddfmodule.cpp (leader +
directory) and ogr/ogrsf_frmts/s57/s57reader.cpp (COMF scaling, edge
assembly begin-node + SG2D + end-node, ORNT=2 reversal, USAG=2 holes,
SG3D soundings)."""

import numpy as np
import pytest

from gdal_spark.core import wkb as W
from gdal_spark.sources import s57 as S


@pytest.fixture(scope="module")
def cell(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("s57") / "fixture.000")
    nodes = [
        (1, "VI", [(4.5, 52.5)]),                       # lighthouse point
        (2, "VI", [(4.1, 52.1, 12.5), (4.2, 52.2, 8.0),
                   (4.3, 52.3, 15.5)]),                 # soundings (SG3D)
        (10, "VC", [(4.0, 52.0)]),                      # edge endpoints
        (11, "VC", [(5.0, 52.0)]),
        (12, "VC", [(5.0, 53.0)]),
        (13, "VC", [(4.0, 53.0)]),
    ]
    edges = [
        (20, 10, 11, [(4.4, 51.9), (4.6, 51.9)]),       # south, with sag
        (21, 11, 12, []),                               # east
        (22, 12, 13, []),                               # north
        (23, 13, 10, []),                               # west
        (24, 10, 12, [(4.5, 52.4)]),                    # diagonal line
    ]
    feats = [
        # LIGHTS point on VI 1
        (100, 1, 75, (540, 1001, 1), {113: "white"},
         [(S.RCNM_VI, 1, 255, 255)]),
        # SOUNDG multipoint on VI 2
        (101, 1, 129, (540, 1002, 1), {},
         [(S.RCNM_VI, 2, 255, 255)]),
        # COALNE line over two edges, second reversed (24 then 20 rev)
        (102, 2, 30, (540, 1003, 1), {},
         [(S.RCNM_VE, 24, 1, 1), (S.RCNM_VE, 20, 2, 1)]),
        # DEPARE area: ring of 4 edges, all forward
        (103, 3, 42, (540, 1004, 1), {87: "2"},
         [(S.RCNM_VE, 20, 1, 1), (S.RCNM_VE, 21, 1, 1),
          (S.RCNM_VE, 22, 1, 1), (S.RCNM_VE, 23, 1, 1)]),
    ]
    S.write_s57(path, nodes, edges, feats)
    return path


def test_record_table_and_leader(cell):
    toc = S.scan_record_table(cell)
    assert len(toc) == 17          # DDR + DSPM + 6 nodes + 5 edges + 4 feats
    data = open(cell, "rb").read()
    assert sum(ln for _, ln in toc) == len(data)
    # DDR leader validity bytes (ddfmodule.cpp Open checks)
    assert data[5:6] == b"3" and data[6:7] == b"L"


def test_point_and_soundings(cell, spark):
    df = S.read_s57(spark, cell)
    rows = {r.rcid: r for r in df.collect()}
    assert set(rows) == {100, 101, 102, 103}
    light = rows[100]
    assert (light.objl, light.prim) == (75, 1)
    assert light.attrs == {113: "white"}
    g = W.decode(light.geom)
    np.testing.assert_allclose(g.rings[0], [[4.5, 52.5]], atol=1e-7)
    snd = rows[101]
    g = W.decode(snd.geom)
    pts = g.points()
    np.testing.assert_allclose(
        pts, [[4.1, 52.1], [4.2, 52.2], [4.3, 52.3]], atol=1e-7)
    assert snd.depths == [12.5, 8.0, 15.5]
    assert (snd.agen, snd.fidn, snd.fids) == (540, 1002, 1)


def test_line_assembly_with_reversal(cell, spark):
    df = S.read_s57(spark, cell)
    line = [r for r in df.collect() if r.rcid == 102][0]
    g = W.decode(line.geom)
    # edge 24 fwd: 10 -> (4.5,52.4) -> 12; edge 20 reversed: 11 -> sag
    # reversed -> 10; shared node 12/... no shared endpoint between the
    # two edges' junction here, so the chain concatenates:
    want = [[4.0, 52.0], [4.5, 52.4], [5.0, 53.0],      # edge 24 fwd
            [5.0, 52.0], [4.6, 51.9], [4.4, 51.9], [4.0, 52.0]]  # 20 rev
    got = np.vstack([r for r in g.rings] if g.rings
                    else [p.rings[0] for p in g.parts])
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_area_ring_closes(cell, spark):
    df = S.read_s57(spark, cell)
    area = [r for r in df.collect() if r.rcid == 103][0]
    assert area.attrs == {87: "2"}
    g = W.decode(area.geom)
    ring = g.rings[0]
    assert np.allclose(ring[0], ring[-1])
    # shoelace area: unit square minus nothing, plus the south sag
    x, y = ring[:-1, 0], ring[:-1, 1]
    a = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
    # square is 1.0 deg^2; sag dips 0.1 deg between x=4.0 and x=5.0
    assert 0.9 < a < 1.2
    # every vertex of the 4 edges present exactly once (plus closure)
    assert len(ring) == 4 + 2 + 1   # 4 corners + 2 sag verts + closure


def test_comf_precision_roundtrip(cell, spark):
    # int32 * 1e-7 deg quantization: written coords survive exactly
    df = S.read_s57(spark, cell)
    light = [r for r in df.collect() if r.rcid == 100][0]
    g = W.decode(light.geom)
    assert g.rings[0][0, 0] == pytest.approx(4.5, abs=5e-8)
