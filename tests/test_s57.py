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


def test_update_cells_apply(cell, spark, tmp_path):
    """ENC .001 update application (s57reader.cpp ApplyUpdates /
    ApplyRecordUpdate): RUIN insert/delete/modify with the strict RVER+1
    check, ATTF attribute merge, and SGCC coordinate splices — resolved
    through the distributed (RCNM, RCID) group fold."""
    import shutil

    base = str(tmp_path / "chart.000")
    shutil.copyfile(cell, base)
    upd = str(tmp_path / "chart.001")
    S.write_s57_update(
        upd,
        vec_updates=[
            # move the lighthouse node (modify, whole-SG2D replace)
            {"rcnm": "VI", "rcid": 1, "rver": 2, "ruin": 3,
             "pts": [(4.75, 52.75)]},
            # splice: REPLACE the 2 sag vertices of edge 20 with one
            {"rcnm": "VE", "rcid": 20, "rver": 2, "ruin": 3,
             "sgcc": (3, 1, 2), "pts": [(4.5, 51.8)]},
        ],
        feat_updates=[
            # delete the soundings feature
            {"rcid": 101, "rver": 2, "ruin": 2},
            # merge an attribute into the DEPARE area
            {"rcid": 103, "rver": 2, "ruin": 3, "attrs": {87: "5",
                                                          90: "x"}},
            # stale RVER (should be current+1=2, sends 4): REFUSED
            {"rcid": 100, "rver": 4, "ruin": 3, "attrs": {113: "red"}},
            # brand-new point feature on the moved node
            {"rcid": 200, "rver": 1, "ruin": 1, "prim": 1, "objl": 75,
             "foid": (540, 9001, 1),
             "fspt": [(S.RCNM_VI, 1, 255, 255)]},
        ])
    df = S.read_s57(spark, base)
    rows = {r.rcid: r for r in df.collect()}
    assert set(rows) == {100, 102, 103, 200}      # 101 deleted, 200 added
    # lighthouse (100) unchanged attrs (stale update refused), new coords
    assert rows[100].attrs == {113: "white"}
    np.testing.assert_allclose(W.decode(rows[100].geom).rings[0],
                               [[4.75, 52.75]], atol=1e-7)
    # new feature rides the same (moved) node
    np.testing.assert_allclose(W.decode(rows[200].geom).rings[0],
                               [[4.75, 52.75]], atol=1e-7)
    # area attrs merged (87 overwritten, 90 added)
    assert rows[103].attrs == {87: "5", 90: "x"}
    # the spliced edge: line 102 = edge 24 fwd + edge 20 REVERSED, whose
    # sag is now the single vertex (4.5, 51.8)
    g = W.decode(rows[102].geom)
    got = np.vstack(g.rings if g.rings else [p.rings[0] for p in g.parts])
    want = [[4.0, 52.0], [4.5, 52.4], [5.0, 53.0],
            [5.0, 52.0], [4.5, 51.8], [4.0, 52.0]]
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_fold_updates_unit():
    """fold_updates is a pure function: exercises insert-after-delete
    and splice insert/delete paths without Spark."""
    base = {"rcid": 1, "rver": 1, "ruin": 1,
            "xs": [1.0, 2.0, 3.0], "ys": [9.0, 8.0, 7.0]}
    dele = {"rcid": 1, "rver": 2, "ruin": 2}
    re_ins = {"rcid": 1, "rver": 1, "ruin": 1, "xs": [5.0], "ys": [5.0]}
    assert S.fold_updates([base, dele]) is None
    assert S.fold_updates([base, dele, re_ins])["xs"] == [5.0]
    ins = {"rcid": 1, "rver": 2, "ruin": 3, "sgcc": (1, 2, 0),
           "xs": [1.5], "ys": [8.5]}
    out = S.fold_updates([base, ins])
    assert out["xs"] == [1.0, 1.5, 2.0, 3.0]
    assert out["ys"] == [9.0, 8.5, 8.0, 7.0]
    rm = {"rcid": 1, "rver": 3, "ruin": 3, "sgcc": (2, 1, 2)}
    out = S.fold_updates([base, ins, rm])
    assert out["xs"] == [2.0, 3.0]
