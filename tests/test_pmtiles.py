"""PMTiles v3 archive (ogr/ogrsf_frmts/pmtiles; protomaps spec/v3)."""

import numpy as np
import pytest

import gdal_spark.sources.pmtiles as P
from gdal_spark.core import wkb
from gdal_spark.sources.mvt import read_mvt, write_metadata, write_mvt
from gdal_spark.sources.pmtiles import (deserialize_directory, parse_header,
                                        read_pmtiles, serialize_directory,
                                        tileid_to_zxy, write_pmtiles,
                                        zxy_to_tileid)


def test_tileid_spec_anchors_and_inverse():
    # spec anchors: z0 -> 0; z1 starts at 1; z2 starts at 5
    assert zxy_to_tileid(0, 0, 0) == 0
    assert zxy_to_tileid(1, 0, 0) == 1
    assert zxy_to_tileid(2, 0, 0) == 5
    assert zxy_to_tileid(3, 0, 0) == 21
    # Hilbert adjacency: consecutive ids are grid neighbors
    prev = None
    for tid in range(5, 21):
        z, x, y = tileid_to_zxy(tid)
        assert z == 2
        if prev:
            assert abs(x - prev[0]) + abs(y - prev[1]) == 1
        prev = (x, y)
    # inverse property over a pyramid sample
    for z in (0, 1, 2, 5, 9):
        n = 1 << z
        for x in {0, n // 3, n - 1}:
            for y in {0, n // 2, n - 1}:
                assert tileid_to_zxy(zxy_to_tileid(z, x, y)) == (z, x, y)


def test_directory_codec_runs_and_contiguity():
    entries = [(3, 0, 100, 1), (4, 100, 50, 2), (9, 300, 20, 1)]
    assert deserialize_directory(serialize_directory(entries)) == entries


def _mvt_fixture(spark, tmp_path, n=60, zoom=3):
    from gdal_spark.core.tilemath import ORIGIN_SHIFT
    rng = np.random.RandomState(3)
    pts = [(i, wkb.encode(wkb.Geom(wkb.POINT, [np.array(
        [[rng.uniform(-ORIGIN_SHIFT * .9, ORIGIN_SHIFT * .9),
          rng.uniform(-ORIGIN_SHIFT * .9, ORIGIN_SHIFT * .9)]])])),
        f"n{i}") for i in range(n)]
    df = spark.createDataFrame(pts, "fid long, geom binary, name string")
    d = str(tmp_path / "tree")
    write_mvt(df, d, zoom=zoom, prop_cols=("name",)).collect()
    write_metadata(d, "layer0", zoom)
    return d


def test_pmtiles_roundtrip_equals_tree(spark, tmp_path):
    d = _mvt_fixture(spark, tmp_path)
    arch = str(tmp_path / "a.pmtiles")
    n = P.mvt_dir_to_pmtiles(spark, d, arch)
    assert n > 0
    tree = {(r.z, r.x, r.y, r.fid): (r.gtype, bytes(r.geom), dict(r.props))
            for r in read_mvt(spark, d).collect()}
    back_df, hdr = read_pmtiles(spark, arch)
    back = {(r.z, r.x, r.y, r.fid): (r.gtype, bytes(r.geom), dict(r.props))
            for r in back_df.collect()}
    assert back == tree
    assert hdr["min_zoom"] == hdr["max_zoom"] == 3
    assert hdr["clustered"] == 1 and hdr["tile_type"] == 1
    with open(arch, "rb") as f:
        assert parse_header(f.read(127))["n_entries"] == n


def test_pmtiles_leaf_directories(spark, tmp_path, monkeypatch):
    d = _mvt_fixture(spark, tmp_path, n=80, zoom=4)
    monkeypatch.setattr(P, "ROOT_CAP", 4)
    monkeypatch.setattr(P, "LEAF_SIZE", 8)
    arch = str(tmp_path / "leafy.pmtiles")
    P.mvt_dir_to_pmtiles(spark, d, arch)
    with open(arch, "rb") as f:
        hdr = parse_header(f.read(127))
    assert hdr["leaf_len"] > 0
    tree = {(r.z, r.x, r.y, r.fid) for r in read_mvt(spark, d).collect()}
    back_df, _ = read_pmtiles(spark, arch)
    assert {(r.z, r.x, r.y, r.fid) for r in back_df.collect()} == tree
