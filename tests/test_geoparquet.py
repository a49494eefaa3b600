"""GeoParquet round-trip: geo footer metadata, covering bbox column,
bbox-filtered scan with pushdown."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.core import wkb
from gdal_spark.sources.geoparquet import (read_geo_metadata,
                                           read_geoparquet,
                                           write_geoparquet)


def _layer(spark, n=200):
    rows = []
    for i in range(n):
        x, y = (i % 20) * 5.0 - 50.0, (i // 20) * 7.0 - 35.0
        rows.append((i, wkb.box(x, y, x + 4.0, y + 6.0)))
    return spark.createDataFrame(rows, ["fid", "geom"]).repartition(4)


def test_roundtrip_and_metadata(spark, tmp_path):
    path = str(tmp_path / "layer.gpq")
    write_geoparquet(_layer(spark), path)
    meta = read_geo_metadata(path)
    assert meta["version"] == "1.1.0"
    assert meta["primary_column"] == "geom"
    col = meta["columns"]["geom"]
    assert col["encoding"] == "WKB"
    assert col["geometry_types"] == ["POLYGON"]
    assert col["crs"]["id"] == {"authority": "EPSG", "code": 4326}
    assert col["covering"]["bbox"]["xmin"] == ["geom_bbox", "xmin"]
    df, meta2 = read_geoparquet(spark, path)
    assert df.count() == 200
    assert meta2 == meta
    # per-file bbox covers that file's rows
    assert len(col["bbox"]) == 4
    r = df.where(F.col("fid") == 7).collect()[0]
    g = wkb.decode(bytes(r.geom))
    assert g.envelope() == (r.geom_bbox.xmin, r.geom_bbox.ymin,
                            r.geom_bbox.xmax, r.geom_bbox.ymax)


def test_bbox_filter_matches_brute_force_and_pushes_down(spark, tmp_path):
    path = str(tmp_path / "layer2.gpq")
    write_geoparquet(_layer(spark), path)
    bbox = (-12.0, -9.0, 13.0, 22.0)
    got, _ = read_geoparquet(spark, path, bbox=bbox)
    full, _ = read_geoparquet(spark, path)
    want = []
    for r in full.collect():
        e = wkb.decode(bytes(r.geom)).envelope()
        if e[0] <= bbox[2] and e[2] >= bbox[0] \
                and e[1] <= bbox[3] and e[3] >= bbox[1]:
            want.append(r.fid)
    got_ids = sorted(r.fid for r in got.select("fid").collect())
    assert got_ids == sorted(want) and got_ids
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "geom_bbox" in plan.split(
        "PushedFilters", 1)[1][:2000]
