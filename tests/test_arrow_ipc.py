"""Arrow IPC (Feather V2 + stream) round-trip: geo schema metadata,
batch-range task planning, stream fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from gdal_spark.core import wkb
from gdal_spark.sources.arrow_ipc import (read_arrow_ipc,
                                          read_ipc_metadata,
                                          write_arrow_ipc)


def _layer(spark, n=300):
    rows = []
    for i in range(n):
        x, y = (i % 20) * 5.0 - 50.0, (i // 20) * 7.0 - 35.0
        rows.append((i, wkb.box(x, y, x + 4.0, y + 6.0)))
    return spark.createDataFrame(rows, ["fid", "geom"]).repartition(4)


def _ids(df):
    return sorted(r.fid for r in df.select("fid").collect())


def test_file_format_roundtrip_and_metadata(spark, tmp_path):
    path = str(tmp_path / "layer.arrowdir")
    write_arrow_ipc(_layer(spark), path)
    schema, geo = read_ipc_metadata(path)
    assert geo["primary_column"] == "geom"
    assert geo["columns"]["geom"]["encoding"] == "WKB"
    assert geo["columns"]["geom"]["geometry_types"] == ["POLYGON"]
    df, geo2 = read_arrow_ipc(spark, path)
    assert geo2 == geo
    assert _ids(df) == list(range(300))
    r = df.where(F.col("fid") == 42).collect()[0]
    g = wkb.decode(bytes(r.geom))
    assert g.envelope() == (-40.0, -21.0, -36.0, -15.0)


def test_batch_range_tasks_cover_exactly_once(spark, tmp_path):
    path = str(tmp_path / "layer2.arrowdir")
    write_arrow_ipc(_layer(spark), path)
    # 1 batch per task forces the planner to split every file
    df, _ = read_arrow_ipc(spark, path, batches_per_task=1)
    assert _ids(df) == list(range(300))


def test_stream_format_roundtrip(spark, tmp_path):
    path = str(tmp_path / "layer3.arrowdir")
    write_arrow_ipc(_layer(spark, n=50), path, stream=True)
    import os
    assert all(f.endswith(".arrows") for f in os.listdir(path))
    df, geo = read_arrow_ipc(spark, path)
    assert geo["version"]
    assert _ids(df) == list(range(50))
