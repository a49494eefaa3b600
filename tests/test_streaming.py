"""Structured Streaming: the same transformation over batch and stream must
agree (file source, availableNow drain, memory sink)."""

from __future__ import annotations

import shutil

from gdal_spark.streaming import events as sev

SF_DIR = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark, tmp_path):
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {(r.win_start, r.event_type): (r.n, round(r.sum_val, 6))
            for r in sev.windowed_event_counts(batch).collect()}

    src = tmp_path / "stream_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-000.parquet")
    stream = sev.stream_events_from_dir(spark, str(src), batch.schema)
    assert stream.isStreaming
    agg = sev.windowed_event_counts(stream)
    q = sev.run_available_now(agg, "evt_counts", str(tmp_path / "ckpt"))
    got = {(r.win_start, r.event_type): (r.n, round(r.sum_val, 6))
           for r in spark.sql("SELECT * FROM evt_counts").collect()}
    q.stop()
    assert got == want
