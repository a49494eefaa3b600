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


def test_streaming_pip_join_matches_batch(spark, tmp_path):
    """Stream-static spatial join: pages stream x broadcast region dim ->
    watermarked windowed per-region counts == the batch run (the canonical
    job's streaming twin, gdal_spark/streaming/geo.py)."""
    from pyspark.sql import functions as F

    from gdal_spark import datagen
    from gdal_spark.streaming import geo as sgeo

    pages = datagen.pages(spark, SF_DIR).select("warc_ts", "lon", "lat")
    regions = datagen.regions(spark).where(F.col("kind") == "grid") \
        .select("region_id", "geom", "cells", "in_masks", "out_masks")
    want = {(r.win_start, r.region_id): r.n_pages
            for r in sgeo.streaming_pip_counts(
                pages, regions, zoom=datagen.PIP_ZOOM).collect()}
    assert want

    src = tmp_path / "pages_src"
    src.mkdir()
    pages.write.parquet(str(src / "drop1"))
    stream = spark.readStream.schema(pages.schema) \
        .option("maxFilesPerTrigger", 4).parquet(str(src / "drop1"))
    agg = sgeo.streaming_pip_counts(stream, regions, zoom=datagen.PIP_ZOOM)
    q = sev.run_available_now(agg, "pip_counts_stream",
                              str(tmp_path / "ckpt2"))
    got = {(r.win_start, r.region_id): r.n_pages
           for r in spark.sql("SELECT * FROM pip_counts_stream").collect()}
    q.stop()
    assert got == want


def test_stateful_sessionization_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer == the batch window-function
    anchor, for every session CLOSED by a later event (the final open
    session per user stays in state — documented)."""
    from pyspark.sql import functions as F

    from gdal_spark.streaming import sessions as ss

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch = ss.sessionize_batch(events, gap_minutes=30.0)
    # drop each user's LAST session (stream side can't close it)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.col("sess_start").desc())
    closed_batch = batch.withColumn("_rn", F.row_number().over(w)) \
        .where(F.col("_rn") > 1).drop("_rn")
    want = {(r.user_id, r.sess_start): (r.n_events, r.sum_val)
            for r in closed_batch.collect()}
    assert want

    src = tmp_path / "ev_src"
    src.mkdir()
    # two chronological drops -> two triggers -> state must carry sessions
    # across the trigger boundary
    e = events.orderBy("ts")
    n = e.count()
    e1 = e.limit(n // 2)
    e2 = e.subtract(e1)
    e1.coalesce(1).write.parquet(str(src / "d1"))
    stream = spark.readStream.schema(events.schema) \
        .option("maxFilesPerTrigger", 1).parquet(str(src) + "/d*/")
    e2.coalesce(1).write.parquet(str(src / "d2"))
    agg = ss.sessionize_stateful(stream, gap_minutes=30.0)
    q = sev.run_available_now(agg, "sessions_stream",
                              str(tmp_path / "ckpt3"),
                              output_mode="append")
    got = {(r.user_id, r.sess_start): (r.n_events, r.sum_val)
           for r in spark.sql("SELECT * FROM sessions_stream").collect()}
    q.stop()
    assert got == want


def test_checkpoint_restart_resumes_incrementally(spark, tmp_path):
    """Checkpoint-resumable runs (the north rule's restart contract): drain
    drop1, stop, add drop2, restart from the SAME checkpoint — the second
    drain must process only the new files and the final state must equal a
    batch run over both drops."""
    import shutil as sh
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    half1 = batch.where("event_id % 2 = 0")
    half2 = batch.where("event_id % 2 = 1")
    src = tmp_path / "restart_src"
    src.mkdir()
    ckpt = str(tmp_path / "restart_ckpt")

    half1.write.parquet(str(src / "drop1"))
    sh.move(str(src / "drop1"), str(src / "d1"))
    for f in (src / "d1").glob("*.parquet"):
        sh.move(str(f), src / f.name)

    stream = sev.stream_events_from_dir(spark, str(src), batch.schema)
    q = sev.run_available_now(sev.windowed_event_counts(stream),
                              "restart_counts", ckpt)
    q.stop()
    n_first = spark.sql("SELECT count(*) FROM restart_counts").collect()[0][0]
    assert n_first > 0

    half2.write.parquet(str(src / "drop2"))
    for f in (src / "drop2").glob("*.parquet"):
        sh.move(str(f), src / ("b_" + f.name))

    stream2 = sev.stream_events_from_dir(spark, str(src), batch.schema)
    q2 = sev.run_available_now(sev.windowed_event_counts(stream2),
                               "restart_counts2", ckpt)
    # the restarted query reuses the checkpoint: progress shows only the
    # NEW input rows were read in this drain
    prog = q2.recentProgress
    q2.stop()
    rows_read = sum(p["numInputRows"] for p in prog)
    assert rows_read <= half2.count() + 1      # not a full re-read

    want = {(r.win_start, r.event_type): (r.n, round(r.sum_val, 6))
            for r in sev.windowed_event_counts(batch).collect()}
    got = {(r.win_start, r.event_type): (r.n, round(r.sum_val, 6))
           for r in spark.sql("SELECT * FROM restart_counts2").collect()}
    assert got == want


def test_streaming_dedup_matches_batch_distinct(spark, tmp_path):
    """Watermarked dropDuplicatesWithinWatermark over two file drops with
    overlapping content == batch dropDuplicates on the union (all rows
    inside the watermark here)."""
    from pyspark.sql import functions as F
    from gdal_spark.streaming import dedup as sdd
    from gdal_spark.streaming import events as sev

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .withColumn("warc_ts", F.timestamp_seconds(
            F.lit(1700000000) + F.col("doc_id") % 600))
    half1 = docs.where(F.col("doc_id") % 2 == 0)
    # second drop: re-delivers some of drop 1 (doc_id % 4 == 0) + the rest
    half2 = docs.where((F.col("doc_id") % 2 == 1)
                       | (F.col("doc_id") % 4 == 0))
    src = tmp_path / "dedup_src"
    src.mkdir()
    half1.write.parquet(str(src / "d1.parquet"))
    half2.write.parquet(str(src / "d2.parquet"))

    union = half1.unionByName(half2)
    want = sdd.streaming_dedup(union).count()
    assert want == docs.count()        # batch plane: one row per content

    stream = sev.stream_events_from_dir(spark, str(src) + "/*/",
                                        docs.schema)
    out = sdd.streaming_dedup(stream)
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck_dd"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM dedup_out")
    assert got.count() == want
    assert got.select("doc_id").distinct().count() == want
    q.stop()


def test_streaming_geoparse_tiles_matches_batch(spark, tmp_path):
    import pyspark.sql.functions as F

    from gdal_spark import datagen
    from gdal_spark.streaming import geo as sgeo

    d = datagen.documents(spark, SF_DIR).limit(200)
    pages = d.select(
        "doc_id",
        F.concat(F.lit('x geo:'),
                 ((F.col("doc_id") * 7919) % 17000 - 8500).cast("string"),
                 F.lit(";"),
                 ((F.col("doc_id") * 104729) % 36000 - 18000)
                 .cast("string"), F.lit(" y")).alias("html_txt"),
        F.timestamp_seconds(1700000000 + F.col("doc_id") * 60)
        .alias("warc_ts"))
    src = str(tmp_path / "gp_src")
    pages.write.parquet(src)

    want = sorted(map(tuple, sgeo.streaming_geoparse_tiles(
        spark.read.parquet(src)).collect()))

    stream = spark.readStream.schema(pages.schema).parquet(src)
    agg = sgeo.streaming_geoparse_tiles(stream)
    q = (agg.writeStream.format("memory").queryName("gp_tiles")
         .outputMode("complete").start())
    q.processAllAvailable()
    got = sorted(map(tuple,
                     spark.sql("select * from gp_tiles").collect()))
    q.stop()
    assert got == want and len(got) > 5


def test_stream_mvt_sink_accumulates_tiles(spark, tmp_path):
    import numpy as np
    import pyspark.sql.functions as F

    from gdal_spark.core import wkb
    from gdal_spark.core.tilemath import latlon_to_meters
    from gdal_spark.sources import mvt as _mvt
    from gdal_spark.streaming import geo as sgeo

    lon = np.array([-120.0, -60.0, 0.5, 60.0])
    lat = np.array([45.0, -30.0, 10.0, 0.5])
    mx, my = latlon_to_meters(lat, lon)
    rows = [(i, wkb.point(mx[i], my[i])) for i in range(4)]
    src = str(tmp_path / "mvt_src")
    spark.createDataFrame(rows, "fid long, geom binary") \
        .repartition(2).write.parquet(src)

    stream = spark.readStream.schema("fid long, geom binary").parquet(src)
    out = str(tmp_path / "mvt_tiles")
    q = sgeo.stream_mvt_sink(stream, out, zoom=2,
                             checkpoint=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    back = _mvt.read_mvt(spark, out).collect()
    assert sorted(r.fid for r in back) == [0, 1, 2, 3]


def test_streaming_c4_curation_matches_batch(spark, tmp_path):
    """The C4 cleaning pass is stateless column math, so the SAME
    function body runs on a stream unchanged — stream(availableNow)
    over two file drops must equal the batch pass over their union."""
    from pyspark.sql import functions as F

    from gdal_spark.operators.textops import c4_filters
    from gdal_spark.streaming import events as sev

    docs = spark.createDataFrame(
        [(i, "\n".join(
            [f"w{i} one two three four five.",
             "javascript bad line here ok.",
             "a b c d e f!",
             "x y z w v."] + (["lorem ipsum kills this page."]
                              if i % 5 == 0 else [])))
         for i in range(40)],
        "doc_id long, text string")
    src = tmp_path / "c4_src"
    src.mkdir()
    docs.where("doc_id < 20").write.parquet(str(src / "d1.parquet"))
    docs.where("doc_id >= 20").write.parquet(str(src / "d2.parquet"))

    batch = {r.doc_id: (r.n_kept, r.keep, r.text)
             for r in c4_filters(docs).collect()}
    assert any(v[1] == 0 for v in batch.values())
    assert any(v[1] == 1 for v in batch.values())

    stream = sev.stream_events_from_dir(spark, str(src) + "/*/",
                                        docs.schema)
    q = (c4_filters(stream).writeStream.format("memory")
         .queryName("c4_out").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck_c4"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.doc_id: (r.n_kept, r.keep, r.text)
           for r in spark.sql("SELECT * FROM c4_out").collect()}
    assert got == batch


def test_streaming_minhash_band_claims(spark, tmp_path):
    """Online near-dup gate: stateless band keys run on the stream;
    watermarked dropDuplicatesWithinWatermark awards each band key to
    one claimant. Claimed KEY set must equal the batch anchor's; an
    exact late copy never co-wins a key with its original; fresh docs
    win all 16 bands."""
    from pyspark.sql import functions as F

    from gdal_spark.streaming.dedup import (minhash_band_claims,
                                            near_dup_survivors)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").where("doc_id < 30") \
        .withColumn("warc_ts", F.timestamp_seconds(
            F.lit(1700000000) + F.col("doc_id")))
    copies = docs.where("doc_id < 5").select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text",
        F.timestamp_seconds(F.lit(1700003600)
                            + F.col("doc_id")).alias("warc_ts"))
    src = tmp_path / "nd_src"
    src.mkdir()
    docs.write.parquet(str(src / "d1.parquet"))
    copies.write.parquet(str(src / "d2.parquet"))

    batch = docs.unionByName(copies)
    bclaims = minhash_band_claims(batch).collect()
    bkeys = {(r.band, r.key) for r in bclaims}
    surv = {r.doc_id: r.n_won for r in
            near_dup_survivors(batch).collect()}
    assert all(surv.get(d + 1000) is None for d in range(5))  # copies lose
    assert any(v == 16 for v in surv.values())                # fresh docs

    from gdal_spark.streaming import events as sev
    stream = sev.stream_events_from_dir(spark, str(src) + "/*/",
                                        batch.schema)
    q = (minhash_band_claims(stream).writeStream.format("memory")
         .queryName("nd_out").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck_nd"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM nd_out").collect()
    gkeys = {(r.band, r.key) for r in got}
    assert gkeys == bkeys                      # same claimed key space
    # one winner per key
    assert len(got) == len(gkeys)
    winners = {}
    for r in got:
        winners.setdefault((r.band, r.key), set()).add(r.doc_id)
    # an exact copy's 16 keys equal its original's: never both present
    for k, who in winners.items():
        assert not ({d for d in who} >= {0, 1000})
