"""StageRunner: lineage manifests, per-partition counts, crash-resume."""

from __future__ import annotations

import json
import os
import shutil

from gdal_spark.pipeline import run_canonical_job

SF_DIR = "/root/testdata/sf0.001"
from gdal_spark.plans.lineage import StageRunner


def test_canonical_job_and_manifests(spark, tmp_path):
    wd = str(tmp_path / "job")
    metrics = run_canonical_job(spark, n_pages=20000, workdir=wd)
    assert set(metrics) == {"pages", "pip_counts", "tile_density", "overview"}
    assert metrics["pages"]["rows"] == 20000
    # per-partition lineage present and sums to the stage total
    parts = metrics["pages"]["partitions"]
    assert parts and sum(p["rows"] for p in parts) == 20000
    # every page lands in exactly one grid cell; convex polys add extras
    with open(os.path.join(wd, "pip_counts", "_MANIFEST.json")) as f:
        m = json.load(f)
    assert m["rows"] >= 400  # regions hit
    assert m["upstream"].keys() == {"pages"}


def test_resume_skips_completed_stages(spark, tmp_path):
    wd = str(tmp_path / "job2")
    m1 = run_canonical_job(spark, n_pages=5000, workdir=wd)
    assert all(not v["resumed"] for v in m1.values())

    # simulate crash after 'pages': wipe everything downstream
    for st in ("pip_counts", "tile_density", "overview"):
        shutil.rmtree(os.path.join(wd, st))
    m2 = run_canonical_job(spark, n_pages=5000, workdir=wd)
    assert m2["pages"]["resumed"] is True
    assert m2["pip_counts"]["resumed"] is False

    # full rerun: everything resumes, nothing recomputed
    m3 = run_canonical_job(spark, n_pages=5000, workdir=wd)
    assert all(v["resumed"] for v in m3.values())


def test_incomplete_upstream_raises(spark, tmp_path):
    runner = StageRunner(spark, str(tmp_path / "job3"))
    try:
        runner.stage("b", lambda r: r.load("a"), upstream=["a"])
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "upstream" in str(e)


def test_multimodal_resize_and_frame_sample(spark):
    """Multimodal real-decode path: binary->binary resize map (decode PNG,
    resample, re-encode) and the 1->N frame explode with per-frame decode,
    both Arrow-batched with stable schemas."""
    import numpy as np

    from gdal_spark import datagen
    from gdal_spark.operators import multimodal as mm
    from gdal_spark.sources.png import decode_png

    imgs = datagen.doc_images(spark, SF_DIR, kind="gray").limit(50)
    rs = mm.resize_image(imgs, payload_col="payload", key_col="doc_id",
                         target=(8, 8), mode="bilinear")
    rows = rs.collect()
    assert len(rows) == 50
    for r in rows:
        arr, meta = decode_png(bytes(r.resized))
        assert arr.shape == (8, 8) and (r.out_w, r.out_h) == (8, 8)
        # bilinear of the deterministic ramp stays within source range
        src = datagen.image_array(int(r.doc_id), "gray")
        assert arr.min() >= 0 and arr.max() <= 255
        assert abs(float(arr.mean()) - float(src.mean())) < 32

    vids = datagen.doc_videos(spark, SF_DIR).limit(20)
    fr = mm.frame_sample(vids, payload_col="payload", key_col="doc_id",
                         every=2, max_frames=8)
    frows = fr.collect()
    assert len(frows) == 40                       # 2 of 4 frames per doc
    for r in frows:
        assert r.frame_idx in (0, 2)
        arr, _ = decode_png(bytes(r.frame))
        assert arr.shape == (8, 8)
        y, x = np.mgrid[0:8, 0:8]
        exp = ((int(r.doc_id) * 7 + 11 * r.frame_idx + 13 * x + 31 * y)
               % 256)
        assert (arr == exp).all()
        assert r.px_sum == int(exp.sum())


# ---------------------------------------------------------------------------
# round 2: snapshot-versioned tables (the Iceberg-semantics stand-in)
# ---------------------------------------------------------------------------

def test_snapshot_table_append_overwrite_time_travel(spark, tmp_path):
    from gdal_spark.plans.snapshot import SnapshotTable
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    v0 = t.commit_append(spark.range(5).selectExpr("id", "id * 2 AS x"))
    assert v0 == 0
    v1 = t.commit_append(spark.range(5, 8).selectExpr("id", "id * 2 AS x"))
    assert t.read().count() == 8
    assert t.read(version=v0).count() == 5          # time travel
    v2 = t.commit_overwrite(spark.range(2).selectExpr("id", "id * 2 AS x"))
    assert t.read().count() == 2
    assert t.read(version=v1).count() == 8          # history intact
    v3 = t.rollback(v1)
    assert t.read().count() == 8
    ops = [h["operation"] for h in t.history()]
    assert ops == ["append", "append", "overwrite", f"rollback-to-{v1}"]


def test_snapshot_uncommitted_data_invisible(spark, tmp_path):
    """Crash between data write and snapshot publish: the data directory
    exists but no reader can see it (snapshot isolation)."""
    from gdal_spark.plans.snapshot import SnapshotTable
    t = SnapshotTable(spark, str(tmp_path / "tbl2"))
    t.commit_append(spark.range(4).selectExpr("id"))
    # simulate a crashed writer: data files land, snapshot never publishes
    t._write_data(spark.range(100).selectExpr("id"))
    assert t.read().count() == 4


def test_stored_cell_column_prunes_scan(spark, tmp_path):
    """The geohash-column pattern (SURVEY §4 spatial-filter pushdown):
    cell-sorted table with a stored `cell` column -> bbox scan pushes the
    cell ranges into the parquet scan (PushedFilters) and returns exactly
    the brute-force bbox rows."""
    from pyspark.sql import functions as F

    from gdal_spark.pipeline import (cell_bbox_predicate, prepare_pages,
                                     pruned_cell_scan, synth_pages)

    path = str(tmp_path / "pages_cell")
    prepare_pages(spark, 20000, path, partitions=8, store_cell=True)
    tbl = spark.read.parquet(path)
    assert "cell" in tbl.columns

    bbox = (-30.0, 10.0, 40.0, 55.0)
    got = pruned_cell_scan(spark, path, *bbox)
    want = synth_pages(spark, 20000).where(
        (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
        & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3]))
    assert got.count() == want.count() > 0
    assert (sorted(r.doc_id for r in got.select("doc_id").collect())
            == sorted(r.doc_id for r in want.select("doc_id").collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    # the cell range comparisons reached the scan, not just lon/lat
    assert "GreaterThanOrEqual(cell" in plan or "cell#" in plan.split(
        "PushedFilters")[1][:4000]

    # the cover predicate is a true superset guard: every surviving row's
    # cell really is inside the coarse range
    pred_only = tbl.where(cell_bbox_predicate(*bbox))
    n_pred = pred_only.count()
    assert n_pred >= got.count()


def test_snapshot_compact_incremental_expire(spark, tmp_path):
    """Iceberg-maintenance twins: rewrite_data_files (compact),
    incremental append scan, expire_snapshots."""
    import os

    from gdal_spark.plans.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    v0 = t.commit_append(spark.range(0, 100).repartition(8))
    v1 = t.commit_append(spark.range(100, 130).repartition(4))
    v2 = t.commit_append(spark.range(130, 150).repartition(4))
    n_files_before = len(t._load_snapshot(v2)["files"])
    assert n_files_before >= 16

    # incremental: exactly the rows appended after v0
    inc = t.incremental_read(v0)
    assert sorted(r.id for r in inc.collect()) == list(range(100, 150))
    assert t.incremental_read(v2).count() == 0

    # compact: same rows, far fewer files, history records it
    v3 = t.compact(target_rows_per_file=100, sort_cols=("id",))
    files_after = t._load_snapshot(v3)["files"]
    assert len(files_after) <= 3
    assert sorted(r.id for r in t.read().collect()) == list(range(150))
    # old snapshot still readable (rewrite is metadata-atomic)
    assert t.read(v2).count() == 150
    assert t.history()[-1]["operation"] == "compact"

    # expire: only the compacted snapshot survives; orphans deleted
    stats = t.expire_snapshots(keep_last=1)
    assert stats["expired_snapshots"] == 3
    assert stats["removed_files"] >= n_files_before
    assert t.versions() == [v3]
    assert t.read().count() == 150
    live = set(t._load_snapshot(v3)["files"])
    on_disk = {os.path.join(r, f)
               for r, _d, fs in os.walk(str(tmp_path / "tbl" / "data"))
               for f in fs if f.endswith(".parquet")}
    assert on_disk == live


def test_snapshot_merge_copy_on_write(spark, tmp_path):
    """MERGE INTO semantics: matched keys update, new keys insert, the
    rewrite touches only files containing matched keys (file-granular
    copy-on-write), and time travel still reads the pre-merge state."""
    from gdal_spark.plans.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    # two appends -> two disjoint file sets
    t.commit_append(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string").repartition(1))
    v1 = t.commit_append(spark.createDataFrame(
        [(10, "x"), (11, "y")], "k long, v string").repartition(1))
    files_before = set(t._load_snapshot(v1)["files"])
    # upsert: update k=2, insert k=99 — only the FIRST append's file
    # contains a matched key
    v2 = t.merge(spark.createDataFrame(
        [(2, "B"), (99, "z")], "k long, v string"), key="k")
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {1: "a", 2: "B", 10: "x", 11: "y", 99: "z"}
    # time travel: pre-merge snapshot unchanged
    old = {r.k: r.v for r in t.read(v1).collect()}
    assert old == {1: "a", 2: "b", 10: "x", 11: "y"}
    # copy-on-write at file granularity: the untouched second-append
    # file carries over verbatim
    files_after = set(t._load_snapshot(v2)["files"])
    carried = files_before & files_after
    assert carried, "untouched files must carry into the merge snapshot"
    rows_carried = spark.read.parquet(*sorted(carried)).collect()
    assert {r.k for r in rows_carried} >= {10, 11}
    # merge of only-new keys touches nothing
    v3 = t.merge(spark.createDataFrame([(100, "q")], "k long, v string"),
                 key="k")
    assert files_after <= set(t._load_snapshot(v3)["files"])
    assert t.history()[-1]["operation"] == "merge"


def test_snapshot_delete_where_copy_on_write(spark, tmp_path):
    from gdal_spark.plans.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl2"))
    t.commit_append(spark.createDataFrame(
        [(1, 5), (2, 50)], "k long, v long").repartition(1))
    v1 = t.commit_append(spark.createDataFrame(
        [(3, 7), (4, 9)], "k long, v long").repartition(1))
    keep = set(t._load_snapshot(v1)["files"])
    v2 = t.delete_where("v >= 50")
    assert {r.k for r in t.read().collect()} == {1, 3, 4}
    assert {r.k for r in t.read(v1).collect()} == {1, 2, 3, 4}
    # second file had no matches: carried verbatim
    assert keep & set(t._load_snapshot(v2)["files"])
    assert t.history()[-1]["operation"] == "delete"
