"""WARC source/sink (ISO 28500): the Common Crawl container format."""
import pytest

from gdal_spark.sources.warc import (index_warc, read_warc, write_warc,
                                     _header)
from pyspark.sql import functions as F


def _pages(spark, n, parts=1):
    df = spark.range(n).select(
        F.concat(F.lit("https://ex.com/p/"), F.col("id")).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=F.col("id").cast("double")))
        .alias("warc_ts"),
        F.encode(F.concat(F.lit("<p>body "), F.col("id"), F.lit("</p>")),
                 "UTF-8").alias("html"))
    return df.repartition(parts)


def test_warc_roundtrip_single_partition(spark, tmp_path):
    path = str(tmp_path / "a.warc")
    assert write_warc(_pages(spark, 5), path) == 5
    out = {r.url: r for r in read_warc(spark, path).collect()}
    assert len(out) == 5
    r = out["https://ex.com/p/3"]
    assert bytes(r.payload) == b"<p>body 3</p>"
    assert r.warc_date == "2024-01-01T00:00:03Z"
    assert r.warc_type == "response"


def test_warc_distributed_write_has_no_gaps(spark, tmp_path):
    """Multi-partition write: prefix-sum offsets tile the file exactly —
    re-indexing must walk every record with no slack bytes."""
    import os
    path = str(tmp_path / "b.warc")
    n = write_warc(_pages(spark, 40, parts=7), path)
    assert n == 40
    idx = index_warc(path)
    assert len(idx) == 40
    last_off, last_len = idx[-1][0], idx[-1][1]
    assert last_off + last_len + 4 == os.path.getsize(path)
    assert {u for _, _, u, _, _ in idx} \
        == {f"https://ex.com/p/{i}" for i in range(40)}


def test_warc_header_bytes_exact():
    h = _header("https://x", "2024-01-01T00:00:00Z", 7)
    assert h == (b"WARC/1.0\r\nWARC-Type: response\r\n"
                 b"WARC-Target-URI: https://x\r\n"
                 b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
                 b"Content-Length: 7\r\n\r\n")


def test_warc_index_rejects_garbage(tmp_path):
    p = tmp_path / "bad.warc"
    p.write_bytes(b"HTTP/1.1 200 OK\r\n\r\nnope")
    with pytest.raises(ValueError):
        index_warc(str(p))


def test_warc_external_index_overrides_walk(spark, tmp_path):
    path = str(tmp_path / "c.warc")
    write_warc(_pages(spark, 3), path)
    idx = index_warc(path)[:2]         # CDX-style partial index
    got = read_warc(spark, path, index=idx).collect()
    assert len(got) == 2


def test_warc_gz_member_per_record_roundtrip(spark, tmp_path):
    import zlib
    path = str(tmp_path / "d.warc.gz")
    from gdal_spark.sources.warc import read_warc_gz, write_warc_gz
    idx = write_warc_gz(_pages(spark, 12, parts=3), path)
    rows = idx.collect()
    assert len(rows) == 12
    # members tile the file exactly, and each is independently gzip
    import os
    assert sum(r.len for r in rows) == os.path.getsize(path)
    with open(path, "rb") as f:
        r0 = sorted(rows, key=lambda r: r.off)[0]
        f.seek(r0.off)
        raw = zlib.decompress(f.read(r0.len), 16 + 15)
        assert raw.startswith(b"WARC/1.0\r\n")
    out = {r.url: bytes(r.payload)
           for r in read_warc_gz(spark, path, idx).collect()}
    assert out["https://ex.com/p/7"] == b"<p>body 7</p>"


def test_curation_job_ingests_warc(spark, tmp_path):
    """End-to-end: pages -> WARC archive -> curation job ingest stage
    recovers text byte-identically (the input_hint invariant) and the
    pipeline runs to publish."""
    import json as _json
    import subprocess
    import sys

    from gdal_spark import datagen
    from gdal_spark.sources.warc import write_warc

    sf = "/root/testdata/sf0.001"
    warc = str(tmp_path / "pages.warc")
    write_warc(datagen.pages(spark, sf), warc)

    out = subprocess.run(
        [sys.executable, "jobs/curation_job.py", "--input", warc,
         "--workdir", str(tmp_path / "wd")],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    stats = _json.loads(out.stdout.strip().splitlines()[-1])
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert stats["stages"]["ingest"]["rows"] == n_docs

    # byte-identical text per url vs the source documents table
    from gdal_spark.sources.warc import read_warc
    from pyspark.sql import functions as F
    got = read_warc(spark, warc).select(
        "url", F.regexp_extract(F.decode("payload", "UTF-8"),
                                "<p>(.*)</p>", 1).alias("text"))
    want = datagen.pages(spark, sf).select("url", "text")
    assert got.join(want, ["url", "text"]).count() == n_docs
