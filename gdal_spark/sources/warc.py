"""WARC (ISO 28500) source + sink: the Common Crawl container format.

The input tables of this engine are Common-Crawl-shaped pages; WARC is
how those pages arrive from the crawler. Records are
`WARC/1.0` header blocks (Target-URI, Date, Content-Length) followed by
the payload and a CRLF CRLF terminator.

Distribution contract (same shape as the shapefile/FlatGeobuf sinks):
- WRITE is two-pass: phase 1 computes per-partition record byte totals
  (header sizes are exact functions of the row), the driver turns them
  into base offsets with a prefix sum and preallocates the file, phase 2
  re-evaluates each partition and pwrites its disjoint byte range — a
  billion-record WARC writes with O(#partitions) driver memory.
- READ indexes on the driver by walking HEADERS ONLY (seek past each
  payload via Content-Length — O(records) small reads, no payload
  traffic), then executors fetch their records' byte ranges in
  parallel. For .warc.gz archives with one gzip member per record (the
  Common Crawl layout) pass the member offsets from the CDX index as
  `index`; the header walk is the plain-`.warc` fallback.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"

READ_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("payload", T.BinaryType())])


def _header(url: str, date: str, n: int) -> bytes:
    return (f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Length: {n}\r\n\r\n").encode()


def write_warc(pages: DataFrame, path: str, url_col: str = "url",
               ts_col: str = "warc_ts",
               payload_col: str = "html") -> int:
    """pages -> one .warc file, written by executors. Returns records."""
    d = pages.select(
        F.col(url_col).alias("u"),
        F.date_format(F.col(ts_col), _DATE_FMT).alias("ds"),
        F.col(payload_col).alias("p"))
    d = d.persist()
    pid_df = d.withColumn("__pid", F.spark_partition_id())

    stat_schema = T.StructType([T.StructField("pid", T.IntegerType()),
                                T.StructField("n", T.LongType()),
                                T.StructField("nbytes", T.LongType())])

    def stats(batches):
        pid, n, nbytes = -1, 0, 0
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["__pid"].iloc[0])
            for r in pdf.itertuples():
                body = bytes(r.p)
                nbytes += len(_header(r.u, r.ds, len(body))) \
                    + len(body) + 4
                n += 1
        yield pd.DataFrame([(pid, n, nbytes)],
                           columns=["pid", "n", "nbytes"])

    parts = [r for r in pid_df.mapInPandas(stats, stat_schema).collect()
             if r.pid >= 0]
    parts.sort(key=lambda r: r.pid)
    base, off = {}, 0
    for r in parts:
        base[int(r.pid)] = off
        off += int(r.nbytes)
    total = off

    with open(path, "wb") as f:
        f.truncate(total)

    bb = d.sparkSession.sparkContext.broadcast(base)

    def emit(batches):
        fh = open(path, "r+b")
        seeked = False
        for pdf in batches:
            if len(pdf) and not seeked:
                fh.seek(bb.value[int(pdf["__pid"].iloc[0])])
                seeked = True
            for r in pdf.itertuples():
                body = bytes(r.p)
                fh.write(_header(r.u, r.ds, len(body)))
                fh.write(body)
                fh.write(b"\r\n\r\n")
        fh.close()
        yield pd.DataFrame({"n": [1]})

    pid_df.mapInPandas(
        emit, T.StructType([T.StructField("n", T.IntegerType())])).count()
    d.unpersist()
    return sum(int(r.n) for r in parts)


def index_warc(path: str) -> list:
    """Header-only driver pass -> [(payload_off, length, url, date,
    rec_type), ...]. Seeks past every payload; never reads one."""
    out = []
    with open(path, "rb") as f:
        size = f.seek(0, 2)
        f.seek(0)
        pos = 0
        while pos < size:
            f.seek(pos)
            head = f.read(4096)
            end = head.find(b"\r\n\r\n")
            while end < 0 and len(head) < 1 << 20:
                more = f.read(4096)
                if not more:
                    break
                head += more
                end = head.find(b"\r\n\r\n")
            if end < 0:
                raise ValueError(f"unterminated WARC header at {pos}")
            fields = {}
            lines = head[:end].decode("utf-8", "replace").split("\r\n")
            if not lines[0].startswith("WARC/"):
                raise ValueError(f"bad WARC version line at {pos}")
            for ln in lines[1:]:
                k, _, v = ln.partition(":")
                fields[k.strip().lower()] = v.strip()
            clen = int(fields["content-length"])
            out.append((pos + end + 4, clen,
                        fields.get("warc-target-uri", ""),
                        fields.get("warc-date", ""),
                        fields.get("warc-type", "")))
            pos += end + 4 + clen + 4
    return out


def read_warc(spark: SparkSession, path: str,
              index: list | None = None) -> DataFrame:
    """-> (url, warc_date, warc_type, payload). `index` overrides the
    driver header walk with externally-known (offset, length, url,
    date, type) tuples (e.g. from a Common Crawl CDX index)."""
    idx = index if index is not None else index_warc(path)
    rows = pd.DataFrame(idx, columns=["off", "len", "url", "ds", "ty"])
    rdf = spark.createDataFrame(rows, schema=T.StructType([
        T.StructField("off", T.LongType()),
        T.StructField("len", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("ds", T.StringType()),
        T.StructField("ty", T.StringType())]))
    cols = [f.name for f in READ_SCHEMA.fields]

    def fetch(batches):
        with open(path, "rb") as fh:
            for pdf in batches:
                recs = []
                for r in pdf.itertuples():
                    fh.seek(int(r.off))
                    recs.append((r.url, r.ds, r.ty,
                                 fh.read(int(r.len))))
                yield pd.DataFrame(recs, columns=cols)

    return rdf.mapInPandas(fetch, READ_SCHEMA)


# ---------------------------------------------------------------------------
# .warc.gz: one gzip member per record (the Common Crawl layout) + index
# ---------------------------------------------------------------------------

INDEX_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("off", T.LongType()),
    T.StructField("len", T.LongType())])


def _gzip_member(data: bytes) -> bytes:
    """Deterministic gzip (no filename, mtime=0): zlib stream with the
    gzip16 wrapper — the same bytes from every executor."""
    import zlib
    c = zlib.compressobj(9, zlib.DEFLATED, 16 + 15)
    return c.compress(data) + c.flush()


def write_warc_gz(pages: DataFrame, path: str, url_col: str = "url",
                  ts_col: str = "warc_ts",
                  payload_col: str = "html") -> DataFrame:
    """pages -> .warc.gz with ONE GZIP MEMBER PER RECORD (Common
    Crawl's layout: any record is randomly accessible by byte range)
    plus a RETURNED index DataFrame (url, warc_date, off, len) — the
    columnar CDX: persist it as parquet next to the archive and
    read_warc_gz never touches a byte it doesn't need.

    Phase 2 recompresses and VERIFIES each member's length against the
    phase-1 layout before pwriting — a zlib version skew on a
    heterogeneous cluster raises instead of silently corrupting the
    archive (same safeguard as the PMTiles sink)."""
    d = pages.select(
        F.col(url_col).alias("u"),
        F.date_format(F.col(ts_col), _DATE_FMT).alias("ds"),
        F.col(payload_col).alias("p"))
    d = d.persist()
    pid_df = d.withColumn("__pid", F.spark_partition_id())

    stat_schema = T.StructType([T.StructField("pid", T.IntegerType()),
                                T.StructField("nbytes", T.LongType())])

    def _member(u, ds, body):
        return _gzip_member(_header(u, ds, len(body)) + body
                            + b"\r\n\r\n")

    def stats(batches):
        pid, nbytes = -1, 0
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["__pid"].iloc[0])
            for r in pdf.itertuples():
                nbytes += len(_member(r.u, r.ds, bytes(r.p)))
        yield pd.DataFrame([(pid, nbytes)], columns=["pid", "nbytes"])

    parts = [r for r in pid_df.mapInPandas(stats, stat_schema).collect()
             if r.pid >= 0]
    parts.sort(key=lambda r: r.pid)
    base, off = {}, 0
    for r in parts:
        base[int(r.pid)] = (off, int(r.nbytes))
        off += int(r.nbytes)
    with open(path, "wb") as f:
        f.truncate(off)
    bb = d.sparkSession.sparkContext.broadcast(base)

    def emit(batches):
        fh, pos, limit = open(path, "r+b"), None, None
        rows = []
        for pdf in batches:
            if len(pdf) and pos is None:
                pos, nb = bb.value[int(pdf["__pid"].iloc[0])]
                limit = pos + nb
            for r in pdf.itertuples():
                blob = _member(r.u, r.ds, bytes(r.p))
                # zlib skew between phase 1 and phase 2 would shift
                # every following member: never write past this
                # partition's laid-out range, and fail loudly
                if pos + len(blob) > limit:
                    raise IOError(
                        "warc.gz member length drifted from layout "
                        "(zlib version skew across executors?)")
                fh.seek(pos)
                fh.write(blob)
                rows.append((r.u, r.ds, pos, len(blob)))
                pos += len(blob)
        if pos is not None and pos != limit:
            raise IOError("warc.gz partition underfilled its range "
                          "(zlib version skew across executors?)")
        fh.close()
        yield pd.DataFrame(rows, columns=["url", "warc_date", "off",
                                          "len"])

    idx = pid_df.mapInPandas(emit, INDEX_SCHEMA)
    # the index materializes the write; cache so re-reads don't rewrite
    idx = idx.persist()
    idx.count()
    d.unpersist()
    return idx


def read_warc_gz(spark: SparkSession, path: str,
                 index: DataFrame) -> DataFrame:
    """(index as written by write_warc_gz, or loaded from its parquet)
    -> (url, warc_date, warc_type, payload): each task inflates only
    its own records' gzip members by byte range."""
    import zlib

    cols = [f.name for f in READ_SCHEMA.fields]

    def fetch(batches):
        with open(path, "rb") as fh:
            for pdf in batches:
                recs = []
                for r in pdf.itertuples():
                    fh.seek(int(r.off))
                    raw = zlib.decompress(fh.read(int(r.len)), 16 + 15)
                    end = raw.find(b"\r\n\r\n")
                    fields = {}
                    for ln in raw[:end].decode().split("\r\n")[1:]:
                        k, _, v = ln.partition(":")
                        fields[k.strip().lower()] = v.strip()
                    clen = int(fields["content-length"])
                    recs.append((fields.get("warc-target-uri", ""),
                                 fields.get("warc-date", ""),
                                 fields.get("warc-type", ""),
                                 raw[end + 4:end + 4 + clen]))
                yield pd.DataFrame(recs, columns=cols)

    return index.select("off", "len").mapInPandas(fetch, READ_SCHEMA)
