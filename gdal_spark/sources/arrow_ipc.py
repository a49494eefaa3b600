"""Arrow IPC (Feather V2) source/sink — twin of the reference's Arrow
driver (ogr/ogrsf_frmts/arrow/ogrfeatherwriterlayer.cpp writes the same
`geo` schema metadata as the Parquet driver; ogrfeatherlayer.cpp:60 reads
it back; both the random-access IPC *file* format and the sequential IPC
*stream* format are supported, matching the driver's .arrow/.arrows
split).

Spark-first distribution: the sink writes one footer-complete IPC file
per partition via pyarrow inside mapInPandas (no geometry bytes on the
driver). The reader plans tasks from IPC file footers ONLY — pyarrow's
open_file maps the footer and exposes per-batch random access, so the
driver holds O(files) metadata and each task reads just its
[start, start+n) record-batch slice (the IPC analog of parquet row-group
planning). Stream-format files have no footer, so each is one sequential
task — the same contract as the reference's sequential-only stream
layer."""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .geoparquet import _geo_meta


def _arrow_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(os.path.join(path, f) for f in os.listdir(path)
                      if f.endswith((".arrow", ".arrows", ".feather")))
    return [path]


def _is_stream(path: str) -> bool:
    # IPC file format opens with the "ARROW1" magic; streams start with
    # the encapsulated-message continuation marker 0xFFFFFFFF
    with open(path, "rb") as f:
        return f.read(6) != b"ARROW1"


def write_arrow_ipc(df: DataFrame, path: str, geom_col: str = "geom",
                    crs: str | None = "EPSG:4326",
                    stream: bool = False) -> None:
    """Write a WKB-geometry DataFrame as a directory of Arrow IPC part
    files (one per partition; Feather-V2 file format, or the stream
    format when stream=True), each carrying `geo` schema metadata."""
    from ..core import geomops, wkb as wkblib

    os.makedirs(path, exist_ok=True)
    fields = df.schema.fields
    ext = ".arrows" if stream else ".arrow"
    out_schema = T.StructType([T.StructField("file", T.StringType()),
                               T.StructField("n", T.LongType())])

    def write_part(batches):
        import uuid
        import pyarrow as pa
        import pyarrow.ipc as ipc
        pdfs = list(batches)
        if not pdfs:
            yield pd.DataFrame({"file": [], "n": []})
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        wkbs = pdf[geom_col].values
        envs = geomops.envelopes(wkbs)
        gtypes = {wkblib.TYPE_NAMES.get(wkblib.decode(bytes(b)).gtype,
                                        "Geometry")
                  for b in wkbs if b is not None}
        table = pa.Table.from_pydict({f.name: pdf[f.name] for f in fields})
        file_bbox = (envs[:, 0].min(), envs[:, 1].min(),
                     envs[:, 2].max(), envs[:, 3].max()) if len(envs) else None
        meta = _geo_meta(geom_col, "", file_bbox, gtypes, crs)
        schema = table.schema.with_metadata(
            {b"geo": json.dumps(meta).encode()})
        table = table.cast(schema)
        fname = f"part-{uuid.uuid4().hex}{ext}"
        opener = ipc.new_stream if stream else ipc.new_file
        with opener(os.path.join(path, fname), schema) as w:
            w.write_table(table)
        yield pd.DataFrame({"file": [fname], "n": [len(pdf)]})

    df.mapInPandas(write_part, out_schema).collect()


def read_ipc_metadata(path: str) -> tuple["object", dict | None]:
    """-> (pyarrow schema, geo metadata dict or None) from the first part
    file — footer/stream-head only, no record batches are read."""
    import pyarrow.ipc as ipc
    f0 = _arrow_files(path)[0]
    if _is_stream(f0):
        with ipc.open_stream(f0) as r:
            schema = r.schema
    else:
        with ipc.open_file(f0) as r:
            schema = r.schema
    md = schema.metadata or {}
    geo = json.loads(md[b"geo"]) if b"geo" in md else None
    return schema, geo


def read_arrow_ipc(spark: SparkSession, path: str,
                   batches_per_task: int = 16):
    """-> (DataFrame, geo_metadata). File-format parts are split into
    record-batch-range tasks planned from footers alone; stream-format
    parts read sequentially, one task per file."""
    import pyarrow.ipc as ipc

    schema, geo = read_ipc_metadata(path)
    work = []                     # (file, start_batch, n_batches); -1 = stream
    for f in _arrow_files(path):
        if _is_stream(f):
            work.append((f, -1, -1))
            continue
        with ipc.open_file(f) as r:
            nb = r.num_record_batches
        for s in range(0, nb, batches_per_task):
            work.append((f, s, min(batches_per_task, nb - s)))

    spark_schema = T.StructType([
        T.StructField(n, T.BinaryType() if str(t) in ("binary",
                                                      "large_binary")
                      else T.LongType() if str(t).startswith("int")
                      else T.DoubleType() if str(t) in ("double", "float")
                      else T.StringType())
        for n, t in zip(schema.names, schema.types)])

    if not work:
        return spark.createDataFrame([], spark_schema), geo

    wdf = spark.createDataFrame(
        pd.DataFrame(work, columns=["file", "start", "n"]))

    def read_task(batches):
        import pyarrow.ipc as ipc_
        for pdf in batches:
            for file, start, n in pdf.itertuples(index=False):
                if start < 0:
                    with ipc_.open_stream(file) as r:
                        yield r.read_all().to_pandas()
                    continue
                with ipc_.open_file(file) as r:
                    for i in range(start, start + n):
                        yield r.get_batch(i).to_pandas()

    return wdf.repartition(len(work)).mapInPandas(
        read_task, spark_schema), geo
