"""PGDump SQL sink (ogr/ogrsf_frmts/pgdump/ogrpgdumpdatasource.cpp,
ogrpgdumplayer.cpp — OGR's write-only PostgreSQL dump driver).

Emits one .sql file a psql client can replay: CREATE TABLE +
AddGeometryColumn, then COPY ... FROM STDIN with tab-separated rows —
geometry as hex EWKB (WKB with the 0x20000000 SRID flag, like
OGRGeometryToHexEWKB), attributes COPY-escaped (ogrpgdumplayer.cpp
OGRPGDumpEscapeString / CopyFieldsExceptGeom: backslash, tab, newline,
CR; NULL -> \\N).

Scale shape: the COPY body is the whole corpus, so it writes like the
Shapefile/FlatGeobuf sinks — persist the input, phase 1 measures each
partition's exact byte length (spark_partition_id + mapInPandas), the
driver prefix-sums base offsets and writes header/footer, phase 2
re-renders each partition identically and pwrites its slice. O(#parts)
driver memory, no driver pass over rows.
"""

from __future__ import annotations

import os
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _pg_type(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return "INTEGER"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.FloatType):
        return "FLOAT4"
    if isinstance(dt, (T.DoubleType, T.DecimalType)):
        return "FLOAT8"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.TimestampType):
        return "TIMESTAMP"
    if isinstance(dt, T.BinaryType):
        return "BYTEA"
    return "VARCHAR"


def _ewkb_hex(wkb_bytes: bytes, srid: int) -> str:
    """little-endian WKB -> hex EWKB with SRID flag (PostGIS form)."""
    gtype = struct.unpack_from("<I", wkb_bytes, 1)[0]
    return (wkb_bytes[:1] + struct.pack("<II", gtype | 0x20000000, srid)
            + wkb_bytes[5:]).hex().upper()


def _copy_escape(v) -> str:
    if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (bytes, bytearray)):
        return "\\\\x" + bytes(v).hex()
    s = str(v)
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
            .replace("\n", "\\n").replace("\r", "\\r"))


def write_pgdump(df: DataFrame, path: str, *, table: str = "layer",
                 schema_name: str = "public", geom_col: str = "geom",
                 srid: int = 4326, geom_type: str = "GEOMETRY",
                 dim: int = 2) -> int:
    """(.., geom WKB, ..) DataFrame -> one PostgreSQL dump .sql file.
    Returns the feature count."""
    attrs = [f for f in df.schema.fields if f.name != geom_col]
    has_geom = geom_col in df.columns
    cols = ([f'"wkb_geometry"'] if has_geom else []) + \
        [f'"{f.name.lower()}"' for f in attrs]

    def render(pdf: pd.DataFrame) -> bytes:
        out = []
        it_geom = pdf[geom_col] if has_geom else None
        attr_vals = [pdf[f.name] for f in attrs]
        for i in range(len(pdf)):
            fields = []
            if has_geom:
                g = it_geom.iloc[i]
                fields.append("\\N" if g is None
                              else _ewkb_hex(bytes(g), srid))
            for s in attr_vals:
                fields.append(_copy_escape(s.iloc[i]))
            out.append("\t".join(fields))
        return ("\n".join(out) + "\n").encode("utf-8") if out else b""

    df = df.persist()
    try:
        pid_df = df.withColumn("__pid", F.spark_partition_id())
        stat_schema = T.StructType([T.StructField("pid", T.IntegerType()),
                                    T.StructField("n", T.LongType()),
                                    T.StructField("nbytes", T.LongType())])

        def stats(batches):
            pid, n, nb = -1, 0, 0
            for pdf in batches:
                if len(pdf):
                    pid = int(pdf["__pid"].iloc[0])
                    nb += len(render(pdf.drop(columns="__pid")))
                    n += len(pdf)
            yield pd.DataFrame([(pid, n, nb)],
                               columns=["pid", "n", "nbytes"])

        parts = sorted((r for r in
                        pid_df.mapInPandas(stats, stat_schema).collect()
                        if r.pid >= 0), key=lambda r: r.pid)
        total_n = sum(r.n for r in parts)

        hdr = ["SET standard_conforming_strings = ON;",
               f'DROP TABLE IF EXISTS "{schema_name}"."{table}" CASCADE;',
               "BEGIN;",
               f'CREATE TABLE "{schema_name}"."{table}" ( "ogc_fid" '
               'SERIAL, CONSTRAINT "' + table + '_pk" PRIMARY KEY '
               '("ogc_fid") );']
        if has_geom:
            hdr.append(
                f"SELECT AddGeometryColumn('{schema_name}','{table}',"
                f"'wkb_geometry',{srid},'{geom_type}',{dim});")
        for f in attrs:
            hdr.append(f'ALTER TABLE "{schema_name}"."{table}" ADD COLUMN '
                       f'"{f.name.lower()}" {_pg_type(f.dataType)};')
        hdr.append(f'COPY "{schema_name}"."{table}" ({", ".join(cols)}) '
                   "FROM STDIN;")
        header = ("\n".join(hdr) + "\n").encode("utf-8")
        footer = b"\\.\nCOMMIT;\n"

        offs = {}
        acc = len(header)
        for r in parts:
            offs[r.pid] = acc
            acc += r.nbytes
        with open(path, "wb") as f:
            f.write(header)
            f.truncate(acc + len(footer))
            f.seek(acc)
            f.write(footer)

        out_schema = T.StructType([T.StructField("pid", T.IntegerType()),
                                   T.StructField("n", T.LongType())])

        def emit(batches):
            pid, n = -1, 0
            bufs = []
            for pdf in batches:
                if len(pdf):
                    pid = int(pdf["__pid"].iloc[0])
                    bufs.append(render(pdf.drop(columns="__pid")))
                    n += len(pdf)
            if pid >= 0:
                data = b"".join(bufs)
                fd = os.open(path, os.O_WRONLY)
                try:
                    os.pwrite(fd, data, offs[pid])
                finally:
                    os.close(fd)
            yield pd.DataFrame([(pid, n)], columns=["pid", "n"])

        pid_df.mapInPandas(emit, out_schema).collect()
        return total_n
    finally:
        df.unpersist()
