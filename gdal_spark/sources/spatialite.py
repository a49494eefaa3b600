"""SpatiaLite source/sink: stdlib sqlite3 + a pure-Python codec for the
SpatiaLite BLOB-Geometry format, distributed by rowid range.

Re-expresses the reference's SQLite/SpatiaLite driver
(/root/reference/ogr/ogrsf_frmts/sqlite/ogrsqlitelayer.cpp —
ImportSpatiaLiteGeometry/ExportSpatiaLiteGeometry, geometry_columns
discovery) Spark-first, the same way the GPKG driver does: the DRIVER
opens the file once to list layers and rowid bounds, every TASK opens
its own read-only connection and SELECTs only its rowid slice.

SpatiaLite BLOB layout (public spec, mirrored by the reference decoder):
  byte 0      0x00 start marker
  byte 1      endianness (0x01 little / 0x00 big)
  int32       SRID
  4 doubles   MBR (minx, miny, maxx, maxy)
  byte        0x7C MBR-end marker
  int32       geometry class (1..7 as WKB, +1000000 Z etc. — 2-D here)
  body        like WKB but with NO per-geometry byte-order marks;
              collection entities are prefixed 0x69 + int32 class
  last byte   0xFE end marker
"""

from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..core import wkb as W

_HDR = struct.Struct("<bBi4d")          # start, endian, srid, mbr


def _rd_body(buf: bytes, off: int, gclass: int, bo: str):
    """-> (Geom, new_offset). bo is '<' or '>'."""
    i4 = struct.Struct(bo + "i")
    if gclass == W.POINT:
        pt = np.frombuffer(buf, dtype=bo + "f8", count=2, offset=off)
        return W.Geom(W.POINT, [pt.reshape(1, 2).astype(np.float64)]), off + 16
    if gclass == W.LINESTRING:
        n = i4.unpack_from(buf, off)[0]
        arr = np.frombuffer(buf, dtype=bo + "f8", count=2 * n,
                            offset=off + 4).reshape(n, 2)
        return W.Geom(W.LINESTRING, [arr.astype(np.float64)]), off + 4 + 16 * n
    if gclass == W.POLYGON:
        nr = i4.unpack_from(buf, off)[0]
        off += 4
        rings = []
        for _ in range(nr):
            n = i4.unpack_from(buf, off)[0]
            rings.append(np.frombuffer(
                buf, dtype=bo + "f8", count=2 * n,
                offset=off + 4).reshape(n, 2).astype(np.float64))
            off += 4 + 16 * n
        return W.Geom(W.POLYGON, rings), off
    # multi / collection: n entities, each 0x69 + class + body
    n = i4.unpack_from(buf, off)[0]
    off += 4
    parts = []
    for _ in range(n):
        if buf[off] != 0x69:
            raise ValueError("bad SpatiaLite entity marker")
        cls = i4.unpack_from(buf, off + 1)[0]
        if cls >= 1000:
            raise ValueError("only 2-D SpatiaLite geometry classes supported")
        g, off = _rd_body(buf, off + 5, cls, bo)
        parts.append(g)
    return W.Geom(gclass, parts=parts), off


def spatialite_to_wkb(blob) -> bytes | None:
    """SpatiaLite BLOB geometry -> ISO WKB (2-D classes 1..7; the Z/M
    classes (+1000/+2000/+3000) change the coordinate stride and are
    rejected loudly rather than misread)."""
    if blob is None:
        return None
    buf = bytes(blob)
    if not buf or buf[0] != 0x00 or buf[-1] != 0xFE or buf[38] != 0x7C:
        raise ValueError("not a SpatiaLite geometry blob")
    bo = "<" if buf[1] == 0x01 else ">"
    gclass = struct.unpack_from(bo + "i", buf, 39)[0]
    if gclass >= 1000:
        raise ValueError("only 2-D SpatiaLite geometry classes supported")
    g, _ = _rd_body(buf, 43, gclass, bo)
    return W.encode(g)


def _wr_body(g: "W.Geom", out: list) -> None:
    if g.gtype == W.POINT:
        out.append(g.rings[0].astype("<f8").tobytes())
        return
    if g.gtype == W.LINESTRING:
        out.append(struct.pack("<i", len(g.rings[0])))
        out.append(g.rings[0].astype("<f8").tobytes())
        return
    if g.gtype == W.POLYGON:
        out.append(struct.pack("<i", len(g.rings)))
        for r in g.rings:
            out.append(struct.pack("<i", len(r)))
            out.append(r.astype("<f8").tobytes())
        return
    out.append(struct.pack("<i", len(g.parts)))
    for p in g.parts:
        out.append(b"\x69" + struct.pack("<i", p.gtype))
        _wr_body(p, out)


def wkb_to_spatialite(wkb_bytes, srid: int = 4326) -> bytes | None:
    """ISO WKB -> SpatiaLite BLOB geometry (little-endian, exact MBR)."""
    if wkb_bytes is None:
        return None
    g = W.decode(bytes(wkb_bytes))
    env = g.envelope() or (0.0, 0.0, 0.0, 0.0)
    out = [_HDR.pack(0, 1, srid, *env), b"\x7c",
           struct.pack("<i", g.gtype)]
    _wr_body(g, out)
    out.append(b"\xfe")
    return b"".join(out)


_SQL_TYPES = {
    "INTEGER": T.LongType(), "INT": T.LongType(), "BIGINT": T.LongType(),
    "REAL": T.DoubleType(), "DOUBLE": T.DoubleType(),
    "FLOAT": T.DoubleType(), "TEXT": T.StringType(),
    "VARCHAR": T.StringType(), "BLOB": T.BinaryType(),
}


def list_layers(path: str):
    """[(table, geom_column, srid)] from SpatiaLite geometry_columns
    (both the legacy 'type' and 4.x 'geometry_type' spellings)."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        rows = con.execute(
            "SELECT f_table_name, f_geometry_column, srid "
            "FROM geometry_columns").fetchall()
    finally:
        con.close()
    return [(str(t), str(c), int(s)) for t, c, s in rows]


def read_spatialite(spark: SparkSession, path: str,
                    table: str | None = None,
                    rows_per_task: int = 262144) -> DataFrame:
    """-> DataFrame(fid, geom WKB, <attrs>) for one SpatiaLite layer,
    scanned in parallel by rowid range (SQLite is multi-reader-safe)."""
    layers = list_layers(path)
    if table is None:
        table, geom_col, _srid = layers[0]
    else:
        geom_col = next(c for t, c, _s in layers if t == table)

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        info = con.execute(f'PRAGMA table_info("{table}")').fetchall()
        lo_hi = con.execute(
            f'SELECT min(rowid), max(rowid) FROM "{table}"').fetchone()
    finally:
        con.close()
    lo, hi = (int(lo_hi[0]), int(lo_hi[1])) if lo_hi[0] is not None \
        else (0, -1)
    pk = next((c[1] for c in info if c[5]), None)
    attrs = [(c[1], (c[2] or "TEXT").upper().split("(")[0]) for c in info
             if c[1] not in (geom_col, pk)]
    schema = T.StructType(
        [T.StructField("fid", T.LongType()),
         T.StructField("geom", T.BinaryType())]
        + [T.StructField(n, _SQL_TYPES.get(t, T.StringType()))
           for n, t in attrs])
    cols = [f.name for f in schema.fields]
    attr_sql = ", ".join(f'"{n}"' for n, _t in attrs)
    sel = (f'SELECT rowid, "{geom_col}"'
           + (", " + attr_sql if attr_sql else "")
           + f' FROM "{table}" WHERE rowid BETWEEN ? AND ?')
    ranges = [(a, min(a + rows_per_task - 1, hi))
              for a in range(lo, hi + 1, rows_per_task)] or [(1, 0)]
    rdf = spark.createDataFrame(
        pd.DataFrame(ranges, columns=["lo", "hi"]),
        schema="lo long, hi long")

    def parse(batches):
        for pdf in batches:
            frames = []
            con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
            try:
                for r in pdf.itertuples():
                    rows = [[int(rec[0]), spatialite_to_wkb(rec[1]),
                             *rec[2:]]
                            for rec in con.execute(sel,
                                                   (int(r.lo), int(r.hi)))]
                    frames.append(pd.DataFrame(rows, columns=cols))
            finally:
                con.close()
            yield pd.concat(frames) if frames else \
                pd.DataFrame(columns=cols)

    return rdf.mapInPandas(parse, schema)


def write_spatialite(rows, path: str, table: str = "layer",
                     srid: int = 4326,
                     geometry_type: str = "GEOMETRY") -> None:
    """rows: [(wkb_or_None, {attr: value})] -> a minimal SpatiaLite DB
    (geometry_columns + spatial_ref_sys + the feature table). Fixture
    writer / bounded-extract sink, like the GPKG one — the distributed
    sink remains parquet."""
    rows = list(rows)
    attrs = list(rows[0][1].keys()) if rows else []

    def sql_type(v):
        if isinstance(v, int):
            return "INTEGER"
        if isinstance(v, float):
            return "DOUBLE"
        return "TEXT"

    types = {a: sql_type(rows[0][1][a]) for a in attrs}
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute(
            "CREATE TABLE IF NOT EXISTS spatial_ref_sys ("
            "srid INTEGER PRIMARY KEY, auth_name TEXT, auth_srid "
            "INTEGER, ref_sys_name TEXT, proj4text TEXT, srtext TEXT)")
        cur.execute(
            "INSERT OR IGNORE INTO spatial_ref_sys VALUES "
            "(4326, 'epsg', 4326, 'WGS 84', '+proj=longlat "
            "+datum=WGS84 +no_defs', 'GEOGCS[\"WGS 84\"]')")
        cur.execute(
            "CREATE TABLE IF NOT EXISTS geometry_columns ("
            "f_table_name TEXT NOT NULL, f_geometry_column TEXT NOT "
            "NULL, geometry_type INTEGER NOT NULL, coord_dimension "
            "INTEGER NOT NULL, srid INTEGER NOT NULL, "
            "spatial_index_enabled INTEGER NOT NULL)")
        coldefs = "".join(f', "{a}" {types[a]}' for a in attrs)
        cur.execute(f'CREATE TABLE "{table}" (pk INTEGER PRIMARY KEY, '
                    f'geometry BLOB{coldefs})')
        gtype = {"POINT": 1, "LINESTRING": 2, "POLYGON": 3,
                 "MULTIPOINT": 4, "MULTILINESTRING": 5,
                 "MULTIPOLYGON": 6}.get(geometry_type.upper(), 0)
        cur.execute(
            "INSERT INTO geometry_columns VALUES (?, 'geometry', ?, 2, "
            "?, 0)", (table, gtype, srid))
        ph = ", ".join("?" for _ in range(2 + len(attrs)))
        for i, (g, a) in enumerate(rows):
            cur.execute(
                f'INSERT INTO "{table}" VALUES ({ph})',
                (i + 1, wkb_to_spatialite(g, srid),
                 *[a.get(k) for k in attrs]))
        con.commit()
    finally:
        con.close()
