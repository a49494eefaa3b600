"""ESRI Shapefile source: pure-numpy .shp/.shx/.dbf parsing, distributed
via byte-range tasks.

Re-expresses the reference's Shapefile driver
(/root/reference/ogr/ogrsf_frmts/shape/shpopen.c — SHPReadObject record
parsing, dbfopen.c attribute decode) Spark-first: the DRIVER reads only the
tiny .shx offset index (8 bytes/feature) and the .dbf header, partitions the
feature list into contiguous byte ranges, and each TASK opens the .shp/.dbf
locally and parses just its slice — so a billion-feature shapefile scans in
parallel without any single process touching the whole file.

Format layout (public ESRI whitepaper):
  .shp  100-byte header (big-endian file code 9994, LE shape type, bbox),
        then records: [rec# int32 BE, content words int32 BE, content]
        content: shape type int32 LE; Point = 2 doubles; PolyLine/Polygon =
        bbox 4 doubles + numparts + numpoints + parts[] + points[];
        MultiPoint = bbox + numpoints + points[].
  .shx  100-byte header, then per feature [offset words BE, length words BE]
  .dbf  dBase III: nrecords uint32 LE @4, header size uint16 @8, record
        size uint16 @10; 32-byte field descriptors (name/type/len/dec);
        records = deletion flag + fixed-width ASCII fields.

Only 2D shape types are emitted (the reference reads Z/M too; documented
subset). Output schema: (fid long, geom WKB binary, <attribute columns>).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import wkb

SHP_NULL = 0
SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5
SHP_MULTIPOINT = 8


# ---------------------------------------------------------------------------
# geometry record codec
# ---------------------------------------------------------------------------

from ..core.geomops import ring_area as _ring_area  # noqa: E402


def _shape_to_geom(buf: bytes):
    """One .shp record content -> Geom (or None for null shapes)."""
    stype = struct.unpack_from("<i", buf, 0)[0]
    if stype == SHP_NULL:
        return None
    if stype == SHP_POINT:
        x, y = struct.unpack_from("<2d", buf, 4)
        return wkb.Geom(wkb.POINT, [np.array([[x, y]])])
    if stype == SHP_MULTIPOINT:
        n = struct.unpack_from("<i", buf, 36)[0]
        pts = np.frombuffer(buf, "<f8", 2 * n, 40).reshape(n, 2)
        return wkb.Geom(wkb.MULTIPOINT,
                        parts=[wkb.Geom(wkb.POINT, [pts[i:i + 1]])
                               for i in range(n)])
    if stype in (SHP_POLYLINE, SHP_POLYGON):
        nparts, npts = struct.unpack_from("<2i", buf, 36)
        parts = np.frombuffer(buf, "<i4", nparts, 44)
        pts = np.frombuffer(buf, "<f8", 2 * npts, 44 + 4 * nparts) \
            .reshape(npts, 2)
        bounds = np.r_[parts, npts]
        rings = [np.array(pts[bounds[i]:bounds[i + 1]])
                 for i in range(nparts)]
        if stype == SHP_POLYLINE:
            if len(rings) == 1:
                return wkb.Geom(wkb.LINESTRING, [rings[0]])
            return wkb.Geom(wkb.MULTILINESTRING,
                            parts=[wkb.Geom(wkb.LINESTRING, [r])
                                   for r in rings])
        # polygon: shapefile outer rings are CLOCKWISE (negative shoelace
        # in the y-up axis), holes counter-clockwise (shpopen.c ring rule)
        shells = [r for r in rings if _ring_area(r) < 0]
        holes = [r for r in rings if _ring_area(r) >= 0]
        if not shells:                   # degenerate: treat all as shells
            shells, holes = rings, []
        polys = [[s] for s in shells]
        from ..core.geomops import points_in_ring
        for h in holes:
            for cand in polys:
                if points_in_ring(h[:1, 0], h[:1, 1], cand[0])[0]:
                    cand.append(h)
                    break
            else:
                polys[0].append(h)
        if len(polys) == 1:
            return wkb.Geom(wkb.POLYGON, polys[0])
        return wkb.Geom(wkb.MULTIPOLYGON,
                        parts=[wkb.Geom(wkb.POLYGON, rs) for rs in polys])
    raise ValueError(f"unsupported shape type {stype}")


def _geom_to_shape(g) -> bytes:
    """Geom -> one .shp record content (the writer's inverse)."""
    if g is None:
        return struct.pack("<i", SHP_NULL)
    if g.gtype == wkb.POINT:
        p = g.rings[0][0]
        return struct.pack("<i2d", SHP_POINT, float(p[0]), float(p[1]))
    if g.gtype == wkb.MULTIPOINT:
        pts = np.vstack([p.rings[0][0] for p in g.parts])
        head = struct.pack("<i4di", SHP_MULTIPOINT,
                           float(pts[:, 0].min()), float(pts[:, 1].min()),
                           float(pts[:, 0].max()), float(pts[:, 1].max()),
                           len(pts))
        return head + pts.astype("<f8").tobytes()
    if g.gtype in (wkb.LINESTRING, wkb.MULTILINESTRING):
        lines = [g.rings[0]] if g.gtype == wkb.LINESTRING else \
            [p.rings[0] for p in g.parts]
        return _packed_parts(SHP_POLYLINE, lines)
    if g.gtype in (wkb.POLYGON, wkb.MULTIPOLYGON):
        rings = []
        for ring_set in g.polygons():
            for i, r in enumerate(ring_set):
                r = np.asarray(r, np.float64)
                if not np.array_equal(r[0], r[-1]):
                    r = np.vstack([r, r[:1]])
                a = _ring_area(r)
                # enforce shapefile winding: shell CW (area < 0), hole CCW
                if (i == 0 and a > 0) or (i > 0 and a < 0):
                    r = r[::-1]
                rings.append(r)
        return _packed_parts(SHP_POLYGON, rings)
    raise ValueError(f"unsupported geometry type {g.gtype}")


def _packed_parts(stype: int, rings) -> bytes:
    pts = np.vstack(rings).astype("<f8")
    parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
    head = struct.pack("<i4d2i", stype,
                       float(pts[:, 0].min()), float(pts[:, 1].min()),
                       float(pts[:, 0].max()), float(pts[:, 1].max()),
                       len(rings), len(pts))
    return head + parts.tobytes() + pts.tobytes()


# ---------------------------------------------------------------------------
# dbf codec
# ---------------------------------------------------------------------------

def _dbf_header(path: str):
    """-> (nrecords, header_size, record_size, fields[(name,type,len,dec)])."""
    with open(path, "rb") as f:
        head = f.read(32)
        nrec, hsize, rsize = struct.unpack_from("<IHH", head, 4)
        fields = []
        fdata = f.read(hsize - 32)
        pos = 0
        while pos + 32 <= len(fdata) and fdata[pos] != 0x0D:
            name = fdata[pos:pos + 11].split(b"\x00")[0].decode("ascii")
            ftype = chr(fdata[pos + 11])
            flen = fdata[pos + 16]
            fdec = fdata[pos + 17]
            fields.append((name, ftype, flen, fdec))
            pos += 32
    return nrec, hsize, rsize, fields


def _dbf_decode_record(rec: bytes, fields):
    out = []
    pos = 1                              # skip deletion flag
    for name, ftype, flen, fdec in fields:
        raw = rec[pos:pos + flen]
        pos += flen
        s = raw.decode("ascii", "replace").strip()
        if ftype in ("N", "F"):
            if not s:
                out.append(None)
            elif fdec or ftype == "F" or "." in s:
                out.append(float(s))
            else:
                out.append(int(s))
        elif ftype == "L":
            out.append(None if s in ("", "?") else s in ("Y", "y", "T", "t"))
        else:
            out.append(s)
    return out


def _dbf_field_spark_type(ftype: str, fdec: int):
    if ftype in ("N", "F"):
        return T.DoubleType() if fdec or ftype == "F" else T.LongType()
    if ftype == "L":
        return T.BooleanType()
    return T.StringType()


# ---------------------------------------------------------------------------
# writer (fixture generation / sink)
# ---------------------------------------------------------------------------

def write_shapefile(rows, path_base: str):
    """rows: iterable of (geom_wkb_bytes_or_None, {attr: value}) -> writes
    path_base.shp/.shx/.dbf. Attribute types inferred: int -> N(18,0),
    float -> N(24,8), else C(64). Single-threaded fixture writer (the
    reference's SHPWriteObject / DBFWriteAttribute equivalent)."""
    rows = list(rows)
    geoms = [wkb.decode(b) if b is not None else None for b, _ in rows]
    contents = [_geom_to_shape(g) for g in geoms]
    # shp + shx
    shp_recs, shx_recs = [], []
    offset = 100
    for i, c in enumerate(contents):
        shx_recs.append(struct.pack(">2i", offset // 2, len(c) // 2))
        shp_recs.append(struct.pack(">2i", i + 1, len(c) // 2) + c)
        offset += 8 + len(c)
    pts = np.vstack([g.points() for g in geoms
                     if g is not None and len(g.points())]) \
        if any(g is not None for g in geoms) else np.zeros((1, 2))
    stypes = [struct.unpack_from("<i", c, 0)[0] for c in contents
              if struct.unpack_from("<i", c, 0)[0] != SHP_NULL]
    stype = stypes[0] if stypes else SHP_NULL

    def header(total_len: int) -> bytes:
        return (struct.pack(">i", 9994) + b"\x00" * 20
                + struct.pack(">i", total_len // 2)
                + struct.pack("<2i", 1000, stype)
                + struct.pack("<8d", float(pts[:, 0].min()),
                              float(pts[:, 1].min()),
                              float(pts[:, 0].max()),
                              float(pts[:, 1].max()), 0, 0, 0, 0))

    shp_body = b"".join(shp_recs)
    with open(path_base + ".shp", "wb") as f:
        f.write(header(100 + len(shp_body)) + shp_body)
    with open(path_base + ".shx", "wb") as f:
        f.write(header(100 + 8 * len(rows)) + b"".join(shx_recs))

    # dbf
    attrs = rows[0][1] if rows else {}
    fields = []
    for name, v in attrs.items():
        if isinstance(v, bool):
            fields.append((name, "L", 1, 0))
        elif isinstance(v, int):
            fields.append((name, "N", 18, 0))
        elif isinstance(v, float):
            fields.append((name, "N", 24, 8))
        else:
            fields.append((name, "C", 64, 0))
    rsize = 1 + sum(f[2] for f in fields)
    hsize = 32 + 32 * len(fields) + 1
    with open(path_base + ".dbf", "wb") as f:
        f.write(struct.pack("<B3BIHH20x", 0x03, 24, 1, 1, len(rows),
                            hsize, rsize))
        for name, ftype, flen, fdec in fields:
            f.write(name.encode("ascii")[:11].ljust(11, b"\x00")
                    + ftype.encode("ascii")
                    + b"\x00" * 4
                    + struct.pack("<BB", flen, fdec) + b"\x00" * 14)
        f.write(b"\x0d")
        for _, a in rows:
            rec = b" "
            for name, ftype, flen, fdec in fields:
                v = a.get(name)
                if v is None:
                    s = b" " * flen
                elif ftype == "N" and fdec == 0:
                    s = str(int(v)).rjust(flen).encode("ascii")
                elif ftype == "N":
                    s = f"{float(v):.{fdec}f}".rjust(flen).encode("ascii")
                elif ftype == "L":
                    s = b"T" if v else b"F"
                else:
                    s = str(v).encode("ascii")[:flen].ljust(flen)
                if len(s) != flen:
                    # a silently-oversized field would shift every later
                    # fixed-width record; refuse instead (dbfopen.c clamps
                    # to the declared width, we fail loud)
                    raise ValueError(
                        f"value {v!r} exceeds DBF field width {flen} "
                        f"for {name!r}")
                rec += s
            f.write(rec)
        f.write(b"\x1a")


# ---------------------------------------------------------------------------
# distributed reader
# ---------------------------------------------------------------------------

def read_shapefile(spark: SparkSession, path_base: str,
                   features_per_task: int = 65536) -> DataFrame:
    """-> DataFrame(fid, geom, <attrs>): driver reads .shx/.dbf headers
    only, then byte-range tasks parse their slices in parallel."""
    with open(path_base + ".shx", "rb") as f:
        shx = f.read()
    n = (len(shx) - 100) // 8
    offs = (np.frombuffer(shx, ">i4", 2 * n, 100).reshape(n, 2)
            .astype(np.int64) * 2)
    nrec, hsize, rsize, fields = _dbf_header(path_base + ".dbf")

    ranges = [(int(i), int(min(i + features_per_task, n)))
              for i in range(0, n, features_per_task)] or [(0, 0)]
    rdf = spark.createDataFrame(
        pd.DataFrame(ranges, columns=["lo", "hi"]),
        schema=T.StructType([T.StructField("lo", T.LongType()),
                             T.StructField("hi", T.LongType())]))

    schema = T.StructType(
        [T.StructField("fid", T.LongType()),
         T.StructField("geom", T.BinaryType())]
        + [T.StructField(fname, _dbf_field_spark_type(ftype, fdec))
           for fname, ftype, flen, fdec in fields])
    cols = [f.name for f in schema.fields]
    offs_bytes = offs.tobytes()

    def parse(batches):
        off_arr = np.frombuffer(offs_bytes, np.int64).reshape(-1, 2)
        for pdf in batches:
            frames = []
            for r in pdf.itertuples():
                lo, hi = int(r.lo), int(r.hi)
                if hi <= lo:
                    continue
                rows = []
                with open(path_base + ".shp", "rb") as f:
                    for i in range(lo, hi):
                        off, clen = off_arr[i]
                        f.seek(off + 8)
                        g = _shape_to_geom(f.read(clen))
                        rows.append([i, wkb.encode(g)
                                     if g is not None else None])
                with open(path_base + ".dbf", "rb") as f:
                    f.seek(hsize + lo * rsize)
                    blob = f.read((hi - lo) * rsize)
                for j, row in enumerate(rows):
                    rec = blob[j * rsize:(j + 1) * rsize]
                    row.extend(_dbf_decode_record(rec, fields))
                frames.append(pd.DataFrame(rows, columns=cols))
            yield pd.concat(frames) if frames else \
                pd.DataFrame(columns=cols)

    return rdf.mapInPandas(parse, schema)


def _dbf_fields_from_schema(schema: T.StructType, geom_col: str,
                            str_widths: dict[str, int]):
    """Spark schema -> DBF field descriptors (name, type, len, dec).
    String widths come from a measured corpus max (pass 1), capped at the
    dBase III limit of 254."""
    fields = []
    for f in schema.fields:
        if f.name == geom_col:
            continue
        if isinstance(f.dataType, T.BooleanType):
            fields.append((f.name, "L", 1, 0))
        elif isinstance(f.dataType, (T.ByteType, T.ShortType,
                                     T.IntegerType, T.LongType)):
            fields.append((f.name, "N", 18, 0))
        elif isinstance(f.dataType, (T.FloatType, T.DoubleType,
                                     T.DecimalType)):
            fields.append((f.name, "N", 24, 8))
        else:
            w = min(max(int(str_widths.get(f.name, 1)), 1), 254)
            fields.append((f.name, "C", w, 0))
    return fields


def _dbf_record(a: dict, fields) -> bytes:
    rec = b" "
    for name, ftype, flen, fdec in fields:
        v = a.get(name)
        if v is None or (isinstance(v, float) and v != v):
            s = b" " * flen
        elif ftype == "N" and fdec == 0:
            s = str(int(v)).rjust(flen).encode("ascii")
        elif ftype == "N":
            s = f"{float(v):.{fdec}f}".rjust(flen).encode("ascii")
        elif ftype == "L":
            s = b"T" if v else b"F"
        else:
            s = str(v).encode("ascii")[:flen].ljust(flen)
        if len(s) != flen:
            raise ValueError(f"value {v!r} exceeds DBF field width "
                             f"{flen} for {name!r}")
        rec += s
    return rec


def write_shapefile_dist(df: DataFrame, path_base: str,
                         geom_col: str = "geom") -> int:
    """DISTRIBUTED .shp/.shx/.dbf sink — no driver collect of features.

    Same two-phase preallocated-pwrite contract as the GeoTIFF/PNG sinks
    (sources/geotiff.py): phase 1 aggregates ONE ROW PER PARTITION
    (record count, shp byte total, bbox, shape-type set, max string
    widths) so the driver can lay out all three files from prefix sums
    — .shp record offsets are a running sum of record sizes, .shx/.dbf
    are fixed-stride; phase 2 re-evaluates each partition and pwrites
    its slice of all three files at its base offsets. The input is
    persisted across the two passes so both see identical partitions
    (the same recompute-stability contract as RDD.zipWithIndex).

    The reference's writer (shpopen.c SHPWriteObject + dbfopen.c) is a
    single-handle appender; this is the scale re-expression: a
    10M-feature layer writes with O(#partitions) driver memory.
    Returns the feature count."""
    import os

    attrs = [c for c in df.columns if c != geom_col]
    str_cols = [f.name for f in df.schema.fields
                if f.name != geom_col
                and not isinstance(f.dataType, (
                    T.BooleanType, T.ByteType, T.ShortType, T.IntegerType,
                    T.LongType, T.FloatType, T.DoubleType, T.DecimalType))]
    df = df.persist()
    try:
        pid_df = df.withColumn("__pid", F.spark_partition_id())

        stat_schema = T.StructType([
            T.StructField("pid", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("shp_bytes", T.LongType()),
            T.StructField("xmin", T.DoubleType()),
            T.StructField("ymin", T.DoubleType()),
            T.StructField("xmax", T.DoubleType()),
            T.StructField("ymax", T.DoubleType()),
            T.StructField("stype", T.LongType()),
            T.StructField("widths", T.ArrayType(T.LongType()))])

        def stats(batches):
            pid = -1
            n = 0
            nbytes = 0
            bb = [np.inf, np.inf, -np.inf, -np.inf]
            stype = SHP_NULL
            widths = [0] * len(str_cols)
            for pdf in batches:
                if len(pdf):
                    pid = int(pdf["__pid"].iloc[0])
                for b in pdf[geom_col]:
                    g = wkb.decode(bytes(b)) if b is not None else None
                    c = _geom_to_shape(g)
                    nbytes += 8 + len(c)
                    n += 1
                    st = struct.unpack_from("<i", c, 0)[0]
                    if st != SHP_NULL:
                        stype = st
                        e = g.envelope()
                        bb[0] = min(bb[0], e[0]); bb[1] = min(bb[1], e[1])
                        bb[2] = max(bb[2], e[2]); bb[3] = max(bb[3], e[3])
                for k, cname in enumerate(str_cols):
                    if len(pdf):
                        w = pdf[cname].map(
                            lambda v: len(str(v)) if v is not None else 0)
                        widths[k] = max(widths[k], int(w.max()))
            yield pd.DataFrame(
                [(pid, n, nbytes, bb[0], bb[1], bb[2], bb[3], stype,
                  widths)],
                columns=[f.name for f in stat_schema.fields])

        parts = [r for r in pid_df.mapInPandas(stats, stat_schema)
                 .collect() if r.n > 0 or r.pid >= 0]
        parts.sort(key=lambda r: r.pid)
        total_n = sum(r.n for r in parts)
        total_shp = sum(r.shp_bytes for r in parts)
        live = [r for r in parts if r.stype != SHP_NULL]
        stype = live[0].stype if live else SHP_NULL
        if len({r.stype for r in live}) > 1:
            raise ValueError("mixed shape types in one shapefile layer")
        if live:
            bbox = (min(r.xmin for r in live), min(r.ymin for r in live),
                    max(r.xmax for r in live), max(r.ymax for r in live))
        else:
            bbox = (0.0, 0.0, 0.0, 0.0)
        str_widths = {c: max((r.widths[k] for r in parts), default=1)
                      for k, c in enumerate(str_cols)}
        fields = _dbf_fields_from_schema(df.schema, geom_col, str_widths)
        rsize = 1 + sum(f[2] for f in fields)
        hsize = 32 + 32 * len(fields) + 1

        # prefix sums -> per-partition base offsets
        base = {}
        rec0, shp_off = 0, 100
        for r in parts:
            base[int(r.pid)] = (rec0, shp_off)
            rec0 += int(r.n)
            shp_off += int(r.shp_bytes)

        def header(total_len: int) -> bytes:
            return (struct.pack(">i", 9994) + b"\x00" * 20
                    + struct.pack(">i", total_len // 2)
                    + struct.pack("<2i", 1000, int(stype))
                    + struct.pack("<8d", bbox[0], bbox[1], bbox[2],
                                  bbox[3], 0, 0, 0, 0))

        with open(path_base + ".shp", "wb") as f:
            f.write(header(100 + total_shp))
            f.truncate(100 + total_shp)
        with open(path_base + ".shx", "wb") as f:
            f.write(header(100 + 8 * total_n))
            f.truncate(100 + 8 * total_n)
        with open(path_base + ".dbf", "wb") as f:
            f.write(struct.pack("<B3BIHH20x", 0x03, 24, 1, 1, total_n,
                                hsize, rsize))
            for name, ftype, flen, fdec in fields:
                f.write(name.encode("ascii")[:11].ljust(11, b"\x00")
                        + ftype.encode("ascii") + b"\x00" * 4
                        + struct.pack("<BB", flen, fdec) + b"\x00" * 14)
            f.write(b"\x0d")
            f.truncate(hsize + total_n * rsize + 1)
            f.seek(hsize + total_n * rsize)
            f.write(b"\x1a")

        def emit(batches):
            fd_shp = fd_shx = fd_dbf = None
            rec = off = None
            n_written = 0
            try:
                for pdf in batches:
                    if not len(pdf):
                        continue
                    if fd_shp is None:
                        pid = int(pdf["__pid"].iloc[0])
                        rec, off = base[pid]
                        fd_shp = os.open(path_base + ".shp", os.O_WRONLY)
                        fd_shx = os.open(path_base + ".shx", os.O_WRONLY)
                        fd_dbf = os.open(path_base + ".dbf", os.O_WRONLY)
                    for t in pdf.itertuples(index=False):
                        b = getattr(t, geom_col)
                        g = wkb.decode(bytes(b)) if b is not None else None
                        c = _geom_to_shape(g)
                        os.pwrite(fd_shx, struct.pack(
                            ">2i", off // 2, len(c) // 2), 100 + 8 * rec)
                        os.pwrite(fd_shp, struct.pack(
                            ">2i", rec + 1, len(c) // 2) + c, off)
                        a = {k: getattr(t, k) for k in attrs}
                        os.pwrite(fd_dbf, _dbf_record(a, fields),
                                  hsize + rec * rsize)
                        off += 8 + len(c)
                        rec += 1
                        n_written += 1
            finally:
                for fd in (fd_shp, fd_shx, fd_dbf):
                    if fd is not None:
                        os.close(fd)
            yield pd.DataFrame({"n": [n_written]})

        pid_df.mapInPandas(emit, "n long").agg({"n": "sum"}).collect()
        return total_n
    finally:
        df.unpersist()


def write_shapefile_df(df: DataFrame, path_base: str,
                       geom_col: str = "geom") -> None:
    """DataFrame sink — delegates unconditionally to the distributed
    two-phase pwrite writer (no driver collect; write_shapefile_dist).
    The rows-list write_shapefile above remains a fixture helper only."""
    write_shapefile_dist(df, path_base, geom_col=geom_col)
