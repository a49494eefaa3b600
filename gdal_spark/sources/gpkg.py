"""GeoPackage source: stdlib-sqlite3 + pure-numpy GPB codec, distributed
by rowid range.

Re-expresses the reference's GPKG driver front door
(/root/reference/ogr/ogrsf_frmts/gpkg/ogrgeopackagetablelayer.cpp —
gpkg_contents/gpkg_geometry_columns discovery, GeoPackageBinary blob
decode per OGC 12-128r15 §2.1.3) Spark-first: the DRIVER opens the
SQLite file read-only just to list layers and min/max rowid, then each
TASK opens its own connection and SELECTs only its rowid range — SQLite
files are safe for concurrent readers, so a billion-row GPKG scans in
parallel with no driver bottleneck.

GPB blob layout (public spec): magic 'GP', version byte, flags byte
(bit 0 endianness of envelope, bits 1-3 envelope type, bit 4 empty,
bit 5 extended), int32 srs_id, optional envelope (4/6/8 doubles), then
standard ISO WKB.
"""

from __future__ import annotations

import sqlite3
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_ENV_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def gpb_to_wkb(blob: bytes):
    """GeoPackageBinary -> (ISO WKB bytes, srs_id); None for empty."""
    if blob is None:
        return None, None
    blob = bytes(blob)
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    flags = blob[3]
    if flags & 0x20:
        raise ValueError("extended GPB not supported")
    env_type = (flags >> 1) & 0x07
    byte_order = flags & 0x01
    srs = struct.unpack_from("<i" if byte_order else ">i", blob, 4)[0]
    header_len = 8 + 8 * _ENV_DOUBLES.get(env_type, 0)
    if flags & 0x10:                      # empty-geometry flag
        return None, srs
    return blob[header_len:], srs


def wkb_to_gpb(wkb_bytes: bytes, srs_id: int = 4326) -> bytes:
    """ISO WKB -> minimal GPB blob (no envelope, little-endian)."""
    return b"GP\x00\x01" + struct.pack("<i", srs_id) + bytes(wkb_bytes)


def list_layers(path: str):
    """[(table, geom_column, srs_id)] from gpkg_geometry_columns."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        rows = con.execute(
            "SELECT table_name, column_name, srs_id "
            "FROM gpkg_geometry_columns").fetchall()
    finally:
        con.close()
    return [(str(t), str(c), int(s)) for t, c, s in rows]


_SQL_TYPES = {
    "INTEGER": T.LongType(), "INT": T.LongType(),
    "MEDIUMINT": T.LongType(), "SMALLINT": T.LongType(),
    "TINYINT": T.LongType(), "BOOLEAN": T.BooleanType(),
    "REAL": T.DoubleType(), "DOUBLE": T.DoubleType(),
    "FLOAT": T.DoubleType(),
    "TEXT": T.StringType(), "BLOB": T.BinaryType(),
}


def read_gpkg(spark: SparkSession, path: str, table: str | None = None,
              rows_per_task: int = 262144) -> DataFrame:
    """-> DataFrame(fid, geom WKB, <attrs>) for one GPKG vector layer."""
    layers = list_layers(path)
    if table is None:
        table, geom_col, _srs = layers[0]
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

    pk = next((c[1] for c in info if c[5]), None)     # INTEGER PRIMARY KEY
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
        schema=T.StructType([T.StructField("lo", T.LongType()),
                             T.StructField("hi", T.LongType())]))

    def parse(batches):
        for pdf in batches:
            frames = []
            con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
            try:
                for r in pdf.itertuples():
                    rows = []
                    for rec in con.execute(sel, (int(r.lo), int(r.hi))):
                        wkb_bytes, _srs = gpb_to_wkb(rec[1])
                        rows.append([int(rec[0]), wkb_bytes,
                                     *rec[2:]])
                    frames.append(pd.DataFrame(rows, columns=cols))
            finally:
                con.close()
            yield pd.concat(frames) if frames else \
                pd.DataFrame(columns=cols)

    return rdf.mapInPandas(parse, schema)


def write_gpkg(rows, path: str, table: str = "layer",
               srs_id: int = 4326, geometry_type: str = "GEOMETRY",
               attr_types: dict | None = None) -> None:
    """rows: [(wkb_or_None, {attr: value})] -> a minimal spec-conformant
    GeoPackage (gpkg_spatial_ref_sys + gpkg_contents +
    gpkg_geometry_columns + the feature table). Fixture writer/sink for
    bounded layers."""
    rows = list(rows)
    attrs = list(rows[0][1].keys()) if rows else []

    def sql_type(v):
        if isinstance(v, bool):
            return "BOOLEAN"
        if isinstance(v, int):
            return "INTEGER"
        if isinstance(v, float):
            return "DOUBLE"
        return "TEXT"

    types = attr_types or {a: sql_type(rows[0][1][a]) for a in attrs}
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute("PRAGMA application_id = 1196444487")   # 'GPKG'
        cur.execute("PRAGMA user_version = 10300")
        cur.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys ("
            "srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, "
            "organization TEXT NOT NULL, organization_coordsys_id "
            "INTEGER NOT NULL, definition TEXT NOT NULL, "
            "description TEXT)")
        cur.execute(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES "
            "('WGS 84', 4326, 'EPSG', 4326, 'GEOGCS[\"WGS 84\"]', NULL)")
        cur.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_contents ("
            "table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL, "
            "identifier TEXT, description TEXT, last_change TEXT, "
            "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, "
            "srs_id INTEGER)")
        cur.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_geometry_columns ("
            "table_name TEXT NOT NULL, column_name TEXT NOT NULL, "
            "geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, "
            "z TINYINT NOT NULL, m TINYINT NOT NULL)")
        coldefs = "".join(f', "{a}" {types[a]}' for a in attrs)
        cur.execute(f'CREATE TABLE "{table}" (fid INTEGER PRIMARY KEY, '
                    f'geom BLOB{coldefs})')
        cur.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, "
            "identifier, srs_id) VALUES (?, 'features', ?, ?)",
            (table, table, srs_id))
        cur.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', ?, "
            "?, 0, 0)", (table, geometry_type, srs_id))
        ph = ", ".join("?" for _ in range(2 + len(attrs)))
        for i, (g, a) in enumerate(rows):
            cur.execute(
                f'INSERT INTO "{table}" VALUES ({ph})',
                (i + 1, wkb_to_gpb(g, srs_id) if g is not None else None,
                 *[a.get(k) for k in attrs]))
        con.commit()
    finally:
        con.close()


# ---------------------------------------------------------- raster tiles

def write_gpkg_tiles(tiles: DataFrame, path: str, table: str = "tiles",
                     tile: int = 256, srs_id: int = 3857,
                     png_dtype: str = "u1",
                     bounds=(-20037508.342789244, -20037508.342789244,
                             20037508.342789244, 20037508.342789244),
                     zoom: int | None = None) -> int:
    """Engine tile table (single band u1/u2 or bands 1-3 as RGB) -> a
    GeoPackage TILE pyramid table (OGC 12-128r15 §2.2: gpkg_contents
    data_type='tiles', gpkg_tile_matrix_set, gpkg_tile_matrix, and the
    (zoom_level, tile_column, tile_row, tile_data PNG) user table,
    reference gdal/ogr/ogrsf_frmts/gpkg/gdalgeopackagerasterband.cpp).

    PNG ENCODING runs in executors (mapInPandas over tile groups — the
    expensive deflate never touches the driver); the blob INSERT is
    driver-side because SQLite is single-writer — the same bounded-sink
    contract as the vector GPKG writer. Returns tile count."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F, types as T

    from ..raster.tiles import decode_px
    from .png import encode_png

    enc_schema = T.StructType([
        T.StructField("tx", T.LongType()), T.StructField("ty", T.LongType()),
        T.StructField("blob", T.BinaryType())])

    def encode(key, pdf):
        tx, ty = int(key[0]), int(key[1])
        bands = sorted(pdf["band"].unique())
        planes = {}
        for r in pdf.itertuples(index=False):
            planes[int(r.band)] = decode_px(r.px, r.dtype, tile)
        if len(bands) == 1:
            arr = planes[bands[0]]
        else:
            arr = np.stack([planes[b] for b in bands], axis=2)
        arr = arr.astype(png_dtype)    # PNG container: u1 or u2
        return pd.DataFrame([(tx, ty, encode_png(arr))],
                            columns=["tx", "ty", "blob"])

    rows = tiles.groupBy("tile_x", "tile_y") \
        .applyInPandas(encode, enc_schema).collect()

    # zoom not given: derive the smallest matrix that holds the extent
    # (a zoom too small would write a gpkg_tile_matrix of 1x1 while the
    # tile table holds columns/rows beyond it — a spec-violating archive
    # only this engine's own reader would accept)
    maxc = max((max(int(r.tx), int(r.ty)) for r in rows), default=0)
    if zoom is None:
        zoom = maxc.bit_length()   # ceil(log2(maxc+1))
    if maxc >= (1 << zoom):
        raise ValueError(
            f"tile indices up to {maxc} do not fit zoom {zoom} "
            f"(matrix {1 << zoom}x{1 << zoom}); pass zoom>="
            f"{maxc.bit_length()}")

    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute("PRAGMA application_id = 1196444487")
        cur.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys ("
            "srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, "
            "organization TEXT NOT NULL, organization_coordsys_id "
            "INTEGER NOT NULL, definition TEXT NOT NULL, description TEXT)")
        cur.execute(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES "
            "('WebMercator', 3857, 'EPSG', 3857, "
            "'PROJCS[\"WGS 84 / Pseudo-Mercator\"]', NULL)")
        cur.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_contents ("
            "table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL, "
            "identifier TEXT, description TEXT, last_change TEXT, "
            "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, "
            "srs_id INTEGER)")
        cur.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_tile_matrix_set ("
            "table_name TEXT PRIMARY KEY, srs_id INTEGER NOT NULL, "
            "min_x DOUBLE NOT NULL, min_y DOUBLE NOT NULL, "
            "max_x DOUBLE NOT NULL, max_y DOUBLE NOT NULL)")
        cur.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_tile_matrix ("
            "table_name TEXT NOT NULL, zoom_level INTEGER NOT NULL, "
            "matrix_width INTEGER NOT NULL, matrix_height INTEGER NOT "
            "NULL, tile_width INTEGER NOT NULL, tile_height INTEGER NOT "
            "NULL, pixel_x_size DOUBLE NOT NULL, pixel_y_size DOUBLE "
            "NOT NULL, PRIMARY KEY (table_name, zoom_level))")
        cur.execute(
            f'CREATE TABLE "{table}" (id INTEGER PRIMARY KEY, '
            "zoom_level INTEGER NOT NULL, tile_column INTEGER NOT NULL, "
            "tile_row INTEGER NOT NULL, tile_data BLOB NOT NULL, "
            "UNIQUE (zoom_level, tile_column, tile_row))")
        cur.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, "
            "identifier, min_x, min_y, max_x, max_y, srs_id) VALUES "
            "(?, 'tiles', ?, ?, ?, ?, ?, ?)",
            (table, table, *bounds, srs_id))
        cur.execute("INSERT INTO gpkg_tile_matrix_set VALUES "
                    "(?, ?, ?, ?, ?, ?)", (table, srs_id, *bounds))
        n = 1 << zoom
        px = (bounds[2] - bounds[0]) / (n * tile)
        cur.execute("INSERT INTO gpkg_tile_matrix VALUES "
                    "(?, ?, ?, ?, ?, ?, ?, ?)",
                    (table, zoom, n, n, tile, tile, px, px))
        for i, r in enumerate(sorted(rows, key=lambda r: (r.ty, r.tx))):
            cur.execute(
                f'INSERT INTO "{table}" (id, zoom_level, tile_column, '
                "tile_row, tile_data) VALUES (?, ?, ?, ?, ?)",
                (i + 1, zoom, int(r.tx), int(r.ty), bytes(r.blob)))
        con.commit()
    finally:
        con.close()
    return len(rows)


def read_gpkg_tiles(spark: SparkSession, path: str,
                    table: str | None = None, tile: int = 256,
                    rows_per_task: int = 64):
    """GeoPackage tile pyramid -> (engine tile table, matrix meta).
    Rowid-range parallel scan; PNG decode runs in the tasks."""
    import numpy as np
    from pyspark.sql import types as T

    from ..raster.tiles import TILE_SCHEMA, encode_px

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        if table is None:
            table = con.execute(
                "SELECT table_name FROM gpkg_contents WHERE "
                "data_type = 'tiles'").fetchone()[0]
        tm = con.execute(
            "SELECT zoom_level, matrix_width, matrix_height, tile_width, "
            "tile_height, pixel_x_size FROM gpkg_tile_matrix WHERE "
            "table_name = ?", (table,)).fetchall()
        lo_hi = con.execute(
            f'SELECT min(rowid), max(rowid) FROM "{table}"').fetchone()
    finally:
        con.close()
    lo, hi = (int(lo_hi[0]), int(lo_hi[1])) if lo_hi[0] is not None \
        else (0, -1)
    ranges = [(a, min(a + rows_per_task - 1, hi))
              for a in range(lo, hi + 1, rows_per_task)] or [(1, 0)]
    rdf = spark.createDataFrame(ranges, "lo long, hi long")
    cols = [f.name for f in TILE_SCHEMA.fields]

    def parse(batches):
        import pandas as pd
        from .png import decode_png
        from .jpeg import decode_jpeg

        def decode_blob(b):
            # tile blobs may be PNG, JPEG, or (GPKG extension) JPEG
            # 2000 — frmts/gpkg & frmts/mbtiles sniff the same magics
            if b[:2] == b"\xff\xd8":
                return decode_jpeg(b)
            if b[:4] in (b"\x00\x00\x00\x0c", b"\xff\x4f\xff\x51") or \
                    b[:2] == b"\xff\x4f":
                from ..raster.j2k import decode_j2k, extract_codestream
                arr = decode_j2k(extract_codestream(bytes(b)))
                return (arr[0] if arr.shape[0] == 1
                        else np.moveaxis(arr, 0, 2)), {}
            return decode_png(b)

        for pdf in batches:
            frames = []
            con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
            try:
                for r in pdf.itertuples(index=False):
                    rows = []
                    for z, tc, tr, blob in con.execute(
                            f'SELECT zoom_level, tile_column, tile_row, '
                            f'tile_data FROM "{table}" WHERE rowid '
                            "BETWEEN ? AND ?", (int(r.lo), int(r.hi))):
                        arr, _m = decode_blob(bytes(blob))
                        if arr.ndim == 2:
                            rows.append((1, z, tc, tr, arr.dtype.str[1:],
                                         None, encode_px(arr)))
                        else:
                            for b in range(arr.shape[2]):
                                plane = np.ascontiguousarray(arr[:, :, b])
                                rows.append((b + 1, z, tc, tr,
                                             plane.dtype.str[1:], None,
                                             encode_px(plane)))
                    frames.append(pd.DataFrame(rows, columns=cols))
            finally:
                con.close()
            yield pd.concat(frames) if frames else \
                pd.DataFrame(columns=cols)

    meta = {"table": table, "tile_matrix": tm}
    return rdf.mapInPandas(parse, TILE_SCHEMA), meta


# ------------------------------------------------------------- MBTiles

def write_mbtiles(tiles: DataFrame, path: str, *, tile: int = 256,
                  zoom: int | None | str = "auto", name: str = "gdal_spark",
                  fmt: str = "png", png_dtype: str = "u1",
                  metadata: dict | None = None) -> int:
    """Engine tile table -> MBTiles 1.3 archive (frmts/mbtiles/
    mbtilesdataset.cpp; mapbox/mbtiles-spec): `metadata` key/value table
    + `tiles(zoom_level, tile_column, tile_row, tile_data)` with the
    TMS row flip (row 0 at the BOTTOM — the XYZ->TMS difference the
    reference handles in MBTilesDataset::IRasterIO). PNG encode runs in
    executors; the insert is the driver-side single-writer sink, like
    the GPKG writers."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..raster.tiles import decode_px
    from .png import encode_png

    enc_schema = T.StructType([
        T.StructField("z", T.IntegerType()),
        T.StructField("tx", T.LongType()), T.StructField("ty", T.LongType()),
        T.StructField("blob", T.BinaryType())])

    from pyspark.sql import functions as F

    # zoom=None: multi-level mode — the tile table's own `zoom` column
    # names each tile's pyramid level (gdaladdo/gdal2tiles semantics).
    # zoom="auto" (default): use the stored levels if every tile fits its
    # level's matrix, else re-derive one level from the extent — a fixed
    # zoom=0 default would TMS-flip every row beyond the first into
    # negative tile_row values (spec-violating archive).
    ztile = tiles if zoom in (None, "auto") else \
        tiles.withColumn("zoom", F.lit(int(zoom)))

    def encode(key, pdf):
        z, tx, ty = int(key[0]), int(key[1]), int(key[2])
        bands = sorted(pdf["band"].unique())
        planes = {int(r.band): decode_px(r.px, r.dtype, tile)
                  for r in pdf.itertuples(index=False)}
        arr = (planes[bands[0]] if len(bands) == 1
               else np.stack([planes[b] for b in bands], axis=2))
        if fmt in ("jpg", "jpeg"):
            from .jpeg import encode_jpeg
            blob = encode_jpeg(arr.astype("u1"))
        else:
            blob = encode_png(arr.astype(png_dtype))
        return pd.DataFrame(
            [(z, tx, ty, blob)],
            columns=["z", "tx", "ty", "blob"])

    rows = ztile.groupBy("zoom", "tile_x", "tile_y") \
        .applyInPandas(encode, enc_schema).collect()
    def _fits(rs):
        return all(0 <= int(r.tx) < (1 << int(r.z))
                   and 0 <= int(r.ty) < (1 << int(r.z)) for r in rs)

    if zoom == "auto" and not _fits(rows):
        # placeholder levels (raster_to_tiles defaults zoom=0): derive
        # the smallest single level that holds the extent
        if len({int(r.z) for r in rows}) > 1:
            raise ValueError("multi-level tile table has indices outside "
                             "their levels; pass explicit zoom per level")
        maxc = max((max(int(r.tx), int(r.ty)) for r in rows), default=0)
        zfit = maxc.bit_length()   # ceil(log2(maxc+1))
        from pyspark.sql import Row
        rows = [Row(z=zfit, tx=r.tx, ty=r.ty, blob=r.blob) for r in rows]
    if not _fits(rows):
        bad = next(r for r in rows if not _fits([r]))
        raise ValueError(f"tile ({bad.tx},{bad.ty}) out of range for "
                         f"zoom {bad.z} (TMS row flip would go negative)")
    zs = sorted({int(r.z) for r in rows})
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
        cur.execute("CREATE TABLE tiles (zoom_level INTEGER, tile_column "
                    "INTEGER, tile_row INTEGER, tile_data BLOB)")
        cur.execute("CREATE UNIQUE INDEX tile_index ON tiles "
                    "(zoom_level, tile_column, tile_row)")
        meta = {"name": name, "format": fmt, "version": "1.3",
                "type": "overlay", "minzoom": str(zs[0]),
                "maxzoom": str(zs[-1]), **(metadata or {})}
        for k, v in sorted(meta.items()):
            cur.execute("INSERT INTO metadata VALUES (?, ?)", (k, str(v)))
        for r in sorted(rows, key=lambda r: (r.z, r.ty, r.tx)):
            cur.execute(
                "INSERT INTO tiles VALUES (?, ?, ?, ?)",
                (int(r.z), int(r.tx),
                 (1 << int(r.z)) - 1 - int(r.ty), bytes(r.blob)))
        con.commit()
    finally:
        con.close()
    return len(rows)


def read_mbtiles(spark: SparkSession, path: str, tile: int = 256,
                 rows_per_task: int = 64):
    """MBTiles -> (engine tile table in XYZ orientation, metadata dict).
    Rowid-range parallel scan, in-task PNG decode, TMS row un-flip."""
    import numpy as np
    from ..raster.tiles import TILE_SCHEMA, encode_px

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        meta = dict(con.execute("SELECT name, value FROM metadata"))
        lo_hi = con.execute(
            "SELECT min(rowid), max(rowid) FROM tiles").fetchone()
    finally:
        con.close()
    lo, hi = (int(lo_hi[0]), int(lo_hi[1])) if lo_hi[0] is not None \
        else (0, -1)
    ranges = [(a, min(a + rows_per_task - 1, hi))
              for a in range(lo, hi + 1, rows_per_task)] or [(1, 0)]
    rdf = spark.createDataFrame(ranges, "lo long, hi long")
    cols = [f.name for f in TILE_SCHEMA.fields]

    def parse(batches):
        import pandas as pd
        from .png import decode_png
        from .jpeg import decode_jpeg

        def decode_blob(b):
            # tile blobs may be PNG, JPEG, or (GPKG extension) JPEG
            # 2000 — frmts/gpkg & frmts/mbtiles sniff the same magics
            if b[:2] == b"\xff\xd8":
                return decode_jpeg(b)
            if b[:4] in (b"\x00\x00\x00\x0c", b"\xff\x4f\xff\x51") or \
                    b[:2] == b"\xff\x4f":
                from ..raster.j2k import decode_j2k, extract_codestream
                arr = decode_j2k(extract_codestream(bytes(b)))
                return (arr[0] if arr.shape[0] == 1
                        else np.moveaxis(arr, 0, 2)), {}
            return decode_png(b)

        for pdf in batches:
            frames = []
            con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
            try:
                for r in pdf.itertuples(index=False):
                    rows = []
                    for z, tc, tr, blob in con.execute(
                            "SELECT zoom_level, tile_column, tile_row, "
                            "tile_data FROM tiles WHERE rowid BETWEEN "
                            "? AND ?", (int(r.lo), int(r.hi))):
                        arr, _m = decode_blob(bytes(blob))
                        ty = (1 << z) - 1 - tr        # TMS -> XYZ
                        if arr.ndim == 2:
                            rows.append((1, z, tc, ty, arr.dtype.str[1:],
                                         None, encode_px(arr)))
                        else:
                            for b in range(arr.shape[2]):
                                pl = np.ascontiguousarray(arr[:, :, b])
                                rows.append((b + 1, z, tc, ty,
                                             pl.dtype.str[1:], None,
                                             encode_px(pl)))
                    frames.append(pd.DataFrame(rows, columns=cols))
            finally:
                con.close()
            yield pd.concat(frames) if frames else \
                pd.DataFrame(columns=cols)

    return rdf.mapInPandas(parse, TILE_SCHEMA), meta
