"""Deterministic synthetic spatial data derived from the driver's parquet tables.

The authoritative input shape (BASELINE.json input_hint) is a Common-Crawl-style
``pages`` table ``(url, warc_ts, html, text, lang)`` whose rows carry geoparsed
point/polygon geometries. We derive it deterministically from the driver's
``documents`` table (seed-free pure integer math) so that

  * the Spark side and the DuckDB oracle side compute the SAME rows from the
    SAME parquet input — no fixture files, no external data;
  * every derived value (lon/lat, url, html bytes) is reproducible bit-for-bit
    in both engines (integer multiply/mod, then float64 ops in a fixed order).

The ``regions`` polygon table (grid + seeded convex polygons) mirrors the
reference's admin-area join targets (FIXTURES.md §2); the exact-PIP semantics
match OGR's SetSpatialFilter/Within evaluation
(/root/reference/ogr/ogrsf_frmts/generic/ogrlayer.cpp:1750-1822,
/root/reference/ogr/ogrgeometry.cpp:5842) — bbox/cell prefilter then exact test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .core import geomops, tilemath, wkb

# -- derivation constants (shared by Spark columns and oracle SQL) -----------
LON_MULT, LON_MOD = 9973, 36000
LAT_MULT, LAT_MOD = 7919, 17000
PIP_ZOOM = 8          # cell-cover prefilter resolution for the spatial join
                      # (z8 tile ~ 1.4 deg: fine enough that most cover cells
                      # are fully interior -> fast-accept skips the exact UDF)
N_GRID_X, N_GRID_Y = 36, 36   # 10 deg x 5 deg admin grid
N_CONVEX = 24
CONVEX_ID_BASE = 2000


# ---------------------------------------------------------------------------
# pages / points — Spark side
# ---------------------------------------------------------------------------

def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, url, lon, lat) — geoparsed point per page.

    Pure built-in column math (whole-stage codegen; no UDF): at 100 TB this is
    a map-only stage fused into the parquet scan.
    """
    d = documents(spark, sf_dir)
    return d.select(
        "doc_id",
        url_col().alias("url"),
        lon_col().alias("lon"),
        lat_col().alias("lat"),
    )


def url_col():
    return F.concat(
        F.lit("https://site"), (F.col("doc_id") % 1000).cast("string"),
        F.lit(".example/p/"), F.col("doc_id").cast("string"))


def lon_col():
    return ((F.col("doc_id") * LON_MULT) % LON_MOD) / 100.0 - 180.0 + 0.005


def lat_col():
    return ((F.col("doc_id") * LAT_MULT) % LAT_MOD) / 100.0 - 85.0 + 0.005


def pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Common-Crawl-shaped table (url, warc_ts, html, text, lang) +
    geoparsed (lon, lat). html embeds text in a fixed template; the extract
    stage must recover text byte-identically (per-row invariant)."""
    d = documents(spark, sf_dir)
    html = F.concat(
        F.lit("<html><head><title>"), url_col(), F.lit("</title></head><body><p>"),
        F.col("text"), F.lit("</p></body></html>"))
    return d.select(
        url_col().alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        "text", "lang", "doc_id",
        lon_col().alias("lon"), lat_col().alias("lat"),
    )


# -- oracle-side twins (DuckDB SQL fragments) --------------------------------

POINTS_SQL = (
    "SELECT doc_id, "
    " 'https://site' || CAST(doc_id % 1000 AS VARCHAR) || '.example/p/' ||"
    " CAST(doc_id AS VARCHAR) AS url, "
    f" (((doc_id * {LON_MULT}) % {LON_MOD}) / 100.0 - 180.0) + 0.005 AS lon, "
    f" (((doc_id * {LAT_MULT}) % {LAT_MOD}) / 100.0 - 85.0) + 0.005 AS lat "
    "FROM documents"
)

PAGES_SQL = (
    "SELECT doc_id, "
    " 'https://site' || CAST(doc_id % 1000 AS VARCHAR) || '.example/p/' ||"
    " CAST(doc_id AS VARCHAR) AS url, "
    " '<html><head><title>' || 'https://site' || CAST(doc_id % 1000 AS VARCHAR)"
    " || '.example/p/' || CAST(doc_id AS VARCHAR)"
    " || '</title></head><body><p>' || text || '</p></body></html>' AS html, "
    " text, lang "
    "FROM documents"
)


# ---------------------------------------------------------------------------
# regions — polygon side of the spatial join (driver-side generation)
# ---------------------------------------------------------------------------

def _convex_rings() -> list[tuple[int, np.ndarray]]:
    """Seeded irregular convex polygons (region_id, closed CCW ring)."""
    rng = np.random.RandomState(42)
    out = []
    for i in range(N_CONVEX):
        cx = rng.uniform(-165.0, 165.0)
        cy = rng.uniform(-65.0, 65.0)
        r = rng.uniform(3.0, 12.0)
        n = rng.randint(6, 13)
        pts = np.stack([cx + rng.normal(size=n) * r,
                        cy + rng.normal(size=n) * r * 0.6], axis=1)
        pts[:, 0] = np.clip(pts[:, 0], -179.9, 179.9)
        pts[:, 1] = np.clip(pts[:, 1], -84.0, 84.0)
        ring = geomops.convex_hull(pts)           # closed, CCW
        out.append((CONVEX_ID_BASE + i, ring))
    return out


def _pack_mask(blk: np.ndarray) -> int:
    """8x8 bool block -> signed int64 bitmask; bit (i<<3)|j = blk[i, j]."""
    v = int.from_bytes(
        np.packbits(blk.ravel(), bitorder="little").tobytes(), "little")
    return v - (1 << 64) if v >= (1 << 63) else v


def _cover_with_masks(geom_bytes: bytes, zoom: int):
    """Hierarchical cell cover: (cells, in_masks, out_masks).

    For each cover cell at `zoom`, two int64 bitmasks classify its 8x8
    subgrid at zoom+SUB_BITS: bit set in in_mask -> subcell fully inside the
    region (fast-accept, no exact test); bit set in out_mask -> fully outside
    (fast-reject). Partial subcells (neither bit) go to the exact PIP UDF.
    This is the reference's envelope fast-accept (ogrlayer.cpp:1784-1790)
    lifted to a 2-level cell hierarchy, S2-covering style: the exact
    (Python/Arrow) path only ever sees the O(perimeter) boundary sliver, so
    its share of work falls ~8x per extra SUB_BIT while the accept/reject
    decision stays pure JVM bit math. Cells whose 64 subcells are all
    fully-outside are dropped from the cover entirely.

    Conservative classification: a subcell is 'full' only when its 4 corners
    agree AND no boundary segment's bbox overlaps it — correctness never
    depends on the masks, only the Python-work fraction does.
    """
    g = wkb.decode(geom_bytes)
    env = g.envelope()
    tiles = tilemath.cover_envelope_xyz(env[0], env[1], env[2], env[3], zoom)
    txs = np.array([t[0] for t in tiles], dtype=np.int64)
    tys = np.array([t[1] for t in tiles], dtype=np.int64)
    tx0, ty0 = int(txs.min()), int(tys.min())
    sub = 1 << tilemath.SUB_BITS
    sz = zoom + tilemath.SUB_BITS
    sx0, sx1 = tx0 * sub, (int(txs.max()) + 1) * sub      # subcell col range
    sy0, sy1 = ty0 * sub, (int(tys.max()) + 1) * sub
    nx, ny = sx1 - sx0, sy1 - sy0
    lon_edges = tilemath.tile_lon_edges_xyz(np.arange(sx0, sx1 + 1), sz)
    lat_edges = tilemath.tile_lat_edges_xyz(np.arange(sy0, sy1 + 1), sz)
    # one vectorized corner classification for the whole region
    LON, LAT = np.meshgrid(lon_edges, lat_edges)          # (ny+1, nx+1)
    corner_in = geomops.points_in_geom(
        LON.ravel(), LAT.ravel(), g).reshape(ny + 1, nx + 1)
    all_in = (corner_in[:-1, :-1] & corner_in[:-1, 1:]
              & corner_in[1:, :-1] & corner_in[1:, 1:])
    all_out = ~(corner_in[:-1, :-1] | corner_in[:-1, 1:]
                | corner_in[1:, :-1] | corner_in[1:, 1:])
    # subcells any boundary segment's bbox overlaps -> partial
    overlap = np.zeros((ny, nx), dtype=bool)
    a, b = geomops._segments(geomops._all_line_rings(g))
    neg_lat = -lat_edges                                   # ascending
    for s in range(len(a)):
        mnx, mxx = sorted((a[s, 0], b[s, 0]))
        mny, mxy = sorted((a[s, 1], b[s, 1]))
        j0 = max(0, int(np.searchsorted(lon_edges, mnx, "left")) - 1)
        j1 = min(nx, int(np.searchsorted(lon_edges, mxx, "right")))
        i0 = max(0, int(np.searchsorted(neg_lat, -mxy, "left")) - 1)
        i1 = min(ny, int(np.searchsorted(neg_lat, -mny, "right")))
        overlap[i0:i1, j0:j1] = True
    full_in = all_in & ~overlap
    full_out = all_out & ~overlap
    cells, in_masks, out_masks = [], [], []
    for tx, ty in tiles:
        bi, bj = (int(ty) - ty0) * sub, (int(tx) - tx0) * sub
        blk_out = full_out[bi:bi + sub, bj:bj + sub]
        if blk_out.all():
            continue                    # cell contributes no candidates
        cells.append(int(tilemath.packed_cell_id(tx, ty, zoom)))
        in_masks.append(_pack_mask(full_in[bi:bi + sub, bj:bj + sub]))
        out_masks.append(_pack_mask(blk_out))
    return cells, in_masks, out_masks


_REGIONS_PDF_CACHE: pd.DataFrame | None = None


def regions_pdf() -> pd.DataFrame:
    """All regions as pandas: region_id, name, kind, geom(WKB), envelope,
    cells (int64 cover at PIP_ZOOM) + in_masks/out_masks (subcell
    classification bitmasks). ~1,320 rows — a broadcast-sized dim.

    Memoized: on a real deployment this is a dimension TABLE built once and
    read by every job; recomputing the cover per query would put a serial
    driver-side cost on the critical path."""
    global _REGIONS_PDF_CACHE
    if _REGIONS_PDF_CACHE is not None:
        return _REGIONS_PDF_CACHE
    rows = []
    for gx in range(N_GRID_X):
        for gy in range(N_GRID_Y):
            xmin, ymin = -180.0 + 10.0 * gx, -90.0 + 5.0 * gy
            xmax, ymax = xmin + 10.0, ymin + 5.0
            rows.append((gx * N_GRID_Y + gy, f"grid_{gx}_{gy}", "grid",
                         wkb.box(xmin, ymin, xmax, ymax),
                         xmin, ymin, xmax, ymax))
    for rid, ring in _convex_rings():
        g = wkb.encode(wkb.Geom(wkb.POLYGON, [ring]))
        xmin, ymin, xmax, ymax = wkb.decode(g).envelope()
        rows.append((rid, f"convex_{rid - CONVEX_ID_BASE}", "convex",
                     g, xmin, ymin, xmax, ymax))
    pdf = pd.DataFrame(rows, columns=[
        "region_id", "name", "kind", "geom", "xmin", "ymin", "xmax", "ymax"])
    covers = [_cover_with_masks(g, PIP_ZOOM) for g in pdf["geom"]]
    pdf["cells"] = [c for c, _, _ in covers]
    pdf["in_masks"] = [m for _, m, _ in covers]
    pdf["out_masks"] = [m for _, _, m in covers]
    _REGIONS_PDF_CACHE = pdf
    return pdf


_REGION_SCHEMA = T.StructType([
    T.StructField("region_id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("geom", T.BinaryType()),
    T.StructField("xmin", T.DoubleType()), T.StructField("ymin", T.DoubleType()),
    T.StructField("xmax", T.DoubleType()), T.StructField("ymax", T.DoubleType()),
    T.StructField("cells", T.ArrayType(T.LongType())),
    T.StructField("in_masks", T.ArrayType(T.LongType())),
    T.StructField("out_masks", T.ArrayType(T.LongType())),
])


_REGIONS_DF_CACHE: dict = {}


def regions(spark: SparkSession) -> DataFrame:
    """Region dim as a DataFrame, memoized per session — a stand-in for the
    dimension table a production deployment would read from the catalog."""
    key = id(spark)
    df = _REGIONS_DF_CACHE.get(key)
    if df is None:
        df = spark.createDataFrame(regions_pdf(), schema=_REGION_SCHEMA)
        _REGIONS_DF_CACHE[key] = df
    return df


# -- oracle-side twins --------------------------------------------------------

def grid_pip_oracle_predicate() -> str:
    """region_id expression for a point's grid cell (pure math; the point
    derivation guarantees points never sit on grid lines)."""
    return ("(CAST(floor((lon + 180.0) / 10.0) AS BIGINT) * {ny}"
            " + CAST(floor((lat + 90.0) / 5.0) AS BIGINT))").format(ny=N_GRID_Y)


def convex_pip_oracle_sql(points_cte: str = "pts") -> str:
    """UNION ALL of per-polygon half-plane tests over the points CTE —
    an independent formulation of PIP (our Spark side uses even-odd ray
    casting) so agreement is a real cross-check."""
    parts = []
    for rid, ring in _convex_rings():
        conds = []
        for k in range(len(ring) - 1):
            x0, y0 = ring[k]
            x1, y1 = ring[k + 1]
            conds.append(
                f"(({x1!r} - {x0!r}) * (lat - {y0!r})"
                f" - ({y1!r} - {y0!r}) * (lon - {x0!r})) >= 0.0")
        parts.append(
            f"SELECT {rid} AS region_id, count(*) AS n_pages FROM {points_cte}"
            f" WHERE {' AND '.join(conds)}")
    return "(" + " UNION ALL ".join(parts) + ")"


def convex_centroids_pdf() -> pd.DataFrame:
    rows = []
    for rid, ring in _convex_rings():
        cx, cy = geomops.geom_centroid(wkb.Geom(wkb.POLYGON, [ring]))
        rows.append((rid, float(cx), float(cy)))
    return pd.DataFrame(rows, columns=["region_id", "cx", "cy"])


def grid_centroids_pdf() -> pd.DataFrame:
    """Center point of every grid region — a 1,296-row center table for the
    cell-ring kNN (big-center-set path). Same float64 arithmetic as the
    DuckDB twin grid_centroids_sql()."""
    gx, gy = np.meshgrid(np.arange(N_GRID_X), np.arange(N_GRID_Y),
                         indexing="ij")
    gx = gx.ravel().astype(np.int64)
    gy = gy.ravel().astype(np.int64)
    return pd.DataFrame({
        "region_id": gx * N_GRID_Y + gy,
        "cx": -180.0 + 10.0 * gx + 5.0,
        "cy": -90.0 + 5.0 * gy + 2.5,
    })


def grid_centroids_sql() -> str:
    """DuckDB table expression computing the same center table."""
    return (f"(SELECT gx.range * {N_GRID_Y} + gy.range AS region_id, "
            " -180.0 + 10.0 * gx.range + 5.0 AS cx, "
            " -90.0 + 5.0 * gy.range + 2.5 AS cy "
            f"FROM range({N_GRID_X}) gx, range({N_GRID_Y}) gy) AS c")


def convex_centroids_values_sql() -> str:
    """DuckDB VALUES list of (region_id, cx, cy) — same float64 literals the
    Spark side broadcasts (repr round-trips doubles exactly)."""
    rows = convex_centroids_pdf()
    vals = ", ".join(f"({int(r.region_id)}, {r.cx!r}, {r.cy!r})"
                     for r in rows.itertuples())
    return f"(VALUES {vals}) AS c(region_id, cx, cy)"


# ---------------------------------------------------------------------------
# deterministic image / video payloads (multimodal operators)
# ---------------------------------------------------------------------------
# Shared pixel formulas (Spark numpy side == DuckDB SQL side, pure integer):
#   gray    : ((doc_id*7 + 13*x + 31*y) % 256)
#   rgb     : ((doc_id*7 + 13*x + 31*y + 97*c) % 256)        c in 0..2
#   neardup : with c=(doc_id//8)%4, p=(doc_id//32)%3:
#             (((13+6*c)*x + (31+5*c)*y + p*(40 if x<4 and y<4 else 0)) % 256)
#             -> within-class aHash Hamming <= 5, cross-class >= 31
#   frame f : ((doc_id*7 + 11*f + 13*x + 31*y) % 256)
IMG_W = IMG_H = 16
VID_W = VID_H = 8
VID_FRAMES = 4


def image_array(doc_id: int, kind: str = "gray") -> "np.ndarray":
    """One deterministic test image per doc (uint8)."""
    y, x = np.mgrid[0:IMG_H, 0:IMG_W]
    if kind == "gray":
        return ((doc_id * 7 + 13 * x + 31 * y) % 256).astype(np.uint8)
    if kind == "rgb":
        chans = [((doc_id * 7 + 13 * x + 31 * y + 97 * c) % 256)
                 for c in range(3)]
        return np.stack(chans, axis=-1).astype(np.uint8)
    if kind == "neardup":
        c = (doc_id // 8) % 4
        pert = ((doc_id // 32) % 3) * np.where((x < 4) & (y < 4), 40, 0)
        return (((13 + 6 * c) * x + (31 + 5 * c) * y + pert) % 256) \
            .astype(np.uint8)
    raise ValueError(kind)


def doc_images(spark: SparkSession, sf_dir: str, kind: str = "gray",
               fmt: str = "png", mod: int | None = None,
               quality: int = 85) -> DataFrame:
    """(doc_id, payload binary) — per-doc synthetic image encoded with the
    repo's own codecs, generated executor-side (mapInPandas, map-only)."""
    import pandas as pd

    d = documents(spark, sf_dir).select("doc_id")
    if mod:
        d = d.where(F.col("doc_id") % mod == 0)

    def gen(batches):
        from .sources.jpeg import encode_jpeg
        from .sources.png import encode_png
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                arr = image_array(int(did), kind)
                payloads.append(encode_jpeg(arr, quality=quality)
                                if fmt == "jpeg" else encode_png(arr))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "payload": pd.Series(payloads,
                                                     dtype="object")})

    return d.mapInPandas(gen, schema="doc_id long, payload binary")


def doc_videos(spark: SparkSession, sf_dir: str,
               n_frames: int = VID_FRAMES) -> DataFrame:
    """(doc_id, payload) — VID0 frame container of PNG frames, frame f pixel
    = (doc_id*7 + 11*f + 13*x + 31*y) % 256 at 8x8 gray."""
    import pandas as pd

    d = documents(spark, sf_dir).select("doc_id")

    def gen(batches):
        from .operators.multimodal import pack_video
        from .sources.png import encode_png
        y, x = np.mgrid[0:VID_H, 0:VID_W]
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                frames = [encode_png(((did * 7 + 11 * f + 13 * x + 31 * y)
                                      % 256).astype(np.uint8))
                          for f in range(n_frames)]
                payloads.append(pack_video(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "payload": pd.Series(payloads,
                                                     dtype="object")})

    return d.mapInPandas(gen, schema="doc_id long, payload binary")


def doc_audio(spark: SparkSession, sf_dir: str,
              rate: int = 8000) -> DataFrame:
    """(doc_id, payload) — PCM16 mono WAV per doc, sample
    s[i] = ((doc_id*13 + i*7) % 199) - 99, n = 512 + (doc_id % 3) * 256."""
    import pandas as pd

    d = documents(spark, sf_dir).select("doc_id")

    def gen(batches):
        from .operators.multimodal import encode_wav
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 512 + (did % 3) * 256
                i = np.arange(n, dtype=np.int64)
                s = ((did * 13 + i * 7) % 199) - 99
                payloads.append(encode_wav(s.astype(np.int16), rate))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "payload": pd.Series(payloads,
                                                     dtype="object")})

    return d.mapInPandas(gen, schema="doc_id long, payload binary")


def doc_mp4s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload) — real ISO-BMFF MP4 (ftyp/mdat/moov) of
    3 + doc_id%4 PNG frames at 10 fps, frame pixels
    (doc_id*7 + 11*f + 13*x + 31*y) % 256 at 8x8 gray."""
    import pandas as pd

    d = documents(spark, sf_dir).select("doc_id")

    def gen(batches):
        from .operators.multimodal import write_mp4
        from .sources.png import encode_png
        y, x = np.mgrid[0:VID_H, 0:VID_W]
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 3 + did % 4
                frames = [encode_png(((did * 7 + 11 * f + 13 * x + 31 * y)
                                      % 256).astype(np.uint8))
                          for f in range(n)]
                payloads.append(write_mp4(frames, fps=10,
                                          width=VID_W, height=VID_H))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "payload": payloads})

    return d.mapInPandas(gen, "doc_id long, payload binary")
