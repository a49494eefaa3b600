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


def _cover_with_full(geom_bytes: bytes, zoom: int):
    """(cells, fulls): cover cell ids + per-cell 'fully inside the region'
    flags. A cell marked full needs NO exact PIP test for its points — the
    reference's envelope fast-accept (ogrlayer.cpp:1784-1790) lifted to the
    cell level. Conservative: full only when all 4 cell corners are inside
    AND no boundary segment's bbox overlaps the cell."""
    g = wkb.decode(geom_bytes)
    env = g.envelope()
    tiles = tilemath.cover_envelope_xyz(env[0], env[1], env[2], env[3], zoom)
    a, b = geomops._segments(geomops._all_line_rings(g))
    seg_minx = np.minimum(a[:, 0], b[:, 0]) if len(a) else np.empty(0)
    seg_maxx = np.maximum(a[:, 0], b[:, 0]) if len(a) else np.empty(0)
    seg_miny = np.minimum(a[:, 1], b[:, 1]) if len(a) else np.empty(0)
    seg_maxy = np.maximum(a[:, 1], b[:, 1]) if len(a) else np.empty(0)
    cells, fulls = [], []
    for tx, ty in tiles:
        cells.append(int(tilemath.packed_cell_id(tx, ty, zoom)))
        lon0, lat0, lon1, lat1 = tilemath.tile_bounds_latlon_xyz(tx, ty, zoom)
        cx = np.array([lon0, lon1, lon1, lon0])
        cy = np.array([lat0, lat0, lat1, lat1])
        inside = geomops.points_in_geom(cx, cy, g).all()
        touches = bool(((seg_maxx >= lon0) & (seg_minx <= lon1)
                        & (seg_maxy >= lat0) & (seg_miny <= lat1)).any()) \
            if len(a) else False
        fulls.append(bool(inside and not touches))
    return cells, fulls


def regions_pdf() -> pd.DataFrame:
    """All regions as pandas: region_id, name, kind, geom(WKB), envelope,
    cells (int64 cover at PIP_ZOOM) + fulls (fast-accept flags).
    ~1,320 rows — a broadcast-sized dim."""
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
    covers = [_cover_with_full(g, PIP_ZOOM) for g in pdf["geom"]]
    pdf["cells"] = [c for c, _ in covers]
    pdf["fulls"] = [f for _, f in covers]
    return pdf


_REGION_SCHEMA = T.StructType([
    T.StructField("region_id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("geom", T.BinaryType()),
    T.StructField("xmin", T.DoubleType()), T.StructField("ymin", T.DoubleType()),
    T.StructField("xmax", T.DoubleType()), T.StructField("ymax", T.DoubleType()),
    T.StructField("cells", T.ArrayType(T.LongType())),
    T.StructField("fulls", T.ArrayType(T.BooleanType())),
])


def regions(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(regions_pdf(), schema=_REGION_SCHEMA)


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


def convex_centroids_values_sql() -> str:
    """DuckDB VALUES list of (region_id, cx, cy) — same float64 literals the
    Spark side broadcasts (repr round-trips doubles exactly)."""
    rows = convex_centroids_pdf()
    vals = ", ".join(f"({int(r.region_id)}, {r.cx!r}, {r.cy!r})"
                     for r in rows.itertuples())
    return f"(VALUES {vals}) AS c(region_id, cx, cy)"
