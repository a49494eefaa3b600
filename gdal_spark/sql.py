"""OGRSQL front end: ``engine.sql("SELECT ...")`` with the OGR dialect's
quirks rewritten onto Spark SQL.

Re-expresses the reference's #1 entry point — ``GDALDataset::ExecuteSQL``
(/root/reference/gcore/gdaldataset.cpp:6860 -> swq parse ->
OGRGenSQLResultsLayer, ogr/ogrsf_frmts/generic/ogr_gensql.cpp) — as a thin
translation layer: the query text is token-rewritten, then Catalyst does
analysis/optimization/execution. The OGRSQL-specific semantics handled
here:

  * **special fields** (ogr/ogrfeaturequery.cpp:37, ogr/ogr_p.h:164-168):
    FID -> the registered fid column; OGR_GEOMETRY ->
    ST_GeometryType(geom); OGR_GEOM_WKT -> ST_AsText(geom);
    OGR_GEOM_AREA -> ST_Area(geom).
  * **first-match JOIN** (ogr_gensql.cpp:1505-1535): every join is LEFT
    and yields at most ONE secondary feature — the first in FID order.
    Rewritten by deduplicating the secondary on the join key (lowest fid
    wins) before a plain left join, which is equivalent for the equi-joins
    OGRSQL supports.
  * **LIKE-as-ILIKE toggle** (ogr/swq_op_general.cpp:1100-1101,
    config option OGR_SQL_LIKE_AS_ILIKE): when enabled, LIKE rewrites to
    Spark's ILIKE. ILIKE itself passes through (Spark >= 3.3 has it).
  * **DISTINCT / ORDER BY null placement** (ogr/swq.cpp:606-608,
    SZ_OGR_NULL): NULL sorts first ascending, last descending — Spark's
    defaults, so no rewrite is needed (documented, pinned by tests).
  * **summary-record mode** (ogr/ogr_swq.h:315): aggregates without
    GROUP BY return exactly one record — Spark's native behavior.
  * double-quoted identifiers rewrite to backticks.

Unsupported (documented): OGRSQL's truncating integer division and the
implicit string casts of ``swq_expr_node::Evaluate`` are NOT emulated —
expressions follow Spark SQL typing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .functions import st


class OgrSqlEngine:
    """Register layers, then run OGRSQL text against them.

    >>> eng = OgrSqlEngine(spark)
    >>> eng.register("pages", df, fid_col="doc_id")
    >>> eng.sql("SELECT FID, OGR_GEOM_AREA FROM pages WHERE x LIKE 'a%'")
    """

    def __init__(self, spark: SparkSession, like_as_ilike: bool = False):
        self.spark = spark
        self.like_as_ilike = like_as_ilike
        self._fid: dict[str, str] = {}
        self._geom: dict[str, str] = {}
        self._cols: dict[str, list[str]] = {}
        st.register_all(spark)

    def register(self, name: str, df: DataFrame, fid_col: str = "fid",
                 geom_col: str = "geom") -> None:
        df.createOrReplaceTempView(name)
        self._fid[name] = fid_col
        self._geom[name] = geom_col
        self._cols[name] = list(df.columns)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(self.translate(query))

    # -- translation ---------------------------------------------------------

    def translate(self, query: str) -> str:
        """OGRSQL text -> Spark SQL text (exposed for tests/PLANS). Every
        rewrite — special fields, ILIKE toggle, identifier quoting AND the
        first-match-join rewrite — applies only OUTSIDE single-quoted
        string literals."""
        parts = _split_literals(query)
        # resolve the unqualified-special-field table from the whole
        # de-literaled text (a literal between SELECT and FROM must not
        # hide the FROM clause from earlier segments)
        sql_text = "".join(seg for is_lit, seg in parts if not is_lit)
        m = re.search(r"(?i)\bFROM\s+([A-Za-z_]\w*)", sql_text)
        default_tbl = m.group(1) if m else None
        out = []
        for is_lit, seg in parts:
            if is_lit:
                out.append(seg)
                continue
            seg = _DQUOTE.sub(lambda m: "`%s`" % m.group(1), seg)
            seg = self._rewrite_special_fields(seg, default_tbl)
            if self.like_as_ilike:
                seg = re.sub(r"(?i)(?<![\w])LIKE(?![\w])", "ILIKE", seg)
            seg = self._rewrite_joins(seg)
            out.append(seg)
        return "".join(out)

    def _rewrite_special_fields(self, seg: str, default_tbl) -> str:
        """FID / OGR_GEOMETRY / OGR_GEOM_WKT / OGR_GEOM_AREA, optionally
        table-qualified. The bare forms resolve against the single FROM
        table of the query (OGR's own binding rule for unqualified special
        fields, swq_select.cpp:774 BuildParseInfo)."""

        def geom_of(tbl):
            return self._geom.get(tbl, "geom")

        def fid_of(tbl):
            return self._fid.get(tbl, "fid")

        def repl(match):
            tbl = match.group(1)
            field = match.group(2).upper()
            t = tbl[:-1] if tbl else default_tbl   # strip trailing dot
            prefix = f"{t}." if tbl else ""
            if field == "FID":
                return prefix + fid_of(t)
            g = prefix + geom_of(t)
            if field == "OGR_GEOMETRY":
                return f"ST_GeometryType({g})"
            if field == "OGR_GEOM_WKT":
                return f"ST_AsText({g})"
            return f"ST_Area({g})"                  # OGR_GEOM_AREA

        return re.sub(
            r"(?i)\b([A-Za-z_]\w*\.)?"
            r"(FID|OGR_GEOMETRY|OGR_GEOM_WKT|OGR_GEOM_AREA)\b",
            repl, seg)

    def _rewrite_joins(self, text: str) -> str:
        """[LEFT] JOIN t ON a.x = t.y  ->  LEFT JOIN (first-match dedup of
        t on y) t ON a.x = t.y. OGRSQL joins are always effectively LEFT
        and single-match (ogr_gensql.cpp:1505: SetAttributeFilter + one
        GetNextFeature on the secondary)."""
        pat = re.compile(
            r"(?i)\b(?:LEFT\s+)?JOIN\s+([A-Za-z_]\w*)\s+ON\s+"
            r"([A-Za-z_][\w.]*)\s*=\s*([A-Za-z_][\w.]*)")

        def repl(m):
            tbl, lhs, rhs = m.group(1), m.group(2), m.group(3)
            # which side belongs to the joined table?
            sec = rhs if rhs.lower().startswith(tbl.lower() + ".") else lhs
            sec_col = sec.split(".", 1)[1] if "." in sec else sec
            fid = self._fid.get(tbl, "fid")
            cols = self._cols.get(tbl)
            if cols is None:
                raise ValueError(f"join table {tbl!r} is not registered")
            collist = ", ".join(f"`{c}`" for c in cols)
            sub = (f"(SELECT {collist} FROM ("
                   f"SELECT *, row_number() OVER ("
                   f"PARTITION BY `{sec_col}` ORDER BY `{fid}`) AS __rn "
                   f"FROM {tbl}) WHERE __rn = 1) {tbl}")
            return f"LEFT JOIN {sub} ON {m.group(2)} = {m.group(3)}"

        return pat.sub(repl, text)


_DQUOTE = re.compile(r'"([^"]*)"')


def _split_literals(query: str):
    """-> [(is_string_literal, segment)] preserving order; '' escapes
    stay inside their literal."""
    out = []
    pos = 0
    n = len(query)
    while pos < n:
        q = query.find("'", pos)
        if q < 0:
            out.append((False, query[pos:]))
            break
        if q > pos:
            out.append((False, query[pos:q]))
        end = q + 1
        while end < n:
            e = query.find("'", end)
            if e < 0:
                end = n
                break
            if e + 1 < n and query[e + 1] == "'":
                end = e + 2
                continue
            end = e + 1
            break
        out.append((True, query[q:end]))
        pos = end
    return out
