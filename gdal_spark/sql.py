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

  * **truncating integer division** (swq_op_general.cpp:678-693 + the
    SWQGeneralChecker promotion at :1482-1492): ``a / b`` with BOTH
    operands integer-typed is C integer division truncating toward zero,
    and division by zero yields INT_MAX instead of NULL/error. Rewritten
    to ``CASE WHEN b = 0 THEN 2147483647 ELSE a DIV b END`` when a small
    static type scan proves both operands integral (integer literals,
    integer-typed registered columns, CAST(... AS INTEGER/BIGINT),
    parenthesized integer expressions); anything unprovable keeps Spark's
    float division — the same promotion rule the reference applies.
  * **string-constant-to-numeric promotion**
    (SWQAutoConvertStringToNumeric, swq_op_general.cpp:1327): a string
    LITERAL compared against a numeric expression converts to FLOAT, so
    ``int_field = '5.0'`` matches. Rewritten by CASTing the literal to
    DOUBLE when the opposite comparison operand is a numeric column.
  * **UNION ALL** (swq_select.cpp PreparseSelect): each SELECT arm is
    translated independently (its own FROM binding for special fields).
  * **CAST type spellings** (swq parser): CHARACTER(n) -> STRING,
    NUMERIC(p,s) -> DECIMAL(p,s).

Unsupported (documented): chained integer division (``a/b/c`` falls back
to float after the first rewrite), INT_MAX on integer ``%% 0`` (Spark
NULL), and SWQAutoPromoteStringToDateTime.
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
        self._types: dict[str, dict[str, str]] = {}
        st.register_all(spark)

    def register(self, name: str, df: DataFrame, fid_col: str = "fid",
                 geom_col: str = "geom") -> None:
        from pyspark.sql import types as T
        df.createOrReplaceTempView(name)
        self._fid[name] = fid_col
        self._geom[name] = geom_col
        self._cols[name] = list(df.columns)
        kinds = {}
        for f in df.schema.fields:
            if isinstance(f.dataType, (T.ByteType, T.ShortType,
                                       T.IntegerType, T.LongType,
                                       T.BooleanType)):
                kinds[f.name.lower()] = "int"
            elif isinstance(f.dataType, (T.FloatType, T.DoubleType,
                                         T.DecimalType)):
                kinds[f.name.lower()] = "float"
            else:
                kinds[f.name.lower()] = "other"
        self._types = getattr(self, "_types", {})
        self._types[name] = kinds

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(self.translate(query))

    # -- translation ---------------------------------------------------------

    def translate(self, query: str) -> str:
        """OGRSQL text -> Spark SQL text (exposed for tests/PLANS). Every
        rewrite — special fields, ILIKE toggle, identifier quoting, the
        first-match-join rewrite, truncating integer division and the
        string-constant promotion — applies only OUTSIDE single-quoted
        string literals. UNION ALL arms translate independently
        (swq_select.cpp PreparseSelect chains selects)."""
        arms = self._split_union_all(query)
        return " UNION ALL ".join(self._translate_one(a) for a in arms)

    @staticmethod
    def _split_union_all(query: str) -> list[str]:
        parts = _split_literals(query)
        arms, cur = [], []
        for is_lit, seg in parts:
            if is_lit:
                cur.append(seg)
                continue
            pos = 0
            for m in re.finditer(r"(?i)\bUNION\s+ALL\b", seg):
                cur.append(seg[pos:m.start()])
                arms.append("".join(cur))
                cur = []
                pos = m.end()
            cur.append(seg[pos:])
        arms.append("".join(cur))
        return arms

    def _translate_one(self, query: str) -> str:
        parts = _split_literals(query)
        # OGRSQL has no '--' comments: '3--1' is minus(minus 1)
        # (swq parser unary minus; autotest ogr_sql_rfc28 test 16)
        parts = [(il, seg if il else seg.replace("--", "- -"))
                 for il, seg in parts]
        parts = _fold_like_escape(parts)
        parts = self._string_plus_concat(parts)
        # resolve the unqualified-special-field table from the whole
        # de-literaled text (a literal between SELECT and FROM must not
        # hide the FROM clause from earlier segments)
        sql_text = "".join(seg for is_lit, seg in parts if not is_lit)
        m = re.search(r"(?i)\bFROM\s+([A-Za-z_\"]\w*)", sql_text)
        default_tbl = m.group(1).strip('"') if m else None
        out = []
        for is_lit, seg in parts:
            if is_lit:
                out.append((True, seg))
                continue
            seg = _DQUOTE.sub(lambda m: "`%s`" % m.group(1), seg)
            # "table.field" distinguished names (RFC 28: a quoted
            # dotted identifier whose prefix names a layer resolves as
            # table.field, autotest ogr_sql_rfc28 test 7)
            tbls = {k.lower() for k in self._cols} | \
                   {k.lower() for k in self._fid}
            seg = re.sub(
                r"`(\w+)\.(\w+)`",
                lambda m: (f"{m.group(1)}.`{m.group(2)}`"
                           if m.group(1).lower() in tbls
                           else m.group(0)), seg)
            seg = self._rewrite_special_fields(seg, default_tbl)
            seg = _rewrite_cast_types(seg)
            seg = _rewrite_float_literals(seg)
            seg = self._rewrite_int_div(seg, default_tbl)
            if self.like_as_ilike:
                seg = re.sub(r"(?i)(?<![\w])LIKE(?![\w])", "ILIKE", seg)
            seg = self._rewrite_joins(seg)
            out.append((False, seg))
        return "".join(self._promote_string_constants(out, default_tbl))

    def _string_plus_concat(self, parts):
        """OGR's '+' concatenates when an operand is a string
        (swq_op_general.cpp SWQ_ADD on SWQ_STRING): a '+' directly
        adjacent to a string LITERAL rewrites to '||' unless the other
        side is provably numeric (then the literal auto-converts,
        SWQAutoConvertStringToNumeric)."""
        out = list(parts)
        for k, (il, seg) in enumerate(out):
            if il:
                continue
            if k > 0 and out[k - 1][0]:
                m = re.match(r"(\s*)\+", seg)
                if m:
                    rhs = seg[m.end():].strip()
                    mo = re.match(r"[\w.`]+|\d*\.?\d+", rhs)
                    kind = self._operand_kind(mo.group(0), None) \
                        if mo else ""
                    if kind not in ("int", "float"):
                        seg = seg[:m.end() - 1] + "||" + seg[m.end():]
            if k + 1 < len(out) and out[k + 1][0]:
                m = re.search(r"\+(\s*)$", seg)
                if m:
                    lhs, _ = _scan_operand_back(seg, m.start())
                    kind = self._operand_kind(lhs, None) if lhs else ""
                    if kind not in ("int", "float"):
                        seg = seg[:m.start()] + "||" + seg[m.start() + 1:]
            out[k] = (False, seg)
        return out

    # -- OGR type-promotion rewrites ----------------------------------------

    def _col_kind(self, tok: str, default_tbl) -> str:
        """'int' | 'float' | 'other' | '' for a (possibly qualified)
        column token against the registered layer schemas."""
        tok = tok.strip().strip("`").lower()
        if "." in tok:
            t, c = tok.split(".", 1)
            return self._types.get(t, {}).get(c.strip("`"), "")
        for t in ([default_tbl.lower()] if default_tbl else []) \
                + [k for k in self._types if not default_tbl
                   or k != default_tbl.lower()]:
            k = self._types.get(t, {}).get(tok)
            if k:
                return k
        return ""

    def _operand_kind(self, expr: str, default_tbl) -> str:
        """Static SWQ-style type of a scalar operand expression: 'int',
        'float' or '' (unknown). Mirrors SWQGeneralChecker's promotion
        inputs — integer literals, integer columns, CAST AS
        INTEGER/BIGINT and +-*% combinations stay integral."""
        e = expr.strip()
        if not e:
            return ""
        if re.fullmatch(r"\d+", e):
            return "int"
        if re.fullmatch(r"\d*\.\d*([eE][-+]?\d+)?|\d+[eE][-+]?\d+", e):
            return "float"
        m = re.fullmatch(r"(?is)cast\s*\((.*)\s+as\s+([A-Za-z0-9_() ,]+)\)",
                         e)
        if m:
            ty = m.group(2).strip().lower()
            if ty.startswith(("int", "bigint", "smallint", "tinyint",
                              "boolean")):
                return "int"
            if ty.startswith(("float", "double", "real", "numeric",
                              "decimal")):
                return "float"
            return "other"
        if e.startswith("(") and e.endswith(")"):
            inner = e[1:-1]
            if "/" in inner:
                return "float"
            kinds = [self._operand_kind(t, default_tbl)
                     for t in re.split(r"[-+*%]", inner) if t.strip()]
            if kinds and all(k == "int" for k in kinds):
                return "int"
            if kinds and all(k in ("int", "float") for k in kinds):
                return "float"
            return ""
        if re.fullmatch(r"[A-Za-z_][\w.`]*", e):
            return self._col_kind(e, default_tbl)
        return ""

    def _rewrite_int_div(self, seg: str, default_tbl) -> str:
        """a / b with both operands provably integral -> C truncating
        division with the reference's INT_MAX on division by zero
        (swq_op_general.cpp:678-693)."""
        out = []
        pos = 0
        for m in re.finditer(r"/", seg):
            i = m.start()
            lhs, l0 = _scan_operand_back(seg, i)
            rhs, r1 = _scan_operand_fwd(seg, i + 1)
            if lhs is None or rhs is None or l0 < pos:
                continue
            if self._operand_kind(lhs, default_tbl) == "int" \
                    and self._operand_kind(rhs, default_tbl) == "int":
                out.append(seg[pos:l0])
                out.append(f"CASE WHEN {rhs} = 0 THEN 2147483647 "
                           f"ELSE {lhs} DIV {rhs} END")
                pos = r1
        out.append(seg[pos:])
        return "".join(out)

    def _promote_string_constants(self, parts, default_tbl):
        """SWQAutoConvertStringToNumeric: a string literal compared to a
        numeric column promotes to FLOAT — CAST the literal to DOUBLE."""
        cmp_back = re.compile(
            r"([A-Za-z_][\w.`]*)\s*(=|<>|!=|<=|>=|<|>)\s*$")
        cmp_fwd = re.compile(
            r"^\s*(=|<>|!=|<=|>=|<|>)\s*([A-Za-z_][\w.`]*)")
        segs = [s for _l, s in parts]
        for i, (is_lit, seg) in enumerate(parts):
            if not is_lit:
                continue
            promote = False
            if i > 0 and not parts[i - 1][0]:
                m = cmp_back.search(segs[i - 1])
                if m and self._col_kind(m.group(1), default_tbl) in (
                        "int", "float"):
                    promote = True
            if not promote and i + 1 < len(parts) and not parts[i + 1][0]:
                m = cmp_fwd.match(segs[i + 1])
                if m and self._col_kind(m.group(2), default_tbl) in (
                        "int", "float"):
                    promote = True
            if promote:
                segs[i] = f"CAST({seg} AS DOUBLE)"
        return segs

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


def _rewrite_cast_types(seg: str) -> str:
    """OGRSQL cast type spellings -> Spark: CHARACTER(n)/CHARACTER ->
    STRING (the width is formatting metadata in OGR, not CHAR padding),
    NUMERIC(p,s) -> DECIMAL(p,s)."""
    seg = re.sub(r"(?i)\bCHARACTER\s*\(\s*\d+\s*\)", "STRING", seg)
    seg = re.sub(r"(?i)\bCHARACTER\b", "STRING", seg)
    seg = re.sub(r"(?i)\bNUMERIC\s*\(", "DECIMAL(", seg)
    return seg


def _rewrite_float_literals(seg: str) -> str:
    """swq lexes any numeric literal containing '.' or an exponent as
    SWQ_FLOAT (C double); Spark parses `1.` / `1.5` as DECIMAL. Append
    the D suffix so the literal IS a double."""
    return re.sub(
        r"(?<![\w.`])(\d+\.\d*(?:[eE][-+]?\d+)?|\.\d+(?:[eE][-+]?\d+)?"
        r"|\d+[eE][-+]?\d+)(?![\w.])",
        r"\1D", seg)


def _scan_operand_back(s: str, i: int):
    """Scalar operand ending just before s[i] -> (text, start) or
    (None, i): identifier/number, optionally a parenthesized tail, and a
    function-call head (cast(...) etc.)."""
    j = i
    while j > 0 and s[j - 1] in " \t\n":
        j -= 1
    end = j
    if j > 0 and s[j - 1] == ")":
        depth = 0
        while j > 0:
            j -= 1
            if s[j] == ")":
                depth += 1
            elif s[j] == "(":
                depth -= 1
                if depth == 0:
                    break
        if depth != 0:
            return None, i
        # function-call head?
        k = j
        while k > 0 and (s[k - 1].isalnum() or s[k - 1] in "_."):
            k -= 1
        start = k if k < j else j
        return s[start:end], start
    k = j
    while k > 0 and (s[k - 1].isalnum() or s[k - 1] in "_.`"):
        k -= 1
    if k == j:
        return None, i
    return s[k:end], k


def _scan_operand_fwd(s: str, i: int):
    """Scalar operand starting at/after s[i] -> (text, end) or (None, i)."""
    n = len(s)
    j = i
    while j < n and s[j] in " \t\n":
        j += 1
    start = j
    m = re.match(r"[A-Za-z_][\w.`]*", s[j:])
    if m:
        j += m.end()
        if j < n and s[j] == "(":            # function call
            depth = 0
            while j < n:
                if s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
                j += 1
        return s[start:j], j
    if j < n and s[j] == "(":
        depth = 0
        while j < n:
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
                if depth == 0:
                    j += 1
                    break
            j += 1
        return s[start:j], j
    m = re.match(r"\d+\.\d*([eE][-+]?\d+)?|\.\d+([eE][-+]?\d+)?"
                 r"|\d+([eE][-+]?\d+)?", s[j:])
    if m:
        return s[start:j + m.end()], j + m.end()
    return None, i


def _fold_like_escape(parts):
    """LIKE 'pattern' ESCAPE 'c' -> LIKE 'folded' (swq_op_general.cpp
    swq_like ESCAPE handling): the OGR escape char makes the next char
    literal regardless of what it is; Spark only allows escaping
    wildcards, so the pattern folds to backslash-escaped form here."""
    out = list(parts)
    i = 0
    while i + 3 < len(out):
        (l0, s0), (l1, s1), (l2, s2), (l3, s3) = out[i:i + 4]
        if (not l0 and re.search(r"(?i)\bI?LIKE\s*$", s0)
                and l1 and not l2
                and re.fullmatch(r"(?is)\s*ESCAPE\s*", s2) and l3):
            esc = s3[1:-1].replace("''", "'")
            pat = s1[1:-1].replace("''", "'")
            folded = []
            k = 0
            while k < len(pat):
                ch = pat[k]
                if esc and ch == esc and k + 1 < len(pat):
                    nxt = pat[k + 1]
                    folded.append("\\" + nxt if nxt in "%_\\" else nxt)
                    k += 2
                    continue
                folded.append("\\\\" if ch == "\\" else ch)
                k += 1
            lit = "'" + "".join(folded).replace("'", "''") + "'"
            out[i + 1] = (True, lit)
            out[i + 2] = (False, " ")
            out[i + 3] = (False, "")
        i += 1
    return out


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
