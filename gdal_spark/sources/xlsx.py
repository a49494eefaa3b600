"""XLSX + ODS spreadsheet vector sources/sinks.

Reference drivers: ogr/ogrsf_frmts/xlsx (ogrxlsxdatasource.cpp — OOXML
SpreadsheetML: zip of xl/workbook.xml + xl/worksheets/sheetN.xml +
xl/sharedStrings.xml) and ogr/ogrsf_frmts/ods (content.xml with
table:table / table:table-row / table:table-cell, office:value-type,
number-columns-repeated). Both are attribute-only layers: first row is
the header (OGR's default autodetect accepts an all-string first row as
field names), remaining rows become features.

Spark shape: ``binaryFile`` scan -> one parse task per archive
(spreadsheets are small single files; many files scan in parallel),
cells typed into JSON props like the other attribute sources. Writers
are deterministic bounded fixture sinks (fixed zip timestamps) like
write_gmt — spreadsheets are an exchange format, not a 100 TB sink.
"""

from __future__ import annotations

import io
import re
import zipfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SCHEMA = T.StructType([
    T.StructField("sheet", T.StringType()),
    T.StructField("fid", T.LongType()),
    T.StructField("props", T.StringType()),
])

_ENT = {"&amp;": "&", "&lt;": "<", "&gt;": ">",
        "&quot;": '"', "&apos;": "'"}


def _unescape(s: str) -> str:
    for k, v in _ENT.items():
        s = s.replace(k, v)
    return re.sub(r"&#x([0-9a-fA-F]+);",
                  lambda m: chr(int(m.group(1), 16)),
                  re.sub(r"&#([0-9]+);", lambda m: chr(int(m.group(1))), s))


def _escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def _col_index(ref: str) -> int:
    """'B3' -> 1 (0-based column)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(65 + r) + out
    return out


def _typed(v):
    """Cell text -> int/float/str the way OGR's field autodetect does."""
    try:
        f = float(v)
    except (TypeError, ValueError):
        return v
    if f == int(f) and "e" not in v.lower() and "." not in v:
        return int(f)
    return f


# ---------------------------------------------------------------------------
# XLSX
# ---------------------------------------------------------------------------

def _parse_xlsx_bytes(data: bytes):
    """-> [(sheet_name, fid, {header: value})] (first row = header)."""
    import json

    zf = zipfile.ZipFile(io.BytesIO(data))
    names = zf.namelist()
    shared = []
    if "xl/sharedStrings.xml" in names:
        ss = zf.read("xl/sharedStrings.xml").decode("utf-8")
        for si in re.findall(r"<si>(.*?)</si>", ss, re.S):
            shared.append(_unescape("".join(
                re.findall(r"<t[^>]*>(.*?)</t>", si, re.S))))
    # workbook sheet order: name -> sheetN.xml via rels
    wb = zf.read("xl/workbook.xml").decode("utf-8")
    rels = {}
    if "xl/_rels/workbook.xml.rels" in names:
        for m in re.finditer(
                r'<Relationship[^>]*Id="([^"]+)"[^>]*Target="([^"]+)"',
                zf.read("xl/_rels/workbook.xml.rels").decode("utf-8")):
            rels[m.group(1)] = m.group(2)
    sheets = []
    for m in re.finditer(
            r'<sheet[^>]*name="([^"]+)"[^>]*r:id="([^"]+)"', wb):
        tgt = rels.get(m.group(2), "worksheets/sheet1.xml")
        sheets.append((_unescape(m.group(1)),
                       "xl/" + tgt.lstrip("/") if not tgt.startswith("xl/")
                       else tgt))
    out = []
    for sheet_name, member in sheets:
        if member not in names:
            continue
        xml = zf.read(member).decode("utf-8")
        rows = []
        for rm in re.finditer(r"<row[^>]*>(.*?)</row>", xml, re.S):
            cells = {}
            auto_idx = 0
            for cm in re.finditer(
                    r"<c([^>]*?)(?:/>|>(.*?)</c>)", rm.group(1), re.S):
                attrs, body = cm.group(1), cm.group(2) or ""
                ref = re.search(r'r="([^"]+)"', attrs)
                idx = _col_index(ref.group(1)) if ref else auto_idx
                auto_idx = idx + 1
                ct = re.search(r't="([^"]+)"', attrs)
                ct = ct.group(1) if ct else "n"
                vm = re.search(r"<v>(.*?)</v>", body, re.S)
                if ct == "inlineStr":
                    tm = "".join(re.findall(r"<t[^>]*>(.*?)</t>", body, re.S))
                    cells[idx] = _unescape(tm)
                elif vm is None:
                    cells[idx] = None
                elif ct == "s":
                    cells[idx] = shared[int(vm.group(1))]
                elif ct == "b":
                    cells[idx] = vm.group(1) == "1"
                elif ct == "str":
                    cells[idx] = _unescape(vm.group(1))
                else:
                    cells[idx] = _typed(vm.group(1))
            rows.append(cells)
        if not rows:
            continue
        width = max(max(r.keys(), default=-1) for r in rows) + 1
        header = [str(rows[0].get(i, f"Field{i + 1}")) for i in range(width)]
        for fid, r in enumerate(rows[1:]):
            out.append((sheet_name, fid,
                        json.dumps({header[i]: r.get(i) for i in range(width)},
                                   sort_keys=True)))
    return out


def read_xlsx(spark: SparkSession, path: str) -> DataFrame:
    """.xlsx -> (sheet, fid, props JSON); one parse task per archive."""
    raw = spark.read.format("binaryFile").load(path) \
        .select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for data in pdf["content"]:
                rows.extend(_parse_xlsx_bytes(bytes(data)))
            yield pd.DataFrame(rows, columns=["sheet", "fid", "props"]) \
                if rows else pd.DataFrame(
                    {"sheet": pd.Series(dtype="object"),
                     "fid": pd.Series(dtype="int64"),
                     "props": pd.Series(dtype="object")})

    return raw.mapInPandas(parse, _SCHEMA)


_XLSX_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_XLSX_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_XLSX_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""


def write_xlsx(rows, path: str, headers=None,
               sheet_name: str = "Sheet1") -> None:
    """rows: [{header: value}] -> one minimal .xlsx (deterministic zip:
    fixed timestamps, stored entries in a fixed order)."""
    rows = list(rows)
    headers = headers or (list(rows[0].keys()) if rows else [])
    shared, sidx = [], {}

    def s_id(s):
        if s not in sidx:
            sidx[s] = len(shared)
            shared.append(s)
        return sidx[s]

    def cell_xml(ref, v):
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return f'<c r="{ref}" t="s"><v>{s_id(str(v))}</v></c>'

    body = []
    hdr = "".join(cell_xml(f"{_col_letter(i)}1", h)
                  for i, h in enumerate(headers))
    body.append(f'<row r="1">{hdr}</row>')
    for rno, r in enumerate(rows, 2):
        cs = "".join(cell_xml(f"{_col_letter(i)}{rno}", r.get(h))
                     for i, h in enumerate(headers))
        body.append(f'<row r="{rno}">{cs}</row>')
    sheet = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>'
             + "".join(body) + "</sheetData></worksheet>")
    ss = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          f'<sst count="{len(shared)}" uniqueCount="{len(shared)}">'
          + "".join(f"<si><t>{_escape(s)}</t></si>" for s in shared)
          + "</sst>")
    wb = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<workbook xmlns="http://schemas.openxmlformats.org/'
          'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats'
          '.org/officeDocument/2006/relationships"><sheets>'
          f'<sheet name="{_escape(sheet_name)}" sheetId="1" r:id="rId1"/>'
          '</sheets></workbook>')
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in (("[Content_Types].xml", _XLSX_CT),
                           ("_rels/.rels", _XLSX_RELS),
                           ("xl/workbook.xml", wb),
                           ("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS),
                           ("xl/worksheets/sheet1.xml", sheet),
                           ("xl/sharedStrings.xml", ss)):
            zi = zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)


# ---------------------------------------------------------------------------
# ODS (OpenDocument spreadsheet — content.xml)
# ---------------------------------------------------------------------------

def _parse_ods_bytes(data: bytes):
    import json

    zf = zipfile.ZipFile(io.BytesIO(data))
    xml = zf.read("content.xml").decode("utf-8")
    out = []
    for tm in re.finditer(
            r'<table:table[^>]*table:name="([^"]+)"[^>]*>(.*?)</table:table>',
            xml, re.S):
        sheet_name = _unescape(tm.group(1))
        rows = []
        for rm in re.finditer(
                r"<table:table-row[^>]*>(.*?)</table:table-row>"
                r"|<table:table-row[^>]*/>", tm.group(2), re.S):
            body = rm.group(1) or ""
            cells = []
            for cm in re.finditer(
                    r"<table:table-cell([^>]*?)(?:/>|>(.*?)</table:table-cell>)",
                    body, re.S):
                attrs, cbody = cm.group(1), cm.group(2) or ""
                rep = re.search(r'table:number-columns-repeated="(\d+)"',
                                attrs)
                rep = int(rep.group(1)) if rep else 1
                vt = re.search(r'office:value-type="([^"]+)"', attrs)
                vt = vt.group(1) if vt else None
                if vt in ("float", "percentage", "currency"):
                    v = re.search(r'office:value="([^"]+)"', attrs)
                    val = _typed(v.group(1)) if v else None
                elif vt == "boolean":
                    v = re.search(r'office:boolean-value="([^"]+)"', attrs)
                    val = (v.group(1) == "true") if v else None
                elif vt is None:
                    val = None
                else:
                    val = _unescape("".join(re.findall(
                        r"<text:p[^>]*>(.*?)</text:p>", cbody, re.S)))
                cells.extend([val] * min(rep, 4096))
            rows.append(cells)
        while rows and all(v is None for v in rows[-1]):
            rows.pop()
        if not rows:
            continue
        width = max(len(r) for r in rows)
        header = [(str(rows[0][i]) if i < len(rows[0])
                   and rows[0][i] is not None else f"Field{i + 1}")
                  for i in range(width)]
        for fid, r in enumerate(rows[1:]):
            out.append((sheet_name, fid, json.dumps(
                {header[i]: (r[i] if i < len(r) else None)
                 for i in range(width)}, sort_keys=True)))
    return out


def read_ods(spark: SparkSession, path: str) -> DataFrame:
    """.ods -> (sheet, fid, props JSON); one parse task per archive."""
    raw = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for data in pdf["content"]:
                rows.extend(_parse_ods_bytes(bytes(data)))
            yield pd.DataFrame(rows, columns=["sheet", "fid", "props"]) \
                if rows else pd.DataFrame(
                    {"sheet": pd.Series(dtype="object"),
                     "fid": pd.Series(dtype="int64"),
                     "props": pd.Series(dtype="object")})

    return raw.mapInPandas(parse, _SCHEMA)


_ODS_MANIFEST = """<?xml version="1.0" encoding="UTF-8"?>
<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" manifest:version="1.2">
<manifest:file-entry manifest:full-path="/" manifest:media-type="application/vnd.oasis.opendocument.spreadsheet"/>
<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>
</manifest:manifest>"""


def write_ods(rows, path: str, headers=None,
              sheet_name: str = "Sheet1") -> None:
    """rows: [{header: value}] -> one minimal .ods (same determinism
    contract as write_xlsx)."""
    rows = list(rows)
    headers = headers or (list(rows[0].keys()) if rows else [])

    def cell(v):
        if v is None:
            return "<table:table-cell/>"
        if isinstance(v, bool):
            b = "true" if v else "false"
            return (f'<table:table-cell office:value-type="boolean" '
                    f'office:boolean-value="{b}">'
                    f"<text:p>{b}</text:p></table:table-cell>")
        if isinstance(v, (int, float)):
            return (f'<table:table-cell office:value-type="float" '
                    f'office:value="{v!r}"><text:p>{v!r}</text:p>'
                    "</table:table-cell>")
        return ('<table:table-cell office:value-type="string">'
                f"<text:p>{_escape(str(v))}</text:p></table:table-cell>")

    body = ["<table:table-row>"
            + "".join(cell(h) for h in headers) + "</table:table-row>"]
    for r in rows:
        body.append("<table:table-row>"
                    + "".join(cell(r.get(h)) for h in headers)
                    + "</table:table-row>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
        'office:version="1.2"><office:body><office:spreadsheet>'
        f'<table:table table:name="{_escape(sheet_name)}">'
        + "".join(body)
        + "</table:table></office:spreadsheet></office:body>"
          "</office:document-content>")
    with zipfile.ZipFile(path, "w") as zf:
        zi = zipfile.ZipInfo("mimetype", (1980, 1, 1, 0, 0, 0))
        zf.writestr(zi, "application/vnd.oasis.opendocument.spreadsheet")
        for name, data in (("content.xml", content),
                           ("META-INF/manifest.xml", _ODS_MANIFEST)):
            zi = zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
