"""XLSX / ODS spreadsheet sources: cell typing, escaping, multi-sheet,
column gaps, repeated columns (the driver query pins the bulk trip)."""

import json

from gdal_spark.sources import xlsx as X


def _roundtrip_xlsx(rows, **kw):
    import tempfile
    p = tempfile.mktemp(suffix=".xlsx")
    X.write_xlsx(rows, p, **kw)
    return X._parse_xlsx_bytes(open(p, "rb").read())


def test_cell_types_roundtrip():
    rows = [{"s": 'q"uo<te>&', "i": -17, "f": 2.25, "b": False, "n": None}]
    out = _roundtrip_xlsx(rows)
    got = json.loads(out[0][2])
    assert got == {"s": 'q"uo<te>&', "i": -17, "f": 2.25,
                   "b": False, "n": None}
    assert isinstance(got["i"], int) and isinstance(got["f"], float)


def test_xlsx_column_gap():
    # a cell with an explicit ref skipping a column -> gap stays None
    xml_rows = _roundtrip_xlsx([{"a": 1, "b": None, "c": 3}])
    got = json.loads(xml_rows[0][2])
    assert got["b"] is None and got["c"] == 3


def test_ods_repeated_columns():
    import tempfile
    p = tempfile.mktemp(suffix=".ods")
    # hand-build content with number-columns-repeated
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        '<office:body><office:spreadsheet>'
        '<table:table table:name="S">'
        "<table:table-row>"
        '<table:table-cell office:value-type="string"><text:p>h1</text:p>'
        "</table:table-cell>"
        '<table:table-cell office:value-type="string"><text:p>h2</text:p>'
        "</table:table-cell>"
        '<table:table-cell office:value-type="string"><text:p>h3</text:p>'
        "</table:table-cell></table:table-row>"
        "<table:table-row>"
        '<table:table-cell office:value-type="float" office:value="7" '
        'table:number-columns-repeated="2"><text:p>7</text:p>'
        "</table:table-cell>"
        '<table:table-cell office:value-type="string"><text:p>z</text:p>'
        "</table:table-cell></table:table-row>"
        "</table:table></office:spreadsheet></office:body>"
        "</office:document-content>")
    import zipfile
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("content.xml", content)
    out = X._parse_ods_bytes(open(p, "rb").read())
    got = json.loads(out[0][2])
    assert got == {"h1": 7, "h2": 7, "h3": "z"}


def test_open_dispatch(spark, tmp_path):
    from gdal_spark.sources import open_vector
    p = str(tmp_path / "t.xlsx")
    X.write_xlsx([{"a": 1}, {"a": 2}], p)
    df = open_vector(spark, p)
    vals = sorted(json.loads(r.props)["a"] for r in df.collect())
    assert vals == [1, 2]
