"""OGRSQL front end (engine.sql) golden battery.

Reference semantics: GDALDataset::ExecuteSQL's generic SQL engine
(/root/reference/gcore/gdaldataset.cpp:6860,
ogr/ogrsf_frmts/generic/ogr_gensql.cpp), exercised the way
autotest/ogr/ogr_sql_test.py does — small fixture layers, assertions on
row sets. Quirks pinned here: special fields, first-match LEFT joins,
LIKE case sensitivity + the OGR_SQL_LIKE_AS_ILIKE toggle, DISTINCT/ORDER
BY null placement (nulls first asc, last desc — swq.cpp:606), summary
records, LIMIT/OFFSET and UNION ALL.
"""

import numpy as np
import pytest

from gdal_spark.core import wkb
from gdal_spark.sql import OgrSqlEngine


@pytest.fixture()
def eng(spark):
    import pandas as pd
    from pyspark.sql import types as T

    e = OgrSqlEngine(spark)
    boxes = [(i, f"name{i}", None if i == 3 else chr(65 + i % 5),
              float(i) * 1.5,
              wkb.box(0.0 + 10 * i, 0.0, 4.0 + 10 * i, 5.0 + i))
             for i in range(8)]
    cities = spark.createDataFrame(
        pd.DataFrame(boxes, columns=["fid", "name", "cls", "score", "geom"]),
        schema=T.StructType([
            T.StructField("fid", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("cls", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("geom", T.BinaryType())]))
    e.register("cities", cities, fid_col="fid")

    lut = spark.createDataFrame(
        pd.DataFrame([(100, "A", "alpha"), (101, "A", "alpha-dup"),
                      (102, "B", "beta"), (103, "C", "gamma")],
                     columns=["fid", "cls", "label"]),
        schema=T.StructType([
            T.StructField("fid", T.LongType()),
            T.StructField("cls", T.StringType()),
            T.StructField("label", T.StringType())]))
    e.register("lut", lut, fid_col="fid")
    return e


def test_select_where_order_limit(eng):
    rows = eng.sql("SELECT name, score FROM cities "
                   "WHERE score > 3 ORDER BY score DESC LIMIT 2").collect()
    assert [(r.name, r.score) for r in rows] == \
        [("name7", 10.5), ("name6", 9.0)]


def test_special_fields(eng):
    rows = eng.sql(
        "SELECT FID, OGR_GEOMETRY, OGR_GEOM_AREA, OGR_GEOM_WKT "
        "FROM cities WHERE FID = 2").collect()
    r = rows[0]
    assert r[0] == 2
    assert r[1] == "POLYGON"
    assert r[2] == pytest.approx(4.0 * 7.0)
    assert r[3].startswith("POLYGON")


def test_first_match_join_lowest_fid(eng):
    """ogr_gensql.cpp:1505: one secondary match per primary — the first in
    FID order; unmatched primaries keep NULL secondary fields."""
    rows = eng.sql(
        "SELECT cities.fid, lut.label FROM cities "
        "JOIN lut ON cities.cls = lut.cls ORDER BY cities.fid").collect()
    got = [(r.fid, r.label) for r in rows]
    # every city row survives (LEFT), 'A' rows take fid=100's label
    assert len(got) == 8
    by_fid = dict(got)
    assert by_fid[0] == "alpha"          # cls A -> first match (fid 100)
    assert by_fid[5] == "alpha"          # cls A again -> same first match
    assert by_fid[1] == "beta"
    assert by_fid[2] == "gamma"
    assert by_fid[3] is None             # NULL key -> no join
    assert by_fid[4] is None             # cls 'E' unmatched


def test_like_sensitivity_and_toggle(spark, eng):
    """LIKE is case-sensitive by default; OGR_SQL_LIKE_AS_ILIKE rewrites
    it to ILIKE (swq_op_general.cpp:1100)."""
    n = eng.sql("SELECT name FROM cities WHERE name LIKE 'NAME%'").count()
    assert n == 0
    n2 = eng.sql("SELECT name FROM cities WHERE name ILIKE 'NAME%'").count()
    assert n2 == 8
    eng2 = OgrSqlEngine(spark, like_as_ilike=True)
    eng2._fid, eng2._geom, eng2._cols = eng._fid, eng._geom, eng._cols
    n3 = eng2.sql("SELECT name FROM cities WHERE name LIKE 'NAME%'").count()
    assert n3 == 8


def test_distinct_null_ordering(eng):
    """DISTINCT + ORDER BY: nulls first ascending, last descending
    (swq.cpp:606-608 SZ_OGR_NULL comparator)."""
    asc = [r.cls for r in
           eng.sql("SELECT DISTINCT cls FROM cities ORDER BY cls").collect()]
    assert asc[0] is None and asc[1:] == sorted(asc[1:])
    desc = [r.cls for r in eng.sql(
        "SELECT DISTINCT cls FROM cities ORDER BY cls DESC").collect()]
    assert desc[-1] is None and desc[:-1] == sorted(desc[:-1], reverse=True)


def test_summary_record(eng):
    rows = eng.sql("SELECT COUNT(*), MIN(score), MAX(score), AVG(score) "
                   "FROM cities").collect()
    assert len(rows) == 1
    assert rows[0][0] == 8 and rows[0][1] == 0.0 and rows[0][2] == 10.5


def test_limit_offset_and_union_all(eng):
    rows = eng.sql("SELECT fid FROM cities ORDER BY fid "
                   "LIMIT 3 OFFSET 2").collect()
    assert [r.fid for r in rows] == [2, 3, 4]
    n = eng.sql("SELECT fid FROM cities WHERE fid < 2 UNION ALL "
                "SELECT fid FROM cities WHERE fid >= 6").count()
    assert n == 4


def test_double_quoted_identifiers_and_literals(eng):
    rows = eng.sql("SELECT \"name\" FROM cities "
                   "WHERE name = 'name1' OR name = 'it''s'").collect()
    assert [r.name for r in rows] == ["name1"]


def test_qualified_special_field_in_join(eng):
    rows = eng.sql(
        "SELECT cities.FID, lut.fid FROM cities "
        "JOIN lut ON cities.cls = lut.cls WHERE cities.FID = 0").collect()
    assert rows[0][0] == 0 and rows[0][1] == 100


def test_rewrites_never_touch_string_literals(eng):
    """Join/LIKE/special-field rewrites must not fire inside single-quoted
    literals, and a literal between SELECT and FROM must not break the
    unqualified-FID binding (round-3 review findings)."""
    rows = eng.sql("SELECT name FROM cities "
                   "WHERE name != 'x JOIN lut ON cities.cls = lut.cls' "
                   "AND fid = 1").collect()
    assert [r.name for r in rows] == ["name1"]
    rows2 = eng.sql("SELECT FID, 'tag' AS t FROM cities "
                    "WHERE FID = 2").collect()
    assert rows2[0][0] == 2 and rows2[0].t == "tag"


def test_sqlite_dialect_utility_functions(spark):
    """ogr_deflate/ogr_inflate/hstore_get_value/ogr_version — the non-ST
    half of the reference's SQLite-dialect registrations
    (ogrsqlitesqlfunctions.cpp:120-208, :1066-1089, :1150-1160)."""
    from gdal_spark.functions import st

    st.register_all(spark)
    spark.createDataFrame(
        [(1, "round trip", '"a"=>"x y", plain=>7'),
         (2, None, "k=>")],
        ["i", "t", "h"]).createOrReplaceTempView("sqlfn_v")
    rows = {r.i: r for r in spark.sql("""
        SELECT i,
               decode(ogr_inflate(ogr_deflate(t)), 'utf-8') AS rt,
               hstore_get_value(h, 'a') AS ha,
               hstore_get_value(h, 'plain') AS hp,
               hstore_get_value(h, 'missing') AS hm,
               ogr_inflate(cast('junk' AS binary)) AS bad
        FROM sqlfn_v""").collect()}
    assert rows[1].rt == "round trip\x00"     # strlen+1 deflate semantics
    assert rows[1].ha == "x y"
    assert rows[1].hp == "7"
    assert rows[1].hm is None
    assert rows[1].bad is None                # inflate error -> NULL
    assert rows[2].rt is None


# ---------------------------------------------------------------------------
# Round 4: the swq semantic tail — truncating integer division with INT_MAX
# on /0 (swq_op_general.cpp:678-693), float promotion (SWQGeneralChecker
# :1482-1492), string-constant-to-numeric comparison promotion
# (SWQAutoConvertStringToNumeric :1327), UNION ALL arms, CAST spellings.
# The arithmetic battery is ported from autotest/ogr/ogr_sql_test.py
# test_ogr_sql_49.
# ---------------------------------------------------------------------------

def test_swq_arithmetic_battery_ported(eng):
    """autotest test_ogr_sql_49 expressions, verbatim."""
    cases = [
        ("1/1", 1),
        ("1/1.", 1.0),
        ("cast((1) as integer)/1.", 1.0),
        ("1./cast((1) as integer)", 1.0),
        ("1.5+1", 2.5),
        ("(1*1)+1.5", 2.5),
        ("1+1", 2),
        ("cast(1 as integer)+ 1234567890123", 1234567890124),
        ("cast(1 as integer)* 1234567890123", 1234567890123),
    ]
    for expr, want in cases:
        r = eng.sql(f"select {expr} as result from cities limit 1") \
            .collect()[0]
        assert r.result == want, expr
        assert isinstance(r.result, type(want)) \
            or (isinstance(want, int) and isinstance(r.result, int)), expr


def test_swq_integer_division_truncates_and_int_max_on_zero(eng):
    rows = eng.sql(
        "select fid, fid / 3 as d, (0 - fid) / 3 as dn, fid / 0 as dz "
        "from cities order by fid").collect()
    for r in rows:
        assert r.d == int(r.fid / 3) if r.fid >= 0 else -(-r.fid // 3)
        # C division truncates toward ZERO (not floor)
        assert r.dn == -(r.fid // 3) if r.fid % 3 == 0 else r.dn == -(r.fid // 3) - (1 if r.fid % 3 else 0) + 1
    got = {r.fid: (r.d, r.dn, r.dz) for r in rows}
    assert got[7] == (2, -2, 2147483647)     # -7/3 = -2 in C, not -3
    assert got[6] == (2, -2, 2147483647)
    # float operand keeps float division
    r = eng.sql("select fid / 2. as f from cities where fid = 7") \
        .collect()[0]
    assert r.f == 3.5


def test_swq_string_constant_promotes_to_numeric(eng):
    # int column vs string literal: SWQAutoConvertStringToNumeric
    rows = eng.sql("select fid from cities where fid = '5'").collect()
    assert [r.fid for r in rows] == [5]
    rows = eng.sql("select fid from cities where '5.0' = fid").collect()
    assert [r.fid for r in rows] == [5]
    rows = eng.sql(
        "select fid from cities where score > '9' order by fid").collect()
    assert [r.fid for r in rows] == [7]
    # string column vs string literal stays a STRING comparison
    rows = eng.sql("select fid from cities where name = 'name5'").collect()
    assert [r.fid for r in rows] == [5]


def test_swq_union_all_arms_translate_independently(eng):
    rows = eng.sql(
        "SELECT FID, name FROM cities WHERE FID = 1 "
        "UNION ALL SELECT FID, label FROM lut WHERE FID = 102 "
        "UNION ALL SELECT FID, name FROM cities WHERE name = 'name3'"
    ).collect()
    assert sorted((r[0], r[1]) for r in rows) == \
        [(1, "name1"), (3, "name3"), (102, "beta")]


def test_swq_cast_spellings(eng):
    r = eng.sql("select CAST(fid as CHARACTER(10)) as s, "
                "CAST(score as numeric(7,3)) as n "
                "from cities where fid = 4").collect()[0]
    assert r.s == "4" and float(r.n) == 6.0
    # ported from test_ogr_sql (CAST in WHERE)
    rows = eng.sql("select fid from cities "
                   "where CAST(fid AS CHARACTER(10)) = '6'").collect()
    assert [r.fid for r in rows] == [6]
