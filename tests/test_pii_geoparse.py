"""PII scrubbing + regex geoparse (webtext pipeline operators)."""

import pyspark.sql.functions as F

from gdal_spark.operators import textops


def test_pii_scrub_replaces_and_counts(spark):
    rows = [
        (1, "mail me at a.b+c@ex-a.mple.org or call +44-201-9999 now"),
        (2, "server 192.168.0.1 and 10.0.0.255 handled it"),
        (3, "clean text, no identifiers here"),
        (4, "two mails: x@y.io z@w.co and ip 1.2.3.4"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in textops.pii_scrub(df).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ip"]) == (1, 1, 0)
    assert out[1]["scrubbed"] == "mail me at <EMAIL> or call <PHONE> now"
    assert out[2]["n_ip"] == 2
    assert out[2]["scrubbed"] == "server <IP> and <IP> handled it"
    assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_ip"]) == (0, 0, 0)
    assert out[3]["scrubbed"] == rows[2][1]
    assert out[4]["n_email"] == 2 and out[4]["n_ip"] == 1
    assert out[4]["scrubbed"] == "two mails: <EMAIL> <EMAIL> and ip <IP>"


def test_pii_scrub_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "x@y.io")], ["doc_id", "text"])
    plan = textops.pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_geoparse_extracts_and_nulls(spark):
    rows = [
        (1, '<meta content="geo:-8500;17999">'),
        (2, 'prose geo:123;-4567 inline'),
        (3, "no token here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "html_txt"])
    out = {r["doc_id"]: r for r in textops.geoparse(df).collect()}
    assert out[1]["plat"] == -85.0 and out[1]["plon"] == 179.99
    assert out[2]["plat"] == 1.23 and out[2]["plon"] == -45.67
    assert out[3]["plat"] is None and out[3]["plon"] is None


def test_geoparse_first_match_wins(spark):
    df = spark.createDataFrame(
        [(1, "geo:100;200 then geo:300;400")], ["doc_id", "html_txt"])
    r = textops.geoparse(df).collect()[0]
    assert (r["plat"], r["plon"]) == (1.0, 2.0)
