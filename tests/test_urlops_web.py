"""SURT keys, sitemap parsing, anchor-text rollup — edge-case pins
(the driver oracles cover the bulk semantics)."""

from pyspark.sql import functions as F

from gdal_spark.operators import urlops


def test_surt_key(spark):
    df = spark.createDataFrame(
        [("https://WWW.Example.COM:443/Path/Sub?q=1#frag",),
         ("http://a.b.c.org/x",)], "url string")
    got = [r.s for r in
           df.select(urlops.surt_key_col(F.col("url")).alias("s")).collect()]
    assert got[0] == "com,example)/path/sub?q=1"
    assert got[1] == "org,c,b,a)/x"


def test_parse_sitemaps_optional_fields(spark):
    body = ('<urlset><url><loc>https://x/a</loc>'
            '<priority>0.5</priority></url>'
            '<url><loc>https://x/b</loc></url></urlset>')
    df = spark.createDataFrame([("h1", body)], "host string, body string")
    rows = {r.loc: r for r in urlops.parse_sitemaps(df).collect()}
    assert rows["https://x/a"].priority == 0.5
    assert rows["https://x/a"].lastmod is None
    assert rows["https://x/b"].priority is None
    assert all(r.kind == "url" for r in rows.values())


def test_sitemapindex_kind(spark):
    body = ('<sitemapindex><sitemap><loc>https://x/m.xml</loc>'
            '</sitemap></sitemapindex>')
    df = spark.createDataFrame([("h1", body)], "host string, body string")
    rows = urlops.parse_sitemaps(df).collect()
    assert len(rows) == 1 and rows[0].kind == "sitemap"
    assert rows[0].loc == "https://x/m.xml"


def test_anchor_rollup_tiebreak(spark):
    # target t1 gets two distinct anchors with equal counts -> lexicographic
    html1 = '<a href="t1" x>zeta</a> <a href="t1" x>alpha</a>'
    html2 = '<a href="t1" x>zeta</a> <a href="t1" x>alpha</a>'
    df = spark.createDataFrame(
        [("u1", html1), ("u2", html2)], "url string, html_txt string")
    rows = {r.target: r for r in urlops.anchor_text_rollup(df).collect()}
    assert rows["t1"].n_links == 4
    assert rows["t1"].n_sources == 2
    assert rows["t1"].top_anchor == "alpha"
