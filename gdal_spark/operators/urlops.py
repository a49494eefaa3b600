"""URL canonicalization + dedup — the Common-Crawl ingest normalizer.

The reference engine has no URL surface (it's a geospatial library); this
is part of the training-data-pipeline layer the engine adds on top (like
textops): canonicalize crawl URLs so byte-different spellings of the same
resource collapse before dedup/extraction, entirely in JVM column math
(regexp + array built-ins, no UDF — a map-only stage fused into the scan).

Rules (the standard RFC 3986 normalizations that are safe without
fetching): lowercase scheme+host, strip the default port (:443 https /
:80 http), drop the fragment, drop a single trailing slash on the path,
and sort query parameters (order is almost never semantic; sorting makes
the string canonical).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonical_url_col(url: Column) -> Column:
    head = F.lower(F.regexp_extract(url, r"^([a-zA-Z]+://[^/?#]+)", 1))
    head = F.regexp_replace(
        F.regexp_replace(head, r"^(https://[^/?#]*):443$", r"$1"),
        r"^(http://[^/?#]*):80$", r"$1")
    rest = F.regexp_extract(url, r"^[a-zA-Z]+://[^/?#]+(.*)$", 1)
    rest = F.regexp_replace(rest, r"#.*$", "")          # fragment
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/$", "")            # trailing slash
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        head, path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"),
                                                          sorted_q)))


def url_dedup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(canon_url, n_dupes, keep_id) — canonicalize, group, keep the lowest
    doc_id per group (the deterministic representative). One shuffle keyed
    by the canonical string; partial aggregation collapses duplicates
    map-side, so the shuffle carries ~#distinct urls."""
    return (df.select(canonical_url_col(F.col(url_col)).alias("canon_url"),
                      "doc_id")
            .groupBy("canon_url")
            .agg(F.count("*").alias("n_dupes"),
                 F.min("doc_id").alias("keep_id")))


def host_col(url: Column) -> Column:
    """lowercased hostname (port stripped) of a URL column."""
    h = F.lower(F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)", 1))
    return F.regexp_replace(h, r":\d+$", "")


def domain_block(pages: DataFrame, max_pages_per_host: int,
                 url_col: str = "url") -> DataFrame:
    """Over-represented-domain filter (the spam/SEO-farm heuristic every
    web-corpus pipeline runs): hosts contributing more than
    `max_pages_per_host` pages are dropped wholesale. The blocklist is
    an aggregate over the corpus itself (map-side-combined groupBy) and
    is host-cardinality-sized, so it broadcast-anti-joins back — the
    page table shuffles nothing."""
    h = pages.withColumn("host", host_col(F.col(url_col)))
    blocked = (h.groupBy("host").agg(F.count("*").alias("n_pages"))
               .where(F.col("n_pages") > max_pages_per_host))
    return h.join(F.broadcast(blocked.select("host")), "host", "left_anti")


def robots_filter(pages: DataFrame, rules: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """Opt-out compliance filter: drop every page whose URL path falls
    under a disallowed prefix for its host (the robots.txt/opt-out-list
    contract every crawl pipeline enforces before training use).

    `rules`: (host, prefix) disallow rows — list-sized, broadcast. A
    page drops iff ANY rule for its host prefix-matches its path;
    expressed as broadcast-join + startswith + left_anti, so the page
    table is one map-side pass, no shuffle."""
    withh = pages.withColumn("__host", host_col(F.col(url_col))) \
        .withColumn("__path", F.regexp_replace(
            F.regexp_extract(F.col(url_col),
                             r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+(.*)$",
                             1), r"[?#].*$", ""))
    hit = withh.join(
        F.broadcast(rules.select(F.col("host").alias("__host"),
                                 F.col("prefix").alias("__prefix"))),
        "__host").where(F.col("__path").startswith(F.col("__prefix"))) \
        .select(F.col(url_col).alias("__badurl")).distinct()
    return withh.join(F.broadcast(hit),
                      withh[url_col] == F.col("__badurl"), "left_anti") \
        .drop("__host", "__path")


def parse_robots(bodies: DataFrame, host_col_name: str = "host",
                 body_col: str = "body") -> DataFrame:
    """robots.txt parser -> (host, prefix) disallow rules for the `*`
    agent, feeding robots_filter (RFC 9309 Robots Exclusion Protocol):
    a GROUP is a maximal run of consecutive User-agent lines plus the
    rules that follow it; a Disallow applies to us iff its group names
    agent `*`. Empty Disallow values (allow-all) are dropped.

    Relational shape: one posexplode of lines per host, two bounded
    per-host windows (group id = running count of UA-run starts; the
    group's agents summarize to one has-star flag joined back on
    (host, group)); no UDF, no driver parsing. At crawl scale the
    robots corpus is host-sized, tiny next to pages."""
    from pyspark.sql import Window

    lines = bodies.select(
        F.col(host_col_name).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n"))
        .alias("pos", "line"))
    t = lines.select(
        "host", "pos",
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("ln"))
    t = t.select(
        "host", "pos",
        F.when(F.lower("ln").startswith("user-agent:"),
               F.trim(F.expr("substring(ln, 12)"))).alias("ua"),
        F.when(F.lower("ln").startswith("disallow:"),
               F.trim(F.expr("substring(ln, 10)"))).alias("dis"))
    w = Window.partitionBy("host").orderBy("pos")
    prev_is_ua = F.lag(F.col("ua").isNotNull(), 1, False).over(w)
    grp_start = (F.col("ua").isNotNull()
                 & ~F.coalesce(prev_is_ua, F.lit(False)))
    t = t.withColumn("grp", F.sum(grp_start.cast("int")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    stars = (t.where(F.col("ua").isNotNull())
             .groupBy("host", "grp")
             .agg(F.max((F.col("ua") == "*").cast("int"))
                  .alias("has_star")))
    return (t.where(F.col("dis").isNotNull() & (F.col("dis") != ""))
            .join(stars, ["host", "grp"])
            .where(F.col("has_star") == 1)
            .select("host", F.col("dis").alias("prefix"))
            .distinct())


def surt_key_col(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the CDX index
    key Common Crawl / the Wayback Machine sort captures by:
    ``com,example)/path?query`` (host labels reversed and comma-joined,
    leading www stripped, everything lowercased, fragment dropped). Pure
    JVM regexp/array math, map-only."""
    h = host_col(url)
    h = F.regexp_replace(h, r"^www\d*\.", "")
    rev = F.array_join(F.reverse(F.split(h, r"\.")), ",")
    rest = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+([^#]*)", 1)
    return F.concat(rev, F.lit(")"), F.lower(rest))


def surt_host_rollup(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(domain, n_pages, n_hosts, min_surt) — per registered-domain
    rollup in SURT form (domain = first two reversed labels, the CDX
    prefix a crawl operator ranges over). One map-side-combined groupBy;
    at crawl scale the group count is domain-sized, tiny next to pages."""
    k = pages.select(
        surt_key_col(F.col(url_col)).alias("surt"),
        host_col(F.col(url_col)).alias("host"))
    dom = F.array_join(
        F.slice(F.reverse(F.split(F.col("host"), r"\.")), 1, 2), ",")
    return (k.withColumn("domain", dom)
            .groupBy("domain")
            .agg(F.count("*").alias("n_pages"),
                 F.countDistinct("host").alias("n_hosts"),
                 F.min("surt").alias("min_surt")))


def parse_sitemaps(bodies: DataFrame, host_col_name: str = "host",
                   body_col: str = "body") -> DataFrame:
    """sitemaps.org XML parser -> (host, kind, loc, lastmod, priority):
    one row per <url> entry of a urlset (kind='url') or per <sitemap>
    entry of a sitemapindex (kind='sitemap'). Relational shape: one
    regexp_extract_all per entry kind, explode, then per-field extracts
    inside the entry block (absent optional fields -> NULL). No UDF —
    JVM regexp only, so the parse fuses into the scan."""
    def entries(kind):
        blocks = F.expr(
            f"regexp_extract_all({body_col}, '(?s)<{kind}>(.*?)</{kind}>', 1)")
        e = bodies.select(F.col(host_col_name).alias("host"),
                          F.explode(blocks).alias("b"))
        return e.select(
            "host", F.lit(kind).alias("kind"),
            F.nullif(F.regexp_extract("b", r"<loc>([^<]*)</loc>", 1),
                     F.lit("")).alias("loc"),
            F.nullif(F.regexp_extract("b", r"<lastmod>([^<]*)</lastmod>", 1),
                     F.lit("")).alias("lastmod"),
            F.nullif(F.regexp_extract("b", r"<priority>([^<]*)</priority>", 1),
                     F.lit("")).cast("double").alias("priority"))
    return entries("url").unionByName(entries("sitemap"))


def anchor_text_rollup(pages: DataFrame, html_col: str = "html_txt",
                       url_col: str = "url") -> DataFrame:
    """Incoming anchor-text aggregation per link target — the classic
    web-search relevance signal (anchor text describes the TARGET, not
    the source; Brin & Page 1998 §2.2). -> (target, n_links, n_sources,
    top_anchor): link count, distinct linking pages, and the most
    frequent anchor string (ties broken lexicographically).

    Relational shape: aligned regexp_extract_all over group 1 (href) and
    group 2 (text) zipped positionally — same match order, no UDF — then
    two map-side-combined groupBys and one per-target window for the
    argmax. Shuffles are target-keyed; anchor cardinality per target is
    bounded by the vocabulary, not the corpus."""
    pat = '<a href="([^"]*)"[^>]*>([^<]*)</a>'
    hrefs = F.expr(f"regexp_extract_all({html_col}, '{pat}', 1)")
    texts = F.expr(f"regexp_extract_all({html_col}, '{pat}', 2)")
    e = pages.select(F.col(url_col).alias("src"),
                     hrefs.alias("hs"), texts.alias("ts"))
    z = e.select("src", F.posexplode("hs").alias("i", "target"), "ts")
    links = z.select(
        "src", "target",
        F.trim(F.lower(F.element_at("ts", F.col("i") + 1))).alias("anchor"))
    per_anchor = links.groupBy("target", "anchor").agg(
        F.count("*").alias("n"),
        F.countDistinct("src").alias("n_src"))
    from pyspark.sql import Window
    w = Window.partitionBy("target").orderBy(
        F.col("n").desc(), F.col("anchor").asc())
    top = (per_anchor.withColumn("rk", F.row_number().over(w))
           .where(F.col("rk") == 1)
           .select("target", F.col("anchor").alias("top_anchor")))
    tot = links.groupBy("target").agg(
        F.count("*").alias("n_links"),
        F.countDistinct("src").alias("n_sources"))
    return tot.join(top, "target")
