"""BM25 ranking, DSIR importance weights, SemDeDup.

Reference semantics: Okapi BM25 (Robertson & Zaragoza 2009), DSIR
(Xie et al. 2023, arXiv:2302.03169), SemDeDup (Abbas et al. 2023,
arXiv:2303.09540) — the retrieval / data-selection / semantic-dedup
primitives of a web-scale curation pipeline over the documents and
embeddings tables.
"""
import math

import pytest

from gdal_spark.operators import simsearch, textops
from pyspark.sql import functions as F


def _docs(spark, rows, lang="en"):
    data = [(i, t, lang if isinstance(lang, str) else lang[j], "web",
             len(t))
            for j, (i, t) in enumerate(rows)]
    return spark.createDataFrame(
        data, "doc_id long, text string, lang string, source string,"
              " n_chars long")


def test_bm25_scores_hand_checked(spark):
    # corpus of 3 docs; query = ('spark', 'hash', 'merge')
    docs = _docs(spark, [(0, "spark spark hash x"),   # dl=4
                         (1, "spark y y y"),          # dl=4
                         (2, "z z z z")])             # dl=4
    out = {r.doc_id: r for r in textops.bm25_topk(docs, k=3).collect()}
    n, avgdl, k1, b = 3, 4.0, 1.2, 0.75
    def idf(df):
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def part(tf, df, dl):
        return idf(df) * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * dl / avgdl))
    s0 = part(2, 2, 4) + part(1, 1, 4)   # spark tf=2 df=2; hash tf=1 df=1
    s1 = part(1, 2, 4)
    assert out[0].rank == 1 and out[1].rank == 2
    assert 2 not in out                   # no query term -> no score row
    assert out[0].score_r == pytest.approx(round(s0, 6), abs=1e-6)
    assert out[1].score_r == pytest.approx(round(s1, 6), abs=1e-6)


def test_bm25_single_corpus_scan(spark):
    """dl / tf / df all derive from one persisted doc-term table, and
    the final top-k is a distributed TakeOrderedAndProject, never a
    single-partition window over the corpus."""
    from tests.conftest import SF_DIR
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = textops.bm25_topk(docs, k=20)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert plan.count("documents.parquet") <= 1
    assert "TakeOrderedAndProject" in plan


def test_dsir_weights_prefer_target_language(spark):
    # 'de'-slice vocabulary {der, und}; 'en' docs use {the, of}
    rows = [(0, "der und der"), (1, "the of the"), (2, "der the")]
    docs = _docs(spark, rows, lang=["de", "en", "en"])
    out = {r.doc_id: r.logw_r
           for r in textops.dsir_weights(docs, "de").collect()}
    # doc0 is pure target vocabulary -> highest importance weight;
    # doc1 is pure raw-only vocabulary -> lowest
    assert out[0] > out[2] > out[1]
    # hand-check doc1: terms the(x2), of(x1), both absent from the
    # target slice (ct=0); raw counts: the=3, of=1. Target slice is
    # doc0 only -> T=3 tokens; V=|{der,und,the,of}|=4; R=8 tokens.
    T, V, R = 3.0, 4, 8.0
    def lr(ct, cr):
        return (math.log((ct + 0.5) / (T + 0.5 * V))
                - math.log((cr + 0.5) / (R + 0.5 * V)))
    w1 = 2 * lr(0, 3) + 1 * lr(0, 1)
    assert out[1] == pytest.approx(round(w1, 6), abs=1e-6)


def _emb(spark, vecs):
    data = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int")


def test_semdedup_clusters_and_flags(spark):
    # seeds = vec_id 0 and 1 (n_clusters=2): two orthogonal directions.
    # vec 2 ~ seed0 and nearly identical to vec 0 -> duplicate;
    # vec 3 ~ seed1, far from everything in its cluster -> kept.
    vecs = [[1, 0, 0, 0], [0, 1, 0, 0],
            [0.999, 0.04, 0, 0], [0.1, 0.9, 0.4, 0]]
    out = {r.vec_id: r for r in
           simsearch.semdedup(_emb(spark, vecs), n_clusters=2,
                              threshold=0.95).collect()}
    assert out[2].cluster == 0 and out[3].cluster == 1
    assert [out[i].is_dup for i in range(4)] == [0, 0, 1, 0]


def test_semdedup_dup_rule_is_lowest_id_wins(spark):
    # three mutual near-dups in one cluster: only the lowest id is kept
    vecs = [[1, 0], [0.99, 0.01], [0.98, 0.02]]
    out = {r.vec_id: r.is_dup for r in
           simsearch.semdedup(_emb(spark, vecs), n_clusters=1,
                              threshold=0.9).collect()}
    assert out == {0: 0, 1: 1, 2: 1}


def test_hashed_ngram_classifier_separates_classes(spark):
    # positive docs share vocabulary; negatives share a different one
    rows = [(0, "good fine nice"), (1, "good nice fine"),
            (2, "bad awful poor"), (3, "awful poor bad")]
    docs = _docs(spark, rows, lang=["en", "en", "de", "de"])
    out = {r.doc_id: r for r in
           textops.hashed_ngram_scores(docs, "en").collect()}
    assert [out[i].pred for i in range(4)] == [1, 1, 0, 0]
    assert out[0].score_r > 0 > out[2].score_r


def test_hashed_ngram_weight_table_is_bounded(spark):
    """The hashing trick caps the weight table at 2^bits rows no matter
    the vocabulary — the property that keeps the broadcast legal at
    100 TB."""
    rows = [(i, f"w{i}a w{i}b w{i}c") for i in range(20)]
    docs = _docs(spark, rows, lang=["en", "de"] * 10)
    out = textops.hashed_ngram_scores(docs, "en", bits=4).collect()
    assert len(out) == 20  # every doc scored even with 16 buckets


def test_substring_dedup_merges_overlaps(spark):
    # doc0 and doc1 share the 12-char block 'ABCDEFGHIJKL'; with k=8
    # the duplicated 8-gram starts {1..5} merge into ONE span [1, 12]
    docs = _docs(spark, [(0, "ABCDEFGHIJKLxxxx"), (1, "ABCDEFGHIJKLyyyy")])
    out = {(r.doc_id, r.span_lo, r.span_hi, r.span_len)
           for r in textops.substring_dedup(docs, k=8).collect()}
    assert out == {(0, 1, 12, 12), (1, 1, 12, 12)}


def test_substring_dedup_separate_islands(spark):
    # shared prefix and shared suffix with unique middles -> two spans
    docs = _docs(spark, [(0, "SHAREDPREFIX-aaaa-SHAREDSUFFIX"),
                         (1, "SHAREDPREFIX-bbbb-SHAREDSUFFIX")])
    rows = textops.substring_dedup(docs, k=8).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append((r.span_lo, r.span_hi))
    assert len(per_doc[0]) == 2 and len(per_doc[1]) == 2
    (a_lo, a_hi), (b_lo, b_hi) = sorted(per_doc[0])
    assert (a_lo, a_hi) == (1, 13)       # 'SHAREDPREFIX-'
    assert (b_lo, b_hi) == (18, 30)      # '-SHAREDSUFFIX'


def test_substring_dedup_short_docs_no_rows(spark):
    docs = _docs(spark, [(0, "tiny"), (1, "tiny")])
    assert textops.substring_dedup(docs, k=8).count() == 0


def test_training_shuffle_is_deterministic_partition(spark):
    rows = [(i, f"doc {i}") for i in range(30)]
    docs = _docs(spark, rows)
    a = sorted(map(tuple, textops.training_shuffle(docs, 4).collect()))
    b = sorted(map(tuple, textops.training_shuffle(
        docs.repartition(7), 4).collect()))
    assert a == b                       # placement ignores partitioning
    shards = {s for _, s, _ in a}
    assert shards <= {0, 1, 2, 3}
    # positions are 1..n_s contiguous within each shard
    for s in shards:
        ps = sorted(p for _, sh, p in a if sh == s)
        assert ps == list(range(1, len(ps) + 1))
    c = sorted(map(tuple, textops.training_shuffle(docs, 4,
                                                   seed="s1").collect()))
    assert a != c                       # the seed changes the order


def test_temperature_sample_upsamples_tail(spark):
    # 90/10 head/tail split; tau=2 boosts the tail's keep rate
    rows = [(i, f"doc {i}") for i in range(200)]
    data = [(i, t, "en", "head" if i < 180 else "tail", len(t))
            for i, t in rows]
    docs = spark.createDataFrame(
        data, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    out = textops.temperature_sample(docs, tau=2.0, base_rate=0.5)
    got = out.groupBy("source").count().collect()
    kept = {r.source: r["count"] for r in got}
    # tail keep fraction must exceed head keep fraction
    assert kept.get("tail", 0) / 20 > kept.get("head", 0) / 180


def test_parse_robots_group_semantics(spark):
    from gdal_spark.operators import urlops
    body = "\n".join([
        "User-agent: gptbot",
        "User-agent: *",          # same group as gptbot -> applies
        "Disallow: /private",
        "Disallow:",              # empty = allow-all, dropped
        "",
        "User-agent: otherbot",   # new group, no star
        "Disallow: /only-other",
        "# comment",
        "User-agent: *",
        "Disallow: /tmp  ",
    ])
    df = spark.createDataFrame([("a.com", body),
                                ("b.com", "Disallow: /orphan")],
                               "host string, body string")
    rules = {(r.host, r.prefix)
             for r in urlops.parse_robots(df).collect()}
    # orphan Disallow (no UA group) never applies
    assert rules == {("a.com", "/private"), ("a.com", "/tmp")}


def test_parse_robots_feeds_robots_filter(spark):
    from gdal_spark.operators import urlops
    rob = spark.createDataFrame(
        [("site1.example", "User-agent: *\nDisallow: /p/")],
        "host string, body string")
    pages = spark.createDataFrame(
        [("https://site1.example/p/1",), ("https://site1.example/q/2",),
         ("https://site2.example/p/3",)], "url string")
    kept = {r.url for r in urlops.robots_filter(
        pages, urlops.parse_robots(rob)).collect()}
    assert kept == {"https://site1.example/q/2",
                    "https://site2.example/p/3"}


def test_semdedup_accepts_trained_centroids(spark):
    import numpy as np
    vecs = [[1, 0], [0, 1], [0.99, 0.01], [0.02, 0.98]]
    cent = np.array([[1.0, 0.0], [0.0, 1.0]])
    out = {r.vec_id: r.cluster for r in
           simsearch.semdedup(_emb(spark, vecs), threshold=0.99,
                              centroids=cent).collect()}
    assert out == {0: 0, 1: 1, 2: 0, 3: 1}
