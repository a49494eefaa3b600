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


def test_repetition_signals_analytic(spark):
    # 'a b c a b' (9 chars): 2-grams 'a b'x2,'b c','c a' ->
    # top2 = dup2 = 2*3/9; 3-grams all unique, longest 5 chars -> top3=5/9;
    # 5-gram is the whole text -> top5 = 9/9; no 10-gram.
    df = spark.createDataFrame([(0, "a b c a b", 9)],
                               "doc_id long, text string, n_chars long")
    row = textops.repetition_signals(df).collect()[0]
    assert row.top2_r == round(6 / 9, 6)
    assert row.dup2_r == round(6 / 9, 6)
    assert row.top3_r == round(5 / 9, 6)
    assert row.dup3_r == 0.0
    assert row.top5_r == 1.0
    assert row.top10_r == 0.0 and row.dup10_r == 0.0
    # dup2 = 0.667 > 0 but the keep gate only tests dup5/dup10; top2 fails
    assert row.keep == 0


def test_repetition_signals_keep_and_short_docs(spark):
    rows = [(1, "x", 1),                      # shorter than every n: all 0
            (2, "p q r s t u v w x y z", 21)]  # all n-grams unique
    df = spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long")
    out = {r.doc_id: r for r in
           textops.repetition_signals(df).collect()}
    assert out[1].top2_r == 0.0 and out[1].keep == 1
    assert out[2].dup2_r == 0.0 and out[2].dup10_r == 0.0
    assert out[2].top2_r == round(3 / 21, 6)
    # even unique grams dominate a short doc: top3 = 5/21 > 0.18 -> drop
    # (the real Gopher pipeline applies these after its length gates)
    assert out[2].top3_r == round(5 / 21, 6) and out[2].keep == 0


def test_span_dedup_analytic(spark):
    # docs 1 and 2 share the exact 4-gram "a b c d"; k=4 -> those four
    # positions drop in both docs, everything else survives in order
    rows = [(1, "x a b c d y"), (2, "a b c d z"), (3, "p q r s t")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           textops.span_dedup(df, k=4).collect()}
    assert out[1].text == "x y" and out[1].n_removed == 4
    assert out[2].text == "z" and out[2].n_removed == 4
    assert out[3].text == "p q r s t" and out[3].n_removed == 0


def test_span_dedup_overlapping_spans(spark):
    # a repeated 5-token span contains two overlapping duplicated
    # 4-grams; coverage merges, tokens drop once
    rows = [(1, "a b c d e tail"), (2, "head a b c d e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           textops.span_dedup(df, k=4).collect()}
    assert out[1].text == "tail" and out[1].n_removed == 5
    assert out[2].text == "head" and out[2].n_removed == 5


def test_c4_filters_rules(spark):
    """Each C4 rule individually (Raffel et al. 2020 section 2.2)."""
    from gdal_spark.operators.textops import c4_filters
    mk = "\n".join
    docs = spark.createDataFrame([
        # kept page: 3 good lines
        (1, mk(["one two three four five.", "a b c d e f!",
                'quote one two three four"', "short line."])),
        # javascript line drops, page still has 3 good lines
        (2, mk(["one two three four five.", "javascript a b c d e.",
                "a b c d e f!", "x y z w v."])),
        # lorem ipsum anywhere kills the page
        (3, mk(["one two three four five.", "has lorem ipsum inside.",
                "a b c d e f!", "x y z w v."])),
        # curly brace kills the page
        (4, mk(["one two three four five.", "code { block.",
                "a b c d e f!", "x y z w v."])),
        # policy phrase drops its line -> only 2 survive -> page dropped
        (5, mk(["one two three four five.", "see our privacy policy now.",
                "a b c d e f!"])),
        # no terminal punctuation -> lines dropped
        (6, mk(["one two three four five", "a b c d e f",
                "g h i j k l", "m n o p q."])),
    ], "doc_id long, text string")
    out = {r.doc_id: r for r in c4_filters(docs).collect()}
    assert out[1].keep == 1 and out[1].n_kept == 3
    assert "short line." not in out[1].text          # < 5 words
    assert out[2].keep == 1 and "javascript" not in out[2].text
    assert out[3].keep == 0 and out[3].text == ""
    assert out[4].keep == 0
    assert out[5].keep == 0 and out[5].n_kept == 2   # policy line dropped
    assert out[6].keep == 0 and out[6].n_kept == 1


def test_bloom_decontamination_planted(spark):
    from gdal_spark.operators.textops import bloom_build, bloom_contaminated
    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string")
    cands = spark.createDataFrame(
        [(1, "xx alpha beta gamma delta epsilon yy"),   # contains a corpus 5-gram
         (3, "one two three four five six seven")],     # fresh
        "doc_id long, text string")
    bloom = bloom_build(corpus)
    out = {r.doc_id: r for r in bloom_contaminated(cands, bloom).collect()}
    assert out[1].contaminated == 1 and out[1].n_hit_grams >= 1
    assert out[3].contaminated == 0
    # the membership probe must be a broadcast join (no shuffle of cands)
    plan = bloom_contaminated(cands, bloom)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_fix_mojibake_cases(spark):
    from gdal_spark.operators.textops import _fix_mojibake_str, fix_mojibake
    # classic single mojibake (utf-8 read as latin-1 / cp1252)
    assert _fix_mojibake_str("cafÃ©") == "café"
    assert _fix_mojibake_str("â€™tis") == "’tis"          # cp1252 range
    # double mojibake needs two rounds
    double = "café".encode("utf-8").decode("latin-1") \
        .encode("utf-8").decode("latin-1")
    assert _fix_mojibake_str(double) == "café"
    # fixed points: ascii and genuine accents stay untouched
    assert _fix_mojibake_str("plain ascii") == "plain ascii"
    assert _fix_mojibake_str("déjà vu") == "déjà vu"
    docs = spark.createDataFrame(
        [(1, "cafÃ©"), (2, "ok"), (3, None)], "doc_id long, text string")
    out = {r.doc_id: r for r in fix_mojibake(docs).collect()}
    assert out[1].text == "café" and out[1].changed == 1
    assert out[2].text == "ok" and out[2].changed == 0
    assert out[3].text is None


def test_bigram_lm_hand_computed(spark):
    """Pin the add-k smoothing math on a 2-doc corpus against a
    hand-rolled python model."""
    import math

    from gdal_spark.operators.textops import bigram_lm_scores
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b a b a b")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_lm_scores(docs, 0.5).collect()}
    # corpus counts
    uni = {"a": 5, "b": 5, "c": 1}
    bi = {("a", "b"): 5, ("b", "a"): 3, ("b", "c"): 1}
    V = 3

    def xent(pairs):
        lps = [math.log((bi[p] + 0.5) / (uni[p[0]] + 0.5 * V))
               for p in pairs]
        return -sum(lps) / len(lps)

    d1 = [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c")]
    d2 = [("a", "b"), ("b", "a")] * 2 + [("a", "b")]
    assert out[1].n_bigrams == 4 and out[2].n_bigrams == 5
    assert out[1].xent_r == round(xent(d1), 6)
    assert out[2].xent_r == round(xent(d2), 6)
    # the repetitive doc is MORE predictable (lower perplexity)
    assert out[2].ppl_r < out[1].ppl_r
