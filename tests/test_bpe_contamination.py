"""Exact n-gram contamination + BPE merge statistics (operators/textops.py).

Semantics pinned against hand-computed micro-corpora; corpus-scale value
parity is covered by the ngram_contamination / bpe_pair_counts /
bpe_merge_round DuckDB oracles in queries.py.
"""

from gdal_spark.operators import textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_contamination_exact(spark):
    train = _docs(spark, [(0, "a b c d e f"), (2, "x y z w")])
    test = _docs(spark, [
        (10, "a b c d e f"),        # fully contained: 3 trigrams, 3 hits
        (11, "a b c q r s"),        # 1 of 4 trigrams hits
        (12, "p q"),                # too short: no grams -> absent
    ])
    out = {r.doc_id: r for r in
           textops.ngram_contamination(train, test, k=3).collect()}
    assert set(out) == {10, 11}
    assert (out[10].n_grams, out[10].n_hit, out[10].frac_r) == (4, 4, 1.0)
    assert (out[11].n_grams, out[11].n_hit, out[11].frac_r) == (4, 1, 0.25)


def test_ngram_contamination_distinct_grams(spark):
    # repeated gram in the eval doc counts once (distinct shingles)
    train = _docs(spark, [(0, "a b a b")])
    test = _docs(spark, [(1, "a b a b a b")])
    r = textops.ngram_contamination(train, test, k=2).collect()[0]
    # distinct 2-grams of eval: {"a b", "b a"} -> both in train
    assert (r.n_grams, r.n_hit, r.frac_r) == (2, 2, 1.0)


def test_bpe_pair_counts(spark):
    # "abab" x3, "ab" x2  ->  ab: 2*3 + 1*2 = 8, ba: 1*3 = 3
    docs = _docs(spark, [(0, "abab abab ab"), (1, "abab ab")])
    rows = textops.bpe_pair_counts(docs, top=10).collect()
    assert [(r.pair, r.cnt) for r in rows] == [("ab", 8), ("ba", 3)]


def test_bpe_merge_round_left_to_right(spark):
    # best pair is "aa" (count 2 from "aaa": non-overlap L-to-R gives
    # positions 1-2 and 2-3 both counted at the PAIR-count stage, but the
    # MERGE is left-to-right non-overlapping: "aaa" -> "aa"+"a").
    docs = _docs(spark, [(0, "aaa ab")])
    rows = {r.pair: r.cnt for r in
            textops.bpe_top_merge_recount(docs, top=10).collect()}
    # "aaa" -> symbols [aa, a] -> pair "aa+a"; "ab" -> [a, b] unless ab won
    assert rows == {"aa+a": 1, "a+b": 1}


def test_bpe_merge_round_tie_lexicographic(spark):
    # "ab" and "ba" tie at 1 each ("ab" + "ba" words); lexicographic
    # tiebreak picks "ab".
    docs = _docs(spark, [(0, "ab ba")])
    rows = {r.pair: r.cnt for r in
            textops.bpe_top_merge_recount(docs, top=10).collect()}
    assert rows == {"b+a": 1}


def test_pack_sequences_placement(spark):
    # 3 docs: 3+1, 2+1, 4+1 tokens (incl. EOS) -> offsets 0, 4, 7; ctx=4
    docs = _docs(spark, [(0, "a b c"), (1, "d e"), (2, "f g h i")])
    rows = {r.doc_id: r for r in
            textops.pack_sequences(docs, ctx=4, block=2).collect()}
    assert (rows[0].tok_start, rows[0].seq_first, rows[0].seq_last) \
        == (0, 0, 0)
    assert (rows[1].tok_start, rows[1].seq_first, rows[1].seq_last) \
        == (4, 1, 1)
    assert (rows[2].tok_start, rows[2].seq_first, rows[2].seq_last) \
        == (7, 1, 2)     # spans the seq-1/seq-2 boundary
    assert rows[2].n_tokens == 4


def test_pack_sequence_stats_coverage(spark):
    docs = _docs(spark, [(0, "a b c"), (1, "d e"), (2, "f g h i")])
    st = {r.seq_id: r for r in
          textops.pack_sequence_stats(docs, ctx=4, block=2).collect()}
    # seq 0: doc0 alone covers tokens 0..4 -> clipped to [0,4)
    assert (st[0].n_docs, st[0].tok_lo, st[0].tok_hi) == (1, 0, 4)
    # seq 1: doc1 [4,7) + doc2 head [7,8)
    assert (st[1].n_docs, st[1].tok_lo, st[1].tok_hi) == (2, 4, 8)
    # seq 2: doc2 tail [8,12)
    assert (st[2].n_docs, st[2].tok_lo, st[2].tok_hi) == (1, 8, 12)


def test_tfidf_topk_ranks_rare_terms(spark):
    docs = _docs(spark, [(0, "x x common"), (1, "y common"),
                         (2, "z common")])
    out = textops.tfidf_topk(docs, k=1).collect()
    top = {r.doc_id: r.term for r in out}
    # 'common' appears in all docs (low idf); the doc-unique term wins
    assert top == {0: "x", 1: "y", 2: "z"}
    r0 = [r for r in out if r.doc_id == 0][0]
    assert (r0.tf, r0.df_cnt) == (2, 1)


def test_bpe_train_multichar_merges(spark):
    # hand-verified: round 1 (a,a):7 wins; round 2 (a,n):5; round 3
    # (b,an):3 — merged symbols participate in later rounds, and the
    # greedy left-to-right rule leaves the odd 'a' of "aaab" unmerged
    docs = _docs(spark, [(0, "aaab aaab banana"), (1, "aaaa banana band")])
    v, merges = textops.bpe_train(docs, n_merges=3)
    assert merges == [("a", "a"), ("a", "n"), ("b", "an")]
    syms = {r.w: list(r.s) for r in v.collect()}
    assert syms == {"aaab": ["aa", "a", "b"], "aaaa": ["aa", "aa"],
                    "banana": ["ban", "an", "a"], "band": ["ban", "d"]}
    out = {r.doc_id: (r.n_ws, r.n_bpe) for r in
           textops.bpe_token_counts(docs, 3).collect()}
    assert out == {0: (3, 9), 1: (3, 7)}


def test_unigram_viterbi_dp_matches_bruteforce(spark):
    """DP result == brute-force max over all segmentations, including
    the lexicographic tie-break."""
    import hashlib
    from itertools import product

    from gdal_spark.operators import textops

    docs = spark.createDataFrame(
        [(0, "banana apple zzz a segmentation"),
         (1, "banana test abcd")],
        "doc_id long, text string")
    out = {r.word: (r.best_score, r.pieces)
           for r in textops.unigram_viterbi(docs).collect()}

    def score(piece):
        return 10 * len(piece) ** 2 + int(hashlib.md5(
            piece.encode()).hexdigest()[:2], 16) % 7

    def all_segs(w):
        if not w:
            yield []
            return
        for k in range(1, min(4, len(w)) + 1):
            for rest in all_segs(w[k:]):
                yield [w[:k]] + rest

    for w, (got_s, got_p) in out.items():
        cand = [(sum(score(p) for p in segs), "|".join(segs))
                for segs in all_segs(w)]
        cand.sort(key=lambda t: (-t[0], t[1]))
        assert (got_s, got_p) == cand[0], w
    assert out["banana"][0] >= 0 and "|" not in out["a"][1]


def test_cdc_chunks_insertion_robust(spark):
    """The CDC property: a prefix insertion shifts chunk starts but
    preserves most chunk hashes; fixed-size blocking would lose all."""
    from gdal_spark.operators import textops
    base = ("the quick brown fox jumps over the lazy dog and then "
            "some more text about engines. ") * 6
    docs = spark.createDataFrame(
        [(0, base), (1, "XYZ INSERTED " + base)],
        "doc_id long, text string")
    c = textops.cdc_chunks(docs).collect()
    h0 = {r.chunk_hash for r in c if r.doc_id == 0}
    h1 = {r.chunk_hash for r in c if r.doc_id == 1}
    assert len(h0 & h1) >= len(h0) // 2
    # chunks tile the text exactly
    for did, txt in ((0, base), (1, "XYZ INSERTED " + base)):
        rows = sorted((r for r in c if r.doc_id == did),
                      key=lambda r: r.start)
        assert rows[0].start == 0
        assert sum(r.length for r in rows) == len(txt)
        for a, b in zip(rows, rows[1:]):
            assert b.start == a.start + a.length


def test_cdc_dedup_stats_counts(spark):
    from gdal_spark.operators import textops
    docs = spark.createDataFrame(
        [(0, "abcdef " * 30), (1, "abcdef " * 30)],
        "doc_id long, text string")
    out = textops.cdc_dedup_stats(docs).collect()
    assert out                      # identical docs share every chunk
    assert all(r.n_copies >= 2 for r in out)
    assert all(r.saved_bytes == (r.n_copies - 1) * r.length for r in out)


def test_platt_scaling_learns_separator(spark):
    """Newton converges and the fitted sigmoid separates a synthetic
    perfectly-correlated feature (positive a for positive correlation;
    loss well below the ln(2) of an uninformed fit)."""
    import numpy as np

    from gdal_spark.operators import textops
    rows = []
    rng = np.random.RandomState(2)
    for i in range(200):
        y = i % 2
        # 'e' frequency high for y=1 docs; 'spark' is the label token
        body = ("beekeeper " * 12 if y else "of mud sun " * 10)
        rows.append((i, body + ("spark" if y else "plain")))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = textops.platt_scaling(docs, iters=6).collect()[0]
    assert r.n == 200
    assert r.a_r > 0                  # higher e-freq -> higher p(spark)
    assert r.loss_r < 0.5             # better than the 0.693 coin flip


def test_length_percentiles_nearest_rank(spark):
    import numpy as np

    from gdal_spark.operators import textops
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i + 1))) for i in range(100)],
        "doc_id long, text string")
    r = textops.length_percentiles(docs).collect()[0]
    lens = np.arange(1, 101)
    assert r.p50 == int(np.sort(lens)[int(np.ceil(0.5 * 100)) - 1])
    assert r.p90 == 90 and r.p99 == 99
    assert r.n == 100


def test_readability_known_sentence(spark):
    from gdal_spark.operators import textops
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat.")], "doc_id long, text string")
    r = textops.readability(docs).collect()[0]
    assert r.n_words == 6 and r.n_sents == 1 and r.n_syll == 6
    # FK grade: 0.39*6 + 11.8*1 - 15.59 = -1.45
    assert abs(r.fk_grade_r - (-1.45)) < 1e-9
