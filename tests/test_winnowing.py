"""Robust winnowing (Schleimer et al. 2003): the paper's two guarantees —
every window selects (max gap w), and any shared substring of at least
w+k-1 tokens yields a shared fingerprint — plus a pure-Python replay."""

from __future__ import annotations

import hashlib

import pytest

K, W = 3, 4


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % 1000000007


def _py_winnow(text: str, k: int = K, w: int = W):
    ws = text.split(" ")
    m = len(ws) - (k - 1)
    if m < w:
        return set()
    hs = [_h(" ".join(ws[i:i + k])) for i in range(m)]
    sel = set()
    for q in range(m - w + 1):
        window = hs[q:q + w]
        mh = min(window)
        pos = max(i for i, v in enumerate(window) if v == mh) + q
        sel.add((pos + 1, mh))        # 1-based positions
    return sel


def _spark_winnow(spark, rows):
    from gdal_spark.operators.textops import winnowing_fingerprints
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return winnowing_fingerprints(df, k=K, w=W)


def test_matches_python_replay_and_gap_bound(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "a b c d e f g h i j k l m n o p"),
        (2, "x x x x x x x x x x"),              # all-tie degenerate
        (3, "one two three four five six"),       # exactly one window
        (4, "too short"),                         # below w+k-1: excluded
    ]
    got = {}
    for r in _spark_winnow(spark, texts).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp_h))
    for doc_id, text in texts:
        assert got.get(doc_id, set()) == _py_winnow(text), doc_id
    # max-gap guarantee: consecutive selected positions differ by <= w
    for doc_id, sel in got.items():
        ps = sorted(p for p, _ in sel)
        assert all(b - a <= W for a, b in zip(ps, ps[1:])), doc_id


def test_shared_substring_shares_a_fingerprint(spark):
    shared = "alpha beta gamma delta epsilon zeta"   # w+k-1 = 6 tokens
    rows = [(0, "intro words here " + shared + " tail one"),
            (1, shared + " totally different ending words")]
    got = {0: set(), 1: set()}
    for r in _spark_winnow(spark, rows).collect():
        got[r.doc_id].add(r.fp_h)
    assert got[0] & got[1], "shared 6-token substring must share a print"


def test_short_doc_excluded(spark):
    rows = [(0, "five words is not enough")]       # 5 < w+k-1
    assert _spark_winnow(spark, rows).count() == 0


def test_cms_one_sided_guarantee_and_python_replay(spark):
    """CMS estimates never undercount, and the whole sketch matches a
    pure-Python replay of the same md5 bucket arithmetic."""
    import hashlib
    from collections import Counter
    from gdal_spark.operators.textops import cms_heavy_hitters
    rows = [(i, f"tok{i % 7} tok{i % 3} common common tok{i % 11}")
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.w: (r.n_exact, r.cms_est)
           for r in cms_heavy_hitters(df, k=10).collect()}

    toks = [w for _, t in rows for w in t.split(" ")]
    exact = Counter(toks)

    def bucket(j, w):
        return int(hashlib.md5(f"{j}|{w}".encode()).hexdigest()[:8],
                   16) % 1024

    cells = Counter()
    for w, c in exact.items():
        for j in range(4):
            cells[(j, bucket(j, w))] += c
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert set(got) == {w for w, _ in top}
    for w, c in top:
        est = min(cells[(j, bucket(j, w))] for j in range(4))
        assert got[w] == (c, est)
        assert got[w][1] >= got[w][0]          # one-sided guarantee


def test_hll_branches_and_accuracy(spark):
    """Linear-counting branch on a tiny vocabulary; raw-HLL branch on a
    20k-word vocabulary with the expected ~1.04/sqrt(256) error."""
    import math
    from pyspark.sql import functions as F
    from gdal_spark.operators.textops import hll_distinct
    tiny = spark.createDataFrame([(0, "a b c a b"), (1, "c d e")],
                                 "doc_id long, text string")
    r = hll_distinct(tiny).collect()[0]
    assert r.n_exact == 5
    # small range: estimate comes from linear counting m*ln(m/V)
    assert r.hll_est_r == pytest.approx(
        256.0 * math.log(256.0 / r.v_zero), abs=1e-3)
    big = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            (F.col("id") * 10 + i).cast("string") for i in range(10)])
        .alias("text"))
    r2 = hll_distinct(big).collect()[0]
    assert r2.n_exact == 20000
    assert r2.v_zero == 0                     # every register hit
    assert abs(r2.rel_err_r) < 0.25           # ~4 sigma at m=256


def test_jaccard_prefix_join_exact_and_boundary(spark):
    """Prefix filtering is lossless: results equal the brute-force pair
    set, including a pair at EXACTLY tau (integer threshold math)."""
    from itertools import combinations
    from gdal_spark.operators.textops import jaccard_prefix_join
    rows = [(0, "a b c"),            # J(0,1) = 3/5 = tau exactly
            (1, "a b c d e"),
            (2, "a b c"),            # J(0,2) = 1
            (3, "x y z w"),
            (4, "x y z"),            # J(3,4) = 3/4 >= 0.6
            (5, "p q"),
            (6, "a q")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.a, r.b): (r.inter, r.union_)
           for r in jaccard_prefix_join(df, num=3, den=5).collect()}
    sets = {i: set(t.split(" ")) for i, t in rows}
    want = {}
    for i, j in combinations(sorted(sets), 2):
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        if inter * 5 >= 3 * union:
            want[(i, j)] = (inter, union)
    assert got == want
    assert (0, 1) in got            # the exact-boundary pair survived
