"""Web link-graph operators (PageRank power iteration, degree stats) and
the Kneser-Ney bigram LM — each checked against an independent in-process
numpy/pure-Python oracle plus the algorithms' defining invariants."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _numpy_pagerank(n, iters=8, alpha=0.85):
    """Dense replay of graphops.pagerank on the same deterministic graph."""
    from gdal_spark.operators.graphops import (LINK_FANOUT, LINK_MULT,
                                               LINK_STEP, SINK_MOD)
    adj = [[] for _ in range(n)]
    for src in range(n):
        if src % SINK_MOD == 0:
            continue
        for j in LINK_FANOUT:
            dst = (src * LINK_MULT + j * LINK_STEP) % n
            if dst != src:
                adj[src].append(dst)
    deg = np.array([len(a) for a in adj], dtype=float)
    r = np.full(n, 1.0 / n)
    tele = (1.0 - alpha) / n
    for _ in range(iters):
        dm = r[deg == 0].sum()
        c = np.zeros(n)
        for src, targets in enumerate(adj):
            if targets:
                share = r[src] / deg[src]
                for dst in targets:
                    c[dst] += share
        r = tele + alpha * (c + dm / n)
    return r


def test_pagerank_matches_numpy_oracle(spark):
    from gdal_spark.operators.graphops import pagerank
    docs = _docs(spark)
    n = docs.count()
    got = {row.doc_id: row.rank_r for row in pagerank(docs).collect()}
    want = _numpy_pagerank(n)
    assert len(got) == n
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=1e-8)


def test_pagerank_mass_and_floor_invariants(spark):
    from gdal_spark.operators.graphops import pagerank
    docs = _docs(spark)
    n = docs.count()
    rows = pagerank(docs).collect()
    total = sum(r.rank_r for r in rows)
    # probability mass is conserved every iteration
    assert total == pytest.approx(1.0, abs=1e-6)
    # every page keeps at least the teleport floor
    floor = (1.0 - 0.85) / n
    assert min(r.rank_r for r in rows) >= floor - 1e-9


def test_degree_stats_sink_and_fanout(spark):
    from gdal_spark.operators.graphops import degree_stats, SINK_MOD
    rows = degree_stats(_docs(spark)).collect()
    for r in rows:
        if r.doc_id % SINK_MOD == 0:
            assert r.is_sink and r.out_deg == 0
        else:
            assert not r.is_sink and 1 <= r.out_deg <= 3
    assert sum(r.out_deg for r in rows) == sum(r.in_deg for r in rows)


def _py_kneser_ney(texts, d=0.75):
    """Pure-Python KN bigram replay: {doc_id: (n_bigrams, xent)}."""
    from collections import Counter, defaultdict
    bi = Counter()
    docs_pairs = {}
    for doc_id, text in texts:
        ws = text.split(" ")
        pairs = list(zip(ws[:-1], ws[1:]))
        docs_pairs[doc_id] = pairs
        bi.update(pairs)
    c_a = defaultdict(float)
    fwd = defaultdict(int)
    rev = defaultdict(int)
    for (a, b), c in bi.items():
        c_a[a] += c
        fwd[a] += 1
        rev[b] += 1
    total = len(bi)
    out = {}
    for doc_id, pairs in docs_pairs.items():
        if not pairs:
            continue
        lps = [np.log(max(bi[(a, b)] - d, 0.0) / c_a[a]
                      + d * fwd[a] / c_a[a] * (rev[b] / total))
               for a, b in pairs]
        out[doc_id] = (len(lps), -float(np.mean(lps)))
    return out


def test_kneser_ney_matches_python_oracle(spark):
    from gdal_spark.operators.textops import kneser_ney_scores
    docs = _docs(spark).limit(200)
    texts = [(r.doc_id, r.text) for r in docs.collect()]
    want = _py_kneser_ney(texts)
    got = {r.doc_id: (r.n_bigrams, r.kn_xent_r)
           for r in kneser_ney_scores(docs).collect()}
    assert set(got) == set(want)
    for k, (nb, xent) in want.items():
        assert got[k][0] == nb
        assert got[k][1] == pytest.approx(xent, abs=1e-5)


def test_kneser_ney_distribution_normalizes(spark):
    """The defining KN property: for any observed context a, the model
    distribution over the WHOLE vocabulary sums to exactly 1."""
    from collections import Counter, defaultdict
    texts = [(r.doc_id, r.text)
             for r in _docs(spark).limit(100).collect()]
    d = 0.75
    bi = Counter()
    for _, text in texts:
        ws = text.split(" ")
        bi.update(zip(ws[:-1], ws[1:]))
    c_a = defaultdict(float)
    fwd = defaultdict(int)
    rev = defaultdict(int)
    for (a, b), c in bi.items():
        c_a[a] += c
        fwd[a] += 1
        rev[b] += 1
    total = len(bi)
    vocab_b = list(rev)
    for a in list(c_a)[:5]:
        s = sum(max(bi.get((a, b), 0) - d, 0.0) / c_a[a]
                + d * fwd[a] / c_a[a] * (rev[b] / total)
                for b in vocab_b)
        assert s == pytest.approx(1.0, abs=1e-9)


def _numpy_hits(n, iters=8):
    from gdal_spark.operators.graphops import (LINK_FANOUT, LINK_MULT,
                                               LINK_STEP, SINK_MOD)
    E = []
    for src in range(n):
        if src % SINK_MOD == 0:
            continue
        for j in LINK_FANOUT:
            dst = (src * LINK_MULT + j * LINK_STEP) % n
            if dst != src:
                E.append((src, dst))
    h = np.ones(n)
    for _ in range(iters):
        a = np.zeros(n)
        for s, d in E:
            a[d] += h[s]
        a /= np.sqrt((a * a).sum())
        h = np.zeros(n)
        for s, d in E:
            h[s] += a[d]
        h /= np.sqrt((h * h).sum())
    return a, h


def test_hits_matches_numpy_oracle_and_normalizes(spark):
    from gdal_spark.operators.graphops import hits
    docs = _docs(spark)
    n = docs.count()
    rows = hits(docs, iters=8).collect()
    a_want, h_want = _numpy_hits(n)
    assert len(rows) == n
    for r in rows:
        assert r.auth_r == pytest.approx(a_want[r.doc_id], abs=1e-7)
        assert r.hub_r == pytest.approx(h_want[r.doc_id], abs=1e-7)
    # both vectors are unit L2 after the final half-steps
    assert sum(r.auth_r ** 2 for r in rows) == pytest.approx(1.0, abs=1e-6)
    assert sum(r.hub_r ** 2 for r in rows) == pytest.approx(1.0, abs=1e-6)
    # sinks have zero hub score; every page a sink links FROM it (none)
    for r in rows:
        if r.doc_id % 17 == 0:
            assert r.hub_r == 0.0


def test_triangle_stats_k4_and_path(spark):
    from gdal_spark.operators.graphops import triangle_stats
    # K4: every vertex has deg 3, 3 triangles, lcc 1; edges given in
    # mixed orientation with duplicates to exercise the dedupe
    k4 = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 2), (0, 3), (1, 2), (2, 1), (1, 3), (2, 3)],
        "src long, dst long")
    rows = {r.n: r for r in triangle_stats(k4).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for n in rows:
        assert rows[n].deg == 3 and rows[n].tri == 3
        assert rows[n].lcc_r == 1.0
    # path 0-1-2-3: no triangles; middle nodes deg 2 lcc 0
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)],
                                 "src long, dst long")
    rows = {r.n: r for r in triangle_stats(path).collect()}
    assert all(r.tri == 0 for r in rows.values())
    assert rows[1].deg == 2 and rows[1].lcc_r == 0.0
    assert rows[0].deg == 1 and rows[0].lcc_r == 0.0
    # triangle with a pendant: node 0 in {0,1,2} triangle + edge 0-9
    g = spark.createDataFrame([(0, 1), (1, 2), (2, 0), (0, 9)],
                              "src long, dst long")
    rows = {r.n: r for r in triangle_stats(g).collect()}
    assert rows[0].tri == 1 and rows[0].deg == 3
    assert rows[0].lcc_r == round(2 * 1 / (3 * 2), 8)
    assert rows[9].tri == 0


def test_bfs_levels_invariants(spark):
    from gdal_spark.operators.graphops import bfs_levels, link_edges
    docs = spark.range(300).withColumnRenamed("id", "doc_id")
    out = bfs_levels(docs, rounds=4, seed_mod=50).collect()
    hops = {r.doc_id: r.hop for r in out}
    # seeds are hop 0, exactly the doc_id % 50 == 0 set
    assert {d for d, h in hops.items() if h == 0} \
        == {d for d in range(300) if d % 50 == 0}
    # every hop-k>0 node has an in-edge from some hop k-1 node, and
    # none from a strictly smaller hop (shortest distance property)
    edges = [(r.src, r.dst) for r in
             link_edges(docs, 300).collect()]
    preds = {}
    for s, d in edges:
        preds.setdefault(d, set()).add(s)
    for d, h in hops.items():
        if h == 0:
            continue
        in_hops = {hops[p] for p in preds.get(d, set()) if p in hops}
        assert min(in_hops) == h - 1


def test_hyperball_registers_match_numpy(spark):
    """Register init (hash -> (j, rho)) has an exact numpy twin."""
    import hashlib

    import numpy as np

    from gdal_spark.operators.graphops import hyperball_registers
    docs = spark.range(64).withColumnRenamed("id", "doc_id")
    rows = {r.v: (r.j, r.r) for r in hyperball_registers(docs).collect()}
    for v in range(64):
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        y = h >> 4
        rho = 57 if y == 0 else int(np.log2(y & -y)) + 1
        assert rows[v] == (h & 15, rho)


def test_hyperball_harmonic_invariants(spark):
    from gdal_spark.operators.graphops import hyperball_harmonic
    docs = spark.range(200).withColumnRenamed("id", "doc_id")
    out = {r.doc_id: r for r in hyperball_harmonic(docs, rounds=3).collect()}
    assert len(out) == 200
    for v, r in out.items():
        if v % 17 == 0:          # sink: ball never grows past itself
            assert r.harm_r == 0.0
            assert r.b1_r == r.b3_r
        else:                    # registers only grow -> raw estimate too
            assert r.b3_r >= r.b1_r - 1e-6
            assert r.harm_r >= 0.0


def test_hyperball_estimates_track_exact_balls(spark):
    """HLL(m=16) estimates the true out-ball within its design error on
    average (|rel err| mean < 0.3); exactness is pinned by the oracle."""
    from gdal_spark.operators.graphops import hyperball_harmonic, link_edges
    docs = spark.range(200).withColumnRenamed("id", "doc_id")
    est = {r.doc_id: r.b3_r
           for r in hyperball_harmonic(docs, rounds=3).collect()}
    adj = {}
    for r in link_edges(docs, 200).collect():
        adj.setdefault(r.src, []).append(r.dst)
    errs = []
    for v in range(200):
        ball = {v}
        frontier = {v}
        for _ in range(3):
            frontier = {w for u in frontier for w in adj.get(u, [])} - ball
            ball |= frontier
        errs.append(abs(est[v] - len(ball)) / len(ball))
    assert sum(errs) / len(errs) < 0.3


def test_link_components_vs_bruteforce(spark):
    from gdal_spark.operators.graphops import link_components, link_edges
    docs = spark.range(120).withColumnRenamed("id", "doc_id")
    got = {r.component: r.n_pages
           for r in link_components(docs).collect()}
    # brute-force union-find
    parent = list(range(120))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in link_edges(docs, 120).collect():
        a, b = find(r.src), find(r.dst)
        if a != b:
            parent[max(a, b)] = min(a, b)
    from collections import Counter
    want = Counter(find(i) for i in range(120))
    assert got == dict(want)
