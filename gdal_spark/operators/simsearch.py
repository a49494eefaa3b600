"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline, plus an LSH
(random-hyperplane / SimHash-for-vectors) bucketing as the scale path:
at 100 TB the brute-force cross join is O(Q*N) — LSH buckets turn it into an
equi-join on bucket id, shuffling each side once; brute force remains the
in-bucket refinement.

All arithmetic is built-in column math (zip_with/aggregate fold — JVM-side,
deterministic left-to-right summation so the DuckDB oracle matches).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_HYPERPLANES = 8
EMBED_DIM = 64


def as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — same association as the oracle's
    list_dot_product."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_topk(emb: DataFrame, n_queries: int = 10, k: int = 3) -> DataFrame:
    """Top-k cosine neighbors for the first `n_queries` vectors.

    Queries are broadcast (small side); ranking is a bounded per-key top-k
    (Catalyst plans WindowExec after a hash repartition on q_id — with
    broadcast queries the big side is scanned exactly once).
    """
    e = emb.select("vec_id", as_double("embedding").alias("v"))
    q = (e.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv")))
    pairs = (e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
             .withColumn("cos", cosine(F.col("qv"), F.col("v"))))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(),
                                           F.col("vec_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("q_id", "rank", "vec_id"))


def hyperplanes(n: int = N_HYPERPLANES, dim: int = EMBED_DIM,
                band: int = 0) -> np.ndarray:
    """Deterministic random hyperplanes, rounded so their decimal literals
    round-trip identically in every engine. `band` selects an independent
    rotation (seed offset) for multi-band LSH."""
    rng = np.random.RandomState(7 + band)
    return rng.normal(size=(n, dim)).round(6)


def lsh_bucket_col(vec: Column, planes: np.ndarray) -> Column:
    """Integer LSH bucket: bit i = sign(dot(v, plane_i))."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(dot(vec, lit) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_histogram(emb: DataFrame) -> DataFrame:
    """(bucket, n) — occupancy of the hyperplane-LSH buckets."""
    e = emb.select(as_double("embedding").alias("v"))
    planes = hyperplanes()
    return (e.select(lsh_bucket_col(F.col("v"), planes).alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n")))


def lsh_topk(emb: DataFrame, n_queries: int = 10, k: int = 3) -> DataFrame:
    """ANN via LSH bucket equi-join + in-bucket exact cosine re-rank.

    The scale path: no cross join — candidates are rows sharing the query's
    bucket. Recall < 1 by construction (documented); increase bands or probe
    neighboring buckets (Hamming distance 1) to raise recall.
    """
    planes = hyperplanes()
    e = emb.select("vec_id", as_double("embedding").alias("v"))
    e = e.withColumn("bucket", lsh_bucket_col(F.col("v"), planes))
    q = (e.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
                 F.col("bucket")))
    pairs = (e.join(F.broadcast(q), "bucket")
             .where(F.col("vec_id") != F.col("q_id"))
             .withColumn("cos", cosine(F.col("qv"), F.col("v"))))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(),
                                           F.col("vec_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("q_id", "rank", "vec_id"))


def neardup_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (a_id < b_id, cos >=
    threshold) — the correctness baseline of dedup-by-embedding.

    Brute force (block-nested cross join): quadratic, the oracle-able
    reference semantics. At corpus scale run neardup_lsh (bucket prefilter,
    identical verify arithmetic) and treat this as the audit path on
    samples.
    """
    a = emb.select(F.col("vec_id").alias("a_id"),
                   as_double("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b_id"),
                   as_double("embedding").alias("vb"))
    return (a.join(b, F.col("a_id") < F.col("b_id"))
            .withColumn("cos", cosine(F.col("va"), F.col("vb")))
            .where(F.col("cos") >= threshold)
            .select("a_id", "b_id", "cos"))


def neardup_lsh(emb: DataFrame, threshold: float, salt: int = 1,
                hot_threshold: int = 100000, band: int = 0) -> DataFrame:
    """LSH-prefiltered near-dup pairs: candidates share a hyperplane-sign
    bucket, then the exact cosine verify. Deterministic (seeded planes) but
    recall < 1 by construction — pairs split across buckets are missed; add
    band rotations to raise recall.

    Hot-bucket mitigation (salt > 1): a near-dup-heavy corpus — the common
    case, that's why you're deduping — concentrates mass in few buckets and
    makes the per-bucket self-join quadratic ON ONE REDUCER. Buckets whose
    count exceeds `hot_threshold` (a LAZY aggregate broadcast back in, no
    driver action) salt into `salt` sub-partitions and pair via the
    triangle join: row u covers cells (u, j>=u) on the A side and (i<=u, u)
    on the B side, so every unordered pair meets in exactly one (i, j)
    cell and the bucket's quadratic work spreads over salt*(salt+1)/2
    reducers. Results are IDENTICAL to the unsalted join (pinned by the
    embed_neardup_lsh_salted oracle query)."""
    planes = hyperplanes(band=band)
    e = emb.select("vec_id", as_double("embedding").alias("v")) \
        .withColumn("bucket", lsh_bucket_col(F.col("v"), planes))
    if salt <= 1:
        a = e.select(F.col("vec_id").alias("a_id"), F.col("v").alias("va"),
                     "bucket")
        b = e.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb"),
                     "bucket")
        pairs = a.join(b, "bucket").where(F.col("a_id") < F.col("b_id"))
    else:
        counts = e.groupBy("bucket").agg(F.count("*").alias("_n"))
        e2 = (e.join(F.broadcast(counts), "bucket")
              .withColumn("_s", F.when(F.col("_n") > hot_threshold,
                                       F.lit(salt)).otherwise(F.lit(1)))
              .withColumn("_u", F.pmod(F.crc32(F.col("vec_id")
                                               .cast("string")),
                                       F.col("_s")).cast("int")))
        a = (e2.select(F.col("vec_id").alias("a_id"),
                       F.col("v").alias("va"), "bucket", "_u", "_s")
             .withColumn("_j", F.explode(F.sequence(
                 F.col("_u"), F.col("_s") - 1)))
             .withColumnRenamed("_u", "_i"))
        b = (e2.select(F.col("vec_id").alias("b_id"),
                       F.col("v").alias("vb"), "bucket",
                       F.col("_u").alias("_j"))
             .withColumn("_i", F.explode(F.sequence(F.lit(0), F.col("_j")))))
        pairs = (a.drop("_s").join(b, ["bucket", "_i", "_j"])
                 .where((F.col("_i") < F.col("_j"))
                        | (F.col("a_id") < F.col("b_id")))
                 .select("bucket",
                         F.least("a_id", "b_id").alias("a_id"),
                         F.greatest("a_id", "b_id").alias("b_id"),
                         F.when(F.col("a_id") < F.col("b_id"),
                                F.col("va")).otherwise(F.col("vb"))
                         .alias("va"),
                         F.when(F.col("a_id") < F.col("b_id"),
                                F.col("vb")).otherwise(F.col("va"))
                         .alias("vb")))
    return (pairs
            .withColumn("cos", cosine(F.col("va"), F.col("vb")))
            .where(F.col("cos") >= threshold)
            .select("a_id", "b_id", "cos"))


def neardup_lsh_banded(emb: DataFrame, threshold: float, bands: int = 4,
                       salt: int = 1,
                       hot_threshold: int = 100000) -> DataFrame:
    """Multi-band LSH near-dup: union the candidate pairs of `bands`
    independent hyperplane rotations, dedupe, verify once. Each extra band
    raises recall (a pair split by one rotation's buckets usually shares
    another's); cost is `bands` bucket equi-joins — still no cross join
    anywhere. Deterministic: band b uses seed 7+b."""
    out = None
    for b in range(bands):
        part = neardup_lsh(emb, threshold, salt=salt,
                           hot_threshold=hot_threshold, band=b)
        out = part if out is None else out.unionByName(part)
    return out.dropDuplicates(["a_id", "b_id"])


def _sqdist_to_centroid(vec: Column, centroid: np.ndarray) -> Column:
    """||v - c||^2 as a JVM fold over the array column (no UDF)."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    diff = F.zip_with(vec, lit, lambda a, b: (a - b) * (a - b))
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)


def _assign_col(vec: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid index (ties -> lowest index, argmin semantics)."""
    dists = F.array(*[_sqdist_to_centroid(vec, c) for c in centroids])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def kmeans_centroids(emb: DataFrame, n_clusters: int = 16,
                     iters: int = 3) -> np.ndarray:
    """Distributed Lloyd iterations, deterministic init (the first
    n_clusters vec_ids). Assignment is whole-stage-codegen column math
    against broadcast centroid literals; the update is ONE shuffle of
    (cluster, pos, component) partial sums via posexplode — the driver only
    ever sees the K x dim centroid matrix (kilobytes), never the data.
    Empty clusters keep their previous centroid (the standard convention).
    """
    e = emb.select("vec_id", as_double("embedding").alias("v"))
    cent = np.array(
        [r.v for r in e.where(F.col("vec_id") < n_clusters)
         .orderBy("vec_id").collect()])
    for _ in range(iters):
        a = e.withColumn("c", _assign_col(F.col("v"), cent))
        upd = (a.select("c", F.posexplode("v").alias("pos", "x"))
               .groupBy("c", "pos")
               .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
               .collect())
        nxt = cent.copy()
        for r in upd:
            nxt[r.c, r.pos] = r.s / r.n
        cent = nxt
    return cent


def ivf_topk(emb: DataFrame, n_queries: int = 10, k: int = 3,
             n_clusters: int = 16, nprobe: int = 4,
             centroids: np.ndarray | None = None) -> DataFrame:
    """ANN via IVF (inverted file): vectors partition into nearest-centroid
    lists; a query scans only its `nprobe` closest lists, then exact cosine
    re-ranks. The second scale path next to LSH (lsh_topk): the candidate
    join is an equi-join on the cluster id, so the big side shuffles once
    by cluster and each query touches nprobe/n_clusters of the data.

    nprobe == n_clusters degrades gracefully to EXACT brute force (every
    list probed) — the correctness anchor the oracle pins; recall at
    nprobe < n_clusters is the tested quality knob (test_simsearch)."""
    if centroids is None:
        centroids = kmeans_centroids(emb, n_clusters)
    e = emb.select("vec_id", as_double("embedding").alias("v"))
    inv = e.withColumn("c", _assign_col(F.col("v"), centroids))
    q = (e.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv")))
    dists = F.array(*[_sqdist_to_centroid(F.col("qv"), c)
                      for c in centroids])
    probes = F.slice(F.array_sort(
        F.arrays_zip(dists.alias("d"),
                     F.array(*[F.lit(i) for i in range(len(centroids))])
                     .alias("c"))), 1, nprobe)
    q = q.select("q_id", "qv",
                 F.explode(F.transform(probes, lambda s: s["c"]))
                 .alias("c"))
    pairs = (inv.join(F.broadcast(q), "c")
             .where(F.col("vec_id") != F.col("q_id"))
             .withColumn("cos", cosine(F.col("qv"), F.col("v"))))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(),
                                           F.col("vec_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("q_id", "rank", "vec_id"))


# ---------------------------------------------------------------------------
# Product quantization (Jegou, Douze, Schmid 2011 — public paper)
# ---------------------------------------------------------------------------

def _sub(vec: Column, s: int, dsub: int) -> Column:
    return F.slice(vec, s * dsub + 1, dsub)


def pq_codebooks(emb: DataFrame, m: int = 8, ksub: int = 16,
                 iters: int = 3) -> np.ndarray:
    """(m, ksub, dim/m) per-subspace codebooks, distributed Lloyd with the
    deterministic init kmeans_centroids uses (subvectors of the first ksub
    vec_ids). iters=0 returns the init itself — the SQL-replayable anchor
    the driver oracle pins. All m subspaces train in ONE shuffle per
    iteration (key = (subspace, code, pos))."""
    dim = len(emb.select(as_double("embedding").alias("v"))
              .first()["v"])
    dsub = dim // m
    e = emb.select("vec_id", as_double("embedding").alias("v"))
    init = np.array([r.v for r in e.where(F.col("vec_id") < ksub)
                     .orderBy("vec_id").collect()])
    cbs = np.stack([init[:, s * dsub:(s + 1) * dsub] for s in range(m)])
    for _ in range(iters):
        cols = [F.struct(
            F.lit(s).alias("s"),
            _assign_col(_sub(F.col("v"), s, dsub), cbs[s]).alias("c"),
            _sub(F.col("v"), s, dsub).alias("sv")) for s in range(m)]
        a = e.select(F.explode(F.array(*cols)).alias("x")) \
            .select("x.s", "x.c", F.posexplode("x.sv").alias("pos", "val"))
        upd = a.groupBy("s", "c", "pos") \
            .agg(F.sum("val").alias("t"), F.count("*").alias("n")).collect()
        nxt = cbs.copy()
        for r in upd:
            nxt[r.s, r.c, r.pos] = r.t / r.n
        cbs = nxt
    return cbs


def pq_encode(emb: DataFrame, cbs: np.ndarray) -> DataFrame:
    """(vec_id, s, code): nearest-codeword index per subspace — the PQ
    compression map (argmin ties -> lowest code, matching SQL
    row_number)."""
    m, _, dsub = cbs.shape
    e = emb.select("vec_id", as_double("embedding").alias("v"))
    cols = [F.struct(F.lit(s).alias("s"),
                     _assign_col(_sub(F.col("v"), s, dsub), cbs[s])
                     .alias("code")) for s in range(m)]
    return e.select("vec_id", F.explode(F.array(*cols)).alias("x")) \
        .select("vec_id", F.col("x.s").alias("s"),
                F.col("x.code").cast("int").alias("code"))


def pq_topk(emb: DataFrame, n_queries: int = 10, k: int = 3,
            m: int = 8, ksub: int = 16, rerank: int = 32,
            cbs: np.ndarray | None = None) -> DataFrame:
    """ANN via PQ asymmetric distance (ADC): the corpus stores only its
    codes; a query folds each subspace's distance table (built as column
    math against the broadcast codebooks) over the codes, shortlists
    `rerank` candidates by the estimate, then exact cosine re-ranks.
    rerank >= corpus size degrades to EXACT brute force (the correctness
    anchor); recall at small rerank is the tested quality knob."""
    if cbs is None:
        cbs = pq_codebooks(emb, m, ksub)
    mm, kk, dsub = cbs.shape
    e = emb.select("vec_id", as_double("embedding").alias("v"))
    codes = pq_encode(emb, cbs).groupBy("vec_id") \
        .agg(F.array_sort(F.collect_list(F.struct("s", "code")))
             .alias("sc")) \
        .select("vec_id", F.transform("sc", lambda x: x["code"])
                .alias("codes"))
    corpus = e.join(codes, "vec_id")
    q = e.where(F.col("vec_id") < n_queries) \
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    # per-query ADC estimate: sum_s table_s[code_s]
    est = None
    for s in range(mm):
        table = F.array(*[_sqdist_to_centroid(_sub(F.col("qv"), s, dsub),
                                              cbs[s, c])
                          for c in range(kk)])
        term = F.element_at(table, F.element_at("codes", s + 1) + 1)
        est = term if est is None else est + term
    pairs = corpus.join(F.broadcast(q),
                        F.col("vec_id") != F.col("q_id")) \
        .withColumn("est", est)
    w1 = Window.partitionBy("q_id").orderBy(F.col("est").asc(),
                                            F.col("vec_id").asc())
    short = pairs.withColumn("r1", F.row_number().over(w1)) \
        .where(F.col("r1") <= rerank) \
        .withColumn("cos", cosine(F.col("qv"), F.col("v")))
    w2 = Window.partitionBy("q_id").orderBy(F.col("cos").desc(),
                                            F.col("vec_id").asc())
    return short.withColumn("rank", F.row_number().over(w2).cast("int")) \
        .where(F.col("rank") <= k).select("q_id", "rank", "vec_id")


def embed_moments(emb: DataFrame, dim: int = EMBED_DIM,
                  vec_col: str = "embedding"):
    """Distributed covariance of the embedding column: per-partition
    numpy accumulates (sum, outer-product Gram, count) — ONE traversal,
    d*(d+1) floats per partition reach the driver — and the driver
    finishes cov = G/n - mean·meanᵀ. This is how you prepare PCA at
    100 TB: the shuffle payload is O(d²), independent of row count.
    Returns (mean (d,), cov (d,d), n)."""
    import numpy as np

    def part(batches):
        import pandas as pd
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        n = 0
        for pdf in batches:
            if len(pdf):
                m = np.stack(pdf[vec_col].map(np.asarray).values) \
                    .astype(np.float64)
                s += m.sum(axis=0)
                g += m.T @ m
                n += len(m)
        yield pd.DataFrame({"s": [s.tolist()],
                            "g": [g.reshape(-1).tolist()],
                            "n": [n]})

    rows = emb.select(vec_col).mapInPandas(
        part, "s array<double>, g array<double>, n long").collect()
    s = np.sum([np.asarray(r.s) for r in rows], axis=0)
    g = np.sum([np.asarray(r.g).reshape(dim, dim) for r in rows], axis=0)
    n = int(sum(r.n for r in rows))
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return mean, cov, n


def pca_whiten(emb: DataFrame, k: int, dim: int = EMBED_DIM,
               vec_col: str = "embedding", eps: float = 1e-9) -> DataFrame:
    """PCA whitening (the standard pre-transform before LSH/PQ — makes
    hyperplane/codebook bits carry equal variance): eigendecompose the
    d×d covariance on the driver (trivial at embedding dims), broadcast
    the projection, apply map-only. Component SIGNS are canonicalized
    (largest-|loading| coordinate positive) so the output is
    deterministic across eigensolvers. Returns (vec_id, proj array[k])."""
    import numpy as np
    import pandas as pd

    mean, cov, _n = embed_moments(emb, dim, vec_col)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    w, v = w[order], v[:, order]
    flip = np.sign(v[np.argmax(np.abs(v), axis=0), np.arange(len(order))])
    flip[flip == 0] = 1.0
    v = v * flip
    p = (v / np.sqrt(w + eps)).astype(np.float64)   # (d, k)
    sc = emb.sparkSession.sparkContext
    bp, bm = sc.broadcast(p), sc.broadcast(mean)

    @F.pandas_udf("array<double>")
    def proj(vecs):
        m = np.stack(vecs.map(np.asarray).values).astype(np.float64)
        out = (m - bm.value) @ bp.value
        return pd.Series(list(out))

    return emb.select("vec_id", proj(F.col(vec_col)).alias("proj"))


def _cos_to_seed(vec: Column, seed: np.ndarray) -> Column:
    """cos(v, seed) as a JVM fold against a broadcast literal array."""
    lit = F.array(*[F.lit(float(x)) for x in seed])
    return cosine(vec, lit)


def semdedup(emb: DataFrame, n_clusters: int = 8,
             threshold: float = 0.35,
             centroids: np.ndarray | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication that bounds the quadratic pair search inside k-means
    cells. Here the cells come from deterministic seeds (the n_clusters
    lowest vec_ids, the same convention as kmeans_centroids init) so the
    assignment is exactly reproducible: cluster = argmax cosine to seed,
    ties -> lowest seed index. A row is a duplicate when a LOWER-id row
    in the SAME cluster has cosine >= threshold (SemDeDup's keep-one
    rule with the deterministic "keep lowest id" tiebreak).
    -> (vec_id, cluster, is_dup).

    Scale shape: seed table is K x dim literals (broadcast, map-only
    assignment in whole-stage codegen); the pair join shuffles once on
    the cluster key and compares only within-cluster pairs — at corpus
    scale K grows with N so cluster sizes stay bounded and the O(n^2)
    term never materializes globally (the paper's point). A hot cluster
    is the classic skew case: salt it with the triangle scheme of
    neardup_lsh if one cell dominates.
    """
    e = emb.select("vec_id", as_double("embedding").alias("v"))
    if centroids is not None:
        # production path: pass kmeans_centroids(emb) for Lloyd-trained
        # cells (tighter clusters -> fewer cross-cell duplicate misses);
        # the seed default keeps the oracle exactly replayable
        seeds = np.asarray(centroids, dtype=np.float64)
    else:
        seeds = np.array([r.v for r in
                          e.orderBy("vec_id").limit(n_clusters)
                          .collect()])
    coses = F.array(*[_cos_to_seed(F.col("v"), s) for s in seeds])
    a = e.withColumn(
        "cluster",
        (F.array_position(coses, F.array_max(coses)) - 1).cast("int"))
    left = a.select(F.col("vec_id").alias("a_id"),
                    F.col("cluster").alias("cl"), F.col("v").alias("va"))
    right = a.select(F.col("vec_id").alias("b_id"),
                     F.col("cluster").alias("cl"), F.col("v").alias("vb"))
    dups = (left.join(right, "cl")
            .where(F.col("a_id") < F.col("b_id"))
            .where(cosine(F.col("va"), F.col("vb")) >= F.lit(threshold))
            .select(F.col("b_id").alias("vec_id")).distinct()
            .withColumn("is_dup", F.lit(1)))
    return (a.join(dups, "vec_id", "left")
            .select("vec_id", "cluster",
                    F.coalesce(F.col("is_dup"), F.lit(0)).cast("int")
                    .alias("is_dup")))


def rrf_fusion(rankings, k: int = 60, topk: int = 15) -> "DataFrame":
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009) of any
    number of (doc_id, rank) ranking DataFrames:

        rrf(d) = sum over rankings containing d of 1 / (k + rank_d)

    — the standard zero-tuning way to combine lexical (BM25) and dense
    (embedding-cosine) retrieval for curation queries. Absent documents
    simply contribute nothing (no imputed rank). Scale shape: each
    ranking is already top-N-sized, so the union + groupBy is a
    broadcast-scale aggregation regardless of corpus size; the final
    top-k is TakeOrderedAndProject."""
    from functools import reduce

    from pyspark.sql import Window

    parts = [r.select("doc_id",
                      (1.0 / (k + F.col("rank").cast("double")))
                      .alias("c")) for r in rankings]
    u = reduce(lambda a, b: a.unionAll(b), parts)
    fused = (u.groupBy("doc_id")
             .agg(F.sum("c").alias("s"),
                  F.count("*").cast("int").alias("n_lists")))
    top = fused.orderBy(F.col("s").desc(), F.col("doc_id").asc()) \
        .limit(topk)
    win = Window.orderBy(F.col("s").desc(), F.col("doc_id").asc())
    return (top.withColumn("fused_rank", F.row_number().over(win))
            .select("doc_id", F.col("fused_rank").cast("int")
                    .alias("fused_rank"), "n_lists",
                    F.round("s", 9).alias("rrf_r")))


def cosine_rank_to_query(emb: "DataFrame", q_id: int = 0,
                         topn: int = 50) -> "DataFrame":
    """(doc_id, rank): corpus ranked by exact cosine to one query
    embedding — the dense half of a fusion retrieval. The query vector
    broadcasts; one scan scores everything; top-N never leaves
    TakeOrderedAndProject."""
    from pyspark.sql import Window

    q = emb.where(F.col("vec_id") == q_id) \
        .select(F.col("embedding").alias("qv"))
    dot = F.aggregate(F.zip_with("embedding", "qv",
                                 lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = F.sqrt(F.aggregate(F.transform("embedding", lambda a: a * a),
                             F.lit(0.0), lambda acc, x: acc + x))
    qn = F.sqrt(F.aggregate(F.transform("qv", lambda a: a * a),
                            F.lit(0.0), lambda acc, x: acc + x))
    scored = (emb.where(F.col("vec_id") != q_id)
              .crossJoin(F.broadcast(q))
              .select(F.col("vec_id").alias("doc_id"),
                      (dot / (nrm * qn)).alias("cos")))
    top = scored.orderBy(F.col("cos").desc(), F.col("doc_id").asc()) \
        .limit(topn)
    win = Window.orderBy(F.col("cos").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(win)) \
        .select("doc_id", F.col("rank").cast("int").alias("rank"))


def clustering_ari(emb: "DataFrame") -> "DataFrame":
    """-> one row (n, n_clusters, n_labels, ari_r): Adjusted Rand Index
    (Hubert & Arabie 1985) between the LSH-bucket partition of the
    embeddings and the ground-truth `label` column — the standard
    external metric for validating a clustering/dedup pipeline against
    annotations.

    Every pair count is EXACT integer math off one contingency
    groupBy(bucket, label) plus its two marginals (three map-side-
    combined aggregates over a table the size of the partition cross
    product, never the corpus): with sum_ij = sum C(n_ij,2),
    a = sum C(row,2), b = sum C(col,2), E = a*b/C(n,2),
    ARI = (sum_ij - E) / ((a+b)/2 - E) — one double division at the
    end, so any SQL engine replays it bit-for-bit."""
    planes = hyperplanes()
    e = emb.select(lsh_bucket_col(F.col("embedding"), planes)
                   .alias("c"), F.col("label").alias("l"))
    cont = e.groupBy("c", "l").agg(F.count("*").cast("long").alias("n"))
    cont = cont.persist()
    pair = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    sum_ij = cont.agg(F.sum(pair).alias("s")).collect()[0].s or 0
    rows = (cont.groupBy("c").agg(F.sum("n").alias("n"))
            .agg(F.sum(pair).alias("s")).collect()[0].s or 0)
    cols = (cont.groupBy("l").agg(F.sum("n").alias("n"))
            .agg(F.sum(pair).alias("s")).collect()[0].s or 0)
    n = e.count()
    nc = cont.select("c").distinct().count()
    nl = cont.select("l").distinct().count()
    total_pairs = n * (n - 1) // 2
    expected = rows * cols / total_pairs
    maxi = (rows + cols) / 2.0
    ari = (sum_ij - expected) / (maxi - expected) if maxi != expected \
        else 1.0
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(n, nc, nl, round(float(ari), 9))],
        "n long, n_clusters long, n_labels long, ari_r double")
