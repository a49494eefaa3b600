"""IVF ANN: inverted-list partitioning, exactness at nprobe=K, recall at
nprobe<K, and centroid convergence sanity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import simsearch

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_kmeans_partitions_everything(spark, emb):
    cent = simsearch.kmeans_centroids(emb, n_clusters=8, iters=2)
    assert cent.shape == (8, simsearch.EMBED_DIM)
    e = emb.select(simsearch.as_double("embedding").alias("v"))
    sizes = (e.select(simsearch._assign_col(F.col("v"), cent).alias("c"))
             .groupBy("c").agg(F.count("*").alias("n")).collect())
    assert sum(r.n for r in sizes) == emb.count()
    assert all(0 <= r.c < 8 for r in sizes)


def test_ivf_full_probe_is_exact(spark, emb):
    """nprobe == n_clusters must reproduce brute force row-for-row — the
    anchor the driver oracle pins at sf0.01."""
    want = {(r.q_id, r.rank): r.vec_id
            for r in simsearch.brute_topk(emb, n_queries=6, k=3).collect()}
    got = {(r.q_id, r.rank): r.vec_id
           for r in simsearch.ivf_topk(emb, n_queries=6, k=3,
                                       n_clusters=8, nprobe=8).collect()}
    assert got == want


def test_ivf_partial_probe_recall(spark, emb):
    """nprobe=3 of 8 lists: deterministic pipeline, recall must clear a
    floor well above random (3/8 of the data scanned per query)."""
    want = {(r.q_id, r.rank): r.vec_id
            for r in simsearch.brute_topk(emb, n_queries=10, k=3).collect()}
    got = {(r.q_id, r.rank): r.vec_id
           for r in simsearch.ivf_topk(emb, n_queries=10, k=3,
                                       n_clusters=8, nprobe=3).collect()}
    hits = sum(1 for key, v in want.items() if got.get(key) == v)
    recall = hits / len(want)
    assert recall >= 0.5, recall


def test_kmeans_objective_nonincreasing(spark, emb):
    """More Lloyd iterations never worsen the quantization error."""
    e = emb.select(simsearch.as_double("embedding").alias("v"))

    def sse(cent):
        d = F.array(*[simsearch._sqdist_to_centroid(F.col("v"), c)
                      for c in cent])
        return e.select(F.array_min(d).alias("m")).agg(
            F.sum("m")).collect()[0][0]

    c1 = simsearch.kmeans_centroids(emb, n_clusters=8, iters=1)
    c3 = simsearch.kmeans_centroids(emb, n_clusters=8, iters=3)
    assert sse(c3) <= sse(c1) + 1e-9


# ---------------------------------------------------------------------------
# Product quantization (Jegou et al. 2011)
# ---------------------------------------------------------------------------

def test_pq_full_rerank_equals_brute(spark, emb):
    ss = simsearch
    cbs = ss.pq_codebooks(emb, m=8, ksub=16, iters=2)
    got = sorted(map(tuple, ss.pq_topk(emb, n_queries=5, k=3,
                                       rerank=10**9, cbs=cbs).collect()))
    want = sorted(map(tuple, ss.brute_topk(emb, n_queries=5,
                                           k=3).collect()))
    assert got == want


def test_pq_recall_at_small_rerank(spark, emb):
    ss = simsearch
    cbs = ss.pq_codebooks(emb, m=8, ksub=16, iters=2)
    got = set(map(tuple, ss.pq_topk(emb, n_queries=5, k=3, rerank=48,
                                    cbs=cbs).select("q_id", "vec_id")
                  .collect()))
    want = set(map(tuple, ss.brute_topk(emb, n_queries=5, k=3)
                   .select("q_id", "vec_id").collect()))
    recall = len(got & want) / len(want)
    assert recall >= 0.6, recall


def test_pq_lloyd_reduces_distortion(spark, emb):
    ss = simsearch
    emb = emb.limit(200)

    def distortion(cbs):
        e = emb.select(ss.as_double("embedding").alias("v"))
        total = None
        for s in range(cbs.shape[0]):
            d = F.array_min(F.array(*[
                ss._sqdist_to_centroid(ss._sub(F.col("v"), s, 8),
                                       cbs[s, c]) for c in range(16)]))
            total = d if total is None else total + d
        return e.agg(F.sum(total)).collect()[0][0]

    d0 = distortion(ss.pq_codebooks(emb, iters=0))
    d2 = distortion(ss.pq_codebooks(emb, iters=2))
    assert d2 <= d0 + 1e-9 and d2 < d0 * 0.95


def test_pca_whitening_identity_covariance(spark):
    """pca_whiten output must be zero-mean with identity covariance on
    the kept components, and deterministic across calls (canonical
    eigenvector signs)."""
    import numpy as np

    from gdal_spark.operators.simsearch import embed_moments, pca_whiten

    rng = np.random.RandomState(0)
    # anisotropic gaussian: random linear map of iid normals
    A = rng.randn(64, 64) * 0.3
    X = rng.randn(500, 64) @ A + rng.randn(64)
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(500)],
        "vec_id long, embedding array<double>")
    mean, cov, n = embed_moments(df)
    np.testing.assert_allclose(mean, X.mean(axis=0), rtol=1e-9)
    np.testing.assert_allclose(cov, np.cov(X.T, bias=True), rtol=1e-7)
    assert n == 500

    out = pca_whiten(df, k=8)
    P = np.stack([np.asarray(r.proj) for r in
                  sorted(out.collect(), key=lambda r: r.vec_id)])
    assert P.shape == (500, 8)
    np.testing.assert_allclose(P.mean(axis=0), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.cov(P.T, bias=True), np.eye(8),
                               atol=1e-6)
    # deterministic reruns (sign canonicalization)
    P2 = np.stack([np.asarray(r.proj) for r in
                   sorted(pca_whiten(df, k=8).collect(),
                          key=lambda r: r.vec_id)])
    np.testing.assert_array_equal(P, P2)


def test_clustering_ari_bounds(spark):
    """Perfect agreement -> ARI 1; the real LSH vs label case lands in
    [-1, 1]; label-vs-itself is exactly 1."""
    import numpy as np

    from gdal_spark.operators.simsearch import clustering_ari
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    r = clustering_ari(emb).collect()[0]
    assert -1.0 <= r.ari_r <= 1.0
    assert r.n == emb.count() and r.n_clusters >= 2
