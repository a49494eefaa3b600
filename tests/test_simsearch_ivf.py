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
