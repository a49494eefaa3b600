"""DoReMi reweighting + label propagation: invariants beyond the
driver oracles (which pin exact values)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "w " * (5 + i % 7) + "end", "en",
             f"src{i % 3}", 10 + 3 * (i % 5)) for i in range(60)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


def test_doremi_weights_sum_to_one_and_order(docs):
    from gdal_spark.operators import textops
    out = textops.doremi_weights(docs).collect()
    assert len(out) == 3
    assert abs(sum(r.weight for r in out) - 1.0) < 1e-9
    # higher-loss domains must gain weight (monotone in loss)
    srt = sorted(out, key=lambda r: r.loss)
    ws = [r.weight for r in srt]
    assert ws == sorted(ws)


def test_label_propagation_converges_on_cliques(spark):
    # two disjoint triangles via the deterministic edge map is hard to
    # arrange; instead check invariants on the synthetic graph: labels
    # are valid doc_ids and isolated sinks keep their own label
    from gdal_spark.operators import graphops
    d = spark.range(120).select(F.col("id").alias("doc_id"),
                                F.lit("t").alias("text"))
    out = graphops.label_propagation(d, rounds=2)
    rows = {r.doc_id: r.label for r in out.collect()}
    assert set(rows) == set(range(120))
    assert all(0 <= v < 120 for v in rows.values())
    # a sink with no incoming edges keeps its own label: find one
    n = 120
    targets = {(s * 31 + j * 97) % n
               for s in range(n) if s % 17 for j in (1, 2, 3)}
    lonely = [i for i in range(n) if i not in targets]
    if lonely:
        assert all(rows[i] == i for i in lonely)


def test_weighted_sample_bias(spark):
    # heavier docs must be sampled more often across md5 seeds: vary
    # doc_id, two weight classes, check top-k composition is weight-
    # biased in aggregate
    from gdal_spark.operators import textops
    rows = [(i, "t", "en", "s", 1000 if i % 2 == 0 else 10)
            for i in range(400)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = textops.weighted_sample_topk(docs, k=40).collect()
    heavy = sum(1 for r in out if r.doc_id % 2 == 0)
    assert heavy >= 30  # 1000:10 weights -> heavy class dominates


def test_pmi_direction_aware(spark):
    from gdal_spark.operators import textops
    docs = spark.createDataFrame(
        [(i, "a b c a b", "en", "s", 9) for i in range(10)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = {(r.w1, r.w2): r for r in
           textops.pmi_cooccurrence(docs, min_pairs=2, top=50).collect()}
    # 'a b' occurs 2x/doc, 'b a' occurs 1x/doc at distance 2
    assert out[("a", "b")].n_pair == 20
    assert out[("b", "a")].n_pair == 10
