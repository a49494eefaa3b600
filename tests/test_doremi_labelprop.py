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
