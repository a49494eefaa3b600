#!/usr/bin/env python
"""spark-submit entry point for the web-corpus CURATION pipeline.

The training-data side of the engine as one packaged, checkpoint-
resumable job (the webtext twin of jobs/canonical_job.py):

    extract   byte-exact text per url (textops.extract_text contract)
    clean     C4 heuristics (line + page gates, pure JVM column math)
    dedup     exact-hash dedup, then MinHash-LSH 128x16 near-dup
              clustering with the distributed connected-components merge
    quality   Gopher signals + corpus-trained bigram-LM perplexity
    sample    deterministic hash sampling at --sample-rate
    publish   snapshot-table commit (Iceberg-semantics manifest)

Every stage writes through the StageRunner (per-partition lineage +
row counts under --workdir); re-running with the same workdir resumes
after the last completed stage. Ship with:

    ./scripts/build_pyfiles.sh
    spark-submit --py-files dist/gdal_spark.zip \
        jobs/curation_job.py --input docs.parquet --workdir /tmp/cur

Prints one JSON line: per-stage rows/wall + the final survivor count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# running the script directly (no --py-files): the repo root serves
try:
    import gdal_spark  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="documents parquet (doc_id, text, ...)")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--sample-rate", type=float, default=1.0)
    ap.add_argument("--ppl-max", type=float, default=None,
                    help="drop docs above this bigram perplexity")
    ap.add_argument("--classifier-pos-lang", default=None,
                    help="add a hashed-ngram classifier stage: keep "
                         "docs the fastText-style NB-weighted "
                         "classifier scores positive for this lang")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    import pyspark
    builder = SparkSession.builder.appName("gdal-spark-curation")
    if not pyspark.SparkConf().contains("spark.master"):
        builder = builder.master("local[*]")
    spark = builder.getOrCreate()

    from pyspark.sql import functions as F

    from gdal_spark.operators import textops
    from gdal_spark.plans.lineage import StageRunner
    from gdal_spark.plans.snapshot import SnapshotTable

    runner = StageRunner(spark, args.workdir)
    t0 = time.time()

    def ingest(r):
        if args.input.endswith(".warc"):
            # crawl-container ingest: WARC records -> byte-exact text
            # extraction -> marker-word langid -> documents schema;
            # doc_id derives from md5(url) so it is partition- and
            # cluster-size-independent
            from gdal_spark.sources.warc import read_warc
            w = read_warc(spark, args.input)
            text = F.regexp_extract(F.decode("payload", "UTF-8"),
                                    "<p>(.*)</p>", 1)
            d = w.select(
                F.conv(F.substring(F.md5("url"), 1, 15), 16, 10)
                .cast("long").alias("doc_id"),
                "url", text.alias("text"))
            return (d.withColumn("lang", textops.langid_col())
                    .withColumn("source", F.regexp_extract(
                        "url", "://([^/]+)/", 1))
                    .withColumn("n_chars", F.length("text")))
        return spark.read.parquet(args.input)

    runner.stage("ingest", ingest)

    def clean(r):
        d = r.load("ingest")
        c4 = textops.c4_filters(d).where(F.col("keep") == 1) \
            .select("doc_id", "text")
        return d.drop("text").join(c4, "doc_id")

    runner.stage("clean", clean, upstream=["ingest"])

    def dedup(r):
        d = r.load("clean")
        # keep the LOWEST doc_id per fingerprint (not dropDuplicates,
        # whose survivor is partitioning-dependent): the published set
        # must be identical at every cluster size for the scaling gate
        # and for reproducible curation generally
        first = d.select(F.md5(F.col("text")).alias("fp"), "doc_id") \
            .groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        exact = d.join(first.select("doc_id"), "doc_id")
        comps = textops.minhash_components(exact)
        keep = comps.groupBy("cluster").agg(F.min("doc_id").alias("doc_id"))
        return exact.join(keep.select("doc_id"), "doc_id")

    runner.stage("dedup", dedup, upstream=["clean"])

    def quality(r):
        d = r.load("dedup")
        q = textops.quality_score(d).select("doc_id", "keep")
        lm = textops.bigram_lm_scores(d).select("doc_id", "ppl_r")
        out = d.join(q, "doc_id").join(lm, "doc_id")
        out = out.where(F.col("keep") == 1).drop("keep")
        if args.ppl_max is not None:
            out = out.where(F.col("ppl_r") <= args.ppl_max)
        return out

    runner.stage("quality", quality, upstream=["dedup"])

    pre_sample = "quality"
    if args.classifier_pos_lang is not None:

        def classify(r):
            d = r.load("quality")
            sc = textops.hashed_ngram_scores(
                d, pos_lang=args.classifier_pos_lang)
            return d.join(sc.where(F.col("pred") == 1)
                          .select("doc_id"), "doc_id")

        runner.stage("classify", classify, upstream=["quality"])
        pre_sample = "classify"

    def sample(r):
        d = r.load(pre_sample)
        if args.sample_rate >= 1.0:
            return d
        return textops.hash_sample(d, args.sample_rate)

    runner.stage("sample", sample, upstream=[pre_sample])

    table = SnapshotTable(spark, f"{args.workdir}/published")
    version = table.commit_append(runner.load("sample"))
    wall = time.time() - t0
    print(json.dumps({
        "wall_s": round(wall, 2),
        "published_version": version,
        "published_rows": table.read().count(),
        "stages": {k: {kk: v[kk] for kk in ("rows", "wall_s", "resumed")
                       if kk in v}
                   for k, v in runner.metrics.items()},
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
