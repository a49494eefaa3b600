#!/usr/bin/env python
"""Hot-cell skew evidence: the salt path of the shuffle-join PIP.

All points land in ONE z8 cell (the coastal-megacity shape of web-page
geodata). In the shuffle-join path (region side too big to broadcast) the
candidate shuffle keys by cell id, so one reducer gets every row; salting
splits the hot cell across `salt` reducers. This script measures wall time
unsalted vs salted at the same parallelism and verifies identical results.

Writes SKEW_BENCH.json. (The broadcast path — the default — has no
reducer skew by construction; this exercises the documented fallback.)
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from gdal_spark import datagen  # noqa: E402
from gdal_spark.operators import simsearch, spatial_join  # noqa: E402
from gdal_spark.session import get_spark  # noqa: E402


def lsh_hot_bucket_bench(spark, n=3000, salt=8):
    """Hot-bucket LSH near-dup: every vector lands in (nearly) one
    hyperplane bucket — the shape of a near-dup-heavy corpus, which is why
    you're deduping. Unsalted, the in-bucket self-join runs n^2/2 cosine
    verifies on ONE reducer; the triangle salt spreads it over
    salt*(salt+1)/2 reducers with bit-identical output."""
    import numpy as np
    import pandas as pd
    rng = np.random.RandomState(3)
    base = rng.normal(size=simsearch.EMBED_DIM)
    vecs = base[None, :] + 0.003 * rng.normal(size=(n, simsearch.EMBED_DIM))
    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v.astype(np.float32).tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf).repartition(32).cache()
    emb.count()

    def run(salt_, hot):
        t0 = time.time()
        out = simsearch.neardup_lsh(emb, threshold=0.9995,
                                    salt=salt_, hot_threshold=hot)
        rows = sorted((r.a_id, r.b_id)
                      for r in out.select("a_id", "b_id").collect())
        return time.time() - t0, rows

    t_plain, rp = run(1, 1 << 40)
    t_salt, rs = run(salt, 100)
    assert rp == rs, "salted LSH pairs differ from plain"
    return {
        "n_vectors": n, "salt": salt,
        "wall_unsalted_s": round(t_plain, 2),
        "wall_salted_s": round(t_salt, 2),
        "salt_speedup": round(t_plain / t_salt, 2),
        "n_pairs": len(rp),
        "results_identical": True,
        "note": "triangle self-join salting of the hot LSH bucket; every "
                "unordered pair meets in exactly one (i,j) sub-cell",
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("skew-bench", cores=cores,
                      shuffle_partitions=4 * cores)
    # emulate a region dim too big to broadcast (otherwise AQE simply
    # auto-broadcasts the exploded side and there is no shuffle to skew —
    # the first line of defense, worth knowing, but not what we measure)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # every point inside one z8 cell AND hugging a region boundary
    # (lon 10.0 is a grid-region edge): the subcell masks classify these as
    # partial, so nearly every candidate goes through the exact PIP UDF —
    # the worst-case hot cell (a coastal megacity on an admin border)
    pts = (spark.range(n)
           .select((F.lit(9.995) + (F.col("id") % 997) / 100000.0)
                   .alias("lon"),
                   (F.lit(47.1) + (F.col("id") % 991) / 10000.0).alias("lat"),
                   F.col("id").alias("doc_id")))
    regions = datagen.regions(spark).select(
        "region_id", "geom", "cells", "in_masks", "out_masks")

    def run(salt, aqe_skew):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                       "true" if aqe_skew else "false")
        t0 = time.time()
        out = spatial_join.pip_join(pts, regions, zoom=datagen.PIP_ZOOM,
                                    broadcast_regions=False, salt=salt)
        rows = out.groupBy("region_id").count().collect()
        return time.time() - t0, sorted((r.region_id, r["count"])
                                        for r in rows)

    run(1, True)  # warmup
    t_skewed, r0 = run(1, False)      # the raw problem: one hot reducer
    t_salt, r1 = run(8, False)        # manual salt fixes it
    t_aqe, r2 = run(1, True)          # AQE skew-join fixes it by itself
    assert r0 == r1 == r2, "results differ across configs"
    lsh = lsh_hot_bucket_bench(spark)
    result = {
        "n_points": n, "cores": cores, "hot_cells": 1,
        "wall_hot_unmitigated_s": round(t_skewed, 2),
        "wall_salted8_s": round(t_salt, 2),
        "wall_aqe_skewjoin_s": round(t_aqe, 2),
        "salt_speedup_vs_unmitigated": round(t_skewed / t_salt, 2),
        "aqe_speedup_vs_unmitigated": round(t_skewed / t_aqe, 2),
        "results_identical": True,
        "path": "shuffle join (broadcast_regions=False, no auto-broadcast)",
        "note": "defense in depth: AQE skew-join (on by default in "
                "session.py) splits the hot SHUFFLE partition, which "
                "suffices when the per-row work is cheap JVM bit math; "
                "when the hot cell is boundary-heavy the cost sits in the "
                "exact-PIP pandas UDF stage AFTER the join, which AQE "
                "does not re-plan — salting splits that stage too, hence "
                "the ~2x here",
        "lsh_neardup_hot_bucket": lsh,
    }
    with open(os.path.join(ROOT, "SKEW_BENCH.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
