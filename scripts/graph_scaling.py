#!/usr/bin/env python
"""Scaling-efficiency evidence for the link-graph operators: run the SAME
PageRank power iteration (operators/graphops.py) on identical input at two
parallelism levels (default local[2] vs local[8] — the sandbox stand-in for
N vs 4N executors, same protocol as scripts/scaling_bench.py) and report
throughput + efficiency, normalized by the box's own pure-ALU scaling
ceiling.

Usage: python scripts/graph_scaling.py [n_nodes] [low_cores] [high_cores]
Writes GRAPH_SCALING.json at the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from scripts.scaling_bench import hardware_ceiling  # noqa: E402

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import functions as F
from gdal_spark.session import get_spark
from gdal_spark.operators.graphops import pagerank

cores = {cores}
n = {n}
spark = get_spark("graph-scaling", cores=cores,
                  shuffle_partitions=4 * cores)
docs = spark.range(50_000).select(F.col("id").alias("doc_id"))
pagerank(docs, iters=2).count()            # warmup: fork workers, JIT
docs = spark.range(n).select(F.col("id").alias("doc_id"))
t0 = time.time()
total = pagerank(docs, iters=8).agg(F.sum("rank_r")).collect()[0][0]
wall = time.time() - t0
spark.stop()
print("RESULT " + json.dumps({{
    "cores": cores, "n_nodes": n, "wall_s": round(wall, 2),
    "nodes_per_sec": round(n / wall, 1),
    "mass_check": round(float(total), 6)}}))
"""


def run_level(cores: int, n: int, trials: int = 3) -> dict:
    best = None
    for _ in range(trials):
        code = _CHILD.format(root=ROOT, cores=cores, n=n)
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=3600)
        res = None
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                res = json.loads(line[len("RESULT "):])
        if res is None:
            raise RuntimeError(f"no RESULT (cores={cores}):\n"
                               f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
        if best is None or res["wall_s"] < best["wall_s"]:
            best = res
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    print(f"# pagerank, {n} nodes (~{3 * n} edges), "
          f"local[{lo}] vs local[{hi}]", file=sys.stderr)
    r_lo = run_level(lo, n)
    print(f"# local[{lo}]: {r_lo['nodes_per_sec']} nodes/s "
          f"({r_lo['wall_s']}s)", file=sys.stderr)
    r_hi = run_level(hi, n)
    print(f"# local[{hi}]: {r_hi['nodes_per_sec']} nodes/s "
          f"({r_hi['wall_s']}s)", file=sys.stderr)
    ceiling = hardware_ceiling(lo, hi)
    ratio = hi / lo
    eff = (r_hi["nodes_per_sec"] / r_lo["nodes_per_sec"]) / ratio
    result = {
        "job": "PageRank power iteration, 8 rounds (edge join + "
               "partial-agg contribution sum + dangling-mass scalar "
               "per round, rank vector checkpointed per round)",
        "n_nodes": n,
        "low": r_lo, "high": r_hi,
        "parallelism_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
        "hardware_ceiling": round(ceiling, 3),
        "normalized_efficiency": round(eff / ceiling, 3),
        "target": 0.8,
        "pass": eff / ceiling >= 0.8,
        "note": "same single-box N vs 4N protocol as BENCH_SCALING.json; "
                "see its note on the pure-ALU hardware ceiling",
    }
    with open(os.path.join(ROOT, "GRAPH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
