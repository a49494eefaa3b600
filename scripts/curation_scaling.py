#!/usr/bin/env python
"""Scaling-efficiency evidence for the CURATION job (the webtext twin of
scripts/scaling_bench.py): run jobs/curation_job.py on IDENTICAL
pre-materialized input at two parallelism levels (default local[2] vs
local[8] — the sandbox stand-in for N vs 4N executors, both legs on
physical cores; see BASELINE.md for why 8->32 only measures SMT) and
report per-stage + total throughput and efficiency.

Usage: python scripts/curation_scaling.py [n_docs] [low] [high] [trials]
Writes CURATION_SCALING.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import hardware_ceiling  # noqa: E402

_PREP = r"""
import sys
sys.path.insert(0, {root!r})
from gdal_spark.session import get_spark
from gdal_spark.pipeline import prepare_documents
spark = get_spark("curation-prep", cores=32, shuffle_partitions=64)
prepare_documents(spark, {n}, {path!r}, partitions=64)
spark.stop()
print("PREPARED")
"""

_CHILD = r"""
import json, shutil, sys, time
sys.path.insert(0, {root!r})
sys.path.insert(0, {root!r} + "/jobs")
from gdal_spark.session import get_spark

cores = {cores}
spark = get_spark("curation-bench", cores=cores,
                  shuffle_partitions=4 * cores)
import curation_job

# Warmup: a tiny end-to-end run forks every Python worker, imports its
# libraries and JITs the codegen — steady-state is what a long-lived
# cluster runs at (same protocol as scaling_bench.py).
import io, contextlib
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    curation_job.main(["--input", {warm!r}, "--workdir", {wd!r} + "_warm"])
shutil.rmtree({wd!r} + "_warm", ignore_errors=True)

buf = io.StringIO()
t0 = time.time()
with contextlib.redirect_stdout(buf):
    curation_job.main(["--input", {docs!r}, "--workdir", {wd!r}])
wall = time.time() - t0
res = json.loads([ln for ln in buf.getvalue().splitlines()
                  if ln.startswith("{{")][-1])
print("RESULT " + json.dumps({{
    "cores": cores, "wall_s": round(wall, 2),
    "published_rows": res["published_rows"],
    "stage_wall": {{k: v.get("wall_s") for k, v in res["stages"].items()}},
}}))
"""

_WD_BASE = "/dev/shm" if os.path.isdir("/dev/shm") else None


def run_level(cores: int, docs: str, warm: str, trials: int) -> dict:
    best = None
    for _ in range(trials):
        wd = tempfile.mkdtemp(prefix=f"cur_{cores}_", dir=_WD_BASE)
        try:
            code = _CHILD.format(root=ROOT, cores=cores, wd=wd,
                                 docs=docs, warm=warm)
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True,
                                 timeout=5400)
            res = None
            for line in out.stdout.splitlines():
                if line.startswith("RESULT "):
                    res = json.loads(line[len("RESULT "):])
            if res is None:
                raise RuntimeError(
                    f"no RESULT (cores={cores}):\n{out.stdout[-2000:]}\n"
                    f"{out.stderr[-2000:]}")
            if best is None or res["wall_s"] < best["wall_s"]:
                best = res
        finally:
            shutil.rmtree(wd, ignore_errors=True)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    data_dir = tempfile.mkdtemp(prefix="cur_docs_", dir=_WD_BASE)
    docs = os.path.join(data_dir, "docs.parquet")
    warm = os.path.join(data_dir, "warm.parquet")
    try:
        for path, nn in ((docs, n), (warm, 20_000)):
            code = _PREP.format(root=ROOT, n=nn, path=path)
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True,
                                 timeout=3600)
            if "PREPARED" not in out.stdout:
                raise RuntimeError(f"prep failed:\n{out.stdout[-1500:]}\n"
                                   f"{out.stderr[-1500:]}")

        res_lo = run_level(lo, docs, warm, trials)
        res_hi = run_level(hi, docs, warm, trials)
        ceiling = hardware_ceiling(lo, hi)

        factor = hi / lo
        raw = (res_lo["wall_s"] / res_hi["wall_s"]) / factor
        stage_eff = {}
        for k, w_lo in (res_lo["stage_wall"] or {}).items():
            w_hi = (res_hi["stage_wall"] or {}).get(k)
            if w_lo and w_hi:
                stage_eff[k] = round((w_lo / w_hi) / factor, 3)
        out = {
            "job": "curation (extract->C4->exact+MinHash dedup->"
                   "quality+LM->sample->publish)",
            "n_docs": n,
            "low": res_lo, "high": res_hi,
            "docs_per_sec_low": round(n / res_lo["wall_s"], 1),
            "docs_per_sec_high": round(n / res_hi["wall_s"], 1),
            "scaling_efficiency_raw": round(raw, 3),
            "hardware_ceiling": round(ceiling, 3),
            "scaling_efficiency_normalized": round(
                min(raw / ceiling, 4.0), 3),
            "stage_efficiency_raw": stage_eff,
            "protocol": f"local[{lo}] vs local[{hi}], best-of-{trials}, "
                        "identical tmpfs input, warmed workers "
                        "(BASELINE.md protocol)",
        }
        with open(os.path.join(ROOT, "CURATION_SCALING.json"), "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
