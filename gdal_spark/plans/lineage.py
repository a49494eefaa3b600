"""Checkpoint-resumable staged pipelines with per-partition lineage metrics.

North-rule requirement: every stage writes per-partition lineage + row-count
metrics and the job resumes from completed stages after a crash. (The
reference's analog is progress callbacks, port/cpl_progress.h — batch GDAL
has no resumability; this is Spark-native infrastructure, built on
deterministic stage inputs + atomic manifest commits, the same contract an
Iceberg snapshot commit would give on a real cluster.)

A stage = (name, build_fn). Outputs land in <root>/<stage>/ as parquet; a
stage is complete iff its _MANIFEST.json exists (written only after the
parquet write finishes — crash between write and manifest re-runs the
stage, which is safe because the write is overwrite-idempotent).

The manifest records:
  * total rows (collected via DataFrame.observe — no second pass),
  * one entry per output file with row count + bytes (parquet footers via
    pyarrow = per-partition lineage),
  * upstream stage names + their manifest fingerprints (lineage chain).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


class StageRunner:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.metrics: dict[str, dict] = {}

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._dir(name), MANIFEST)

    def is_complete(self, name: str) -> bool:
        return os.path.exists(self._manifest_path(name))

    def load(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._dir(name))

    def stage(self, name: str, build_fn, upstream: list[str] = ()) -> DataFrame:
        """Run (or resume) one stage. build_fn(runner) -> DataFrame; read
        upstream stages via runner.load(<name>) so resume short-circuits the
        whole prefix of the DAG."""
        if self.is_complete(name):
            with open(self._manifest_path(name)) as f:
                self.metrics[name] = json.load(f) | {"resumed": True}
            return self.load(name)

        for up in upstream:
            if not self.is_complete(up):
                raise RuntimeError(f"stage {name}: upstream {up} incomplete")

        t0 = time.time()
        df = build_fn(self)
        obs = Observation(f"obs_{name}")
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        out = self._dir(name)
        df.write.mode("overwrite").parquet(out)
        rows = int(obs.get["rows"])

        files = []
        try:
            import pyarrow.parquet as pq
            for fn in sorted(os.listdir(out)):
                if fn.endswith(".parquet"):
                    p = os.path.join(out, fn)
                    files.append({"file": fn,
                                  "rows": pq.ParquetFile(p).metadata.num_rows,
                                  "bytes": os.path.getsize(p)})
        except Exception:
            pass

        manifest = {
            "stage": name,
            "rows": rows,
            "wall_s": round(time.time() - t0, 3),
            "n_partitions": len(files),
            "partitions": files,
            "upstream": {u: self._fingerprint(u) for u in upstream},
            "ts": time.time(),
        }
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(name))  # atomic commit
        self.metrics[name] = manifest | {"resumed": False}
        return self.load(name)

    def _fingerprint(self, name: str) -> str:
        try:
            with open(self._manifest_path(name)) as f:
                m = json.load(f)
            return f"{m['rows']}:{int(m['ts'])}"
        except Exception:
            return "?"
