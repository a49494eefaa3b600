"""GeoParquet source/sink (parquet + `geo` footer metadata).

Twin of the reference's (Geo)Parquet driver (ogr/ogrsf_frmts/parquet/
ogrparquetwriterlayer.cpp:660-840 builds the `geo` JSON — version,
primary_column, per-column encoding/geometry_types/bbox/crs and the
GeoParquet-1.1 `covering.bbox` struct column mapping;
ogrparquetlayer.cpp:87 reads it back).

Spark-first distribution: Spark's own parquet writer cannot attach custom
footer key-value metadata, so the sink writes ONE footer-complete part
file per partition via pyarrow inside mapInPandas — every part file is a
self-describing GeoParquet file (its `geo` bbox covers that file's rows,
which is exactly what per-file metadata means in a multi-file dataset),
and no geometry bytes ever visit the driver. The reader parses `geo` from
one footer (driver, metadata-only) and hands back a plain DataFrame; the
covering bbox struct column (xmin/ymin/xmax/ymax float64) makes bbox
filters ordinary comparisons on stored columns — Catalyst pushes them
into the scan and parquet row-group stats skip non-intersecting groups,
the same data-skipping story as the cell-id layout (SURVEY §4).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GEO_VERSION = "1.1.0"


def _geo_meta(geom_col: str, bbox_col: str, bbox, geometry_types,
              crs: str | None) -> dict:
    col: dict = {"encoding": "WKB",
                 "geometry_types": sorted(geometry_types)}
    if crs is not None:
        # GeoParquet >= 0.4 carries PROJJSON; the authority:code id is the
        # part consumers key on, and what our CRS registry resolves
        auth, _, code = crs.partition(":")
        col["crs"] = {"type": "GeographicCRS" if code == "4326"
                      else "ProjectedCRS",
                      "id": {"authority": auth, "code": int(code)}}
    if bbox is not None:
        col["bbox"] = [float(v) for v in bbox]
    if bbox_col:
        col["covering"] = {"bbox": {c: [bbox_col, c] for c in
                                    ("xmin", "ymin", "xmax", "ymax")}}
    return {"version": GEO_VERSION, "primary_column": geom_col,
            "columns": {geom_col: col}}


def write_geoparquet(df: DataFrame, path: str, geom_col: str = "geom",
                     crs: str | None = "EPSG:4326",
                     bbox_struct: bool = True) -> None:
    """Write a DataFrame with a WKB geometry column as a directory of
    GeoParquet part files (one per partition, footer-complete)."""
    from ..core import geomops, wkb as wkblib

    os.makedirs(path, exist_ok=True)
    bbox_col = f"{geom_col}_bbox" if bbox_struct else ""

    out_schema = T.StructType([T.StructField("file", T.StringType()),
                               T.StructField("n", T.LongType())])

    fields = df.schema.fields

    def write_part(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq
        pdfs = list(batches)
        if not pdfs:
            yield pd.DataFrame({"file": [], "n": []})
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        wkbs = pdf[geom_col].values
        envs = geomops.envelopes(wkbs)
        gtypes = set()
        for b in wkbs:
            if b is not None:
                gtypes.add(wkblib.TYPE_NAMES.get(
                    wkblib.decode(bytes(b)).gtype, "Geometry"))
        cols = {f.name: pdf[f.name] for f in fields}
        table = pa.Table.from_pydict(cols)
        if bbox_col:
            bbox_arr = pa.StructArray.from_arrays(
                [pa.array(envs[:, i], pa.float64()) for i in range(4)],
                names=["xmin", "ymin", "xmax", "ymax"])
            table = table.append_column(bbox_col, bbox_arr)
        file_bbox = (envs[:, 0].min(), envs[:, 1].min(),
                     envs[:, 2].max(), envs[:, 3].max()) if len(envs) else None
        meta = _geo_meta(geom_col, bbox_col, file_bbox, gtypes, crs)
        schema = table.schema.with_metadata(
            {b"geo": json.dumps(meta).encode()})
        table = table.cast(schema)
        import uuid
        fname = f"part-{uuid.uuid4().hex}.parquet"
        pq.write_table(table, os.path.join(path, fname))
        yield pd.DataFrame({"file": [fname], "n": [len(pdf)]})

    # the action drives the distributed write; results are tiny manifests
    df.mapInPandas(write_part, out_schema).collect()


def read_geo_metadata(path: str) -> dict | None:
    """Parse the `geo` footer key from the first part file (driver-side,
    metadata-only — no row groups are read)."""
    import pyarrow.parquet as pq
    files = sorted(f for f in os.listdir(path) if f.endswith(".parquet")) \
        if os.path.isdir(path) else [""]
    for f in files:
        md = pq.read_schema(os.path.join(path, f) if f else path).metadata
        if md and b"geo" in md:
            return json.loads(md[b"geo"])
    return None


def read_geoparquet(spark: SparkSession, path: str,
                    bbox: tuple | None = None):
    """-> (DataFrame, geo_metadata). With `bbox` = (xmin, ymin, xmax,
    ymax), applies the covering-bbox intersection predicate on the stored
    struct column — plain comparisons the scan prunes row groups with."""
    meta = read_geo_metadata(path)
    df = spark.read.parquet(path)
    if bbox is not None:
        if not meta:
            raise ValueError("bbox filter needs geo metadata")
        col = meta["columns"][meta["primary_column"]]
        cov = col.get("covering", {}).get("bbox")
        if not cov:
            raise ValueError("no covering bbox column in geo metadata")
        xmin, ymin, xmax, ymax = bbox
        df = df.where(
            (F.col(".".join(cov["xmin"])) <= xmax)
            & (F.col(".".join(cov["xmax"])) >= xmin)
            & (F.col(".".join(cov["ymin"])) <= ymax)
            & (F.col(".".join(cov["ymax"])) >= ymin))
    return df, meta
