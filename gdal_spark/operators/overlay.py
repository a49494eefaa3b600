"""Layer x layer spatial overlay: Intersection, Clip, Erase, Identity, Update.

Re-expresses OGRLayer's overlay family (/root/reference/ogr/ogrsf_frmts/
generic/ogrlayer.cpp — Intersection :2633, Identity :4018, Update :4436,
Clip :4785, Erase :5094; inner per-feature algorithm :2695-2830: envelope
skip -> SetSpatialFilter on the method layer -> prepared-geometry pretest ->
exact GEOS op) as a Spark map-only stage:

  * the method layer is COLLECTED and broadcast (one decode per worker) —
    the same small-side assumption OGR makes by re-filtering the method
    layer per feature; a big-method variant would cell-cover both sides and
    shuffle, same machinery as pip_join;
  * each subject Arrow batch prefilters method candidates with a vectorized
    envelope intersect (the :2695 envelope skip), then applies the exact
    numpy kernel (clip_geom_convex / erase_geom_convex);
  * method geometries are simple rings without holes; concave rings are
    ear-clipped into triangles once on the driver (exact for every mode —
    difference folds over parts, intersection parts are interior-disjoint);
    erase against several methods folds sequentially, which is exact
    because each step is a true difference.

Cardinality contracts (matching the reference):
  intersection  one row per intersecting (subject, method) pair,
                attrs of both sides (ogrlayer.cpp:2766-2830)
  clip          one row per subject that intersects >=1 method; geometry =
                subject ∩ union(methods) — exact when methods don't overlap
                (each pair-piece kept as a separate multipolygon part)
  erase         one row per subject with non-empty subject \\ union(methods)
  identity      intersection pairs + the left-over subject \\ union(methods)
                with NULL method attrs (ogrlayer.cpp:4018)
  update        method rows (with NULL subject attrs) + subject \\
                union(methods) (ogrlayer.cpp:4436)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import geomops, wkb

_MODES = ("intersection", "clip", "erase", "identity", "update")


def _method_rows(method: DataFrame, mid_col: str):
    """Collect the method layer as (mid, [convex rings], envelope) — concave
    rings decompose into ear-clipped triangles (geomops.triangulate_ring),
    which is exact for every overlay mode: difference folds over the parts
    and intersection parts have disjoint interiors."""
    rows = method.select(mid_col, "geom").collect()
    mids, parts, envs = [], [], []
    for r in rows:
        g = wkb.decode(bytes(r.geom))
        polys = g.polygons()
        if len(polys) != 1 or len(polys[0]) != 1:
            raise ValueError(
                "method geometries must be single rings without holes")
        ring = polys[0][0]
        mids.append(int(r[mid_col]))
        parts.append([ring] if geomops.is_convex_ring(ring)
                     else geomops.triangulate_ring(ring))
        envs.append(g.envelope())
    return mids, parts, np.array(envs, dtype=np.float64).reshape(-1, 4)


def overlay(subject: DataFrame, method: DataFrame, mode: str,
            mid_col: str = "mid") -> DataFrame:
    """Overlay `subject` (any DF with a `geom` WKB column) against a small
    `method` layer (mid_col + geom; simple rings, concave allowed). Returns subject columns with
    `geom` replaced by the result piece, plus `mid_col` (NULL where the
    contract says so). Distribution: map-only over subject — no shuffle."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}")
    mids, rings, envs = _method_rows(method, mid_col)
    bc = subject.sparkSession.sparkContext.broadcast((mids, rings, envs))

    subj_fields = [f for f in subject.schema.fields if f.name != "geom"]
    out_schema = T.StructType(
        subj_fields + [T.StructField(mid_col, T.LongType()),
                       T.StructField("geom", T.BinaryType())])
    subj_cols = [f.name for f in subj_fields]
    want_pairs = mode in ("intersection", "identity")
    want_clip = mode == "clip"
    want_rest = mode in ("erase", "identity", "update")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m_ids, m_rings, m_envs = bc.value
        for pdf in batches:
            out = []
            geoms = pdf["geom"].values
            g_envs = geomops.envelopes(geoms)
            for i in range(len(pdf)):
                g = wkb.decode(bytes(geoms[i]))
                e = g_envs[i]
                hit = np.flatnonzero(
                    (m_envs[:, 0] <= e[2]) & (m_envs[:, 2] >= e[0])
                    & (m_envs[:, 1] <= e[3]) & (m_envs[:, 3] >= e[1]))
                attrs = tuple(pdf.iloc[i][c] for c in subj_cols)
                clip_parts = []
                rest = g
                for k in hit:
                    pieces = []
                    for conv in m_rings[k]:
                        p_ = geomops.clip_geom_convex(g, conv)
                        if p_ is not None:
                            pieces.extend(
                                p_.parts if p_.gtype == wkb.MULTIPOLYGON
                                else [p_])
                    piece = None if not pieces else (
                        pieces[0] if len(pieces) == 1
                        else wkb.Geom(wkb.MULTIPOLYGON, parts=pieces))
                    if piece is None:
                        # envelope hit but no true overlap: nothing to do
                        continue
                    if want_pairs:
                        out.append(attrs + (m_ids[k], wkb.encode(piece)))
                    if want_clip:
                        clip_parts.extend(pieces)
                    if want_rest and rest is not None:
                        for conv in m_rings[k]:
                            if rest is None:
                                break
                            rest = geomops.erase_geom_convex(rest, conv)
                if want_clip and clip_parts:
                    merged = clip_parts[0] if len(clip_parts) == 1 else \
                        wkb.Geom(wkb.MULTIPOLYGON, parts=clip_parts)
                    out.append(attrs + (None, wkb.encode(merged)))
                if want_rest and rest is not None:
                    gb = wkb.encode(rest)
                    out.append(attrs + (None, gb))
            yield pd.DataFrame(out, columns=subj_cols + ["_mid_", "geom"]) \
                .rename(columns={"_mid_": mid_col}) if out else \
                pd.DataFrame(columns=subj_cols + [mid_col, "geom"])

    res = subject.mapInPandas(run, out_schema)
    if mode == "update":
        m_side = method.select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in subj_fields],
            F.col(mid_col).cast("long"), F.col("geom"))
        res = res.unionByName(m_side)
    return res
