"""Layer x layer spatial overlay: Intersection, Union, SymDifference,
Identity, Update, Clip, Erase — the full OGRLayer overlay family.

Re-expresses OGRLayer's overlay ops (/root/reference/ogr/ogrsf_frmts/
generic/ogrlayer.cpp — Intersection :2633, Union :3051, SymDifference :3588,
Identity :4018, Update :4436, Clip :4785, Erase :5094; inner per-feature
algorithm :2695-2830: envelope skip -> SetSpatialFilter on the method layer
-> prepared-geometry pretest -> exact GEOS op) as Spark stages:

  * the method layer is COLLECTED and broadcast (one decode per worker) —
    the same small-side assumption OGR makes by re-filtering the method
    layer per feature;
  * each subject Arrow batch prefilters method candidates with a vectorized
    envelope intersect (the :2695 envelope skip), then applies the exact
    numpy kernel: Sutherland–Hodgman / wedge decomposition when the method
    polygon is a single convex ring (the fast path), the general
    slab-decomposition boolean (core.polyclip.geom_boolean) otherwise —
    concave method polygons, holes and multipolygons are all supported;
  * Union / SymDifference additionally need the REVERSE leftovers
    (method \\ union(subjects), ogrlayer.cpp:3139/:3641): subjects hitting
    each method shuffle BY METHOD ID (a bounded-by-selectivity shuffle) and
    fold a difference per method id in applyInPandas.

Cardinality contracts (matching the reference):
  intersection  one row per intersecting (subject, method) pair,
                attrs of both sides (ogrlayer.cpp:2766-2830)
  union         intersection pairs + subject \\ union(methods) with NULL
                method attrs + method \\ union(subjects) with NULL subject
                attrs (ogrlayer.cpp:3051)
  symdifference subject \\ union(methods) + method \\ union(subjects)
                (ogrlayer.cpp:3588)
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

from ..core import geomops, polyclip, wkb

_MODES = ("intersection", "union", "symdifference", "clip", "erase",
          "identity", "update")


def _method_rows(method: DataFrame, mid_col: str):
    """Collect the method layer as (mid, kernel, envelope).

    kernel is ("convex", ring) for a single convex ring — served by the
    half-plane fast path — or ("general", Geom) for anything else (concave,
    holes, multipolygon), served by the slab-decomposition boolean kernel.
    """
    rows = method.select(mid_col, "geom").collect()
    mids, kernels, envs = [], [], []
    for r in rows:
        g = wkb.decode(bytes(r.geom))
        polys = g.polygons()
        mids.append(int(r[mid_col]))
        if len(polys) == 1 and len(polys[0]) == 1 \
                and geomops.is_convex_ring(polys[0][0]):
            kernels.append(("convex", polys[0][0]))
        else:
            kernels.append(("general", g))
        envs.append(g.envelope())
    return mids, kernels, np.array(envs, dtype=np.float64).reshape(-1, 4)


def _clip_one(g, kernel):
    """subject ∩ one method geometry -> Geom or None."""
    kind, m = kernel
    if kind == "convex":
        return geomops.clip_geom_convex(g, m)
    return polyclip.geom_boolean(g, m, "intersection")


def _erase_one(g, kernel):
    """subject \\ one method geometry -> Geom or None."""
    if g is None:
        return None
    kind, m = kernel
    if kind == "convex":
        return geomops.erase_geom_convex(g, m)
    return polyclip.geom_boolean(g, m, "difference")


def _flatten(piece):
    if piece is None:
        return []
    return piece.parts if piece.gtype == wkb.MULTIPOLYGON else [piece]


def overlay(subject: DataFrame, method: DataFrame, mode: str,
            mid_col: str = "mid") -> DataFrame:
    """Overlay `subject` (any DF with a `geom` WKB column) against a small
    `method` layer (mid_col + geom; any polygonal geometry — concave, holes
    and multipolygons included). Returns subject columns with `geom`
    replaced by the result piece, plus `mid_col` (NULL where the contract
    says so). Distribution: map-only over subject except union/symdifference,
    which add one selectivity-bounded shuffle for the reverse leftovers."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}")
    mids, kernels, envs = _method_rows(method, mid_col)
    bc = subject.sparkSession.sparkContext.broadcast((mids, kernels, envs))

    subj_fields = [f for f in subject.schema.fields if f.name != "geom"]
    out_schema = T.StructType(
        subj_fields + [T.StructField(mid_col, T.LongType()),
                       T.StructField("geom", T.BinaryType())])
    subj_cols = [f.name for f in subj_fields]
    want_pairs = mode in ("intersection", "identity", "union")
    want_clip = mode == "clip"
    want_rest = mode in ("erase", "identity", "update", "union",
                         "symdifference")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m_ids, m_kernels, m_envs = bc.value
        for pdf in batches:
            out = []
            geoms = pdf["geom"].values
            g_envs = geomops.envelopes(geoms)
            attr_arrays = [pdf[c].values for c in subj_cols]
            for i in range(len(pdf)):
                g = wkb.decode(bytes(geoms[i]))
                e = g_envs[i]
                hit = np.flatnonzero(
                    (m_envs[:, 0] <= e[2]) & (m_envs[:, 2] >= e[0])
                    & (m_envs[:, 1] <= e[3]) & (m_envs[:, 3] >= e[1]))
                attrs = tuple(a[i] for a in attr_arrays)
                clip_parts = []
                rest = g
                for k in hit:
                    piece = _clip_one(g, m_kernels[k])
                    if piece is not None and want_pairs:
                        out.append(attrs + (m_ids[k], wkb.encode(piece)))
                    if piece is not None and want_clip:
                        clip_parts.extend(_flatten(piece))
                    if want_rest and rest is not None:
                        rest = _erase_one(rest, m_kernels[k])
                if want_clip and clip_parts:
                    merged = clip_parts[0] if len(clip_parts) == 1 else \
                        wkb.Geom(wkb.MULTIPOLYGON, parts=clip_parts)
                    out.append(attrs + (None, wkb.encode(merged)))
                if want_rest and rest is not None:
                    out.append(attrs + (None, wkb.encode(rest)))
            yield pd.DataFrame(out, columns=subj_cols + ["_mid_", "geom"]) \
                .rename(columns={"_mid_": mid_col}) if out else \
                pd.DataFrame(columns=subj_cols + [mid_col, "geom"])

    res = subject.mapInPandas(run, out_schema)

    if mode == "update":
        m_side = method.select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in subj_fields],
            F.col(mid_col).cast("long"), F.col("geom"))
        res = res.unionByName(m_side)

    if mode in ("union", "symdifference"):
        res = res.unionByName(
            _reverse_leftovers(subject, method, mid_col, bc, subj_fields))
    return res


def _reverse_leftovers(subject: DataFrame, method: DataFrame, mid_col: str,
                       bc, subj_fields) -> DataFrame:
    """method \\ union(subjects): the Union/SymDifference reverse side
    (ogrlayer.cpp:3139 pass 2). Subjects whose envelope hits a method
    shuffle by method id (extra non-intersecting subjects are harmless —
    difference by a disjoint geometry is identity), then one applyInPandas
    folds the difference per method."""
    pair_schema = T.StructType([T.StructField("_mid", T.LongType()),
                                T.StructField("_sgeom", T.BinaryType())])

    def emit_hits(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m_ids, _k, m_envs = bc.value
        for pdf in batches:
            geoms = pdf["geom"].values
            g_envs = geomops.envelopes(geoms)
            out_mid, out_geom = [], []
            for i in range(len(pdf)):
                e = g_envs[i]
                hit = np.flatnonzero(
                    (m_envs[:, 0] <= e[2]) & (m_envs[:, 2] >= e[0])
                    & (m_envs[:, 1] <= e[3]) & (m_envs[:, 3] >= e[1]))
                for k in hit:
                    out_mid.append(m_ids[k])
                    out_geom.append(geoms[i])
            yield pd.DataFrame({"_mid": pd.Series(out_mid, dtype="int64"),
                                "_sgeom": pd.Series(out_geom,
                                                    dtype="object")})

    hits = subject.select("geom").mapInPandas(emit_hits, pair_schema)

    fold_schema = T.StructType([T.StructField("_mid", T.LongType()),
                                T.StructField("geom", T.BinaryType())])

    def fold(key, pdf: pd.DataFrame) -> pd.DataFrame:
        m_ids, m_kernels, _e = bc.value
        mid = int(key[0])
        k = m_ids.index(mid)
        kind, m = m_kernels[k]
        g = m if kind == "general" else wkb.Geom(
            wkb.POLYGON, [np.asarray(m, dtype=np.float64)])
        for sb in pdf["_sgeom"].values:
            g = polyclip.geom_boolean(g, wkb.decode(bytes(sb)), "difference")
            if g is None:
                break
        if g is None:
            return pd.DataFrame(columns=["_mid", "geom"])
        return pd.DataFrame([(mid, wkb.encode(g))], columns=["_mid", "geom"])

    reduced = hits.groupBy("_mid").applyInPandas(fold, fold_schema)
    untouched = (method.select(F.col(mid_col).cast("long").alias("_mid"),
                               "geom")
                 .join(hits.select("_mid").distinct(), "_mid", "left_anti"))
    rev = reduced.unionByName(untouched)
    null_subj = [F.lit(None).cast(f.dataType).alias(f.name)
                 for f in subj_fields]
    return rev.select(*null_subj, F.col("_mid").alias(mid_col),
                      F.col("geom"))
