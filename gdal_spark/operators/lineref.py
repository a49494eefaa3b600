"""Linear referencing — ogrlineref twin (apps/ogrlineref.cpp).

The reference app does three jobs against a reference polyline: -create
mileposts/parts at a distance step, -get_pos (milepost distance of a
projected point) and -get_coord (point at distance m). All three are
closed-form segment math, vectorized here over numpy arrays:

  * the polyline's per-segment direction vectors and cumulative lengths
    are precomputed ONCE and broadcast (tiny);
  * a batch of points projects onto every segment in one (n_pts, n_segs)
    vector op, takes the argmin distance, and reads the milepost as
    cum_len[seg] + t * seg_len — no per-point Python;
  * the Spark surface is a mapInPandas over the points table: map-only,
    no shuffle, so positioning a trillion points is scan-speed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F, types as T


def _segments(line: np.ndarray):
    p0 = line[:-1]
    d = line[1:] - p0
    seg_len = np.hypot(d[:, 0], d[:, 1])
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    return p0, d, seg_len, cum


def locate_points(line: np.ndarray, px: np.ndarray, py: np.ndarray):
    """-> (m, dist): milepost distance along `line` of each projected
    point + its offset distance. Vectorized (n_pts x n_segs)."""
    p0, d, seg_len, cum = _segments(np.asarray(line, np.float64))
    px = np.asarray(px, np.float64)[:, None]
    py = np.asarray(py, np.float64)[:, None]
    wx = px - p0[None, :, 0]
    wy = py - p0[None, :, 1]
    denom = np.where(seg_len > 0, seg_len ** 2, 1.0)
    t = np.clip((wx * d[None, :, 0] + wy * d[None, :, 1]) / denom, 0.0, 1.0)
    cx = p0[None, :, 0] + t * d[None, :, 0]
    cy = p0[None, :, 1] + t * d[None, :, 1]
    dist = np.hypot(px - cx, py - cy)
    best = np.argmin(dist, axis=1)
    rows = np.arange(len(best))
    m = cum[best] + t[rows, best] * seg_len[best]
    return m, dist[rows, best]


def interpolate_point(line: np.ndarray, m):
    """-> (x, y) at milepost distance m (clamped to the line's length)."""
    p0, d, seg_len, cum = _segments(np.asarray(line, np.float64))
    m = np.clip(np.asarray(m, np.float64), 0.0, cum[-1])
    seg = np.clip(np.searchsorted(cum, m, side="right") - 1, 0,
                  len(seg_len) - 1)
    t = np.where(seg_len[seg] > 0, (m - cum[seg]) / seg_len[seg], 0.0)
    return p0[seg, 0] + t * d[seg, 0], p0[seg, 1] + t * d[seg, 1]


def create_parts(line: np.ndarray, step: float):
    """ogrlineref -create: split the polyline into parts of length
    `step` -> list of (m0, m1, coords array) — part boundaries fall at
    exact mileposts, inserting interpolated vertices."""
    p0, d, seg_len, cum = _segments(np.asarray(line, np.float64))
    total = cum[-1]
    cuts = np.arange(0.0, total, step)
    parts = []
    for m0 in cuts:
        m1 = min(m0 + step, total)
        xs0, ys0 = interpolate_point(line, [m0])
        xs1, ys1 = interpolate_point(line, [m1])
        inner = [(x, y) for m, (x, y) in zip(cum, line)
                 if m0 < m < m1]
        coords = np.array([(xs0[0], ys0[0])] + inner + [(xs1[0], ys1[0])])
        parts.append((float(m0), float(m1), coords))
    return parts


def locate_points_df(points: DataFrame, line: np.ndarray,
                     x_col: str = "x", y_col: str = "y") -> DataFrame:
    """ogrlineref -get_pos over a points DataFrame: adds (mpos, offset).
    Map-only mapInPandas; the polyline ships in the closure (tiny)."""
    import pandas as pd

    fields = list(points.schema.fields)
    schema = T.StructType(fields + [T.StructField("mpos", T.DoubleType()),
                                    T.StructField("offset", T.DoubleType())])
    cols = points.columns
    arr = np.asarray(line, np.float64)

    def run(batches):
        for pdf in batches:
            m, off = locate_points(arr, pdf[x_col].to_numpy(),
                                   pdf[y_col].to_numpy())
            pdf = pdf.copy()
            pdf["mpos"] = m
            pdf["offset"] = off
            yield pdf

    return points.mapInPandas(run, schema)
