"""Delaunay triangulation in pure numpy — Bowyer–Watson incremental
insertion with vectorized circumcircle tests.

Backs gdal_grid's `linear` algorithm (/root/reference/alg/gdalgrid.cpp
GDALGridLinear via alg/delaunay.c, which wraps qhull) and
OGRGeometry::DelaunayTriangulation (ogrgeometry.cpp:6704). qhull is not
available here; Bowyer–Watson is the classical public algorithm. The
per-insertion work is whole-array numpy (one circumcircle test over all
live triangles), so the Python loop is only over input points — the right
trade for the per-block point counts the distributed gridding feeds it.
"""

from __future__ import annotations

import numpy as np


def _circumcircles(pts: np.ndarray, tris: np.ndarray):
    """(centers (m,2), r2 (m,)) of triangles given as vertex index rows."""
    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    ab = b - a
    ac = c - a
    d = 2.0 * (ab[:, 0] * ac[:, 1] - ab[:, 1] * ac[:, 0])
    with np.errstate(divide="ignore", invalid="ignore"):
        ux = (ac[:, 1] * (ab ** 2).sum(1) - ab[:, 1] * (ac ** 2).sum(1)) / d
        uy = (ab[:, 0] * (ac ** 2).sum(1) - ac[:, 0] * (ab ** 2).sum(1)) / d
    ctr = a + np.stack([ux, uy], axis=1)
    r2 = ((ctr - a) ** 2).sum(1)
    # degenerate (collinear) triangles: kill them on the next insertion
    bad = ~np.isfinite(r2)
    r2 = np.where(bad, np.inf, r2)
    return ctr, r2


def delaunay(points: np.ndarray) -> np.ndarray:
    """(n,2) float64 -> (m,3) int32 triangle vertex indices (CCW).

    Duplicate points are collapsed before triangulating; returned indices
    refer to the ORIGINAL array (first occurrence wins)."""
    points = np.asarray(points, dtype=np.float64)
    n = len(points)
    if n < 3:
        return np.empty((0, 3), dtype=np.int32)
    _, first_idx = np.unique(points, axis=0, return_index=True)
    order = np.sort(first_idx)
    pts = points[order]
    m = len(pts)
    if m < 3:
        return np.empty((0, 3), dtype=np.int32)

    cmin = pts.min(axis=0)
    cmax = pts.max(axis=0)
    cc = 0.5 * (cmin + cmax)
    span = max(float((cmax - cmin).max()), 1.0) * 64.0
    sup = np.array([[cc[0] - span, cc[1] - span],
                    [cc[0] + span, cc[1] - span],
                    [cc[0], cc[1] + span]])
    allp = np.vstack([pts, sup])

    tris = np.array([[m, m + 1, m + 2]], dtype=np.int64)
    ctrs, r2s = _circumcircles(allp, tris)

    for i in range(m):
        p = allp[i]
        d2 = ((ctrs - p) ** 2).sum(1)
        bad = d2 < r2s
        if not bad.any():
            # numerically outside every circumcircle (shouldn't happen with
            # the super-triangle) — skip defensively
            continue
        bad_tris = tris[bad]
        # boundary = edges appearing exactly once among the bad triangles
        e = np.concatenate([bad_tris[:, [0, 1]], bad_tris[:, [1, 2]],
                            bad_tris[:, [2, 0]]])
        ekey = np.sort(e, axis=1)
        _, inv, counts = np.unique(ekey, axis=0, return_inverse=True,
                                   return_counts=True)
        boundary = e[counts[inv] == 1]
        new = np.column_stack([boundary,
                               np.full(len(boundary), i, dtype=np.int64)])
        tris = np.concatenate([tris[~bad], new])
        nctr, nr2 = _circumcircles(allp, new)
        ctrs = np.concatenate([ctrs[~bad], nctr])
        r2s = np.concatenate([r2s[~bad], nr2])

    keep = (tris < m).all(axis=1)
    tris = tris[keep]
    # orient CCW and map back to original indices
    a = allp[tris[:, 0]]
    b = allp[tris[:, 1]]
    c = allp[tris[:, 2]]
    cw = ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
          - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])) < 0
    tris[cw] = tris[cw][:, ::-1]
    return order[tris].astype(np.int32)


def interpolate_linear(points: np.ndarray, values: np.ndarray,
                       qx: np.ndarray, qy: np.ndarray,
                       fill: float = np.nan) -> np.ndarray:
    """Barycentric interpolation of scattered (points, values) at query
    locations — gdal_grid linear (alg/gdalgrid.cpp GDALGridLinear):
    triangulate once, then every query inside a triangle blends its three
    corners; queries outside the hull get `fill`."""
    out = np.full(qx.shape, fill, dtype=np.float64)
    tris = delaunay(points)
    if not len(tris):
        return out
    qxf = qx.ravel()
    qyf = qy.ravel()
    of = out.ravel()
    done = np.zeros(len(qxf), dtype=bool)
    for t in tris:
        ax, ay = points[t[0]]
        bx, by = points[t[1]]
        cx, cy = points[t[2]]
        xmin, xmax = min(ax, bx, cx), max(ax, bx, cx)
        ymin, ymax = min(ay, by, cy), max(ay, by, cy)
        cand = np.flatnonzero(~done & (qxf >= xmin) & (qxf <= xmax)
                              & (qyf >= ymin) & (qyf <= ymax))
        if not len(cand):
            continue
        det = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        if det == 0:
            continue
        l1 = ((by - cy) * (qxf[cand] - cx)
              + (cx - bx) * (qyf[cand] - cy)) / det
        l2 = ((cy - ay) * (qxf[cand] - cx)
              + (ax - cx) * (qyf[cand] - cy)) / det
        l3 = 1.0 - l1 - l2
        eps = -1e-12
        inside = (l1 >= eps) & (l2 >= eps) & (l3 >= eps)
        sel = cand[inside]
        of[sel] = (l1[inside] * values[t[0]] + l2[inside] * values[t[1]]
                   + l3[inside] * values[t[2]])
        done[sel] = True
    return of.reshape(qx.shape)


def voronoi_cells(sites: np.ndarray,
                  bounds: tuple[float, float, float, float]
                  ) -> list[np.ndarray]:
    """Voronoi polygons of ``sites`` (n,2) clipped to the rectangle
    ``bounds`` = (xmin, ymin, xmax, ymax) -> list of closed CCW rings,
    one per site (in input order).

    Construction: the Voronoi cell of a site is exactly the intersection
    of the half-planes bounded by the perpendicular bisectors toward its
    DELAUNAY neighbors (the classical duality — Aurenhammer 1991, §2.2),
    so each cell is cut from the clip rectangle by Sutherland–Hodgman
    clipping against those bisectors. Co-circular degeneracies are safe:
    whichever diagonal the triangulation picked, the missing bisector is
    redundant for the closed cell. Collinear inputs (no triangles) fall
    back to all-pairs bisectors. The reference exposes this surface as
    ST_VoronojDiagram through its SQLite/Spatialite dialect
    (ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp delegates to
    GEOSVoronoiDiagram); GDAL itself ships the Delaunay half
    (ogrgeometry.cpp:6704)."""
    sites = np.asarray(sites, dtype=np.float64)
    n = len(sites)
    xmin, ymin, xmax, ymax = (float(v) for v in bounds)
    rect = np.array([[xmin, ymin], [xmax, ymin],
                     [xmax, ymax], [xmin, ymax]])
    tris = delaunay(sites)
    nbrs: list[set] = [set() for _ in range(n)]
    if len(tris):
        for a, b, c in tris:
            nbrs[a].update((b, c))
            nbrs[b].update((a, c))
            nbrs[c].update((a, b))
    else:
        for i in range(n):
            nbrs[i] = set(range(n)) - {i}

    def _clip_halfplane(poly: np.ndarray, si: np.ndarray,
                        sj: np.ndarray) -> np.ndarray:
        """Keep the side of bisector(si, sj) closer to si."""
        d = sj - si
        m = 0.5 * (si + sj)
        # inside: (p - m) . d <= 0
        val = (poly - m) @ d
        out = []
        k = len(poly)
        for t in range(k):
            a, b = poly[t], poly[(t + 1) % k]
            va, vb = val[t], val[(t + 1) % k]
            if va <= 0.0:
                out.append(a)
            if (va < 0.0) != (vb < 0.0) and va != vb:
                s = va / (va - vb)
                out.append(a + s * (b - a))
        return np.asarray(out) if out else np.empty((0, 2))

    cells = []
    for i in range(n):
        poly = rect
        for j in sorted(nbrs[i]):
            poly = _clip_halfplane(poly, sites[i], sites[j])
            if not len(poly):
                break
        if len(poly) >= 3:
            ring = np.vstack([poly, poly[:1]])
        else:
            ring = np.empty((0, 2))
        cells.append(ring)
    return cells


def concave_hull(points: np.ndarray, max_edge: float) -> np.ndarray:
    """Chi-shape concave hull (the classic Delaunay-carving construction
    behind OGRGeometry::ConcaveHull, ogrgeometry.cpp:4305): start from the
    Delaunay triangulation and repeatedly remove the boundary triangle
    whose exposed edge is longest (> max_edge), as long as removal keeps
    the boundary a simple ring. Returns a closed ring (n,2)."""
    points = np.asarray(points, dtype=np.float64)
    tris = {tuple(t) for t in delaunay(points).tolist()}
    if not tris:
        ring = points[np.lexsort((points[:, 1], points[:, 0]))]
        return np.vstack([ring, ring[:1]]) if len(ring) else ring

    def edges_of(t):
        return [tuple(sorted((t[0], t[1]))), tuple(sorted((t[1], t[2]))),
                tuple(sorted((t[2], t[0])))]

    edge_tris: dict = {}
    for t in tris:
        for e in edges_of(t):
            edge_tris.setdefault(e, set()).add(t)

    def elen(e):
        return float(np.hypot(*(points[e[0]] - points[e[1]])))

    import heapq
    heap = [(-elen(e), e) for e, ts in edge_tris.items() if len(ts) == 1]
    heapq.heapify(heap)
    # bcount[v] = number of live boundary edges incident to v, maintained
    # incrementally per removal — a vertex is on the boundary iff > 0.
    # (Replaces the former full-edge rescan per pop, which made carving
    # quadratic in the edge count.)
    bcount = np.zeros(len(points), dtype=np.int64)
    for eo, tso in edge_tris.items():
        if len(tso) == 1:
            bcount[eo[0]] += 1
            bcount[eo[1]] += 1
    while heap:
        neg, e = heapq.heappop(heap)
        if -neg <= max_edge:
            break
        ts = edge_tris.get(e, set()) & tris
        if len(ts) != 1:
            continue                       # stale entry
        (t,) = ts
        opp = [v for v in t if v not in e][0]
        # removal keeps the boundary simple iff the opposite vertex is
        # interior (not already on the boundary)
        if bcount[opp] > 0:
            continue
        if len(tris) <= 1:
            break
        tris.discard(t)
        bcount[e[0]] -= 1                  # e leaves the boundary
        bcount[e[1]] -= 1
        for eo in edges_of(t):
            if eo == e:
                continue
            live = len(edge_tris.get(eo, set()) & tris)
            if live == 1:                  # interior edge became boundary
                bcount[eo[0]] += 1
                bcount[eo[1]] += 1
                heapq.heappush(heap, (-elen(eo), eo))
            elif live == 0:                # was already boundary, now gone
                bcount[eo[0]] -= 1
                bcount[eo[1]] -= 1
    # assemble the boundary ring
    nbr: dict = {}
    for e, ts in edge_tris.items():
        if len(ts & tris) == 1:
            nbr.setdefault(e[0], []).append(e[1])
            nbr.setdefault(e[1], []).append(e[0])
    if not nbr:
        ring = points[np.lexsort((points[:, 1], points[:, 0]))]
        return np.vstack([ring, ring[:1]])
    start = min(nbr)
    ring_idx = [start]
    prev = None
    cur = start
    for _ in range(2 * len(nbr) + 2):
        nxts = [v for v in nbr[cur] if v != prev]
        nxt = nxts[0] if nxts else nbr[cur][0]
        ring_idx.append(nxt)
        prev, cur = cur, nxt
        if cur == start:
            break
    ring = points[ring_idx]
    # orient CCW
    x, y = ring[:, 0], ring[:, 1]
    if 0.5 * (np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1])) < 0:
        ring = ring[::-1]
    return ring
