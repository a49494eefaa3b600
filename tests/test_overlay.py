"""Layer x layer overlay ops vs the reference's cardinality/area contracts.

Reference: OGRLayer Intersection (ogrlayer.cpp:2633), Clip (:4785), Erase
(:5094), Identity (:4018), Update (:4436). Checks are independent of the
clipping code path: partition-of-area identities and Monte-Carlo point
membership against the PIP kernel.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from gdal_spark.core import geomops, wkb
from gdal_spark.operators.overlay import overlay

BIN_SCHEMA = T.StructType([T.StructField("sid", T.LongType()),
                           T.StructField("geom", T.BinaryType())])
MID_SCHEMA = T.StructType([T.StructField("mid", T.LongType()),
                           T.StructField("geom", T.BinaryType())])


@pytest.fixture(scope="module")
def layers(spark):
    subs = [(i * 3 + j, wkb.box(i * 10.0, j * 10.0, i * 10.0 + 10,
                                j * 10.0 + 10))
            for i in range(3) for j in range(3)]
    subject = spark.createDataFrame(
        pd.DataFrame(subs, columns=["sid", "geom"]), schema=BIN_SCHEMA)
    hull1 = geomops.convex_hull(np.array(
        [[5., 5.], [22., 7.], [18., 24.], [3., 18.]]))
    hull2 = geomops.convex_hull(np.array(
        [[12., 12.], [28., 14.], [25., 28.]]))
    method = spark.createDataFrame(
        pd.DataFrame([(100, wkb.encode(wkb.Geom(wkb.POLYGON, [hull1]))),
                      (101, wkb.encode(wkb.Geom(wkb.POLYGON, [hull2])))],
                     columns=["mid", "geom"]), schema=MID_SCHEMA)
    return subject, method, [hull1, hull2]


def _area(rows):
    return sum(geomops.geom_area(wkb.decode(bytes(r.geom))) for r in rows)


def test_erase_partitions_subject(spark, layers):
    """area(subject) == area(erase) + area(subject ∩ union(methods));
    the second term comes from erasing the erase result from the subject
    implicitly: identity's NULL-mid rows ARE the erase rows."""
    subject, method, hulls = layers
    er = overlay(subject, method, "erase").collect()
    # subject ∩ union(methods) via sequential per-subject computation
    inter_area = 0.0
    for r in subject.collect():
        g = wkb.decode(bytes(r.geom))
        rest = g
        for h in hulls:
            if rest is None:
                break
            rest = geomops.erase_geom_convex(rest, h)
        rest_a = geomops.geom_area(rest) if rest else 0.0
        inter_area += geomops.geom_area(g) - rest_a
    assert _area(er) + inter_area == pytest.approx(900.0, abs=1e-6)


def test_identity_is_pairs_plus_erase(spark, layers):
    subject, method, _ = layers
    ident = overlay(subject, method, "identity").collect()
    pairs = overlay(subject, method, "intersection").collect()
    erase = overlay(subject, method, "erase").collect()
    assert len(ident) == len(pairs) + len(erase)
    assert _area(ident) == pytest.approx(_area(pairs) + _area(erase), 1e-9)
    assert sum(1 for r in ident if r.mid is None) == len(erase)


def test_update_covers_subject_and_method(spark, layers):
    subject, method, hulls = layers
    upd = overlay(subject, method, "update").collect()
    m_area = sum(abs(geomops.ring_area(h)) for h in hulls)
    # method hulls overlap each other: union < sum; update keeps method rows
    # verbatim (both), so total = erase + sum(method areas)
    erase = overlay(subject, method, "erase").collect()
    assert _area(upd) == pytest.approx(_area(erase) + m_area, 1e-9)
    assert sum(1 for r in upd if r.sid is None) == 2


def test_membership_sampling(spark, layers):
    """Random points classify identically under (subject, hulls) membership
    and under the overlay outputs — the geometry pieces are spatially
    exact, not just area-consistent."""
    subject, method, hulls = layers
    pairs = overlay(subject, method, "intersection").collect()
    rng = np.random.default_rng(4)
    px = rng.uniform(-2, 32, 800)
    py = rng.uniform(-2, 32, 800)
    in_subj = np.zeros(800, bool)
    for r in subject.collect():
        in_subj |= geomops.points_in_geom(px, py, wkb.decode(bytes(r.geom)))
    got = np.zeros(800, bool)
    for r in pairs:
        got |= geomops.points_in_geom(px, py, wkb.decode(bytes(r.geom)))
    want = in_subj.copy()
    hit_any = np.zeros(800, bool)
    for h in hulls:
        hull_geom = wkb.Geom(wkb.POLYGON, [h])
        hit_any |= geomops.points_in_geom(px, py, hull_geom)
    want &= hit_any
    # tolerate ulp-boundary disagreements only
    assert (got != want).sum() <= 2


def test_concave_method_polygon(spark, layers):
    """Concave (L-shaped) method polygon: triangulated internally; the
    partition property area(int)+area(erase)=area(subject) and point
    membership must hold exactly as for convex methods."""
    subject, _, _ = layers
    l_ring = np.array([[2.0, 2.0], [26.0, 2.0], [26.0, 10.0], [10.0, 10.0],
                       [10.0, 26.0], [2.0, 26.0], [2.0, 2.0]])
    assert not geomops.is_convex_ring(l_ring)
    method = spark.createDataFrame(
        pd.DataFrame([(300, wkb.encode(wkb.Geom(wkb.POLYGON, [l_ring])))],
                     columns=["mid", "geom"]), schema=MID_SCHEMA)
    inter = overlay(subject, method, "intersection").collect()
    erase = overlay(subject, method, "erase").collect()
    assert _area(inter) + _area(erase) == pytest.approx(900.0, abs=1e-6)
    # membership sampling against the L-shape
    rng = np.random.default_rng(7)
    px = rng.uniform(-1, 31, 600)
    py = rng.uniform(-1, 31, 600)
    lgeom = wkb.Geom(wkb.POLYGON, [l_ring])
    in_subj = np.zeros(600, bool)
    for r in subject.collect():
        in_subj |= geomops.points_in_geom(px, py, wkb.decode(bytes(r.geom)))
    in_l = geomops.points_in_geom(px, py, lgeom)
    got_i = np.zeros(600, bool)
    for r in inter:
        got_i |= geomops.points_in_geom(px, py, wkb.decode(bytes(r.geom)))
    got_e = np.zeros(600, bool)
    for r in erase:
        got_e |= geomops.points_in_geom(px, py, wkb.decode(bytes(r.geom)))
    assert (got_i != (in_subj & in_l)).sum() <= 3    # ulp/edge slack
    assert (got_e != (in_subj & ~in_l)).sum() <= 3


def test_union_mode(spark, layers):
    """Union = intersection pairs + subject leftovers + method leftovers
    (ogrlayer.cpp:3051). Total area must equal area(subject ∪ methods) +
    area(subject ∩ methods) (pairs double-cover the intersection when
    methods overlap; with these hulls overlapping each other the pair rows
    cover subject∩each-method separately)."""
    subject, method, hulls = layers
    uni = overlay(subject, method, "union").collect()
    pairs = overlay(subject, method, "intersection").collect()
    erase = overlay(subject, method, "erase").collect()
    rev_rows = [r for r in uni if r.sid is None]
    # row-count contract
    assert len(uni) == len(pairs) + len(erase) + len(rev_rows)
    # reverse side: method \ union(subjects). Hulls are inside [0,30]^2 which
    # the 9 subject tiles fully cover -> method leftovers must be empty.
    assert len(rev_rows) == 0
    assert _area(uni) == pytest.approx(_area(pairs) + _area(erase), 1e-9)


def test_union_mode_method_outside(spark, layers):
    """A method rect partially outside the subject tiles: union keeps the
    outside part as a NULL-subject row with exactly the leftover area."""
    subject, _, _ = layers
    method = spark.createDataFrame(
        pd.DataFrame([(500, wkb.box(25.0, 25.0, 40.0, 40.0))],
                     columns=["mid", "geom"]), schema=MID_SCHEMA)
    uni = overlay(subject, method, "union").collect()
    rev = [r for r in uni if r.sid is None]
    assert len(rev) == 1
    # leftover = 15x15 rect minus the [25,30]^2 corner inside tile (2,2)
    assert geomops.geom_area(wkb.decode(bytes(rev[0].geom))) == \
        pytest.approx(225.0 - 25.0, abs=1e-6)
    # total union area = area(subject) + area(method outside subject)
    total = _area(uni)
    pairs = [r for r in uni if r.sid is not None and r.mid is not None]
    # pairs cover subject∩method once; subject-leftover covers the rest of
    # the subject; so total = 900 + 200 (outside) + 0 double cover
    assert total == pytest.approx(900.0 + 200.0, abs=1e-6)


def test_symdifference_mode(spark, layers):
    subject, _, _ = layers
    method = spark.createDataFrame(
        pd.DataFrame([(600, wkb.box(25.0, 25.0, 40.0, 40.0))],
                     columns=["mid", "geom"]), schema=MID_SCHEMA)
    sym = overlay(subject, method, "symdifference").collect()
    # no pair rows in symdifference
    assert all((r.sid is None) != (r.mid is None) for r in sym)
    # area = area(subject \ method) + area(method \ subject)
    assert _area(sym) == pytest.approx((900.0 - 25.0) + 200.0, abs=1e-6)


def test_method_polygon_with_hole(spark, layers):
    """Method polygon with a hole — previously rejected, now served by the
    general boolean kernel. Partition identity + membership sampling."""
    subject, _, _ = layers
    ring = [(5.0, 5.0), (25.0, 5.0), (25.0, 25.0), (5.0, 25.0)]
    hole = [(10.0, 10.0), (20.0, 10.0), (20.0, 20.0), (10.0, 20.0)]
    method = spark.createDataFrame(
        pd.DataFrame([(700, wkb.polygon(ring, holes=[hole]))],
                     columns=["mid", "geom"]), schema=MID_SCHEMA)
    inter = overlay(subject, method, "intersection").collect()
    erase = overlay(subject, method, "erase").collect()
    assert _area(inter) == pytest.approx(400.0 - 100.0, abs=1e-6)
    assert _area(inter) + _area(erase) == pytest.approx(900.0, abs=1e-6)
    # membership: the hole must NOT be claimed by intersection pieces
    rng = np.random.default_rng(11)
    px = rng.uniform(11, 19, 200)
    py = rng.uniform(11, 19, 200)
    got = np.zeros(200, bool)
    for r in inter:
        got |= geomops.points_in_geom(px, py, wkb.decode(bytes(r.geom)))
    assert not got.any()


@pytest.mark.parametrize("mode", ["intersection", "union", "symdifference",
                                  "identity", "erase", "clip", "update"])
def test_overlay_join_matches_broadcast_path(spark, layers, mode):
    """The big x big shuffle overlay (cell cover + equi-join + per-key
    difference folds, NO driver collect) must reproduce the broadcast
    path's (sid, mid, area) multiset for every mode."""
    from gdal_spark.operators.overlay import overlay_join
    subject, method, _ = layers

    def norm(rows, sid_name):
        out = []
        for r in rows:
            a = geomops.geom_area(wkb.decode(bytes(r.geom))) \
                if r.geom is not None else 0.0
            out.append((getattr(r, sid_name), r.mid, round(a, 6)))
        return sorted(out, key=lambda t: (str(t[0]), str(t[1]), t[2]))

    want = norm(overlay(subject, method, mode).collect(), "sid")
    got = norm(overlay_join(subject, method, mode, cell_size=8.0,
                            sid_col="sid").collect(), "sid")
    assert got == want


def test_overlay_join_build_is_lazy(spark, layers):
    """No driver collect: constructing the shuffle-overlay plan launches
    zero Spark jobs (the broadcast path's _method_rows collect is exactly
    what this variant exists to avoid)."""
    from gdal_spark.operators.overlay import overlay_join
    subject, method, _ = layers
    sc = spark.sparkSession.sparkContext if hasattr(spark, "sparkSession") \
        else spark.sparkContext
    group = "overlay-join-lazy"
    sc.setJobGroup(group, "build only")
    try:
        df = overlay_join(subject, method, "union", cell_size=8.0,
                          sid_col="sid")
        _ = df.columns
    finally:
        sc.setJobGroup("other", "done")
    assert sc.statusTracker().getJobIdsForGroup(group) == []
