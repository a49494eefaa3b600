"""Geohash cell encoding: public test vectors, decode bounds, Column/numpy
agreement, and the ST_GeoHash SQL registration."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.core import tilemath as tm


def test_public_vectors():
    # the two canonical published examples (Niemeyer / Wikipedia)
    assert tm.geohash_np([-5.6], [42.6], 5)[0] == "ezs42"
    assert tm.geohash_np([10.40744], [57.64911], 11)[0] == "u4pruydqqvj"
    # EVEN precisions (5p even swaps the interleave lanes): pin publicly
    # known values, not a self-consistent roundtrip
    assert tm.geohash_np([-5.6], [42.6], 4)[0] == "ezs4"
    assert tm.geohash_np([10.40744], [57.64911], 12)[0] == "u4pruydqqvj8"
    assert tm.geohash_np([10.40744], [57.64911], 2)[0] == "u4"
    # prefix property across ALL precisions 1..12 against the p=12 hash
    g12 = tm.geohash_np([10.40744], [57.64911], 12)[0]
    for p in range(1, 13):
        assert tm.geohash_np([10.40744], [57.64911], p)[0] == g12[:p]
    # prefix property on random points too
    rng = np.random.RandomState(3)
    lon = rng.uniform(-180, 180, 50)
    lat = rng.uniform(-90, 90, 50)
    full = tm.geohash_np(lon, lat, 12)
    for p in range(1, 12):
        assert (tm.geohash_np(lon, lat, p)
                == np.array([g[:p] for g in full])).all()


def test_decode_bounds_contain_input():
    rng = np.random.RandomState(7)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    gh = tm.geohash_np(lon, lat, 8)
    lo, la, hi, ha = tm.geohash_decode_np(gh)
    assert (lo <= lon).all() and (lon < hi).all()
    assert (la <= lat).all() and (lat < ha).all()
    # cell sizes: 8 chars = 40 bits -> lon 20, lat 20
    assert np.allclose(hi - lo, 360.0 / (1 << 20))
    assert np.allclose(ha - la, 180.0 / (1 << 20))


def test_column_matches_numpy(spark):
    rng = np.random.RandomState(11)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(lon, lat)], "lon double, lat double")
    for p in (8, 9):  # one even, one odd precision
        got = [r.gh for r in
               df.select(tm.geohash_col(F.col("lon"), F.col("lat"), p)
                         .alias("gh")).collect()]
        want = tm.geohash_np(lon, lat, p)
        assert got == list(want)


def test_st_geohash_sql(spark):
    from gdal_spark.core import wkb as wkbmod
    from gdal_spark.functions import st
    st.register_all(spark)
    pts = [(-5.6, 42.6, 5), (10.40744, 57.64911, 11),
           (-5.6, 42.6, 4), (10.40744, 57.64911, 12)]
    rows = [(bytes(wkbmod.encode_points_batch(
        np.array([[x, y]]))[0]), p) for x, y, p in pts]
    df = spark.createDataFrame(rows, "g binary, p int")
    df.createOrReplaceTempView("ghpts")
    out = [r.h for r in
           spark.sql("SELECT ST_GeoHash(g, p) AS h FROM ghpts").collect()]
    assert out == ["ezs42", "u4pruydqqvj", "ezs4", "u4pruydqqvj8"]
