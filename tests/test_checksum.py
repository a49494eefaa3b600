"""GDAL checksum replica tests (alg/gdalchecksum.cpp semantics)."""

import numpy as np

from gdal_spark.core.checksum import gdal_checksum


def scalar_checksum(arr):
    primes = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]
    flat = arr.ravel()
    cs = 0
    for i, v in enumerate(flat):
        if np.issubdtype(arr.dtype, np.floating):
            fv = float(v)
            if not np.isfinite(fv):
                iv = -(2 ** 31)
            else:
                fv += 0.5
                if fv < -2147483647.0:
                    iv = -2147483647
                elif fv > 2147483647.0:
                    iv = 2147483647
                else:
                    iv = int(np.floor(fv))
        else:
            iv = int(v)
        p = primes[i % 11]
        r = iv - (abs(iv) // p) * p * (1 if iv >= 0 else -1)  # C-style remainder
        cs = (cs + r) & 0xFFFFFFFF
    return cs & 0xFFFF


def test_zeros():
    assert gdal_checksum(np.zeros((10, 10), dtype=np.uint8)) == 0


def test_known_small():
    a = np.arange(100, dtype=np.uint8).reshape(10, 10)
    assert gdal_checksum(a) == scalar_checksum(a)


def test_random_uint8():
    rng = np.random.RandomState(42)
    a = rng.randint(0, 256, (37, 53)).astype(np.uint8)
    assert gdal_checksum(a) == scalar_checksum(a)


def test_negative_ints():
    rng = np.random.RandomState(1)
    a = rng.randint(-30000, 30000, (41, 13)).astype(np.int16)
    assert gdal_checksum(a) == scalar_checksum(a)


def test_float_rounding():
    a = np.array([[0.4, 0.6, -0.4, -0.6, 1e40, -1e40, np.nan]], dtype=np.float64)
    assert gdal_checksum(a) == scalar_checksum(a)
