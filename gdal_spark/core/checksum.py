"""Bit-exact reimplementation of GDAL's 16-bit image checksum.

Reference: /root/reference/alg/gdalchecksum.cpp (GDALChecksumImage). This is
the correctness oracle used by essentially all of GDAL's raster autotests, so
our tile pipeline asserts the same values.

Semantics (full-window case, nXOff=nYOff=0):
  checksum = sum over row-major flattened values v_i of
             c_remainder(to_int(v_i), primes[i mod 11])   (mod 2^16)
  primes = [7,11,13,17,19,23,29,31,37,41,43]
  to_int: ints pass through; floats -> GDALCopyWords double->Int32 rule:
          nonfinite -> INT_MIN, else floor(v + 0.5) clamped to
          [-2147483647, 2147483647].
  c_remainder = C's % (sign follows dividend) = np.fmod for integers.
"""

from __future__ import annotations

import numpy as np

_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def _to_int(arr: np.ndarray) -> np.ndarray:
    if np.issubdtype(arr.dtype, np.floating):
        v = arr.astype(np.float64)
        out = np.full(v.shape, np.iinfo(np.int32).min, dtype=np.int64)
        finite = np.isfinite(v)
        vv = v[finite] + 0.5
        clipped = np.clip(np.floor(vv), -2147483647.0, 2147483647.0)
        out[finite] = clipped.astype(np.int64)
        return out
    return arr.astype(np.int64)


def gdal_checksum(arr: np.ndarray) -> int:
    """Checksum of a full 2-D (or 1-D) array, row-major — matches
    GDALChecksumImage(band, 0, 0, xsize, ysize). Complex bands follow
    the reference's nValsPerIter=2 rule: real/imag parts interleave in
    the prime-weighted stream (gdalchecksum.cpp:131)."""
    a = np.asarray(arr)
    if np.iscomplexobj(a):
        inter = np.empty(a.shape + (2,), np.float64)
        inter[..., 0] = a.real
        inter[..., 1] = a.imag
        a = inter
    flat = _to_int(a).ravel()
    idx = np.arange(flat.size, dtype=np.int64) % 11
    rem = np.fmod(flat, _PRIMES[idx])  # C-style: sign follows dividend
    return int(rem.sum() & 0xFFFF)
