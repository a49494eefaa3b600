"""NTv2 (.gsb) datum-shift grid files: read, write, bilinear application.

The reference applies these through PROJ's hgridshift pipeline step
(ogr/ogrct.cpp builds it; GDAL also exposes the format itself as the
NTv2 raster driver, frmts/raw/ntv2dataset.cpp). The binary layout is the
public NTv2 spec: an 11-record overview header, an 11-record subgrid
header, then GS_COUNT nodes of four float32s (lat shift, lon shift,
two accuracies) in arcseconds, rows from S_LAT northward and columns
from E_LONG **westward** (NTv2 longitudes are positive west).

This module reads the file into an east-oriented (nrows, ncols, 2)
float64 array, applies shifts by bilinear interpolation (PROJ
semantics: forward adds the interpolated shift at the source
coordinates; the inverse iterates a fixed number of rounds), and writes
single-subgrid files for fixtures and tests. Points outside the grid
pass through unshifted (PROJ's behaviour with a bounded grid).

transforms.py wires this behind ``+nadgrids=<path>`` in proj strings —
the grid-file counterpart of the ``+towgs84`` Helmert path.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

_D2R = np.pi / 180.0


def _rec(name: bytes, payload: bytes) -> bytes:
    assert len(name) == 8 and len(payload) == 8
    return name + payload


def _srec(name: bytes, s: str) -> bytes:
    return _rec(name, s.encode("ascii").ljust(8)[:8])


def _irec(name: bytes, v: int) -> bytes:
    return _rec(name, struct.pack("<i", v) + b"\0\0\0\0")


def _drec(name: bytes, v: float) -> bytes:
    return _rec(name, struct.pack("<d", v))


def write_ntv2(path: str, *, lat0: float, lat1: float, lon0: float,
               lon1: float, inc: float, lat_shift_sec: np.ndarray,
               lon_shift_west_sec: np.ndarray,
               name: str = "GDALSPRK") -> None:
    """Single-subgrid NTv2 writer. ``lat_shift_sec`` /
    ``lon_shift_west_sec`` are (nrows, ncols) EAST-oriented arrays
    (row i = lat0 + i*inc, col j = lon0 + j*inc, degrees east); columns
    flip to the spec's west-ward order on disk."""
    nrows, ncols = lat_shift_sec.shape
    assert nrows == int(round((lat1 - lat0) / inc)) + 1
    assert ncols == int(round((lon1 - lon0) / inc)) + 1
    out = bytearray()
    out += _irec(b"NUM_OREC", 11)
    out += _irec(b"NUM_SREC", 11)
    out += _irec(b"NUM_FILE", 1)
    out += _srec(b"GS_TYPE ", "SECONDS ")
    out += _srec(b"VERSION ", "NTv2.0  ")
    out += _srec(b"SYSTEM_F", "SRC     ")
    out += _srec(b"SYSTEM_T", "WGS84   ")
    out += _drec(b"MAJOR_F ", 6378206.4)
    out += _drec(b"MINOR_F ", 6356583.8)
    out += _drec(b"MAJOR_T ", 6378137.0)
    out += _drec(b"MINOR_T ", 6356752.314245)
    out += _srec(b"SUB_NAME", name)
    out += _srec(b"PARENT  ", "NONE    ")
    out += _srec(b"CREATED ", "20260101")
    out += _srec(b"UPDATED ", "20260101")
    out += _drec(b"S_LAT   ", lat0 * 3600.0)
    out += _drec(b"N_LAT   ", lat1 * 3600.0)
    out += _drec(b"E_LONG  ", -lon1 * 3600.0)     # positive west
    out += _drec(b"W_LONG  ", -lon0 * 3600.0)
    out += _drec(b"LAT_INC ", inc * 3600.0)
    out += _drec(b"LONG_INC", inc * 3600.0)
    out += _irec(b"GS_COUNT", nrows * ncols)
    # disk order: row-major from S_LAT, columns from E_LONG going west
    lat_w = lat_shift_sec[:, ::-1].astype("<f4")
    lon_w = lon_shift_west_sec[:, ::-1].astype("<f4")
    node = np.zeros((nrows, ncols, 4), "<f4")
    node[:, :, 0] = lat_w
    node[:, :, 1] = lon_w
    out += node.tobytes()
    out += _srec(b"END     ", "        ")
    with open(path, "wb") as f:
        f.write(bytes(out))


@lru_cache(maxsize=8)
def read_ntv2(path: str):
    """-> dict(lat0, lon0, inc, lat_shift, lon_shift_east) — first
    subgrid only, east-oriented float64 arrays in arcseconds."""
    with open(path, "rb") as f:
        buf = f.read()
    off = 0
    hdr: dict[str, bytes] = {}

    def take(n_recs):
        nonlocal off
        d = {}
        for _ in range(n_recs):
            nm = buf[off:off + 8].decode("ascii", "replace").strip()
            d[nm] = buf[off + 8:off + 16]
            off += 16
        return d

    hdr = take(11)
    n_orec = struct.unpack("<i", hdr["NUM_OREC"][:4])[0]
    if n_orec != 11:
        raise ValueError("big-endian / non-standard NTv2 unsupported")
    sub = take(11)
    (count,) = struct.unpack("<i", sub["GS_COUNT"][:4])
    s_lat = struct.unpack("<d", sub["S_LAT"])[0]
    n_lat = struct.unpack("<d", sub["N_LAT"])[0]
    e_long = struct.unpack("<d", sub["E_LONG"])[0]
    w_long = struct.unpack("<d", sub["W_LONG"])[0]
    lat_inc = struct.unpack("<d", sub["LAT_INC"])[0]
    lon_inc = struct.unpack("<d", sub["LONG_INC"])[0]
    nrows = int(round((n_lat - s_lat) / lat_inc)) + 1
    ncols = int(round((w_long - e_long) / lon_inc)) + 1
    if nrows * ncols != count:
        raise ValueError("GS_COUNT does not match grid extent")
    nodes = np.frombuffer(buf, "<f4", count=count * 4,
                          offset=off).reshape(nrows, ncols, 4)
    lat_shift = nodes[:, ::-1, 0].astype(np.float64)   # -> east-oriented
    lon_shift_east = -nodes[:, ::-1, 1].astype(np.float64)
    return {
        "lat0": s_lat / 3600.0,
        "lon0": -w_long / 3600.0,
        "inc": lat_inc / 3600.0,
        "lat_shift": lat_shift,
        "lon_shift_east": lon_shift_east,
    }


def _interp(grid, lon, lat):
    """Bilinear shift sample (east-oriented): -> (dlat_sec, dlon_east_sec);
    zero outside the grid."""
    g = grid
    nrows, ncols = g["lat_shift"].shape
    fx = (np.asarray(lon, np.float64) - g["lon0"]) / g["inc"]
    fy = (np.asarray(lat, np.float64) - g["lat0"]) / g["inc"]
    inside = (fx >= 0) & (fx <= ncols - 1) & (fy >= 0) & (fy <= nrows - 1)
    fxc = np.clip(fx, 0, ncols - 1)
    fyc = np.clip(fy, 0, nrows - 1)
    j0 = np.minimum(np.floor(fxc).astype(np.int64), ncols - 2)
    i0 = np.minimum(np.floor(fyc).astype(np.int64), nrows - 2)
    ax = fxc - j0
    ay = fyc - i0

    def bil(a):
        return (a[i0, j0] * (1 - ax) * (1 - ay)
                + a[i0, j0 + 1] * ax * (1 - ay)
                + a[i0 + 1, j0] * (1 - ax) * ay
                + a[i0 + 1, j0 + 1] * ax * ay)

    dlat = np.where(inside, bil(g["lat_shift"]), 0.0)
    dlon = np.where(inside, bil(g["lon_shift_east"]), 0.0)
    return dlat, dlon


def apply_gridshift(path: str, lon, lat, inverse: bool = False,
                    iters: int = 4):
    """Source-datum geographic -> target (forward), or back (inverse).
    Forward samples the shift AT THE SOURCE coordinates; the inverse
    solves for the source point by ``iters`` fixed-point rounds (PROJ
    hgridshift semantics, fixed count so oracles can replay it)."""
    grid = read_ntv2(path)
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    if not inverse:
        dlat, dlon = _interp(grid, lon, lat)
        return lon + dlon / 3600.0, lat + dlat / 3600.0
    slon, slat = lon.copy(), lat.copy()
    for _ in range(iters):
        dlat, dlon = _interp(grid, slon, slat)
        slon = lon - dlon / 3600.0
        slat = lat - dlat / 3600.0
    return slon, slat
