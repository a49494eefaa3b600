"""Driver-side metadata walks stay bounded (the verdict-r04 sweep):
BSB header parse, GIF meta walk, and the USGS DEM profile scan must
never materialize a whole multi-MB file on the driver.  Each test
builds a synthetic large file and counts actual vsi.pread traffic."""

import struct

import numpy as np

from gdal_spark.core import vsi
from gdal_spark.sources import bsb as B
from gdal_spark.sources import gif as G
from gdal_spark.sources import usgsdem as U


def _track_preads(monkeypatch):
    seen = []
    real = vsi.pread

    def tracking(path, off, size):
        b = real(path, off, size)
        seen.append(len(b))
        return b

    monkeypatch.setattr(vsi, "pread", tracking)
    return seen


def test_gif_meta_walk_is_bounded(tmp_path, monkeypatch):
    """40 MB of LZW sub-blocks after the image descriptor are never
    fetched by the driver's meta_only walk."""
    p = str(tmp_path / "big.gif")
    w, h = 4096, 4096
    with open(p, "wb") as f:
        f.write(b"GIF87a")
        f.write(struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0))  # 256-entry GCT
        f.write(bytes(256 * 3))
        f.write(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0))
        f.write(bytes([8]))                          # LZW min code
        blk = bytes([255]) + bytes(255)
        f.write(blk * (40 * 1024 * 1024 // 256))     # ~40 MB payload
        f.write(b"\x00\x3b")
    seen = _track_preads(monkeypatch)
    m = G.parse_gif(p, meta_only=True)
    assert m["width"] == w and m["lzw"] is None
    assert sum(seen) < 512 * 1024


def test_bsb_header_parse_is_bounded(tmp_path, monkeypatch):
    """parse_header on a chart with 20 MB of RLE rows fetches only the
    ASCII header pages plus the trailing index-table pages."""
    p = str(tmp_path / "big.kap")
    height, width = 4096, 4096
    head = (b"VER/3.0\r\n"
            b"BSB/NA=synthetic,NU=1,RA=%d,%d,DU=254\r\n"
            b"RGB/1,0,0,0\r\n" % (width, height))
    with open(p, "wb") as f:
        f.write(head)
        f.write(b"\x1a\x00")
        f.write(bytes([1]))                          # depth
        first_line = f.tell()
        f.write(bytes(20 * 1024 * 1024))             # fake pixel rows
        idx_off = f.tell()
        # monotone in-range index entries (content never decoded here)
        offs = np.linspace(first_line, idx_off - 1, height).astype(">i4")
        f.write(offs.tobytes())
        f.write(struct.pack(">i", idx_off))
    seen = _track_preads(monkeypatch)
    meta = B.parse_header(p)
    assert (meta["width"], meta["height"]) == (width, height)
    assert meta["offsets"] is not None
    assert sum(seen) < 1024 * 1024


def _fake_profile(col: int, pad: int = 0) -> bytes:
    # the 24-char doubles start IMMEDIATELY after the 4th int's last
    # digit (reference fixed-width field semantics)
    rec = (b" 1 %d 3 1" % col
           + b"".join(b"%24.15e" % v for v in
                      (1.0, 2.0, 0.0, 0.0, 9.0))
           + b" 10 11 12")
    return rec + b" " * pad


def test_usgsdem_scan_small_file_reads_once(tmp_path, monkeypatch):
    p = str(tmp_path / "small.dem")
    with open(p, "wb") as f:
        for c in range(1, 51):
            f.write(_fake_profile(c) + b"\n")
    seen = _track_preads(monkeypatch)
    offs = U._scan_profiles(p, {"start": 0, "nx": 50})
    assert len(offs) == 50
    assert len(seen) == 1                            # ONE window pread


def test_usgsdem_scan_large_file_slides_window(tmp_path, monkeypatch):
    """Profiles padded to 64 KB force window slides; traffic stays
    ~size, never nx * window."""
    p = str(tmp_path / "big.dem")
    with open(p, "wb") as f:
        for c in range(1, 101):
            f.write(_fake_profile(c, pad=65536) + b"\n")
    seen = _track_preads(monkeypatch)
    offs = U._scan_profiles(p, {"start": 0, "nx": 100})
    assert len(offs) == 100
    import os
    size = os.path.getsize(p)
    assert sum(seen) < 3 * size
