"""DGN v7 source (sources/dgn.py) vs a hand-built fixture design file.

Pinned against ogr/ogrsf_frmts/dgn/dgnread.cpp element layouts, the
dgnlibp.h word-swapped DGN_INT32 and the port/cpl_vax.cpp VAX D-float
codec."""

import struct

import numpy as np
import pytest

from gdal_spark.core import wkb as W
from gdal_spark.sources import dgn as D


def test_vax_codec_known_words_and_roundtrip():
    # 1.0 = 0.5 * 2^1 -> exp 129 -> first word 0x4080 (VAX D hidden 0.1)
    assert struct.unpack("<4H", D.double_to_vax(1.0)) == (0x4080, 0, 0, 0)
    assert struct.unpack("<4H", D.double_to_vax(0.0)) == (0, 0, 0, 0)
    assert D.vax_to_double(D.double_to_vax(-4.0)) == -4.0
    for v in (3.141592653589793, 1e-30, -6378137.0, 0.1):
        assert D.vax_to_double(D.double_to_vax(v)) == v


def test_dgn_int32_word_swap():
    # DGN_INT32: high 16-bit word first, each word little-endian
    assert D.dgn_int32(b"\x00\x01\x02\x03", 0) == 0x01000302 - 0
    assert D.dgn_int32(D.enc_int32(-123456), 0) == -123456


@pytest.fixture(scope="module")
def design(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dgn") / "fixture.dgn")
    D.write_dgn(path, [
        ("line", [(1.5, 2.5), (3.5, 4.5)]),
        ("linestring", [(0.0, 0.0), (1.0, 0.5), (2.0, 0.0)]),
        ("shape", [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0),
                   (0.0, 0.0)]),
        ("text", (9.25, -2.5), "Hello DGN", 45.0),
    ], origin=(100.0, 200.0))
    return path


def test_element_stream_and_tcb(design):
    toc = D.scan_elements(design)
    assert len(toc) == 5                      # TCB + 4 elements
    with open(design, "rb") as f:
        rec = f.read(toc[0][1])
    assert (rec[1] & 0x7f) == D.DGNT_TCB
    scale, ox, oy, dim = D.parse_tcb(rec)
    assert scale == 1e-6 and (ox, oy) == (100.0, 200.0) and dim == 2


def test_read_dgn_features(design, spark):
    df = D.read_dgn(spark, design)
    rows = sorted(df.collect(), key=lambda r: r.etype)
    assert [r.etype for r in rows] == [3, 4, 6, 17]
    line = W.decode(rows[0].geom)
    np.testing.assert_allclose(line.rings[0], [[1.5, 2.5], [3.5, 4.5]],
                               atol=1e-9)
    ls = W.decode(rows[1].geom)
    np.testing.assert_allclose(ls.rings[0],
                               [[0, 0], [1, 0.5], [2, 0]], atol=1e-9)
    shp = W.decode(rows[2].geom)
    assert shp.gtype == W.POLYGON
    ring = shp.rings[0]
    assert np.allclose(ring[0], ring[-1]) and len(ring) == 5
    txt = rows[3]
    assert txt.text == "Hello DGN"
    assert txt.rotation == pytest.approx(45.0)
    np.testing.assert_allclose(W.decode(txt.geom).rings[0],
                               [[9.25, -2.5]], atol=1e-9)


def test_open_dispatch(design, spark):
    from gdal_spark.sources import open_vector
    assert open_vector(spark, design).count() == 4


def test_complex_chain_and_shape(spark, tmp_path):
    """Complex chain (type 12) stitches its complex-bit components into
    one LineString in element order; complex shape (type 14) closes to a
    Polygon — the driver groups from TOC complex bits alone
    (ogrdgnlayer.cpp bInComplexShape walk)."""
    path = str(tmp_path / "cplx.dgn")
    D.write_dgn(path, [
        ("complex_chain", [[(0.0, 0.0), (1.0, 0.0)],
                           [(1.0, 0.0), (1.0, 1.0), (2.0, 1.0)]]),
        ("line", [(9.0, 9.0), (10.0, 10.0)]),      # group terminator
        ("complex_shape", [[(0.0, 0.0), (4.0, 0.0), (4.0, 3.0)],
                           [(4.0, 3.0), (0.0, 3.0)]]),
    ])
    df = D.read_dgn(spark, path)
    rows = sorted(df.collect(), key=lambda r: r.etype)
    assert [r.etype for r in rows] == [3, 12, 14]
    chain = W.decode(rows[1].geom)
    np.testing.assert_allclose(
        chain.rings[0], [[0, 0], [1, 0], [1, 1], [2, 1]], atol=1e-9)
    shape = W.decode(rows[2].geom)
    assert shape.gtype == W.POLYGON
    ring = shape.rings[0]
    assert np.allclose(ring[0], ring[-1])
    x, y = ring[:-1, 0], ring[:-1, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
    assert area == pytest.approx(12.0)             # 4 x 3 rectangle
