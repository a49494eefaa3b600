"""DXF source/sink (ogr/ogrsf_frmts/dxf group-code subset)."""

import numpy as np

from gdal_spark.core import wkb
from gdal_spark.sources.dxf import parse_entities, read_dxf, write_dxf


def test_parse_entities_fixture():
    doc = "\n".join([
        "0", "SECTION", "2", "HEADER", "0", "ENDSEC",
        "0", "SECTION", "2", "ENTITIES",
        "0", "POINT", "8", "pts", "10", "1.5", "20", "2.5",
        "0", "LINE", "8", "l", "10", "0", "20", "0", "11", "3", "21", "4",
        "0", "LWPOLYLINE", "8", "pl", "90", "3", "70", "1",
        "10", "0", "20", "0", "10", "4", "20", "0", "10", "4", "20", "3",
        "0", "CIRCLE", "8", "c", "10", "10", "20", "10", "40", "2",
        "0", "TEXT", "8", "t", "10", "7", "20", "8", "1", "hello",
        "0", "POLYLINE", "8", "p2", "70", "0",
        "0", "VERTEX", "10", "0", "20", "9",
        "0", "VERTEX", "10", "1", "20", "9",
        "0", "SEQEND",
        "0", "ENDSEC", "0", "EOF"])
    ents = parse_entities(doc)
    by = {e[1]: e for e in ents}
    assert set(by) == {"POINT", "LINE", "LWPOLYLINE", "CIRCLE", "TEXT",
                       "POLYLINE"}
    assert by["POINT"][0] == "pts"
    np.testing.assert_allclose(by["POINT"][2].rings[0][0], [1.5, 2.5])
    np.testing.assert_allclose(by["LINE"][2].rings[0],
                               [[0, 0], [3, 4]])
    # closed flag appends the closing vertex
    pl = by["LWPOLYLINE"][2].rings[0]
    assert len(pl) == 4 and tuple(pl[-1]) == tuple(pl[0])
    # circle linearizes to a 72-chord ring of radius 2 about (10,10)
    ring = by["CIRCLE"][2].rings[0]
    rr = np.hypot(ring[:, 0] - 10, ring[:, 1] - 10)
    np.testing.assert_allclose(rr, 2.0, atol=1e-12)
    assert by["TEXT"][3] == "hello"
    np.testing.assert_allclose(by["POLYLINE"][2].rings[0],
                               [[0, 9], [1, 9]])


def test_dxf_spark_roundtrip(spark, tmp_path):
    out = str(tmp_path / "dxf")
    rows = [
        (wkb.point(3.25, -7.5), "a"),
        (wkb.linestring(np.array([[0.0, 0.0], [2.0, 1.0], [5.0, 1.0]])),
         "b"),
        (wkb.polygon(np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0],
                               [0.0, 0.0]])), "c"),
    ]
    df = spark.createDataFrame(rows, "geom binary, layer string")
    write_dxf(df.repartition(1), out)
    back = {r.layer: r for r in read_dxf(spark, out).collect()}
    g = wkb.decode(bytes(back["a"].geom))
    np.testing.assert_allclose(g.rings[0][0], [3.25, -7.5])
    l = wkb.decode(bytes(back["b"].geom))
    assert l.gtype == wkb.LINESTRING and len(l.rings[0]) == 3
    p = wkb.decode(bytes(back["c"].geom))   # ring comes back closed
    assert tuple(p.rings[0][0]) == tuple(p.rings[0][-1])
    assert len(p.rings[0]) == 4
