"""PGDump sink: COPY escaping, EWKB hex, header DDL, null handling."""

import numpy as np

from gdal_spark.sources import pgdump as P


def test_ewkb_hex_flag_and_srid():
    from gdal_spark.core import wkb
    b = wkb.encode_points_batch(np.array([[1.5, -2.5]]))[0]
    h = P._ewkb_hex(bytes(b), 4326)
    # 01 (LE) + 01000020 (POINT | SRID flag) + E6100000 (4326)
    assert h.startswith("0101000020E6100000")
    assert len(h) == len(b.hex()) + 8


def test_copy_escape():
    assert P._copy_escape(None) == "\\N"
    assert P._copy_escape("a\tb\nc\\d") == "a\\tb\\nc\\\\d"
    assert P._copy_escape(True) == "t"
    assert P._copy_escape(b"\x01\xff") == "\\\\x01ff"
    assert P._copy_escape(3.5) == "3.5"


def test_write_pgdump_file(spark, tmp_path):
    from gdal_spark.core import wkb
    rows = [(bytes(wkb.encode_points_batch(np.array([[float(i), 2.0]]))[0]),
             i, f"n{i}" if i != 2 else None) for i in range(5)]
    df = spark.createDataFrame(rows, "geom binary, k long, name string") \
        .repartition(3)
    p = str(tmp_path / "out.sql")
    n = P.write_pgdump(df, p, table="t", srid=3857, geom_type="POINT")
    assert n == 5
    txt = open(p).read()
    assert txt.startswith("SET standard_conforming_strings = ON;")
    assert "SELECT AddGeometryColumn('public','t','wkb_geometry',3857," \
        "'POINT',2);" in txt
    assert '"k" BIGINT' in txt and '"name" VARCHAR' in txt
    body = txt.split("FROM STDIN;\n")[1].split("\\.\n")[0]
    lines = [ln for ln in body.split("\n") if ln]
    assert len(lines) == 5
    # null attribute renders \N; all geometries carry the 3857 SRID
    assert any(ln.endswith("\\N") for ln in lines)
    assert all("110F0000" in ln.split("\t")[0] for ln in lines)  # 3857 LE
    assert txt.rstrip().endswith("COMMIT;")
