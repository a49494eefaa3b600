"""Command-line front doors — thin argparse twins of the reference apps
(apps/ogr2ogr_bin.cpp, ogrinfo_bin.cpp, gdalinfo_bin.cpp) over the
engine's public API, so a reference user's shell workflow ports 1:1:

    python -m gdal_spark.cli ogr2ogr out.geojsonl in.shp \
        -t_srs EPSG:3857 -where "doc_id % 2 = 0" -simplify 0.01
    python -m gdal_spark.cli ogrinfo -so layer.fgb
    python -m gdal_spark.cli gdalinfo raster.tif

Everything between Open() and save_vector() is one lazy DataFrame plan;
the CLI adds no execution model of its own (the reference's apps are the
same thin shells over GDALVectorTranslate / ReportOnLayer)."""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from .session import get_spark
    return get_spark("gdal-spark-cli")


def _cmd_ogr2ogr(argv) -> int:
    ap = argparse.ArgumentParser(prog="ogr2ogr")
    ap.add_argument("dst")
    ap.add_argument("src")
    ap.add_argument("-t_srs")
    ap.add_argument("-s_srs", default="EPSG:4326")
    ap.add_argument("-where")
    ap.add_argument("-select", help="comma-separated attribute list")
    ap.add_argument("-sql", help="OGRSQL over the source (table `src`)")
    ap.add_argument("-simplify", type=float)
    ap.add_argument("-segmentize", type=float)
    ap.add_argument("-explodecollections", action="store_true")
    ap.add_argument("-makevalid", action="store_true")
    ap.add_argument("-wrapdateline", action="store_true")
    ap.add_argument("-nlt", choices=["PROMOTE_TO_MULTI"])
    ap.add_argument("-clipsrc", nargs=4, type=float,
                    metavar=("XMIN", "YMIN", "XMAX", "YMAX"))
    ap.add_argument("-clipdst", nargs=4, type=float,
                    metavar=("XMIN", "YMIN", "XMAX", "YMAX"))
    a = ap.parse_args(argv)

    from .operators.translate import TranslateOptions, translate
    from .sources import open_vector, save_vector

    spark = _spark()
    df = open_vector(spark, a.src)
    if a.sql:
        from .sql import OgrSqlEngine
        eng = OgrSqlEngine(spark)
        eng.register("src", df)
        df = eng.sql(a.sql)
    if a.where:
        df = df.where(a.where)
    if a.select:
        keep = [c.strip() for c in a.select.split(",")]
        df = df.select(*(keep + ["geom"]))
    opts = TranslateOptions(
        explode_collections=a.explodecollections,
        make_valid=a.makevalid,
        segmentize=a.segmentize, simplify=a.simplify,
        clip_src=tuple(a.clipsrc) if a.clipsrc else None,
        src_crs=a.s_srs if a.t_srs else None,
        dst_crs=a.t_srs,
        clip_dst=tuple(a.clipdst) if a.clipdst else None,
        wrapdateline=a.wrapdateline,
        promote_to_multi=a.nlt == "PROMOTE_TO_MULTI")
    if any([opts.explode_collections, opts.make_valid, opts.segmentize,
            opts.simplify, opts.clip_src, opts.dst_crs, opts.clip_dst,
            opts.wrapdateline, opts.promote_to_multi]):
        df = translate(df, opts)
    save_vector(df, a.dst)
    print(json.dumps({"written": a.dst}))
    return 0


def _cmd_ogrinfo(argv) -> int:
    ap = argparse.ArgumentParser(prog="ogrinfo")
    ap.add_argument("src")
    ap.add_argument("-so", action="store_true",
                    help="summary only (the only mode; kept for parity)")
    a = ap.parse_args(argv)
    from .operators.info import layer_info
    from .sources import open_vector
    spark = _spark()
    df = open_vector(spark, a.src)
    row = layer_info(df, name=a.src).collect()[0]
    print(json.dumps(row.asDict(), default=str))
    return 0


def _cmd_gdalinfo(argv) -> int:
    ap = argparse.ArgumentParser(prog="gdalinfo")
    ap.add_argument("src")
    ap.add_argument("-tile", type=int, default=256)
    a = ap.parse_args(argv)
    from .operators.info import raster_info
    from .sources import open_raster
    spark = _spark()
    t = open_raster(spark, a.src, tile=a.tile)
    rows = [r.asDict() for r in raster_info(t, tile=a.tile).collect()]
    print(json.dumps(rows, default=str))
    return 0


def _cmd_gdalsrsinfo(argv) -> int:
    ap = argparse.ArgumentParser(prog="gdalsrsinfo")
    ap.add_argument("srs", help="EPSG:code / proj string / WKT")
    ap.add_argument("-o", choices=["all", "proj4", "wkt"], default="all")
    a = ap.parse_args(argv)
    from .raster.transforms import srs_info
    info = srs_info(a.srs)
    if a.o == "proj4":
        print(info["proj4"])
    elif a.o == "wkt":
        print(info["wkt"])
    else:
        print(json.dumps({"proj4": info["proj4"], "wkt": info["wkt"]}))
    return 0


def _cmd_gdaltransform(argv) -> int:
    """Batch coordinate transform (apps/gdaltransform.cpp): reads 'x y'
    pairs from stdin, writes transformed pairs — vectorized as ONE numpy
    call over the whole batch, not per line."""
    ap = argparse.ArgumentParser(prog="gdaltransform")
    ap.add_argument("-s_srs", default="EPSG:4326")
    ap.add_argument("-t_srs", required=True)
    ap.add_argument("-output_xy", action="store_true")
    a = ap.parse_args(argv)
    import numpy as np
    from .raster.transforms import transform
    rows = [line.split() for line in sys.stdin if line.strip()]
    xs = np.array([float(r[0]) for r in rows])
    ys = np.array([float(r[1]) for r in rows])
    ox, oy = transform(a.s_srs, a.t_srs, xs, ys)
    for x, y in zip(ox, oy):
        print(f"{x!r} {y!r}")
    return 0


def _cmd_gdallocationinfo(argv) -> int:
    """Pixel lookup (apps/gdallocationinfo.cpp): -valonly nearest-pixel
    values at the given pixel/line coordinates."""
    ap = argparse.ArgumentParser(prog="gdallocationinfo")
    ap.add_argument("src")
    ap.add_argument("x", type=float)
    ap.add_argument("y", type=float)
    ap.add_argument("-tile", type=int, default=256)
    ap.add_argument("-valonly", action="store_true")
    a = ap.parse_args(argv)
    from .raster.sample import interpolate_at_points, tile_pixels
    from .sources import open_raster
    spark = _spark()
    t = open_raster(spark, a.src, tile=a.tile)
    px = tile_pixels(t, tile=a.tile)
    pts = spark.createDataFrame([(a.x + 0.5, a.y + 0.5)], "x double, y double")
    v = interpolate_at_points(px, pts, "x", "y", mode="near") \
        .collect()[0]["value"]
    print(v if a.valonly else json.dumps(
        {"pixel": int(a.x), "line": int(a.y), "value": v}))
    return 0


_COMMANDS = {"ogr2ogr": _cmd_ogr2ogr, "ogrinfo": _cmd_ogrinfo,
             "gdalinfo": _cmd_gdalinfo, "gdalsrsinfo": _cmd_gdalsrsinfo,
             "gdaltransform": _cmd_gdaltransform,
             "gdallocationinfo": _cmd_gdallocationinfo}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in _COMMANDS:
        print(f"usage: python -m gdal_spark.cli {{{'|'.join(_COMMANDS)}}}"
              " ...", file=sys.stderr)
        return 2
    return _COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
