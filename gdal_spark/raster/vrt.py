"""VRT virtual raster datasets (frmts/vrt twin: vrtdataset.cpp XML model,
vrtsources.cpp SimpleSource/ComplexSource, apps/gdalbuildvrt_lib.cpp).

A VRT is a plan, not data — exactly a DataFrame: `read_vrt` composes the
described mosaic lazily and nothing materializes until an action runs.

Per source, the SrcRect→DstRect pixel mapping is an affine between two
grids, so each source runs through the SAME warp engine every resampled
read uses (src_grid = the source's rect placed in VRT pixel space,
dst_grid = the VRT's own pixel grid, identity CRS) — arbitrary offsets
and size ratios, no tile-alignment restriction. Pixels a source paints
outside its DstRect are masked map-side, then sources composite in
document order through the last-on-top mosaic reducer (vrtsources.cpp
RasterIO order). ComplexSource adds ScaleOffset/ScaleRatio (map-only
rescale) and NODATA (masked via the warp's src_nodata path).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .rasterize import GridSpec
from .tiles import TILE_SCHEMA, decode_px, encode_px
from .warp import WarpSpec, warp

_VRT_DTYPES = {"Byte": "uint8", "UInt16": "uint16", "Int16": "int16",
               "UInt32": "uint32", "Int32": "int32",
               "Float32": "float32", "Float64": "float64"}
_DT_NAMES = {v: k for k, v in _VRT_DTYPES.items()}


def parse_vrt(path: str) -> dict:
    """.vrt XML -> {'width','height','geotransform','bands':[{'band',
    'dtype','nodata','sources':[{...}]}]} (vrtdataset.cpp XMLInit
    surface: VRTRasterBand + Simple/ComplexSource)."""
    root = ET.parse(path).getroot()
    out = {"width": int(root.get("rasterXSize")),
           "height": int(root.get("rasterYSize")),
           "geotransform": None, "bands": []}
    gt = root.find("GeoTransform")
    if gt is not None and gt.text:
        out["geotransform"] = tuple(float(v) for v in gt.text.split(","))
    for b in root.findall("VRTRasterBand"):
        nd = b.find("NoDataValue")
        band = {"band": int(b.get("band", "1")),
                "dtype": _VRT_DTYPES[b.get("dataType", "Float64")],
                "nodata": float(nd.text) if nd is not None else None,
                "sources": []}
        for s in list(b):
            if s.tag not in ("SimpleSource", "ComplexSource"):
                continue
            fn = s.find("SourceFilename")
            fname = fn.text
            if fn.get("relativeToVRT", "0") == "1":
                fname = os.path.join(os.path.dirname(os.path.abspath(path)),
                                     fname)

            def rect(tag):
                el = s.find(tag)
                if el is None:
                    return None
                return tuple(float(el.get(k)) for k in
                             ("xOff", "yOff", "xSize", "ySize"))

            sb = s.find("SourceBand")
            src = {"filename": fname, "kind": s.tag,
                   "band": int(sb.text) if sb is not None else 1,
                   "src_rect": rect("SrcRect"), "dst_rect": rect("DstRect"),
                   "resample": s.get("resampling", "near"),
                   "scale_off": 0.0, "scale_ratio": 1.0, "nodata": None}
            for tag, key in (("ScaleOffset", "scale_off"),
                             ("ScaleRatio", "scale_ratio"),
                             ("NODATA", "nodata")):
                el = s.find(tag)
                if el is not None and el.text:
                    src[key] = float(el.text)
            band["sources"].append(src)
        out["bands"].append(band)
    return out


def _mask_outside_rect(tiles_df: DataFrame, rect, nodata: float,
                       tile: int) -> DataFrame:
    """Map-only: set pixels outside the DstRect window to nodata so a
    source never paints beyond its rect in the composite."""
    rx, ry, rw, rh = (int(round(v)) for v in rect)

    def run(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                arr = decode_px(r.px, r.dtype, tile).copy()
                x0, y0 = int(r.tile_x) * tile, int(r.tile_y) * tile
                xs = np.arange(x0, x0 + tile)
                ys = np.arange(y0, y0 + tile)
                inside = ((xs >= rx) & (xs < rx + rw))[None, :] \
                    & ((ys >= ry) & (ys < ry + rh))[:, None]
                arr[~inside] = np.array(nodata, arr.dtype)
                out.append((r.band, r.zoom, r.tile_x, r.tile_y, r.dtype,
                            r.nodata, encode_px(arr)))
            yield pd.DataFrame(out, columns=[f.name for f in
                                             TILE_SCHEMA.fields])

    return tiles_df.mapInPandas(run, TILE_SCHEMA)


def _scale_valid(tiles_df: DataFrame, ratio: float, off: float,
                 src_nodata: float | None, band_nodata: float,
                 tile: int) -> DataFrame:
    """ComplexSource semantics (vrtsources.cpp RasterIOInternal): NODATA
    source pixels become the band's nodata; only VALID pixels are scaled
    by ScaleRatio/ScaleOffset — never the nodata sentinel itself."""

    def run(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                arr = decode_px(r.px, r.dtype, tile).astype(np.float64)
                valid = np.ones_like(arr, dtype=bool)
                if src_nodata is not None:
                    valid = arr != src_nodata
                res = np.where(valid, arr * ratio + off, band_nodata)
                out.append((r.band, r.zoom, r.tile_x, r.tile_y, r.dtype,
                            r.nodata,
                            encode_px(res.astype(np.dtype(r.dtype)))))
            yield pd.DataFrame(out, columns=[f.name for f in
                                             TILE_SCHEMA.fields])

    return tiles_df.mapInPandas(run, TILE_SCHEMA)


def read_vrt(spark: SparkSession, path: str, tile: int = 256) -> DataFrame:
    """-> composed tile table for every band of the VRT (lazy plan)."""
    from ..sources.geotiff import read_gtiff, read_ifd
    from .mosaic import mosaic

    meta = parse_vrt(path)
    W, H = meta["width"], meta["height"]
    dst_grid = GridSpec(x0=0.0, y0=0.0, dx=1.0, dy=1.0,
                        width=W, height=H, tile=tile)
    per_band = []
    for band in meta["bands"]:
        nodata = band["nodata"] if band["nodata"] is not None else 0.0
        layers = []
        for i, src in enumerate(band["sources"]):
            info = read_ifd(src["filename"])
            sxo, syo, sxs, sys_ = src["src_rect"] or (
                0.0, 0.0, float(info["width"]), float(info["height"]))
            dxo, dyo, dxs, dys = src["dst_rect"] or (0.0, 0.0, sxs, sys_)
            kx, ky = dxs / sxs, dys / sys_
            # place the source in VRT pixel space: vrt_px = dxo+(sx-sxo)*kx
            src_grid = GridSpec(x0=dxo - sxo * kx, y0=dyo - syo * ky,
                                dx=kx, dy=ky,
                                width=info["width"], height=info["height"],
                                tile=tile)
            t = read_gtiff(spark, src["filename"], tile=tile,
                           nodata=src["nodata"])
            spec = WarpSpec(src_grid=src_grid, src_crs="EPSG:4326",
                            dst_grid=dst_grid, dst_crs="EPSG:4326",
                            resample=src["resample"], fill=nodata,
                            src_nodata=src["nodata"])
            out = warp(t, spec, out_dtype=band["dtype"])
            if src["nodata"] is not None or src["scale_ratio"] != 1.0 \
                    or src["scale_off"] != 0.0:
                # sentinel = the warp's fill value: src NODATA when given,
                # else the band nodata spec.fill writes into unfed pixels
                sentinel = src["nodata"] if src["nodata"] is not None \
                    else nodata
                out = _scale_valid(out, src["scale_ratio"],
                                   src["scale_off"], sentinel, nodata,
                                   tile)
            out = _mask_outside_rect(out, (dxo, dyo, dxs, dys), nodata,
                                     tile)
            layers.append(out.withColumn("seq", F.lit(i))
                          .withColumn("band", F.lit(band["band"])))
        if layers:
            allsrc = layers[0]
            for l in layers[1:]:
                allsrc = allsrc.unionByName(l)
            per_band.append(mosaic(allsrc, tile=tile, nodata=nodata))
    out = per_band[0]
    for p in per_band[1:]:
        out = out.unionByName(p)
    return out


def build_vrt(paths: list[str], out_path: str,
              nodata: float | None = None) -> dict:
    """gdalbuildvrt twin (apps/gdalbuildvrt_lib.cpp): header-only reads
    (IFD + geotransform, no pixel I/O) compute the union extent at the
    first file's resolution; each input becomes a SimpleSource placed by
    its geotransform, in argument order (later wins, the reference's
    compositing rule). Returns the parsed metadata of what was written."""
    from ..sources.geotiff import read_ifd

    infos = [read_ifd(p) for p in paths]
    gts = [i.get("geotransform") for i in infos]
    if any(g is None for g in gts):
        raise ValueError("build_vrt needs georeferenced inputs")
    dx, dy = gts[0][1], gts[0][5]
    x0 = min(g[0] for g in gts)
    y0 = max(g[3] for g in gts) if dy < 0 else min(g[3] for g in gts)
    x1 = max(g[0] + i["width"] * g[1] for g, i in zip(gts, infos))
    yl = [g[3] + i["height"] * g[5] for g, i in zip(gts, infos)]
    y1 = min(yl) if dy < 0 else max(yl)
    W = int(round((x1 - x0) / dx))
    H = int(round((y1 - y0) / dy))
    dt = _DT_NAMES[infos[0]["dtype"]]
    lines = [f'<VRTDataset rasterXSize="{W}" rasterYSize="{H}">',
             f"  <GeoTransform>{x0!r}, {dx!r}, 0.0, {y0!r}, 0.0, "
             f"{dy!r}</GeoTransform>",
             f'  <VRTRasterBand dataType="{dt}" band="1">']
    if nodata is not None:
        lines.append(f"    <NoDataValue>{nodata!r}</NoDataValue>")
    for p, g, i in zip(paths, gts, infos):
        dxo = int(round((g[0] - x0) / dx))
        dyo = int(round((g[3] - y0) / dy))
        lines += [
            "    <SimpleSource>",
            f'      <SourceFilename relativeToVRT="0">{p}'
            "</SourceFilename>",
            "      <SourceBand>1</SourceBand>",
            f'      <SrcRect xOff="0" yOff="0" xSize="{i["width"]}"'
            f' ySize="{i["height"]}"/>',
            f'      <DstRect xOff="{dxo}" yOff="{dyo}"'
            f' xSize="{i["width"]}" ySize="{i["height"]}"/>',
            "    </SimpleSource>"]
    lines += ["  </VRTRasterBand>", "</VRTDataset>"]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    return parse_vrt(out_path)
