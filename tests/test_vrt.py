"""VRT composition: build_vrt placement from geotransforms, last-on-top
overlap, SrcRect->DstRect scaling, ComplexSource scale/nodata."""

from __future__ import annotations

import numpy as np

from gdal_spark.raster.tiles import tiles_to_raster
from gdal_spark.raster.vrt import build_vrt, parse_vrt, read_vrt
from gdal_spark.sources.geotiff import write_gtiff


def test_buildvrt_mosaic_last_on_top(spark, tmp_path):
    a = (np.arange(120, dtype=np.float64).reshape(10, 12) + 1.0)
    b = (np.arange(48, dtype=np.float64).reshape(6, 8) + 500.0)
    pa, pb = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
    # A covers x:[0,12) y:[0,10) of the mosaic; B x:[6,14) y:[2,8)
    write_gtiff(a, pa, geotransform=(0.0, 1.0, 0.0, 10.0, 0.0, -1.0))
    write_gtiff(b, pb, geotransform=(6.0, 1.0, 0.0, 8.0, 0.0, -1.0))
    vp = str(tmp_path / "m.vrt")
    meta = build_vrt([pa, pb], vp, nodata=0.0)
    assert (meta["width"], meta["height"]) == (14, 10)
    assert meta["geotransform"] == (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)

    got = tiles_to_raster(read_vrt(spark, vp, tile=8), tile=8)[:10, :14]
    want = np.zeros((10, 14))
    want[0:10, 0:12] = a
    want[2:8, 6:14] = b           # later input wins in the overlap
    np.testing.assert_allclose(got, want)


def test_srcrect_dstrect_upscale_nearest(spark, tmp_path):
    src = np.arange(16, dtype=np.float64).reshape(4, 4) + 1.0
    p = str(tmp_path / "s.tif")
    write_gtiff(src, p, geotransform=(0.0, 1.0, 0.0, 4.0, 0.0, -1.0))
    vp = str(tmp_path / "up.vrt")
    with open(vp, "w") as f:
        f.write(f"""<VRTDataset rasterXSize="8" rasterYSize="8">
  <VRTRasterBand dataType="Float64" band="1">
    <NoDataValue>0</NoDataValue>
    <SimpleSource>
      <SourceFilename relativeToVRT="0">{p}</SourceFilename>
      <SourceBand>1</SourceBand>
      <SrcRect xOff="0" yOff="0" xSize="4" ySize="4"/>
      <DstRect xOff="0" yOff="0" xSize="8" ySize="8"/>
    </SimpleSource>
  </VRTRasterBand>
</VRTDataset>""")
    got = tiles_to_raster(read_vrt(spark, vp, tile=8), tile=8)[:8, :8]
    want = np.repeat(np.repeat(src, 2, axis=0), 2, axis=1)
    np.testing.assert_allclose(got, want)


def test_complexsource_scale_and_nodata(spark, tmp_path):
    src = np.array([[1.0, 2.0], [255.0, 4.0]])
    p = str(tmp_path / "c.tif")
    write_gtiff(src, p, geotransform=(0.0, 1.0, 0.0, 2.0, 0.0, -1.0))
    vp = str(tmp_path / "cx.vrt")
    with open(vp, "w") as f:
        f.write(f"""<VRTDataset rasterXSize="2" rasterYSize="2">
  <VRTRasterBand dataType="Float64" band="1">
    <NoDataValue>-1</NoDataValue>
    <ComplexSource>
      <SourceFilename relativeToVRT="0">{p}</SourceFilename>
      <SourceBand>1</SourceBand>
      <ScaleOffset>10</ScaleOffset>
      <ScaleRatio>2</ScaleRatio>
      <NODATA>255</NODATA>
    </ComplexSource>
  </VRTRasterBand>
</VRTDataset>""")
    got = tiles_to_raster(read_vrt(spark, vp, tile=8), tile=8)[:2, :2]
    # vrtsources.cpp RasterIOInternal: scale applies only to VALID pixels;
    # NODATA source pixels come back as the band's nodata
    np.testing.assert_allclose(got, [[12.0, 14.0], [-1.0, 18.0]])


def test_parse_relative_filename(tmp_path):
    vp = tmp_path / "rel.vrt"
    vp.write_text("""<VRTDataset rasterXSize="1" rasterYSize="1">
  <VRTRasterBand dataType="Byte" band="1">
    <SimpleSource>
      <SourceFilename relativeToVRT="1">sub/x.tif</SourceFilename>
    </SimpleSource>
  </VRTRasterBand>
</VRTDataset>""")
    meta = parse_vrt(str(vp))
    src = meta["bands"][0]["sources"][0]
    assert src["filename"].endswith("/sub/x.tif")
    assert src["src_rect"] is None and src["dst_rect"] is None
