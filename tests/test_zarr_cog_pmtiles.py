

def test_zarr_multidim_long_format(spark, tmp_path):
    """Rank-4 zarr with lead-spanning chunks -> per-(d0,d1) tiles."""
    import numpy as np
    from gdal_spark.raster.tiles import decode_px
    from gdal_spark.sources.zarr import read_zarr_multidim, write_zarr_nd
    t, z, h, w = 3, 2, 37, 41
    tt, zz, yy, xx = np.meshgrid(np.arange(t), np.arange(z),
                                 np.arange(h), np.arange(w),
                                 indexing="ij")
    arr = ((tt * 1000 + zz * 500 + yy * 41 + xx) % 997).astype("<i4")
    p = str(tmp_path / "md.zarr")
    write_zarr_nd(arr, p, chunks=[2, 1, 16, 16])
    tiles, meta = read_zarr_multidim(spark, p)
    rows = tiles.collect()
    assert {(r.d0, r.d1) for r in rows} == {(a, b) for a in range(t)
                                            for b in range(z)}
    for r in rows:
        a = decode_px(r.px, r.dtype, 16)
        exp = arr[r.d0, r.d1][r.tile_y * 16:(r.tile_y + 1) * 16,
                              r.tile_x * 16:(r.tile_x + 1) * 16]
        assert np.array_equal(a[:exp.shape[0], :exp.shape[1]], exp)
