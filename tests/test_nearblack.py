"""nearblack vs a direct transcription of the reference's line loop.

`reference_nearblack` transcribes GDALNearblack's pass structure and
ProcessLine branch-for-branch (apps/nearblack_lib.cpp:360-486 passes,
:516-709 ProcessLine) over numpy arrays; the distributed operator must
match it bit-for-bit, mask included, across strip boundaries.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.raster.nearblack import nearblack
from gdal_spark.raster.tiles import raster_to_tiles, tiles_to_raster


def _is_non_black(line, i, n_bands, colors, near_dist):
    for color in colors:
        non_black = False
        for b in range(n_bands):
            pix = int(line[b, i])
            if color[b] - pix > near_dist or pix > near_dist + color[b]:
                non_black = True
                break
        if not non_black:
            return False
    return True


def _process_line(line, mask, i_start, i_end, n_bands, near_dist,
                  max_non_black, colors, counts, do_horiz, do_vert,
                  bottom_up, line_from_edge, repl):
    if do_vert:
        for i in range(max(i_start, i_end) + 1):
            if counts[i] > max_non_black:
                continue
            non_black = _is_non_black(line, i, n_bands, colors, near_dist)
            if non_black:
                counts[i] += 1
                if counts[i] > max_non_black:
                    continue
                if line_from_edge == 0 and max_non_black > 0:
                    counts[i] = max_non_black + 1
                    continue
            line[:, i] = repl
            mask[i] = 0
    if do_horiz:
        if bottom_up:
            max_non_black = 0
        i_dir = 1 if i_start < i_end else -1
        n_non_black = 0
        do_test = True
        i = i_start
        while i != i_end:
            if do_test:
                non_black = _is_non_black(line, i, n_bands, colors,
                                          near_dist)
                if non_black:
                    if counts[i] <= max_non_black:
                        n_non_black = counts[i]
                    else:
                        n_non_black += 1
                if n_non_black > max_non_black:
                    do_test = False
                    i += i_dir
                    continue
                if non_black and max_non_black > 0 and i == i_start:
                    do_test = False
                    i += i_dir
                    continue
                line[:, i] = repl
                mask[i] = 0
            elif counts[i] == 0:
                do_test = True
                n_non_black = 0
            i += i_dir
        # loop excludes i_end, like the reference


def reference_nearblack(arr, near_dist=15, max_non_black=2,
                        near_white=False, colors=None):
    """arr: (bands, H, W) uint8 -> (out, mask)."""
    n_bands, h, w = arr.shape
    repl = 255 if near_white else 0
    if colors is None:
        colors = [tuple([repl] * n_bands)]
    out = arr.copy()
    mask = np.full((h, w), 255, dtype=np.uint8)
    counts = np.zeros(w, dtype=np.int64)
    for y in range(h):                       # pass 1: top-down, from src
        line = arr[:, y, :].copy()
        _process_line(line, mask[y], 0, w - 1, n_bands, near_dist,
                      max_non_black, colors, counts, True, True, False, y,
                      repl)
        _process_line(line, mask[y], w - 1, 0, n_bands, near_dist,
                      max_non_black, colors, counts, True, False, False, y,
                      repl)
        out[:, y, :] = line
    counts[:] = 0
    for y in range(h - 1, -1, -1):           # pass 2: bottom-up, from dst
        line = out[:, y, :].copy()
        _process_line(line, mask[y], 0, w - 1, n_bands, near_dist,
                      max_non_black, colors, counts, True, True, True,
                      h - 1 - y, repl)
        _process_line(line, mask[y], w - 1, 0, n_bands, near_dist,
                      max_non_black, colors, counts, True, False, True,
                      h - 1 - y, repl)
        out[:, y, :] = line
    return out, mask


def _collar_raster(h, w, n_bands, seed, frame=6):
    """Interior noise with a ragged near-black collar + a few interior
    near-black blobs (so grey areas, re-enable and freeze paths all run)."""
    rng = np.random.default_rng(seed)
    arr = rng.integers(40, 250, size=(n_bands, h, w), dtype=np.uint8)
    for r in range(h):
        lw = rng.integers(0, frame)
        rw = rng.integers(0, frame)
        arr[:, r, :lw] = rng.integers(0, 12)
        arr[:, r, w - rw:] = rng.integers(0, 12)
    for c in range(w):
        th = rng.integers(0, frame)
        bh = rng.integers(0, frame)
        arr[:, :th, c] = rng.integers(0, 12)
        arr[:, h - bh:, c] = rng.integers(0, 12)
    # sparse non-near speckles inside the collar (exercise max_non_black)
    for _ in range(12):
        r, c = rng.integers(0, h), rng.integers(0, min(frame, w))
        arr[:, r, c] = 200
    # interior near-black blob touching nothing
    arr[:, h // 2:h // 2 + 3, w // 2:w // 2 + 4] = 1
    return arr


def _run_spark(spark, arr, tile, **kw):
    n_bands, h, w = arr.shape
    dfs = [raster_to_tiles(spark, arr[b], band=b + 1, tile=tile)
           for b in range(n_bands)]
    df = dfs[0]
    for d in dfs[1:]:
        df = df.unionByName(d)
    out = nearblack(df, width=w, height=h, tile=tile, **kw)
    bands = {}
    for b in range(n_bands + 1):
        sub = out.where(out.band == b)
        bands[b] = tiles_to_raster(sub, tile=tile)[:h, :w]
    return bands


@pytest.mark.parametrize("max_nb,near_white,n_bands", [
    (0, False, 1), (2, False, 1), (2, False, 3), (1, True, 1)])
def test_nearblack_matches_reference(spark, max_nb, near_white, n_bands):
    h, w, tile = 70, 53, 16          # 5 strips, ragged right/bottom tiles
    base = _collar_raster(h, w, n_bands, seed=max_nb + n_bands)
    arr = (255 - base) if near_white else base
    want, want_mask = reference_nearblack(
        arr, max_non_black=max_nb, near_white=near_white)
    got = _run_spark(spark, arr, tile, max_non_black=max_nb,
                     near_white=near_white)
    np.testing.assert_array_equal(got[0], want_mask)
    for b in range(n_bands):
        np.testing.assert_array_equal(got[b + 1], want[b])


def test_nearblack_custom_colors(spark):
    """-color semantics: collar pixels near EITHER listed color collapse."""
    h, w, tile = 40, 37, 16
    arr = _collar_raster(h, w, 2, seed=9)
    arr[:, :3, :] = 130              # a second collar color on the top edge
    colors = [(0, 0), (130, 130)]
    want, want_mask = reference_nearblack(arr, colors=colors)
    got = _run_spark(spark, arr, tile, colors=colors)
    np.testing.assert_array_equal(got[0], want_mask)
    for b in range(2):
        np.testing.assert_array_equal(got[b + 1], want[b])


def test_nearblack_single_strip_equals_multi_strip(spark):
    """Strip decomposition is invisible: tile=64 (one strip) == tile=8."""
    arr = _collar_raster(48, 30, 1, seed=3)
    a = _run_spark(spark, arr, 64)
    b = _run_spark(spark, arr, 8)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_query_fixture_closed_form_matches_reference():
    """The nearblack_collar oracle's closed-form collar set (union of the
    four directional boundary runs, end pixels excluded) equals the
    branch-exact reference transcription on the query's fixture raster —
    pins the SQL oracle's derivation, not just the Spark operator."""
    H, W = 96, 80
    r = np.arange(H)[:, None]
    c = np.arange(W)[None, :]
    black = ((c < 2 + (r % 4)) | (c >= W - (1 + (r % 3)))
             | (r < 2 + (c % 5)) | (r >= H - (1 + (c % 2))))
    arr = np.where(black, 0, 200).astype(np.uint8)[None]
    _, mask = reference_nearblack(arr, max_non_black=0)

    nb = ~black
    t = np.where(nb.any(axis=0), nb.argmax(axis=0), H)
    b = np.where(nb.any(axis=0), H - 1 - nb[::-1].argmax(axis=0), -1)
    left = np.where(nb.any(axis=1), nb.argmax(axis=1), W)
    right = np.where(nb.any(axis=1), W - 1 - nb[:, ::-1].argmax(axis=1), -1)
    s = ((r < t[None, :]) | (r > b[None, :])
         | ((c < left[:, None]) & (c != W - 1))
         | ((c > right[:, None]) & (c != 0)))
    np.testing.assert_array_equal(mask == 0, s)
