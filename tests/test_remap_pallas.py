"""Pallas remap kernel vs the XLA-gather reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from video_stitcher_tpu.ops.remap import remap_planar
from video_stitcher_tpu.ops.remap_pallas import (
    plan_windows, remap_tiles, pad_src, TILE_H, TILE_W,
)


def _smooth_maps(rng, bh, bw, src_h, src_w, scale=1.2):
    """Smooth quasi-cylindrical maps with some out-of-range regions."""
    gy, gx = np.mgrid[0:bh, 0:bw].astype(np.float32)
    mx = gx * scale - 30 + 10 * np.sin(gy / 37.0)
    my = gy * 0.9 + 5 * np.cos(gx / 53.0) - 4
    return mx.astype(np.float32), my.astype(np.float32)


def test_pallas_remap_matches_gather(rng):
    # interpret mode executes grid steps sequentially in Python, so keep the
    # grid tiny (2 cams x 1 x 1 tiles); the TPU path is exercised by bench.py
    src_h, src_w = 40, 150
    bh, bw = TILE_H, TILE_W
    src = rng.random((2, 2, src_h, src_w)).astype(np.float32) * 255
    mx0, my0 = _smooth_maps(rng, bh, bw, src_h, src_w)
    maps = np.stack([np.stack([mx0, my0]),
                     np.stack([mx0 * 0.8 + 10, my0 + 3])])
    row_off, col_off, wh, ww = plan_windows(maps, src_h, src_w)
    out = np.asarray(remap_tiles(
        pad_src(jnp.asarray(src)), jnp.asarray(maps),
        jnp.asarray(row_off), jnp.asarray(col_off),
        win_h=wh, win_w=ww, interpret=True))
    for n in range(2):
        gold = np.asarray(remap_planar(src[n], maps[n, 0], maps[n, 1],
                                       border="constant"))
        # on real TPU the f32 matmul uses bf16 passes (~0.4%); the reference
        # itself quantizes blend weights to 1/256 (multiband_blend.cu:20-22)
        # and its own accuracy bound is +-3/255, so 1.5 levels is fine
        np.testing.assert_allclose(out[n], gold, atol=1.5)


def test_pallas_remap_all_invalid_tile(rng):
    """Tiles whose map is entirely out of range must produce zeros."""
    src = rng.random((1, 3, 40, 140)).astype(np.float32)
    bh, bw = 2 * TILE_H, TILE_W
    mx = np.full((bh, bw), -1.0, np.float32)
    my = np.full((bh, bw), -1.0, np.float32)
    mx[:TILE_H] = 50.0
    my[:TILE_H] = 20.0
    maps = np.stack([mx, my])[None]
    row_off, col_off, wh, ww = plan_windows(maps, 40, 140)
    out = np.asarray(remap_tiles(
        pad_src(jnp.asarray(src)), jnp.asarray(maps),
        jnp.asarray(row_off), jnp.asarray(col_off),
        win_h=wh, win_w=ww, interpret=True))
    assert np.all(out[0, :, TILE_H:] == 0.0)
    assert np.all(out[0, :, :TILE_H] > 0.0)
