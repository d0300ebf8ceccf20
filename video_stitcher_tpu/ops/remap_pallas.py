"""Pallas TPU remap: bilinear backward-map resampling without scalar gathers.

The XLA lowering of an irregular gather is per-element on TPU (~620 ms for
the 6-camera warp); GPUs hide this in texture units (cv/cudawarping/src/cuda/
remap.cu). This kernel exploits two structural facts instead:

 1. The warp maps are smooth — within an output tile, all source taps fall
    in a small window whose offset is known at recalibration time (the maps
    are fixed between mesh re-solves). Each grid step DMAs just that window
    HBM->VMEM using scalar-prefetched per-tile offsets.
 2. A bilinear sample from a small window is two one-hot interpolation
    matrices: out[p] = sum_{r,c} Wy[p,r] * Wx[p,c] * win[r,c]. Building
    Wy/Wx on the fly from iota comparisons (VPU) and contracting the row
    dimension on the MXU turns the gather into dense matmul work — the op
    TPUs are built for.

Out-of-source taps contribute 0 (BORDER_CONSTANT): taps outside the window
match no one-hot column, and the caller pads the source so that in-window
pad rows are zero.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def plan_windows(maps: np.ndarray, src_h: int, src_w: int,
                 tile_h: int = TILE_H, tile_w: int = TILE_W,
                 slack: int = 0) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Per-tile source-window offsets + global static window size.

    maps: f32 [N, 2, bh, bw] (x, y source coords; invalid = -1).
    Returns (row_off [N, ny, nx] i32, col_off, win_h, win_w). Offsets are
    clipped so windows stay inside the padded source
    [0, round_up(src_h, 8)] x [0, round_up(src_w, 128)].
    slack widens every window (headroom for later mesh updates so the
    compiled kernel shape survives recalibrations).
    """
    n, _, bh, bw = maps.shape
    assert bh % tile_h == 0 and bw % tile_w == 0
    ny, nx = bh // tile_h, bw // tile_w
    mx = maps[:, 0].reshape(n, ny, tile_h, nx, tile_w)
    my = maps[:, 1].reshape(n, ny, tile_h, nx, tile_w)
    valid = (mx >= 0) & (my >= 0) & (mx < src_w) & (my < src_h)
    big = 1e9
    mx_min = np.where(valid, mx, big).min(axis=(2, 4))
    mx_max = np.where(valid, mx, -big).max(axis=(2, 4))
    my_min = np.where(valid, my, big).min(axis=(2, 4))
    my_max = np.where(valid, my, -big).max(axis=(2, 4))
    empty = mx_min > mx_max
    mx_min = np.where(empty, 0.0, mx_min)
    mx_max = np.where(empty, 0.0, mx_max)
    my_min = np.where(empty, 0.0, my_min)
    my_max = np.where(empty, 0.0, my_max)

    wh = int((np.ceil(my_max) - np.floor(my_min)).max()) + 2 + slack
    ww = int((np.ceil(mx_max) - np.floor(mx_min)).max()) + 2 + slack
    wh = _round_up(max(wh, 8), 8)
    ww = _round_up(max(ww, 128), 128)
    ph = _round_up(src_h, 8)
    pw = _round_up(src_w, 128)
    wh = min(wh, ph)
    ww = min(ww, pw)

    row_off = np.clip(np.floor(my_min) - 1, 0, ph - wh).astype(np.int32)
    col_off = np.clip(np.floor(mx_min) - 1, 0, pw - ww).astype(np.int32)
    return row_off, col_off, wh, ww


def _kernel(row_off, col_off, src_hbm, map_ref, out_ref, win, sem,
            *, win_h, win_w, tile_h, tile_w, channels):
    cam = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    r0 = row_off[cam, i, j]
    c0 = col_off[cam, i, j]
    dma = pltpu.make_async_copy(
        src_hbm.at[cam, :, pl.ds(r0, win_h), pl.ds(c0, win_w)], win, sem)
    dma.start()

    p = tile_h * tile_w
    lx = (map_ref[0, 0] - c0.astype(jnp.float32)).reshape(p, 1)
    ly = (map_ref[0, 1] - r0.astype(jnp.float32)).reshape(p, 1)
    x0 = jnp.floor(lx)
    y0 = jnp.floor(ly)
    fx = lx - x0
    fy = ly - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    ih = jax.lax.broadcasted_iota(jnp.int32, (p, win_h), 1)
    iw = jax.lax.broadcasted_iota(jnp.int32, (p, win_w), 1)
    wy = ((ih == y0i) * (1.0 - fy) + (ih == y0i + 1) * fy)
    wx = ((iw == x0i) * (1.0 - fx) + (iw == x0i + 1) * fx)

    dma.wait()
    for c in range(channels):
        t1 = jnp.dot(wy, win[c], preferred_element_type=jnp.float32)
        out_c = jnp.sum(t1 * wx, axis=1)
        out_ref[0, c] = out_c.reshape(tile_h, tile_w)


@functools.partial(jax.jit, static_argnames=("win_h", "win_w", "interpret"))
def remap_tiles(src_padded, maps, row_off, col_off, *, win_h: int,
                win_w: int, interpret: bool = False):
    """src_padded: f32 [N, C, Hp, Wp] (zero-padded to 8/128 multiples),
    maps: f32 [N, 2, bh, bw], offsets from plan_windows.
    Returns f32 [N, C, bh, bw]."""
    n, ch, hp, wp = src_padded.shape
    _, _, bh, bw = maps.shape
    ny, nx = bh // TILE_H, bw // TILE_W

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n, ny, nx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # src stays HBM
            pl.BlockSpec((1, 2, TILE_H, TILE_W),
                         lambda c, i, j, *_: (c, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ch, TILE_H, TILE_W),
                               lambda c, i, j, *_: (c, 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ch, win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_kernel, win_h=win_h, win_w=win_w,
                               tile_h=TILE_H, tile_w=TILE_W, channels=ch)
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, ch, bh, bw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )
    return fn(row_off, col_off, src_padded, maps)


def pad_src(frames_nchw):
    """Zero-pad [N, C, H, W] so H % 8 == 0 and W % 128 == 0 (pad rows act as
    the BORDER_CONSTANT fringe)."""
    n, c, h, w = frames_nchw.shape
    ph = _round_up(h, 8)
    pw = _round_up(w, 128)
    if ph == h and pw == w:
        return frames_nchw
    return jnp.pad(frames_nchw, ((0, 0), (0, 0), (0, ph - h), (0, pw - w)))
