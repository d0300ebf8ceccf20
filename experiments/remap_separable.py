"""Separable two-pass warp for pure-yaw cylindrical rigs.

For R = Ry(yaw) the cylindrical backward map factors exactly:
    mx = f * tan(theta - yaw) + cx            (a function of pano x ONLY)
    my = (f / s) * v / cos(theta - yaw) + cy  (per-column affine in v)
(see geometry/cylindrical.py; derivable from warpers_inl.hpp:279-307 with
K R^T d and d = (sin, v/s, cos)). The per-frame resample therefore splits:

  Pass H   I1[y, xb] = sum_s src[y, s] * Wx[xb, s]
           — ONE banded-matrix matmul per camera (XLA, MXU): every source
           row is resampled by the same x-map.
  Pass V   out[yb, xb] = bilerp(I1, my(xb, yb), dx(xb, yb))
           — a Pallas kernel whose x-window is tiny: for the global path
           dx == xb; the CPW mesh adds only its local displacement (the
           global component is inverted through mx at plan time), bounded
           by a +-XPAD-lane halo. I1 is lane-padded by the halo so each
           128-column group loads one 128-aligned slab and every chunk's
           64-lane window is a *static* sub-slice — none of the 256-lane
           slab machinery the general kernel (ops/remap_strips.py) needs,
           and a quarter of its X-stage arithmetic.

Accuracy note: two chained 1-D bilinear passes are not bit-identical to
one 2-D bilinear (slightly more smoothing along x); parity vs the gather
reference is within ~1/255 on band content.

STATUS — measured on TPU v5e-lite (6x1080p rig): pass_h 5.9 ms + pass_v
35 ms = 40.9 ms amortized, vs 35.3 ms for the general strip kernel. The
X-stage savings don't materialize: with tent-weight builds the general
kernel's X cost is already small, the [256 x 64] matmuls here waste MXU
K-occupancy vs [256 x 256], and the shared Y-stage mix dominates both.
Kept as a correctness-tested experimental path (it becomes interesting
again if the Y-mix moves to the MXU); the general kernel
(ops/remap_strips.py) is the production path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 8
CHUNK_W = 32
GROUP = 128 // CHUNK_W
XPAD = 16              # static x halo around each chunk (mesh residual)
WIN_X = CHUNK_W + 2 * XPAD          # 64-lane per-chunk window
SLAB_X = 192           # per-group slab: [128g, 128g+192) of padded I1
LANE_PAD_R = 128 - XPAD  # right pad: total lane count stays a 128 multiple
                         # (Mosaic requires it) and >= SLAB_X - 128 - XPAD
ROW_ALIGN = 16


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class SepPlan(NamedTuple):
    """Pass-H matrix + Pass-V maps/offsets + static sizes."""
    wx: np.ndarray           # f32 [N, bw_p, src_w] Pass-H matrix
    vmaps: np.ndarray        # f32 [N, 2, bh_p, bw_p]: (band-x, source-y)
    strip_off: np.ndarray    # i32 [N, nrb]
    chunk_row: np.ndarray    # i32 [N, nrb, ncc]; -ROW_ALIGN = empty chunk
    sh: int
    whc: int
    i1_hp: int               # padded I1 height (= padded source height)
    bh_p: int
    bw_p: int


def plan_separable(fused_maps: np.ndarray, global_mx: np.ndarray,
                   src_h: int, src_w: int, row_slack: int = 8,
                   min_sh: int = 0, min_whc: int = 0) -> SepPlan:
    """fused_maps: f32 [N, 2, bh_p, bw_p] (full warp incl. mesh);
    global_mx: f32 [N, bw_p] — the y-independent global x-map (full-res
    source coords per band column). Both padded like remap_strips.pad_maps.
    """
    n, _, bh, bw = fused_maps.shape
    assert bh % ROW_BLOCK == 0 and bw % 128 == 0
    i1_hp = _round_up(src_h, ROW_ALIGN)

    # --- Pass-H banded matrix (bilinear tap weights of global_mx) ---
    wx = np.zeros((n, bw, src_w), np.float32)
    cols = np.arange(bw)
    for i in range(n):
        mxg = global_mx[i]
        x0 = np.floor(mxg).astype(np.int64)
        fx = (mxg - x0).astype(np.float32)
        ok0 = (x0 >= 0) & (x0 < src_w)
        ok1 = (x0 + 1 >= 0) & (x0 + 1 < src_w)
        np.add.at(wx[i], (cols[ok0], x0[ok0]), (1.0 - fx)[ok0])
        np.add.at(wx[i], (cols[ok1], np.clip(x0 + 1, 0, src_w - 1)[ok1]),
                  fx[ok1])

    # --- Pass-V maps: x through the inverse of global_mx, y unchanged ---
    vmaps = np.empty((n, 2, bh, bw), np.float32)
    for i in range(n):
        mxg = global_mx[i].astype(np.float64)
        order = np.argsort(mxg)
        mx_f = fused_maps[i, 0].astype(np.float64)
        inv = np.interp(mx_f.ravel(), mxg[order],
                        np.arange(bw, dtype=np.float64)[order],
                        left=-2.0, right=-2.0).reshape(bh, bw)
        # invalid: the -1.0 marker (<= -1 after any scale conversion) or a
        # fused x outside the global map's range (inv pinned to -2)
        invalid = (mx_f <= -1) | (inv <= -1.5)
        vmaps[i, 0] = np.where(invalid, -2.0, np.clip(inv, 0.0, bw - 1.0))
        vmaps[i, 1] = np.where(invalid, -2.0, fused_maps[i, 1])

    # the x residual must fit the static halo
    gx = np.arange(bw, dtype=np.float32)[None, None, :]
    valid_x = vmaps[:, 0] > -1
    resid = np.abs(vmaps[:, 0] - gx)
    rmax = float(resid[valid_x].max()) if valid_x.any() else 0.0
    if rmax + 2 > XPAD:
        raise ValueError(f"x-residual {rmax:.1f}px exceeds XPAD={XPAD}")

    # --- strips / row windows (same construction as remap_strips) ---
    nrb, ncc = bh // ROW_BLOCK, bw // CHUNK_W
    my = vmaps[:, 1].reshape(n, nrb, ROW_BLOCK, ncc, CHUNK_W)
    mv = (my > -1) & (my < src_h)
    big = 1e9
    my_min = np.where(mv, my, big).min(axis=(2, 4))
    my_max = np.where(mv, my, -big).max(axis=(2, 4))
    empty = my_min > my_max
    my_min[empty] = 0.0
    my_max[empty] = 0.0
    req_lo = np.clip(np.floor(my_min) - 1, 0, i1_hp - 1).astype(np.int64)
    req_hi = np.clip(np.floor(my_max) + 1, 0, i1_hp - 1).astype(np.int64)

    whc = int((req_hi - req_lo + 1).max()) + (ROW_ALIGN - 1) + row_slack
    whc = min(_round_up(max(whc, min_whc, ROW_ALIGN), ROW_ALIGN), i1_hp)

    big_i = np.int64(1 << 40)
    rb_lo = np.where(empty, big_i, req_lo).min(axis=2)
    rb_hi = np.where(empty, np.int64(-1), req_hi).max(axis=2)
    bad = rb_lo > rb_hi
    rb_lo = np.where(bad, 0, rb_lo)
    rb_hi = np.where(bad, 0, rb_hi)
    rb_lo8 = (rb_lo // 8) * 8
    sh = int((rb_hi - rb_lo8 + 1).max()) + row_slack
    sh = min(_round_up(max(sh, whc, min_sh, ROW_ALIGN), ROW_ALIGN), i1_hp)

    strip_off = np.minimum(rb_lo8, i1_hp - sh).astype(np.int32)
    row_rel = req_lo - strip_off[:, :, None]
    chunk_row = ((row_rel // ROW_ALIGN) * ROW_ALIGN).astype(np.int32)
    chunk_row = np.minimum(chunk_row, sh - whc).astype(np.int32)

    win_lo = strip_off[:, :, None] + chunk_row
    cover = (win_lo <= req_lo) & (win_lo + whc > req_hi)
    assert bool(cover[~empty].all()), "separable plan failed to cover taps"
    chunk_row = np.where(empty, np.int32(-ROW_ALIGN), chunk_row)

    return SepPlan(wx=wx, vmaps=vmaps, strip_off=strip_off,
                   chunk_row=chunk_row, sh=sh, whc=whc, i1_hp=i1_hp,
                   bh_p=bh, bw_p=bw)


def pass_h(src_planar, wx_bf16):
    """src bf16 [N, C, Hp, S] x wx [N, bw, S] -> I1 bf16 [N, C, Hp, bwp]
    with the XPAD lane halo (zeros) already applied."""
    i1 = jnp.einsum("nchs,nbs->nchb", src_planar, wx_bf16,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return jnp.pad(i1, ((0, 0), (0, 0), (0, 0), (XPAD, LANE_PAD_R)))


def _kernel(strip_off, chunk_row, i1_hbm, map_ref, out_ref, strip, sem,
            *, sh, whc, ncc, channels, n_cam, n_rb):
    cam = pl.program_id(0)
    rb = pl.program_id(1)

    def strip_dma(c, r, slot):
        s0 = pl.multiple_of(strip_off[c, r], 8)
        return pltpu.make_async_copy(
            i1_hbm.at[c, :, pl.ds(s0, sh), :], strip.at[slot], sem.at[slot])

    slot = jax.lax.rem(rb, 2)

    @pl.when(jnp.logical_and(cam == 0, rb == 0))
    def _():
        strip_dma(cam, rb, slot).start()

    @pl.when(jnp.logical_not(
        jnp.logical_and(cam == n_cam - 1, rb == n_rb - 1)))
    def _():
        nxt_cam = jnp.where(rb == n_rb - 1, cam + 1, cam)
        nxt_rb = jnp.where(rb == n_rb - 1, 0, rb + 1)
        strip_dma(nxt_cam, nxt_rb, 1 - slot).start()

    strip_dma(cam, rb, slot).wait()
    s0 = strip_off[cam, rb]

    def group(g, _):
        ckg = pl.multiple_of(g * 128, 128)
        dxs = map_ref[0, 0, :, pl.ds(ckg, 128)]      # band-x coords
        mys = map_ref[0, 1, :, pl.ds(ckg, 128)]
        outs = [[] for _ in range(channels)]
        for j in range(GROUP):
            k = g * GROUP + j
            r0raw = chunk_row[cam, rb, k]

            def compute(_):
                r0 = pl.multiple_of(jnp.maximum(r0raw, 0), ROW_ALIGN)
                dxj = dxs[:, j * CHUNK_W:(j + 1) * CHUNK_W]
                myj = mys[:, j * CHUNK_W:(j + 1) * CHUNK_W]
                # chunk window = padded-I1 lanes [128g + 32j, +WIN_X):
                # orig band lanes [32k - XPAD, 32k - XPAD + WIN_X)
                lx = dxj - (ckg + j * CHUNK_W - XPAD).astype(jnp.float32)
                ly = myj - (s0 + r0).astype(jnp.float32)

                kx = jax.lax.broadcasted_iota(
                    jnp.int32, (ROW_BLOCK, CHUNK_W, WIN_X), 2
                ).astype(jnp.float32)
                wxm = jnp.maximum(0.0, 1.0 - jnp.abs(kx - lx[:, :, None]))
                wxm = wxm.astype(jnp.bfloat16).reshape(
                    ROW_BLOCK * CHUNK_W, WIN_X)

                slab = jnp.concatenate(
                    [strip[slot, c, pl.ds(r0, whc), pl.ds(ckg, SLAB_X)]
                     [:, j * CHUNK_W:j * CHUNK_W + WIN_X]
                     for c in range(channels)], axis=0)   # [C*whc, WIN_X]

                t1 = jax.lax.dot_general(
                    wxm, slab, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [256, C*whc]

                ky = jax.lax.broadcasted_iota(
                    jnp.int32, (ROW_BLOCK, CHUNK_W, whc), 2
                ).astype(jnp.float32)
                wym = jnp.maximum(
                    0.0, 1.0 - jnp.abs(ky - ly[:, :, None])
                ).reshape(ROW_BLOCK * CHUNK_W, whc)
                vals = []
                for c in range(channels):
                    tc = t1[:, c * whc:(c + 1) * whc]
                    vals.append(jnp.sum(tc * wym, axis=1).reshape(
                        ROW_BLOCK, CHUNK_W))
                return tuple(vals)

            def zeros(_):
                return tuple(jnp.zeros((ROW_BLOCK, CHUNK_W), jnp.float32)
                             for _ in range(channels))

            vals = jax.lax.cond(r0raw >= 0, compute, zeros, 0)
            for c in range(channels):
                outs[c].append(vals[c])
        for c in range(channels):
            out_ref[0, c, :, pl.ds(ckg, 128)] = jnp.concatenate(
                outs[c], axis=1)
        return 0

    jax.lax.fori_loop(0, ncc // GROUP, group, 0)


@functools.partial(jax.jit, static_argnames=("sh", "whc", "interpret"))
def pass_v(i1_padded, vmaps, strip_off, chunk_row, *, sh: int, whc: int,
           interpret: bool = False):
    """i1_padded: bf16 [N, C, Hp, bw_p + XPAD + LANE_PAD_R] (pass_h output);
    vmaps f32 [N, 2, bh_p, bw_p]. Returns f32 [N, C, bh_p, bw_p]."""
    n, ch, hp, bwp = i1_padded.shape
    _, _, bh, bw = vmaps.shape
    assert bwp == bw + XPAD + LANE_PAD_R
    nrb = bh // ROW_BLOCK
    ncc = bw // CHUNK_W

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n, nrb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 2, ROW_BLOCK, bw),
                         lambda c, r, *_: (c, 0, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ch, ROW_BLOCK, bw),
                               lambda c, r, *_: (c, 0, r, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, ch, sh, bwp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, sh=sh, whc=whc, ncc=ncc,
                               channels=ch, n_cam=n, n_rb=nrb)
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, ch, bh, bw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )
    return fn(strip_off, chunk_row, i1_padded, vmaps)


def warp_separable(src_planar, wx_bf16, vmaps, strip_off, chunk_row, *,
                   sh: int, whc: int, interpret: bool = False):
    """Full two-pass warp: src bf16 [N, C, Hp, S] -> bands f32
    [N, C, bh_p, bw_p]."""
    i1 = pass_h(src_planar, wx_bf16)
    return pass_v(i1, vmaps, strip_off, chunk_row, sh=sh, whc=whc,
                  interpret=interpret)
