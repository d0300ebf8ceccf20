"""Production Pallas TPU remap: strip-DMA + chunked one-hot MXU gathers.

The hot op of the whole framework (replaces cv::cuda::remap at
360_stitcher/timed.cpp:84,90; kernel cv/cudawarping/src/cuda/remap.cu).
XLA lowers an irregular 2-D gather on TPU to per-element loads — measured
~4.2 s for the 6-camera warp — so this kernel restructures the resample
around what the hardware does well: big DMAs, lane rotates, and matmuls.

Structure (all offsets precomputed at (re)calibration time, when the maps
change — the maps are FIXED between mesh re-solves):

 1. The band output is processed in row-blocks of 8 rows. For each
    (camera, row-block) one DMA copies the source *strip* containing every
    tap of that row-block (strip height is data-dependent but bounded;
    static cap SH) from HBM to VMEM.
 2. Each row-block is split into chunks of 32 output columns. Within a
    chunk the source taps fall in a window of <= WHC rows (measured ~64
    for the 6-cam 1080p rig). Mosaic only allows dynamic *lane* indexing
    at multiples of 128, so the kernel reads a 256-lane slab at the
    128-aligned floor of the window start and folds the sub-slab offset
    into the weight matrix instead of moving the data.
 3. Bilinear separates into per-axis tent kernels w(k) = relu(1-|k-l|).
    The X stage materializes the tent weights as a [256 out-px, 256 lane]
    bf16 matrix and contracts it against the slab on the MXU (channels
    stacked along slab rows, f32 accumulation); the Y stage applies the
    whc-wide tent mix on the VPU. Fully-invalid chunks are skipped via a
    sign flag in the packed offsets; strips are double-buffered across
    grid steps. ~0.4 TF(bf16)/frame of matmul vs the 3.3 TF a
    whole-window one-hot formulation would need.

Out-of-source taps (beyond the source or at the reference's -1 "invalid"
marker, build_warp_maps.cu:103-106) fall outside every tent support and
contribute exactly 0; coords within 1 px of the border keep their exact
partial-tap weight — BORDER_CONSTANT semantics, matching
ops.remap.remap_planar(border="constant"), verified to 0.5/255
(bf16 weight rounding) against it on the real rig maps.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 8          # output rows per strip DMA
CHUNK_W = 32           # output columns per compute chunk
GROUP = 128 // CHUNK_W  # chunks per 128-lane map/store group
SLAB_W = 256           # lane width of the rotated source slab
WIN_W = 128            # lane width of the in-register window
ROW_ALIGN = 16         # window row starts aligned to the bf16 sublane tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class StripPlan(NamedTuple):
    """Scalar-prefetch arrays + static sizes for remap_strips.

    Array shapes: strip_off [N, nrb]; chunk_packed [N, nrb, ncc] with
    (window_row//8 | (c128//128)<<8 | dc<<16) packed per chunk — the
    scalar-prefetch arrays live in SMEM (~1 MB), so one word per chunk.
    Static: sh/whc (strip/window heights), src_hp/src_wp (padded source),
    bh_p/bw_p (padded band).
    """
    strip_off: np.ndarray
    chunk_packed: np.ndarray
    sh: int
    whc: int
    src_hp: int
    src_wp: int
    bh_p: int
    bw_p: int


def pad_maps(maps: np.ndarray) -> np.ndarray:
    """Pad band maps [N, 2, bh, bw] to ROW_BLOCK/128 multiples with -1
    (invalid) so padded outputs are exactly 0."""
    n, _, bh, bw = maps.shape
    ph = _round_up(bh, ROW_BLOCK)
    pw = _round_up(bw, 128)
    if ph == bh and pw == bw:
        return maps
    out = np.full((n, 2, ph, pw), -1.0, np.float32)
    out[:, :, :bh, :bw] = maps
    return out


def plan_strips(maps: np.ndarray, src_h: int, src_w: int,
                row_slack: int = 8, min_sh: int = 0,
                min_whc: int = 0) -> StripPlan:
    """Precompute strip/chunk offsets for padded maps [N, 2, bh_p, bw_p].

    The x window is a fixed 128 lanes; the plan asserts per-chunk x spans
    fit (they do whenever the horizontal magnification is < ~3.9x over a
    32-px chunk). row_slack widens the static heights so small mesh
    recalibrations don't force a re-jit.
    """
    n, _, bh, bw = maps.shape
    assert bh % ROW_BLOCK == 0 and bw % 128 == 0
    assert src_w % 128 == 0 and src_w >= SLAB_W
    nrb = bh // ROW_BLOCK
    ncc = bw // CHUNK_W
    mx = maps[:, 0].reshape(n, nrb, ROW_BLOCK, ncc, CHUNK_W)
    my = maps[:, 1].reshape(n, nrb, ROW_BLOCK, ncc, CHUNK_W)
    # a sample contributes whenever ANY of its 4 taps lands in the source:
    # coords in (-1, 0) still hit tap x0+1/y0+1 (the gather reference
    # weights them accordingly), so the window plan must include them;
    # the reference's -1.0 invalid marker stays excluded (strict >)
    valid = (mx > -1) & (my > -1) & (mx < src_w) & (my < src_h)
    big = 1e9
    my_min = np.where(valid, my, big).min(axis=(2, 4))       # [n, nrb, ncc]
    my_max = np.where(valid, my, -big).max(axis=(2, 4))
    mx_min = np.where(valid, mx, big).min(axis=(2, 4))
    mx_max = np.where(valid, mx, -big).max(axis=(2, 4))
    empty = my_min > my_max
    for a in (my_min, my_max, mx_min, mx_max):
        a[empty] = 0.0

    w_span = (np.ceil(mx_max) - np.floor(mx_min) + 2).max()
    if w_span > WIN_W:
        raise ValueError(f"chunk x-span {w_span:.0f} exceeds {WIN_W}; "
                         "horizontal magnification too large for CHUNK_W")

    src_hp = _round_up(src_h, ROW_ALIGN)
    src_wp = src_w

    # Row coverage is derived bottom-up so it holds by construction:
    # every chunk needs source rows [req_lo, req_hi] (inclusive; taps
    # beyond the source contribute 0 on both paths, so clamping to the
    # source is exact).
    req_lo = np.clip(np.floor(my_min) - 1, 0, src_hp - 1).astype(np.int64)
    req_hi = np.clip(np.floor(my_max) + 1, 0, src_hp - 1).astype(np.int64)

    # window height: worst chunk span + the ROW_ALIGN flooring of its start.
    # whc and sh are both ROW_ALIGN multiples so that the sh-whc window
    # clamp below stays aligned (an unaligned clamp would be floored again
    # at decode time, cutting taps off the window top).
    whc = int((req_hi - req_lo + 1).max()) + (ROW_ALIGN - 1) + row_slack
    whc = min(_round_up(max(whc, min_whc, ROW_ALIGN), ROW_ALIGN), src_hp)

    # strip height: worst row-block span measured from the 8-aligned strip
    # start (strip_off may also be pushed down by the source bottom; the
    # strip then ends at src_hp, which still covers every req_hi)
    # aggregate over NON-EMPTY chunks only (empty chunks carry dummy
    # [0, 1] ranges that would blow the strip up to the whole source)
    big_i = np.int64(1 << 40)
    rb_lo = np.where(empty, big_i, req_lo).min(axis=2)        # [n, nrb]
    rb_hi = np.where(empty, np.int64(-1), req_hi).max(axis=2)
    rb_all_empty = rb_lo > rb_hi
    rb_lo = np.where(rb_all_empty, 0, rb_lo)
    rb_hi = np.where(rb_all_empty, 0, rb_hi)
    rb_lo8 = (rb_lo // 8) * 8
    sh = int((rb_hi - rb_lo8 + 1).max()) + row_slack
    sh = min(_round_up(max(sh, whc, min_sh, ROW_ALIGN), ROW_ALIGN), src_hp)

    strip_off = np.minimum(rb_lo8, src_hp - sh).astype(np.int32)
    # window start inside the strip, ROW_ALIGN-floored; the sh-whc clamp
    # can only bind when the chunk sits at the strip top, where the window
    # [sh-whc, sh) still covers [req_lo, req_hi] (see derivation above)
    row_rel = req_lo - strip_off[:, :, None]
    chunk_row = ((row_rel // ROW_ALIGN) * ROW_ALIGN).astype(np.int32)
    chunk_row = np.minimum(chunk_row, sh - whc).astype(np.int32)

    win_lo = strip_off[:, :, None] + chunk_row
    cover = (win_lo <= req_lo) & (win_lo + whc > req_hi)
    assert bool(cover[~empty].all()), "strip plan failed to cover all taps"

    c0 = np.clip(np.floor(mx_min) - 1, 0, src_wp - WIN_W).astype(np.int32)
    c128 = np.minimum((c0 // 128) * 128, src_wp - SLAB_W).astype(np.int32)
    dc = (c0 - c128).astype(np.int32)
    assert (chunk_row // ROW_ALIGN).max() <= 0xFF \
        and (c128 // 128).max() <= 0xFF and dc.max() <= 0x1FF, \
        "source too large for packed chunk encoding"
    packed = ((chunk_row // ROW_ALIGN)
              | ((c128 // 128) << 8) | (dc << 16)).astype(np.int32)
    packed = np.where(empty, np.int32(-1), packed)   # sign bit = skip chunk
    return StripPlan(strip_off=strip_off, chunk_packed=packed, sh=sh,
                     whc=whc, src_hp=src_hp, src_wp=src_wp, bh_p=bh, bw_p=bw)


def prep_source(frames_u8):
    """u8 [N, H, W, 3] -> bf16 planar [N, 3, Hp, W] (u8 values are exact in
    bf16; pad rows are zero => BORDER_CONSTANT fringe). Hp is a ROW_ALIGN
    multiple so strip/window row arithmetic stays aligned."""
    n, h, w, _ = frames_u8.shape
    x = jnp.moveaxis(frames_u8, -1, 1).astype(jnp.bfloat16)
    hp = _round_up(h, ROW_ALIGN)
    if hp != h:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, hp - h), (0, 0)))
    return x


def prep_source_nv12(nv12_u8):
    """u8 NV12 [N, H*3/2, W] -> bf16 planar [N, 3, Hp, W].

    Production ingest path: converts on device straight into the warp
    kernel's planar layout (no channel-last intermediate) and uploads
    half the bytes of RGB.
    """
    from video_stitcher_tpu.ops.color import nv12_to_rgb_planar
    x = jax.vmap(lambda f: nv12_to_rgb_planar(f, jnp.bfloat16))(nv12_u8)
    h = x.shape[2]
    hp = _round_up(h, ROW_ALIGN)
    if hp != h:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, hp - h), (0, 0)))
    return x


def _kernel(strip_off, chunk_packed, src_hbm, map_ref,
            out_ref, strip, sem, *, sh, whc, ncc, channels, n_cam, n_rb):
    cam = pl.program_id(0)
    rb = pl.program_id(1)

    def strip_dma(c, r, slot):
        s0 = pl.multiple_of(strip_off[c, r], 8)
        return pltpu.make_async_copy(
            src_hbm.at[c, :, pl.ds(s0, sh), :], strip.at[slot], sem.at[slot])

    slot = jax.lax.rem(rb, 2)
    # double buffering: the very first grid step starts its own strip DMA;
    # every step prefetches the next step's strip before computing
    @pl.when(jnp.logical_and(cam == 0, rb == 0))
    def _():
        strip_dma(cam, rb, slot).start()

    is_last = jnp.logical_and(cam == n_cam - 1, rb == n_rb - 1)

    @pl.when(jnp.logical_not(is_last))
    def _():
        nxt_cam = jnp.where(rb == n_rb - 1, cam + 1, cam)
        nxt_rb = jnp.where(rb == n_rb - 1, 0, rb + 1)
        strip_dma(nxt_cam, nxt_rb, 1 - slot).start()

    strip_dma(cam, rb, slot).wait()
    s0 = pl.multiple_of(strip_off[cam, rb], 8)

    def group(g, _):
        ckg = pl.multiple_of(g * 128, 128)
        mxs = map_ref[0, 0, :, pl.ds(ckg, 128)]      # [8, 128] f32
        mys = map_ref[0, 1, :, pl.ds(ckg, 128)]
        outs = [[] for _ in range(channels)]
        for j in range(GROUP):
            k = g * GROUP + j
            v = chunk_packed[cam, rb, k]

            def compute(_):
                # decode keeps alignment provable: *ROW_ALIGN / *128
                r0 = (v & 0xFF) * ROW_ALIGN
                c128 = ((v >> 8) & 0xFF) * 128
                mxj = mxs[:, j * CHUNK_W:(j + 1) * CHUNK_W]   # [8, 32]
                myj = mys[:, j * CHUNK_W:(j + 1) * CHUNK_W]
                # x coords relative to the 256-lane slab origin: the
                # bilinear one-hot matrix absorbs the sub-slab offset, so
                # no lane rotate of the source data is needed at all
                lx = mxj - c128.astype(jnp.float32)
                ly = myj - (s0 + r0).astype(jnp.float32)
                # Bilinear weights ARE the tent function relu(1 - |k - l|):
                # one subtract/abs/relu chain replaces two one-hot compare+
                # select+mix chains, and out-of-source taps get weight 0
                # with exactly the gather path's partial-tap semantics.

                # X-stage as ONE matmul: tent x-weights as a [256, 256]
                # bf16 matrix, contracted against the slab with channels
                # stacked along slab *rows* -> [256, C*whc]
                kx = jax.lax.broadcasted_iota(
                    jnp.int32, (ROW_BLOCK, CHUNK_W, SLAB_W), 2
                ).astype(jnp.float32)
                wxm = jnp.maximum(0.0, 1.0 - jnp.abs(kx - lx[:, :, None]))
                wxm = wxm.astype(jnp.bfloat16).reshape(
                    ROW_BLOCK * CHUNK_W, SLAB_W)

                slab = jnp.concatenate(
                    [strip[slot, c, pl.ds(r0, whc), pl.ds(c128, SLAB_W)]
                     for c in range(channels)], axis=0)      # [C*whc, 256]

                t1 = jax.lax.dot_general(
                    wxm, slab, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [256, C*whc]

                # Y-stage on the VPU: tent y-weights + two-tap mix over whc
                # lanes per channel
                ky = jax.lax.broadcasted_iota(
                    jnp.int32, (ROW_BLOCK, CHUNK_W, whc), 2
                ).astype(jnp.float32)
                wym = jnp.maximum(
                    0.0, 1.0 - jnp.abs(ky - ly[:, :, None])
                ).reshape(ROW_BLOCK * CHUNK_W, whc)
                vals = []
                for c in range(channels):
                    tc = t1[:, c * whc:(c + 1) * whc]
                    val = jnp.sum(tc * wym, axis=1)          # [256]
                    vals.append(val.reshape(ROW_BLOCK, CHUNK_W))
                return tuple(vals)

            def empty(_):
                return tuple(jnp.zeros((ROW_BLOCK, CHUNK_W), jnp.float32)
                             for _ in range(channels))

            vals = jax.lax.cond(v >= 0, compute, empty, 0)
            for c in range(channels):
                outs[c].append(vals[c])
        for c in range(channels):
            out_ref[0, c, :, pl.ds(ckg, 128)] = jnp.concatenate(
                outs[c], axis=1)
        return 0

    jax.lax.fori_loop(0, ncc // GROUP, group, 0)


@functools.partial(jax.jit, static_argnames=("sh", "whc", "interpret"))
def remap_strips(src_planar, maps, strip_off, chunk_packed, *,
                 sh: int, whc: int, interpret: bool = False):
    """src_planar: bf16 [N, C, Hp, Wp] (prep_source), maps f32 [N, 2, bh_p,
    bw_p] (pad_maps), offsets from plan_strips. Returns f32 [N, C, bh_p, bw_p].
    """
    n, ch, hp, wp = src_planar.shape
    _, _, bh, bw = maps.shape
    nrb = bh // ROW_BLOCK
    ncc = bw // CHUNK_W

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n, nrb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # src stays HBM
            pl.BlockSpec((1, 2, ROW_BLOCK, bw),
                         lambda c, r, *_: (c, 0, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ch, ROW_BLOCK, bw),
                               lambda c, r, *_: (c, 0, r, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, ch, sh, wp), jnp.bfloat16),   # double-buffered
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, sh=sh, whc=whc, ncc=ncc, channels=ch,
                               n_cam=n, n_rb=nrb)
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, ch, bh, bw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )
    return fn(strip_off, chunk_packed, src_planar, maps)
