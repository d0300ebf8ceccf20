"""Production Pallas TPU remap: strip-DMA + chunked tent-weight MXU gathers.

The hot op of the whole framework (replaces cv::cuda::remap at
360_stitcher/timed.cpp:84,90; kernel cv/cudawarping/src/cuda/remap.cu).
XLA lowers an irregular 2-D gather on TPU to per-element loads — measured
~4.2 s for the 6-camera warp — so this kernel restructures the resample
around what the hardware does well: big DMAs and matmuls.

Structure (all offsets precomputed at (re)calibration time, when the maps
change — the maps are FIXED between mesh re-solves):

 1. The band output is processed in row-blocks of 8 rows. For each
    (camera, row-block) one DMA copies the source *strip* containing every
    tap of that row-block (strip height is data-dependent but bounded;
    static cap SH) from HBM to VMEM, double-buffered across grid steps.
 2. Each row-block is split into chunks of 32 output columns. Within a
    chunk the source taps fall in a window of <= WHC rows. Mosaic only
    allows dynamic *lane* indexing at multiples of 128, so the kernel
    reads a 256-lane slab at the 128-aligned floor of the window start.
    In the default SLAB_ROT mode (taps fit 128 lanes of the window
    start — true at any minification) the slab is then lane-rotated by
    the sub-slab offset (as int32: Mosaic's dynamic rotate is
    32-bit-only; the bitcast packs sublane pairs and leaves lanes alone)
    and statically sliced to 128 lanes, halving the weight matrix and
    the x-stage contraction (9.8 -> 9.1 ms/frame). The wide fallback
    folds the sub-slab offset into a 256-sublane weight matrix instead.
 3. Bilinear separates into per-axis tent kernels w(k) = relu(1-|k-l|).
    Per chunk, the X stage is ONE matmul `dot(slab, wx)` with the slab
    as LHS [3*whc, 256] (channels stacked along sublanes) contracting its
    lane (x) axis — the natural MXU orientation; orienting the weights as
    the LHS instead makes Mosaic transpose the slab per chunk (measured
    +13 ms/frame). The tent weights wx are generated directly in MXU-RHS
    layout [K sublanes, out-px lanes] from per-chunk map coords that
    arrive as [1, 256] lane vectors via a chunk-lane-major repack of the
    maps (`repack_maps_lane`, once per (re)calibration) — no
    sublane<->lane relayouts in the hot loop.
 4. The Y stage multiplies t2 [3*whc, 256] by tent y-weights and
    tree-reduces over sublanes -> per-channel [1, 256] out-px rows.
 5. The [1, 256] chunk rows are re-tiled to [8, 32] output tiles by one
    batched selection matmul per 128-lane group: rows for all 4 chunks x
    3 channels are masked into an f32 [24, 4*256] LHS and contracted
    with a constant 0/1 bf16 selection matrix (f32 MXU passes measured
    2.5x slower; per-chunk [8,256]x[256,32] dots and VPU relayouts both
    measured slower still).
 6. The kernel is BRANCH-FREE below the grid level. Empty groups (the
    scalloped band corners — ~half the grid on the real rig) are skipped
    by iterating a host-compacted active-group list with a dynamic
    fori_loop bound over a pre-zeroed output block; empty chunks inside
    active groups compute unconditionally through the zero-weight path
    (their -1 map coords zero every tent weight — exact). The previous
    design guarded both with lax.cond, and on v5e a cond costs as much
    as the chunk body it guards (it defeats Mosaic's software
    pipelining): guarded 9.6 ms vs compacted branch-free 5.8 ms/frame,
    bit-identical output. Attribution measurements behind this (v5e):
    removing the tent-weight generation, the lane rotate, the slab
    reads, and BOTH matmuls from the guarded kernel changes nothing —
    the per-chunk cost was all control flow and scalar-unit work.

End-to-end for the 6-cam 1080p rig: 32.2 ms (v1 weights-as-LHS) ->
10.8 ms (slab-as-LHS) -> 9.6 ms (SLAB_ROT) -> 5.8 ms (branch-free
compacted loop), ~700x vs the XLA gather lowering.

Out-of-source taps (beyond the source or at the reference's -1 "invalid"
marker, build_warp_maps.cu:103-106) fall outside every tent support and
contribute exactly 0; coords within 1 px of the border keep their exact
partial-tap weight — BORDER_CONSTANT semantics, matching
ops.remap.remap_planar(border="constant"). Accuracy vs that f32 gather
reference: the bf16 weight/selection roundings bound the error at ~1/255
on the real rig maps (the reference's own CUDA-vs-CPU blend bound is
3/255, test_blenders.cuda.cpp:95).
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
PX = ROW_BLOCK * CHUNK_W  # out px per chunk (one [1, 256] lane row)
SLAB_W = 256           # lane width of the rotated source slab
# SLAB_ROT: mode code (not a width) — the kernel reads the same 256-lane
# slab but lane-rotates it by the packed dc offset (pltpu.roll supports
# dynamic shifts) and statically slices lanes [0, 128), so the tent-weight
# matrix shrinks to 128 sublanes. That halves both the dominant VPU cost
# (wx generation: ~320 of ~430 vector issues/chunk at 256) and the x-stage
# MXU contraction. Chosen by the planner whenever every chunk's taps fit
# 128 lanes from the tap-window start (true at any minification; the code
# sits between 128 and 256 so min_slab_w's max() keeps a WIDE plan sticky
# across recalibs and never narrows one illegally).
SLAB_ROT = 192
# Narrower rot windows: the same rotate, sliced to kw < 128 lanes — the
# tent-weight matrix shrinks to kw sublanes. Mode code = 128 + kw//2 for
# kw in {64, 80, 96, 112, 128} (so SLAB_ROT itself is the kw=128 point
# and codes order narrow -> wide, keeping min_slab_w's max() stickiness
# exact). MEASURED NEGATIVE on v5e (tools/bench_warp.py, real rig maps,
# same process): kw=80 5.62 ms vs kw=96/112/128 all ~5.45 ms — sub-128
# windows save wx sublanes but the kernel is control-flow/scalar-issue
# bound per chunk (see attribution note below), and masked sub-tile lane
# extents cost more than the VPU they save. The planner therefore keeps
# SLAB_ROT (kw=128); narrow modes remain env-selectable (VST_SLAB_W=160..
# 184) and parity-tested so the result is reproducible.
SLAB_ROT64 = 160
ROT_KWS = (64, 80, 96, 112, 128)


def _rot_code(kw: int) -> int:
    return 128 + kw // 2


def _rot_kw(code: int) -> int:
    """Window lanes for a rot-mode code (128 < code < SLAB_W)."""
    return (code - 128) * 2
WIN_W = 128            # lane width of the in-register window
ROW_ALIGN = 16         # window row starts aligned to the bf16 sublane tile
# when ONE full per-camera source fits the resident budget, the plan sets
# sh = src_hp and the kernel DMAs each camera once (resident-source mode)
# instead of one overlapping strip per row-block — ~10x less HBM traffic
# on the 1080p rig (1.48 GB -> 0.15 GB per frame). The kernel
# double-buffers the resident source across cameras when TWO copies fit,
# else uses a single slot (one un-overlapped source DMA per camera).
# The budget is derived from the device generation's VMEM size (there is no
# query API): the plan falls back to strip mode when the source doesn't
# fit, so a wrong guess costs bandwidth, not a compile failure.
_VMEM_LARGE = 128 << 20      # v5e / v5p / v6e cores
_VMEM_SMALL = 16 << 20       # v2/v3/unknown (pallas_guide.md: ~16 MB/core)


@functools.lru_cache(maxsize=1)
def device_vmem_bytes() -> int:
    """Per-core VMEM size guess for the first visible device."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ""
    large = any(t in kind for t in ("v5 lite", "v5e", "v5p", "v6 lite",
                                    "v6e", "v6p", "v7"))
    return _VMEM_LARGE if large else _VMEM_SMALL


def resident_src_budget() -> int:
    """Max bytes for the double-buffered resident-source VMEM scratch."""
    import os
    env = os.environ.get("VST_RESIDENT_SRC_BYTES")
    if env:
        return int(env)
    # leave ~half the VMEM for blocks, weights and compiler temporaries
    return (device_vmem_bytes() * 7) // 16


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ChunkStats(NamedTuple):
    """Per-chunk tap-coordinate extrema [N, nrb, ncc] — everything the
    strip planner needs from the (large) map tensors. Computable on device
    (chunk_stats_device) so recalibration never downloads the ~100 MB maps:
    only these ~0.5 MB stats cross to the host."""
    my_min: np.ndarray
    my_max: np.ndarray
    mx_min: np.ndarray
    mx_max: np.ndarray

    def union(self, other: "ChunkStats") -> "ChunkStats":
        """Cover both endpoints (per-chunk interval hull) — by convexity
        also covers every linear interpolation between the two maps."""
        return ChunkStats(my_min=np.minimum(self.my_min, other.my_min),
                          my_max=np.maximum(self.my_max, other.my_max),
                          mx_min=np.minimum(self.mx_min, other.mx_min),
                          mx_max=np.maximum(self.mx_max, other.mx_max))


class StripPlan(NamedTuple):
    """Scalar-prefetch arrays + static sizes for remap_strips.

    Array shapes: strip_off [N, nrb]; chunk_packed [N, nrb, ncc] with
    (window_row//8 | (c128//128)<<8 | dc<<16) packed per chunk; groups
    [N, nrb, ncc//GROUP + 1] — per row-block, [0] is the number of
    ACTIVE 128-lane groups (any non-empty chunk) and [1:] lists their
    indices active-first (the kernel's branch-free compacted loop) — the
    scalar-prefetch arrays live in SMEM (~1 MB), so one word per chunk.
    Static: sh/whc (strip/window heights), slab_w (x-slab mode: SLAB_ROT
    when every chunk's in-source taps fit 128 lanes of the window start
    — the default on real rigs; SLAB_W wide fallback; 128 = the
    interpret-only 32-aligned experiment), src_hp/src_wp (padded
    source), bh_p/bw_p (padded band). stats: the ChunkStats the plan was
    derived from (callers stash them to later plan interpolation unions
    without touching the maps again).
    """
    strip_off: np.ndarray
    chunk_packed: np.ndarray
    groups: np.ndarray
    sh: int
    whc: int
    slab_w: int
    src_hp: int
    src_wp: int
    bh_p: int
    bw_p: int
    stats: "ChunkStats"


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


_STATS_BIG = 1e9


@jax.jit
def pad_maps_device(maps):
    """Device twin of pad_maps: [N, 2, bh, bw] -> ROW_BLOCK/128-padded
    with -1 (invalid). Keeps recalibrated maps on device."""
    n, _, bh, bw = maps.shape
    ph = _round_up(bh, ROW_BLOCK)
    pw = _round_up(bw, 128)
    if ph == bh and pw == bw:
        return maps
    return jnp.pad(maps, ((0, 0), (0, 0), (0, ph - bh), (0, pw - bw)),
                   constant_values=-1.0)


def _chunk_stats(maps: np.ndarray, src_h: int, src_w: int) -> ChunkStats:
    """Per-chunk min/max of valid map coords (empty chunks carry +-big)."""
    n, _, bh, bw = maps.shape
    nrb = bh // ROW_BLOCK
    ncc = bw // CHUNK_W
    mx = maps[:, 0].reshape(n, nrb, ROW_BLOCK, ncc, CHUNK_W)
    my = maps[:, 1].reshape(n, nrb, ROW_BLOCK, ncc, CHUNK_W)
    # a sample contributes whenever ANY of its 4 taps lands in the source:
    # coords in (-1, 0) still hit tap x0+1/y0+1 (the gather reference
    # weights them accordingly), so the window plan must include them;
    # the reference's -1.0 invalid marker stays excluded (strict >)
    valid = (mx > -1) & (my > -1) & (mx < src_w) & (my < src_h)
    big = _STATS_BIG
    return ChunkStats(
        my_min=np.where(valid, my, big).min(axis=(2, 4)),    # [n, nrb, ncc]
        my_max=np.where(valid, my, -big).max(axis=(2, 4)),
        mx_min=np.where(valid, mx, big).min(axis=(2, 4)),
        mx_max=np.where(valid, mx, -big).max(axis=(2, 4)))


@functools.partial(jax.jit, static_argnames=("src_h", "src_w"))
def chunk_stats_device(maps, src_h: int, src_w: int):
    """Device twin of _chunk_stats for padded maps [N, 2, bh_p, bw_p].

    Recalibration keeps the ~100 MB fused maps on device and fetches only
    these [N, nrb, ncc] reductions (~0.5 MB) to plan strips on the host."""
    n, _, bh, bw = maps.shape
    nrb = bh // ROW_BLOCK
    ncc = bw // CHUNK_W
    mx = maps[:, 0].reshape(n, nrb, ROW_BLOCK, ncc, CHUNK_W)
    my = maps[:, 1].reshape(n, nrb, ROW_BLOCK, ncc, CHUNK_W)
    valid = (mx > -1) & (my > -1) & (mx < src_w) & (my < src_h)
    big = _STATS_BIG
    return ChunkStats(
        my_min=jnp.where(valid, my, big).min(axis=(2, 4)),
        my_max=jnp.where(valid, my, -big).max(axis=(2, 4)),
        mx_min=jnp.where(valid, mx, big).min(axis=(2, 4)),
        mx_max=jnp.where(valid, mx, -big).max(axis=(2, 4)))


def plan_strips(maps: np.ndarray, src_h: int, src_w: int,
                row_slack: int = 8, min_sh: int = 0,
                min_whc: int = 0, maps_b: np.ndarray | None = None,
                channels: int = 3, min_slab_w: int = 0) -> StripPlan:
    """Precompute strip/chunk offsets for padded maps [N, 2, bh_p, bw_p].

    The x window is a fixed 128 lanes; the plan asserts per-chunk x spans
    fit (they do whenever the horizontal magnification is < ~3.9x over a
    32-px chunk). row_slack widens the static heights so small mesh
    recalibrations don't force a re-jit.

    maps_b: optional second endpoint — the plan then covers BOTH maps and,
    by convexity of per-chunk tap intervals, every linear interpolation
    between them (the RECALIB_INTERP mesh animation, timed.cpp:452-459)
    for samples valid at both endpoints; samples whose validity flips
    between the maps (band edges, ~0 blend weight) may lerp outside the
    window and render 0 transiently.
    """
    n, _, bh, bw = maps.shape
    assert bh % ROW_BLOCK == 0 and bw % 128 == 0
    stats = _chunk_stats(maps, src_h, src_w)
    if maps_b is not None:
        assert maps_b.shape == maps.shape
        stats = stats.union(_chunk_stats(maps_b, src_h, src_w))
    return plan_strips_from_stats(stats, (bh, bw), src_h, src_w,
                                  row_slack=row_slack, min_sh=min_sh,
                                  min_whc=min_whc, channels=channels,
                                  min_slab_w=min_slab_w)


def plan_strips_from_stats(stats: ChunkStats, band_shape, src_h: int,
                           src_w: int, row_slack: int = 8, min_sh: int = 0,
                           min_whc: int = 0,
                           channels: int = 3,
                           min_slab_w: int = 0) -> StripPlan:
    """Plan strips from per-chunk stats (host np arrays; see ChunkStats).
    band_shape = (bh_p, bw_p), the padded band dims the stats came from."""
    bh, bw = band_shape
    assert src_w % 128 == 0 and src_w >= SLAB_W
    nrb = bh // ROW_BLOCK
    ncc = bw // CHUNK_W
    stats = ChunkStats(*(np.asarray(a) for a in stats))
    # working copies: empty chunks (sentinel-filled) plan as dummy [0, 0]
    my_min, my_max, mx_min, mx_max = (a.copy() for a in stats)
    n = my_min.shape[0]
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
    # Measured-negative: shaving row_slack to 0 does not shrink whc on the
    # production rig (the worst chunk y-span plus ROW_ALIGN flooring already
    # lands on the same 64-row multiple), and the timed kernel is identical
    # within dev-TPU noise (12.8 vs 13.3 ms across runs). Keep slack=8 for
    # its re-jit immunity to small mesh drift.

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
    # resident-source mode whenever even ONE source copy fits the budget:
    # strip mode's per-row-block DMAs are hugely redundant when row-block
    # source spans are large (cylinder curvature across a band row — at a
    # 4-cam 4K rig sh would be 896 of 2176, i.e. 13 GB of overlapping DMA
    # per frame, measured ~950 ms/frame). The kernel picks single- vs
    # double-buffered residency from the same budget (see _strip_slots);
    # single-slot costs only one un-overlapped source DMA per camera
    # (~60 us at 4K).
    if channels * src_hp * src_wp * 2 <= resident_src_budget():
        sh = src_hp                     # resident-source mode (see kernel)

    strip_off = np.minimum(rb_lo8, src_hp - sh).astype(np.int32)
    # fully-empty row-blocks (the scalloped band top/bottom — ~30% of the
    # grid on the real rig) are flagged with a negative offset: the kernel
    # skips their strip DMA entirely and just zeros the output block
    strip_off = np.where(rb_all_empty, np.int32(-8), strip_off)
    # window start inside the strip, ROW_ALIGN-floored; the sh-whc clamp
    # can only bind when the chunk sits at the strip top, where the window
    # [sh-whc, sh) still covers [req_lo, req_hi] (see derivation above)
    row_rel = req_lo - strip_off[:, :, None]
    chunk_row = ((row_rel // ROW_ALIGN) * ROW_ALIGN).astype(np.int32)
    chunk_row = np.minimum(chunk_row, sh - whc).astype(np.int32)

    win_lo = strip_off[:, :, None] + chunk_row
    cover = (win_lo <= req_lo) & (win_lo + whc > req_hi)
    assert bool(cover[~empty].all()), "strip plan failed to cover all taps"

    # exact window start, clipped per mode: a kw-lane window must start
    # by src_wp-kw (right-edge chunks would spuriously fail narrow-window
    # fits under the 128 clip)
    c0u = np.clip(np.floor(mx_min) - 1, 0, None).astype(np.int32)
    c0 = np.minimum(c0u, src_wp - WIN_W)
    # x-slab mode. The production default is SLAB_ROT (dynamic lane-rotate
    # to a 128-lane window; 9.8 -> 9.1 ms/frame on the rig). Negative
    # results, measured on v5e and recorded so they aren't retried (the
    # kernel is VPU-issue-bound on tent-weight construction; ~3% of HBM):
    #  * slab_w=128 at sub-128 window alignment DOES NOT COMPILE on
    #    hardware — Mosaic requires dynamic lane-slice starts to be
    #    multiples of 128 ("cannot statically prove that index in
    #    dimension 3 is a multiple of 128"); it runs only in interpret
    #    mode, kept as a covered experiment via VST_SLAB_W=128. The
    #    rotate+static-slice of SLAB_ROT is the compiling equivalent.
    #  * PRECOMPUTING the x tent weights per recalibration and streaming
    #    them (they depend only on the maps) removes the VPU work but is
    #    bandwidth-negative: at 256-lane K the weight tensor is
    #    6.5 GB/frame of DMA (~8 ms at v5e HBM) vs the ~5 ms of VPU it
    #    saves.
    #  * bf16 weight-chain arithmetic: neutral at SLAB_ROT, slower at
    #    SLAB_W (see kernel comment) — v5e Mosaic doesn't pack it.
    #  * chunk-PAIR fusion (2 adjacent chunks sharing one decode + slab
    #    rotate + [128, 512] x-matmul, halving per-chunk scalar work):
    #    on the real rig some pairs' unioned taps DON'T fit 128 lanes
    #    (span_pair > 127 at the band edges), and even as a timing proxy
    #    it measured SLOWER (5.74 vs 5.38 ms) — the pair-union whc grows
    #    64 -> 80 and the wider slab/wy work eats the savings.
    #  * superstep grid (4-8 row-blocks per grid step, two-level
    #    compacted lists): only ~0.2 ms over the per-rb compacted loop —
    #    not worth the encoding complexity.
    import os
    env_slab = os.environ.get("VST_SLAB_W")
    c32 = np.minimum((c0 // 32) * 32, src_wp - 128).astype(np.int32)
    # (right-edge windows may "miss" taps pointing past the padded
    # source — those read zero padding on every path, so they don't
    # count against the fit)
    fits32 = bool(np.all(empty | (np.floor(mx_max) + 2 <= c32 + 128)
                         | (c32 + 128 == src_wp)))
    # SLAB_ROT fits when every chunk's rightmost IN-SOURCE tap is within
    # 128 lanes of the window start c0. Taps at x >= src_w contribute 0 on
    # every path (BORDER_CONSTANT / zero weight at the slab edge), so they
    # are exempt — without the exemption, right-edge chunks (where c0's
    # src_wp-128 clip binds) would spuriously force the wide slab.
    x1_in = np.minimum(np.floor(mx_max) + 1, src_wp - 1)

    def _fits_kw(kw: int) -> bool:
        c0_k = np.minimum(c0u, src_wp - kw)
        return bool(np.all(empty | (x1_in - c0_k <= kw - 1)))

    # production pick: kw=128 rot when it fits, else the wide slab.
    # Narrower kw measured slower on v5e (see module note at ROT_KWS);
    # they stay reachable via VST_SLAB_W for A/Bs.
    slab_w = SLAB_ROT if _fits_kw(128) else SLAB_W
    slab_w = max(slab_w, min_slab_w)
    if env_slab:
        e = int(env_slab)
        if (e == SLAB_W or (e == 128 and fits32)
                or (128 < e < SLAB_W and _fits_kw(_rot_kw(e)))):
            slab_w = e
    if 128 < slab_w < SLAB_W:
        # pack the exact kw-clipped window start (wider modes decode the
        # same packing into a superset window, so a narrow plan stays
        # valid if run at a wider slab_w)
        c0 = np.minimum(c0u, src_wp - _rot_kw(slab_w))
    if slab_w == 128:
        assert (chunk_row // ROW_ALIGN).max() <= 0xFF \
            and (c32 // 32).max() <= 0x3FF, \
            "source too large for packed chunk encoding"
        packed = ((chunk_row // ROW_ALIGN)
                  | ((c32 // 32) << 8)).astype(np.int32)
    else:
        c128 = np.minimum((c0 // 128) * 128, src_wp - SLAB_W).astype(np.int32)
        dc = (c0 - c128).astype(np.int32)
        assert (chunk_row // ROW_ALIGN).max() <= 0xFF \
            and (c128 // 128).max() <= 0xFF and dc.max() <= 0x1FF, \
            "source too large for packed chunk encoding"
        packed = ((chunk_row // ROW_ALIGN)
                  | ((c128 // 128) << 8) | (dc << 16)).astype(np.int32)
    packed = np.where(empty, np.int32(-1), packed)   # sign bit = empty chunk
    return StripPlan(strip_off=strip_off, chunk_packed=packed,
                     groups=groups_from_packed(packed), sh=sh,
                     whc=whc, slab_w=slab_w, src_hp=src_hp, src_wp=src_wp,
                     bh_p=bh, bw_p=bw, stats=stats)


def groups_from_packed(packed: np.ndarray) -> np.ndarray:
    """Compacted active-group lists from packed chunk offsets [N, nrb, ncc].

    Returns i32 [N, nrb, ncc//GROUP + 1]: [..., 0] = number of 128-lane
    groups with any non-empty chunk; [..., 1:] = group indices,
    active-first in ascending order. Drives the kernel's branch-free
    dynamic-bound group loop (see module docs, point 6)."""
    n, nrb, ncc = packed.shape
    act = (packed >= 0).reshape(n, nrb, ncc // GROUP, GROUP).any(-1)
    order = np.argsort(~act, axis=-1, kind="stable").astype(np.int32)
    return np.concatenate(
        [act.sum(-1, dtype=np.int32)[..., None], order], axis=-1)


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


@jax.jit
def repack_maps_lane(maps):
    """[N, 2, bh_p, bw_p] -> chunk-lane-major f32 [N, nrb, 2, ncc*256].

    Element [n, rb, a, k*256 + r*CHUNK_W + c] = maps[n, a, rb*8+r, k*32+c]:
    each chunk's 8x32 map tile becomes one contiguous 256-lane vector, so
    the kernel reads per-chunk coords with a plain lane slice (a
    sublane->lane relayout per chunk otherwise dominates the VPU). Runs
    once per (re)calibration, on device.
    """
    n, two, bh, bw = maps.shape
    nrb = bh // ROW_BLOCK
    ncc = bw // CHUNK_W
    x = maps.reshape(n, two, nrb, ROW_BLOCK, ncc, CHUNK_W)
    x = x.transpose(0, 2, 1, 4, 3, 5)          # [n, nrb, 2, ncc, 8, 32]
    return x.reshape(n, nrb, two, ncc * PX)


def _kernel(strip_off, chunk_packed, groups, gains, src_hbm, map_ref,
            out_ref, strip, sem, *, sh, whc, slab_w, channels,
            n_cam, n_rb, n_maps):
    cam = pl.program_id(0)
    rb = pl.program_id(1)
    # batched-frame mode (stitch_batch): n_cam = B * n_maps cameras share
    # the n_maps per-camera plans/maps cyclically; cam_m indexes the plan
    # set, cam the source/gain/output
    cam_m = cam if n_maps == n_cam else jax.lax.rem(cam, n_maps)
    full_src = sh == src_hbm.shape[2]   # resident-source mode (static)

    if full_src:
        # one DMA per CAMERA: the whole source plane stays resident across
        # its row-blocks — double-buffered across cameras when two copies
        # fit the VMEM budget, else a single slot (the next camera's DMA
        # then can't prefetch, costing one un-overlapped source copy per
        # camera — ~60 us for a 4K plane, vs strip mode's ~13 GB of
        # overlapping per-row-block DMAs on the same rig)
        def cam_dma(c, s):
            return pltpu.make_async_copy(src_hbm.at[c], strip.at[s],
                                         sem.at[s])

        if strip.shape[0] == 1:
            slot = 0

            @pl.when(rb == 0)
            def _():
                cam_dma(cam, 0).start()
                cam_dma(cam, 0).wait()
        else:
            slot = jax.lax.rem(cam, 2)

            @pl.when(jnp.logical_and(cam == 0, rb == 0))
            def _():
                cam_dma(cam, slot).start()

            @pl.when(jnp.logical_and(rb == 0, cam < n_cam - 1))
            def _():
                cam_dma(cam + 1, 1 - slot).start()

            @pl.when(rb == 0)
            def _():
                cam_dma(cam, slot).wait()

        s0 = 0                          # strip row 0 IS source row 0
    else:
        def strip_dma(c, r, slot):
            cm = c if n_maps == n_cam else jax.lax.rem(c, n_maps)
            s0 = pl.multiple_of(strip_off[cm, r], 8)
            return pltpu.make_async_copy(
                src_hbm.at[c, :, pl.ds(s0, sh), :], strip.at[slot],
                sem.at[slot])

        nonempty = strip_off[cam_m, rb] >= 0
        # slot parity follows the GLOBAL grid step (not rb alone): with an
        # odd n_rb, rb-parity would break the prefetch chain at every
        # camera boundary (prefetch lands in one buffer, the next step
        # waits on the other -> hang)
        slot = jax.lax.rem(cam * n_rb + rb, 2)
        # double buffering: the very first grid step starts its own strip
        # DMA; every step prefetches the next step's strip before
        # computing. Fully-empty row-blocks (negative strip_off) never
        # DMA: each DMA is started exactly once — by the predecessor step,
        # or by step 0 itself.
        @pl.when(jnp.logical_and(jnp.logical_and(cam == 0, rb == 0),
                                 nonempty))
        def _():
            strip_dma(cam, rb, slot).start()

        is_last = jnp.logical_and(cam == n_cam - 1, rb == n_rb - 1)
        nxt_cam = jnp.where(rb == n_rb - 1, cam + 1, cam)
        nxt_rb = jnp.where(rb == n_rb - 1, 0, rb + 1)
        nxt_cam = jnp.where(is_last, cam, nxt_cam)   # keep indices in range
        nxt_rb = jnp.where(is_last, rb, nxt_rb)

        nxt_m = (nxt_cam if n_maps == n_cam
                 else jax.lax.rem(nxt_cam, n_maps))

        @pl.when(jnp.logical_and(jnp.logical_not(is_last),
                                 strip_off[nxt_m, nxt_rb] >= 0))
        def _():
            strip_dma(nxt_cam, nxt_rb, 1 - slot).start()

        @pl.when(nonempty)
        def _():
            strip_dma(cam, rb, slot).wait()

        s0 = pl.multiple_of(strip_off[cam_m, rb], 8)

    # weight K extent / slab read lanes (the rot modes read the full
    # 256-lane slab but rotate+slice it to a kw-lane window)
    rot = 128 < slab_w < SLAB_W
    kw = _rot_kw(slab_w) if rot else (128 if slab_w == 128 else slab_w)
    rw = SLAB_W if rot else slab_w
    # loop-invariant constants (hoisted by Mosaic):
    # tap-index iotas along sublanes, in the weights' MXU-RHS layout
    kx = jax.lax.broadcasted_iota(jnp.int32, (kw, PX), 0)
    kx = kx.astype(jnp.float32)
    ky = jax.lax.broadcasted_iota(jnp.int32, (whc, PX), 0).astype(jnp.float32)
    # re-tile mask [ch*8, 256]: row (c, r) keeps lanes with q//CHUNK_W == r
    qi = jax.lax.broadcasted_iota(jnp.int32, (channels * ROW_BLOCK, PX), 1)
    ri = jax.lax.broadcasted_iota(
        jnp.int32, (channels * ROW_BLOCK, PX), 0) % ROW_BLOCK
    m1 = (qi // CHUNK_W == ri).astype(jnp.float32)
    # re-tile selection [GROUP*256, 128]: (j, q) -> out col 32*j + q%32
    qq = jax.lax.broadcasted_iota(jnp.int32, (GROUP * PX, 128), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (GROUP * PX, 128), 1)
    b2 = ((qq // PX) * CHUNK_W + (qq % CHUNK_W) == cc).astype(jnp.bfloat16)

    # the whole output block is zeroed up front so the compacted group
    # loop below only ever touches ACTIVE groups; empty groups (scalloped
    # band corners, ~half the grid on the real rig) cost nothing at all
    bw_p = out_ref.shape[3]
    out_ref[...] = jnp.zeros((1, channels, ROW_BLOCK, bw_p), jnp.float32)

    def chunk_rows(k, v):
        """One chunk -> per-channel out-px rows, stacked [channels, 256].

        Runs UNCONDITIONALLY, including on empty chunks (packed -1):
        max(v, 0) decodes them to in-range window [0, 0] and their map
        coords are -1, so every tent weight is exactly 0 and the chunk
        contributes zeros — the same BORDER_CONSTANT zero-weight path
        out-of-source taps take. Measured bit-exact vs the old guarded
        kernel, and branch-free: a lax.cond around the chunk body costs
        as much as the body itself on v5e (it defeats Mosaic's software
        pipelining; guarded 9.6 ms vs compacted+branch-free 5.8 ms for
        the 6-cam rig)."""
        v = jnp.maximum(v, 0)
        r0 = (v & 0xFF) * ROW_ALIGN
        if slab_w == 128:
            c_off = ((v >> 8) & 0x3FF) * 32    # 32-aligned 128-lane slab
        else:
            c_off = ((v >> 8) & 0xFF) * 128
        # chunk map coords as [1, 256] lane vectors — no relayout
        lx = map_ref[0, 0, 0, pl.ds(k * PX, PX)][None, :]
        ly = map_ref[0, 0, 1, pl.ds(k * PX, PX)][None, :]
        lx = lx - c_off.astype(jnp.float32)
        ly = ly - (s0 + r0).astype(jnp.float32)
        if rot:
            dc = (v >> 16) & 0x1FF             # window start inside the slab
            lx = lx - dc.astype(jnp.float32)

        # Bilinear weights ARE the tent function relu(1 - |k - l|):
        # out-of-source taps get weight 0 with exactly the gather path's
        # partial-tap semantics. Generated straight in [K sub, M lanes].
        # (A per-chunk K-split contracting only the 128-lane slab half that
        # carries taps measured SLOWER — 10.4 vs 10.1 ms — the extra conds
        # cost more than the ~32% FLOP saving; the x-stage is not the
        # bottleneck once empty chunks are skipped.)
        # (Running the abs/1-/max chain in bf16 after an f32 subtract — in
        # the hope Mosaic packs bf16 ALU ops — measured NEUTRAL at
        # SLAB_ROT (9.06 vs 9.11 ms) and SLOWER at SLAB_W (10.13 vs
        # 9.83 ms): v5e Mosaic doesn't pack the chain, and the extra
        # convert costs. Kept f32.)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(kx - lx)).astype(jnp.bfloat16)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ky - ly))      # [whc, 256] f32

        slab = jnp.concatenate(
            [strip[slot, c, pl.ds(r0, whc), pl.ds(c_off, rw)]
             for c in range(channels)], axis=0)        # [C*whc, rw]
        if rot:
            # bring lanes [dc, dc+kw) to [0, kw): all in-source taps live
            # there (plan guarantees rightmost in-source tap <= c0+kw-1);
            # lanes that wrap around from the slab head carry weight 0 by
            # the same bound. Mosaic's dynamic rotate is 32-bit-only, so
            # rotate the slab as int32 (bitcast packs SUBLANE pairs; lanes
            # are untouched, so the per-lane rotate + roundtrip is exact).
            s32 = pltpu.bitcast(slab, jnp.int32)
            s32 = pltpu.roll(s32, shift=(SLAB_W - dc) % SLAB_W, axis=1)
            slab = pltpu.bitcast(s32, jnp.bfloat16)[:, :kw]

        # x-stage: slab LHS contracts its lane (x) axis — natural MXU
        # orientation, no operand transposes
        t2 = jax.lax.dot_general(
            slab, wx, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [C*whc, 256]

        # y-stage: per-channel sublane-weighted tree reduction
        vals = []
        for c in range(channels):
            m = t2[c * whc:(c + 1) * whc, :] * wy
            vals.append(jnp.sum(m, axis=0, keepdims=True))   # [1, 256]
        return jnp.concatenate(vals, axis=0)               # [channels, 256]

    def group(i, _):
        # i-th ACTIVE group of this row-block, from the plan's compacted
        # list (groups[..., 0] is the count driving the loop bound)
        g = groups[cam_m, rb, 1 + i]
        ckg = pl.multiple_of(g * 128, 128)
        ls = []
        for j in range(GROUP):
            k = g * GROUP + j
            val = chunk_rows(k, chunk_packed[cam_m, rb, k])
            # [ch, 256] -> masked [ch*8, 256] re-tile LHS rows
            ls.append(jnp.broadcast_to(
                val[:, None, :], (channels, ROW_BLOCK, PX)
            ).reshape(channels * ROW_BLOCK, PX) * m1)
        lbig = jnp.concatenate(ls, axis=1)   # [ch*8, GROUP*256]
        # one selection matmul re-tiles the whole group's rows to
        # [8, 128] tiles (bf16: f32 MXU passes measured 2.5x slower;
        # +-0.5/255)
        o = jax.lax.dot_general(
            lbig.astype(jnp.bfloat16), b2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [ch*8, 128]
        # per-camera gain + u8-range clamp fused into the output write
        # (timed.cpp:94 convertTo) — saves a full elementwise pass over
        # the 164 MB band tensor between the warp and blend programs
        o = jnp.clip(o * gains[cam], 0.0, 255.0)
        for c in range(channels):
            out_ref[0, c, :, pl.ds(ckg, 128)] = \
                o[c * ROW_BLOCK:(c + 1) * ROW_BLOCK, :]
        return 0

    jax.lax.fori_loop(0, groups[cam_m, rb, 0], group, 0)


@functools.partial(jax.jit,
                   static_argnames=("sh", "whc", "slab_w", "interpret"))
def remap_strips(src_planar, maps_lane, strip_off, chunk_packed, groups, *,
                 sh: int, whc: int, slab_w: int, gains=None,
                 interpret: bool = False):
    """src_planar: bf16 [N, C, Hp, Wp] (prep_source); maps_lane: f32
    [N, nrb, 2, ncc*256] (repack_maps_lane of pad_maps output); offsets +
    compacted group lists from plan_strips; sh/whc/slab_w: the plan's
    static sizes (the packed chunk encoding differs between slab widths —
    always pass the SAME plan's values together); gains: optional f32 [N]
    per-camera multiplier fused into the output write (with the u8-range
    clamp). Returns f32 [N, C, bh_p, bw_p].

    Batched frames (Stitcher.stitch_batch): src_planar/gains may carry
    N = B * n_maps cameras while the plan/maps arrays stay [n_maps, ...];
    cameras reuse the plan set cyclically (the maps are per-CAMERA state,
    identical across the B frame sets).
    """
    n, ch, hp, wp = src_planar.shape
    n_maps, nrb, _, nl = maps_lane.shape
    assert n % n_maps == 0, (n, n_maps)
    ncc = nl // PX
    bh = nrb * ROW_BLOCK
    bw = ncc * CHUNK_W
    if gains is None:
        gains = jnp.ones((n,), jnp.float32)

    # residency slots: 2 when double-buffering fits the budget, 1 for the
    # single-slot resident mode (full source, large planes — e.g. 4K);
    # strip mode always double-buffers (its strips are small)
    full_src = sh == hp
    slots = 1 if (full_src
                  and 2 * ch * sh * wp * 2 > resident_src_budget()) else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n, nrb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # src stays HBM
            pl.BlockSpec((1, 1, 2, nl),
                         lambda c, r, *_, _nm=n_maps: (c % _nm, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ch, ROW_BLOCK, bw),
                               lambda c, r, *_: (c, 0, r, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slots, ch, sh, wp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )
    kernel = functools.partial(_kernel, sh=sh, whc=whc, slab_w=slab_w,
                               channels=ch, n_cam=n, n_rb=nrb,
                               n_maps=n_maps)
    # the double-buffered strip scratch alone can exceed Mosaic's default
    # 16 MB scoped-vmem limit at 4K+ sources (2*C*sh*W bf16); size the
    # limit to the actual allocation plus headroom for blocks/registers,
    # capped at the device generation's VMEM (see resident_src_budget)
    strip_bytes = slots * ch * sh * wp * 2
    vmem_cap = max(device_vmem_bytes() - (16 << 20), 12 << 20)
    vmem_limit = min(vmem_cap, strip_bytes + 24 * 1024 * 1024)
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, ch, bh, bw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )
    return fn(strip_off, chunk_packed, groups,
              jnp.asarray(gains, jnp.float32), src_planar, maps_lane)
