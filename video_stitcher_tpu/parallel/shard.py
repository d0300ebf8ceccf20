"""Multi-chip stitching: cameras sharded over a jax Mesh.

The reference is single-GPU with per-camera CUDA streams
(360_stitcher/timed.cpp:64,127-132); the natural TPU scale-out (SURVEY.md
§2d) shards the camera axis over devices: each chip uploads+warps+pyramids
its own cameras, and the weighted pyramid contributions are combined with a
single `psum` per level over ICI — the 6-camera panorama accumulation IS a
reduction, so the collective is the whole communication story.

Inside shard_map the per-camera band corners become *traced* values
(corner = corners[axis_index]), so placement uses lax.dynamic_update_slice
on a double-width canvas folded in half for ring wraparound (statically-known
corners in the single-chip path keep using cheap static slicing).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_stitcher_tpu.calib.calibration import StitchGeometry
from video_stitcher_tpu.calib.state import CalibState
from video_stitcher_tpu.ops.pyramid import laplacian_pyramid, pyr_up
from video_stitcher_tpu.ops.remap import remap_planar


def _dyn_place(pano, band, corner, pano_w: int, wrap: bool):
    """Add `band` [..., h, bw] into `pano` [..., h, pw] at traced x-offset."""
    bw = band.shape[-1]
    if not wrap:
        corner = jnp.clip(corner, 0, pano_w - bw)
        cur = jax.lax.dynamic_slice_in_dim(pano, corner, bw, axis=pano.ndim - 1)
        return jax.lax.dynamic_update_slice_in_dim(pano, cur + band, corner,
                                                   axis=pano.ndim - 1)
    corner = jnp.mod(corner, pano_w)
    wide = jnp.concatenate([pano, jnp.zeros_like(pano)], axis=-1)
    cur = jax.lax.dynamic_slice_in_dim(wide, corner, bw, axis=pano.ndim - 1)
    wide = jax.lax.dynamic_update_slice_in_dim(wide, cur + band, corner,
                                               axis=pano.ndim - 1)
    return wide[..., :pano_w] + wide[..., pano_w:]


def pad_cameras(arr: np.ndarray, total: int, fill=0) -> np.ndarray:
    """Pad the leading camera axis up to `total` (fill: padded cameras of
    the strip plan use -1/-8 skip flags so they cost nothing)."""
    if arr.shape[0] == total:
        return arr
    pad = [(0, total - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)


def _put(arr, total: int, sharding, fill=0):
    """device_put with camera-axis padding. Already-correctly-sized jax
    arrays reshard device-to-device (no host roundtrip — recalibration
    re-shards its device-resident state every swap)."""
    if isinstance(arr, jax.Array) and arr.shape[0] == total:
        return jax.device_put(arr, sharding)
    return jax.device_put(pad_cameras(np.asarray(arr), total, fill), sharding)


def shard_state(state: CalibState, geom: StitchGeometry, mesh: Mesh,
                axis: str = "cam"):
    """Pad camera-axis arrays to the mesh size and shard them."""
    n_dev = mesh.shape[axis]
    n = state.fused_maps.shape[0]
    total = ((n + n_dev - 1) // n_dev) * n_dev
    cam_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    fused = _put(state.fused_maps, total, cam_sharding)
    gains = _put(state.gains, total, cam_sharding)
    wpyr = tuple(_put(w, total, cam_sharding) for w in state.weight_pyr)
    valid = jax.device_put(state.valid_mask, rep)
    corners = np.asarray(list(geom.layout.corners) + [0] * (total - n), np.int32)
    so = cp = wml = gl = None
    if state.warp_maps_lane is not None:
        # strip-warp plan, sharded with the cameras; padded cameras carry
        # the kernel's skip flags (negative strip_off / chunk_packed,
        # zero active-group counts)
        so = _put(state.warp_strip_off, total, cam_sharding, fill=-8)
        cp = _put(state.warp_chunk_packed, total, cam_sharding, fill=-1)
        wml = _put(state.warp_maps_lane, total, cam_sharding, fill=-1)
        gl = _put(state.warp_groups, total, cam_sharding, fill=0)
    return (CalibState(fused, gains, wpyr, valid, so, cp, wml, gl),
            jax.device_put(corners, rep), total)


def build_sharded_step(geom: StitchGeometry, mesh: Mesh, axis: str = "cam",
                       total_cams: int | None = None, warp_static=None,
                       out_size=None):
    """Returns jit(frames_u8 [total, H, W, 3] (or NV12 [total, H*3/2, W])
    sharded on cameras, state, corners) -> replicated u8 pano.

    warp_static = (sh, whc, slab_w) runs each device's local warp through the
    production Pallas strip kernel (the state must carry the sharded strip
    plan, shard_state handles it); None = XLA gather (CPU dry-runs).
    out_size = (oh, ow) fuses the consumer resize into the same program
    (the sharded twin of Stitcher.stitch_out)."""
    lay = geom.layout
    levels = geom.num_bands

    def local_step(frames, fused, gains, wpyr, so, cp, wml, gl, valid,
                   corners):
        # frames: [local_n, H, W, 3] on this device
        local_n = frames.shape[0]
        me = jax.lax.axis_index(axis)
        if warp_static is not None:
            from video_stitcher_tpu.ops.remap_strips import remap_strips
            from video_stitcher_tpu.pipeline.stitcher import _prep_strip_source
            src = _prep_strip_source(frames, geom)
            sh, whc, slab_w = warp_static
            bands = remap_strips(src, wml, so, cp, gl, sh=sh, whc=whc,
                                 slab_w=slab_w, gains=gains)
            bands = bands[:, :, :lay.band_h, :lay.band_w]
        else:
            from video_stitcher_tpu.calib.calibration import prewarp_source
            from video_stitcher_tpu.pipeline.stitcher import \
                _frames_to_planar_f32
            x = _frames_to_planar_f32(frames)
            x = prewarp_source(x, geom)
            bands = jax.vmap(lambda im, m: remap_planar(im, m[0], m[1]))(
                x, fused[:, :, :lay.band_h, :lay.band_w])
            bands = jnp.clip(bands * gains[:, None, None, None], 0.0, 255.0)
        # storage dtype follows the blend mode ("bf16" stores + psums the
        # weighted pyramids in bfloat16, like the single-chip blend_bands)
        bf16 = geom.blend_precision == "bf16"
        dt = jnp.bfloat16 if bf16 else jnp.float32
        lap = laplacian_pyramid(bands, levels, geom.blend_precision)
        acc = []
        for l in range(levels + 1):
            f = 1 << l
            pw = lay.pano_w // f
            ph = lay.pano_h // f
            wl = lap[l] * wpyr[l].astype(dt)
            if lay.wrap:
                # widen ONCE per level, fold ONCE after the camera loop:
                # per-camera _dyn_place re-concatenated and re-folded the
                # double-width canvas for every camera (O(local_n) extra
                # full-canvas traffic per level; the per-camera adds
                # commute with the single linear fold)
                wide = jnp.zeros((3, ph, 2 * pw), dt)
                bw = wl.shape[-1]
                for j in range(local_n):
                    corner = jnp.mod(corners[me * local_n + j] // f, pw)
                    cur = jax.lax.dynamic_slice_in_dim(
                        wide, corner, bw, axis=wide.ndim - 1)
                    wide = jax.lax.dynamic_update_slice_in_dim(
                        wide, cur + wl[j], corner, axis=wide.ndim - 1)
                pano_l = wide[..., :pw] + wide[..., pw:]
            else:
                pano_l = jnp.zeros((3, ph, pw), dt)
                for j in range(local_n):
                    corner = corners[me * local_n + j] // f
                    pano_l = _dyn_place(pano_l, wl[j], corner, pw, False)
            acc.append(jax.lax.psum(pano_l, axis))
        out = acc[-1]
        for l in range(levels - 1, -1, -1):
            out = acc[l].astype(jnp.float32) + pyr_up(
                out, acc[l].shape[-2], acc[l].shape[-1],
                geom.blend_precision, out_dtype=jnp.float32)
            if bf16 and l > 0:
                out = out.astype(dt)
        out = out * valid[None]
        out = jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
        return jnp.moveaxis(out, 0, -1)

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis),
                  tuple(P(axis) for _ in range(levels + 1)),
                  P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(),
        check_vma=False)

    @jax.jit
    def step(frames, state: CalibState, corners):
        n = state.fused_maps.shape[0]
        so = state.warp_strip_off
        cp = state.warp_chunk_packed
        wml = state.warp_maps_lane
        gl = state.warp_groups
        if warp_static is None and wml is None:
            # keep the gather-path spec arity with tiny dummies
            so = jnp.zeros((n, 1), jnp.int32)
            cp = jnp.zeros((n, 1, 1), jnp.int32)
            wml = jnp.zeros((n, 1, 2, 1), jnp.float32)
            gl = jnp.zeros((n, 1, 1), jnp.int32)
        pano = sharded(frames, state.fused_maps, state.gains,
                       state.weight_pyr, so, cp, wml, gl,
                       state.valid_mask, corners)
        if out_size is None:
            return pano
        # the single-chip output program: one quantization convention
        # for both paths (a divergent inline copy here could silently
        # split single- vs multi-chip output rounding)
        from video_stitcher_tpu.pipeline.stitcher import output_frame
        return output_frame(pano, out_size[0], out_size[1])

    return step
