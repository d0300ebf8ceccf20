"""Color conversions (device-side, batched).

Replaces the cvtColor calls at 360_stitcher/networking.cpp:46 (NV12->BGR),
featurefinder.cpp:35 (BGR->GRAY), timed.cpp:283,310-311 (BGR<->RGB,
BGR->I420). Uses OpenCV's BT.601 full-range coefficients so outputs match
cv2 within +-1 intensity level (integer rounding).
"""

from __future__ import annotations

import functools as _functools

import jax.numpy as jnp


@_functools.lru_cache(maxsize=32)
def _dup_rows_matrix(h: int):
    """[h, h/2] one-hot NN vertical-upsample matrix (row y reads h//2).

    Vertical chroma duplication as a matmul: the broadcast+reshape
    sublane interleave was the dominant conversion cost (VPU-bound
    relayout); a one-hot matmul rides the MXU instead. Exact even under
    the TPU's bf16 matmul inputs: weights are 0/1 and chroma values are
    integers <= 255, both exactly representable in bf16, and each
    output row has a single nonzero product."""
    import numpy as np
    m = np.zeros((h, h // 2), np.float32)
    m[np.arange(h), np.arange(h) // 2] = 1.0
    return m


def _nv12_upsampled_uv(nv12, h, w):
    """Interleaved UV rows -> full-res (u, v) planes, TPU-shaped.

    Lane dedup: the obvious strided deinterleave costs lane-granularity
    shuffles that measured 13.8 ms per 6-cam 4K set on v5e; selecting
    between the row and its 1-lane roll is the same values with
    vector-friendly ops (for even lane 2k: u = uv[2k]; odd 2k+1:
    u = roll(+1)[2k+1] = uv[2k]). Row duplication: a one-hot MXU matmul
    (_dup_rows_matrix) instead of a broadcast+reshape sublane
    interleave (9.1 -> ~1 ms for the same 4K set, bit-identical).
    """
    from video_stitcher_tpu.ops.resize import apply_interp_h
    uvrow = nv12[h:].astype(jnp.float32)        # [h/2, w] interleaved
    even = (jnp.arange(w) & 1) == 0
    u_half = jnp.where(even, uvrow, jnp.roll(uvrow, 1, axis=1))
    v_half = jnp.where(even, jnp.roll(uvrow, -1, axis=1), uvrow)
    d = _dup_rows_matrix(h)
    u = apply_interp_h(u_half, d) - 128.0
    v = apply_interp_h(v_half, d) - 128.0
    return u, v


def nv12_to_rgb(nv12):
    """nv12: u8 [H*3/2, W] (Y plane then interleaved UV half-height plane)
    -> f32 RGB [H, W, 3] in [0, 255].
    """
    rows, w = nv12.shape
    h = rows * 2 // 3
    y = nv12[:h].astype(jnp.float32)
    u, v = _nv12_upsampled_uv(nv12, h, w)
    # OpenCV YUV2RGB_NV12 (ITU-R BT.601 video-range coefficients; the luma
    # excursion is clamped at 0 like the fixed-point path)
    ycc = 1.163999 * jnp.maximum(y - 16.0, 0.0)
    r = ycc + 1.596027 * v
    g = ycc - 0.812968 * v - 0.391762 * u
    b = ycc + 2.017232 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def nv12_to_bgr(nv12):
    return nv12_to_rgb(nv12)[..., ::-1]


def nv12_to_rgb_planar(nv12, dtype=jnp.float32):
    """nv12: u8 [H*3/2, W] -> planar RGB [3, H, W].

    The production ingest path: capture boards stream NV12
    (360_stitcher/defs.h:10-17), and the planar output feeds the warp
    kernel directly — no channel-last intermediate, no [H, W, 3] ->
    [3, H, W] transpose on device, and the host uploads 1.5 B/px instead
    of 3 B/px.
    """
    rows, w = nv12.shape
    h = rows * 2 // 3
    y = nv12[:h].astype(jnp.float32)
    u, v = _nv12_upsampled_uv(nv12, h, w)
    ycc = 1.163999 * jnp.maximum(y - 16.0, 0.0)
    r = ycc + 1.596027 * v
    g = ycc - 0.812968 * v - 0.391762 * u
    b = ycc + 2.017232 * u
    return jnp.clip(jnp.stack([r, g, b], axis=0), 0.0, 255.0).astype(dtype)


@_functools.lru_cache(maxsize=32)
def _nv12_scaled_mats(h: int, w: int, out_h: int, out_w: int):
    """Trace-time matrices for nv12_to_rgb_planar_scaled.

    The full-res chroma plane is nearest-upsample of the half-res
    samples (see _nv12_upsampled_uv): u_full = D_v @ uvrow @ S_u^T with
    D_v [h, h/2] vertical duplication and S_u [w, w] the even-lane
    dedup (u_full[:, x] = uvrow[:, 2*(x//2)]). Both are linear, so the
    compose-scale resize folds in exactly:
        resize(u_full) = (M_h @ D_v) @ uvrow @ (M_w @ S_u)^T
    leaving two small banded matmuls on the INTERLEAVED half-height UV
    rows — no deinterleave shuffle, no full-res chroma materialization.
    """
    from video_stitcher_tpu.ops.resize import (
        _interp_matrix, _tiles_from_matrix, _BAND_THRESHOLD)
    import numpy as np

    mv = _interp_matrix(h, out_h)                   # [out_h, h]
    cv_mat = np.zeros((out_h, h // 2), np.float32)  # M_h @ D_v
    np.add.at(cv_mat.T, np.arange(h) // 2, mv.T)
    mw = _interp_matrix(w, out_w)                   # [out_w, w]
    cu = np.zeros_like(mw)                          # M_w @ S_u / @ S_v
    cvv = np.zeros_like(mw)
    lanes = np.arange(w)
    np.add.at(cu.T, 2 * (lanes // 2), mw.T)
    np.add.at(cvv.T, 2 * (lanes // 2) + 1, mw.T)

    def prep(m):
        return _tiles_from_matrix(m) if m.size > _BAND_THRESHOLD else m
    return prep(cv_mat), prep(cu), prep(cvv)


def nv12_to_rgb_planar_scaled(nv12, out_h: int, out_w: int,
                              dtype=jnp.float32):
    """nv12 u8 [H*3/2, W] -> planar RGB [3, out_h, out_w] at compose scale.

    Fuses nv12_to_rgb_planar + resize_planar (the reference's NV12->BGR
    cvtColor at networking.cpp:46 followed by the per-frame cuda::resize
    at timed.cpp:77) into one pass that never materializes full-res RGB:
    the luma transfer (pointwise) runs at full res fused into the Y
    resize's matmul reads, and chroma rides composed interp-x-dedup
    matrices on the half-height interleaved UV rows (_nv12_scaled_mats).
    Equal to the unfused chain up to f32 accumulation order, EXCEPT that
    out-of-gamut RGB clips at compose scale rather than full res; ~3x
    less HBM traffic at 4K (the unfused chain was measured conversion-
    bound: 47.6 vs 93.1 fps NV12-vs-RGB 4K->8K in BENCH r5 run 3).
    """
    from video_stitcher_tpu.ops.resize import (
        resize_planar, apply_interp_h, apply_interp_w)
    rows, w = nv12.shape
    h = rows * 2 // 3
    y = nv12[:h].astype(jnp.float32)
    ycc = resize_planar(1.163999 * jnp.maximum(y - 16.0, 0.0),
                        out_h, out_w)
    cv_mat, cu, cvv = _nv12_scaled_mats(h, w, out_h, out_w)
    uvrow = nv12[h:].astype(jnp.float32)
    u = apply_interp_h(apply_interp_w(uvrow, cu), cv_mat) - 128.0
    v = apply_interp_h(apply_interp_w(uvrow, cvv), cv_mat) - 128.0
    r = ycc + 1.596027 * v
    g = ycc - 0.812968 * v - 0.391762 * u
    b = ycc + 2.017232 * u
    return jnp.clip(jnp.stack([r, g, b], axis=0), 0.0, 255.0).astype(dtype)


def rgb_to_gray(rgb):
    """[..., 3] RGB -> [...] gray, cv coefficients (R*0.299+G*0.587+B*0.114)."""
    rgb = rgb.astype(jnp.float32)
    return rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114


def rgb_to_gray_planar(rgb, axis: int = -3):
    """Planar twin of rgb_to_gray: channels on `axis` (default [..., 3,
    H, W]) — no channel-last transpose, which is a layout change on
    TPU."""
    r, g, b = (jnp.take(rgb, i, axis=axis).astype(jnp.float32)
               for i in range(3))
    return r * 0.299 + g * 0.587 + b * 0.114


def bgr_to_gray(bgr):
    return rgb_to_gray(bgr[..., ::-1])


def swap_rb(img):
    """BGR<->RGB."""
    return img[..., ::-1]


def rgb_to_nv12(rgb):
    """RGB u8/f32 [H, W, 3] -> NV12 u8 [H*3/2, W] (Y plane, then one
    half-height plane of interleaved U,V), the capture-board frame format
    (360_stitcher/defs.h:10-17). Same BT.601 video-range matrix and
    top-left 2x2 chroma subsample as rgb_to_i420."""
    h, w = rgb.shape[0], rgb.shape[1]
    x = rgb.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.256788 * r + 0.504129 * g + 0.097906 * b + 16.0
    u = (-0.148223 * r - 0.290993 * g + 0.439216 * b + 128.0)[0::2, 0::2]
    v = (0.439216 * r - 0.367788 * g - 0.071427 * b + 128.0)[0::2, 0::2]
    uv = jnp.stack([u, v], axis=-1).reshape(h // 2, w)
    out = jnp.concatenate([y, uv], axis=0)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def rgb_to_i420(rgb):
    """RGB u8/f32 [H, W, 3] -> I420 u8 [H*3/2, W] (Y plane, then quarter-res
    U plane rows, then V plane rows), matching COLOR_BGR2YUV_I420 layout used
    for the HEVC encoder input (360_stitcher/timed.cpp:311)."""
    h, w = rgb.shape[0], rgb.shape[1]
    x = rgb.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.256788 * r + 0.504129 * g + 0.097906 * b + 16.0
    u = -0.148223 * r - 0.290993 * g + 0.439216 * b + 128.0
    v = 0.439216 * r - 0.367788 * g - 0.071427 * b + 128.0
    # cv subsamples chroma from the top-left pixel of each 2x2 block
    u2 = u[0::2, 0::2]
    v2 = v[0::2, 0::2]
    yp = jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)
    up = jnp.clip(jnp.round(u2), 0, 255).astype(jnp.uint8)
    vp = jnp.clip(jnp.round(v2), 0, 255).astype(jnp.uint8)
    # I420 is a FLAT buffer (y then u then v); the 2-D [H*3/2, W] view is
    # just cv2's Mat shape. Packing each chroma plane into width-W rows
    # separately (the old code) required h % 4 == 0 and broke on real
    # pano heights like 1170 — with odd chroma-row counts the U plane
    # legitimately ends mid-row and V starts there.
    flat = jnp.concatenate(
        [yp.reshape(-1), up.reshape(-1), vp.reshape(-1)])
    return flat.reshape(h * 3 // 2, w)
