"""Backward-map resampling (the reference's hot op: cv::cuda::remap).

The reference calls remap twice per camera per frame plus once per mask warp
(360_stitcher/timed.cpp:84,90,100; kernel cv/cudawarping/src/cuda/remap.cu).
GPUs do this with texture units; on TPU an irregular gather is the expensive
primitive, so the framework composes all per-frame resamplings into ONE map
(see calib/compose.py) and this op is invoked exactly once per camera per
frame. The gather itself is a flat `take` over H*W, which XLA lowers to a
dynamic-gather; a Pallas tile-local variant can slot in behind the same API.

Semantics match OpenCV remap with INTER_LINEAR / INTER_NEAREST and
BORDER_CONSTANT / BORDER_REPLICATE / BORDER_REFLECT / BORDER_REFLECT_101,
verified against cv2 in tests/test_remap.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BORDERS = ("constant", "replicate", "reflect", "reflect101", "wrap")


def _reflect_index(idx, n, mode):
    """Map integer indices into [0, n) per OpenCV border rules."""
    if mode == "replicate":
        return jnp.clip(idx, 0, n - 1)
    if mode == "wrap":
        return jnp.mod(idx, n)
    if mode == "reflect":        # fedcba|abcdefgh|hgfedcb
        period = 2 * n
        m = jnp.mod(idx, period)
        m = jnp.where(m < 0, m + period, m)
        return jnp.where(m >= n, period - 1 - m, m)
    if mode == "reflect101":     # gfedcb|abcdefgh|gfedcba
        if n == 1:
            return jnp.zeros_like(idx)
        period = 2 * (n - 1)
        m = jnp.mod(idx, period)
        m = jnp.where(m < 0, m + period, m)
        return jnp.where(m >= n, period - m, m)
    raise ValueError(f"unknown border mode {mode!r}")


def _gather2d(img_flat, ix, iy, w):
    """img_flat: [C, H*W]; ix, iy: [...] int32 -> [C, ...]."""
    idx = (iy * w + ix).reshape(-1)
    out = jnp.take(img_flat, idx, axis=1)
    return out.reshape((img_flat.shape[0],) + ix.shape)


def remap_planar(img, map_x, map_y, *, interpolation="linear",
                 border="constant", border_value=0.0):
    """Resample planar image(s) through a backward map.

    img:   f32/other [C, H, W]
    map_x: f32 [Ho, Wo] source x-coordinate for each output pixel
    map_y: f32 [Ho, Wo]
    Returns [C, Ho, Wo] with img's dtype semantics carried in f32.
    """
    if border not in _BORDERS:
        raise ValueError(f"unknown border mode {border!r}")
    c, h, w = img.shape
    img_f = img.astype(jnp.float32)
    img_flat = img_f.reshape(c, h * w)

    mx = map_x.astype(jnp.float32)
    my = map_y.astype(jnp.float32)

    if interpolation == "nearest":
        # OpenCV INTER_NEAREST uses cvRound = round-half-to-EVEN (the
        # SSE cvtsd path), matching jnp.round — floor(x+0.5) diverged at
        # exact .5 map coords (2.5 -> 3 here vs cv's 2)
        ix = jnp.round(mx).astype(jnp.int32)
        iy = jnp.round(my).astype(jnp.int32)
        if border == "constant":
            valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            ixc = jnp.clip(ix, 0, w - 1)
            iyc = jnp.clip(iy, 0, h - 1)
            out = _gather2d(img_flat, ixc, iyc, w)
            return jnp.where(valid[None], out, jnp.float32(border_value))
        ix = _reflect_index(ix, w, border)
        iy = _reflect_index(iy, h, border)
        return _gather2d(img_flat, ix, iy, w)

    if interpolation not in ("linear", "cubic"):
        raise ValueError(f"unknown interpolation {interpolation!r}")

    x0 = jnp.floor(mx)
    y0 = jnp.floor(my)
    fx = mx - x0
    fy = my - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    if border == "constant":
        def tap(ix, iy):
            valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            v = _gather2d(img_flat, jnp.clip(ix, 0, w - 1), jnp.clip(iy, 0, h - 1), w)
            return jnp.where(valid[None], v, jnp.float32(border_value))
    else:
        def tap(ix, iy):
            return _gather2d(img_flat, _reflect_index(ix, w, border),
                             _reflect_index(iy, h, border), w)

    if interpolation == "cubic":
        # OpenCV INTER_CUBIC (interpolateCubic, A = -0.75): 4x4 taps at
        # x0-1..x0+2. Opt-in quality path — 16 gathers instead of 4 —
        # used by the supersample/quality stitch options, cv2-gold-tested
        # in tests/test_ops_gold.py.
        def cubic_w(f):
            A = jnp.float32(-0.75)
            w0 = ((A * (f + 1) - 5 * A) * (f + 1) + 8 * A) * (f + 1) - 4 * A
            w1 = ((A + 2) * f - (A + 3)) * f * f + 1
            g = 1 - f
            w2 = ((A + 2) * g - (A + 3)) * g * g + 1
            return w0, w1, w2, 1 - w0 - w1 - w2

        wx = cubic_w(fx)
        wy = cubic_w(fy)
        out = jnp.zeros((c,) + mx.shape, jnp.float32)
        for j in range(4):
            row = jnp.zeros_like(out)
            for i in range(4):
                row = row + tap(x0 - 1 + i, y0 - 1 + j) * wx[i][None]
            out = out + row * wy[j][None]
        return out

    v00 = tap(x0, y0)
    v01 = tap(x1, y0)
    v10 = tap(x0, y1)
    v11 = tap(x1, y1)
    w00 = ((1 - fx) * (1 - fy))[None]
    w01 = (fx * (1 - fy))[None]
    w10 = ((1 - fx) * fy)[None]
    w11 = (fx * fy)[None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def remap(img, map_x, map_y, *, interpolation="linear",
          border="constant", border_value=0.0):
    """HWC (or HW) wrapper around remap_planar."""
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    planar = jnp.moveaxis(img, -1, 0)
    out = remap_planar(planar, map_x, map_y, interpolation=interpolation,
                       border=border, border_value=border_value)
    out = jnp.moveaxis(out, 0, -1)
    return out[..., 0] if squeeze else out


#: Batched planar remap: img [B, C, H, W], maps [B, Ho, Wo] -> [B, C, Ho, Wo].
