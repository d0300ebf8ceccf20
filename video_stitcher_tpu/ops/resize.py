"""Bilinear resize as separable interpolation matmuls (MXU-friendly).

Replaces cv::cuda::resize (cv/cudawarping/src/resize.cpp, used at
360_stitcher/timed.cpp:77 and calibration.cpp:95,236). OpenCV INTER_LINEAR is
pure 2-tap bilinear with the half-pixel source mapping
src = (dst + 0.5) * (in/out) - 0.5 and edge clamping; expressing each axis as
a sparse-in-rows dense matrix turns resize into two matmuls, which XLA tiles
onto the MXU — far better than a gather on TPU. Matrices are built at trace
time from static shapes and folded into the compiled program.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=256)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] bilinear interpolation matrix (OpenCV convention)."""
    scale = n_in / n_out
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    f = (src - i0).astype(np.float64)
    i0c = np.clip(i0, 0, n_in - 1)
    i1c = np.clip(i0 + 1, 0, n_in - 1)
    m = np.zeros((n_out, n_in), dtype=np.float32)
    rows = np.arange(n_out)
    np.add.at(m, (rows, i0c), (1.0 - f).astype(np.float32))
    np.add.at(m, (rows, i1c), f.astype(np.float32))
    return m


def resize_planar(img, out_h: int, out_w: int):
    """img [..., H, W] -> [..., out_h, out_w], bilinear, f32."""
    h, w = img.shape[-2], img.shape[-1]
    x = img.astype(jnp.float32)
    if w != out_w:
        mw = jnp.asarray(_interp_matrix(w, out_w))          # [Wo, W]
        x = jnp.einsum("...hw,ow->...ho", x, mw, preferred_element_type=jnp.float32)
    if h != out_h:
        mh = jnp.asarray(_interp_matrix(h, out_h))          # [Ho, H]
        x = jnp.einsum("...hw,oh->...ow", x, mh, preferred_element_type=jnp.float32)
    return x


def resize(img, out_h: int, out_w: int):
    """HWC / HW wrapper."""
    if img.ndim == 2:
        return resize_planar(img, out_h, out_w)
    planar = jnp.moveaxis(img, -1, 0)
    out = resize_planar(planar, out_h, out_w)
    return jnp.moveaxis(out, 0, -1)


def resize_scale(img, scale: float):
    """Scale both axes like cv::resize(img, (), fx=scale, fy=scale):
    output size = round(dim * scale)."""
    h, w = img.shape[0], img.shape[1]
    return resize(img, int(round(h * scale)), int(round(w * scale)))
