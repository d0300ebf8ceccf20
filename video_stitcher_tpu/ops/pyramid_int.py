"""16S integer Gaussian/Laplacian pyramids — bit-exact cv::pyrDown/pyrUp.

The reference's production blend runs on CV_16S pyramids (blenders.cpp:
700-749 feeds 16S Laplacians; cuda/multiband_blend.cu accumulates short3).
The TPU framework's production blend is f32 (inside the reference's own
±3/255 CUDA-vs-CPU bound), but proving ≥40 dB parity against the
reference's *integer* output requires a quantization-matched twin: this
module reproduces OpenCV's integer pyramid arithmetic exactly —

  pyrDown(16S): separable [1 4 6 4 1] int conv, BORDER_REFLECT_101,
                even-phase decimate, single cast (sum + 128) >> 8
  pyrUp(16S):   zero-stuff, separable conv (leading border reflect101,
                trailing replicate), single cast (sum + 32) >> 6

verified bit-exact against cv2.pyrDown/pyrUp on int16 in
tests/test_reference_int16.py. Like ops/pyramid.py, each axis is a banded
linear map materialized as a small integer matrix and applied as an
int32 einsum; used only by the opt-in int16 parity blend
(blend/multiband.py:blend_bands_int16), never on the production path.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from video_stitcher_tpu.ops.pyramid import _down_matrix, _up_matrix


@functools.lru_cache(maxsize=256)
def _down_matrix_i(n: int) -> np.ndarray:
    """Integer (x16) version of the pyrDown band matrix."""
    return np.rint(_down_matrix(n).astype(np.float64) * 16).astype(np.int32)


@functools.lru_cache(maxsize=256)
def _up_matrix_i(n: int, n_out: int) -> np.ndarray:
    """Integer (x8) version of the pyrUp band matrix."""
    return np.rint(_up_matrix(n, n_out).astype(np.float64) * 8).astype(np.int32)


def _apply_i32(x, mw: np.ndarray, mh: np.ndarray):
    y = jnp.einsum("...hw,ow->...ho", x, jnp.asarray(mw),
                   preferred_element_type=jnp.int32)
    return jnp.einsum("...hw,oh->...ow", y, jnp.asarray(mh),
                      preferred_element_type=jnp.int32)


def pyr_down_i16(x):
    """int [..., H, W] -> int32 [..., ceil(H/2), ceil(W/2)], cv-exact."""
    x = x.astype(jnp.int32)
    h, w = x.shape[-2], x.shape[-1]
    z = _apply_i32(x, _down_matrix_i(w), _down_matrix_i(h))
    return (z + 128) >> 8


def pyr_up_i16(x, out_h=None, out_w=None):
    """int [..., h, w] -> int32 [..., out_h, out_w], cv-exact pyrUp."""
    x = x.astype(jnp.int32)
    h, w = x.shape[-2], x.shape[-1]
    out_h = out_h or 2 * h
    out_w = out_w or 2 * w
    z = _apply_i32(x, _up_matrix_i(w, out_w), _up_matrix_i(h, out_h))
    return (z + 32) >> 6


def laplacian_pyramid_i16(x, levels: int):
    """16S Laplacian pyramid, mirroring createLaplacePyr on CV_16SC3
    (blenders.cpp feed path): lap[i] = gauss[i] - pyrUp(gauss[i+1]),
    lap[levels] = gauss[levels]. Values stay int32 (all intermediates fit;
    the reference's shorts never overflow on 0..255 inputs either)."""
    gauss = [x.astype(jnp.int32)]
    for _ in range(levels):
        gauss.append(pyr_down_i16(gauss[-1]))
    lap = []
    for i in range(levels):
        lap.append(gauss[i] - pyr_up_i16(gauss[i + 1],
                                         gauss[i].shape[-2],
                                         gauss[i].shape[-1]))
    lap.append(gauss[levels])
    return lap
