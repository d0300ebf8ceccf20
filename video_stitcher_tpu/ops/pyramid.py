"""Gaussian / Laplacian pyramid ops (batched, planar layout).

Replaces cv::cuda::pyrDown / pyrUp (cv/cudawarping/src/cuda/pyr_down.cu,
pyr_up.cu) which the reference's blender calls ~6*(2B) times per frame
(sources/modules/stitching/src/blenders.cpp:700-749). Semantics: 5-tap
[1 4 6 4 1]/16 separable Gaussian, BORDER_REFLECT_101, even-phase
downsample; pyrUp zero-stuffs and convolves with the same kernel times 4.

TPU notes: each axis of the separable convolution+resample is a banded
linear map, materialized as a small dense matrix at trace time and applied
as a matmul — pyramids become pure MXU work. The earlier formulation
(reflect jnp.pad + shifted adds + stack/reshape interleaves) lowered to
lane relayouts that ran ~100x slower than the matmuls on real hardware.
The framework sizes all pyramid inputs to multiples of 2^levels, so every
level divides exactly by two and shapes stay static.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

# [1, 4, 6, 4, 1] / 16
_K = (0.0625, 0.25, 0.375, 0.25, 0.0625)

#: "highest" is bit-faithful to the cv gold tests; "default" uses the
#: MXU's fast bf16 passes on f32-stored tensors (~2x faster; measured
#: 54 dB vs the exact blend end-to-end); "bf16" additionally STORES the
#: pyramid tensors in bfloat16, halving the blend's HBM traffic
#: (3.9 -> 3.0 ms for the 6-cam rig; 56 dB vs the f32 chain — both far
#: inside the reference's own +-3/255 CUDA-vs-CPU tolerance). Threaded
#: through as an argument so callers (the blender via
#: StitchGeometry.blend_precision) choose without global state.


def _reflect101(i: np.ndarray, n: int) -> np.ndarray:
    """cv BORDER_REFLECT_101 index fold (gfedcb|abcdefgh|gfedcba)."""
    if n == 1:
        return np.zeros_like(i)
    period = 2 * (n - 1)
    m = np.mod(i, period)
    m = np.where(m < 0, m + period, m)
    return np.where(m >= n, period - m, m)


@functools.lru_cache(maxsize=256)
def _down_matrix(n: int) -> np.ndarray:
    """[ceil(n/2), n]: 5-tap blur + even-phase decimate, reflect101."""
    n2 = (n + 1) // 2
    m = np.zeros((n2, n), np.float64)
    rows = np.arange(n2)
    for t in range(5):
        idx = _reflect101(2 * rows + t - 2, n)
        np.add.at(m, (rows, idx), _K[t])
    return m.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _up_matrix(n: int, n_out: int) -> np.ndarray:
    """[n_out, n]: zero-stuff + 5-tap conv * 4 (cv::pyrUp).

    cv reflects in the zero-stuffed (even-length) domain: the leading pad
    is reflect101 (a[-1] -> a[1]) but the trailing pad replicates
    (a[n] -> a[n-1]).
    """
    m = np.zeros((n_out, n), np.float64)

    def fold(i):
        i = np.where(i < 0, -i, i)
        return np.minimum(i, n - 1)

    rows = np.arange(n_out)
    even = rows % 2 == 0
    i = rows // 2
    for t, w in ((-1, _K[0]), (0, _K[2]), (1, _K[4])):     # even outputs
        np.add.at(m, (rows[even], fold(i[even] + t)), 2.0 * w)
    for t, w in ((0, _K[1]), (1, _K[3])):                  # odd outputs
        np.add.at(m, (rows[~even], fold(i[~even] + t)), 2.0 * w)
    return m.astype(np.float32)


def _pad_reflect101(x, axis: int, before: int, after: int):
    pads = [(0, 0)] * x.ndim
    pads[axis] = (before, after)
    return jnp.pad(x, pads, mode="reflect")  # numpy 'reflect' == cv reflect101


def _conv5(x, axis: int):
    """5-tap symmetric conv along axis with reflect101 border."""
    xp = _pad_reflect101(x, axis, 2, 2)
    n = x.shape[axis]

    def sl(off):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(off, off + n)
        return xp[tuple(idx)]

    return (_K[0] * (sl(0) + sl(4)) + _K[1] * (sl(1) + sl(3)) + _K[2] * sl(2))


def _mode(precision: str):
    """(storage dtype, einsum precision) for a precision mode string."""
    if precision == "bf16":
        return jnp.bfloat16, "default"
    return jnp.float32, precision


def pyr_down(x, precision: str = "highest"):
    """[..., H, W] -> [..., ceil(H/2), ceil(W/2)]: blur then even-phase
    decimate, as two banded matmuls (MXU)."""
    dt, prec = _mode(precision)
    x = x.astype(dt)
    h, w = x.shape[-2], x.shape[-1]
    dw = jnp.asarray(_down_matrix(w)).astype(dt)             # [w2, w]
    dh = jnp.asarray(_down_matrix(h)).astype(dt)             # [h2, h]
    y = jnp.einsum("...hw,ow->...ho", x, dw,
                   preferred_element_type=dt, precision=prec)
    return jnp.einsum("...hw,oh->...ow", y, dh,
                      preferred_element_type=dt, precision=prec)


def pyr_up(x, out_h=None, out_w=None, precision: str = "highest",
           out_dtype=None):
    """[..., h, w] -> [..., out_h, out_w]: zero-stuff then blur with 4x
    kernel (cv::pyrUp), as two banded matmuls (MXU). out_dtype overrides
    the mode's storage dtype for the result (the blend collapse
    accumulates in f32 over bf16-stored levels)."""
    dt, prec = _mode(precision)
    h, w = x.shape[-2], x.shape[-1]
    out_h = out_h or 2 * h
    out_w = out_w or 2 * w
    x = x.astype(dt)
    uw = jnp.asarray(_up_matrix(w, out_w)).astype(dt)        # [Wo, w]
    uh = jnp.asarray(_up_matrix(h, out_h)).astype(dt)        # [Ho, h]
    y = jnp.einsum("...hw,ow->...ho", x, uw,
                   preferred_element_type=dt, precision=prec)
    return jnp.einsum("...hw,oh->...ow", y, uh,
                      preferred_element_type=out_dtype or dt, precision=prec)


def gaussian_pyramid(x, levels: int, precision: str = "highest"):
    """Returns [x, down(x), ..., down^levels(x)] (levels+1 entries)."""
    dt, _ = _mode(precision)
    pyr = [x.astype(dt)]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1], precision))
    return pyr


def laplacian_pyramid(x, levels: int, precision: str = "highest"):
    """Laplacian pyramid with `levels` band-pass levels + 1 residual.

    lap[i] = gauss[i] - pyrUp(gauss[i+1]); lap[levels] = gauss[levels],
    mirroring blenders.cpp:713-719.
    """
    gauss = gaussian_pyramid(x, levels, precision)
    lap = []
    for i in range(levels):
        lap.append(gauss[i] - pyr_up(gauss[i + 1],
                                     gauss[i].shape[-2], gauss[i].shape[-1],
                                     precision))
    lap.append(gauss[levels])
    return lap


def collapse_laplacian(lap):
    """Inverse of laplacian_pyramid (blenders.cpp:786-790)."""
    x = lap[-1]
    for lvl in reversed(lap[:-1]):
        x = lvl + pyr_up(x, lvl.shape[-2], lvl.shape[-1])
    return x
