"""Gaussian / Laplacian pyramid ops (batched, planar layout).

Replaces cv::cuda::pyrDown / pyrUp (cv/cudawarping/src/cuda/pyr_down.cu,
pyr_up.cu) which the reference's blender calls ~6*(2B) times per frame
(sources/modules/stitching/src/blenders.cpp:700-749). Semantics: 5-tap
[1 4 6 4 1]/16 separable Gaussian, BORDER_REFLECT_101, even-phase
downsample; pyrUp zero-stuffs and convolves with the same kernel times 4.

TPU notes: operates on [..., H, W] planar tensors so W rides the 128-lane
axis; the separable convolution is expressed as shifted adds on a padded
array, which XLA fuses into a couple of VPU passes. The framework sizes all
pyramid inputs to multiples of 2^levels, so every level divides exactly by
two and shapes stay static.
"""

from __future__ import annotations

import jax.numpy as jnp

# [1, 4, 6, 4, 1] / 16
_K = (0.0625, 0.25, 0.375, 0.25, 0.0625)


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


def pyr_down(x):
    """[..., H, W] -> [..., ceil(H/2), ceil(W/2)]: blur then even-phase decimate."""
    y = _conv5(_conv5(x.astype(jnp.float32), -1), -2)
    return y[..., ::2, ::2]


def pyr_up(x, out_h=None, out_w=None):
    """[..., h, w] -> [..., 2h, 2w]: zero-stuff then blur with 4x kernel.

    Matches cv::pyrUp for even output sizes (all blender shapes here are
    multiples of 2^levels so only the even case is exercised).
    """
    h, w = x.shape[-2], x.shape[-1]
    out_h = out_h or 2 * h
    out_w = out_w or 2 * w
    x = x.astype(jnp.float32)

    # Zero-stuffed conv along one axis collapses to two 3-tap / 2-tap phases:
    #   even outputs: k[0]*a[i-1] + k[2]*a[i] + k[4]*a[i+1]
    #   odd  outputs: k[1]*a[i]   + k[3]*a[i+1]
    # cv reflects in the zero-stuffed (even-length) domain, which makes the
    # leading pad reflect101 (a[-1] -> a[1]) but the trailing pad replicate
    # (a[n] -> a[n-1]); times 4 overall.
    def up_axis(a, axis, n_out):
        n = a.shape[axis]

        def sl(arr, off, count):
            idx = [slice(None)] * arr.ndim
            idx[axis] = slice(off, off + count)
            return arr[tuple(idx)]

        lead = sl(a, 1, 1) if n > 1 else sl(a, 0, 1)
        trail = sl(a, n - 1, 1)
        ap = jnp.concatenate([lead, a, trail], axis=axis)

        even = _K[0] * sl(ap, 0, n) + _K[2] * sl(ap, 1, n) + _K[4] * sl(ap, 2, n)
        odd = _K[1] * sl(ap, 1, n) + _K[3] * sl(ap, 2, n)
        out = jnp.stack([even, odd], axis=axis + 1 if axis >= 0 else a.ndim + axis + 1)
        shape = list(a.shape)
        shape[axis] = 2 * n
        out = out.reshape(shape)
        return sl(out, 0, n_out) * 2.0

    y = up_axis(x, x.ndim - 1, out_w)
    y = up_axis(y, x.ndim - 2, out_h)
    return y


def gaussian_pyramid(x, levels: int):
    """Returns [x, down(x), ..., down^levels(x)] (levels+1 entries)."""
    pyr = [x.astype(jnp.float32)]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def laplacian_pyramid(x, levels: int):
    """Laplacian pyramid with `levels` band-pass levels + 1 residual.

    lap[i] = gauss[i] - pyrUp(gauss[i+1]); lap[levels] = gauss[levels],
    mirroring blenders.cpp:713-719.
    """
    gauss = gaussian_pyramid(x, levels)
    lap = []
    for i in range(levels):
        lap.append(gauss[i] - pyr_up(gauss[i + 1],
                                     gauss[i].shape[-2], gauss[i].shape[-1]))
    lap.append(gauss[levels])
    return lap


def collapse_laplacian(lap):
    """Inverse of laplacian_pyramid (blenders.cpp:786-790)."""
    x = lap[-1]
    for lvl in reversed(lap[:-1]):
        x = lvl + pyr_up(x, lvl.shape[-2], lvl.shape[-1])
    return x
