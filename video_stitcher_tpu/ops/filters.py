"""Separable Gaussian filtering (cv::cuda::createGaussianFilter equivalent,
declared at 360_stitcher/timed.cpp:53; the reference's apply call is
commented out at timed.cpp:110 but the op belongs to the surface).

Planar layout [..., H, W]; BORDER_REFLECT_101 like OpenCV's default.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def gaussian_kernel(ksize: int, sigma: float = 0.0) -> tuple:
    """cv::getGaussianKernel: sigma<=0 -> 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    r = (ksize - 1) / 2.0
    x = np.arange(ksize) - r
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    k /= k.sum()
    return tuple(float(v) for v in k)


def _conv_axis(x, k: tuple, axis: int):
    r = (len(k) - 1) // 2
    pads = [(0, 0)] * x.ndim
    pads[axis] = (r, r)
    xp = jnp.pad(x, pads, mode="reflect")
    n = x.shape[axis]
    out = None
    for i, w in enumerate(k):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(i, i + n)
        term = w * xp[tuple(idx)]
        out = term if out is None else out + term
    return out


def gaussian_blur(x, ksize: int = 5, sigma: float = 0.0):
    """[..., H, W] separable Gaussian blur."""
    k = gaussian_kernel(ksize, sigma)
    y = _conv_axis(x.astype(jnp.float32), k, -1)
    return _conv_axis(y, k, -2)
