#!/usr/bin/env python
"""Micro-profile of blend internals on the real device."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from video_stitcher_tpu.utils.xla_cache import enable as _enable_cache
_enable_cache()    # shipped prebaked cache; compiles cost tunnel transfers
from video_stitcher_tpu.geometry.cylindrical import BandLayout
from video_stitcher_tpu.ops.pyramid import (
    pyr_down, pyr_up, laplacian_pyramid, _conv5,
)
from video_stitcher_tpu.blend.multiband import place_bands, blend_bands


def _sync(x):
    # the axon backend's block_until_ready does not reliably block (see
    # bench.py); a tiny device->host read forces completion
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[:4])


def timeit(fn, *args, n=10, name=""):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
    return out


def main():
    lay = BandLayout(scale=785.0, pano_w=4928, pano_h=1280, v0=-640.0, u0=0.0,
                     band_w=1664, band_h=1280,
                     corners=(-832, 0, 832, 1664, 2496, 3328),
                     num_bands=6, wrap=True, gap=192)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((6, 3, 1280, 1664)).astype(np.float32) * 255)
    w = tuple(jnp.asarray(rng.random(
        (6, 1, 1280 >> l, 1664 >> l)).astype(np.float32))
        for l in range(7))
    valid = jnp.asarray(rng.random((1280, 4928)).astype(np.float32))

    x = jax.device_put(x)
    timeit(jax.jit(lambda a: _conv5(a, -1)), x, name="conv5 one axis [6,3,1280,1664]")
    timeit(jax.jit(pyr_down), x, name="pyr_down level0")
    timeit(jax.jit(lambda a: a[..., ::2, ::2]), x, name="strided slice ::2")
    small = jax.jit(pyr_down)(x)
    timeit(jax.jit(lambda a: pyr_up(a, 1280, 1664)), small, name="pyr_up level0")
    timeit(jax.jit(lambda a: laplacian_pyramid(a, 6)[0]), x, name="laplacian 6-level")
    timeit(jax.jit(lambda a: place_bands(a, lay, 0)), x, name="place_bands L0")
    timeit(jax.jit(lambda a, ww, v: blend_bands(a, ww, lay, v)), x, w, valid,
           name="blend_bands full")


if __name__ == "__main__":
    main()
