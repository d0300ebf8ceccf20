#!/usr/bin/env python
"""Per-stage timing of the stitch step on the real device."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from video_stitcher_tpu.utils.xla_cache import enable as _enable_cache
_enable_cache()    # shipped prebaked cache; compiles cost tunnel transfers

from video_stitcher_tpu.config import StitcherConfig
from video_stitcher_tpu import Stitcher
from video_stitcher_tpu.pipeline.stitcher import warp_bands, stitch_pano, output_frame
from video_stitcher_tpu.blend.multiband import blend_bands


def _sync(x):
    # the axon backend's block_until_ready does not reliably block (see
    # bench.py); a tiny device->host read forces completion
    leaf = jax.tree_util.tree_leaves(x)[0]
    if hasattr(leaf, "ravel"):
        np.asarray(leaf.ravel()[:4])
    return x


def timeit(fn, *args, n=10, name=""):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:28s} {dt:8.2f} ms")
    return out


def main():
    cfg = StitcherConfig(num_images=6, input_width=1920, input_height=1080,
                         enable_local=False, recalibrate=False)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (6, 1080, 1920, 3)).astype(np.uint8)
    st = Stitcher(cfg)
    t0 = time.perf_counter()
    st.calibrate(frames)
    print(f"calibrate: {time.perf_counter()-t0:.1f}s  pano={st.geom.pano_h}x{st.geom.pano_w} "
          f"band={st.geom.layout.band_h}x{st.geom.layout.band_w} bands={st.geom.num_bands}")

    state = jax.device_put(st.state)
    geom = st.geom

    f_dev = timeit(lambda x: jax.device_put(x), frames,
                   name="H2D upload 6x1080p u8")
    fj = jnp.asarray(frames)

    warp_j = jax.jit(lambda f, s: warp_bands(f, s, geom,
                                             warp_static=st._warp_static))
    bands = timeit(warp_j, fj, state, name="warp_bands (strip kernel)")

    blend_j = jax.jit(lambda b, s: blend_bands(b, s.weight_pyr, geom.layout,
                                               s.valid_mask))
    pano = timeit(blend_j, bands, state, name="blend_bands (pyramids)")

    step_j = st._step
    timeit(step_j, fj, state, name="full stitch_pano")

    out_j = jax.jit(lambda p: output_frame(p, 1052, 4096))
    pano_u8 = step_j(fj, state)
    timeit(out_j, pano_u8, name="output resize 4K")

    timeit(lambda p: np.asarray(p), out_j(pano_u8), n=5, name="D2H 4K u8")


if __name__ == "__main__":
    main()
