#!/usr/bin/env python
"""Micro-benchmark of the strip-warp kernel (the hot op) on the real rig
maps. Times remap_strips alone, plus optional experimental variants, so
kernel changes can be A/B'd without the rest of the pipeline.

Run: python tools/bench_warp.py [--iters 20]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(x):
    return np.asarray(x.ravel()[:4])


def _enable_compile_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/video_stitcher_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None):
    _enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from video_stitcher_tpu.config import StitcherConfig
    from video_stitcher_tpu import Stitcher
    from video_stitcher_tpu.ops import remap_strips as rs

    print("device:", jax.devices()[0])
    cfg = StitcherConfig(num_images=6, input_width=1920, input_height=1080,
                         enable_local=False, recalibrate=False)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (6, 1080, 1920, 3)).astype(np.uint8)
    st = Stitcher(cfg)
    st.calibrate(frames)
    sh, whc, slab_w = st._warp_static
    state = st.state
    maps = state.fused_maps
    n, _, bh, bw = maps.shape
    kw = (rs._rot_kw(slab_w) if 128 < slab_w < rs.SLAB_W
          else 128 if slab_w == 128 else slab_w)        # contraction width
    print(f"bands: [{n}, 3, {bh}, {bw}]  sh={sh} whc={whc} "
          f"slab_w={slab_w} nrb={bh // rs.ROW_BLOCK} ncc={bw // rs.CHUNK_W}")
    chunks = n * (bh // rs.ROW_BLOCK) * (bw // rs.CHUNK_W)
    flops = chunks * (rs.ROW_BLOCK * rs.CHUNK_W) * kw * 3 * whc * 2
    print(f"chunks/frame: {chunks}   x-stage matmul TFLOP/frame: "
          f"{flops / 1e12:.3f}")

    src = rs.prep_source(jnp.asarray(frames))
    _sync(src)
    maps_lane = state.warp_maps_lane

    def timeit(fn, *a, name=""):
        out = fn(*a)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        _sync(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:32s} {ms:8.2f} ms")
        return ms

    timeit(lambda s: rs.remap_strips(
        s, maps_lane, state.warp_strip_off, state.warp_chunk_packed,
        state.warp_groups, sh=sh, whc=whc, slab_w=slab_w), src,
        name=f"remap_strips (plan: slab_w={slab_w})")

    # A/B the slab modes on the same plan (a narrow rot plan's packing
    # stays valid at every WIDER mode — the rotate window becomes a
    # superset — so one plan serves the whole comparison ladder)
    if 128 < slab_w < rs.SLAB_W:
        for variant in [128 + w // 2 for w in rs.ROT_KWS
                        if 128 + w // 2 > slab_w] + [rs.SLAB_W]:
            timeit(lambda s, v=variant: rs.remap_strips(
                s, maps_lane, state.warp_strip_off, state.warp_chunk_packed,
                state.warp_groups, sh=sh, whc=whc, slab_w=v), src,
                name=f"  variant slab_w={variant}"
                     + (" (wide)" if variant == rs.SLAB_W else
                        f" (kw={rs._rot_kw(variant)})"))


if __name__ == "__main__":
    main()
