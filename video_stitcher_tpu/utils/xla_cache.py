"""Persistent XLA compile-cache management.

Cold calibration is dominated by jit compiles (~90% per
tools/profile_calibrate.py). The package ships a PREBAKED cache
(``<repo>/.xla_cache``, populated on the target TPU generation by
``python -m video_stitcher_tpu.utils.xla_cache --prime``): a fresh
process on the same image + device then loads every production program
from disk instead of compiling, cutting cold calibration from ~80 s to
the cache-load cost.

Layering: entries are keyed by XLA version + backend + HLO, so a cache
baked on one image/device generation is silently ignored (falls back to
compiling) anywhere it doesn't match — shipping it is free.
"""

from __future__ import annotations

import os

_REPO_CACHE = os.path.abspath(os.path.join(
    os.path.dirname(__file__), os.pardir, os.pardir, ".xla_cache"))
_TMP_CACHE = "/tmp/video_stitcher_tpu_jax_cache"


def cache_dir() -> str:
    """The shipped repo cache when present, else the /tmp scratch dir."""
    if os.path.isdir(_REPO_CACHE):
        return _REPO_CACHE
    return _TMP_CACHE


def enable(writeable: bool = True) -> str:
    """Point jax's persistent compilation cache at the shipped cache.

    writeable=False reads the shipped entries but effectively never
    writes new ones (the write threshold is set beyond any real compile
    time) — for read-mostly consumers that must not grow the checked-in
    cache with environment-specific blobs (ADVICE r3). New entries under
    the repo cache are .gitignore'd either way; priming uses
    ``git add -f`` (see --prime).

    Returns the directory used. Safe to call multiple times / after jax
    initialized (config updates apply to subsequent compiles).
    """
    import jax
    d = cache_dir()
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        # write EVERY compile, not just slow ones: on a tunneled backend
        # each compile costs host<->device round trips regardless of its
        # XLA time, so dozens of "fast" uncached programs still add
        # minutes to a cold start (a 0.5 s threshold captured them only
        # nondeterministically — whichever runs happened to cross it)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0 if writeable else 1e9)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return d


def prime() -> None:
    """Populate the repo cache with every production program: run a full
    calibrate + stitch + recalibrate at flagship shapes on the current
    backend, writing all compiles into <repo>/.xla_cache."""
    os.makedirs(_REPO_CACHE, exist_ok=True)
    enable()
    import numpy as np
    from video_stitcher_tpu.config import StitcherConfig
    from video_stitcher_tpu import Stitcher
    from video_stitcher_tpu.calib.calibration import plan_geometry

    cfg = StitcherConfig(num_images=6, input_width=1920, input_height=1080,
                         enable_local=True, recalibrate=False)
    geom, _ = plan_geometry(cfg)
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(_REPO_CACHE), "tests"))
    from test_stitch_e2e import make_scene, render_views
    rng = np.random.default_rng(3)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng)
    frames = render_views(cfg, geom, scene)

    st = Stitcher(cfg)
    st.calibrate(frames)
    st.stitch_out(frames, device=True)
    st.recalibrate_mesh(st.stage_frames(frames))
    # interp-animation programs (the recalib thread's lerp over the map
    # tensors compiles at first use; the Runner pre-warms it the same way)
    st.interpolate_states(st.state, st.state, 0.5)
    # NV12-input twins (the production ingest path compiles separately)
    from video_stitcher_tpu.ops.color import rgb_to_nv12
    from video_stitcher_tpu.utils.hostdev import host_eager
    with host_eager():
        nv12 = np.stack([np.asarray(rgb_to_nv12(f)) for f in frames])
    st.stitch_out(nv12, device=True)
    st.stitch(nv12, device=True)

    # --- bench-path programs (bench.py compiles these too; priming them
    # keeps the driver's cold bench measuring cache loads, not compiles) ---
    import dataclasses
    import functools
    import jax
    import jax.numpy as jnp
    from video_stitcher_tpu.pipeline.stitcher import stitch_pano

    # XLA-gather gold step on the default state
    jax.jit(functools.partial(stitch_pano, geom=st.geom,
                              warp_static=None))(jnp.asarray(frames),
                                                 st.state)
    # reference-map-convention global state + int16 quantization twin
    st_ref = Stitcher(dataclasses.replace(cfg, enable_local=False,
                                          map_convention="reference"))
    st_ref.calibrate(frames)
    jax.jit(functools.partial(stitch_pano, geom=st_ref.geom,
                              warp_static=None))(jnp.asarray(frames),
                                                 st_ref.state_global)
    st_ref.stitch_int16(frames, state=st_ref.state_global)
    # two-resample (fuse_maps=False) parity twin
    st2 = Stitcher(dataclasses.replace(cfg, fuse_maps=False,
                                       enable_local=False,
                                       use_pallas_remap=False,
                                       map_convention="reference"))
    st2.calibrate(frames)
    st2.stitch(frames)
    # BASELINE config 4: 6-cam 4K -> 8K with black bars
    try:
        import cv2
        cfg4 = dataclasses.replace(cfg, input_width=3840, input_height=2160,
                                   output_width=7680, output_height=3840,
                                   keep_aspect_ratio=True,
                                   add_black_bars=True, enable_local=False)
        frames4 = np.stack([cv2.resize(f, (3840, 2160),
                                       interpolation=cv2.INTER_LINEAR)
                            for f in frames])
        st4 = Stitcher(cfg4)
        st4.calibrate(frames4)
        st4.stitch_out(frames4, device=True)
    except Exception as e:
        print(f"4k prime phase skipped: {e}")
    n = len(os.listdir(_REPO_CACHE))
    print(f"primed {_REPO_CACHE}: {n} entries")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--prime", action="store_true")
    args = ap.parse_args()
    if args.prime:
        prime()
    else:
        print(cache_dir())
