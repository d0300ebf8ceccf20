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
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5 if writeable else 1e9)
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
    # NV12-input twins (the production ingest path compiles separately)
    from video_stitcher_tpu.ops.color import rgb_to_nv12
    from video_stitcher_tpu.utils.hostdev import host_eager
    with host_eager():
        nv12 = np.stack([np.asarray(rgb_to_nv12(f)) for f in frames])
    st.stitch_out(nv12, device=True)
    st.stitch(nv12, device=True)
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
