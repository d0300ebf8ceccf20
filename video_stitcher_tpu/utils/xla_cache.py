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
    # the WRITE THRESHOLD goes first: if setting it fails we must not
    # point jax at the checked-in cache at all, or a "read-only"
    # consumer would grow it with environment-specific blobs. Failures
    # are logged, not swallowed — a silently-disabled cache shows up as
    # an unexplained ~80 s cold calibration.
    try:
        # write EVERY compile, not just slow ones: on a tunneled backend
        # each compile costs host<->device round trips regardless of its
        # XLA time, so dozens of "fast" uncached programs still add
        # minutes to a cold start (a 0.5 s threshold captured them only
        # nondeterministically — whichever runs happened to cross it)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0 if writeable else 1e9)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_compilation_cache_dir", d)
    except Exception as e:          # noqa: BLE001 — jax option drift
        import logging
        logging.getLogger("video_stitcher_tpu").warning(
            "persistent XLA cache NOT enabled (%s: %s) — cold starts "
            "will compile everything", type(e).__name__, e)
    return d


def build_programs(cfg=None, sets=("1080p", "bench", "4k")) -> None:
    """Trace + compile (or cache-load) the production program sets —
    the single definition of "what a cold start needs", shared by the
    primer (--prime, writeable cache) and the coverage checker
    (tools/check_cache_coverage.py, read-only cache + miss counting).

    sets: "1080p" = the live product set (calibrate, fused stitch_out,
    NV12 twins, recalib + interp programs); "bench" = bench.py's parity
    twins (gold step, reference-convention state, int16, two-resample);
    "4k" = BASELINE config 4 (4K->8K + black bars) — its rot out of the
    shipped cache went unnoticed all of round 4 (VERDICT r4 next-4).
    """
    import numpy as np
    from video_stitcher_tpu.config import StitcherConfig
    from video_stitcher_tpu import Stitcher
    from video_stitcher_tpu.calib.calibration import plan_geometry

    if cfg is None:
        cfg = StitcherConfig(num_images=6, input_width=1920,
                             input_height=1080, enable_local=True,
                             recalibrate=False)
    geom, _ = plan_geometry(cfg)
    from video_stitcher_tpu.utils.synth import make_scene, render_views
    rng = np.random.default_rng(3)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng)
    frames = render_views(cfg, geom, scene)

    if "1080p" in sets:
        st = Stitcher(cfg)
        st.calibrate(frames)
        st.stitch_out(frames, device=True)
        st.recalibrate_mesh(st.stage_frames(frames))
        # interp-animation programs (the recalib thread's lerp compiles
        # at first use; the Runner pre-warms it the same way)
        st.interpolate_states(st.state, st.state, 0.5)
        # update_masks recalib twin (the all-features deployment shape,
        # blenders.cpp:297-315): the seam re-find + weight rebuild has
        # its own program set — unprimed it cost a ~98 s first recalib
        # in the r5 bench soak (observed as soak_recalibs=0)
        import dataclasses as _dc
        _cfg_keep = st.cfg
        st.cfg = _dc.replace(cfg, update_masks=True)
        try:
            st.recalibrate_mesh(st.stage_frames(frames))
        finally:
            st.cfg = _cfg_keep
        # NV12-input twins (the production ingest path compiles separately)
        from video_stitcher_tpu.ops.color import rgb_to_nv12
        from video_stitcher_tpu.utils.hostdev import host_eager
        with host_eager():
            nv12 = np.stack([np.asarray(rgb_to_nv12(f)) for f in frames])
        st.stitch_out(nv12, device=True)
        st.stitch(nv12, device=True)
    else:
        st = None

    import dataclasses
    import functools
    import jax
    import jax.numpy as jnp
    from video_stitcher_tpu.pipeline.stitcher import stitch_pano

    if "bench" in sets:
        # bench-path parity programs (priming them keeps the driver's
        # cold bench measuring cache loads, not compiles)
        if st is None:
            st = Stitcher(cfg)
            st.calibrate(frames)
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

    if "4k" in sets:
        # BASELINE config 4: 6-cam 4K -> 8K with black bars (scaled 2x
        # from cfg so a small-config caller stays small)
        try:
            import cv2
            small = cfg.input_width < 1920
            w4, h4 = ((2 * cfg.input_width, 2 * cfg.input_height)
                      if small else (3840, 2160))
            ow4, oh4 = (2 * w4, h4) if small else (7680, 3840)
            cfg4 = dataclasses.replace(
                cfg, input_width=w4, input_height=h4,
                output_width=ow4, output_height=oh4,
                keep_aspect_ratio=True, add_black_bars=True,
                enable_local=False)
            frames4 = np.stack([cv2.resize(f, (w4, h4),
                                           interpolation=cv2.INTER_LINEAR)
                                for f in frames])
            st4 = Stitcher(cfg4)
            st4.calibrate(frames4)
            st4.stitch_out(frames4, device=True)
            from video_stitcher_tpu.ops.color import rgb_to_nv12 as _nv
            from video_stitcher_tpu.utils.hostdev import host_eager as _he
            with _he():
                nv4 = np.stack([np.asarray(_nv(f)) for f in frames4])
            st4.stitch_out(nv4, device=True)     # bench drives 4K via NV12
        except Exception as e:
            print(f"4k prime phase skipped: {e}")


def prime() -> None:
    """Populate the repo cache with every production program: run a full
    calibrate + stitch + recalibrate at flagship shapes on the current
    backend, writing all compiles into <repo>/.xla_cache."""
    os.makedirs(_REPO_CACHE, exist_ok=True)
    enable()
    build_programs()
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
