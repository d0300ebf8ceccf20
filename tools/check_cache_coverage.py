#!/usr/bin/env python
"""Shipped-XLA-cache coverage gate (VERDICT r4 next-4 / weak-5).

Round 4's shipped cache silently rotted from ~150 MB to 25 MB across
program rebuilds and only a live measurement showed the 1080p set
survived; the 4K set's coverage was unknown. This tool makes cache rot
loud: run it as a FRESH process on the target backend after any program
rebuild / before shipping —

    python tools/check_cache_coverage.py [--sets 1080p,bench,4k]
        [--cache DIR] [--allow N] [--small]

It enables the shipped cache READ-ONLY, registers jax's compilation-
cache monitoring events, builds the production program sets
(utils/xla_cache.build_programs — the same definition --prime writes),
and prints one JSON line:

    {"hits": H, "misses": M, "requests": R, "backend": ..., "ok": bool}

misses ~ 0 means a cold start loads everything from disk (the measured
11.4 s cold calibration); exit code 1 when misses > --allow (default 2:
tiny host-side helper programs may legitimately churn).

Priming protocol after a program rebuild: run --prime, then run THIS
tool with --writeable once, then read-only to gate. A residual tail of
~3-4 effective misses per process is expected and tolerated (see
--allow): calibrate() races a prewarm thread against the main compile
path, so each process traces a slightly different program-variant set
— the tail members differ run to run and are cheap (cold calibration
measures ~10.7 s with them). Real cache rot shows as tens of misses.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(__file__), os.pardir)))

COUNTS = {"hits": 0, "misses": 0, "requests": 0}


def _listener(event, *a, **kw):
    if event.endswith("/cache_hits"):
        COUNTS["hits"] += 1
    elif event.endswith("/cache_misses"):
        COUNTS["misses"] += 1
    elif event.endswith("/compile_requests_use_cache"):
        COUNTS["requests"] += 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sets", default="1080p,bench,4k",
                    help="comma list: 1080p,bench,4k")
    ap.add_argument("--cache", default=None,
                    help="cache dir (default: the shipped repo cache)")
    ap.add_argument("--allow", type=int, default=6,
                    help="max tolerated cache misses (a ~3-4 program "
                         "tail is nondeterministic per process: "
                         "calibrate()'s prewarm thread races the main "
                         "compile path, so each process traces a "
                         "slightly different variant set; the tail is "
                         "cheap — cold calibration measures 10.7 s "
                         "with it — while real rot is tens of misses)")
    ap.add_argument("--small", action="store_true",
                    help="640x360 config (mechanism test, e.g. on CPU)")
    ap.add_argument("--tiny", action="store_true",
                    help="minimal 2-cam 160x90 program set (fast "
                         "mechanism test; used by tests/)")
    ap.add_argument("--writeable", action="store_true",
                    help="write missing entries (priming mode)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu). NB: the "
                         "JAX_PLATFORMS env var alone does NOT stick in "
                         "environments whose sitecustomize pre-registers "
                         "a TPU plugin; this flag forces it through the "
                         "live config like tests/conftest.py does")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.monitoring
    jax.monitoring.register_event_listener(_listener)

    from video_stitcher_tpu.utils import xla_cache
    if args.cache:
        jax.config.update("jax_compilation_cache_dir", args.cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0 if args.writeable else 1e9)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        cache_dir = args.cache
    else:
        cache_dir = xla_cache.enable(writeable=args.writeable)

    if args.tiny:
        import numpy as np
        from video_stitcher_tpu.config import StitcherConfig
        from video_stitcher_tpu import Stitcher
        cfg = StitcherConfig(num_images=2, input_width=160,
                             input_height=90, enable_local=False,
                             recalibrate=False)
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (2, 90, 160, 3)).astype(np.uint8)
        st = Stitcher(cfg)
        st.calibrate(frames)
        st.stitch_out(frames, device=True)
        st.stitch(frames)
        args.sets = "tiny"
    else:
        cfg = None
        if args.small:
            from video_stitcher_tpu.config import StitcherConfig
            cfg = StitcherConfig(num_images=6, input_width=640,
                                 input_height=360, enable_local=True,
                                 recalibrate=False)
        xla_cache.build_programs(cfg=cfg,
                                 sets=tuple(args.sets.split(",")))

    # effective misses = cacheable compile requests not served from disk.
    # The raw cache_misses event is NOT recorded when the write threshold
    # is 1e9 (read-only mode suppresses it), so requests - hits is the
    # honest coverage measure in both modes.
    eff = COUNTS["requests"] - COUNTS["hits"]
    ok = eff <= args.allow
    print(json.dumps({**COUNTS, "effective_misses": eff,
                      "backend": jax.default_backend(),
                      "cache_dir": cache_dir,
                      "sets": args.sets, "ok": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
