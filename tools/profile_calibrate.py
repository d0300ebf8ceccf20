#!/usr/bin/env python
"""Phase-level profile of offline calibration (VERDICT round-1 item #7:
calibration_s was 493-708 s on the dev TPU; attribute it).

Usage: python tools/profile_calibrate.py [--twice]
--twice runs a second full Stitcher.calibrate in the same process to
separate jit-compile cost (first run only) from steady host/transfer
cost.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--twice", action="store_true")
    args = ap.parse_args()

    from video_stitcher_tpu.utils.xla_cache import enable
    enable()

    from video_stitcher_tpu.config import StitcherConfig
    from video_stitcher_tpu import Stitcher
    from video_stitcher_tpu.calib import calibration as cal
    from video_stitcher_tpu.calib.calibration import plan_geometry
    from video_stitcher_tpu.pipeline import stitcher as st_mod

    cfg = StitcherConfig(num_images=6, enable_local=True, recalibrate=False)
    geom, _ = plan_geometry(cfg)
    from video_stitcher_tpu.utils.synth import make_scene, render_views
    rng = np.random.default_rng(3)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng)
    frames = render_views(cfg, geom, scene)

    ph = {}

    def wrap(mod, name, label=None):
        fn = getattr(mod, name)
        key = label or name

        def timed(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            ph[key] = ph.get(key, 0.0) + time.perf_counter() - t0
            return out
        setattr(mod, name, timed)

    wrap(cal, "_seam_phase")
    wrap(cal, "plan_band_layout")
    wrap(cal, "_compose_products_device")
    wrap(cal, "_weight_pyr_jit")
    wrap(cal, "compose_fused_maps_device")
    from video_stitcher_tpu.geometry import cylindrical as cyl
    wrap(cyl, "band_backward_maps_device")
    wrap(st_mod.Stitcher, "_plan_warp")
    wrap(st_mod.Stitcher, "_build_step")
    wrap(st_mod.Stitcher, "recalibrate_mesh")
    from video_stitcher_tpu.utils import hostdev
    wrap(hostdev, "commit")

    def once(tag):
        st = Stitcher(cfg)
        ph.clear()
        t0 = time.perf_counter()
        st.calibrate(frames)
        total = time.perf_counter() - t0
        out = {k: round(v, 2) for k, v in sorted(
            ph.items(), key=lambda kv: -kv[1])}
        print(json.dumps({"run": tag, "calibrate_s": round(total, 2),
                          "phases": out}), flush=True)
        return st

    once("first")
    if args.twice:
        once("second")


if __name__ == "__main__":
    main()
