#!/usr/bin/env python
"""Benchmark: 6-cam 1080p -> 4K equirect stitching on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/60}
(vs_baseline is against the BASELINE.md north-star of 60 fps sustained;
the reference repo publishes no numbers of its own.)
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from video_stitcher_tpu.config import StitcherConfig
    from video_stitcher_tpu import Stitcher
    from video_stitcher_tpu.calib.calibration import plan_geometry

    cfg = StitcherConfig(num_images=6, input_width=1920, input_height=1080,
                         enable_local=True, recalibrate=False)
    geom, _ = plan_geometry(cfg)

    # Synthetic camera views rendered from a known panorama so fidelity is
    # measurable (SURVEY.md §4). Rendering at full res host-side is slow-ish,
    # so render at half res and upscale.
    sys.path.insert(0, "tests")
    from test_stitch_e2e import make_scene, render_views, psnr
    rng = np.random.default_rng(3)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng)
    frames = render_views(cfg, geom, scene)

    st = Stitcher(cfg)
    t0 = time.perf_counter()
    st.calibrate(frames)
    calib_s = time.perf_counter() - t0

    # fidelity vs ground truth
    pano = st.stitch(frames)
    valid = np.asarray(st.state.valid_mask) > 0
    h = geom.pano_h
    gt = np.moveaxis(scene, 0, -1)
    sel = valid[h // 4:3 * h // 4]
    fidelity = psnr(pano[h // 4:3 * h // 4][sel], gt[h // 4:3 * h // 4][sel])

    # --- timing: end-to-end per frame = H2D upload + stitch + 4K output ---
    step = st._step
    out_fn = None
    pano_dev = st.stitch(frames, device=True)
    out = st.output(pano_dev)          # compiles output resize
    state = st.state

    def one_frame(f_np):
        f = jnp.asarray(f_np)                       # host->HBM
        p = step(f, state)
        o = st._out(p)
        o.block_until_ready()
        return o

    # warmup
    for _ in range(3):
        one_frame(frames)

    n_iter = 30
    lat = []
    t_start = time.perf_counter()
    for _ in range(n_iter):
        t = time.perf_counter()
        one_frame(frames)
        lat.append(time.perf_counter() - t)
    total = time.perf_counter() - t_start

    fps = n_iter / total
    p50_ms = float(np.percentile(np.array(lat) * 1000, 50))

    print(json.dumps({
        "metric": "stitched_fps_6cam_1080p_to_4k",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
        "p50_latency_ms": round(p50_ms, 2),
        "psnr_db": round(float(fidelity), 2),
        "calibration_s": round(calib_s, 2),
        "pano": [geom.pano_h, geom.pano_w],
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
