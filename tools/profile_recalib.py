#!/usr/bin/env python
"""Phase-level profile of the CPW mesh recalibration path (VERDICT round-1
item #1: attribute the 16-19 s Rewarp).

Mirrors Stitcher.recalibrate_mesh step by step, forcing a device sync
between phases so each phase's wall time is attributable. Forced syncs
inflate the total on the tunneled dev TPU (~1-2 s per interleaved sync), so
the unsynced end-to-end Rewarp is also measured separately.

Usage: python tools/profile_recalib.py [--kp 512] [--levels 4]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(x):
    import jax
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "ravel")]
    if leaves:
        np.asarray(leaves[0].ravel()[:4])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kp", type=int, default=None)
    ap.add_argument("--levels", type=int, default=None)
    args = ap.parse_args()

    import jax
    from video_stitcher_tpu.utils.xla_cache import enable
    enable()    # shipped prebaked cache; compiles here cost tunnel transfers
    import jax.numpy as jnp

    from video_stitcher_tpu.config import StitcherConfig
    from video_stitcher_tpu import Stitcher
    from video_stitcher_tpu.calib.calibration import (
        plan_geometry)

    kw = {}
    if args.kp is not None:
        kw["orb_num_features"] = args.kp
    if args.levels is not None:
        kw["orb_num_levels"] = args.levels
    cfg = StitcherConfig(num_images=6, enable_local=True, recalibrate=False,
                         **kw)
    geom, _ = plan_geometry(cfg)

    from video_stitcher_tpu.utils.synth import make_scene, render_views
    rng = np.random.default_rng(3)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng)
    frames = render_views(cfg, geom, scene)

    st = Stitcher(cfg)
    t0 = time.perf_counter()
    st.calibrate(frames)
    print(f"calibrate: {time.perf_counter() - t0:.1f} s", flush=True)

    # warm everything (compiles)
    t0 = time.perf_counter()
    st.recalibrate_mesh(frames)
    print(f"recalib cold: {time.perf_counter() - t0:.1f} s", flush=True)

    # --- unsynced warm end-to-end (the real Rewarp number) ---
    t0 = time.perf_counter()
    st.recalibrate_mesh(frames)
    warm_s = time.perf_counter() - t0
    print(f"recalib warm e2e: {warm_s:.2f} s", flush=True)

    # --- phase breakdown with forced syncs ---
    from video_stitcher_tpu.mesh.pipeline import solve_mesh_maps  # noqa: F401
    pipe = st._mesh_pipe
    from video_stitcher_tpu.mesh import pipeline as mp

    ph = {}

    def tick(name, t0):
        dt = time.perf_counter() - t0
        ph[name] = round(dt, 3)
        print(f"  {name}: {dt:.3f} s", flush=True)
        return time.perf_counter()

    t = time.perf_counter()
    if pipe._strip is not None:
        bands = mp._warp_bands_strip_jit(
            jnp.asarray(frames), pipe._strip["lane"], pipe._strip["so"],
            pipe._strip["cp"], pipe._strip["gl"], geom=geom,
            warp_static=pipe._strip["static"])
        _sync(bands)
        t = tick("warp_bands_strip", t)
    else:
        bands = mp._warp_bands_global_jit(frames, pipe.global_maps, geom)
        _sync(bands)
        t = tick("warp_bands_global", t)

    gray = (bands[:, 0] * 0.299 + bands[:, 1] * 0.587 + bands[:, 2] * 0.114)
    nonblack = (jnp.max(bands, axis=1) > 0).astype(jnp.float32)
    masks = pipe.overlap_masks * nonblack
    kps = mp._detect_all(gray, masks, max_kp=cfg.orb_num_features,
                         num_levels=cfg.orb_num_levels,
                         scale_factor=cfg.orb_scale_factor)
    _sync(kps.desc)
    t = tick("gray+detect", t)

    sal_dev = mp._salience_all(bands, pipe.solver.N - 1, pipe.solver.M - 1)
    _sync(sal_dev)
    t = tick("salience", t)

    c = geom.num_images
    pend = {}
    for idx in range(c):
        dst = (idx - 1) % c
        m = pipe._match(kps.desc[idx], kps.desc[dst],
                        kps.valid[idx], kps.valid[dst], cfg.lowe_ratio)
        p1 = jnp.take(kps.xy[idx], m.query, axis=0)
        p2 = jnp.take(kps.xy[dst], m.train, axis=0)
        _, inl, _ = pipe._ransac(p1, p2, m.valid, pipe._next_key())
        pend[idx] = (p1, p2, m.valid, inl, m.distance)
    host = jax.device_get(pend)
    salience = jax.device_get(sal_dev)
    t = tick("match+ransac+fetch", t)

    from video_stitcher_tpu.mesh.cpw import CamMatches
    matches = []
    for idx in range(c):
        p1, p2, ok, inl, dist = host[idx]
        ok = np.asarray(ok, bool)
        if ok.sum() >= 8:
            ok = ok & np.asarray(inl, bool)
        target = pipe.solver.targets[idx]
        ydiff = np.abs(p1[:, 1] - p2[:, 1])
        xdev = np.abs(target - (p1[:, 0] - p2[:, 0]))
        ok = ok & (ydiff <= mp.Y_DIFF_MAX) & (xdev <= mp.X_DIST_SLACK)
        if ok.sum() == 0:
            matches.append(None)
            continue
        sel = np.where(ok)[0]
        order = np.argsort(dist[sel])[:cfg.max_features_per_image]
        matches.append(CamMatches(p1=p1[sel[order]], p2=p2[sel[order]],
                                  dst=(idx - 1) % c))
    verts = pipe.solver.solve(matches, temporal=[None] * c, salience=salience)
    t = tick("host_filter+cpw_solve", t)

    from video_stitcher_tpu.mesh.mesh2map import coarse_backward_disp
    disp_c = coarse_backward_disp(np.asarray(verts),
                                  geom.layout.band_h, geom.layout.band_w)
    t = tick("coarse_backward_disp_host", t)

    # gather-free compose (the round-3 fast path): upload the ~400 KB
    # coarse displacement and evaluate the analytic cylindrical map at
    # the mesh coordinates — no dense mesh map, no band_maps gather
    from video_stitcher_tpu.calib.calibration import (
        compose_fused_maps_from_disp, krinv_device)
    if getattr(st, "_krinv_dev", None) is None:
        st._krinv_dev = krinv_device(st.aux["cams_compose"])
    fused_dev = compose_fused_maps_from_disp(st._krinv_dev,
                                             jnp.asarray(disp_c), geom=geom)
    _sync(fused_dev)
    t = tick("compose_fused_maps_from_disp", t)

    from video_stitcher_tpu.ops.remap_strips import (
        chunk_stats_device, pad_maps_device, plan_strips_from_stats,
        repack_maps_lane)
    mpj = pad_maps_device(fused_dev)
    stats = jax.device_get(chunk_stats_device(mpj, geom.warp_src_h,
                                              ((geom.warp_src_w + 127)
                                               // 128) * 128))
    t = tick("chunk_stats_fetch", t)

    prev = st._warp_static or (0, 0, 0)
    warp_w = ((geom.warp_src_w + 127) // 128) * 128
    plan = plan_strips_from_stats(stats, tuple(mpj.shape[2:]),
                                  geom.warp_src_h, warp_w,
                                  min_sh=prev[0], min_whc=prev[1],
                                  min_slab_w=prev[2])
    t = tick("plan_strips_host", t)

    lane = repack_maps_lane(mpj)
    _sync(lane)
    t = tick("repack_maps_lane", t)

    so = jnp.asarray(plan.strip_off)
    cp = jnp.asarray(plan.chunk_packed)
    _sync(cp)
    t = tick("upload_plan", t)

    print(json.dumps({"warm_e2e_s": round(warm_s, 2), "phases": ph,
                      "synced_total_s": round(sum(ph.values()), 2),
                      "maps_mb": round((mpj.size * 4) / 1e6, 1),
                      "device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
