#!/usr/bin/env python
"""CPU gold of the reference stitching chain, for the BASELINE fidelity
target "PSNR >= 40 dB vs reference stitched output".

Reimplements the reference's calibration + online chain step for step on
stock OpenCV (installed cv2), mirroring:

  - fixed-rig camera model        360_stitcher/calibration.cpp:28-68
  - seam-scale cylindrical warp   calibration.cpp:91-127 (INTER_LINEAR,
                                  BORDER_REFLECT for images, NEAREST/
                                  CONSTANT for masks)
  - GainCompensator feed          calibration.cpp:131
  - VoronoiSeamFinder             calibration.cpp:134-135
  - compose-scale ROIs + band
    count + blender prepare       calibration.cpp:160-196
  - seam-mask dilate/resize/AND   calibration.cpp:208-237
  - online resize->warp->gain->
    feed->blend                   timed.cpp:56-152 (INTER_LINEAR,
                                  BORDER_CONSTANT, gain via saturating
                                  convertTo in 8U)

The one deliberate deviation: the gold warper runs at the TPU build's
micro-adjusted cylinder scale (layout.scale = pano_w / 2pi instead of the
raw focal, a <1% change that makes the panorama exactly periodic —
geometry/cylindrical.py). Matching scales makes the two panoramas differ
by a pure translation (integer in x, fractional only in y via v0), so the
comparison isolates real semantic differences (resampling, gains, seams,
blend) instead of a global resample.

CLI:  python tools/reference_gold.py [--width 1920 --height 1080]
Prints one JSON line with psnr_vs_reference_db.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _rig(cfg, scale_override=None):
    """Reference camera model at work scale (calibration.cpp:28-68)."""
    ws = cfg.work_scale
    ppx = cfg.input_width * ws / 2.0
    ppy = cfg.input_height * ws / 2.0
    focal = ppx / math.tan(math.radians(cfg.fov_deg) / 2.0)
    rs = []
    for rot in cfg.camera_yaws():
        c, s = math.cos(rot), math.sin(rot)
        rs.append(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32))
    return focal, ppx, ppy, rs


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _float_multiband(imgs, weights, corners, dst_roi, nb):
    """CV_32F multiband blend with cv2 pyramids — the reference's blend
    semantics (blenders.cpp:700-831: Gaussian weight pyramids from soft
    masks/255, per-level weighted Laplacian accumulate, normalize by
    weight + eps, pyrUp collapse) minus its 16S integer quantization.

    The integer path (cv2.detail.MultiBandBlender, as the reference runs)
    fails even self-identity at ~39 dB with a ~-1.1 DC bias (16S pyramid
    rounding); this float twin isolates semantic parity from that noise.
    """
    import cv2
    x0, y0, w, h = dst_roi
    a = 1 << nb
    cw, ch = _round_up(w, a), _round_up(h, a)
    sum_lap = [None] * (nb + 1)
    sum_w = [None] * (nb + 1)
    eps = 1e-5                                   # WEIGHT_EPS
    for img, wt, (cx, cy) in zip(imgs, weights, corners):
        canvas = np.zeros((ch, cw, 3), np.float32)
        wc = np.zeros((ch, cw), np.float32)
        oy, ox = cy - y0, cx - x0
        canvas[oy:oy + img.shape[0], ox:ox + img.shape[1]] = img
        wc[oy:oy + wt.shape[0], ox:ox + wt.shape[1]] = wt
        gp = [canvas]
        wp = [wc]
        for _ in range(nb):
            gp.append(cv2.pyrDown(gp[-1]))
            wp.append(cv2.pyrDown(wp[-1]))
        for lvl in range(nb + 1):
            lap = (gp[lvl] if lvl == nb else
                   gp[lvl] - cv2.pyrUp(gp[lvl + 1],
                                       dstsize=gp[lvl].shape[1::-1]))
            add = lap * wp[lvl][..., None]
            if sum_lap[lvl] is None:
                sum_lap[lvl], sum_w[lvl] = add, wp[lvl].copy()
            else:
                sum_lap[lvl] += add
                sum_w[lvl] += wp[lvl]
    out = sum_lap[nb] / (sum_w[nb][..., None] + eps)
    for lvl in range(nb - 1, -1, -1):
        out = cv2.pyrUp(out, dstsize=sum_lap[lvl].shape[1::-1]) \
            + sum_lap[lvl] / (sum_w[lvl][..., None] + eps)
    mask = (sum_w[0] > eps).astype(np.uint8) * 255
    pano = np.clip(np.rint(out[:h, :w]), 0, 255).astype(np.uint8)
    return pano, mask[:h, :w]


def reference_gold_pano(frames: np.ndarray, cfg, scale_override=None,
                        float_blend=False):
    """frames u8 [N, H, W, 3] -> (pano u8 [Hg, Wg, 3], mask u8, dst_roi).

    dst_roi = (x, y, w, h) of the gold canvas in cylinder-pixel coords
    (u = scale * theta with theta measured from yaw 0). float_blend swaps
    the reference's 16S integer multiband for the f32 twin (see
    _float_multiband) to isolate semantics from integer noise.
    """
    import cv2

    n = cfg.num_images
    ws, ss = cfg.work_scale, cfg.seam_scale
    swa = ss / ws
    focal, ppx, ppy, rs = _rig(cfg)
    # warped_image_scale = cameras[0].focal (calibration.cpp:291)
    wis = focal if scale_override is None else scale_override * ws / cfg.compose_scale

    def k_at(s):
        return np.array([[focal * s, 0, ppx * s],
                         [0, focal * s, ppy * s],
                         [0, 0, 1]], np.float32)

    # --- seam phase (calibration.cpp:91-135) ---
    warper_s = cv2.PyRotationWarper("cylindrical", float(wis * swa))
    corners, imgs_w, masks_w = [], [], []
    for i in range(n):
        simg = cv2.resize(frames[i], None, fx=ss, fy=ss,
                          interpolation=cv2.INTER_LINEAR)
        c, iw = warper_s.warp(simg, k_at(swa), rs[i],
                              cv2.INTER_LINEAR, cv2.BORDER_REFLECT)
        mask = np.full(simg.shape[:2], 255, np.uint8)
        _, mw = warper_s.warp(mask, k_at(swa), rs[i],
                              cv2.INTER_NEAREST, cv2.BORDER_CONSTANT)
        corners.append(c)
        imgs_w.append(iw)
        masks_w.append(mw)

    # (cv2 5.0 binding quirks: feed needs UMats; the VoronoiSeamFinder
    # constructor binding segfaults — use the createDefault factory)
    comp = cv2.detail.GainCompensator()
    comp.feed(corners=corners, images=[cv2.UMat(i) for i in imgs_w],
              masks=[cv2.UMat(m) for m in masks_w])
    gmats = comp.getMatGains()
    gains = [float(np.asarray(g).mean()) for g in gmats]

    sf = cv2.detail.SeamFinder_createDefault(
        cv2.detail.SeamFinder_VORONOI_SEAM)
    found = sf.find([iw.astype(np.float32) for iw in imgs_w], corners,
                    [m.copy() for m in masks_w])
    seam_masks = [np.asarray(m.get() if hasattr(m, "get") else m)
                  for m in found]

    # --- compose phase (calibration.cpp:144-246) ---
    cs = cfg.compose_scale
    cwa = cs / ws
    warper_c = cv2.PyRotationWarper("cylindrical", float(wis * cwa))
    k_c = k_at(cwa)
    if abs(cs - 1.0) > 1e-1:
        # truncation, not rounding: the reference builds its compose maps
        # for Size((int)(w*scale), (int)(h*scale)) (calibration.cpp:213)
        sz = (int(cfg.input_width * cs), int(cfg.input_height * cs))
    else:
        sz = (cfg.input_width, cfg.input_height)

    corners_c, sizes_c = [], []
    for i in range(n):
        x, y, w, h = warper_c.warpRoi(sz, k_c, rs[i])
        corners_c.append((x, y))
        sizes_c.append((w, h))
    dst_roi = cv2.detail.resultRoi(corners=corners_c, sizes=sizes_c)
    blend_width = math.sqrt(dst_roi[2] * dst_roi[3]) * cfg.blend_strength / 100.0
    if blend_width < 1.0:
        nb = 0
    else:
        nb = int(math.ceil(math.log(blend_width) / math.log(2.0)) - 1.0)
    mb = None
    if not float_blend:
        mb = cv2.detail.MultiBandBlender(0, nb, cv2.CV_32F)
        mb.prepare(dst_roi)
    fb_imgs, fb_wts, fb_corners = [], [], []

    for i in range(n):
        if abs(cs - 1.0) > 1e-1:
            cimg = cv2.resize(frames[i], sz, interpolation=cv2.INTER_LINEAR)
        else:
            cimg = frames[i]
        corner, iw = warper_c.warp(cimg, k_c, rs[i],
                                   cv2.INTER_LINEAR, cv2.BORDER_CONSTANT)
        mask = np.full((sz[1], sz[0]), 255, np.uint8)
        _, mw = warper_c.warp(mask, k_c, rs[i],
                              cv2.INTER_NEAREST, cv2.BORDER_CONSTANT)
        sm = seam_masks[i]
        if cfg.enable_local:
            # 3x3 dilation, calibration.cpp:208-234
            sm = cv2.dilate(sm, np.ones((3, 3), np.uint8))
        sm = cv2.resize(sm, (mw.shape[1], mw.shape[0]),
                        interpolation=cv2.INTER_LINEAR)
        sm = cv2.bitwise_and(sm, mw)
        # online gain: saturating 8U convertTo (timed.cpp:94)
        img_g = np.clip(np.rint(iw.astype(np.float64) * gains[i]),
                        0, 255).astype(np.uint8)
        if float_blend:
            fb_imgs.append(img_g.astype(np.float32))
            fb_wts.append(sm.astype(np.float32) / 255.0)  # blenders.cpp:303
            fb_corners.append(corner)
        else:
            mb.feed(img_g.astype(np.int16), sm, corner)

    if float_blend:
        pano, result_mask = _float_multiband(fb_imgs, fb_wts, fb_corners,
                                             dst_roi, nb)
        return pano, result_mask, dst_roi
    result, result_mask = mb.blend(None, None)
    pano = np.clip(result, 0, 255).astype(np.uint8)
    return pano, result_mask, dst_roi


def psnr_vs_reference(st, frames, pano=None, named_panos=None):
    """Calibrated Stitcher + frames -> dict with psnr_vs_reference_db.

    Resamples the gold panorama onto the TPU build's pano grid via the
    exact coordinate relation (x offset integer mod period; y offset
    fractional through layout.v0) and reports PSNR over jointly-valid
    pixels. pano: optionally pass a pre-stitched pano (e.g. from the
    global-only state_global when cfg.enable_local, since the gold has no
    CPW mesh). named_panos: {suffix: (pano, valid_mask)} extra panoramas
    compared against the SAME golds (e.g. the fuse_maps=False prewarp
    chain) — keys become psnr_vs_reference{suffix}_db."""
    import cv2

    lay = st.geom.layout
    ours = np.asarray(st.stitch(frames)) if pano is None else pano
    valid = np.asarray(st.state.valid_mask) > 0
    ph, pw = lay.pano_h, lay.pano_w

    golds = {}

    def compare(float_blend, pano_np, valid_np):
        if float_blend not in golds:
            golds[float_blend] = reference_gold_pano(
                frames, st.cfg, scale_override=lay.scale,
                float_blend=float_blend)
        gold, gmask, roi = golds[float_blend]
        xs = np.arange(pw, dtype=np.float64) + lay.u0 - roi[0]
        if lay.wrap:
            # fold onto the gold canvas (whose u-range covers at least
            # one full period when the ring is closed)
            xs = xs % pw
        ys = np.arange(ph, dtype=np.float64) + lay.v0 - roi[1]
        mapx, mapy = np.meshgrid(xs.astype(np.float32),
                                 ys.astype(np.float32))
        g = cv2.remap(gold, mapx, mapy, cv2.INTER_LINEAR,
                      borderMode=cv2.BORDER_CONSTANT)
        gm = cv2.remap(gmask, mapx, mapy, cv2.INTER_NEAREST,
                       borderMode=cv2.BORDER_CONSTANT)
        both = valid_np & (gm > 0)
        d = pano_np[both].astype(np.float64) - g[both].astype(np.float64)
        mse = np.mean(d * d)
        db = 10 * math.log10(255.0 ** 2 / mse) if mse > 0 else float("inf")
        return round(db, 2), int(both.sum()), gold.shape[:2]

    db_int, npx, gsz = compare(False, ours, valid)
    db_f32, _, _ = compare(True, ours, valid)
    extra = {}
    for suffix, (p, v) in (named_panos or {}).items():
        p = np.asarray(p)
        v = np.asarray(v) > 0
        extra[f"psnr_vs_reference{suffix}_db"] = compare(False, p, v)[0]
        extra[f"psnr_vs_reference{suffix}_f32_db"] = compare(True, p, v)[0]
    # the reference chain's own integer-arithmetic noise: its 16S-pyramid
    # output vs the float twin of the SAME chain (same warps, gains,
    # seams, weights) — this bounds what any exact implementation can
    # score against the integer output
    gi, gim, _ = golds[False]
    gf, gfm, _ = golds[True]
    b = (gim > 0) & (gfm > 0)
    d = gi[b].astype(np.float64) - gf[b].astype(np.float64)
    self_db = 10 * math.log10(255.0 ** 2 / np.mean(d * d))
    return {"psnr_vs_reference_db": db_int,
            "psnr_vs_reference_f32_db": db_f32,
            "reference_int_vs_f32_db": round(self_db, 2),
            **extra,
            "compared_px": npx,
            "gold_size": list(gsz), "ours_size": [ph, pw]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--num-images", type=int, default=6)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/video_stitcher_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from video_stitcher_tpu.config import StitcherConfig
    from video_stitcher_tpu import Stitcher
    from video_stitcher_tpu.calib.calibration import plan_geometry

    cfg = StitcherConfig(num_images=args.num_images,
                         input_width=args.width, input_height=args.height,
                         enable_local=False, recalibrate=False)
    geom, _ = plan_geometry(cfg)

    from video_stitcher_tpu.utils.synth import make_scene, render_views
    rng = np.random.default_rng(3)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng)
    frames = render_views(cfg, geom, scene)

    st = Stitcher(cfg)
    st.calibrate(frames)
    out = psnr_vs_reference(st, frames)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
