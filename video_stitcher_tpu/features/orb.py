"""ORB-style feature detection + description in pure JAX (TPU-friendly).

Replaces cv::cuda::ORB (cv/cudafeatures2d/src/orb.cpp + cuda/orb.cu: FAST
segment test, Harris ranking, intensity-centroid orientation, rotated BRIEF)
as used at 360_stitcher/featurefinder.cpp:15,38 (2500 pts, scale 1.2,
8 levels). Redesign notes:

* FAST's data-dependent branching becomes mask-parallel window ops: the
  16-point Bresenham circle is materialized as 16 shifted views and the
  9-contiguous arc test is a reduction over 16 rotations — pure VPU work.
* Keypoints are fixed-size arrays with a validity mask (static shapes for
  XLA); ranking is lax.top_k on the Harris response.
* The rBRIEF sampling pattern is our own fixed 256-pair table (generated
  from a seeded Gaussian, as in the original BRIEF paper). Descriptors are
  only ever matched against descriptors from this same implementation, so
  the pattern needs to be fixed, not identical to OpenCV's.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from video_stitcher_tpu.ops.resize import resize_planar

# 16-point Bresenham circle of radius 3, clockwise from 12 o'clock (dy, dx)
_CIRCLE = np.array([
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
], np.int32)

PATCH_R = 15          # orientation/descriptor patch radius (31x31 like ORB)


class Keypoints(NamedTuple):
    xy: jnp.ndarray        # f32 [K, 2] (x, y) in level-0 image coords
    response: jnp.ndarray  # f32 [K]
    angle: jnp.ndarray     # f32 [K] radians
    valid: jnp.ndarray     # bool [K]
    desc: jnp.ndarray      # uint32 [K, 8] packed 256-bit descriptors


@functools.lru_cache(maxsize=1)
def _brief_pattern() -> np.ndarray:
    """[256, 2, 2] (pair, point, (dy, dx)) sampling offsets, sigma = patch/5."""
    rng = np.random.default_rng(0x0B12EF)
    pts = rng.normal(0.0, PATCH_R / 2.5, size=(256, 2, 2))
    return np.clip(np.round(pts), -(PATCH_R - 2), PATCH_R - 2).astype(np.int32)


def _shift2d(img, dy: int, dx: int):
    """Shifted view with zero fill (invalid near borders handled by mask)."""
    return jnp.roll(img, (-dy, -dx), axis=(0, 1))


def _fast_corners(gray, threshold: float):
    """FAST-9/16 segment-test mask + margin score. gray: f32 [H, W]."""
    taps = jnp.stack([_shift2d(gray, int(dy), int(dx)) for dy, dx in _CIRCLE])
    bright = taps > gray[None] + threshold          # [16, H, W]
    dark = taps < gray[None] - threshold

    def arc9(m):
        # run-length doubling: m9[k] == AND of m[k..k+8] (circular), so a
        # >=9 arc exists iff any m9. 4 rolled ANDs + a reduce instead of
        # the naive 16x8 AND chain (the chain was ~40 ms of the fused
        # 6-camera detect; this form is a few ms)
        m2 = m & jnp.roll(m, -1, axis=0)      # runs of >=2
        m4 = m2 & jnp.roll(m2, -2, axis=0)    # >=4
        m8 = m4 & jnp.roll(m4, -4, axis=0)    # >=8
        m9 = m8 & jnp.roll(m, -8, axis=0)     # >=9
        return jnp.any(m9, axis=0)

    corner = arc9(bright) | arc9(dark)
    # margin score (for reference only; ranking uses Harris)
    score = jnp.maximum(
        jnp.sum(jnp.maximum(taps - gray[None] - threshold, 0.0), axis=0),
        jnp.sum(jnp.maximum(gray[None] - taps - threshold, 0.0), axis=0))
    return corner, score


def _harris(gray, k: float = 0.04, block: int = 7):
    """Harris response with Sobel gradients + box window (ORB's HARRIS_SCORE)."""
    gp = jnp.pad(gray, 1, mode="edge")
    h, w = gray.shape

    def s(dy, dx):
        return gp[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    ix = (s(-1, 1) + 2 * s(0, 1) + s(1, 1)) - (s(-1, -1) + 2 * s(0, -1) + s(1, -1))
    iy = (s(1, -1) + 2 * s(1, 0) + s(1, 1)) - (s(-1, -1) + 2 * s(-1, 0) + s(-1, 1))

    def box(x):
        # separable (the 2D edge-padded box sum clips each axis
        # independently, so row-sum-then-col-sum is exact): 2*block adds
        # instead of block^2
        r = block // 2
        xp = jnp.pad(x, ((r, r), (0, 0)), mode="edge")
        x = sum(xp[dy:dy + h] for dy in range(block))
        xp = jnp.pad(x, ((0, 0), (r, r)), mode="edge")
        return sum(xp[:, dx:dx + w] for dx in range(block))

    sxx, syy, sxy = box(ix * ix), box(iy * iy), box(ix * iy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


def _nms3(resp):
    rp = jnp.pad(resp, 1, mode="constant", constant_values=-jnp.inf)
    h, w = resp.shape
    best = resp
    is_max = jnp.ones_like(resp, bool)
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            is_max = is_max & (resp >= rp[dy:dy + h, dx:dx + w])
    return is_max


def _orientation(smooth, xs, ys):
    """Intensity-centroid angle per keypoint (orb.cpp IC_Angle)."""
    r = PATCH_R
    dys, dxs = np.mgrid[-r:r + 1, -r:r + 1]
    circ = (dys ** 2 + dxs ** 2) <= r * r
    dys_f = dys[circ].astype(np.float32)
    dxs_f = dxs[circ].astype(np.float32)
    h, w = smooth.shape
    flat = smooth.reshape(-1)

    px = xs[:, None] + jnp.asarray(dxs_f)[None, :]
    py = ys[:, None] + jnp.asarray(dys_f)[None, :]
    pxc = jnp.clip(px.astype(jnp.int32), 0, w - 1)
    pyc = jnp.clip(py.astype(jnp.int32), 0, h - 1)
    vals = flat[pyc * w + pxc]
    m10 = jnp.sum(vals * jnp.asarray(dxs_f)[None, :], axis=1)
    m01 = jnp.sum(vals * jnp.asarray(dys_f)[None, :], axis=1)
    return jnp.arctan2(m01, m10)


def _describe(smooth, xs, ys, angles):
    """Rotated-BRIEF 256-bit descriptors -> uint32 [K, 8]."""
    pat = jnp.asarray(_brief_pattern(), jnp.float32)    # [256,2,2] (dy,dx)
    h, w = smooth.shape
    flat = smooth.reshape(-1)
    ca, sa = jnp.cos(angles), jnp.sin(angles)           # [K]

    dy = pat[None, :, :, 0]                             # [1,256,2]
    dx = pat[None, :, :, 1]
    rx = dx * ca[:, None, None] - dy * sa[:, None, None]
    ry = dx * sa[:, None, None] + dy * ca[:, None, None]
    px = jnp.clip(jnp.round(xs[:, None, None] + rx).astype(jnp.int32), 0, w - 1)
    py = jnp.clip(jnp.round(ys[:, None, None] + ry).astype(jnp.int32), 0, h - 1)
    vals = flat[py * w + px]                            # [K,256,2]
    bits = (vals[:, :, 0] < vals[:, :, 1]).astype(jnp.uint32)
    bits = bits.reshape(bits.shape[0], 8, 32)
    packed = jnp.sum(bits << jnp.arange(32, dtype=jnp.uint32)[None, None, :],
                     axis=-1, dtype=jnp.uint32)
    return packed


def _box5(img):
    """5x5 box smoothing (stand-in for ORB's integral-image smoothing);
    separable, like _harris.box."""
    h, w = img.shape
    xp = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    img = sum(xp[dy:dy + h] for dy in range(5))
    xp = jnp.pad(img, ((0, 0), (2, 2)), mode="edge")
    return sum(xp[:, dx:dx + w] for dx in range(5)) / 25.0


def detect_and_describe(gray, mask=None, *, max_keypoints: int = 512,
                        num_levels: int = 4, scale_factor: float = 1.2,
                        fast_threshold: float = 20.0) -> Keypoints:
    """gray: f32 [H, W] (0..255); mask: optional [H, W] (>0 = allowed).

    Returns fixed-size Keypoints (invalid slots flagged). Jittable; shapes
    depend only on (H, W, max_keypoints, num_levels).
    """
    gray = gray.astype(jnp.float32)
    h0, w0 = gray.shape
    k_per_level = max_keypoints

    cand_resp, cand_x, cand_y, cand_lvl = [], [], [], []
    imgs = []
    for lvl in range(num_levels):
        s = scale_factor ** lvl
        hs, ws = max(32, int(round(h0 / s))), max(32, int(round(w0 / s)))
        img = gray if lvl == 0 else resize_planar(gray, hs, ws)
        imgs.append(img)
        corner, fscore = _fast_corners(img, fast_threshold)
        harris = _harris(img)
        border = PATCH_R + 4
        hh, wh = img.shape
        yy = jnp.arange(hh)[:, None]
        xx = jnp.arange(wh)[None, :]
        inb = (yy >= border) & (yy < hh - border) & (xx >= border) & (xx < wh - border)
        # NMS on the FAST margin score over corner pixels (as FAST does);
        # Harris is only the *ranking* response (ORB HARRIS_SCORE,
        # cv/cudafeatures2d/src/orb.cpp) — requiring a Harris local max at a
        # FAST pixel rejects nearly everything on ideal corners
        fsc = jnp.where(corner, fscore, -jnp.inf)
        ok = corner & _nms3(fsc) & inb
        if mask is not None:
            # contract is ">0 = allowed" (any scale: production passes
            # 0/1 overlap masks, tools may pass 0/255) — binarize FIRST,
            # then threshold the bilinear resize at half. The old
            # `> 127` on the resized values silently masked out every
            # level >= 1 for 0/1 masks, degrading ORB to single-scale.
            m01 = (mask > 0).astype(jnp.float32)
            m = m01 if lvl == 0 else (resize_planar(m01, hh, wh) > 0.5)
            ok = ok & (m > 0)
        resp = jnp.where(ok, harris, -jnp.inf)
        # approx_max_k: TPU-native approximate top-k (partial-reduce
        # hardware path) — exact top_k lowers to a full sort and was
        # ~60% of the recalibration's detect cost (258 -> ~130 ms for
        # the 6-camera 4-level detect). Recall 0.95 over NMS'd corners
        # only perturbs which near-tied corners are kept; detector
        # repeatability and the 512-vs-2500 mesh A/B (gated in
        # tests/test_features_natural.py) are unchanged.
        top_v, top_i = jax.lax.approx_max_k(resp.reshape(-1), k_per_level,
                                            recall_target=0.95)
        ys_l = (top_i // wh).astype(jnp.float32)
        xs_l = (top_i % wh).astype(jnp.float32)
        # sub-pixel refinement: 1-D quadratic fit of the FAST margin score
        # around the NMS peak (beyond the reference, whose keypoints are
        # integer-pixel; halves the CPW local-term quantization noise)
        sp = jnp.pad(fscore, 1, mode="edge")
        c0 = fscore
        oxn, oxp = sp[1:-1, :-2], sp[1:-1, 2:]
        oyn, oyp = sp[:-2, 1:-1], sp[2:, 1:-1]
        dx_den = oxn - 2.0 * c0 + oxp
        dy_den = oyn - 2.0 * c0 + oyp
        # fit only CONCAVE peaks (den < 0): NMS ran on the corner-masked
        # score, so a non-corner neighbor can sit above c0 in the raw
        # margin score — a positive denominator is then the parabola's
        # MINIMUM and the offset would push the keypoint the wrong way
        off_x = jnp.where(dx_den < -1e-6,
                          0.5 * (oxn - oxp) / dx_den, 0.0)
        off_y = jnp.where(dy_den < -1e-6,
                          0.5 * (oyn - oyp) / dy_den, 0.0)
        off_x = jnp.clip(off_x, -0.5, 0.5).reshape(-1)[top_i]
        off_y = jnp.clip(off_y, -0.5, 0.5).reshape(-1)[top_i]
        xs_l = xs_l + off_x
        ys_l = ys_l + off_y
        cand_resp.append(top_v)
        cand_x.append(xs_l * (w0 / wh))
        cand_y.append(ys_l * (h0 / hh))
        cand_lvl.append(jnp.full((k_per_level,), lvl, jnp.int32))

    resp = jnp.concatenate(cand_resp)
    allx = jnp.concatenate(cand_x)
    ally = jnp.concatenate(cand_y)
    alll = jnp.concatenate(cand_lvl)
    best_v, best_i = jax.lax.top_k(resp, max_keypoints)
    xs = allx[best_i]
    ys = ally[best_i]
    lvls = alll[best_i]
    valid = jnp.isfinite(best_v)

    # orientation + descriptors in ONE pass over a level ATLAS: the
    # smoothed level images are concatenated along x and each keypoint's
    # coords are mapped into its own level's rectangle. The previous
    # form ran the per-keypoint patch gathers at EVERY level and merged
    # by mask — 4x the gather work (the kp gathers were ~150 ms of the
    # fused 6-camera detect). Exact for every valid keypoint: the
    # in-bounds border (PATCH_R + 4) keeps all patch taps and their
    # 5x5 smoothing support strictly inside the keypoint's level
    # rectangle, so no tap ever reads across an atlas seam.
    atlas = jnp.concatenate(
        [jnp.pad(_box5(im), ((0, h0 - im.shape[0]), (0, 0)))
         for im in imgs], axis=1)
    offs = np.cumsum([0] + [im.shape[1] for im in imgs[:-1]]).astype(np.float32)
    sx_l = np.asarray([im.shape[1] / w0 for im in imgs], np.float32)
    sy_l = np.asarray([im.shape[0] / h0 for im in imgs], np.float32)
    ax = xs * jnp.asarray(sx_l)[lvls] + jnp.asarray(offs)[lvls]
    ay = ys * jnp.asarray(sy_l)[lvls]
    angles = _orientation(atlas, ax, ay)
    descs = _describe(atlas, ax, ay, angles)

    return Keypoints(xy=jnp.stack([xs, ys], axis=-1),
                     response=jnp.where(valid, best_v, 0.0),
                     angle=angles, valid=valid, desc=descs)
