"""Batched multiband (Laplacian) blending with static band placement.

Re-designs the reference's persistent-state MultiBandBlender
(sources/modules/stitching/src/blenders.cpp:219-853 + cuda/multiband_blend.cu)
for XLA:

* all cameras are one batched tensor [N, C, bandH, bandW]; the per-camera
  bordered-ROI bookkeeping (init_gpu, blenders.cpp:344-434) becomes a static
  `BandLayout` with 2^bands-aligned corners;
* the seam-mask weight pyramids are fixed after calibration (update_mask is
  disabled in the reference itself, timed.cpp:598-606), so we pre-divide by
  the total weight per level — the per-frame normalizeUsingWeightMap kernel
  (multiband_blend.cu:102-108) disappears;
* accumulation into the panorama pyramid (addSrcWeightGpu32F,
  multiband_blend.cu:53-60) is `x.at[static slice].add`, with ring wraparound
  as at most two static slices on an exactly periodic panorama;
* everything runs in f32 (vs the reference's 16S fixed point) — inside the
  reference's own +-3/255 accuracy bound (test_blenders.cuda.cpp:95).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_stitcher_tpu.geometry.cylindrical import BandLayout
from video_stitcher_tpu.ops.pyramid import (
    gaussian_pyramid, laplacian_pyramid, pyr_up,
)

WEIGHT_EPS = 1e-5   # blenders.cpp WEIGHT_EPS


def _level_geom(layout: BandLayout, level: int):
    f = 1 << level
    return layout.pano_w // f, layout.pano_h // f, layout.band_w // f, \
        [c // f for c in layout.corners]


def _segments(corner: int, band_w: int, pano_w: int, wrap: bool):
    """Static (pano_x, band_x, width) copy segments, wrapping if needed."""
    if not wrap:
        c = max(0, min(corner, pano_w - band_w))
        return [(c, 0, band_w)]
    c = corner % pano_w
    if c + band_w <= pano_w:
        return [(c, 0, band_w)]
    first = pano_w - c
    return [(c, 0, first), (0, first, band_w - first)]


def place_bands(bands, layout: BandLayout, level: int):
    """Sum per-camera bands into the panorama at their static corners.

    bands: [N, ..., h_l, bw_l] -> [..., h_l, pw_l]

    Uses static zero-padding + adds (cheap, fusable) rather than
    .at[slice].add — XLA lowers the latter to a TPU scatter, which
    serializes (measured ~100x slower at pano scale).
    """
    pw, ph, bw, corners = _level_geom(layout, level)
    ndim = bands.ndim - 1
    pano = None
    for i, corner in enumerate(corners):
        for px, bx, wseg in _segments(corner, bw, pw, layout.wrap):
            cfg = [(0, 0, 0)] * (ndim - 1) + [(px, pw - px - wseg, 0)]
            piece = jax.lax.pad(bands[i, ..., bx:bx + wseg],
                                jnp.zeros((), bands.dtype), cfg)
            pano = piece if pano is None else pano + piece
    return pano


def crop_band(pano, layout: BandLayout, cam: int, level: int):
    """Extract camera `cam`'s band view from a panorama-sized level array."""
    pw, ph, bw, corners = _level_geom(layout, level)
    c = corners[cam]
    if not layout.wrap:
        c = max(0, min(c, pw - bw))
        return pano[..., c:c + bw]
    c = c % pw
    if c + bw <= pw:
        return pano[..., c:c + bw]
    first = pw - c
    return jnp.concatenate([pano[..., c:], pano[..., :bw - first]], axis=-1)


def build_weight_pyramids(weights0, layout: BandLayout):
    """Precompute normalized per-camera weight pyramids + panorama validity.

    weights0: f32 [N, bandH, bandW] in [0, 1] (seam mask AND warp validity,
    as calibration.cpp:224-240 feeds init_gpu).
    Returns (norm_pyr: tuple of f32 [N, 1, h_l, w_l], valid: f32 [pano_h, pano_w]).
    """
    w0 = jnp.asarray(weights0, jnp.float32)[:, None]        # [N,1,H,W]
    pyr = gaussian_pyramid(w0, layout.num_bands)            # blenders.cpp:421-423
    norm = []
    for lvl, wl in enumerate(pyr):
        total = place_bands(wl, layout, lvl)                # [1, h_l, pw_l]
        inv = 1.0 / (total + WEIGHT_EPS)
        norm.append(jnp.stack([wl[i] * crop_band(inv, layout, i, lvl)
                               for i in range(w0.shape[0])]))
    total0 = place_bands(w0, layout, 0)[0]
    valid = (total0 > WEIGHT_EPS).astype(jnp.float32)
    return tuple(norm), valid


def blend_bands(bands, weight_pyr: Sequence, layout: BandLayout, valid=None,
                precision: str = "highest"):
    """Per-frame multiband blend.

    bands:      f32 [N, C, bandH, bandW] (warped, gain-compensated)
    weight_pyr: normalized pyramids from build_weight_pyramids
    precision:  pyramid mode — "highest" (bit-faithful), "default" (bf16
                MXU passes on f32 tensors, 54 dB vs "highest"), "bf16"
                (bf16 STORAGE too: halves blend HBM traffic, 3.9 ->
                3.0 ms on the 6-cam rig, 56 dB vs the f32 chain; the
                collapse still accumulates each level in f32)
    Returns pano f32 [C, pano_h, pano_w].
    Replaces feed_online (blenders.cpp:700-749) + blend (blenders.cpp:758-831).
    """
    levels = layout.num_bands
    bf16 = precision == "bf16"
    dt = jnp.bfloat16 if bf16 else jnp.float32
    lap = laplacian_pyramid(bands, levels, precision)
    acc = [place_bands(lap[l] * weight_pyr[l].astype(dt), layout, l)
           for l in range(levels + 1)]
    out = acc[-1]
    for l in range(levels - 1, -1, -1):
        # each level's sum runs in f32 (pyr_up emits f32 from the bf16
        # operands for free via preferred_element_type), re-rounded to
        # the storage dtype only between levels
        out = acc[l].astype(jnp.float32) + pyr_up(
            out, acc[l].shape[-2], acc[l].shape[-1], precision,
            out_dtype=jnp.float32)
        if bf16 and l > 0:
            out = out.astype(dt)
    if valid is not None:
        out = out * valid[None]
    return out


def blend_bands_int16(bands, weights0, layout: BandLayout, valid=None):
    """Quantization-matched 16S twin of the reference's integer blend.

    Opt-in parity mode (Stitcher.stitch_int16) reproducing the CPU/CUDA
    reference arithmetic exactly — blenders.cpp:651-662 feed (dst16 +=
    static_cast<short>(lap16 * w32), truncation toward zero),
    blenders.cpp:908-912 normalize (static_cast<short>(acc / (w + eps))),
    16S pyramids bit-exact to cv::pyrDown/pyrUp (ops/pyramid_int.py),
    saturating 16S collapse (restoreImageFromLaplacePyr) — so its output
    can be compared to the reference's own 16S panorama without the
    reference's integer self-noise (~37.6 dB, BENCH reference_int_vs_f32_db)
    polluting the comparison. Not a production path: the live blend stays
    f32 (inside the reference's own ±3/255 bound).

    bands:    f32 [N, C, bandH, bandW] warped + gain-compensated
    weights0: f32 [N, bandH, bandW] raw (UN-normalized) seam weights, as
              calibration feeds init_gpu (aux["weights0"])
    Returns pano f32 [C, pano_h, pano_w] holding exact integers 0..255.
    """
    from video_stitcher_tpu.ops.pyramid_int import (
        laplacian_pyramid_i16, pyr_up_i16)
    nb = layout.num_bands
    # the reference hands the blender u8 images (remap output -> gain
    # convertTo u8 -> feed converts to 16S)
    img16 = jnp.clip(jnp.rint(bands), 0, 255).astype(jnp.int32)
    lap = laplacian_pyramid_i16(img16, nb)
    wpyr = gaussian_pyramid(weights0[:, None].astype(jnp.float32), nb,
                            "highest")
    norm = []
    for lvl in range(nb + 1):
        t = jnp.trunc(lap[lvl].astype(jnp.float32) * wpyr[lvl]
                      ).astype(jnp.int32)
        acc = place_bands(t, layout, lvl)
        wsum = place_bands(wpyr[lvl], layout, lvl)
        q = jnp.trunc(acc.astype(jnp.float32) / (wsum + WEIGHT_EPS))
        norm.append(jnp.clip(q, -32768, 32767).astype(jnp.int32))
    out = norm[-1]
    for lvl in range(nb - 1, -1, -1):
        up = pyr_up_i16(out, norm[lvl].shape[-2], norm[lvl].shape[-1])
        out = jnp.clip(norm[lvl] + up, -32768, 32767)   # saturating cv::add
    pano = jnp.clip(out, 0, 255).astype(jnp.float32)
    if valid is not None:
        pano = pano * valid[None]
    return pano


def blend_feather(bands, weights0_norm, layout: BandLayout, valid=None):
    """Single-level feather blend (FeatherBlender equivalent):
    pano = sum_c w_c * I_c with pre-normalized distance-ramp weights."""
    acc = place_bands(bands * weights0_norm[:, None], layout, 0)
    if valid is not None:
        acc = acc * valid[None]
    return acc


def feather_weights(masks, sharpness: float = 0.02) -> np.ndarray:
    """Distance-ramp feather weights from binary masks (u8 [N, H, W]).

    OpenCV FeatherBlender::createWeightMaps: w = min(1, distTransform * sharpness).
    """
    from scipy import ndimage
    out = np.zeros(masks.shape, np.float32)
    for i in range(masks.shape[0]):
        d = ndimage.distance_transform_edt(masks[i] > 0)
        out[i] = np.minimum(d * sharpness, 1.0)
    return out
