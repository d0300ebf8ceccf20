"""Quantization-matched 16S blend twin vs OpenCV's integer MultiBandBlender.

The reference's production blend runs in CV_16S fixed point
(sources/modules/stitching/src/blenders.cpp:651-662 feed,
cuda/multiband_blend.cu:11-25); its integer self-noise (~37.6 dB vs its
own float twin) caps any f32 implementation's PSNR against it. These
tests prove the opt-in int16 mode (ops/pyramid_int.py +
blend/multiband.py:blend_bands_int16) reproduces that integer arithmetic:

  1. integer pyrDown/pyrUp bit-exact vs cv2 on int16 inputs;
  2. the full int16 blend vs cv2.detail.MultiBandBlender (weights CV_32F,
     the configuration reference_gold.py uses as the integer gold) on a
     shared canvas — within 1 intensity level (float-summation-order
     trunc boundary flips only), against the reference's own ±3 bound
     (cv/stitching/test/test_blenders.cuda.cpp:95).

The end-to-end ≥40 dB assert lives in test_reference_gold.py.
"""

import cv2
import numpy as np
import pytest

from video_stitcher_tpu.geometry.cylindrical import BandLayout
from video_stitcher_tpu.blend.multiband import blend_bands_int16
from video_stitcher_tpu.ops.pyramid_int import pyr_down_i16, pyr_up_i16


def test_pyr_down_i16_bitexact_cv2(rng):
    for h, w in ((16, 24), (30, 42), (64, 128)):
        x = rng.integers(-3000, 3000, (h, w)).astype(np.int16)
        got = np.asarray(pyr_down_i16(x[None])).astype(np.int64)[0]
        gold = cv2.pyrDown(x).astype(np.int64)
        np.testing.assert_array_equal(got, gold)


def test_pyr_up_i16_bitexact_cv2(rng):
    for h, w in ((8, 12), (15, 21), (32, 64)):
        x = rng.integers(-8000, 8000, (h, w)).astype(np.int16)
        got = np.asarray(pyr_up_i16(x[None])).astype(np.int64)[0]
        gold = cv2.pyrUp(x).astype(np.int64)
        np.testing.assert_array_equal(got, gold)


@pytest.mark.parametrize("nb", [2, 4])
def test_blend_int16_matches_cv2_multiband(rng, nb):
    """Full-canvas 2-image blend: same inputs through blend_bands_int16
    and cv2.detail.MultiBandBlender -> identical integer panoramas.

    Full-canvas corners make the blender's bordered-ROI gap zero, so both
    sides build pyramids over the very same canvas and every remaining
    difference is blend arithmetic."""
    cv2.ocl.setUseOpenCL(False)
    h, w = 64, 128                      # multiples of 2^nb
    imgs = rng.integers(0, 256, (2, h, w, 3)).astype(np.uint8)
    # complementary halves with a crisp seam (Voronoi-style binary masks)
    masks = np.zeros((2, h, w), np.uint8)
    masks[0, :, : w // 2 + 5] = 255
    masks[1, :, w // 2 + 5:] = 255

    mb = cv2.detail.MultiBandBlender(0, nb, cv2.CV_32F)
    mb.prepare((0, 0, w, h))
    for i in range(2):
        mb.feed(imgs[i].astype(np.int16), masks[i], (0, 0))
    gold, gold_mask = mb.blend(None, None)
    gold = np.clip(gold, 0, 255).astype(np.int64)

    layout = BandLayout(scale=1.0, pano_w=w, pano_h=h, v0=0.0, u0=0.0,
                        band_w=w, band_h=h, corners=(0, 0), num_bands=nb,
                        wrap=False, gap=0)
    bands = np.moveaxis(imgs.astype(np.float32), -1, 1)     # [N,3,h,w]
    got = np.asarray(blend_bands_int16(bands, masks.astype(np.float32) / 255,
                                       layout))
    got = np.moveaxis(got, 0, -1).astype(np.int64)

    sel = np.asarray(gold_mask) > 0
    diff = np.abs(got[sel] - gold[sel])
    assert diff.max() <= 1, f"max diff {diff.max()}"
    # trunc-boundary flips must be rare, not systematic
    assert (diff > 0).mean() < 0.02, f"mismatch rate {(diff > 0).mean():.4f}"


def test_blend_int16_vs_f32_production_bound(rng):
    """The int16 twin vs the production f32 blend reproduces the
    reference's own integer-vs-float noise character: the reference's 16S
    chain scores ~37.6 dB against its float twin (BENCH
    reference_int_vs_f32_db), so our int16 mode must sit in that same
    band against our f32 blend — not closer (that would mean we didn't
    reproduce the quantization), not much farther (that would be a bug).
    Covers a camera band wrapping across the ring seam (two place_bands
    segments)."""
    from video_stitcher_tpu.blend.multiband import (
        blend_bands, build_weight_pyramids)
    nb = 3
    h, pw, bw = 32, 256, 160
    n = 2
    imgs = rng.integers(0, 256, (n, 3, h, bw)).astype(np.float32)
    # a true 2-camera ring: bands at 0..160 and 128..288 (wrapping x=0),
    # seams inside both overlaps so every pano pixel has total weight 1
    masks = np.zeros((n, h, bw), np.float32)
    masks[:, :, 16:144] = 1.0
    layout = BandLayout(scale=1.0, pano_w=pw, pano_h=h, v0=0.0, u0=0.0,
                        band_w=bw, band_h=h,
                        corners=(0, pw // 2),              # cam1 wraps x=0
                        num_bands=nb, wrap=True, gap=0)
    wpyr, valid = build_weight_pyramids(masks, layout)
    f32 = np.asarray(blend_bands(imgs, wpyr, layout, valid))
    i16 = np.asarray(blend_bands_int16(imgs, masks, layout, valid))
    sel = np.broadcast_to(np.asarray(valid) > 0, f32.shape)
    d = np.rint(f32[sel]) - i16[sel]
    psnr = 10 * np.log10(255.0 ** 2 / np.mean(d * d))
    assert 35.0 < psnr < 50.0, \
        f"int16 twin noise out of the reference's band: {psnr:.1f} dB"
    # truncation-toward-zero biases the integer chain low (the reference's
    # own 16S output carries a ~-1.1 DC bias vs its float twin)
    assert np.abs(d).mean() < 2.0
    # the bulk of pixels sits within the reference's own ±3 CUDA-vs-CPU
    # bound (test_blenders.cuda.cpp:95); sparse trunc-accumulation
    # outliers exceed it, exactly as in the reference's integer chain
    assert (np.abs(d) <= 3).mean() > 0.85
