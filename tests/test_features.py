"""Feature pipeline tests: detection repeatability, matching under a known
shift, RANSAC under outliers."""

import numpy as np
import pytest
import jax

from video_stitcher_tpu.features.orb import detect_and_describe
from video_stitcher_tpu.features.match import knn_ratio_match, hamming_matrix
from video_stitcher_tpu.features.ransac import ransac_homography


def checker_scene(rng, h=160, w=240):
    """Textured image with corners (random blocky pattern, blurred a bit)."""
    img = rng.integers(0, 255, (h // 8, w // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    return img


def test_fast_detects_corners(rng):
    img = checker_scene(rng)
    kp = detect_and_describe(img, max_keypoints=128, num_levels=1)
    assert int(np.sum(np.asarray(kp.valid))) > 30
    # corners of an 8px checkerboard land on the 8-grid
    xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
    off = np.minimum(xy % 8, 8 - (xy % 8))
    assert np.median(off) <= 1.5


def test_matching_under_shift(rng):
    img = checker_scene(rng, 192, 256)
    shift = 24
    img2 = np.roll(img, shift, axis=1)
    kp1 = detect_and_describe(img, max_keypoints=128, num_levels=1)
    kp2 = detect_and_describe(img2, max_keypoints=128, num_levels=1)
    m = knn_ratio_match(kp1.desc, kp2.desc, kp1.valid, kp2.valid)
    ok = np.asarray(m.valid)
    assert ok.sum() > 15
    p1 = np.asarray(kp1.xy)[np.asarray(m.query)[ok]]
    p2 = np.asarray(kp2.xy)[np.asarray(m.train)[ok]]
    dx = p2[:, 0] - p1[:, 0]
    dy = p2[:, 1] - p1[:, 1]
    # majority of matches should see the true shift (mod wraparound effects)
    good = (np.abs(((dx - shift + 128) % 256) - 128) < 2) & (np.abs(dy) < 2)
    assert good.mean() > 0.6


def test_atlas_descriptors_match_per_level_form(rng):
    """The level-atlas orientation/describe pass must be bit-identical to
    the per-level masked form it replaced (valid keypoints only: their
    patch taps and smoothing support stay inside the level rectangle)."""
    import jax.numpy as jnp
    from video_stitcher_tpu.features import orb
    from video_stitcher_tpu.ops.resize import resize_planar

    img = checker_scene(rng, 192, 256) + rng.normal(0, 3, (192, 256))
    img = img.astype(np.float32)
    kp = detect_and_describe(img, max_keypoints=96, num_levels=3)
    valid = np.asarray(kp.valid)
    assert valid.sum() > 20

    # per-level reference: recompute angle/desc for each keypoint on its
    # own level image (keypoint level = the one whose rectangle the
    # atlas pass sampled; recover it from the level scales)
    h0, w0 = img.shape
    xs = np.asarray(kp.xy)[:, 0]
    ys = np.asarray(kp.xy)[:, 1]
    angles_ref = np.zeros_like(xs)
    desc_ref = np.zeros((len(xs), 8), np.uint32)
    # assign each kp to the level that reproduces its angle bit-exactly:
    # instead, recompute per level and take the level whose desc matches
    # is circular — so derive levels from the solved angle being equal.
    # Simpler and strict: for every level, compute angle+desc for ALL
    # kps and require that SOME level reproduces the atlas output for
    # each valid kp.
    matched = np.zeros(len(xs), bool)
    for lvl in range(3):
        s = 1.2 ** lvl
        hs, ws = max(32, int(round(h0 / s))), max(32, int(round(w0 / s)))
        im = img if lvl == 0 else np.asarray(resize_planar(
            jnp.asarray(img), hs, ws))
        sm = orb._box5(jnp.asarray(im))
        lx = jnp.asarray(xs * (ws / w0))
        ly = jnp.asarray(ys * (hs / h0))
        a = orb._orientation(sm, lx, ly)
        d = np.asarray(orb._describe(sm, lx, ly, a))
        same = np.all(d == np.asarray(kp.desc), axis=1) \
            & np.isclose(np.asarray(a), np.asarray(kp.angle), atol=1e-5)
        matched |= same
    assert matched[valid].all(), \
        f"{(~matched[valid]).sum()} valid kps differ from every level"


def test_hamming_matrix_basic():
    d1 = np.array([[0, 0], [0xFFFFFFFF, 0]], np.uint32)
    d2 = np.array([[0, 0], [0xFFFFFFFF, 0xFFFFFFFF]], np.uint32)
    dist = np.asarray(hamming_matrix(d1, d2))
    assert dist[0, 0] == 0
    assert dist[0, 1] == 64
    assert dist[1, 0] == 32
    assert dist[1, 1] == 32


def test_ransac_recovers_inliers(rng):
    k = 200
    p1 = rng.random((k, 2)).astype(np.float32) * 400
    h_true = np.array([[1.02, 0.01, 5.0], [-0.01, 0.99, -3.0], [1e-5, 0, 1.0]])
    hom = (h_true @ np.concatenate([p1, np.ones((k, 1))], 1).T).T
    p2 = (hom[:, :2] / hom[:, 2:3]).astype(np.float32)
    outlier = rng.random(k) < 0.3
    p2[outlier] += rng.normal(0, 60, (int(outlier.sum()), 2))
    valid = np.ones(k, bool)
    key = jax.random.PRNGKey(0)
    h, inl, n = ransac_homography(p1, p2, valid, key)
    inl = np.asarray(inl)
    # should keep most true inliers and reject most outliers
    assert inl[~outlier].mean() > 0.9
    assert inl[outlier].mean() < 0.15
