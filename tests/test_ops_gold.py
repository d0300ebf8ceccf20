"""Gold tests: JAX ops vs OpenCV reference semantics.

Mirrors the reference's GPU-vs-CPU gold pattern
(cv/cudawarping/test/test_remap.cpp:52-110 etc.): every kernel is compared
against the library implementation the reference app actually calls.
"""

import cv2
import numpy as np
import pytest

from video_stitcher_tpu.ops import remap, resize, pyr_down, pyr_up, color, dilate3x3
from video_stitcher_tpu.ops.pyramid import laplacian_pyramid, collapse_laplacian

BORDER_MAP = {
    "constant": cv2.BORDER_CONSTANT,
    "replicate": cv2.BORDER_REPLICATE,
    "reflect": cv2.BORDER_REFLECT,
    "reflect101": cv2.BORDER_REFLECT_101,
    "wrap": cv2.BORDER_WRAP,
}


def _rand_img(rng, h=37, w=53, c=3):
    return rng.integers(0, 256, (h, w, c)).astype(np.float32)


@pytest.mark.parametrize("border", ["constant", "replicate", "reflect", "reflect101"])
@pytest.mark.parametrize("interp", ["linear", "nearest"])
def test_remap_vs_cv2(rng, border, interp):
    img = _rand_img(rng)
    h, w = img.shape[:2]
    # smooth-ish maps straddling the borders
    mx = (rng.random((29, 31)).astype(np.float32) * (w + 16)) - 8
    my = (rng.random((29, 31)).astype(np.float32) * (h + 16)) - 8
    flag = cv2.INTER_LINEAR if interp == "linear" else cv2.INTER_NEAREST
    gold = cv2.remap(img, mx, my, flag, borderMode=BORDER_MAP[border],
                     borderValue=(0, 0, 0))
    got = np.asarray(remap(img, mx, my, interpolation=interp, border=border))
    if interp == "nearest":
        # rounding of exact-half coordinates may differ; allow tiny mismatch count
        frac_x = np.abs((mx + 0.5) - np.round(mx + 0.5)) < 1e-3
        frac_y = np.abs((my + 0.5) - np.round(my + 0.5)) < 1e-3
        mask = ~(frac_x | frac_y)
        np.testing.assert_allclose(got[mask], gold[mask], atol=1e-3)
    else:
        # cv2 uses 5-bit fixed point interp coefficients -> tolerance
        np.testing.assert_allclose(got, gold, atol=6.0)


@pytest.mark.parametrize("border", ["constant", "replicate"])
def test_remap_cubic_vs_cv2(rng, border):
    """INTER_CUBIC (A=-0.75, 4x4 taps) — the opt-in quality warp used by
    the supersampled stitch path."""
    img = _rand_img(rng)
    h, w = img.shape[:2]
    mx = (rng.random((29, 31)).astype(np.float32) * (w + 16)) - 8
    my = (rng.random((29, 31)).astype(np.float32) * (h + 16)) - 8
    gold = cv2.remap(img, mx, my, cv2.INTER_CUBIC,
                     borderMode=BORDER_MAP[border], borderValue=(0, 0, 0))
    got = np.asarray(remap(img, mx, my, interpolation="cubic", border=border))
    np.testing.assert_allclose(got, gold, atol=6.0)


def test_remap_linear_exact_float(rng):
    """Against a scalar float NumPy reference (no fixed-point), tight tol."""
    img = _rand_img(rng, 17, 19, 1)[..., 0]
    mx = rng.random((11, 13)).astype(np.float32) * 18
    my = rng.random((11, 13)).astype(np.float32) * 16
    gold = np.zeros((11, 13), np.float32)
    for y in range(11):
        for x in range(13):
            sx, sy = mx[y, x], my[y, x]
            x0, y0 = int(np.floor(sx)), int(np.floor(sy))
            fx, fy = sx - x0, sy - y0
            def tap(ix, iy):
                if 0 <= ix < 19 and 0 <= iy < 17:
                    return img[iy, ix]
                return 0.0
            gold[y, x] = (tap(x0, y0) * (1 - fx) * (1 - fy) + tap(x0 + 1, y0) * fx * (1 - fy)
                          + tap(x0, y0 + 1) * (1 - fx) * fy + tap(x0 + 1, y0 + 1) * fx * fy)
    got = np.asarray(remap(img, mx, my))
    np.testing.assert_allclose(got, gold, atol=1e-3)


@pytest.mark.parametrize("shape", [((40, 60), (80, 130)), ((64, 48), (31, 23)),
                                   ((37, 53), (37, 53))])
def test_resize_vs_cv2(rng, shape):
    (h, w), (oh, ow) = shape
    img = _rand_img(rng, h, w)
    gold = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize(img, oh, ow))
    # cv2 quantizes interpolation coefficients (fixed point); allow 2 levels
    np.testing.assert_allclose(got, gold, atol=2.0)


def test_pyr_down_vs_cv2(rng):
    img = _rand_img(rng, 64, 96)
    gold = cv2.pyrDown(img)
    got = np.asarray(pyr_down(np.moveaxis(img, -1, 0)))
    got = np.moveaxis(got, 0, -1)
    np.testing.assert_allclose(got, gold, atol=1.0)


def test_pyr_up_vs_cv2(rng):
    img = _rand_img(rng, 32, 48)
    gold = cv2.pyrUp(img)
    got = np.asarray(pyr_up(np.moveaxis(img, -1, 0)))
    got = np.moveaxis(got, 0, -1)
    np.testing.assert_allclose(got, gold, atol=1.0)


def test_laplacian_roundtrip(rng):
    img = _rand_img(rng, 64, 128)
    planar = np.moveaxis(img, -1, 0)
    lap = laplacian_pyramid(planar, 4)
    rec = np.asarray(collapse_laplacian(lap))
    np.testing.assert_allclose(rec, planar, atol=1e-2)


def test_nv12_to_rgb_vs_cv2(rng):
    h, w = 32, 64
    nv12 = rng.integers(0, 256, (h * 3 // 2, w)).astype(np.uint8)
    gold = cv2.cvtColor(nv12, cv2.COLOR_YUV2RGB_NV12).astype(np.float32)
    got = np.asarray(color.nv12_to_rgb(nv12))
    assert np.mean(np.abs(got - gold)) < 1.0
    assert np.max(np.abs(got - gold)) <= 3.0


def test_rgb_to_gray_vs_cv2(rng):
    img = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
    gold = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
    got = np.asarray(color.rgb_to_gray(img.astype(np.float32)))
    assert np.max(np.abs(np.round(got) - gold)) <= 1.0


def test_rgb_to_i420_vs_cv2(rng):
    img = rng.integers(0, 256, (32, 64, 3)).astype(np.uint8)
    gold = cv2.cvtColor(img, cv2.COLOR_RGB2YUV_I420)
    got = np.asarray(color.rgb_to_i420(img))
    assert got.shape == gold.shape
    assert np.mean(np.abs(got.astype(np.int32) - gold.astype(np.int32))) < 1.5


def test_dilate3x3_vs_cv2(rng):
    m = (rng.random((20, 30)) > 0.8).astype(np.float32) * 255
    gold = cv2.dilate(m, np.ones((3, 3), np.uint8))
    got = np.asarray(dilate3x3(m))
    np.testing.assert_allclose(got, gold)


def test_nv12_planar_matches_hwc(rng):
    from video_stitcher_tpu.ops.color import nv12_to_rgb, nv12_to_rgb_planar
    import jax.numpy as jnp
    nv = rng.integers(0, 255, (24, 64)).astype(np.uint8)
    hwc = np.asarray(nv12_to_rgb(jnp.asarray(nv)))
    planar = np.asarray(nv12_to_rgb_planar(jnp.asarray(nv)))
    np.testing.assert_allclose(np.moveaxis(planar, 0, -1), hwc, atol=1e-3)


def test_nv12_scaled_matches_unfused_chain(rng):
    """nv12_to_rgb_planar_scaled must equal convert-then-resize: same
    linear operator (interp matrices composed with the chroma dedup at
    trace time), so on CPU the only slack is f32 accumulation order —
    except where out-of-gamut RGB clips (full-res clip in the old chain
    vs compose-scale clip in the fused one), excluded via in-gamut
    content below."""
    import jax.numpy as jnp
    from video_stitcher_tpu.ops.color import (
        nv12_to_rgb_planar, nv12_to_rgb_planar_scaled, rgb_to_nv12)
    from video_stitcher_tpu.ops.resize import resize_planar
    h, w = 96, 128
    # in-gamut content: smooth RGB round-tripped through NV12 (raw random
    # chroma is far out of gamut and would measure the clip-order
    # difference instead of the operator)
    rgb = cv2.GaussianBlur(
        rng.integers(0, 256, (h, w, 3)).astype(np.uint8), (0, 0), 3)
    nv = np.asarray(rgb_to_nv12(jnp.asarray(rgb)))
    for oh, ow in ((39, 53), (48, 64), (130, 170)):   # down, half, up
        old = np.asarray(jnp.clip(resize_planar(
            nv12_to_rgb_planar(jnp.asarray(nv)), oh, ow), 0, 255))
        new = np.asarray(nv12_to_rgb_planar_scaled(jnp.asarray(nv), oh, ow))
        assert new.shape == (3, oh, ow)
        np.testing.assert_allclose(new, old, atol=2e-2)


def test_nv12_scaled_banded_matches_dense(rng):
    """The band-tiled matrix path (large W) must match the dense one."""
    import jax.numpy as jnp
    import importlib
    rz = importlib.import_module("video_stitcher_tpu.ops.resize")
    from video_stitcher_tpu.ops.color import (
        nv12_to_rgb_planar_scaled, _nv12_scaled_mats)
    h, w, oh, ow = 96, 256, 40, 104
    nv = rng.integers(0, 256, (h * 3 // 2, w)).astype(np.uint8)
    dense = np.asarray(nv12_to_rgb_planar_scaled(jnp.asarray(nv), oh, ow))
    old_thresh = rz._BAND_THRESHOLD
    try:
        rz._BAND_THRESHOLD = 1          # force tiling everywhere
        _nv12_scaled_mats.cache_clear()
        banded = np.asarray(
            nv12_to_rgb_planar_scaled(jnp.asarray(nv), oh, ow))
    finally:
        rz._BAND_THRESHOLD = old_thresh
        _nv12_scaled_mats.cache_clear()
    np.testing.assert_allclose(banded, dense, atol=2e-2)


def test_stitch_nv12_matches_rgb():
    """stitch_nv12 must agree with stitch() fed the converted RGB."""
    import jax
    import jax.numpy as jnp
    from video_stitcher_tpu.config import StitcherConfig
    from video_stitcher_tpu import Stitcher
    from video_stitcher_tpu.ops.color import nv12_to_rgb
    rng = np.random.default_rng(5)
    # float32 blend isolates the NV12-vs-RGB input comparison (the default
    # bf16-stored blend adds its own rounding to both sides)
    cfg = StitcherConfig(num_images=2, input_width=128, input_height=64,
                         enable_local=False, recalibrate=False,
                         yaws=(0.0, 1.0), wrap_around=False,
                         blend_dtype="float32")
    nv = rng.integers(0, 255, (2, 96, 128)).astype(np.uint8)
    rgb = np.asarray(jax.vmap(nv12_to_rgb)(jnp.asarray(nv))).astype(np.uint8)
    st = Stitcher(cfg)
    st.calibrate(rgb)
    a = st.stitch_nv12(nv)
    b = st.stitch(rgb)
    # the RGB path quantizes the converted frames to u8 first; the NV12
    # path keeps them in bf16, so allow the rounding step
    diff = np.abs(a.astype(int) - b.astype(int))
    assert diff.max() <= 2, diff.max()


def test_remap_nearest_half_to_even(rng):
    """cv2 INTER_NEAREST rounds half-to-EVEN (cvRound); pin the exact
    tie behavior (review r5 — floor(x+0.5) diverged at .5 coords)."""
    from video_stitcher_tpu.ops.remap import remap_planar
    import jax.numpy as jnp
    img = np.arange(16, dtype=np.float32).reshape(2, 8)
    mx = np.array([[1.5, 2.5, 3.5, 4.5]], np.float32)
    my = np.zeros_like(mx)
    gold = cv2.remap(img, mx, my, cv2.INTER_NEAREST)
    got = np.asarray(remap_planar(jnp.asarray(img[None]), jnp.asarray(mx),
                                  jnp.asarray(my),
                                  interpolation="nearest"))[0]
    np.testing.assert_array_equal(got, gold)
