"""Geometry tests: projection roundtrip, parity with OpenCV's warper math,
and band-layout invariants."""

import math

import numpy as np
import pytest

from video_stitcher_tpu.config import StitcherConfig
from video_stitcher_tpu.geometry import (
    fixed_rig_cameras, cylindrical_forward, cylindrical_backward_map,
    plan_band_layout,
)
from video_stitcher_tpu.geometry.cylindrical import band_backward_maps


def _compose_cams(cfg):
    cams = fixed_rig_cameras(cfg.num_images, cfg.input_width, cfg.input_height,
                             cfg.work_scale, cfg.fov_deg, cfg.yaws)
    return [c.scaled(cfg.compose_work_aspect) for c in cams]


def test_focal_matches_reference():
    """calibration.cpp:31-32,63: f = ppx / tan(45deg) = ppx for 90deg FoV."""
    cfg = StitcherConfig()
    cams = fixed_rig_cameras(6, 1920, 1080, cfg.work_scale)
    assert math.isclose(cams[0].focal, 1920 * cfg.work_scale / 2, rel_tol=1e-12)
    assert math.isclose(cams[3].yaw, math.pi, rel_tol=1e-12)


def test_forward_backward_roundtrip():
    cfg = StitcherConfig()
    cams = _compose_cams(cfg)
    s = cams[0].focal
    rng = np.random.default_rng(1)
    for cam in cams:
        x = rng.random(50) * 1577
        y = rng.random(50) * 886
        u, v = cylindrical_forward(cam, s, x, y)
        mx, my = cylindrical_backward_map(cam, s, u, v)
        np.testing.assert_allclose(mx, x, atol=1e-3)
        np.testing.assert_allclose(my, y, atol=1e-3)


def test_backward_matches_opencv_cylindrical():
    """Backward map values vs cv2 CylindricalWarper buildMaps (the same math
    as build_warp_maps.cu:88-107) for the yaw=0 camera."""
    cv2 = pytest.importorskip("cv2")
    cfg = StitcherConfig()
    cam = _compose_cams(cfg)[0]
    s = cam.focal
    warper = cv2.PyRotationWarper("cylindrical", float(s))
    K = cam.K.astype(np.float32)
    R = cam.R.astype(np.float32)
    roi, gx, gy = warper.buildMaps((1578, 887), K, R)
    tlx, tly = roi[0], roi[1]
    u = np.arange(gx.shape[1], dtype=np.float64)[None, :] + tlx + np.zeros((gx.shape[0], 1))
    v = np.arange(gx.shape[0], dtype=np.float64)[:, None] + tly + np.zeros((1, gx.shape[1]))
    mx, my = cylindrical_backward_map(cam, s, u, v)
    good = (gx >= 0) & (gy >= 0) & (mx >= 0) & (my >= 0)
    assert good.mean() > 0.5
    np.testing.assert_allclose(mx[good], gx[good], atol=0.01)
    np.testing.assert_allclose(my[good], gy[good], atol=0.01)


def test_band_layout_invariants():
    cfg = StitcherConfig()
    cams = _compose_cams(cfg)
    lay = plan_band_layout(cams, 1578, 887, cfg.blend_strength, wrap=True)
    a = lay.align
    assert lay.pano_w % a == 0 and lay.pano_h % a == 0 and lay.band_w % a == 0
    assert all(c % a == 0 for c in lay.corners)
    assert lay.num_bands >= 4
    # periodic width equals 2*pi*scale exactly
    assert math.isclose(lay.pano_w, 2 * math.pi * lay.scale, rel_tol=1e-12)
    # scale adjustment is tiny
    assert abs(lay.scale - cams[0].focal) / cams[0].focal < 0.01
    # every camera's valid span fits its band
    from video_stitcher_tpu.geometry.cylindrical import detect_extents
    urmin, urmax, _, _ = detect_extents(cams[0], lay.scale, 1578, 887)
    for cam, corner in zip(cams, lay.corners):
        ctr = lay.scale * cam.yaw
        assert corner <= ctr + urmin
        assert corner + lay.band_w >= ctr + urmax


def test_band_maps_cover_sources():
    cfg = StitcherConfig(num_images=6)
    cams = _compose_cams(cfg)
    lay = plan_band_layout(cams, 1578, 887, cfg.blend_strength, wrap=True)
    maps = band_backward_maps(lay, cams)
    assert maps.shape == (6, 2, lay.band_h, lay.band_w)
    for i in range(6):
        valid = ((maps[i, 0] >= 0) & (maps[i, 0] <= 1577) &
                 (maps[i, 1] >= 0) & (maps[i, 1] <= 886))
        # the valid projection region should be a solid chunk of the band
        assert 0.2 < valid.mean() < 0.95


def test_nonwrap_layout():
    cfg = StitcherConfig(num_images=3, wrap_around=False,
                         yaws=(0.0, 2 * math.pi / 6, 4 * math.pi / 6))
    cams = _compose_cams(cfg)
    lay = plan_band_layout(cams, 1578, 887, cfg.blend_strength, wrap=False)
    assert not lay.wrap
    assert min(lay.corners) == 0
    assert max(c + lay.band_w for c in lay.corners) <= lay.pano_w


def test_band_maps_device_matches_host():
    """The jitted f32 device twin must match the host f64 builder to
    sub-0.01 px with identical validity (calibration runs on it)."""
    import numpy as np
    from video_stitcher_tpu.geometry.cylindrical import (
        band_backward_maps_device)
    cfg = StitcherConfig(num_images=6)
    cams = _compose_cams(cfg)
    lay = plan_band_layout(cams, 1578, 887, cfg.blend_strength, wrap=True)
    h = band_backward_maps(lay, cams)
    d = np.asarray(band_backward_maps_device(lay, cams))
    # the out-of-frustum sentinel sets BOTH coords to exactly -1; the
    # frustum test must agree bitwise (the boundary lies far outside any
    # band for a ring rig). Genuine coordinates near -1.0 may flip sides
    # of the -1 threshold under f32 rounding, so they are compared by
    # tolerance, not sign.
    hs = (h[:, 0] == -1) & (h[:, 1] == -1)
    ds = (d[:, 0] == -1) & (d[:, 1] == -1)
    assert (hs == ds).all()
    m = ~hs[:, None, :, :] & np.ones((1, 2, 1, 1), bool)
    assert np.abs(h - d)[m].max() < 0.01
