"""map_convention="exact" (config.py): the fused backward maps must equal
the analytic source-resolution projection to sub-millipixel error —
eliminating the reference chain's half-pixel + compose-truncation bias
(calibration.cpp:171-213 + timed.cpp:75-90), which the scene-truth
harness measured at ~0.49 px median / -10 dB pano PSNR (bench.py
psnr_vs_scene_db 36.1 -> 46.1 dB on the production geometry)."""

import numpy as np
import pytest

from video_stitcher_tpu.config import StitcherConfig
from video_stitcher_tpu.calib.calibration import (
    plan_geometry, map_cams, compose_fused_maps)
from video_stitcher_tpu.geometry.camera import fixed_rig_cameras
from video_stitcher_tpu.geometry.cylindrical import band_backward_maps


def _fused_and_truth(cfg):
    geom, cams_compose = plan_geometry(cfg)
    lay = geom.layout
    cams = map_cams(cfg, cams_compose)
    fused = compose_fused_maps(geom, band_backward_maps(lay, cams))
    cams_full = fixed_rig_cameras(cfg.num_images, cfg.input_width,
                                  cfg.input_height, 1.0, cfg.fov_deg,
                                  cfg.yaws)
    truth = band_backward_maps(lay, cams_full)
    inb = ((truth[:, 0] > 1) & (truth[:, 0] < cfg.input_width - 2)
           & (truth[:, 1] > 1) & (truth[:, 1] < cfg.input_height - 2))
    return geom, fused, truth, inb


def test_exact_maps_match_analytic_truth():
    """Mid minification (0.5 < compose_scale < 0.9, resize active, fused
    single-resample path): fused map == full-res analytic projection."""
    cfg = StitcherConfig(num_images=4, input_width=640, input_height=360,
                         compose_megapix=0.12)
    geom, fused, truth, inb = _fused_and_truth(cfg)
    assert not geom.prewarp and abs(geom.compose_scale - 1.0) > 1e-1
    err = np.abs(fused - truth)
    assert err[:, 0][inb].max() < 1e-3
    assert err[:, 1][inb].max() < 1e-3


def test_exact_maps_prewarp_per_axis_resize_relation():
    """Strong minification (prewarp): map values must be the full-res
    projection taken through the per-axis cv2 resize pixel-center
    relation of the resize the per-frame path actually performs."""
    cfg = StitcherConfig(num_images=4, input_width=640, input_height=360,
                         compose_megapix=0.04)
    geom, fused, truth, inb = _fused_and_truth(cfg)
    assert geom.prewarp
    sx = geom.compose_w / geom.src_w
    sy = geom.compose_h / geom.src_h
    want_x = (truth[:, 0] + 0.5) * sx - 0.5
    want_y = (truth[:, 1] + 0.5) * sy - 0.5
    assert np.abs(fused[:, 0] - want_x)[inb].max() < 1e-3
    assert np.abs(fused[:, 1] - want_y)[inb].max() < 1e-3


def test_reference_convention_keeps_the_bias():
    """map_convention="reference" must keep reproducing the reference's
    map chain: a systematic positive offset vs the analytic truth
    (0.5*(1-s)/s plus the int-truncated compose-size scale term). This
    guards the parity twins (bench/reference_gold) against silent
    convention drift in either direction."""
    cfg = StitcherConfig(num_images=4, input_width=640, input_height=360,
                         compose_megapix=0.12, map_convention="reference")
    geom, fused, truth, inb = _fused_and_truth(cfg)
    s = geom.compose_scale
    dx = (fused - truth)[:, 0][inb]
    base = 0.5 * (1.0 - s) / s
    assert dx.mean() > 0.8 * base
    assert np.abs(dx).mean() > 0.05      # the bias is real at this scale


def test_default_is_exact():
    assert StitcherConfig(num_images=2).map_convention == "exact"
    with pytest.raises(ValueError):
        StitcherConfig(num_images=2, map_convention="bogus")
