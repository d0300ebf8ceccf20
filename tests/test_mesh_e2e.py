"""Mesh-path end-to-end: on synthetic views rendered with the exact rig
geometry there is no parallax, so the CPW solve must return a near-identity
mesh and must not degrade the stitched panorama."""

import numpy as np
import pytest

from video_stitcher_tpu.config import StitcherConfig
from video_stitcher_tpu import Stitcher
from video_stitcher_tpu.calib.calibration import plan_geometry
from test_stitch_e2e import make_scene, render_views, psnr

CFG = dict(num_images=6, input_width=320, input_height=180,
           enable_local=True, recalibrate=True)


@pytest.fixture(scope="module")
def mesh_stitch():
    cfg = StitcherConfig(**CFG)
    geom, _ = plan_geometry(cfg)
    rng = np.random.default_rng(11)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng, smooth=4)
    frames = render_views(cfg, geom, scene)
    st = Stitcher(cfg)
    st.calibrate(frames)           # includes initial CPW solve
    return cfg, geom, scene, frames, st


def test_mesh_near_identity_without_parallax(mesh_stitch):
    cfg, geom, scene, frames, st = mesh_stitch
    pipe = getattr(st, "_mesh_pipe", None)
    assert pipe is not None, "mesh pipeline did not run"
    solver = pipe.solver
    # matches must have been found on at least half the seams
    n_with = sum(1 for m in solver.old_matches if m is not None and len(m.p1))
    assert n_with >= 3
    # solve again and inspect displacement (run returns the coarse
    # backward displacement; densify to full res like the old contract)
    from video_stitcher_tpu.mesh.mesh2map import upsample_backward_disp
    disp = pipe.run(frames)
    assert disp is not None
    import jax.numpy as jnp
    maps = np.asarray(upsample_backward_disp(
        jnp.asarray(disp), geom.layout.band_h, geom.layout.band_w))
    gy, gx = np.mgrid[0:geom.layout.band_h, 0:geom.layout.band_w]
    dx = np.abs(maps[:, 0] - gx)
    dy = np.abs(maps[:, 1] - gy)
    assert np.median(dx) < 3.0, f"median |dx| {np.median(dx):.1f}px"
    assert np.median(dy) < 3.0, f"median |dy| {np.median(dy):.1f}px"
    assert dx.max() < 25.0 and dy.max() < 25.0


def test_mesh_does_not_degrade_psnr(mesh_stitch):
    cfg, geom, scene, frames, st = mesh_stitch
    pano_mesh = st.stitch(frames)
    # global-only reference
    cfg2 = StitcherConfig(**{**CFG, "enable_local": False})
    st2 = Stitcher(cfg2)
    st2.calibrate(frames)
    pano_glob = st2.stitch(frames)
    valid = np.asarray(st2.state.valid_mask) > 0
    h = geom.pano_h
    gt = np.moveaxis(scene, 0, -1)
    sel = valid[h // 4: 3 * h // 4]
    p_g = psnr(pano_glob[h // 4:3 * h // 4][sel], gt[h // 4:3 * h // 4][sel])
    p_m = psnr(pano_mesh[h // 4:3 * h // 4][sel], gt[h // 4:3 * h // 4][sel])
    # the solved mesh is near-identity (max ~0.8px displacement) but any
    # sub-pixel warp of sharp texture costs ~2-3 dB at the 42 dB operating
    # point; the bound guards against gross mesh failures, not resampling
    assert p_m > p_g - 3.0, f"mesh path dropped PSNR {p_g:.1f} -> {p_m:.1f} dB"
