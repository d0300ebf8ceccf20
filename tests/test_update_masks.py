"""update_masks: re-warping the seam weights through the CPW mesh and
rebuilding the blend weight pyramids (MultiBandBlender::update_mask,
blenders.cpp:297-315). The reference DISABLED its call sites ("causes
black seams", timed.cpp:598-606 / calibration.cpp:305-308); this build
claims the pre-normalized pyramids make the operation safe
(stitcher.py _rebuild_weights). These tests demonstrate that claim
(VERDICT r3 #3): identity parity, a known shift moving the seam, and a
full recalibration + Runner pass with no black-seam regression."""

import dataclasses
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from video_stitcher_tpu.config import StitcherConfig
from video_stitcher_tpu.pipeline.stitcher import Stitcher

from test_stitch_e2e import make_scene, render_views, psnr


def _small_cfg(**kw):
    base = dict(num_images=6, input_width=320, input_height=180,
                enable_local=True, recalibrate=False)
    base.update(kw)
    return StitcherConfig(**base)


def _calibrated(cfg):
    from video_stitcher_tpu.calib.calibration import plan_geometry
    geom, _ = plan_geometry(cfg)
    rng = np.random.default_rng(11)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng)
    frames = render_views(cfg, geom, scene)
    st = Stitcher(cfg)
    st.calibrate(frames)
    return st, frames, scene


def _identity_maps(st):
    lay = st.geom.layout
    c = st.geom.num_images
    yy, xx = np.mgrid[0:lay.band_h, 0:lay.band_w].astype(np.float32)
    return np.broadcast_to(np.stack([xx, yy]),
                           (c, 2, lay.band_h, lay.band_w)).copy()


def test_update_masks_identity_parity():
    """Rebuilding weights through an IDENTITY mesh must reproduce the
    calibration-time pyramids exactly (bilinear resample at integer
    coordinates is exact)."""
    st, frames, _ = _calibrated(_small_cfg())
    new_state = st._rebuild_weights(st.state, _identity_maps(st))
    for lvl, (orig, new) in enumerate(zip(st.state.weight_pyr,
                                          new_state.weight_pyr)):
        np.testing.assert_allclose(np.asarray(new), np.asarray(orig),
                                   atol=1e-5,
                                   err_msg=f"weight pyramid level {lvl}")
    np.testing.assert_allclose(np.asarray(new_state.valid_mask),
                               np.asarray(st.state.valid_mask), atol=1e-5)


def test_update_masks_shift_moves_seam():
    """A +dx backward-map shift must move the rebuilt level-0 weights by
    dx (new_w(x) = w0(x+dx)): the seam tracks the mesh, which is the whole
    point of update_mask."""
    st, frames, _ = _calibrated(_small_cfg())
    dx = 6
    maps = _identity_maps(st)
    maps[:, 0] += dx
    new_state = st._rebuild_weights(st.state, maps)
    w_orig = np.asarray(st.state.weight_pyr[0][:, 0])   # [C, bh, bw]
    w_new = np.asarray(new_state.weight_pyr[0][:, 0])
    # interior comparison (the band edge loses dx columns to the border)
    np.testing.assert_allclose(w_new[:, :, :-dx], w_orig[:, :, dx:],
                               atol=1e-4)


def test_update_masks_real_mesh_no_black_seams():
    """The exact operation the reference disabled (blenders.cpp:297-315,
    'causes black seams' timed.cpp:598-606): with the SAME installed CPW
    mesh, stitch once with the calibration-time weights and once with
    weights re-warped through that mesh. On the parallax-free synthetic
    rig a seam move must be nearly invisible (high PSNR) and must
    introduce NO new black pixels in the valid region."""
    from video_stitcher_tpu.mesh.pipeline import solve_mesh_maps
    from video_stitcher_tpu.mesh.mesh2map import upsample_backward_disp
    import jax.numpy as jnp

    st, frames, _ = _calibrated(_small_cfg(recalibrate=True))
    pano_fixed = st.stitch(frames)
    valid = np.asarray(st.state.valid_mask) > 0

    # the installed mesh's dense backward maps (stability reuse returns
    # the same mesh the state carries)
    disp = solve_mesh_maps(frames, st)
    assert disp is not None
    lay = st.geom.layout
    mesh_maps = upsample_backward_disp(jnp.asarray(disp),
                                       lay.band_h, lay.band_w)
    new_state = st._rebuild_weights(st.state, mesh_maps)
    st.swap_state(new_state)
    pano_upd = st.stitch(frames)

    sel = valid & (np.asarray(new_state.valid_mask) > 0)
    p = psnr(pano_upd[sel], pano_fixed[sel])
    assert p >= 30.0, f"update_masks output diverged: {p:.2f} dB"
    # black-seam check: pixels bright with fixed weights but black with
    # rebuilt weights = the reference's regression
    lum_f = pano_fixed.astype(np.float32).sum(-1)
    lum_u = pano_upd.astype(np.float32).sum(-1)
    new_black = ((lum_u < 8) & (lum_f > 60) & sel).sum()
    assert new_black == 0, f"{new_black} new black pixels (black seams)"


def test_update_masks_runner_pass(tmp_path, monkeypatch):
    """One Runner concurrency pass with update_masks=True: recalibrations
    rebuild the weight pyramids live while frames flow; the run must
    complete and install at least one mesh (VERDICT r3 #3)."""
    monkeypatch.chdir(tmp_path)
    cfg = dataclasses.replace(_small_cfg(recalibrate=True,
                                         update_masks=True),
                              recalib_del_ms=100)
    from video_stitcher_tpu.pipeline.runner import Runner
    r = Runner(cfg, max_frames=40)
    r.run()
    assert r.frames_done >= 1
    assert r.recalibs_done >= 1, "no mesh install with update_masks on"
    assert os.path.exists(tmp_path / "result.jpg")
    out = np.asarray(__import__("cv2").imread(str(tmp_path / "result.jpg")))
    # the stitched ring must not have gone dark (black-seam regression)
    assert out.mean() > 20, out.mean()
