"""End-to-end synthetic fixture (SURVEY.md §4 strategy): render N camera
views from a known cylinder texture, stitch, and require high PSNR against
the ground-truth panorama."""

import dataclasses

import numpy as np
import pytest

from video_stitcher_tpu.config import StitcherConfig
from video_stitcher_tpu import Stitcher
from video_stitcher_tpu.calib.calibration import plan_geometry
from video_stitcher_tpu.geometry.camera import fixed_rig_cameras
from video_stitcher_tpu.geometry.cylindrical import cylindrical_forward


# canonical implementations live in the package so the cache primer /
# bench / tools can use them without a tests/ checkout
from video_stitcher_tpu.utils.synth import (          # noqa: F401
    make_scene, sample_scene, render_views, psnr)


SMALL = dict(num_images=6, input_width=320, input_height=180,
             enable_local=False, recalibrate=False)


@pytest.fixture(scope="module")
def small_stitch():
    cfg = StitcherConfig(**SMALL)
    geom, _ = plan_geometry(cfg)
    rng = np.random.default_rng(7)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng)
    frames = render_views(cfg, geom, scene)
    st = Stitcher(cfg)
    st.calibrate(frames)
    pano = st.stitch(frames)
    return cfg, geom, scene, frames, st, pano


def test_e2e_psnr(small_stitch):
    cfg, geom, scene, frames, st, pano = small_stitch
    valid = np.asarray(st.state.valid_mask) > 0
    gt = np.moveaxis(scene, 0, -1)
    # central rows (borders of the valid region see interpolation falloff)
    h = geom.pano_h
    sel = valid[h // 4: 3 * h // 4]
    p = pano[h // 4: 3 * h // 4][sel]
    g = gt[h // 4: 3 * h // 4][sel]
    val = psnr(p, g)
    assert val > 30.0, f"PSNR {val:.1f} dB too low"


def test_e2e_no_black_seams(small_stitch):
    """Inside the valid region the pano must have no near-zero holes."""
    cfg, geom, scene, frames, st, pano = small_stitch
    valid = np.asarray(st.state.valid_mask) > 0
    h = geom.pano_h
    region = pano[h // 4: 3 * h // 4]
    vsel = valid[h // 4: 3 * h // 4]
    dark = (region.max(axis=-1) < 5) & vsel
    assert dark.mean() < 1e-4


def test_gain_compensation_recovered(small_stitch):
    """Views rendered with different exposures -> solved gains must flatten
    them (exposure_compensate.cpp model)."""
    cfg, geom, scene, frames, st, _ = small_stitch
    gains_true = np.array([1.0, 0.8, 1.2, 0.9, 1.1, 1.0])
    frames_g = render_views(cfg, geom, scene, gains=gains_true)
    st2 = Stitcher(cfg)
    st2.calibrate(frames_g)
    solved = np.asarray(st2.state.gains)
    # solved gains should counteract the applied ones (up to global scale)
    ratio = solved * gains_true
    assert ratio.std() / ratio.mean() < 0.05
    pano = st2.stitch(frames_g)
    valid = np.asarray(st2.state.valid_mask) > 0
    h = geom.pano_h
    gt = np.moveaxis(scene, 0, -1)
    sel = valid[h // 4: 3 * h // 4]
    # blended output should stay close to the reference exposure
    p = pano[h // 4: 3 * h // 4][sel].mean()
    g = gt[h // 4: 3 * h // 4][sel].mean()
    assert abs(p - g) / g < 0.1


def test_weight_pyramids_partition_of_unity(small_stitch):
    """Re-placing the normalized weights must reproduce total/(total+eps)
    exactly — i.e. ~1 wherever the raw total isn't vanishing."""
    import jax.numpy as jnp
    from video_stitcher_tpu.blend.multiband import place_bands, WEIGHT_EPS
    from video_stitcher_tpu.ops.pyramid import gaussian_pyramid
    cfg, geom, scene, frames, st, pano = small_stitch
    lay = geom.layout
    raw = gaussian_pyramid(jnp.asarray(st.aux["weights0"])[:, None],
                           lay.num_bands)
    for lvl, w in enumerate(st.state.weight_pyr):
        total = np.asarray(place_bands(raw[lvl], lay, lvl))[0]
        replaced = np.asarray(place_bands(w, lay, lvl))[0]
        expect = total / (total + WEIGHT_EPS)
        np.testing.assert_allclose(replaced, expect, atol=1e-4)
        sel = total > 0.1
        assert sel.any()
        np.testing.assert_allclose(replaced[sel], 1.0, atol=1e-3)


def test_stitch_batch_matches_per_frame(small_stitch, monkeypatch):
    """stitch_batch (one dispatch over B frame sets) must equal per-frame
    stitch exactly, on both the gather path and the strip path (where the
    kernel reuses the per-camera plan cyclically across the batch)."""
    import functools
    import video_stitcher_tpu.ops.remap_strips as rsmod

    cfg, geom, scene, frames, st, pano = small_stitch
    rng = np.random.default_rng(31)
    f2 = np.clip(frames.astype(np.int32)
                 + rng.integers(-20, 20, frames.shape), 0, 255
                 ).astype(np.uint8)
    batch = np.stack([frames, f2])

    # gather path (small_stitch's default on CPU)
    out = st.stitch_batch(batch)
    np.testing.assert_array_equal(out[0], np.asarray(st.stitch(frames)))
    np.testing.assert_array_equal(out[1], np.asarray(st.stitch(f2)))

    # strip path (forced, interpret mode)
    monkeypatch.setattr(Stitcher, "_use_strip_warp", lambda self: True)
    monkeypatch.setattr(rsmod, "remap_strips",
                        functools.partial(rsmod.remap_strips, interpret=True))
    st2 = Stitcher(cfg)
    st2.calibrate(frames)
    assert st2._warp_static is not None
    out2 = st2.stitch_batch(batch)
    np.testing.assert_array_equal(out2[0], np.asarray(st2.stitch(frames)))
    np.testing.assert_array_equal(out2[1], np.asarray(st2.stitch(f2)))


def test_blend_bf16_storage_matches_f32(small_stitch):
    """The bf16-stored blend (default blend_dtype) must track the exact
    f32 chain within the reference's own tolerance class — measured
    56 dB on the 1080p rig; gated at 40 dB here on worst-case
    white-noise bands."""
    import jax.numpy as jnp
    from video_stitcher_tpu.blend.multiband import blend_bands
    cfg, geom, scene, frames, st, pano = small_stitch
    lay = geom.layout
    rng = np.random.default_rng(11)
    bands = jnp.asarray(rng.uniform(
        0, 255, (cfg.num_images, 3, lay.band_h, lay.band_w)
    ).astype(np.float32))
    f32 = np.asarray(blend_bands(bands, st.state.weight_pyr, lay,
                                 st.state.valid_mask, "highest"))
    b16 = np.asarray(blend_bands(bands, st.state.weight_pyr, lay,
                                 st.state.valid_mask, "bf16"))
    sel = np.asarray(st.state.valid_mask) > 0
    err = f32[:, sel] - b16[:, sel]
    p = psnr(np.clip(f32[:, sel], 0, 255), np.clip(b16[:, sel], 0, 255))
    assert p >= 40.0, (p, float(np.abs(err).max()))


def test_calibration_roundtrip(tmp_path, small_stitch):
    cfg, geom, scene, frames, st, pano = small_stitch
    path = str(tmp_path / "calib.npz")
    st.save_calibration(path)
    st2 = Stitcher(cfg)
    st2.load_calibration(path)
    pano2 = st2.stitch(frames)
    np.testing.assert_array_equal(np.asarray(pano), np.asarray(pano2))


def test_loaded_calibration_supports_recalib(tmp_path):
    """A LOADED calibration must be a full replacement for a fresh one:
    live mesh recalibration, update_masks, and stitch_int16 all read
    aux, which load_calibration now rebuilds from the config geometry
    (review r5 — it used to be missing and every recalib crashed with
    AttributeError, silently swallowed by the runner's except)."""
    import dataclasses
    cfg = StitcherConfig(num_images=6, input_width=320, input_height=180,
                         enable_local=True, recalibrate=False)
    geom, _ = plan_geometry(cfg)
    rng = np.random.default_rng(11)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng, smooth=4)
    frames = render_views(cfg, geom, scene)
    st = Stitcher(cfg)
    st.calibrate(frames)
    path = str(tmp_path / "calib.npz")
    st.save_calibration(path)

    st2 = Stitcher(cfg)
    st2.load_calibration(path)
    for k in ("band_maps", "weights0", "cams_compose", "overlap_masks"):
        assert k in st2.aux, k
    # the rebuilt weights equal the original run's (validity-only seams)
    np.testing.assert_allclose(np.asarray(st2.aux["weights0"]),
                               np.asarray(st.aux["weights0"]), atol=1e-5)
    assert st2.recalibrate_mesh(frames), "recalib failed on loaded state"
    # update_masks path executes too
    st2.cfg = dataclasses.replace(cfg, update_masks=True)
    assert st2.recalibrate_mesh(frames)
    out = st2.stitch(frames)
    assert out.shape == (geom.pano_h, geom.pano_w, 3)


def test_output_frame_aspect(small_stitch):
    cfg, geom, scene, frames, st, pano = small_stitch
    out = st.output(pano)
    assert out.shape[1] == cfg.output_width
    assert out.shape[0] <= cfg.output_height


def test_e2e_two_cam_feather():
    """BASELINE config 1 shape: 2 cameras, global warp only, feather
    blend (no multiband pyramids)."""
    import math
    cfg = StitcherConfig(num_images=2, wrap_around=False,
                         input_width=320, input_height=180,
                         yaws=(0.0, math.pi / 3), blend_type="feather",
                         enable_local=False, recalibrate=False)
    geom, _ = plan_geometry(cfg)
    lay = geom.layout
    assert geom.blend_type == "feather"
    rng = np.random.default_rng(13)
    scene = make_scene(lay.pano_w, lay.pano_h, rng)
    frames = render_views(cfg, geom, scene)
    st = Stitcher(cfg)
    st.calibrate(frames)
    pano = st.stitch(frames)
    gt = np.moveaxis(np.roll(scene, -int(round(lay.u0)), axis=2), 0, -1)
    valid = np.asarray(st.state.valid_mask) > 0
    h = geom.pano_h
    sel = valid[h // 4: 3 * h // 4]
    assert sel.any()
    val = psnr(pano[h // 4: 3 * h // 4][sel], gt[h // 4: 3 * h // 4][sel])
    assert val > 30.0, f"feather PSNR {val:.1f} dB too low"


def test_strip_plan_4k_to_8k():
    """BASELINE config 4 shape: 6x4K inputs -> 8K-class pano. The strip
    planner must produce a valid plan (packed-offset encodings in range,
    VMEM budget forces per-row-block strips, x spans within the window)."""
    from video_stitcher_tpu.calib.calibration import compose_fused_maps
    from video_stitcher_tpu.geometry.cylindrical import band_backward_maps
    import video_stitcher_tpu.ops.remap_strips as rs

    cfg = StitcherConfig(num_images=6, input_width=3840, input_height=2160,
                         compose_megapix=-1.0, enable_local=False,
                         recalibrate=False)
    geom, cams = plan_geometry(cfg)
    assert geom.pano_w >= 7000                       # 8K-class output
    fused = compose_fused_maps(geom, band_backward_maps(geom.layout, cams))
    mp = rs.pad_maps(np.asarray(fused))
    warp_w = ((geom.warp_src_w + 127) // 128) * 128
    plan = rs.plan_strips(mp, geom.warp_src_h, warp_w)
    # 2 * 3 * 2176 * 3968 * 2 bytes > FULL_SRC_BYTES: strip mode, not
    # resident-source
    assert plan.sh < plan.src_hp
    assert (plan.strip_off < plan.src_hp).all()
    nonempty = plan.chunk_packed >= 0
    assert nonempty.any()
    assert ((plan.chunk_packed[nonempty] & 0xFF) * rs.ROW_ALIGN
            <= plan.sh - plan.whc).all()


def test_stitch_out_fused_matches_two_step(small_stitch):
    """The fused blend+resize output program must match
    output(stitch(frames)) within quantization (the two-step path rounds
    the intermediate pano to u8 before resizing; the fused path resizes
    f32)."""
    cfg, geom, scene, frames, st, pano = small_stitch
    ref = st.output(pano)
    fused = st.stitch_out(frames)
    assert fused.shape == ref.shape
    diff = np.abs(fused.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 3 and diff.mean() < 0.2, \
        f"fused vs two-step: max {diff.max()} mean {diff.mean():.3f}"


def test_e2e_nonwrap_partial_ring():
    """wrapAround=false (defs.h:23): a 3-camera partial ring stitches onto a
    non-periodic panorama (layout union + u0 offset instead of static
    wraparound slicing)."""
    import math
    cfg = StitcherConfig(num_images=3, wrap_around=False,
                         input_width=320, input_height=180,
                         yaws=(0.0, 2 * math.pi / 6, 4 * math.pi / 6),
                         enable_local=False, recalibrate=False)
    geom, _ = plan_geometry(cfg)
    lay = geom.layout
    assert not lay.wrap
    rng = np.random.default_rng(11)
    scene = make_scene(lay.pano_w, lay.pano_h, rng)
    frames = render_views(cfg, geom, scene)     # samples u mod pano_w
    st = Stitcher(cfg)
    st.calibrate(frames)
    pano = st.stitch(frames)
    # pano col x sits at cylinder u = u0 + x; u0 is integer by construction
    gt = np.moveaxis(np.roll(scene, -int(round(lay.u0)), axis=2), 0, -1)
    valid = np.asarray(st.state.valid_mask) > 0
    h = geom.pano_h
    sel = valid[h // 4: 3 * h // 4]
    assert sel.any()
    val = psnr(pano[h // 4: 3 * h // 4][sel], gt[h // 4: 3 * h // 4][sel])
    assert val > 30.0, f"non-wrap PSNR {val:.1f} dB too low"


def _prewarp_cfg():
    # 640x360 at compose 0.04 MP -> compose_scale ~0.42 < 0.5: the strong-
    # minification path (BASELINE config 4 shape: big inputs, small pano)
    return StitcherConfig(num_images=6, input_width=640, input_height=360,
                          compose_megapix=0.04, enable_local=False,
                          recalibrate=False)


def test_e2e_prewarp_minified():
    """compose_scale < 0.5 takes the reference's resize->remap chain
    (timed.cpp:75-90): fused maps stay in compose coordinates and the
    source is pre-resized on device."""
    cfg = _prewarp_cfg()
    geom, _ = plan_geometry(cfg)
    assert geom.prewarp and geom.warp_src_w == geom.compose_w
    rng = np.random.default_rng(3)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng)
    frames = render_views(cfg, geom, scene)
    st = Stitcher(cfg)
    st.calibrate(frames)
    pano = st.stitch(frames)
    valid = np.asarray(st.state.valid_mask) > 0
    h = geom.pano_h
    gt = np.moveaxis(scene, 0, -1)
    sel = valid[h // 4: 3 * h // 4]
    val = psnr(pano[h // 4: 3 * h // 4][sel], gt[h // 4: 3 * h // 4][sel])
    assert val > 30.0, f"prewarp PSNR {val:.1f} dB too low"


def test_e2e_nonwrap_weight_coverage():
    """Non-wrap rigs (u0 != 0): blend weights must land on the pano, not
    u0*ratio px into the seam canvas's replicate border (review r5 —
    the shifted sampling left 79% of valid pano pixels at ~zero weight;
    wrap layouts have u0=0, which masked it)."""
    import jax.numpy as jnp
    from video_stitcher_tpu.blend.multiband import place_bands
    cfg = StitcherConfig(num_images=3, input_width=320, input_height=180,
                         wrap_around=False, yaws=(0.0, 0.6, 1.2),
                         enable_local=False, recalibrate=False)
    geom, _ = plan_geometry(cfg)
    assert geom.layout.u0 != 0
    rng = np.random.default_rng(3)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng)
    frames = render_views(cfg, geom, scene)
    st = Stitcher(cfg)
    st.calibrate(frames)
    w0 = np.asarray(st.aux["weights0"])
    total = np.asarray(place_bands(jnp.asarray(w0)[:, None],
                                   geom.layout, 0))[0]
    vm = np.asarray(st.state.valid_mask) > 0
    cov = float((total[vm] > 0.5).mean())
    assert cov > 0.9, f"blend-weight coverage {cov:.3f} over valid pano"
    # end-to-end fidelity: pano col x <-> cylinder u0 + x
    pano = st.stitch(frames)
    gt = np.roll(np.moveaxis(scene, 0, -1), -int(geom.layout.u0), axis=1)
    h = geom.pano_h
    sel = vm[h // 4: 3 * h // 4]
    val = psnr(pano[h // 4: 3 * h // 4][sel], gt[h // 4: 3 * h // 4][sel])
    assert val > 30.0, f"non-wrap scene PSNR {val:.1f} dB"


def test_e2e_prewarp_nv12():
    """NV12 ingest under prewarp takes the fused scale-at-1.5B/px
    conversion (ops/color.py nv12_to_rgb_planar_scaled); the stitched
    pano must agree with the RGB-fed path to chroma-subsampling noise
    (this is the BASELINE config-4 production shape: NV12 capture in,
    strong minification)."""
    from video_stitcher_tpu.ops.color import rgb_to_nv12
    cfg = _prewarp_cfg()
    geom, _ = plan_geometry(cfg)
    rng = np.random.default_rng(3)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng)
    frames = render_views(cfg, geom, scene)
    st = Stitcher(cfg)
    st.calibrate(frames)
    nv = np.stack([np.asarray(rgb_to_nv12(f)) for f in frames])
    a = st.stitch(nv)
    b = st.stitch(frames)
    assert a.shape == b.shape
    val = psnr(a, b)
    assert val > 35.0, f"NV12-vs-RGB prewarp pano PSNR {val:.1f} dB"


def test_prewarp_strip_path_matches_gather(monkeypatch):
    """The Pallas strip path (forced, interpret mode) must agree with the
    XLA gather path under prewarp — covers _prep_strip_source and the
    compose-coordinate strip plan."""
    import functools
    import video_stitcher_tpu.ops.remap_strips as rsmod

    # float32 blend isolates the warp-path comparison this test is about
    # (the default bf16-stored blend adds its own +-1 rounding to both
    # sides, which can diverge)
    cfg = dataclasses.replace(_prewarp_cfg(), blend_dtype="float32")
    geom, _ = plan_geometry(cfg)
    rng = np.random.default_rng(5)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng)
    frames = render_views(cfg, geom, scene)

    st_gather = Stitcher(cfg)
    st_gather.calibrate(frames)
    pano_gather = st_gather.stitch(frames)

    orig = rsmod.remap_strips
    monkeypatch.setattr(
        rsmod, "remap_strips",
        functools.partial(orig, interpret=True))
    monkeypatch.setattr(Stitcher, "_use_strip_warp", lambda self: True)
    st_strip = Stitcher(cfg)
    st_strip.calibrate(frames)
    assert st_strip._warp_static is not None
    pano_strip = st_strip.stitch(frames)

    diff = np.abs(pano_strip.astype(np.int32) - pano_gather.astype(np.int32))
    assert diff.max() <= 3, f"strip vs gather max diff {diff.max()}"


def test_interpolate_states_strip_path(monkeypatch):
    """RECALIB_INTERP on the production warp path: the mixed state must
    lerp warp_maps_lane and carry a window plan covering both endpoints,
    matching the gather path on the same mixed fused maps."""
    import functools
    import jax
    import jax.numpy as jnp
    import video_stitcher_tpu.ops.remap_strips as rsmod
    from video_stitcher_tpu.pipeline.stitcher import stitch_pano

    monkeypatch.setattr(Stitcher, "_use_strip_warp", lambda self: True)
    monkeypatch.setattr(rsmod, "remap_strips",
                        functools.partial(rsmod.remap_strips, interpret=True))

    # float32 blend isolates the warp-path comparison (see
    # test_prewarp_strip_path_matches_gather)
    cfg = StitcherConfig(**{**SMALL, "blend_dtype": "float32"})
    geom, _ = plan_geometry(cfg)
    rng = np.random.default_rng(17)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng)
    frames = render_views(cfg, geom, scene)
    st = Stitcher(cfg)
    st.calibrate(frames)
    old = st.state

    # a "new mesh": shift every valid map coordinate down-right a little
    mp = np.asarray(old.fused_maps)
    shifted = np.where(mp > -1, mp + 1.5, mp).astype(np.float32)
    new, _ = st._plan_warp(old._replace(fused_maps=jnp.asarray(shifted)))

    mixed = st.interpolate_states(old, new, 0.5)
    assert mixed.warp_maps_lane is not None
    # lerp where both endpoints are valid (> -1); coordinates that are
    # invalid/out-of-window at either endpoint pin to the -1 sentinel
    # instead of lerping through it
    o = np.asarray(old.warp_maps_lane)
    n = np.asarray(new.warp_maps_lane)
    np.testing.assert_allclose(
        np.asarray(mixed.warp_maps_lane),
        np.where(np.minimum(o, n) > -1, 0.5 * o + 0.5 * n, -1.0), atol=1e-5)

    st.swap_state(mixed)
    pano_strip = st.stitch(frames)
    gold = np.asarray(jax.jit(functools.partial(
        stitch_pano, geom=st.geom, warp_static=None))(
            jnp.asarray(frames), mixed))
    diff = np.abs(pano_strip.astype(np.int32) - gold.astype(np.int32))
    assert diff.max() <= 3, f"interp strip vs gather max diff {diff.max()}"


def test_calibration_roundtrip_strip_path(tmp_path, monkeypatch):
    """Save/load must reproduce the stitch exactly on the production strip
    path too (the plan is re-derived from the saved padded maps)."""
    import functools
    import video_stitcher_tpu.ops.remap_strips as rsmod

    monkeypatch.setattr(Stitcher, "_use_strip_warp", lambda self: True)
    monkeypatch.setattr(rsmod, "remap_strips",
                        functools.partial(rsmod.remap_strips, interpret=True))
    cfg = StitcherConfig(**SMALL)
    geom, _ = plan_geometry(cfg)
    rng = np.random.default_rng(23)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng)
    frames = render_views(cfg, geom, scene)
    st = Stitcher(cfg)
    st.calibrate(frames)
    pano = st.stitch(frames)
    path = str(tmp_path / "calib.npz")
    st.save_calibration(path)
    st2 = Stitcher(cfg)
    st2.load_calibration(path)
    assert st2._warp_static == st._warp_static
    np.testing.assert_array_equal(np.asarray(pano),
                                  np.asarray(st2.stitch(frames)))

    # legacy checkpoint compatibility: older save_state versions
    # persisted the strip-plan artifacts (current ones don't — they are
    # derivable); the loader must still read them, deriving the
    # compacted group lists when that key predates warp_groups
    from video_stitcher_tpu.calib.state import load_state
    z = dict(np.load(path))
    z["warp_strip_off"] = np.asarray(st.state.warp_strip_off)
    z["warp_chunk_packed"] = np.asarray(st.state.warp_chunk_packed)
    z["warp_maps_lane"] = np.asarray(st.state.warp_maps_lane)
    legacy = str(tmp_path / "calib_legacy.npz")
    np.savez_compressed(legacy, **z)
    st_leg = load_state(legacy)
    np.testing.assert_array_equal(np.asarray(st_leg.warp_groups),
                                  np.asarray(st2.state.warp_groups))
    np.testing.assert_array_equal(np.asarray(st_leg.warp_maps_lane),
                                  np.asarray(st.state.warp_maps_lane))
