"""remap_strips (production Pallas path) vs the XLA-gather reference."""

import numpy as np
import jax.numpy as jnp

from video_stitcher_tpu.ops.remap import remap_planar
from video_stitcher_tpu.ops.remap_strips import (
    pad_maps, plan_strips, prep_source, remap_strips, repack_maps_lane,
    ROW_BLOCK, CHUNK_W,
)


def _run(maps_np, frames_u8, src_h, src_w):
    mp = pad_maps(maps_np)
    plan = plan_strips(mp, src_h, src_w)
    src = prep_source(jnp.asarray(frames_u8))
    out = remap_strips(src, repack_maps_lane(jnp.asarray(mp)),
                       jnp.asarray(plan.strip_off),
                       jnp.asarray(plan.chunk_packed),
                       sh=plan.sh, whc=plan.whc, slab_w=plan.slab_w,
                       interpret=True)
    return np.asarray(out), mp


def test_remap_strips_matches_gather(rng):
    src_h, src_w = 40, 256
    bh, bw = 2 * ROW_BLOCK, 128
    frames = rng.integers(0, 255, (2, src_h, src_w, 3)).astype(np.uint8)
    gy, gx = np.mgrid[0:bh, 0:bw].astype(np.float32)
    mx0 = gx * 1.6 + 5 * np.sin(gy / 7.0) - 10
    my0 = gy * 1.8 + 4 * np.cos(gx / 13.0) + 2
    maps = np.stack([np.stack([mx0, my0]),
                     np.stack([mx0 * 0.9 + 6, my0 * 0.8 + 1])]).astype(np.float32)
    out, mp = _run(maps, frames, src_h, src_w)
    for n in range(2):
        img = np.moveaxis(frames[n], -1, 0).astype(np.float32)
        gold = np.asarray(remap_planar(img, mp[n, 0], mp[n, 1],
                                       border="constant"))
        # the x tent weights, the re-tile LHS and the selection matrix
        # round to bf16: <=2^-9 relative each -> <=~2/255 output error,
        # inside the reference's own +-3 blend tolerance
        # (test_blenders.cuda.cpp:95)
        np.testing.assert_allclose(out[n], gold, atol=2.0)


def test_remap_strips_invalid_regions(rng):
    """-1 markers and out-of-range taps must produce exact zeros."""
    src_h, src_w = 24, 256
    bh, bw = ROW_BLOCK, 128
    frames = rng.integers(1, 255, (1, src_h, src_w, 3)).astype(np.uint8)
    mx = np.full((bh, bw), -1.0, np.float32)
    my = np.full((bh, bw), -1.0, np.float32)
    mx[:, :32] = 50.0
    my[:, :32] = 10.0
    mx[:, 32:40] = 500.0           # out of range -> 0
    my[:, 32:40] = 10.0
    out, _ = _run(np.stack([mx, my])[None], frames, src_h, src_w)
    assert np.all(out[0, :, :, :32] > 0)
    assert np.all(out[0, :, :, 32:] == 0.0)


def test_remap_strips_strip_mode_odd_nrb(rng, monkeypatch):
    """Per-row-block strip DMAs (resident-source mode disabled) with an ODD
    number of row-blocks: the double-buffer slot parity must follow the
    global grid step, or the prefetch chain breaks at camera boundaries
    (regression test for the rb-parity bug)."""
    import video_stitcher_tpu.ops.remap_strips as rs
    monkeypatch.setattr(rs, "resident_src_budget", lambda: 0)  # force strip mode

    src_h, src_w = 128, 256
    bh, bw = 3 * ROW_BLOCK, 128                    # nrb = 3 (odd)
    frames = rng.integers(0, 255, (2, src_h, src_w, 3)).astype(np.uint8)
    gy, gx = np.mgrid[0:bh, 0:bw].astype(np.float32)
    # gentle vertical span per row-block so sh stays well under src_h
    mx0 = gx * 1.5 + 3 * np.sin(gy / 5.0)
    my0 = gy * 2.0 + 2 * np.cos(gx / 11.0) + 40
    maps = np.stack([np.stack([mx0, my0]),
                     np.stack([mx0 * 0.95 + 4, my0 + 15])]).astype(np.float32)
    mp = pad_maps(maps)
    plan = plan_strips(mp, src_h, src_w)
    assert plan.sh < plan.src_hp, "test must exercise strip mode"
    assert (mp.shape[2] // ROW_BLOCK) % 2 == 1
    src = prep_source(jnp.asarray(frames))
    out = np.asarray(remap_strips(
        src, repack_maps_lane(jnp.asarray(mp)), jnp.asarray(plan.strip_off),
        jnp.asarray(plan.chunk_packed), sh=plan.sh, whc=plan.whc, slab_w=plan.slab_w,
        interpret=True))
    for n in range(2):
        img = np.moveaxis(frames[n], -1, 0).astype(np.float32)
        gold = np.asarray(remap_planar(img, mp[n, 0], mp[n, 1],
                                       border="constant"))
        np.testing.assert_allclose(out[n], gold, atol=2.0)


def test_remap_strips_slab128(rng, monkeypatch):
    """The experimental 32-aligned 128-lane slab (VST_SLAB_W=128) must
    stay numerically identical to the gather gold — the plan encodes
    c32//32 in the packed chunk word and the kernel decodes it."""
    monkeypatch.setenv("VST_SLAB_W", "128")
    src_h, src_w = 40, 256
    bh, bw = 2 * ROW_BLOCK, 128
    frames = rng.integers(0, 255, (2, src_h, src_w, 3)).astype(np.uint8)
    gy, gx = np.mgrid[0:bh, 0:bw].astype(np.float32)
    mx = gx * 1.5 + 3 * np.sin(gy / 3.0) + 40
    my = gy * 2.0 + 2 * np.cos(gx / 7.0)
    maps = np.stack([np.stack([mx, my]),
                     np.stack([mx * 0.9 + 5, my + 3])]).astype(np.float32)
    mp = pad_maps(maps)
    plan = plan_strips(mp, src_h, src_w)
    assert plan.slab_w == 128
    src = prep_source(jnp.asarray(frames))
    out = np.asarray(remap_strips(
        src, repack_maps_lane(jnp.asarray(mp)), jnp.asarray(plan.strip_off),
        jnp.asarray(plan.chunk_packed), sh=plan.sh, whc=plan.whc,
        slab_w=plan.slab_w, interpret=True))
    for n in range(2):
        img = np.moveaxis(frames[n], -1, 0).astype(np.float32)
        gold = np.asarray(remap_planar(img, mp[n, 0], mp[n, 1],
                                       border="constant"))
        np.testing.assert_allclose(out[n], gold, atol=2.0)
