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
                       jnp.asarray(plan.groups),
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
        jnp.asarray(plan.chunk_packed), jnp.asarray(plan.groups),
        sh=plan.sh, whc=plan.whc, slab_w=plan.slab_w,
        interpret=True))
    for n in range(2):
        img = np.moveaxis(frames[n], -1, 0).astype(np.float32)
        gold = np.asarray(remap_planar(img, mp[n, 0], mp[n, 1],
                                       border="constant"))
        np.testing.assert_allclose(out[n], gold, atol=2.0)


def test_remap_strips_single_slot_resident(rng, monkeypatch):
    """Single-slot resident mode (one full source copy fits the VMEM
    budget, two don't — the 4K case): one DMA per camera, no
    double-buffering, must still match the gather gold."""
    import video_stitcher_tpu.ops.remap_strips as rs

    src_h, src_w = 48, 256
    src_bytes = 3 * src_h * src_w * 2
    monkeypatch.setattr(rs, "resident_src_budget",
                        lambda: src_bytes + src_bytes // 2)   # 1x fits, 2x not
    bh, bw = 2 * ROW_BLOCK, 128
    frames = rng.integers(0, 255, (2, src_h, src_w, 3)).astype(np.uint8)
    gy, gx = np.mgrid[0:bh, 0:bw].astype(np.float32)
    mx = gx * 1.6 + 5 * np.sin(gy / 7.0)
    my = gy * 2.0 + 3 * np.cos(gx / 9.0) + 4
    maps = np.stack([np.stack([mx, my]),
                     np.stack([mx * 0.9 + 6, my * 0.8 + 1])]).astype(np.float32)
    mp = pad_maps(maps)
    plan = plan_strips(mp, src_h, src_w)
    assert plan.sh == plan.src_hp, "single-copy budget must pick residency"
    src = prep_source(jnp.asarray(frames))
    out = np.asarray(remap_strips(
        src, repack_maps_lane(jnp.asarray(mp)), jnp.asarray(plan.strip_off),
        jnp.asarray(plan.chunk_packed), jnp.asarray(plan.groups),
        sh=plan.sh, whc=plan.whc, slab_w=plan.slab_w, interpret=True))
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
        jnp.asarray(plan.chunk_packed), jnp.asarray(plan.groups),
        sh=plan.sh, whc=plan.whc,
        slab_w=plan.slab_w, interpret=True))
    for n in range(2):
        img = np.moveaxis(frames[n], -1, 0).astype(np.float32)
        gold = np.asarray(remap_planar(img, mp[n, 0], mp[n, 1],
                                       border="constant"))
        np.testing.assert_allclose(out[n], gold, atol=2.0)


def test_remap_strips_rot_and_wide_agree(rng):
    """SLAB_ROT (lane-rotated 128-lane window) and the wide 256-lane slab
    must both match the gather gold on the same plan."""
    from video_stitcher_tpu.ops.remap_strips import SLAB_ROT, SLAB_W

    src_h, src_w = 40, 384
    bh, bw = 2 * ROW_BLOCK, 128
    frames = rng.integers(0, 255, (1, src_h, src_w, 3)).astype(np.uint8)
    gy, gx = np.mgrid[0:bh, 0:bw].astype(np.float32)
    mx = gx * 2.2 + 60 + 3 * np.sin(gy / 5.0)   # window straddles lane 128
    my = gy * 1.7 + 2 * np.cos(gx / 9.0) + 1
    maps = np.stack([mx, my])[None].astype(np.float32)
    mp = pad_maps(maps)
    plan = plan_strips(mp, src_h, src_w)
    # a rot mode (the 2.2x magnification needs an 80-lane window) whose
    # packing must stay valid at SLAB_ROT (kw=128) and the wide slab
    assert 128 < plan.slab_w < SLAB_W
    src = prep_source(jnp.asarray(frames))
    ml = repack_maps_lane(jnp.asarray(mp))
    img = np.moveaxis(frames[0], -1, 0).astype(np.float32)
    gold = np.asarray(remap_planar(img, mp[0, 0], mp[0, 1],
                                   border="constant"))
    for slab_w in (plan.slab_w, SLAB_ROT, SLAB_W):
        out = np.asarray(remap_strips(
            src, ml, jnp.asarray(plan.strip_off),
            jnp.asarray(plan.chunk_packed), jnp.asarray(plan.groups),
            sh=plan.sh, whc=plan.whc,
            slab_w=slab_w, interpret=True))
        np.testing.assert_allclose(out[0], gold, atol=2.0)


def test_remap_strips_rot64_parity(rng, monkeypatch):
    """SLAB_ROT64 (64-lane rotated window; an env-selectable negative
    result, see ROT_KWS note) must match the gather gold, including
    right-edge chunks where the 64-lane window-start clip binds, and the
    same plan must stay valid at the wider modes (its packed window start
    decodes into a superset window)."""
    from video_stitcher_tpu.ops.remap_strips import (
        SLAB_ROT, SLAB_ROT64, SLAB_W)

    monkeypatch.setenv("VST_SLAB_W", str(SLAB_ROT64))
    src_h, src_w = 40, 256
    bh, bw = 2 * ROW_BLOCK, 256
    frames = rng.integers(0, 255, (1, src_h, src_w, 3)).astype(np.uint8)
    gy, gx = np.mgrid[0:bh, 0:bw].astype(np.float32)
    # sweep the full source width so the rightmost chunks sample the last
    # 64 source columns (the c0_64 clip path)
    mx = gx * (src_w - 2.0) / bw + 2 * np.sin(gy / 5.0)
    my = gy * 1.9 + 2 * np.cos(gx / 9.0) + 1
    maps = np.stack([mx, my])[None].astype(np.float32)
    mp = pad_maps(maps)
    plan = plan_strips(mp, src_h, src_w)
    assert plan.slab_w == SLAB_ROT64
    src = prep_source(jnp.asarray(frames))
    ml = repack_maps_lane(jnp.asarray(mp))
    img = np.moveaxis(frames[0], -1, 0).astype(np.float32)
    gold = np.asarray(remap_planar(img, mp[0, 0], mp[0, 1],
                                   border="constant"))
    for slab_w in (SLAB_ROT64, SLAB_ROT, SLAB_W):
        out = np.asarray(remap_strips(
            src, ml, jnp.asarray(plan.strip_off),
            jnp.asarray(plan.chunk_packed), jnp.asarray(plan.groups),
            sh=plan.sh, whc=plan.whc,
            slab_w=slab_w, interpret=True))
        np.testing.assert_allclose(out[0], gold, atol=2.0,
                                   err_msg=f"slab_w={slab_w}")


def test_plan_strips_fuzz(rng):
    """Fuzz the strip planner's coverage invariants over random map
    geometries (affine + wobble + invalid patches + out-of-range taps).

    Independently re-derives, per non-empty chunk, the tap rows/cols the
    kernel will read and checks the decoded (strip, window, slab) actually
    contains them — the planner's own internal assert only covers the y
    window, and only in the form it was derived in.
    """
    from video_stitcher_tpu.ops.remap_strips import (
        ROW_ALIGN, SLAB_W, _rot_kw, plan_strips,
    )

    for case in range(30):
        src_h = int(rng.integers(3, 70)) * 16
        src_w = int(rng.integers(2, 9)) * 128
        bh = int(rng.integers(1, 6)) * ROW_BLOCK
        bw = int(rng.integers(1, 5)) * 128
        gy, gx = np.mgrid[0:bh, 0:bw].astype(np.float32)
        n = int(rng.integers(1, 4))
        maps = np.empty((n, 2, bh, bw), np.float32)
        for i in range(n):
            sx = rng.uniform(0.2, 3.5)
            sy = rng.uniform(0.2, 6.0)
            mx = gx * sx + rng.uniform(-20, 20) \
                + rng.uniform(0, 4) * np.sin(gy / rng.uniform(3, 17))
            my = gy * sy + rng.uniform(-20, 20) \
                + rng.uniform(0, 4) * np.cos(gx / rng.uniform(3, 17))
            # invalid patches (the -1 marker) and wild out-of-range taps
            for _ in range(int(rng.integers(0, 4))):
                y0, x0 = rng.integers(0, bh), rng.integers(0, bw)
                h0, w0 = rng.integers(1, bh + 1), rng.integers(1, bw + 1)
                val = rng.choice([-1.0, -500.0, 1e5])
                mx[y0:y0 + h0, x0:x0 + w0] = val
                my[y0:y0 + h0, x0:x0 + w0] = val
            maps[i, 0], maps[i, 1] = mx, my
        try:
            plan = plan_strips(maps, src_h, src_w)
        except ValueError:
            continue                     # x-span over WIN_W: rejected, fine

        src_hp = plan.src_hp
        assert plan.sh % ROW_ALIGN == 0 and plan.whc % ROW_ALIGN == 0
        assert plan.whc <= plan.sh <= src_hp
        # compacted group lists: counts + active-first indices must match
        # the packed skip flags exactly (a missing group = dropped output;
        # an extra group = garbage decode of an empty chunk... which is
        # benign but must still be listed only if actually active)
        from video_stitcher_tpu.ops.remap_strips import GROUP
        ng = plan.chunk_packed.shape[2] // GROUP
        act_g = (plan.chunk_packed.reshape(
            n, bh // 8, ng, GROUP) >= 0).any(-1)
        assert plan.groups.shape == (n, bh // 8, ng + 1)
        for i in range(n):
            for r in range(bh // 8):
                cnt = int(plan.groups[i, r, 0])
                assert cnt == int(act_g[i, r].sum())
                listed = sorted(plan.groups[i, r, 1:1 + cnt].tolist())
                assert listed == list(np.nonzero(act_g[i, r])[0])
        mxm = maps[:, 0].reshape(n, bh // 8, 8, bw // 32, 32)
        mym = maps[:, 1].reshape(n, bh // 8, 8, bw // 32, 32)
        mxm = mxm.transpose(0, 1, 3, 2, 4)          # [n, nrb, ncc, 8, 32]
        mym = mym.transpose(0, 1, 3, 2, 4)
        valid = (mxm > -1) & (mym > -1) & (mxm < src_w) & (mym < src_h)
        for i in range(n):
            for r in range(bh // 8):
                for k in range(bw // 32):
                    v = int(plan.chunk_packed[i, r, k])
                    if not valid[i, r, k].any():
                        assert v < 0     # empty chunk must be skip-flagged
                        continue
                    assert v >= 0 and plan.strip_off[i, r] >= 0
                    s0 = int(plan.strip_off[i, r])
                    assert s0 % 8 == 0 and s0 + plan.sh <= src_hp
                    row0 = s0 + (v & 0xFF) * ROW_ALIGN
                    if plan.slab_w == 128:
                        c_off = ((v >> 8) & 0x3FF) * 32
                        win_lo, win_w = c_off, 128
                        read_w = 128
                    elif 128 < plan.slab_w < SLAB_W:
                        # 256-lane slab read at the 128-aligned start,
                        # lane-rotated by dc, sliced to kw lanes
                        c_off = ((v >> 8) & 0xFF) * 128
                        dc = (v >> 16) & 0x1FF
                        win_w = _rot_kw(plan.slab_w)
                        win_lo = c_off + dc
                        read_w = SLAB_W
                    else:
                        # the kernel slices the slab at the 128-aligned
                        # start; the dc field rides in lx, not the slice
                        c_off = ((v >> 8) & 0xFF) * 128
                        win_lo, win_w = c_off, plan.slab_w
                        read_w = plan.slab_w
                    yv = mym[i, r, k][valid[i, r, k]]
                    xv = mxm[i, r, k][valid[i, r, k]]
                    # taps the kernel reads: floor(c)..floor(c)+1, clamped
                    # into the source (clamped taps carry weight 0 on both
                    # paths, so they may fall outside the window)
                    ylo = max(int(np.floor(yv.min())), 0)
                    yhi = min(int(np.floor(yv.max())) + 1, src_hp - 1)
                    xlo = max(int(np.floor(xv.min())), 0)
                    xhi = min(int(np.floor(xv.max())) + 1, src_w - 1)
                    assert row0 <= ylo and yhi < row0 + plan.whc, \
                        f"case {case}: y window misses taps"
                    assert win_lo <= xlo, f"case {case}: window starts late"
                    assert xhi < win_lo + win_w \
                        or win_lo + win_w >= src_w, \
                        f"case {case}: window ends early"
                    assert c_off + read_w <= src_w


def test_remap_strips_random_parity(rng):
    """Random small geometries (incl. invalid patches and out-of-range
    taps) through the interpret-mode kernel vs the gather gold."""
    for _ in range(3):
        src_h = int(rng.integers(2, 4)) * 16
        src_w = 256
        bh, bw = 2 * ROW_BLOCK, 128
        frames = rng.integers(0, 255, (1, src_h, src_w, 3)).astype(np.uint8)
        gy, gx = np.mgrid[0:bh, 0:bw].astype(np.float32)
        mx = gx * rng.uniform(0.5, 1.8) + rng.uniform(-8, 8) \
            + rng.uniform(0, 3) * np.sin(gy / rng.uniform(3, 9))
        my = gy * rng.uniform(0.5, 2.5) + rng.uniform(-8, 8) \
            + rng.uniform(0, 3) * np.cos(gx / rng.uniform(3, 9))
        y0, x0 = rng.integers(0, bh), rng.integers(0, bw)
        mx[y0:, x0:x0 + 16] = -1.0
        my[y0:, x0:x0 + 16] = -1.0
        mx[:2, :8] = 7777.0          # out of range -> 0
        maps = np.stack([mx, my])[None].astype(np.float32)
        out, mp = _run(maps, frames, src_h, src_w)
        img = np.moveaxis(frames[0], -1, 0).astype(np.float32)
        gold = np.asarray(remap_planar(img, mp[0, 0], mp[0, 1],
                                       border="constant"))
        np.testing.assert_allclose(out[0], gold, atol=2.0)
