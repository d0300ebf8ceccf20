"""Separable two-pass warp vs its exact per-pass golds (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from video_stitcher_tpu.ops.remap import remap_planar
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from remap_separable import (
    SepPlan, plan_separable, pass_h, pass_v, XPAD, LANE_PAD_R,
    ROW_BLOCK, CHUNK_W,
)


def _mk(rng, src_h=48, src_w=256, bh=16, bw=128):
    frames = rng.integers(0, 255, (2, src_h, src_w, 3)).astype(np.uint8)
    # monotone global x-map + smooth fused perturbation (mesh-like)
    xb = np.arange(bw, dtype=np.float64)
    fused = np.empty((2, 2, bh, bw), np.float32)
    gmx = np.empty((2, bw), np.float32)
    for i in range(2):
        mxg = 4.0 + (i + 1) * 0.02 + xb * (src_w - 10.0) / bw
        gmx[i] = mxg.astype(np.float32)
        gy = np.arange(bh, dtype=np.float64)[:, None]
        dx = 2.0 * np.sin(gy / 5.0 + i) * np.cos(xb[None] / 17.0)
        my = 3.0 + gy * (src_h - 8.0) / bh + 1.5 * np.sin(xb[None] / 23.0)
        fused[i, 0] = (mxg[None] + dx).astype(np.float32)
        fused[i, 1] = np.broadcast_to(my, (bh, bw)).astype(np.float32)
    # mark a corner invalid like real maps
    fused[0, :, :4, :8] = -1.0
    return frames, fused, gmx


def test_separable_matches_pass_golds(rng):
    src_h, src_w, bh, bw = 48, 256, 16, 128
    frames, fused, gmx = _mk(rng, src_h, src_w, bh, bw)
    plan = plan_separable(fused, gmx, src_h, src_w)

    src = jnp.asarray(np.moveaxis(frames, -1, 1).astype(np.float32))
    srcp = jnp.pad(src, ((0, 0), (0, 0), (0, plan.i1_hp - src_h), (0, 0))
                   ).astype(jnp.bfloat16)
    i1 = pass_h(srcp, jnp.asarray(plan.wx).astype(jnp.bfloat16))
    i1_np = np.asarray(i1).astype(np.float32)

    # Pass-H gold: per-camera banded matrix product
    for i in range(2):
        gold = np.einsum("chs,bs->chb",
                         np.asarray(srcp[i], np.float32), plan.wx[i])
        core = i1_np[i][:, :, XPAD:XPAD + bw]
        np.testing.assert_allclose(core, gold, atol=1.0)   # bf16 matmul

    out = np.asarray(pass_v(i1, jnp.asarray(plan.vmaps),
                            jnp.asarray(plan.strip_off),
                            jnp.asarray(plan.chunk_row),
                            sh=plan.sh, whc=plan.whc, interpret=True))

    # Pass-V gold: 2-D bilinear over the unpadded I1 with the v-maps
    for i in range(2):
        i1c = i1_np[i][:, :, XPAD:XPAD + bw]
        gold = np.asarray(remap_planar(
            jnp.asarray(i1c), jnp.asarray(plan.vmaps[i, 0]),
            jnp.asarray(plan.vmaps[i, 1]), border="constant"))
        np.testing.assert_allclose(out[i], gold, atol=1.5)

    # invalid corner must be exactly zero
    assert np.all(out[0][:, :4, :8] == 0.0)
