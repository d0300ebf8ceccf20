"""Batched RANSAC homography (inlier filter).

Replaces cv::findHomography(..., RANSAC) as used for match filtering
(360_stitcher/featurefinder.cpp:87; the H itself is discarded, only the
inlier mask feeds the CPW solver). TPU-native shape: S hypotheses are
scored in parallel — sample 4 correspondences each, solve the 8x9 DLT by
batched SVD, count reprojection inliers, keep the best.

Contract: callers may dispatch this unconditionally per camera pair (to
keep the device queue full; mesh/pipeline.py batches its host fetch), so
it must tolerate degenerate input — fewer than 8 valid matches, or all
invalid. The sampling then picks duplicated/clamped points and the
returned H/inliers are garbage-but-finite; the host side discards the
result whenever valid.sum() < 8, so garbage never reaches the solver.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

REPROJ_THRESH = 3.0      # OpenCV findHomography default


def _normalize(pts, valid):
    """Hartley normalization over valid points -> (pts_n, T [3,3])."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (pts * w[:, None]).sum(0) / n
    d = jnp.sqrt(((pts - mean) ** 2).sum(-1)) * w
    scale = jnp.sqrt(2.0) / jnp.maximum(d.sum() / n, 1e-6)
    t = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    t = t.at[0, 0].set(scale).at[1, 1].set(scale)
    t = t.at[0, 2].set(-scale * mean[0]).at[1, 2].set(-scale * mean[1])
    return (pts - mean) * scale, t


def _dlt4(p1, p2):
    """p1, p2: [4, 2] -> H [3,3] via SVD of the 8x9 system."""
    x, y = p1[:, 0], p1[:, 1]
    u, v = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u], -1)
    r2 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], -1)
    a = jnp.concatenate([r1, r2], axis=0)            # [8, 9]
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    h = vt[-1]
    return h.reshape(3, 3)


def _project(h, pts):
    x = h[0, 0] * pts[:, 0] + h[0, 1] * pts[:, 1] + h[0, 2]
    y = h[1, 0] * pts[:, 0] + h[1, 1] * pts[:, 1] + h[1, 2]
    w = h[2, 0] * pts[:, 0] + h[2, 1] * pts[:, 1] + h[2, 2]
    w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    return jnp.stack([x / w, y / w], -1)


def ransac_homography(p1, p2, valid, key, num_hyp: int = 256,
                      thresh: float = REPROJ_THRESH
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """p1, p2: f32 [K, 2] correspondences; valid: bool [K].

    Returns (H [3,3], inlier_mask bool [K], num_inliers i32). Jittable.
    """
    k = p1.shape[0]
    p1n, t1 = _normalize(p1, valid)
    p2n, t2 = _normalize(p2, valid)

    # sample 4 indices per hypothesis, biased to valid points
    probs = valid.astype(jnp.float32) + 1e-6
    idx = jax.random.categorical(
        key, jnp.log(probs)[None, :].repeat(num_hyp * 4, 0)).reshape(num_hyp, 4)
    hyp_ok = jnp.all(valid[idx], axis=1)
    # degenerate if any two sampled indices equal
    same = jnp.zeros((num_hyp,), bool)
    for a in range(4):
        for b in range(a + 1, 4):
            same = same | (idx[:, a] == idx[:, b])
    hyp_ok = hyp_ok & ~same

    hs = jax.vmap(_dlt4)(p1n[idx], p2n[idx])         # [S,3,3]
    proj = jax.vmap(_project, in_axes=(0, None))(hs, p1n)   # [S,K,2]
    err2 = jnp.sum((proj - p2n[None]) ** 2, -1)      # normalized coords
    # threshold in original px: scale by t2 (isotropic)
    s2 = t2[0, 0]
    inl = (err2 < (thresh * s2) ** 2) & valid[None, :]
    counts = jnp.where(hyp_ok, inl.sum(-1), -1)
    best = jnp.argmax(counts)
    h_best = jnp.linalg.solve(t2, hs[best] @ t1)     # denormalize
    inlier_mask = inl[best]
    return h_best, inlier_mask, counts[best]
