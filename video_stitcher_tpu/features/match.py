"""Brute-force Hamming kNN matching + Lowe ratio test.

Replaces BruteForce-Hamming knnMatch(k=2) + 0.7 ratio
(360_stitcher/featurefinder.cpp:50-68; CUDA kernel
cv/cudafeatures2d/src/cuda/bf_knnmatch.cu). On TPU the whole distance matrix
is one XOR + population_count + reduce over packed uint32 words — a dense,
regular op that vectorizes perfectly, vs the GPU's warp-shuffle tournament.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Matches(NamedTuple):
    query: jnp.ndarray     # i32 [K] index into set 1
    train: jnp.ndarray     # i32 [K] index into set 2
    distance: jnp.ndarray  # f32 [K]
    valid: jnp.ndarray     # bool [K]


def hamming_matrix(d1, d2, valid1=None, valid2=None):
    """d1 [K1, W] u32, d2 [K2, W] u32 -> i32 [K1, K2] Hamming distances.
    Invalid rows/cols get distance 1e9."""
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
    dist = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
    if valid1 is not None:
        dist = jnp.where(valid1[:, None], dist, jnp.int32(1 << 30))
    if valid2 is not None:
        dist = jnp.where(valid2[None, :], dist, jnp.int32(1 << 30))
    return dist


def knn_ratio_match(d1, d2, valid1=None, valid2=None,
                    ratio: float = 0.7) -> Matches:
    """knn(k=2) + ratio test. Returns one candidate match per query
    (valid flag false where the ratio test failed)."""
    dist = hamming_matrix(d1, d2, valid1, valid2)
    neg = -dist.astype(jnp.float32)
    top2, idx2 = jax.lax.top_k(neg, 2)           # [K1, 2]
    best = -top2[:, 0]
    second = -top2[:, 1]
    ok = best < ratio * second
    if valid1 is not None:
        ok = ok & valid1
    # BOTH neighbors must be real candidates: when the second-best is
    # the invalid sentinel (one valid train descriptor in the whole
    # set), the ratio test would trivially pass for every query and
    # accept many-to-one garbage — cv2's knnMatch(k=2) likewise yields
    # no ratio-checkable pair there (featurefinder.cpp:50-68)
    ok = ok & (best < jnp.float32(1 << 29)) \
        & (second < jnp.float32(1 << 29))
    k1 = d1.shape[0]
    return Matches(query=jnp.arange(k1, dtype=jnp.int32),
                   train=idx2[:, 0].astype(jnp.int32),
                   distance=best, valid=ok)
