"""Tiny morphology: 3x3 dilation.

Replaces cuda::createMorphologyFilter(MORPH_DILATE, 3x3, 1 iter) used to
inflate seam masks before the compose-scale AND (360_stitcher/
calibration.cpp:209,232 — "without dilation local warping will cause black
borders between seams").
"""

from __future__ import annotations

import jax.numpy as jnp


def dilate3x3(x):
    """[..., H, W] -> same shape; 8-neighborhood max (replicated border)."""
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)], mode="edge")
    h, w = x.shape[-2], x.shape[-1]
    out = x
    for dy in range(3):
        for dx in range(3):
            out = jnp.maximum(out, xp[..., dy:dy + h, dx:dx + w])
    return out
