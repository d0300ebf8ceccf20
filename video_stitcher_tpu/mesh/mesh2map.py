"""Mesh -> dense backward map inversion.

The reference inflates the solved vertex grid to a full-res *forward* map
(custom bilinear kernel, 360_stitcher/resize.cu:9-45), then inverts it by
forward-splat averaging at half resolution with a bilinear upsample back
(MeshWarper::convertMeshesToMap, meshwarper.cpp:823-886) — leaving 0/0
holes where no sample lands.

TPU-native replacement: the mesh displacement field D(p) = F(p) - p is small
and smooth, so the backward map is the fixed point B(q) = q - D(B(q)),
solved by a few Picard iterations with bilinear sampling — fully regular
compute, jittable, hole-free, and more accurate than splatting.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from video_stitcher_tpu.ops.remap import remap_planar
from video_stitcher_tpu.ops.resize import _interp_matrix


@functools.lru_cache(maxsize=64)
def _upsample_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] align-corners bilinear (vertex j sits at pixel
    j*(n_out-1)/(n_in-1), like custom_resize's u*(cols-1)/tx mapping)."""
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(src).astype(np.int64)
    f = src - i0
    i0c = np.clip(i0, 0, n_in - 1)
    i1c = np.clip(i0 + 1, 0, n_in - 1)
    m = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    np.add.at(m, (rows, i0c), (1.0 - f).astype(np.float32))
    np.add.at(m, (rows, i1c), f.astype(np.float32))
    return m


def upsample_mesh(verts, band_h: int, band_w: int):
    """verts f32 [..., N, M] -> [..., band_h, band_w] align-corners bilinear."""
    n, m = verts.shape[-2], verts.shape[-1]
    mw = jnp.asarray(_upsample_matrix(m, band_w))
    mh = jnp.asarray(_upsample_matrix(n, band_h))
    # calibration-time path: force full f32 accumulation (the platform's
    # default matmul precision may be bf16-grade, which costs ~0.15 px here)
    x = jnp.einsum("...nm,wm->...nw", verts.astype(jnp.float32), mw,
                   precision="highest")
    return jnp.einsum("...nw,hn->...hw", x, mh, precision="highest")


def invert_forward_field(fwd, iters: int = 3):
    """fwd: f32 [2, H, W] forward map (x, y destination of each source px).
    Returns backward map [2, H, W] with F(B(q)) ~= q."""
    h, w = fwd.shape[-2], fwd.shape[-1]
    gy, gx = jnp.mgrid[0:h, 0:w]
    gx = gx.astype(jnp.float32)
    gy = gy.astype(jnp.float32)
    disp = jnp.stack([fwd[0] - gx, fwd[1] - gy])      # D(p) = F(p) - p

    bx, by = gx, gy
    for _ in range(iters):
        d = remap_planar(disp, bx, by, border="replicate")
        bx = gx - d[0]
        by = gy - d[1]
    return jnp.stack([bx, by])


@functools.partial(jax.jit, static_argnames=("band_h", "band_w", "iters"))
def mesh_to_backward_maps(verts, band_h: int, band_w: int, iters: int = 3):
    """verts f32 [C, N, M, 2] warped vertex positions -> backward maps
    f32 [C, 2, band_h, band_w] for the per-frame mesh warp."""
    v = jnp.moveaxis(verts.astype(jnp.float32), -1, 1)   # [C, 2, N, M]
    fwd = upsample_mesh(v, band_h, band_w)               # [C, 2, bh, bw]
    return jax.vmap(lambda f: invert_forward_field(f, iters))(fwd)
