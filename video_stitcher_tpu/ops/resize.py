"""Bilinear resize as separable interpolation matmuls (MXU-friendly).

Replaces cv::cuda::resize (cv/cudawarping/src/resize.cpp, used at
360_stitcher/timed.cpp:77 and calibration.cpp:95,236). OpenCV INTER_LINEAR is
pure 2-tap bilinear with the half-pixel source mapping
src = (dst + 0.5) * (in/out) - 0.5 and edge clamping; expressing each axis as
a sparse-in-rows dense matrix turns resize into two matmuls, which XLA tiles
onto the MXU — far better than a gather on TPU. Matrices are built at trace
time from static shapes and folded into the compiled program.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=256)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] bilinear interpolation matrix (OpenCV convention)."""
    scale = n_in / n_out
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    f = (src - i0).astype(np.float64)
    i0c = np.clip(i0, 0, n_in - 1)
    i1c = np.clip(i0 + 1, 0, n_in - 1)
    m = np.zeros((n_out, n_in), dtype=np.float32)
    rows = np.arange(n_out)
    np.add.at(m, (rows, i0c), (1.0 - f).astype(np.float32))
    np.add.at(m, (rows, i1c), f.astype(np.float32))
    return m


# above this many matrix elements the dense interp matmul wastes enough
# FLOPs (2 taps of n_in are nonzero per row) to justify window tiling
_BAND_THRESHOLD = 1 << 20
_BAND_TILE = 256


@functools.lru_cache(maxsize=64)
def _banded_tiles(n_in: int, n_out: int, tile: int = _BAND_TILE):
    """Tile the [n_out, n_in] interp matrix into static windows.

    Returns ((out0, in0, M[tile_j, K]), ...): output cols [out0, out0+Tj)
    read only input cols [in0, in0+K). Exact — every dropped entry is a
    structural zero — but ~n_in/K times fewer FLOPs (the bilinear band is
    ~tile*scale wide vs n_in)."""
    m = _interp_matrix(n_in, n_out)
    scale = n_in / n_out
    k = min(n_in, int(np.ceil(tile * scale)) + 4)
    tiles = []
    for j0 in range(0, n_out, tile):
        j1 = min(j0 + tile, n_out)
        src_lo = int(np.floor((j0 + 0.5) * scale - 0.5))
        in0 = max(0, min(src_lo, n_in - k))
        tiles.append((j0, in0, m[j0:j1, in0:in0 + k]))
    return tuple(tiles)


def _tiles_from_matrix(m: np.ndarray, tile: int = _BAND_TILE):
    """Band-tile an arbitrary locally-supported [n_out, n_in] matrix.

    Generic twin of _banded_tiles for matrices that are not plain
    bilinear interp (e.g. interp composed with chroma dedup in
    ops/color.py): per output tile, slice to the union of its rows'
    nonzero spans. Exact — only structural zeros are dropped."""
    n_out, n_in = m.shape
    nz = m != 0
    any_nz = nz.any(1)
    first = np.where(any_nz, nz.argmax(1), 0)
    last = np.where(any_nz, n_in - 1 - nz[:, ::-1].argmax(1), 0)
    tiles = []
    for j0 in range(0, n_out, tile):
        j1 = min(j0 + tile, n_out)
        in0 = int(first[j0:j1].min())
        in1 = int(last[j0:j1].max()) + 1
        tiles.append((j0, in0, np.ascontiguousarray(m[j0:j1, in0:in1])))
    return tuple(tiles)


def apply_interp_w(x, tiles_or_m):
    """x [..., H, W] -> [..., H, Wo] through a [Wo, W] interp-like matrix
    (or its _tiles_from_matrix tiling). Band-tiled above _BAND_THRESHOLD."""
    x = x.astype(jnp.float32)
    if isinstance(tiles_or_m, np.ndarray):
        if tiles_or_m.size > _BAND_THRESHOLD:
            tiles_or_m = _tiles_from_matrix(tiles_or_m)
        else:
            return jnp.einsum("...hw,ow->...ho", x,
                              jnp.asarray(tiles_or_m),
                              preferred_element_type=jnp.float32)
    parts = []
    for _, in0, mw in tiles_or_m:
        mj = jnp.asarray(mw)
        parts.append(jnp.einsum(
            "...hk,tk->...ht", x[..., :, in0:in0 + mj.shape[1]], mj,
            preferred_element_type=jnp.float32))
    return jnp.concatenate(parts, axis=-1)


def apply_interp_h(x, tiles_or_m):
    """x [..., H, W] -> [..., Ho, W] through a [Ho, H] interp-like matrix
    (or its _tiles_from_matrix tiling). Band-tiled above _BAND_THRESHOLD."""
    x = x.astype(jnp.float32)
    if isinstance(tiles_or_m, np.ndarray):
        if tiles_or_m.size > _BAND_THRESHOLD:
            tiles_or_m = _tiles_from_matrix(tiles_or_m)
        else:
            return jnp.einsum("...hw,oh->...ow", x,
                              jnp.asarray(tiles_or_m),
                              preferred_element_type=jnp.float32)
    parts = []
    for _, in0, mh in tiles_or_m:
        mj = jnp.asarray(mh)
        parts.append(jnp.einsum(
            "...kw,tk->...tw", x[..., in0:in0 + mj.shape[1], :], mj,
            preferred_element_type=jnp.float32))
    return jnp.concatenate(parts, axis=-2)


def resize_planar(img, out_h: int, out_w: int):
    """img [..., H, W] -> [..., out_h, out_w], bilinear, f32."""
    h, w = img.shape[-2], img.shape[-1]
    x = img.astype(jnp.float32)
    if w != out_w:
        if w * out_w > _BAND_THRESHOLD:
            parts = []
            for _, in0, mw in _banded_tiles(w, out_w):
                mj = jnp.asarray(mw)                        # [Tj, K]
                parts.append(jnp.einsum(
                    "...hk,tk->...ht", x[..., :, in0:in0 + mj.shape[1]], mj,
                    preferred_element_type=jnp.float32))
            x = jnp.concatenate(parts, axis=-1)
        else:
            mw = jnp.asarray(_interp_matrix(w, out_w))      # [Wo, W]
            x = jnp.einsum("...hw,ow->...ho", x, mw,
                           preferred_element_type=jnp.float32)
    if h != out_h:
        if h * out_h > _BAND_THRESHOLD:
            parts = []
            for _, in0, mh in _banded_tiles(h, out_h):
                mj = jnp.asarray(mh)                        # [Tj, K]
                parts.append(jnp.einsum(
                    "...kw,tk->...tw", x[..., in0:in0 + mj.shape[1], :], mj,
                    preferred_element_type=jnp.float32))
            x = jnp.concatenate(parts, axis=-2)
        else:
            mh = jnp.asarray(_interp_matrix(h, out_h))      # [Ho, H]
            x = jnp.einsum("...hw,oh->...ow", x, mh,
                           preferred_element_type=jnp.float32)
    return x


def resize(img, out_h: int, out_w: int):
    """HWC / HW wrapper."""
    if img.ndim == 2:
        return resize_planar(img, out_h, out_w)
    planar = jnp.moveaxis(img, -1, 0)
    out = resize_planar(planar, out_h, out_w)
    return jnp.moveaxis(out, 0, -1)


def resize_scale(img, scale: float):
    """Scale both axes like cv::resize(img, (), fx=scale, fy=scale):
    output size = round(dim * scale)."""
    h, w = img.shape[0], img.shape[1]
    return resize(img, int(round(h * scale)), int(round(w * scale)))
