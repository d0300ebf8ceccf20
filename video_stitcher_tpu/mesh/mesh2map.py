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


def _sample_bilinear_replicate_np(field, x, y):
    """field [C, 2, H, W]; x, y [H', W'] f32 -> [C, 2, H', W'] (numpy,
    replicate border)."""
    h, w = field.shape[-2], field.shape[-1]
    x0 = np.clip(np.floor(x).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(x - x0, 0.0, 1.0).astype(np.float32)
    fy = np.clip(y - y0, 0.0, 1.0).astype(np.float32)
    f00 = field[..., y0, x0]
    f01 = field[..., y0, x1]
    f10 = field[..., y1, x0]
    f11 = field[..., y1, x1]
    top = f00 + fx * (f01 - f00)
    bot = f10 + fx * (f11 - f10)
    return top + fy * (bot - top)


def coarse_backward_disp(verts_np: np.ndarray, band_h: int, band_w: int,
                         iters: int = 3, step: int = 8) -> np.ndarray:
    """verts f32 [C, N, M, 2] -> backward DISPLACEMENT field on a step-px
    coarse grid, f32 [C, 2, hc, wc], full-res pixel units (host numpy).

    The displacement field comes from an N x M (~10x10) mesh whose cells
    span >100 px, so a step-px grid oversamples it ~16x; the inverted
    backward displacement (equally smooth) upsamples to full res with
    the align-corners matmuls of upsample_mesh. The Picard fixed point
    runs here on the host: the grid is tiny (~35k points, ~ms in numpy)
    and the irregular gathers it needs are the one op the TPU is bad at
    — the round-1 full-res device inversion was the Rewarp's biggest
    device cost (~1.1 s), and the fused coarse-grid device variant
    reproducibly crashed the axon TPU worker (XLA/Mosaic runtime fault;
    see git history) — so the host does the 400 KB inversion and the
    device does the dense MXU upsample."""
    c, n, m, _ = verts_np.shape
    v = np.moveaxis(verts_np.astype(np.float32), -1, 1)      # [C, 2, N, M]
    hc = max(n, (band_h - 1 + step - 1) // step + 1)
    wc = max(m, (band_w - 1 + step - 1) // step + 1)
    mh = _upsample_matrix(n, hc)                             # [hc, N]
    mw = _upsample_matrix(m, wc)                             # [wc, M]
    # two pairwise contractions: the 3-operand einsum picked a
    # catastrophic order (~500 ms); this is ~4 MFLOP
    fwd = np.einsum("hn,cznw->czhw", mh,
                    np.einsum("cznm,wm->cznw", v, mw))       # full-res px
    sy = (band_h - 1) / (hc - 1)
    sx = (band_w - 1) / (wc - 1)
    gy, gx = np.mgrid[0:hc, 0:wc].astype(np.float32)
    disp = np.stack([fwd[:, 0] - gx * sx, fwd[:, 1] - gy * sy], axis=1)
    # Picard in coarse-grid units: B(q) = q - D(B(q)). Batched over
    # cameras via take_along_axis on the flattened grids — the
    # per-camera python loop with 2D fancy-index gathers was ~340 ms of
    # host time per rewarp on the single-core bench host; this form is
    # ~10x less allocation/indexing overhead for the same arithmetic.
    ux = np.broadcast_to(gx, (c, hc, wc)).copy()
    uy = np.broadcast_to(gy, (c, hc, wc)).copy()
    dflat = disp.reshape(c, 2, hc * wc)
    for _ in range(iters):
        x0 = np.clip(np.floor(ux).astype(np.int64), 0, wc - 1)
        y0 = np.clip(np.floor(uy).astype(np.int64), 0, hc - 1)
        x1 = np.minimum(x0 + 1, wc - 1)
        y1 = np.minimum(y0 + 1, hc - 1)
        fx = np.clip(ux - x0, 0.0, 1.0).astype(np.float32)[:, None]
        fy = np.clip(uy - y0, 0.0, 1.0).astype(np.float32)[:, None]

        def tap(yy, xx):
            idx = (yy * wc + xx).reshape(c, 1, hc * wc)
            return np.take_along_axis(dflat, idx, 2).reshape(c, 2, hc, wc)

        top = tap(y0, x0)
        top += fx * (tap(y0, x1) - top)
        bot = tap(y1, x0)
        bot += fx * (tap(y1, x1) - bot)
        s = top + fy * (bot - top)
        ux = gx - s[:, 0] / np.float32(sx)
        uy = gy - s[:, 1] / np.float32(sy)
    return np.stack([(gx - ux) * np.float32(sx),
                     (gy - uy) * np.float32(sy)], axis=1)


@functools.partial(jax.jit, static_argnames=("band_h", "band_w"))
def upsample_backward_disp(disp_c, band_h: int, band_w: int):
    """Coarse backward displacement [C, 2, hc, wc] -> dense backward maps
    f32 [C, 2, band_h, band_w] (device: align-corners MXU matmuls)."""
    bd = upsample_mesh(disp_c, band_h, band_w)
    gy_f, gx_f = jnp.mgrid[0:band_h, 0:band_w]
    return jnp.stack([gx_f.astype(jnp.float32) - bd[:, 0],
                      gy_f.astype(jnp.float32) - bd[:, 1]], axis=1)


def mesh_to_backward_maps(verts, band_h: int, band_w: int, iters: int = 3,
                          step: int = 8):
    """verts f32 [C, N, M, 2] warped vertex positions -> backward maps
    f32 [C, 2, band_h, band_w] for the per-frame mesh warp (device array).

    Host coarse-grid Picard inversion (coarse_backward_disp) + device
    dense upsample (upsample_backward_disp); ~1.6 MB crosses host->device
    per recalibration. Replaces the reference's forward-splat inversion
    (MeshWarper::convertMeshesToMap, meshwarper.cpp:823-886)."""
    verts_np = np.asarray(jax.device_get(verts))
    disp_c = coarse_backward_disp(verts_np, band_h, band_w,
                                  iters=iters, step=step)
    return upsample_backward_disp(jnp.asarray(disp_c), band_h, band_w)
