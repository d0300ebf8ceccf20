"""CPW mesh solver + mesh->map inversion tests."""

import numpy as np
import pytest

from video_stitcher_tpu.mesh.cpw import CamMatches, CPWSolver
from video_stitcher_tpu.mesh.mesh2map import (
    mesh_to_backward_maps, upsample_mesh, invert_forward_field,
)


def rest_grid(solver):
    gx = solver.rest_x(np.arange(solver.M))
    gy = solver.rest_y(np.arange(solver.N))
    g = np.zeros((solver.N, solver.M, 2), np.float32)
    g[..., 0] = gx[None, :]
    g[..., 1] = gy[:, None]
    return g


def test_no_matches_gives_identity_mesh():
    solver = CPWSolver(num_images=2, mesh_w=6, mesh_h=6, band_w=120,
                       band_h=100, targets=[-60.0, -60.0])
    imgs = np.random.default_rng(0).random((2, 3, 100, 120)).astype(np.float32) * 255
    verts = solver.solve([None, None], imgs)
    g = rest_grid(solver)
    np.testing.assert_allclose(verts[0], g, atol=1e-3)
    np.testing.assert_allclose(verts[1], g, atol=1e-3)


def test_matches_pull_mesh_toward_alignment():
    """Two cameras with a consistent horizontal misalignment: the solved mesh
    must move feature x-positions to satisfy the target distance."""
    rng = np.random.default_rng(1)
    bw, bh = 120, 100
    target = -60.0
    solver = CPWSolver(num_images=2, mesh_w=6, mesh_h=6, band_w=bw,
                       band_h=bh, targets=[target, target],
                       alphas=(1.0, 0.01, 0.00005, 0.0))
    # p1 - p2 should equal target; rig has 8px parallax error on camera 0
    p1 = np.stack([rng.uniform(20, 60, 30), rng.uniform(20, 80, 30)], -1)
    p2 = np.stack([p1[:, 0] - target - 8.0, p1[:, 1]], -1)
    m0 = CamMatches(p1=p1.astype(np.float32), p2=p2.astype(np.float32), dst=1)
    imgs = rng.random((2, 3, bh, bw)).astype(np.float32) * 255
    verts = solver.solve([m0, None], imgs)
    g = rest_grid(solver)
    disp = verts - g[None]
    # some vertices must have moved in x to absorb the 8px error
    assert np.abs(disp[..., 0]).max() > 1.0
    # y should stay nearly put
    assert np.abs(disp[..., 1]).max() < np.abs(disp[..., 0]).max()
    # the warp must reduce the alignment residual at the features:
    # interpolate vertex displacement at p1 (camera 0)
    from video_stitcher_tpu.mesh.mesh2map import upsample_mesh
    import jax.numpy as jnp
    fwd = np.asarray(upsample_mesh(
        jnp.asarray(np.moveaxis(verts, -1, 1)), bh, bw))  # [2, 2, bh, bw]
    xi = np.clip(p1[:, 0].astype(int), 0, bw - 1)
    yi = np.clip(p1[:, 1].astype(int), 0, bh - 1)
    new_p1x = fwd[0, 0, yi, xi]
    xi2 = np.clip(p2[:, 0].astype(int), 0, bw - 1)
    yi2 = np.clip(p2[:, 1].astype(int), 0, bh - 1)
    new_p2x = fwd[1, 0, yi2, xi2]
    resid_before = np.abs((p1[:, 0] - p2[:, 0]) - target).mean()
    resid_after = np.abs((new_p1x - new_p2x) - target).mean()
    assert resid_after < resid_before * 0.55


def test_invert_forward_field_roundtrip():
    """B must satisfy F(B(q)) ~= q for a smooth synthetic warp."""
    h, w = 64, 96
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    fx = gx + 3.0 * np.sin(gy / 17.0)
    fy = gy + 2.0 * np.cos(gx / 23.0)
    fwd = np.stack([fx, fy])
    import jax.numpy as jnp
    back = np.asarray(invert_forward_field(jnp.asarray(fwd), iters=4))
    # evaluate F at B(q) by bilinear interp
    from video_stitcher_tpu.ops.remap import remap_planar
    fb = np.asarray(remap_planar(jnp.asarray(fwd), jnp.asarray(back[0]),
                                 jnp.asarray(back[1]), border="replicate"))
    inner = (slice(8, -8), slice(8, -8))
    np.testing.assert_allclose(fb[0][inner], gx[inner], atol=0.15)
    np.testing.assert_allclose(fb[1][inner], gy[inner], atol=0.15)


def test_mesh_to_backward_maps_identity():
    solver = CPWSolver(num_images=1, mesh_w=5, mesh_h=5, band_w=80,
                       band_h=64, targets=[0.0])
    g = rest_grid(solver)
    import jax.numpy as jnp
    maps = np.asarray(mesh_to_backward_maps(jnp.asarray(g[None]), 64, 80))
    gy, gx = np.mgrid[0:64, 0:80]
    np.testing.assert_allclose(maps[0, 0], gx, atol=1e-2)
    np.testing.assert_allclose(maps[0, 1], gy, atol=1e-2)


def test_compose_from_disp_matches_gather_compose():
    """The gather-free recalibration compose (analytic cylindrical map
    evaluated at the mesh-warped coordinates) must agree with the
    bilinear-gather twin (dense mesh map + remap of the precomputed
    band_maps) everywhere the gather's 2x2 neighborhood is valid — the
    analytic path is the more exact of the two, so the tolerance is the
    bilinear interpolation error of the smooth map (sub-0.1 px)."""
    import jax.numpy as jnp
    from video_stitcher_tpu.config import StitcherConfig
    from video_stitcher_tpu.calib.calibration import (
        compose_fused_maps_device, compose_fused_maps_from_disp,
        krinv_device, plan_geometry)
    from video_stitcher_tpu.geometry.cylindrical import \
        band_backward_maps_device
    from video_stitcher_tpu.mesh.mesh2map import upsample_backward_disp

    cfg = StitcherConfig(num_images=4, input_width=320, input_height=180)
    geom, cams = plan_geometry(cfg)
    lay = geom.layout
    bh, bw = lay.band_h, lay.band_w

    step = 8
    hc = max(10, (bh - 1 + step - 1) // step + 1)
    wc = max(10, (bw - 1 + step - 1) // step + 1)
    rng = np.random.default_rng(3)
    disp_c = rng.normal(0, 2.0, (cfg.num_images, 2, hc, wc)) \
        .astype(np.float32)

    band_maps = band_backward_maps_device(lay, cams)
    mesh_maps = upsample_backward_disp(jnp.asarray(disp_c), bh, bw)
    gold = np.asarray(compose_fused_maps_device(band_maps, mesh_maps,
                                                geom=geom))
    new = np.asarray(compose_fused_maps_from_disp(
        krinv_device(cams), jnp.asarray(disp_c), geom=geom))

    # validity in composed coordinates: the -1 sentinel goes through the
    # same compose-scale adjust as real values
    s = geom.compose_scale
    sent = (-1.0 + 0.5) / s - 0.5 if (not geom.prewarp
                                      and abs(s - 1.0) > 1e-1) else -1.0
    valid = np.all(np.abs(new - sent) > 1e-3, axis=1)   # [N, bh, bw]
    # erode by 1 px so the gather's 2x2 support never spans the horizon
    er = valid.copy()
    er[:, 1:] &= valid[:, :-1]
    er[:, :-1] &= valid[:, 1:]
    er[:, :, 1:] &= valid[:, :, :-1]
    er[:, :, :-1] &= valid[:, :, 1:]
    # and keep away from band borders, where the gather clamps
    # (replicate) while the analytic path evaluates the true map
    m = int(np.ceil(np.abs(disp_c).max())) + 2
    er[:, :m] = er[:, -m:] = er[:, :, :m] = er[:, :, -m:] = False

    d = np.abs(gold - new)[:, :, :, :] * er[:, None]
    assert er.sum() > 0.2 * er.size
    assert float(np.median(d[np.broadcast_to(er[:, None], d.shape)])) \
        < 0.02, float(np.median(d))
    assert float(np.percentile(d, 99.9)) < 0.25, float(np.percentile(d, 99.9))


def test_coarse_backward_disp_matches_fullres_inversion():
    """The host coarse-grid Picard inversion + dense upsample must agree
    with the full-resolution device inversion on a realistic wobbled
    mesh (the production Rewarp path is coarse; invert_forward_field is
    the brute-force gold)."""
    import jax
    import jax.numpy as jnp
    from video_stitcher_tpu.mesh.mesh2map import upsample_mesh

    bh, bw = 160, 224
    n = m = 6
    rng = np.random.default_rng(7)
    base_x = np.linspace(0, bw - 1, m)
    base_y = np.linspace(0, bh - 1, n)
    vx = base_x[None, None, :] + rng.normal(0, 2.5, (2, n, m))
    vy = base_y[None, :, None] + rng.normal(0, 2.5, (2, n, m))
    verts = np.stack([vx, vy], axis=-1).astype(np.float32)

    maps = np.asarray(mesh_to_backward_maps(verts, bh, bw))

    v = jnp.moveaxis(jnp.asarray(verts), -1, 1)
    fwd = upsample_mesh(v, bh, bw)
    ref = np.asarray(jax.vmap(
        lambda f: invert_forward_field(f, 3))(fwd))

    d = np.abs(maps - ref)
    assert float(np.percentile(d, 99)) < 0.5, float(np.percentile(d, 99))
    assert float(d.mean()) < 0.15, float(d.mean())
