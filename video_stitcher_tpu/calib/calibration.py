"""Offline calibration: frames -> (StitchGeometry, CalibState).

Mirrors the phases of stitch_calib / warpImages
(360_stitcher/calibration.cpp:72-311):

  1. scales from WORK/SEAM/COMPOSE megapix      (calibration.cpp:269-281,147-153)
  2. fixed-rig camera model                      (calibration.cpp:28-68)
  3. seam-scale cylindrical warp of images+masks (calibration.cpp:91-127)
  4. gain solve + Voronoi seams                  (calibration.cpp:131-135)
  5. compose-scale backward maps + seam-mask
     dilate/resize/AND -> weight pyramids        (calibration.cpp:210-240)
  6. optional CPW mesh calibration               (calibration.cpp:299-309)

All products are plain arrays; the per-frame step closes over the static
geometry and takes the CalibState pytree.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from video_stitcher_tpu.config import StitcherConfig
from video_stitcher_tpu.geometry.camera import CameraParams, fixed_rig_cameras
from video_stitcher_tpu.geometry.cylindrical import (
    BandLayout, plan_band_layout, band_backward_maps, cylindrical_backward_map,
)
from video_stitcher_tpu.calib.gain import solve_gains
from video_stitcher_tpu.calib.seam import find_seams
from video_stitcher_tpu.calib.state import CalibState
from video_stitcher_tpu.blend.multiband import build_weight_pyramids, feather_weights
from video_stitcher_tpu.ops.morphology import dilate3x3
from video_stitcher_tpu.ops.remap import remap_planar
from video_stitcher_tpu.ops.resize import resize_planar


@dataclass(frozen=True)
class StitchGeometry:
    """Static (hashable) geometry the jitted step closes over."""
    layout: BandLayout
    num_images: int
    src_w: int                 # full-res input size
    src_h: int
    compose_w: int
    compose_h: int
    compose_scale: float
    work_scale: float
    num_bands: int
    blend_type: str
    #: pyramid mode for the per-frame blend: "highest" (f32, bit-faithful)
    #: or "bf16" (bf16 MXU passes AND bf16-stored pyramid tensors — halves
    #: blend HBM traffic, 56 dB vs the f32 chain); from cfg.blend_dtype
    blend_precision: str
    wrap: bool

    @property
    def pano_w(self) -> int:
        return self.layout.pano_w

    @property
    def pano_h(self) -> int:
        return self.layout.pano_h

    #: True when the per-frame path resizes the source to compose scale
    #: BEFORE warping (the reference's resize -> remap chain,
    #: timed.cpp:75-90) and the fused maps live in compose coordinates.
    #: Chosen under strong minification, where sampling the full-res
    #: source directly would both alias and overflow the strip kernel's
    #: 128-lane tap window — or by cfg.fuse_maps=False, which forces the
    #: reference's two-resample chain for bit-closer parity; for mild
    #: scales the default fused single-resample path is sharper and
    #: faster (it IS the measured psnr_vs_reference gap in bench.py).
    prewarp: bool = False
    #: "exact" = band maps evaluated with source-resolution intrinsics
    #: (values directly in warp-source px); "reference" = the reference's
    #: compose-intrinsics + back-conversion chain (see
    #: StitcherConfig.map_convention for the error analysis). Default
    #: matches StitcherConfig.map_convention so directly-constructed
    #: geometries (tests/tools) agree with the product default.
    map_convention: str = "exact"

    @property
    def warp_src_w(self) -> int:
        return self.compose_w if self.prewarp else self.src_w

    @property
    def warp_src_h(self) -> int:
        return self.compose_h if self.prewarp else self.src_h

    #: dims of the coordinate system the raw band maps are BUILT in
    #: (before _to_warp_source): full-res for "exact", compose for
    #: "reference" (validity bounds, calibration.cpp:224-227).
    @property
    def map_built_w(self) -> int:
        return self.src_w if self.map_convention == "exact" else self.compose_w

    @property
    def map_built_h(self) -> int:
        return self.src_h if self.map_convention == "exact" else self.compose_h


def _compose_size(cfg: StitcherConfig) -> Tuple[int, int]:
    # timed.cpp:77 / calibration.cpp:161-165: resize only if |scale-1| > 0.1
    if abs(cfg.compose_scale - 1.0) > 1e-1:
        return (int(cfg.input_width * cfg.compose_scale),
                int(cfg.input_height * cfg.compose_scale))
    return cfg.input_width, cfg.input_height


def plan_geometry(cfg: StitcherConfig) -> Tuple[StitchGeometry, List[CameraParams]]:
    cams_work = fixed_rig_cameras(cfg.num_images, cfg.input_width, cfg.input_height,
                                  cfg.work_scale, cfg.fov_deg, cfg.yaws)
    cw, ch = _compose_size(cfg)
    cams_compose = [c.scaled(cfg.compose_work_aspect) for c in cams_work]
    max_bands = None if cfg.blend_type == "multiband" else 0
    layout = plan_band_layout(cams_compose, cw, ch, cfg.blend_strength,
                              wrap=cfg.wrap_around, max_bands=max_bands)
    compose_scale = cw / cfg.input_width
    resizes = abs(compose_scale - 1.0) > 1e-1    # timed.cpp:75 condition
    geom = StitchGeometry(
        layout=layout, num_images=cfg.num_images,
        src_w=cfg.input_width, src_h=cfg.input_height,
        compose_w=cw, compose_h=ch,
        compose_scale=compose_scale,
        work_scale=cfg.work_scale,
        num_bands=layout.num_bands, blend_type=cfg.blend_type,
        blend_precision=("bf16" if cfg.blend_dtype == "bfloat16"
                         else "highest"),
        wrap=cfg.wrap_around,
        prewarp=(compose_scale < 0.5
                 or (not cfg.fuse_maps and resizes)),
        map_convention=cfg.map_convention)
    return geom, cams_compose


def map_cams(cfg: StitcherConfig, cams_compose: List[CameraParams]
             ) -> List[CameraParams]:
    """Cameras the backward band maps are evaluated with. "exact":
    source-resolution intrinsics (ppx = W/2 exactly), so the projection
    lands directly in warp-source pixels with no lossy back-conversion.
    "reference": the naively-scaled compose intrinsics
    (calibration.cpp:171-173)."""
    if cfg.map_convention == "exact":
        return fixed_rig_cameras(cfg.num_images, cfg.input_width,
                                 cfg.input_height, 1.0, cfg.fov_deg,
                                 cfg.yaws)
    return cams_compose


# ----------------------------------------------------------------------
# seam-scale canvases
# ----------------------------------------------------------------------

@dataclass(frozen=True)
class SeamCanvas:
    w: int
    h: int
    scale: float       # cylinder px/radian at seam scale
    ratio: float       # seam px per compose px (exact)
    v0: float


def _plan_seam_canvas(geom: StitchGeometry, cfg: StitcherConfig) -> SeamCanvas:
    ratio = cfg.seam_scale / geom.compose_scale
    s = geom.layout.scale * ratio
    if geom.wrap:
        w = max(8, int(round(s * 2 * math.pi)))
    else:
        w = max(8, int(math.ceil(geom.pano_w * ratio)))
    h = max(8, int(math.ceil(geom.pano_h * ratio)))
    return SeamCanvas(w=w, h=h, scale=s, ratio=ratio, v0=geom.layout.v0 * ratio)


def _seam_canvas_maps(geom: StitchGeometry, sc: SeamCanvas,
                      cams_compose: List[CameraParams], cfg: StitcherConfig):
    """Backward maps from the full seam canvas into seam-scale source images."""
    ratio_cam = cfg.seam_scale / geom.compose_scale
    cams_seam = [c.scaled(ratio_cam) for c in cams_compose]
    u = (np.arange(sc.w, dtype=np.float64) + geom.layout.u0 * sc.ratio)[None, :] \
        + np.zeros((sc.h, 1))
    v = (np.arange(sc.h, dtype=np.float64) + sc.v0)[:, None] + np.zeros((1, sc.w))
    maps = []
    for cam in cams_seam:
        mx, my = cylindrical_backward_map(cam, sc.scale, u, v)
        maps.append((mx, my))
    return maps, cams_seam


def _validity(mx, my, w, h):
    """Warp validity like remap-NEAREST of a 255 canvas with BORDER_CONSTANT
    (calibration.cpp:224-227)."""
    return ((mx > -0.5) & (mx < w - 0.5) & (my > -0.5) & (my < h - 0.5))


# ----------------------------------------------------------------------
# main entry
# ----------------------------------------------------------------------

def calibrate(frames: np.ndarray, cfg: StitcherConfig,
              mesh_maps: Optional[np.ndarray] = None):
    """frames: u8 [N, H, W, 3]. Returns (geom, CalibState, aux dict).

    mesh_maps: optional f32 [N, 2, bandH, bandW] CPW backward maps in band
    coords (identity if None); composed into the fused maps.

    The tiny seam-scale control plane (seam warps, gain solve, Voronoi
    seams) runs eagerly on the host CPU backend; the compose-scale tensor
    products (band maps, seam-weight sampling, weight pyramids, fused
    maps — the ~45 s of single-core host math in round 1) run as jitted
    programs on the default accelerator and STAY there (commit() later
    skips device-resident leaves).
    """
    assert frames.shape[0] == cfg.num_images
    geom, cams_compose = plan_geometry(cfg)
    lay = geom.layout
    from video_stitcher_tpu.utils.hostdev import host_eager
    with host_eager():
        sc, gains, seam_masks = _seam_phase(frames, cfg, geom, cams_compose)

    # --- compose-scale products, on the default device ---
    from video_stitcher_tpu.geometry.cylindrical import \
        band_backward_maps_device
    cams_map = map_cams(cfg, cams_compose)
    band_maps = band_backward_maps_device(lay, cams_map)      # [N,2,bh,bw]
    weights0, overlap_masks = _compose_products_device(
        jnp.asarray(seam_masks.astype(np.float32)), band_maps,
        geom=geom, sc=sc)

    if geom.blend_type == "feather":
        # scipy distance transform: host-only, small configs
        w0_np = np.asarray(weights0)
        w = feather_weights((w0_np > 0.5).astype(np.uint8) * 255)
        weights0 = jnp.asarray(
            np.where(w0_np > 0, w, 0.0).astype(np.float32))

    weight_pyr, valid_mask = _weight_pyr_jit(weights0, lay)

    # --- fused maps: compose-resize ∘ global warp [∘ mesh] ---
    fused = compose_fused_maps_device(
        band_maps, None if mesh_maps is None else jnp.asarray(mesh_maps),
        geom=geom)

    state = CalibState(
        fused_maps=fused,
        gains=jnp.asarray(np.asarray(gains, np.float32)),
        weight_pyr=weight_pyr,
        valid_mask=valid_mask,
    )
    aux = {
        "cams_compose": cams_compose,
        "cams_map": cams_map,
        "band_maps": band_maps,          # device-resident
        "weights0": weights0,
        "seam_masks": seam_masks,
        "seam_canvas": sc,
        "overlap_masks": overlap_masks,
    }
    return geom, state, aux


def rebuild_aux(cfg: StitcherConfig, geom: StitchGeometry):
    """The calibration aux dict WITHOUT frames, for loaded checkpoints
    (Stitcher.load_calibration). Every member except the gains (stored
    in the CalibState) is a pure function of the configured geometry:
    seam masks are Voronoi over warp VALIDITY only
    (calibration.cpp:118-135), never image content. Without this, a
    loaded calibration had no aux and live recalibration /
    update_masks / stitch_int16 crashed on first use."""
    from video_stitcher_tpu.geometry.cylindrical import \
        band_backward_maps_device
    from video_stitcher_tpu.utils.hostdev import host_eager
    _, cams_compose = plan_geometry(cfg)
    lay = geom.layout
    with host_eager():
        sc = _plan_seam_canvas(geom, cfg)
        seam_w = int(round(cfg.input_width * cfg.seam_scale))
        seam_h = int(round(cfg.input_height * cfg.seam_scale))
        canvas_maps, _ = _seam_canvas_maps(geom, sc, cams_compose, cfg)
        masks = np.stack([
            _validity(mx, my, seam_w, seam_h).astype(np.uint8) * 255
            for mx, my in canvas_maps])
        seam_masks = find_seams(masks, periodic_x=geom.wrap)
        if cfg.enable_local:
            seam_masks = np.asarray(dilate3x3(seam_masks.astype(np.float32)))
    cams_map = map_cams(cfg, cams_compose)
    band_maps = band_backward_maps_device(lay, cams_map)
    weights0, overlap_masks = _compose_products_device(
        jnp.asarray(seam_masks.astype(np.float32)), band_maps,
        geom=geom, sc=sc)
    if geom.blend_type == "feather":
        w0_np = np.asarray(weights0)
        w = feather_weights((w0_np > 0.5).astype(np.uint8) * 255)
        weights0 = jnp.asarray(
            np.where(w0_np > 0, w, 0.0).astype(np.float32))
    return {
        "cams_compose": cams_compose,
        "cams_map": cams_map,
        "band_maps": band_maps,
        "weights0": weights0,
        "seam_masks": seam_masks,
        "seam_canvas": sc,
        "overlap_masks": overlap_masks,
    }


def _seam_phase(frames, cfg, geom, cams_compose):
    """Seam-scale host control plane: warps, gain solve, Voronoi seams
    (calibration.cpp:91-135) + the enable_local seam dilation (:208-234)."""
    sc = _plan_seam_canvas(geom, cfg)
    seam_w = int(round(cfg.input_width * cfg.seam_scale))
    seam_h = int(round(cfg.input_height * cfg.seam_scale))
    seam_imgs_small = np.stack([
        np.asarray(resize_planar(np.moveaxis(f, -1, 0).astype(np.float32),
                                 seam_h, seam_w)) for f in frames])
    canvas_maps, _ = _seam_canvas_maps(geom, sc, cams_compose, cfg)
    warped = np.zeros((cfg.num_images, sc.h, sc.w, 3), np.float32)
    masks = np.zeros((cfg.num_images, sc.h, sc.w), np.uint8)
    for i, (mx, my) in enumerate(canvas_maps):
        out = np.asarray(remap_planar(seam_imgs_small[i], jnp.asarray(mx),
                                      jnp.asarray(my)))
        warped[i] = np.moveaxis(out, 0, -1)
        masks[i] = _validity(mx, my, seam_w, seam_h).astype(np.uint8) * 255

    gains = solve_gains(warped, masks)
    seam_masks = find_seams(masks, periodic_x=geom.wrap)
    if cfg.enable_local:
        seam_masks = np.asarray(dilate3x3(seam_masks.astype(np.float32)))
    return sc, gains, seam_masks


@functools.partial(jax.jit, static_argnames=("geom", "sc"))
def _compose_products_device(seam_masks, band_maps, geom: StitchGeometry,
                             sc: "SeamCanvas"):
    """Compose-scale weights + overlap masks as one device program.

    weights0: seam mask sampled at band pixels AND warp validity
    (calibration.cpp:224-240 as fed to init_gpu). overlap_masks: valid
    AND >= 2 cameras cover the pano pixel (the principled version of the
    reference's hardcoded +-400 px bands, meshwarper.cpp:82-115)."""
    from video_stitcher_tpu.blend.multiband import crop_band, place_bands
    lay = geom.layout
    n = band_maps.shape[0]
    valid = _validity(band_maps[:, 0], band_maps[:, 1],
                      geom.map_built_w, geom.map_built_h)
    ys = ((jnp.arange(lay.band_h, dtype=jnp.float32) + np.float32(lay.v0))
          * np.float32(sc.ratio) - np.float32(sc.v0))
    corners = jnp.asarray(np.asarray(lay.corners, np.float32))
    # canvas col = cylinder_u_seam - u0*ratio (the canvas origin,
    # _seam_canvas_maps): for band col x of camera i, cylinder u at
    # compose scale is x + u0 + corners[i], so the origin's u0*ratio
    # cancels — exactly as ys subtracts sc.v0. Keeping the +u0 shifted
    # every non-wrap rig's weights by u0*ratio px into the replicate
    # border (wrap layouts have u0=0, which masked it): measured 79% of
    # valid pano pixels at ~zero blend weight on a 3-cam partial ring.
    xs = ((jnp.arange(lay.band_w, dtype=jnp.float32)[None, :]
           + corners[:, None])
          * np.float32(sc.ratio))                        # [N, bw]
    border = "wrap" if geom.wrap else "replicate"

    def one(sm, xs_i):
        mxs = jnp.broadcast_to(xs_i[None, :], (lay.band_h, lay.band_w))
        mys = jnp.broadcast_to(ys[:, None], (lay.band_h, lay.band_w))
        return remap_planar(sm[None], mxs, mys, border=border)[0]

    seam_band = jax.vmap(one)(seam_masks, xs)
    weights0 = jnp.where(valid, seam_band / 255.0, 0.0)

    vb = valid.astype(jnp.float32)
    counts = place_bands(vb[:, None], lay, 0)
    overlap_masks = jnp.stack([
        vb[i] * (crop_band(counts, lay, i, 0)[0] >= 2.0)
        for i in range(n)])
    return weights0, overlap_masks


_weight_pyr_jit = jax.jit(build_weight_pyramids,
                          static_argnames=("layout",))


def compose_fused_maps(geom: StitchGeometry, band_maps: np.ndarray,
                       mesh_maps: Optional[np.ndarray] = None) -> np.ndarray:
    """Fold mesh warp + compose resize into the global band maps.

    Online equivalence (timed.cpp:77-103): out(x) = resize(src)[global[mesh[x]]]
      -> fused[x] = to_warp_source(global_map sampled at mesh_map[x]),
    where the map-value -> warp-source-pixel conversion per convention
    ("exact" vs "reference", incl. the cv resize pixel-center relation)
    is documented on _to_warp_source below.
    """
    from video_stitcher_tpu.utils.hostdev import host_eager
    with host_eager():
        return _compose_fused_maps_impl(geom, band_maps, mesh_maps)


def _to_warp_source(maps, geom):
    """Convert raw band-map VALUES into warp-source pixel coordinates.

    "exact": maps were built with source-resolution intrinsics, so they
    already ARE full-res source coords; under prewarp convert FORWARD
    into resized-source coords with the cv2 resize pixel-center relation
    per axis (dst = (src + 0.5) * out/in - 0.5, exact for the resize the
    per-frame path actually performs). "reference": maps were built in
    compose coordinates; when the online path skips the resize
    (timed.cpp:75 condition) convert back through the rounded compose
    scale — reproducing the reference's half-pixel + truncation bias.
    Works on np and jnp arrays ([N, 2, bh, bw])."""
    if geom.map_convention == "exact":
        if geom.prewarp:
            sx = np.float32(geom.compose_w / geom.src_w)
            sy = np.float32(geom.compose_h / geom.src_h)
            sc = np.asarray([sx, sy], np.float32).reshape(1, 2, 1, 1)
            maps = (maps + np.float32(0.5)) * sc - np.float32(0.5)
        return maps
    s = geom.compose_scale
    if not geom.prewarp and abs(s - 1.0) > 1e-1:   # timed.cpp:75 condition
        maps = (maps + 0.5) / s - 0.5
    return maps


def _compose_fused_maps_impl(geom, band_maps, mesh_maps=None):
    maps = band_maps
    if mesh_maps is not None:
        out = np.empty_like(maps)
        for i in range(maps.shape[0]):
            sampled = np.asarray(remap_planar(
                jnp.asarray(maps[i]), jnp.asarray(mesh_maps[i, 0]),
                jnp.asarray(mesh_maps[i, 1]), border="replicate"))
            # mesh coords past the band edge sample the CLAMPED edge of
            # the global map (replicate border; the device twin
            # compose_fused_maps_device matches) — the -1 invalid
            # sentinel survives only where the edge itself is invalid.
            # Mesh displacements are a few px (recalib_thresh-scale), so
            # the clamp affects at most that many edge pixels.
            out[i] = sampled
        maps = out
    return np.asarray(_to_warp_source(maps, geom)).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("geom",))
def compose_fused_maps_device(band_maps, mesh_maps, geom: StitchGeometry):
    """Device twin of compose_fused_maps for the calibration/recalibration
    hot paths: the ~100 MB fused map tensor is composed, and stays, on
    the TPU — never downloaded or re-uploaded (the host only sees the
    tiny ChunkStats reductions; see ops/remap_strips.plan_strips_from_stats).
    band_maps [N, 2, bh, bw] (resident device copy); mesh_maps ditto, or
    None for the global-only (identity-mesh) maps."""
    if mesh_maps is not None:
        def one(bm, mm):
            return remap_planar(bm, mm[0], mm[1], border="replicate")
        maps = jax.vmap(one)(band_maps, mesh_maps)
    else:
        maps = band_maps
    return _to_warp_source(maps, geom)


def krinv_device(cams):
    """K @ R.T per camera as a device f32 [N, 3, 3] — the only camera
    state compose_fused_maps_from_disp needs (same product
    band_backward_maps_device feeds the analytic map builder)."""
    return jax.device_put(
        np.stack([c.K @ c.R.T for c in cams]).astype(np.float32))


@functools.partial(jax.jit, static_argnames=("geom",))
def compose_fused_maps_from_disp(krinv, disp_c, geom: StitchGeometry):
    """Gather-free twin of compose_fused_maps_device for the
    recalibration hot path. Instead of densifying the mesh backward map
    and bilinearly gathering the precomputed band_maps tensor at it —
    a full-res XLA gather that was ~460 ms of device time per rewarp,
    the single largest program on that path — this upsamples the coarse
    backward mesh displacement (align-corners MXU matmuls) and
    EVALUATES the analytic cylindrical backward map at the mesh-warped
    band coordinates: pure VPU elementwise math (sin/cos + 3x3 matrix +
    divide), exact where the gather was a bilinear approximation, with
    clean validity at the pz<=0 horizon where interpolation blended the
    -1 sentinel into real coordinates.

    krinv f32 [N, 3, 3] (krinv_device); disp_c f32 [N, 2, hc, wc] coarse
    backward displacement in full-res pixel units (coarse_backward_disp).
    Same output contract as compose_fused_maps_device: fused maps
    [N, 2, band_h, band_w] in warp-source coordinates (timed.cpp:77-103
    semantics)."""
    from video_stitcher_tpu.mesh.mesh2map import upsample_mesh
    from video_stitcher_tpu.geometry.cylindrical import eval_cyl_backward
    lay = geom.layout
    bh, bw = lay.band_h, lay.band_w
    bd = upsample_mesh(disp_c, bh, bw)               # [N, 2, bh, bw]
    gy, gx = jnp.mgrid[0:bh, 0:bw]
    mesh_x = gx.astype(jnp.float32)[None] - bd[:, 0]
    mesh_y = gy.astype(jnp.float32)[None] - bd[:, 1]
    corners = jnp.asarray(np.asarray(lay.corners, np.float32))
    u = mesh_x + np.float32(lay.u0) + corners[:, None, None]
    v = mesh_y + np.float32(lay.v0)
    mx, my = eval_cyl_backward(krinv, u, v, np.float32(lay.scale))
    maps = jnp.stack([mx, my], axis=1)
    return _to_warp_source(maps, geom)


def prewarp_source(x, geom: StitchGeometry):
    """Resize planar f32 frames [..., H, W] to the warp-source (compose)
    scale when the fused maps live in compose coordinates (the reference's
    per-frame cuda::resize, timed.cpp:77). No-op otherwise."""
    if not geom.prewarp:
        return x
    return resize_planar(x, geom.compose_h, geom.compose_w)
