"""CPW mesh recalibration pipeline: frames -> features -> matches -> solve
-> backward maps. The body of the reference's recalibrateMesh thread
(360_stitcher/timed.cpp:414-463 + MeshWarper::createMesh,
meshwarper.cpp:48-335), as a plain function suitable for an async job."""

from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from video_stitcher_tpu.features.orb import detect_and_describe
from video_stitcher_tpu.features.match import knn_ratio_match
from video_stitcher_tpu.features.ransac import ransac_homography
from video_stitcher_tpu.mesh.cpw import CamMatches, CPWSolver, TemporalMatches
from video_stitcher_tpu.mesh.mesh2map import coarse_backward_disp
from video_stitcher_tpu.ops.color import rgb_to_gray_planar
from video_stitcher_tpu.ops.remap import remap_planar

Y_DIFF_MAX = 40.0          # meshwarper.cpp:935
X_DIST_SLACK = 300.0       # meshwarper.cpp:938


def band_targets(layout) -> List[float]:
    """Per-camera expected x-distance p1.x - p2.x against dst = (cam-1) mod C.

    Replaces theta*f*scale (meshwarper.cpp:616-628,686) with the exact band
    corner difference (wrapped to the nearest period)."""
    c = len(layout.corners)
    out = []
    for idx in range(c):
        dst = (idx - 1) % c
        t = layout.corners[dst] - layout.corners[idx]
        if layout.wrap:
            t = (t + layout.pano_w / 2) % layout.pano_w - layout.pano_w / 2
        out.append(float(t))
    return out


@functools.partial(jax.jit,
                   static_argnames=("max_kp", "num_levels", "scale_factor"))
def _detect_all(bands_gray, masks, max_kp=512, num_levels=4,
                scale_factor=1.2):
    """bands_gray [C, bh, bw], masks [C, bh, bw] -> batched Keypoints.

    ORB params come from cfg.orb_num_features / orb_num_levels /
    orb_scale_factor (the reference's cuda::ORB::create args,
    featurefinder.cpp:15)."""
    return jax.vmap(lambda g, m: detect_and_describe(
        g, m, max_keypoints=max_kp, num_levels=num_levels,
        scale_factor=scale_factor))(bands_gray, masks)


@functools.partial(jax.jit,
                   static_argnames=("max_kp", "num_levels", "scale_factor"))
def _detect_one(gray, mask, max_kp=512, num_levels=4, scale_factor=1.2):
    """Single-camera twin of _detect_all (cfg.recalib_chunked): a ~20 ms
    program instead of the ~128 ms 6-camera batch, so live stitch frames
    sharing the device can interleave between cameras."""
    return detect_and_describe(gray, mask, max_keypoints=max_kp,
                               num_levels=num_levels,
                               scale_factor=scale_factor)


@jax.jit
def _match_ransac_one(xy1, xy2, d1, d2, v1, v2, key, ratio):
    """Single ring-pair twin of _match_ransac_all_jit
    (cfg.recalib_chunked)."""
    m = knn_ratio_match(d1, d2, v1, v2, ratio)
    p1 = jnp.take(xy1, m.query, axis=0)
    p2 = jnp.take(xy2, m.train, axis=0)
    _, inl, _ = ransac_homography(p1, p2, m.valid, key)
    return p1, p2, m.valid, inl, m.distance


def _gate(x):
    """Completion gate between chunked device programs: waits for x (a
    4-byte read), which opens a gap in the device's in-order queue so a
    concurrently-running stitch loop's frames run next instead of
    queueing behind the rest of the solve. Costs one host<->device round
    trip."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:4])


def _warp_bands_global(frames, global_fused_maps, geom):
    """Warp frames through the *global-only* fused maps (the mesh must be
    estimated on globally-warped images, meshwarper.cpp:64-73). frames:
    u8 RGB [C, H, W, 3] or NV12 [C, H*3/2, W] (host or device — the
    Runner hands the staging thread's device-resident frames straight in,
    skipping a second upload). Under geom.prewarp the frames are resized
    to compose scale first, matching the maps' coordinates."""
    from video_stitcher_tpu.calib.calibration import prewarp_source
    from video_stitcher_tpu.pipeline.stitcher import _frames_to_planar_f32
    x = _frames_to_planar_f32(jnp.asarray(frames))
    x = prewarp_source(x, geom)
    return jax.vmap(lambda im, m: remap_planar(im, m[0], m[1]))(
        x, jnp.asarray(global_fused_maps))


_warp_bands_global_jit = jax.jit(_warp_bands_global,
                                 static_argnames=("geom",))


@functools.partial(jax.jit, static_argnames=("geom", "warp_static"))
def _warp_bands_strip_jit(frames, maps_lane, strip_off, chunk_packed,
                          groups, geom, warp_static):
    """Strip-kernel twin of _warp_bands_global (no gain — the mesh is
    estimated on ungained, globally-warped bands, meshwarper.cpp:64-73)."""
    from video_stitcher_tpu.ops.remap_strips import remap_strips
    from video_stitcher_tpu.pipeline.stitcher import _prep_strip_source
    lay = geom.layout
    src = _prep_strip_source(frames, geom)
    sh, whc, slab_w = warp_static
    bands = remap_strips(src, maps_lane, strip_off, chunk_packed, groups,
                         sh=sh, whc=whc, slab_w=slab_w)
    return bands[:, :, :lay.band_h, :lay.band_w]


@functools.partial(jax.jit, static_argnames=("qn", "qm"))
def _salience_all(bands, qn: int, qm: int):
    """Device twin of CPWSolver._salience for the whole camera batch:
    per-quad, per-half-triangle salience [C, qn, qm, 4] = sqrt(||per-channel
    variance||_2 + 0.5) (meanStdDev over the triangle, meshwarper.cpp
    543-564). Keeps the 164 MB band tensor on device — only this tiny grid
    crosses to the host."""
    c, ch3, h, w = bands.shape
    ch = h // qn
    cw = w // qm
    img = bands[:, :, :qn * ch, :qm * cw].reshape(c, ch3, qn, ch, qm, cw)
    yy, xx = np.mgrid[0:ch, 0:cw]
    fy = (yy + 0.5) / ch
    fx = (xx + 0.5) / cw
    masks_np = np.stack([
        fy <= fx, fy >= fx,
        fy <= 1 - fx, fy >= 1 - fx,
    ]).astype(np.float32)                          # [4, ch, cw]
    cnt = jnp.asarray(masks_np.sum(axis=(1, 2)))   # [4]
    # pre-center by the cell mean so the f32 s2 - mean^2 cancellation
    # happens among small numbers
    cell_mean = img.mean(axis=(3, 5), keepdims=True)
    xc = img - cell_mean
    # the masked triangle sums as ONE [R, K] x [K, 4] matmul each (an
    # einsum with a tiny contracted output lowered per-element on TPU and
    # dominated the salience cost; the transpose is a single relayout)
    y = jnp.transpose(xc, (0, 1, 2, 4, 3, 5)).reshape(
        c * ch3 * qn * qm, ch * cw)
    m2 = jnp.asarray(masks_np.reshape(4, ch * cw).T)     # [K, 4]
    s1 = (y @ m2).reshape(c, ch3, qn, qm, 4)
    s2 = ((y * y) @ m2).reshape(c, ch3, qn, qm, 4)
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)  # [c, 3, qn, qm, 4]
    return jnp.sqrt(jnp.sqrt((var ** 2).sum(axis=1)) + 0.5)


_match_jit = jax.jit(knn_ratio_match)


@jax.jit
def _match_ransac_all_jit(xy, desc, valid, keys, ratio):
    """ALL ring pairs (idx vs idx-1 mod C) in one program: vmapped
    knn+ratio match, point gather, and RANSAC. One dispatch + one fetch
    instead of ~4 per camera — on a tunneled backend the per-call client
    overhead (~8 ms) made the per-camera loop a measurable slice of the
    Rewarp budget. xy [C,K,2] f32, desc [C,K,8] u32, valid [C,K] bool,
    keys [C,2] u32. Returns (p1, p2, ok, inl, dist), each [C, K, ...]."""
    d2 = jnp.roll(desc, 1, axis=0)
    v2 = jnp.roll(valid, 1, axis=0)
    xy2 = jnp.roll(xy, 1, axis=0)

    def one(xy1, xyd, d1, dd, v1, vd, key):
        m = knn_ratio_match(d1, dd, v1, vd, ratio)
        p1 = jnp.take(xy1, m.query, axis=0)
        p2 = jnp.take(xyd, m.train, axis=0)
        _, inl, _ = ransac_homography(p1, p2, m.valid, key)
        return p1, p2, m.valid, inl, m.distance

    return jax.vmap(one)(xy, xy2, desc, d2, valid, v2, keys)


def prewarm_mesh_programs(cfg, geom, strip_warp: bool = False) -> None:
    """Compile the recalibration program set concurrently, ahead of use.

    Cold calibration is ~90% jit compiles of these programs (measured by
    tools/profile_calibrate.py: 454 s of a 502 s cold calibrate on the
    dev TPU); compiles release the GIL (and run remotely on tunneled
    backends), so a thread pool overlaps them. Each job AOT-lowers and
    compiles its program at the production shapes (``jit(...).lower(
    ShapeDtypeStruct...).compile()``) — compile-only, no device arrays
    and no enqueued execution, so the prewarm never interleaves device
    work with the calibration running on the main thread (concurrent
    zeros-executions during calibrate faulted the tunneled dev TPU).
    The pipeline's later first calls retrace and hit the persistent XLA
    compile cache, paying only tracing time. Stitcher.calibrate runs
    this in the background while the host does seam/gain/weight work."""
    import concurrent.futures as cf

    lay = geom.layout
    c = geom.num_images
    bh, bw = lay.band_h, lay.band_w
    kp = cfg.orb_num_features
    from video_stitcher_tpu.ops.remap_strips import (
        ROW_ALIGN, _round_up, chunk_stats_device, pad_maps_device,
        repack_maps_lane)

    def st(shape, dtype=jnp.float32):
        return jax.ShapeDtypeStruct(shape, dtype)

    # frames enter at FULL source resolution in both modes (prewarp's
    # resize happens inside the jitted program, not at the boundary)
    frames_st = st((c, geom.src_h, geom.src_w, 3), jnp.uint8)
    maps_st = st((c, 2, bh, bw))
    # pad_maps_device output shape (rows to sublane tile, lanes to 128)
    ph, pw = _round_up(bh, ROW_ALIGN), _round_up(bw, 128)
    pmaps_st = st((c, 2, ph, pw))
    warp_w = ((geom.warp_src_w + 127) // 128) * 128

    def f_warp():
        _warp_bands_global_jit.lower(frames_st, maps_st, geom).compile()

    chunked = getattr(cfg, "recalib_chunked", True)

    def f_detect():
        if chunked:
            g1 = st((bh, bw))
            _detect_one.lower(g1, g1, max_kp=kp,
                              num_levels=cfg.orb_num_levels,
                              scale_factor=cfg.orb_scale_factor).compile()
        else:
            g = st((c, bh, bw))
            _detect_all.lower(g, g, max_kp=kp,
                              num_levels=cfg.orb_num_levels,
                              scale_factor=cfg.orb_scale_factor).compile()

    def f_match():
        d = st((kp, 8), jnp.uint32)
        v = st((kp,), jnp.bool_)
        if chunked:
            xy = st((kp, 2))
            key = st((2,), jnp.uint32)
            _match_ransac_one.lower(xy, xy, d, d, v, v, key,
                                    cfg.lowe_ratio).compile()
        else:
            # the program run() actually executes in non-chunked mode:
            # ALL ring pairs' match + gather + RANSAC as one vmapped
            # dispatch (the old prewarm compiled the standalone
            # _match_jit/_ransac_jit here, which that path never calls
            # — the heaviest program of the set then compiled inside
            # the first live recalibration)
            xyc = st((c, kp, 2))
            dc = st((c, kp, 8), jnp.uint32)
            vc = st((c, kp), jnp.bool_)
            keysc = st((c, 2), jnp.uint32)
            _match_ransac_all_jit.lower(xyc, dc, vc, keysc,
                                        cfg.lowe_ratio).compile()
        if cfg.alphas[3] > 0:
            # the temporal term matches frame t vs t-1 with the
            # standalone matcher in BOTH modes — compile it here, not
            # inside the first live solve
            _match_jit.lower(d, d, v, v, cfg.lowe_ratio).compile()

    def f_salience():
        _salience_all.lower(st((c, 3, bh, bw)), cfg.mesh_height - 1,
                            cfg.mesh_width - 1).compile()

    def f_mesh2map():
        from video_stitcher_tpu.mesh.mesh2map import upsample_backward_disp
        step = 8
        hcc = max(cfg.mesh_height, (bh - 1 + step - 1) // step + 1)
        wcc = max(cfg.mesh_width, (bw - 1 + step - 1) // step + 1)
        upsample_backward_disp.lower(st((c, 2, hcc, wcc)), bh, bw).compile()

    def f_compose():
        from video_stitcher_tpu.calib.calibration import \
            compose_fused_maps_from_disp
        step = 8
        hcc = max(cfg.mesh_height, (bh - 1 + step - 1) // step + 1)
        wcc = max(cfg.mesh_width, (bw - 1 + step - 1) // step + 1)
        compose_fused_maps_from_disp.lower(
            st((c, 3, 3)), st((c, 2, hcc, wcc)), geom=geom).compile()

    def f_plan_bits():
        pad_maps_device.lower(maps_st).compile()
        chunk_stats_device.lower(pmaps_st, geom.warp_src_h,
                                 warp_w).compile()
        repack_maps_lane.lower(pmaps_st).compile()

    # the XLA-gather mesh-estimation warp is only executed when the
    # production strip path is unavailable — its compile is the single
    # biggest program of the set (48 s of the 76 s cold calibration on
    # the dev TPU), so skip it when the strip kernel will be used (the
    # strip twin compiles in ~4 s at first use, after the plan exists)
    jobs = [f_detect, f_match, f_salience,
            f_compose, f_plan_bits]
    if cfg.update_masks:
        # dense mesh maps are only materialized on the opt-in
        # update_masks path; skip the compile otherwise
        jobs.append(f_mesh2map)
    if not strip_warp:
        jobs.insert(0, f_warp)
    with cf.ThreadPoolExecutor(max_workers=len(jobs)) as ex:
        for fut in [ex.submit(j) for j in jobs]:
            try:
                fut.result()
            except Exception:      # prewarm is best-effort
                pass


class MeshPipeline:
    """Holds the jitted feature machinery + CPW solver state across
    recalibrations."""

    def __init__(self, geom, global_fused_maps, overlap_masks,
                 cfg, rng_seed: int = 0):
        lay = geom.layout
        self.geom = geom
        self.cfg = cfg
        # resident device copy: passing a host array to the jitted warp
        # re-uploads the ~100 MB global maps on EVERY recalibration (the
        # single biggest cost of the round-1 Rewarp on the dev tunnel);
        # commit() keeps already-device-resident maps in place
        from video_stitcher_tpu.utils.hostdev import commit
        self.global_maps = commit(jnp.asarray(global_fused_maps))
        # the global maps are STATIC across recalibrations, so the mesh-
        # estimation warp can use the production Pallas strip kernel with
        # a once-built plan instead of the naive XLA gather (which lowers
        # per-element on TPU and dominated the remaining Rewarp cost)
        self._strip = None
        if (cfg.use_pallas_remap and jax.default_backend() == "tpu"
                and geom.warp_src_w >= 256):
            from video_stitcher_tpu.ops.remap_strips import (
                chunk_stats_device, pad_maps_device, plan_strips_from_stats,
                repack_maps_lane)
            warp_w = ((geom.warp_src_w + 127) // 128) * 128
            mp_dev = pad_maps_device(self.global_maps)
            stats = jax.device_get(
                chunk_stats_device(mp_dev, geom.warp_src_h, warp_w))
            plan = plan_strips_from_stats(stats, tuple(mp_dev.shape[2:]),
                                          geom.warp_src_h, warp_w)
            self._strip = {
                "lane": repack_maps_lane(mp_dev),
                "so": jnp.asarray(plan.strip_off),
                "cp": jnp.asarray(plan.chunk_packed),
                "gl": jnp.asarray(plan.groups),
                "static": (plan.sh, plan.whc, plan.slab_w),
            }
        self.overlap_masks = jnp.asarray(overlap_masks.astype(np.float32))
        self.solver = CPWSolver(
            num_images=geom.num_images, mesh_w=cfg.mesh_width,
            mesh_h=cfg.mesh_height, band_w=lay.band_w, band_h=lay.band_h,
            targets=band_targets(lay), alphas=cfg.alphas,
            global_dist=cfg.global_dist, recalib_thresh=cfg.recalib_thresh_px,
            shrink_px=cfg.mesh_shrink_px)
        self.key = jax.random.PRNGKey(rng_seed)
        # module-level shared jit (NOT per-instance): prewarm_mesh_programs
        # compiles it ahead of the first recalibration (temporal term)
        self._match = _match_jit
        # previous-frame keypoints, for the temporal CPW term
        # (featurefinder.cpp matchFeaturesTemporal); populated only when
        # cfg.alphas[3] > 0
        self._prev_kps = None

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def run(self, frames: np.ndarray):
        """frames u8 [C, H, W, 3] -> coarse mesh backward DISPLACEMENT
        f32 [C, 2, hc, wc] (host numpy; None when no usable matches) in
        full-res pixel units. The caller folds it into the fused maps
        with the gather-free compose_fused_maps_from_disp, or densifies
        it with mesh2map.upsample_backward_disp when it needs the dense
        mesh backward map itself."""
        geom = self.geom
        cfg = self.cfg
        c = geom.num_images
        if frames.shape[0] != c:
            frames = frames[:c]         # drop mesh-padding cameras

        if self._strip is not None:
            bands = _warp_bands_strip_jit(
                jnp.asarray(frames), self._strip["lane"], self._strip["so"],
                self._strip["cp"], self._strip["gl"], geom=geom,
                warp_static=self._strip["static"])        # [C,3,bh,bw]
        else:
            bands = _warp_bands_global_jit(frames, self.global_maps,
                                           geom)             # [C,3,bh,bw]
        gray = rgb_to_gray_planar(bands, axis=1)
        nonblack = (jnp.max(bands, axis=1) > 0).astype(jnp.float32)
        masks = self.overlap_masks * nonblack

        chunked = getattr(cfg, "recalib_chunked", True)
        if chunked:
            # preemptible solve (cfg.recalib_chunked): one ~20 ms program
            # per camera / per seam with a completion gate between units,
            # so a live stitch loop's ~8 ms frames interleave instead of
            # waiting behind a ~128 ms detect + ~110 ms match block
            # (measured 200+ ms worst frames around installs). The gates
            # cost the solve ~12 round trips — inside the 1 s cadence.
            kp_list = []
            for i in range(c):
                k = _detect_one(gray[i], masks[i],
                                max_kp=cfg.orb_num_features,
                                num_levels=cfg.orb_num_levels,
                                scale_factor=cfg.orb_scale_factor)
                _gate(k.desc)
                kp_list.append(k)
            # the stacked-keypoint tensor only feeds the temporal term —
            # skip the per-solve stacking dispatches when it's off
            kps = (jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                          *kp_list)
                   if cfg.alphas[3] > 0.0 else None)
            sal_dev = _salience_all(bands, self.solver.N - 1,
                                    self.solver.M - 1)
            keys = jax.random.split(self._next_key(), c)
            pend = []
            for idx in range(c):
                dst = (idx - 1) % c
                one = _match_ransac_one(
                    kp_list[idx].xy, kp_list[dst].xy, kp_list[idx].desc,
                    kp_list[dst].desc, kp_list[idx].valid,
                    kp_list[dst].valid, keys[idx], cfg.lowe_ratio)
                _gate(one[3])
                pend.append(one)
            host, salience = jax.device_get((pend, sal_dev))
            p1b = [h[0] for h in host]
            p2b = [h[1] for h in host]
            okb = [h[2] for h in host]
            inlb = [h[3] for h in host]
            distb = [h[4] for h in host]
        else:
            kps = _detect_all(gray, masks, max_kp=cfg.orb_num_features,
                              num_levels=cfg.orb_num_levels,
                              scale_factor=cfg.orb_scale_factor)
            sal_dev = _salience_all(bands, self.solver.N - 1,
                                    self.solver.M - 1)

            # ALL per-pair device work (match, point gather, RANSAC) as
            # ONE vmapped program, then ONE batched fetch with the
            # salience — per-pair dispatches + per-sync fetches cost a
            # tunnel round trip each on a tunneled dev box
            keys = jax.random.split(self._next_key(), c)
            pend = _match_ransac_all_jit(kps.xy, kps.desc, kps.valid,
                                         keys, cfg.lowe_ratio)
            host, salience = jax.device_get((pend, sal_dev))
            p1b, p2b, okb, inlb, distb = host

        matches: List[Optional[CamMatches]] = []
        for idx in range(c):
            dst = (idx - 1) % c
            if dst == c - 1 and not cfg.wrap_around:
                matches.append(None)
                continue
            p1, p2, ok, inl, dist = (p1b[idx], p2b[idx], okb[idx],
                                     inlb[idx], distb[idx])
            ok = np.asarray(ok, bool)
            if ok.sum() >= 8:
                ok = ok & np.asarray(inl, bool)
            # rig sanity filters (meshwarper.cpp:930-941)
            target = self.solver.targets[idx]
            ydiff = np.abs(p1[:, 1] - p2[:, 1])
            xdev = np.abs(target - (p1[:, 0] - p2[:, 0]))
            ok = ok & (ydiff <= Y_DIFF_MAX) & (xdev <= X_DIST_SLACK)
            if ok.sum() == 0:
                matches.append(None)
                continue
            sel = np.where(ok)[0]
            # consensus trim on the (x, y) deviation from the rig target:
            # RANSAC only gates seams with >= 8 matches, so on a sparse
            # seam a single gross mismatch drags the whole mesh (measured:
            # one 194 px outlier among 4 matches warped the mesh ~150 px
            # at test scale — and with 2 outliers of 3 matches a median/MAD
            # trim keeps them). Correct matches agree with each other to
    	    # within the local parallax scale; gross mismatches scatter.
            # Keep the largest mutually-consistent cluster. Beyond the
            # reference (meshwarper.cpp:930-941 stops at the fixed
            # X_DIST_SLACK), which ships the outliers into the solve.
            xdev_s = (p1[sel, 0] - p2[sel, 0]) - target
            ydev_s = p1[sel, 1] - p2[sel, 1]
            tol = max(15.0, 0.02 * self.solver.bw)
            dd = (np.abs(xdev_s[:, None] - xdev_s[None, :])
                  + np.abs(ydev_s[:, None] - ydev_s[None, :]))
            support = (dd <= tol).sum(1)
            if support.max() < 2:
                # a lone match corroborates nothing — one gross mismatch
                # with alpha_local=1 drags the seam's mesh by its full
                # error (measured 168 px); the global term holds the seam
                # at rest instead
                matches.append(None)
                continue
            sel = sel[dd[np.argmax(support)] <= tol]
            order = np.argsort(dist[sel])[:cfg.max_features_per_image]
            sel = sel[order]
            matches.append(CamMatches(p1=p1[sel], p2=p2[sel],
                                      dst=(idx - 1) % c))

        if all(m is None for m in matches):
            return None

        # temporal same-camera matches vs the previous recalibration's
        # keypoints (featurefinder.cpp:110-170); off unless alphas[3] > 0
        temporal: List[Optional[TemporalMatches]] = [None] * c
        if cfg.alphas[3] > 0.0 and self._prev_kps is not None:
            pk = self._prev_kps
            for idx in range(c):
                m = self._match(kps.desc[idx], pk["desc"][idx],
                                kps.valid[idx], pk["valid"][idx],
                                cfg.lowe_ratio)
                ok = np.asarray(m.valid)
                if ok.sum() == 0:
                    continue
                pt = np.asarray(kps.xy[idx])[np.asarray(m.query)[ok]]
                pp = pk["xy"][idx][np.asarray(m.train)[ok]]
                # tracked points must barely move between frames
                near = np.hypot(*(pt - pp).T) <= Y_DIFF_MAX
                if near.sum():
                    temporal[idx] = TemporalMatches(pt=pt[near], pp=pp[near])
        if cfg.alphas[3] > 0.0:
            self._prev_kps = {"desc": np.asarray(kps.desc),
                              "valid": np.asarray(kps.valid),
                              "xy": np.asarray(kps.xy)}

        verts = self.solver.solve(matches, temporal=temporal,
                                  salience=salience)
        if cfg.visualize_matches or cfg.visualize_mesh:
            self._dump_viz(bands, matches, verts)
        # verts is host numpy (the CPW solve runs on host) — hand it
        # straight to the host coarse inversion. The ~400 KB coarse
        # backward displacement is the return value: the caller composes
        # it with the analytic band map in ONE gather-free device
        # program (compose_fused_maps_from_disp), so the dense mesh map
        # is never materialized on the rewarp path.
        return coarse_backward_disp(verts, geom.layout.band_h,
                                    geom.layout.band_w)

    def _dump_viz(self, bands, matches, verts):
        """Write match / mesh debug images for this recalibration
        (VISUALIZE_MATCHES / VISUALIZE_WARPED toggles, defs.h:62-64 /
        meshwarper.cpp:159-171,788-807). Debug-only: downloads the band
        tensor."""
        import os
        from video_stitcher_tpu.utils import viz
        cfg = self.cfg
        os.makedirs(cfg.viz_dir, exist_ok=True)
        self._viz_seq = getattr(self, "_viz_seq", -1) + 1
        imgs = np.asarray(bands)                  # [C, 3, bh, bw]
        for i, m in enumerate(matches):
            if cfg.visualize_matches and m is not None:
                pairs = np.stack([np.arange(len(m.p1))] * 2, axis=1)
                img = viz.draw_matches(imgs[i], m.p1, imgs[m.dst], m.p2,
                                       pairs)
                viz.save(os.path.join(
                    cfg.viz_dir,
                    f"matches_{self._viz_seq:03d}_{i}to{m.dst}.png"), img)
            if cfg.visualize_mesh:
                img = viz.draw_mesh(imgs[i], verts[i])
                viz.save(os.path.join(
                    cfg.viz_dir,
                    f"mesh_{self._viz_seq:03d}_{i}.png"), img)


def solve_mesh_maps(frames, stitcher):
    """Entry used by Stitcher.recalibrate_mesh; lazily builds the pipeline."""
    if getattr(stitcher, "_mesh_pipe", None) is None:
        from video_stitcher_tpu.calib.calibration import \
            compose_fused_maps_device
        geom = stitcher.geom
        global_maps = compose_fused_maps_device(
            jnp.asarray(stitcher.aux["band_maps"]), None, geom=geom)
        stitcher._mesh_pipe = MeshPipeline(
            geom, global_maps, stitcher.aux["overlap_masks"], stitcher.cfg)
    return stitcher._mesh_pipe.run(frames)
