#!/usr/bin/env python
"""Per-op performance suite (the reference's cv ts-perf harness analog,
sources/modules/*/perf/). Times every hot op on the current default device
with honest sync (a small D2H read closes each measurement — the axon
tunnel's block_until_ready is unreliable) and prints one JSON line per op.

Run: python tools/perf_suite.py [--iters 8]
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[:4])


def timeit(fn, *args, iters=8, name="", meta=None):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    rec = {"op": name, "ms": round(ms, 2)}
    if meta:
        rec.update(meta)
    print(json.dumps(rec))
    return ms


def _enable_compile_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/video_stitcher_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None):
    _enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args(argv)
    it = args.iters

    import jax
    import jax.numpy as jnp
    from video_stitcher_tpu.config import StitcherConfig
    from video_stitcher_tpu import Stitcher
    from video_stitcher_tpu.pipeline.stitcher import (
        warp_bands, blend_pack, output_frame)
    from video_stitcher_tpu.ops.pyramid import pyr_down, pyr_up
    from video_stitcher_tpu.ops.resize import resize_planar
    from video_stitcher_tpu.ops.remap_strips import prep_source_nv12

    print(json.dumps({"device": str(jax.devices()[0])}))
    # each timeit closes with one D2H sync; on the tunneled dev TPU that
    # round trip is ~25-40 ms and inflates every op by sync_ms/iters —
    # measured and printed here so readers can subtract it
    z = jax.jit(lambda x: x + 1)(jnp.zeros((4,), jnp.float32))
    _sync(z)
    t0 = time.perf_counter()
    _sync(z)
    print(json.dumps({"sync_round_trip_ms":
                      round((time.perf_counter() - t0) * 1e3, 1),
                      "per_op_inflation_ms":
                      round((time.perf_counter() - t0) * 1e3 / it, 2)}))
    cfg = StitcherConfig(num_images=6, input_width=1920, input_height=1080,
                         enable_local=False, recalibrate=False)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (6, 1080, 1920, 3)).astype(np.uint8)
    st = Stitcher(cfg)
    st.calibrate(frames)
    state = st.state
    geom = st.geom
    fj = jax.device_put(frames)
    _sync(fj)

    lay = geom.layout

    # --- roofline denominators (v5e: ~819 GB/s HBM, ~197 bf16 TFLOP/s;
    # other generations differ — the % numbers are v5e-relative) ---
    HBM_GBPS, PEAK_TFLOPS = 819.0, 197.0
    n = cfg.num_images
    bh, bw = lay.band_h, lay.band_w

    warp_j = jax.jit(functools.partial(
        warp_bands, geom=geom, warp_static=st._warp_static))
    bands = warp_j(fj, state)
    _sync(bands)
    # HBM bytes per warp dispatch (resident-source mode): each camera's
    # bf16 source read once + f32 maps_lane read + f32 band output write.
    src_b = n * 3 * geom.warp_src_h * ((geom.warp_src_w + 127) // 128 * 128) * 2
    maps_b = int(np.prod(state.warp_maps_lane.shape)) * 4 \
        if state.warp_maps_lane is not None else n * 2 * bh * bw * 4
    out_b = n * 3 * bh * bw * 4
    warp_bytes = src_b + maps_b + out_b
    # MXU work: every output px is two 8x8(x128-lane) tent matmuls
    warp_flops = 2 * 2 * 8 * n * 3 * bh * bw
    ms = timeit(warp_j, fj, state, iters=it, name="warp_bands",
                meta={"path": "pallas" if st._warp_static else "gather",
                      "shape": "6x1080p->6x%dx%d" % (bh, bw),
                      "hbm_gb": round(warp_bytes / 1e9, 3)})
    print(json.dumps({"op": "warp_bands.roofline",
                      "achieved_gbps": round(warp_bytes / 1e6 / ms, 1),
                      "hbm_pct": round(warp_bytes / 1e6 / ms / HBM_GBPS
                                       * 100, 1),
                      "mxu_tflops": round(warp_flops / 1e9 / ms, 2),
                      "bound": "bandwidth"}))

    blend_j = jax.jit(functools.partial(blend_pack, geom=geom))
    pano = blend_j(bands, state)
    _sync(pano)
    # blend bytes: per level, read bands+weights, write accumulators;
    # geometric series over levels ~4/3 of L0 for each tensor touched
    lvl_series = sum(0.25 ** l for l in range(geom.num_bands + 1))
    # element size follows the blend storage mode ("bf16" halves traffic;
    # the f32 band input read is counted at its real width)
    el = 2 if geom.blend_precision == "bf16" else 4
    blend_bytes = int((n * 3 * bh * bw * (4 + el * 2)   # lap build (r+w+r)
                       + n * 3 * bh * bw * el * 2       # weight mul + place
                       + 3 * lay.pano_h * lay.pano_w * el * 2) * lvl_series)
    # pyramid convs as banded matmuls: 5-tap separable over rows+cols
    blend_flops = int(2 * 5 * 2 * n * 3 * bh * bw * lvl_series * 3)
    ms = timeit(blend_j, bands, state, iters=it, name="blend_pack",
                meta={"bands": geom.num_bands,
                      "hbm_gb": round(blend_bytes / 1e9, 3)})
    print(json.dumps({"op": "blend_pack.roofline",
                      "achieved_gbps": round(blend_bytes / 1e6 / ms, 1),
                      "hbm_pct": round(blend_bytes / 1e6 / ms / HBM_GBPS
                                       * 100, 1),
                      "mxu_tflops": round(blend_flops / 1e9 / ms, 2),
                      "mxu_pct": round(blend_flops / 1e9 / ms
                                       / PEAK_TFLOPS * 100, 1)}))

    out_j = jax.jit(functools.partial(output_frame, out_h=1052, out_w=4096))
    timeit(out_j, pano, iters=it, name="output_resize_4k")

    x = jax.device_put(jnp.asarray(
        rng.random((6, 3, 1280, 1664)).astype(np.float32)))
    _sync(x)
    timeit(jax.jit(pyr_down), x, iters=it, name="pyr_down_L0")
    small = jax.jit(pyr_down)(x)
    timeit(jax.jit(lambda a: pyr_up(a, 1280, 1664)), small, iters=it,
           name="pyr_up_L0")
    timeit(jax.jit(lambda a: resize_planar(a, 640, 832)), x, iters=it,
           name="resize_half")

    nv = jax.device_put(rng.integers(0, 255, (6, 1620, 1920)).astype(np.uint8))
    _sync(nv)
    timeit(jax.jit(prep_source_nv12), nv, iters=it, name="nv12_to_planar")

    def step(f):
        return blend_j(warp_j(f, state), state)
    timeit(step, fj, iters=it, name="full_step",
           meta={"programs": 2})

    # --- 1-device-mesh sharded strip-warp parity (reproduces the
    # "sharded strip kernel on hardware" claim on whatever device this
    # suite runs on: the SAME shard_map + Pallas program multichip uses,
    # checked bit-wise against the single-chip step) ---
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from video_stitcher_tpu.parallel.shard import (
        build_sharded_step, pad_cameras, shard_state)
    mesh = Mesh(np.array(jax.devices()[:1]), ("cam",))
    state_sh, corners, total = shard_state(state, geom, mesh)
    f_sh = jax.device_put(pad_cameras(frames, total),
                          NamedSharding(mesh, P("cam")))
    sstep = build_sharded_step(geom, mesh, total_cams=total,
                               warp_static=st._warp_static)
    pano_sh = np.asarray(sstep(f_sh, state_sh, corners))
    ref = np.asarray(pano)
    diff = int(np.abs(pano_sh.astype(np.int32) - ref.astype(np.int32)).max())
    timeit(sstep, f_sh, state_sh, corners, iters=it,
           name="sharded_step_1dev",
           meta={"path": "pallas" if st._warp_static else "gather",
                 "max_diff_vs_single": diff})
    # bf16-stored blend: the sharded psum of bf16 weighted pyramids sums
    # in a different order than the single-chip static adds, so a few
    # u8 steps of rounding divergence are expected — gate at the
    # reference's own CUDA-vs-CPU bound (test_blenders.cuda.cpp:95)
    assert diff <= 3, f"sharded strip warp mismatch on-device: {diff}"

    # --- ICI communication accounting (camera-sharded multichip; see
    # PARALLEL.md for the model). The only collective in the sharded step
    # is one psum per pyramid level of a [3, ph, pw] tensor (bf16 when
    # blend_precision == "bf16"). A psum lowers to reduce-scatter +
    # all-gather: each chip moves 2*(N-1)/N * bytes over ICI. ---
    el_ici = 2 if geom.blend_precision == "bf16" else 4
    per_level = [3 * (lay.pano_h >> l) * (lay.pano_w >> l) * el_ici
                 for l in range(geom.num_bands + 1)]
    psum_mb = sum(per_level) / 1e6
    ICI_GBPS = 100.0          # v5e per-chip ICI (~1.6 Tbps bidir aggregate)
    step_ms = ms              # full_step single-chip from above
    proj = {}
    for nd in (2, 4, 8):
        ici_ms = 2 * (nd - 1) / nd * psum_mb / 1e3 / ICI_GBPS * 1e3
        # per-chip compute shrinks with the camera shard; the blend
        # collapse after the psum is replicated (unsharded tail ~20%)
        compute_ms = step_ms * (0.8 / nd + 0.2)
        proj[f"x{nd}"] = round(compute_ms + ici_ms, 2)
    print(json.dumps({
        "op": "ici_accounting",
        "psum_mb_per_step": round(psum_mb, 1),
        "psum_mb_per_level": [round(b / 1e6, 2) for b in per_level],
        "ici_gbps_assumed": ICI_GBPS,
        "projected_step_ms": proj,
        "model": "PARALLEL.md",
    }))


if __name__ == "__main__":
    main()
