"""Calibration state: an explicit, serializable pytree.

The reference keeps calibration artifacts scattered across GpuMats, globals
and mutexed vectors (x_maps/y_maps/x_mesh/y_mesh/gains/weight pyramids,
360_stitcher/timed.cpp:511-530) and never persists them. Here everything the
online loop needs is one NamedTuple of arrays — hot-swapping a new mesh is an
atomic pytree replacement (vs the reference's mesh mutexes,
timed.cpp:98-103), and the whole thing checkpoints to a single .npz.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from video_stitcher_tpu.ops.remap_strips import groups_from_packed


class CalibState(NamedTuple):
    #: f32 [N, 2, bandH, bandW] — fused backward maps (full-res source px
    #: coords per band output px): compose-resize ∘ global warp ∘ CPW mesh.
    #: Padded to the Pallas tile grid when the strip-warp path is active.
    fused_maps: jnp.ndarray
    #: f32 [N] — per-camera gains (exposure_compensate.cpp:125-150).
    gains: jnp.ndarray
    #: tuple of f32 [N, 1, h_l, w_l] — pre-normalized weight pyramids.
    weight_pyr: Tuple[jnp.ndarray, ...]
    #: f32 [pano_h, pano_w] — 1 where any camera contributes.
    valid_mask: jnp.ndarray
    #: i32 [N, nrb] — strip row offsets for the Pallas warp (None on the
    #: XLA-gather fallback path). See ops/remap_strips.plan_strips.
    warp_strip_off: jnp.ndarray | None = None
    #: i32 [N, nrb, ncc] — packed per-chunk window offsets (None = gather).
    warp_chunk_packed: jnp.ndarray | None = None
    #: f32 [N, nrb, 2, ncc*256] — chunk-lane-major repack of fused_maps for
    #: the Pallas warp (ops/remap_strips.repack_maps_lane; None = gather).
    warp_maps_lane: jnp.ndarray | None = None
    #: i32 [N, nrb, ncc//4 + 1] — compacted active-group lists per
    #: row-block ([..., 0] = count) driving the kernel's branch-free loop.
    warp_groups: jnp.ndarray | None = None


def save_state(path: str, state: CalibState, extra: dict | None = None) -> None:
    data = {
        "fused_maps": np.asarray(state.fused_maps),
        "gains": np.asarray(state.gains),
        "valid_mask": np.asarray(state.valid_mask),
        "n_levels": np.int64(len(state.weight_pyr)),
    }
    for i, w in enumerate(state.weight_pyr):
        data[f"weight_pyr_{i}"] = np.asarray(w)
    # the strip-plan artifacts (warp_strip_off / chunk_packed / groups /
    # maps_lane) are NOT persisted: warp_maps_lane is a pure repack of
    # fused_maps (the largest tensor — saving it doubled the .npz and
    # pulled a second full D2H copy at save time) and the only load path
    # (Stitcher.load_calibration -> _plan_warp) unconditionally rebuilds
    # all four from fused_maps anyway. load_state still READS them from
    # older checkpoints for compatibility.
    if extra:
        for k, v in extra.items():
            data["extra_" + k] = v
    np.savez_compressed(path, **data)


def load_state(path: str) -> CalibState:
    z = np.load(path)
    n = int(z["n_levels"])
    return CalibState(
        fused_maps=jnp.asarray(z["fused_maps"]),
        gains=jnp.asarray(z["gains"]),
        weight_pyr=tuple(jnp.asarray(z[f"weight_pyr_{i}"]) for i in range(n)),
        valid_mask=jnp.asarray(z["valid_mask"]),
        warp_strip_off=(jnp.asarray(z["warp_strip_off"])
                        if "warp_strip_off" in z else None),
        warp_chunk_packed=(jnp.asarray(z["warp_chunk_packed"])
                           if "warp_chunk_packed" in z else None),
        warp_maps_lane=(jnp.asarray(z["warp_maps_lane"])
                        if "warp_maps_lane" in z else None),
        warp_groups=(jnp.asarray(z["warp_groups"]) if "warp_groups" in z
                     else (jnp.asarray(groups_from_packed(
                         np.asarray(z["warp_chunk_packed"])))
                         if "warp_chunk_packed" in z else None)),
    )
