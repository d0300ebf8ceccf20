"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_stitcher_tpu.config import StitcherConfig
from video_stitcher_tpu import Stitcher
from video_stitcher_tpu.parallel.shard import (
    build_sharded_step, shard_state, pad_cameras,
)


@pytest.fixture(scope="module")
def small():
    cfg = StitcherConfig(num_images=6, input_width=96, input_height=54,
                         enable_local=False, recalibrate=False)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (6, 54, 96, 3)).astype(np.uint8)
    st = Stitcher(cfg)
    st.calibrate(frames)
    return st, frames


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_matches_single_chip(small, n_dev):
    st, frames = small
    devices = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devices, axis_names=("cam",))
    state_sh, corners, total = shard_state(st.state, st.geom, mesh)
    frames_sh = jax.device_put(pad_cameras(frames, total),
                               NamedSharding(mesh, P("cam")))
    step = build_sharded_step(st.geom, mesh)
    pano = np.asarray(step(frames_sh, state_sh, corners))
    ref = st.stitch(frames)
    diff = np.abs(pano.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1


def test_camera_shards_production_path(small):
    """cfg.camera_shards drives the Stitcher itself (the Runner's path):
    mesh built, state sharded at install, stitch/stitch_out dispatch the
    sharded programs, staging places frames with the cam sharding."""
    import dataclasses
    st1, frames = small
    cfg = dataclasses.replace(st1.cfg, camera_shards=4)
    st = Stitcher(cfg)
    st.calibrate(frames)
    assert st._shard is not None and st._shard["mesh"].size == 4
    pano = st.stitch(frames)
    ref = st1.stitch(frames)
    diff = np.abs(pano.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1
    # fused sharded output program + staging placement
    staged = st.stage_frames(frames)
    assert staged.shape[0] == st._shard["total"]
    out = np.asarray(st.stitch_out(staged))
    oh, ow = st._out_size()
    assert out.shape == (oh, ow, 3)
    ref_out = np.asarray(st1.stitch_out(frames))
    diff = np.abs(out.astype(np.int32) - ref_out.astype(np.int32))
    assert diff.max() <= 1


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_shard_state_threads_strip_plan():
    """When the state carries a strip-warp plan, shard_state must shard it
    with the cameras and pad extra cameras with the kernel's skip flags
    (negative strip_off / chunk_packed)."""
    from video_stitcher_tpu.calib.state import CalibState

    n, nrb, ncc = 6, 4, 8
    state = CalibState(
        fused_maps=jnp.zeros((n, 2, 32, 256), jnp.float32),
        gains=jnp.ones((n,), jnp.float32),
        weight_pyr=(jnp.zeros((n, 1, 32, 256), jnp.float32),),
        valid_mask=jnp.zeros((32, 1024), jnp.float32),
        warp_strip_off=jnp.zeros((n, nrb), jnp.int32),
        warp_chunk_packed=jnp.zeros((n, nrb, ncc), jnp.int32),
        warp_maps_lane=jnp.zeros((n, nrb, 2, ncc * 256), jnp.float32),
        warp_groups=jnp.ones((n, nrb, ncc // 4 + 1), jnp.int32),
    )

    class GeomStub:
        class layout:
            corners = tuple(range(n))
    mesh = Mesh(np.array(jax.devices()[:4]), ("cam",))
    sh_state, corners, total = shard_state(state, GeomStub, mesh)
    assert total == 8 and sh_state.warp_strip_off.shape[0] == 8
    assert (np.asarray(sh_state.warp_strip_off[n:]) == -8).all()
    assert (np.asarray(sh_state.warp_chunk_packed[n:]) == -1).all()
    assert sh_state.warp_maps_lane.shape == (8, nrb, 2, ncc * 256)
    # padded cameras' compacted group lists carry zero counts
    assert (np.asarray(sh_state.warp_groups[n:]) == 0).all()
