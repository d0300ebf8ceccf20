"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
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


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
