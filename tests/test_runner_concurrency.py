"""Live-runner concurrency: the stitch loop runs WHILE the recalibration
thread re-solves the mesh and hot-swaps (statics, program, state) — the
race the reference guards with mesh mutexes (timed.cpp:98-103) and this
build guards with the atomic swap under Stitcher._swap_lock
(stitcher.py recalibrate_mesh/swap_state). Exercises the
RECALIB_INTERP animation path too (timed.cpp:452-459).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from video_stitcher_tpu.config import StitcherConfig
from video_stitcher_tpu.pipeline.runner import Runner
from video_stitcher_tpu.pipeline.stitcher import Stitcher


def test_runner_recalib_swap_concurrency(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = StitcherConfig(num_images=6, input_width=320, input_height=180,
                         recalibrate=True, enable_local=True,
                         recalib_interp=True, recalib_del_ms=100,
                         visualize_matches=True, visualize_mesh=True,
                         viz_dir=str(tmp_path / "viz"))

    runner_box = []
    installs = []          # frames_done at each successful mesh install
    interp_swaps = []

    orig_recal = Stitcher.recalibrate_mesh
    orig_swap = Stitcher.swap_state

    def counting_recal(self, frames):
        ok = orig_recal(self, frames)
        if ok and runner_box:
            installs.append(runner_box[0].frames_done)
        return ok

    def counting_swap(self, state):
        interp_swaps.append(1)
        out = orig_swap(self, state)
        # Event-driven stop: end the run once a mesh install landed while
        # frames were flowing AND the interp animation published at least
        # two states. A fixed frame count races the recalib thread under
        # full-suite CPU load (the frames can finish first); the
        # max_frames=600 cap below only bounds the failure mode.
        if (runner_box and len(interp_swaps) >= 2
                and any(fd >= 1 for fd in installs)):
            runner_box[0]._stop.set()
        return out

    monkeypatch.setattr(Stitcher, "recalibrate_mesh", counting_recal)
    monkeypatch.setattr(Stitcher, "swap_state", counting_swap)

    r = Runner(cfg, max_frames=600)
    runner_box.append(r)
    r.run()

    assert 1 <= r.frames_done <= 600
    # at least one mesh was re-solved and installed while frames flowed
    assert any(fd >= 1 for fd in installs), installs
    # the interp animation published intermediate states
    assert len(interp_swaps) >= 2, len(interp_swaps)
    # and the output stayed sane: the consumer wrote the first frame
    assert os.path.exists(os.path.join(tmp_path, "result.jpg"))
    # viz toggles dumped match + mesh debug images (defs.h:62-64 parity)
    dumped = os.listdir(tmp_path / "viz")
    assert any(f.startswith("matches_") for f in dumped), dumped
    assert any(f.startswith("mesh_") for f in dumped), dumped
