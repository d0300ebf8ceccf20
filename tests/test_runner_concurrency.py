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
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from video_stitcher_tpu.config import StitcherConfig
from video_stitcher_tpu.pipeline.runner import Runner
from video_stitcher_tpu.pipeline.stitcher import Stitcher


@pytest.mark.parametrize("mode", ["inline", "threaded"])
def test_runner_recalib_swap_concurrency(tmp_path, monkeypatch, mode):
    monkeypatch.chdir(tmp_path)
    cfg = StitcherConfig(num_images=6, input_width=320, input_height=180,
                         recalibrate=True, enable_local=True,
                         recalib_interp=True, recalib_del_ms=100,
                         visualize_matches=True, visualize_mesh=True,
                         pipeline_mode=mode,
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


def test_shutdown_during_midflight_recalib_solve(tmp_path, monkeypatch):
    """stop() while a recalibration solve is in flight: the runner must
    join cleanly (no exception surfacing, no hung thread) even though the
    solve completes after the stop was requested."""
    import threading
    import time

    monkeypatch.chdir(tmp_path)
    # same shapes as the swap test above: every program hits the
    # persistent compile cache (this box has ONE core; fresh shapes cost
    # minutes of XLA compiles per scenario)
    cfg = StitcherConfig(num_images=6, input_width=320, input_height=180,
                         recalibrate=True, enable_local=True,
                         recalib_del_ms=50)

    solving = threading.Event()
    orig_recal = Stitcher.recalibrate_mesh
    calls = []

    def slow_recal(self, frames):
        # the initial in-calibrate solve runs before the runner loop;
        # only the recalib THREAD's solves should dawdle
        if calls:
            solving.set()
            time.sleep(0.8)
        calls.append(1)
        return orig_recal(self, frames)

    monkeypatch.setattr(Stitcher, "recalibrate_mesh", slow_recal)

    r = Runner(cfg, max_frames=10_000)
    box = {}

    def drive():
        r.run()
        box["done"] = True

    t = threading.Thread(target=drive)
    t.start()
    assert solving.wait(timeout=180), "recalib thread never started a solve"
    r._stop.set()                      # stop request lands mid-solve
    t.join(timeout=60)
    assert box.get("done"), "runner did not shut down cleanly"
    assert r.frames_done >= 1


def test_source_eof_during_interp_animation(tmp_path, monkeypatch):
    """The source hits EOF while a RECALIB_INTERP animation is publishing
    intermediate states: the animation must be interrupted by shutdown and
    the runner must exit cleanly."""
    import threading
    import time

    monkeypatch.chdir(tmp_path)
    cfg = StitcherConfig(num_images=6, input_width=320, input_height=180,
                         recalibrate=True, enable_local=True,
                         recalib_interp=True, recalib_del_ms=50)

    eof = threading.Event()
    interp_started = threading.Event()
    orig_swap = Stitcher.swap_state

    def eof_on_swap(self, state):
        interp_started.set()
        eof.set()                       # source dries up mid-animation
        time.sleep(0.05)                # let EOF reach the main loop
        return orig_swap(self, state)

    monkeypatch.setattr(Stitcher, "swap_state", eof_on_swap)

    from video_stitcher_tpu.io_plane.video import SyntheticRigSource
    from video_stitcher_tpu.calib.calibration import plan_geometry
    geom, _ = plan_geometry(cfg)
    inner = SyntheticRigSource(cfg, geom)

    class EofSource:
        def get_frames(self):
            if eof.is_set():
                return None
            return inner.get_frames()

        def release(self):
            inner.release()

    r = Runner(cfg, source=EofSource(), max_frames=10_000)
    box = {}

    def drive():
        r.run()
        box["done"] = True

    t = threading.Thread(target=drive)
    t.start()
    t.join(timeout=240)
    assert box.get("done"), "runner hung after EOF during interp animation"
    assert interp_started.is_set()
    assert r.frames_done >= 1


def test_recalib_deadline_cadence():
    """The recalibration loop is deadline-based (VERDICT r2 #3): the wait
    deducts the solve time, so the effective period is ~max(period, solve),
    NOT period + solve (the reference waits RECALIB_DEL *then* solves,
    defs.h:48 / timed.cpp:414-463 — same flaw this loop fixes). Drives
    _recalib_loop directly with a stubbed solve; no device work."""
    import threading
    import time

    def run_loop(period_s, solve_s, n_solves):
        cfg = StitcherConfig(num_images=6, input_width=320, input_height=180,
                             recalibrate=True, enable_local=True,
                             recalib_interp=False,
                             recalib_del_ms=int(period_s * 1000))
        r = Runner(cfg)
        r._latest_frames = np.zeros((1,), np.uint8)   # loop needs frames

        def fake_solve(frames):
            time.sleep(solve_s)
            return True

        r.stitcher.recalibrate_mesh = fake_solve
        t = threading.Thread(target=r._recalib_loop)
        t.start()
        deadline = time.monotonic() + 30
        while len(r.recalib_ts) < n_solves and time.monotonic() < deadline:
            time.sleep(0.02)
        r._stop.set()
        t.join(timeout=10)
        assert not t.is_alive()
        assert len(r.recalib_ts) >= n_solves, len(r.recalib_ts)
        gaps = np.diff(np.array(r.recalib_ts[:n_solves]))
        return float(np.median(gaps))

    # solve < period: cadence ~= period (the old wait-then-solve behavior
    # would give period + solve = 0.60 s; generous bounds for a loaded box)
    med = run_loop(period_s=0.45, solve_s=0.15, n_solves=5)
    assert 0.38 <= med <= 0.58, med

    # solve > period: overruns skip missed slots and resolve promptly —
    # cadence ~= solve, never solve + period (0.70) or a catch-up pileup
    med = run_loop(period_s=0.20, solve_s=0.50, n_solves=4)
    assert 0.45 <= med <= 0.68, med


def test_egress_reconnect_racing_close():
    """A flaky player kills every connection after a few bytes, driving
    send_frame into its reconnect path, while close() lands from another
    thread: the sender must terminate promptly (RuntimeError from the
    closed egress) instead of reconnecting forever or deadlocking."""
    import socket
    import struct
    import threading
    import time

    import numpy as np
    from video_stitcher_tpu.io_plane.egress import PlayerEgress

    port = 15597
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", port))
    server.listen(4)
    stop_srv = threading.Event()

    def flaky_player():
        while not stop_srv.is_set():
            try:
                server.settimeout(0.5)
                conn, _ = server.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            try:
                conn.recv(64)           # height prelude + a few bytes
            except OSError:
                pass
            conn.close()                # kill it -> egress reconnects

    srv_t = threading.Thread(target=flaky_player)
    srv_t.start()

    cfg = StitcherConfig(player_address="127.0.0.1", player_tcp_port=port,
                         send_results=True)
    eg = PlayerEgress(cfg, encoder="mjpeg")
    frame = np.zeros((64, 96, 3), np.uint8)
    outcome = {}

    def sender():
        sent = 0
        try:
            while sent < 10_000:
                try:
                    eg.send_frame(frame)
                    sent += 1
                except OSError:
                    time.sleep(0.01)    # transient: retry like the consumer
        except RuntimeError as e:
            outcome["stopped"] = str(e)
        outcome["sent"] = sent

    snd_t = threading.Thread(target=sender)
    snd_t.start()
    time.sleep(0.5)                     # let reconnect churn happen
    eg.close()                          # race the reconnect loop
    snd_t.join(timeout=15)
    stop_srv.set()
    server.close()
    srv_t.join(timeout=5)
    assert not snd_t.is_alive(), "sender hung after egress close"
    assert outcome.get("stopped") == "egress closed", outcome


def test_runner_shallow_queue_latency_mode(tmp_path, monkeypatch):
    """staging_depth=1 + results_max_size=1 is the latency-critical
    configuration (bench.py's runner latency phase): at most one staged
    frame set and one undelivered result are ever in flight, so a frame's
    staged->done latency measures the product, not queue occupancy.
    Verifies the knob reaches the queue and the run completes — in both
    pipeline modes (the inline loop's ring depth is results_max_size)."""
    import dataclasses
    monkeypatch.chdir(tmp_path)
    base = StitcherConfig(num_images=6, input_width=320, input_height=180,
                          recalibrate=False, enable_local=False)
    cfg = dataclasses.replace(base, results_max_size=1, clear_buffers=False,
                              pipeline_mode="threaded")
    r = Runner(cfg, max_frames=6, consume_device=True,
               collect_latency=True, staging_depth=1)
    r.run()
    assert r._staged.max_size == 1
    assert r.frames_done == 6
    assert len(r.latencies) >= 5 and all(l > 0 for l in r.latencies)

    cfg2 = dataclasses.replace(base, results_max_size=1,
                               pipeline_mode="inline")
    r2 = Runner(cfg2, max_frames=6, consume_device=True,
                collect_latency=True)
    r2.run()
    assert r2.frames_done == 6
    assert len(r2.latencies) == 6 and all(l > 0 for l in r2.latencies)
