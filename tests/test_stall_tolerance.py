"""A wedged host<->device link must produce logged drops, not a frozen
process (VERDICT r4 #2): the Runner's completion sync, output download,
and frame staging each carry a cfg.sync_timeout_ms deadline
(utils/devsync) — the TPU-plane analog of the reference ingest's
3-failed-recv client drop (networking.cpp:29-37)."""

import time

import numpy as np
import pytest

from video_stitcher_tpu.utils import devsync


# --- devsync unit ----------------------------------------------------

def test_call_deadline_passthrough():
    assert devsync.call_deadline(lambda: 42, 1.0) == 42
    with pytest.raises(ValueError):
        devsync.call_deadline(lambda: (_ for _ in ()).throw(ValueError("x")),
                              1.0)


def test_call_deadline_stall_raises_and_drains():
    t0 = time.perf_counter()
    with pytest.raises(devsync.StallError):
        devsync.call_deadline(lambda: time.sleep(1.5), 0.1)
    assert time.perf_counter() - t0 < 1.0       # did not wait the sleep out
    assert devsync.stalled_workers() >= 1
    # the abandoned worker eventually finishes and the count drains
    deadline = time.monotonic() + 5.0
    while devsync.stalled_workers() > 0 and time.monotonic() < deadline:
        time.sleep(0.05)
    assert devsync.stalled_workers() == 0


def test_call_deadline_fail_fast_when_wedged(monkeypatch):
    monkeypatch.setattr(devsync, "MAX_STALLED", 1)
    with pytest.raises(devsync.StallError):
        devsync.call_deadline(lambda: time.sleep(1.0), 0.05)
    # link considered wedged: next bounded call fails immediately,
    # without spawning another worker
    t0 = time.perf_counter()
    with pytest.raises(devsync.StallError):
        devsync.call_deadline(lambda: 1, 10.0)
    assert time.perf_counter() - t0 < 0.5
    time.sleep(1.2)                              # drain for other tests
    assert devsync.stalled_workers() == 0


def test_worker_pool_reuses_threads():
    """Healthy calls must recycle workers: the hot loop makes ~3 bounded
    syncs per frame at 137 fps, so per-call thread construction would
    tax the 1-core deployment host (review r5). Also checks concurrent
    callers each get their own worker and correct results."""
    import threading
    for _ in range(5):                       # warm the pool
        devsync.call_deadline(lambda: 1, 1.0)
    before = threading.active_count()
    for i in range(50):
        assert devsync.call_deadline(lambda i=i: i * 2, 1.0) == i * 2
    assert threading.active_count() <= before + 1   # no per-call threads

    results = []
    def caller(k):
        results.append(devsync.call_deadline(
            lambda: (time.sleep(0.05), k)[1], 2.0))
    ts = [threading.Thread(target=caller, args=(k,)) for k in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(results) == list(range(8))

    # a stalled worker is abandoned, never recycled: after the stall
    # drains, healthy calls still work
    with pytest.raises(devsync.StallError):
        devsync.call_deadline(lambda: time.sleep(0.8), 0.05)
    assert devsync.call_deadline(lambda: "after", 1.0) == "after"
    time.sleep(1.0)
    assert devsync.stalled_workers() == 0


def test_zero_timeout_disables():
    assert devsync.call_deadline(lambda: "ok", 0) == "ok"


def test_read_head_on_numpy_like():
    class Arr:
        def ravel(self):
            return np.arange(16.0)
    assert devsync.read_head(Arr(), 1.0).tolist() == [0.0, 1.0, 2.0, 3.0]


# --- Runner integration ----------------------------------------------

class _StallArray:
    """Duck-typed device array whose host read blocks for `delay` s."""

    def __init__(self, delay=0.0):
        self.delay = delay

    def ravel(self):
        return self

    def __getitem__(self, sl):
        return self

    def __array__(self, dtype=None, copy=None):
        if self.delay:
            time.sleep(self.delay)
        return np.zeros(4, np.uint8)


class _FakeStitcher:
    """Minimal Stitcher surface for the Runner loop: every Nth frame's
    output array stalls on sync (a wedged D2H), or every Nth staging
    stalls (a wedged H2D)."""

    def __init__(self, stall_frames=(), stall_stage=(), delay=3.0):
        self.state = object()                  # "pre-calibrated"
        self.n_staged = 0
        self.n_stitched = 0
        self.stall_frames = set(stall_frames)
        self.stall_stage = set(stall_stage)
        self.delay = delay

    def stage_frames(self, frames):
        i = self.n_staged
        self.n_staged += 1
        if i in self.stall_stage:
            time.sleep(self.delay)
        return frames

    def stitch_out(self, dev, device=False):
        i = self.n_stitched
        self.n_stitched += 1
        return _StallArray(self.delay if i in self.stall_frames else 0.0)

    def finalize_out(self, frame):
        return np.asarray(frame)


class _Source:
    def __init__(self, n):
        self.left = n
        self.frames = np.zeros((2, 6, 8, 3), np.uint8)

    def get_frames(self):
        if self.left <= 0:
            return None
        self.left -= 1
        return self.frames

    def release(self):
        pass


def _run(cfg_kw, **fake_kw):
    from video_stitcher_tpu.config import StitcherConfig
    from video_stitcher_tpu.pipeline.runner import Runner
    cfg_kw = {"sync_timeout_ms": 200.0, **cfg_kw}
    cfg = StitcherConfig(num_images=2, input_width=8, input_height=6,
                         enable_local=False, recalibrate=False,
                         results_max_size=1, **cfg_kw)
    fake = _FakeStitcher(**fake_kw)
    # 9 source frames: run() reads one up front (the calibration frame,
    # discarded when the stitcher is pre-calibrated), 8 flow the loop
    r = Runner(cfg, source=_Source(9), max_frames=8, consume_device=True,
               collect_latency=True, stitcher=fake)
    t0 = time.perf_counter()
    r.run()
    return r, time.perf_counter() - t0


@pytest.mark.parametrize("mode", ["inline", "threaded"])
def test_runner_survives_sync_stalls(mode):
    r, dt = _run({"pipeline_mode": mode}, stall_frames={2, 5})
    # two injected multi-second stalls -> two logged drops, and the run
    # finishes in deadline time (0.2 s each), not 2 x 3 s of blocking
    assert r.sync_stalls == 2
    assert len(r.done_ts) == 8 - 2
    assert dt < 4.0
    time.sleep(3.2)                 # let abandoned workers drain
    assert devsync.stalled_workers() == 0


@pytest.mark.parametrize("mode", ["inline", "threaded"])
def test_runner_survives_staging_stalls(mode):
    r, dt = _run({"pipeline_mode": mode}, stall_stage={1}, delay=2.0)
    assert r.stage_stalls == 1
    # the stalled frame set is dropped; the rest flow through
    assert len(r.done_ts) == 8 - 1
    assert dt < 4.0
    time.sleep(2.2)
    assert devsync.stalled_workers() == 0


def test_runner_unbounded_when_disabled():
    # sync_timeout_ms=0 preserves unbounded blocking semantics
    r, dt = _run({"pipeline_mode": "inline", "sync_timeout_ms": 0.0},
                 stall_frames={3}, delay=0.5)
    assert r.sync_stalls == 0
    assert len(r.done_ts) == 8
    assert dt >= 0.5
