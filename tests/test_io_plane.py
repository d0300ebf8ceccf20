"""I/O plane tests: TCP NV12 ingest (loopback fake capture board, per
SURVEY.md §4), frame queue policies, egress framing."""

import socket
import struct
import threading
import time

import numpy as np
import pytest

from video_stitcher_tpu.config import StitcherConfig
from video_stitcher_tpu.io_plane.queues import FrameQueue
from video_stitcher_tpu.io_plane.ingest import CaptureIngest


def test_frame_queue_policies():
    q = FrameQueue(max_size=2, drop_oldest=True)
    for i in range(4):
        q.push(i)
    assert len(q) == 2
    assert q.pop(0.1) == 2       # oldest dropped
    q2 = FrameQueue(max_size=0)
    assert q2.pop(0.05) is None  # timeout


def _stream_frames(port, frames, chunk=1024):
    s = socket.create_connection(("127.0.0.1", port), timeout=5)
    data = b"".join(f.tobytes() for f in frames)
    for i in range(0, len(data), chunk):
        s.sendall(data[i:i + chunk])
    time.sleep(0.2)
    s.close()


@pytest.mark.parametrize("backend", ["python", "native"])
def test_tcp_nv12_ingest_loopback(backend):
    """Fake capture boards stream NV12 over loopback; ingest must reassemble
    per-camera frames in order (networking.cpp:15-65 protocol)."""
    if backend == "native":
        from video_stitcher_tpu.io_plane import native
        if native.load() is None:
            pytest.skip("native lib unavailable")
    port = 16660 + (0 if backend == "python" else 1)
    cfg = StitcherConfig(num_images=2, capture_img_width=64,
                         capture_img_height=48, capture_tcp_port=port)
    ing = CaptureIngest(cfg, debug_order=True, backend=backend)
    ing.start()
    try:
        rng = np.random.default_rng(0)
        cams = []
        for c in range(2):
            cams.append([rng.integers(0, 255, (48, 64)).astype(np.uint8)
                         for _ in range(3)])
        threads = [threading.Thread(target=_stream_frames,
                                    args=(port, cams[c])) for c in range(2)]
        # connect sequentially so debug-order slot assignment is deterministic
        threads[0].start()
        time.sleep(0.3)
        threads[1].start()
        for t in threads:
            t.join()
        for c in range(2):
            for k in range(3):
                got = ing.pop_frame(c, timeout=5.0)
                assert got is not None, f"cam {c} frame {k} missing"
                np.testing.assert_array_equal(got, cams[c][k])
    finally:
        ing.stop()


def test_egress_height_prelude_and_mjpeg():
    """Player egress: height prelude int32 then length-prefixed JPEG frames,
    against a loopback 'player' server (timed.cpp:296-311 protocol)."""
    port = 15555
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", port))
    server.listen(1)
    received = {}

    def player():
        conn, _ = server.accept()
        def read_n(n):
            buf = b""
            while len(buf) < n:
                chunk = conn.recv(n - len(buf))
                if not chunk:
                    raise EOFError
                buf += chunk
            return buf
        received["height"] = struct.unpack("<i", read_n(4))[0]
        ln = struct.unpack("<I", read_n(4))[0]
        received["jpeg"] = read_n(ln)
        conn.close()

    t = threading.Thread(target=player)
    t.start()
    from video_stitcher_tpu.io_plane.egress import PlayerEgress
    cfg = StitcherConfig(player_address="127.0.0.1", player_tcp_port=port,
                         send_results=True)
    eg = PlayerEgress(cfg, encoder="mjpeg")
    frame = np.zeros((120, 200, 3), np.uint8)
    frame[40:80, 50:150] = (255, 128, 0)
    eg.send_frame(frame)
    t.join(timeout=5)
    eg.close()
    server.close()
    assert received["height"] == 120
    import cv2
    dec = cv2.imdecode(np.frombuffer(received["jpeg"], np.uint8),
                       cv2.IMREAD_COLOR)
    assert dec.shape == (120, 200, 3)
    # orange block roughly survives JPEG
    assert abs(int(dec[60, 100, 2]) - 255) < 30


def test_synthetic_source_and_runner_smoke():
    """Mini end-to-end: synthetic source -> runner for a few frames."""
    from video_stitcher_tpu.pipeline.runner import Runner
    cfg = StitcherConfig(num_images=4, input_width=128, input_height=72,
                         enable_local=False, recalibrate=False,
                         output_width=256, output_height=128,
                         save_video=False, show_out=False)
    r = Runner(cfg, max_frames=3)
    r.run()
    assert r.frames_done == 3


def test_live_pipeline_network_to_network(tmp_path, monkeypatch):
    """BASELINE config 5 end-to-end on loopback: fake capture boards stream
    NV12 over TCP -> Runner (ingest, stitch, recalib off) -> MJPEG frames
    over TCP to a fake player (timed.cpp's full deployment loop)."""
    import math
    from video_stitcher_tpu.pipeline.runner import Runner

    monkeypatch.chdir(tmp_path)          # runner writes calib/result.jpg

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        return port

    cap_port, play_port = free_port(), free_port()
    cfg = StitcherConfig(num_images=2, input_width=64, input_height=48,
                         capture_img_width=64, capture_img_height=48,
                         capture_tcp_port=cap_port, use_stream=True,
                         yaws=(0.0, math.pi / 3), wrap_around=False,
                         player_address="127.0.0.1",
                         player_tcp_port=play_port, send_results=True,
                         enable_local=False, recalibrate=False,
                         output_width=128, output_height=64)

    received = {"frames": []}
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", play_port))
    server.listen(1)

    def player():
        conn, _ = server.accept()

        def read_n(n):
            buf = b""
            while len(buf) < n:
                chunk = conn.recv(n - len(buf))
                if not chunk:
                    raise EOFError
                buf += chunk
            return buf

        try:
            received["height"] = struct.unpack("<i", read_n(4))[0]
            for _ in range(2):
                ln = struct.unpack("<I", read_n(4))[0]
                received["frames"].append(read_n(ln))
        except EOFError:
            pass
        conn.close()

    player_t = threading.Thread(target=player, daemon=True)
    player_t.start()

    runner = Runner(cfg, max_frames=2)
    runner_t = threading.Thread(target=runner.run, daemon=True)
    runner_t.start()

    # wait for the capture server, then stream 4 NV12 frames per board
    # (1 calibration + 2 stitched + slack); sequential connects = ordered
    # slots under the default accept-order mode
    rng = np.random.default_rng(3)
    cams = [[rng.integers(0, 255, (72, 64)).astype(np.uint8)
             for _ in range(4)] for _ in range(2)]
    for c in range(2):
        for attempt in range(50):
            try:
                _stream_frames(cap_port, cams[c])
                break
            except OSError:
                time.sleep(0.2)
        else:
            raise RuntimeError("capture server never came up")

    runner_t.join(timeout=180)
    assert not runner_t.is_alive(), "runner did not finish"
    player_t.join(timeout=10)
    assert runner.frames_done == 2
    assert received.get("height") == 64
    assert len(received["frames"]) == 2
    import cv2
    dec = cv2.imdecode(np.frombuffer(received["frames"][0], np.uint8),
                       cv2.IMREAD_COLOR)
    assert dec is not None and dec.shape[1] == cfg.output_width
    assert (tmp_path / "result.jpg").exists()


def test_frame_queue_blocking_push_backpressure():
    """push(block=True) waits for space (staging backpressure) and
    returns False once the queue closes."""
    import threading
    import time
    from video_stitcher_tpu.io_plane.queues import FrameQueue

    q = FrameQueue(max_size=1, drop_oldest=False)
    assert q.push(1, block=True)
    done = []

    def pusher():
        done.append(q.push(2, block=True))   # blocks until pop
        done.append(q.push(3, block=True))   # blocks until close

    th = threading.Thread(target=pusher)
    th.start()
    time.sleep(0.15)
    assert done == []                        # still blocked
    assert q.pop(timeout=1) == 1
    for _ in range(100):
        if len(done) == 1:
            break
        time.sleep(0.02)
    assert done == [True]
    q.close()
    th.join(timeout=2)
    assert done == [True, False]


@pytest.mark.parametrize("backend", ["python", "native"])
def test_tcp_ingest_client_reconnect(backend):
    """A capture board that dies mid-frame and reconnects keeps its slot
    (slot = IP last octet - client_addr_start, netlib.c:125-150) and the
    partial frame from the dead connection is discarded — the new
    connection's reassembly starts at byte 0 (networking.cpp:15-65)."""
    if backend == "native":
        from video_stitcher_tpu.io_plane import native
        if native.load() is None:
            pytest.skip("native lib unavailable")
    port = 16670 + (0 if backend == "python" else 1)
    # 127.0.0.1 -> slot 0 with client_addr_start=1 (address-based mode)
    cfg = StitcherConfig(num_images=1, capture_img_width=64,
                         capture_img_height=48, capture_tcp_port=port,
                         client_addr_start=1)
    ing = CaptureIngest(cfg, debug_order=False, backend=backend)
    ing.start()
    try:
        rng = np.random.default_rng(7)
        frames = [rng.integers(0, 255, (48, 64)).astype(np.uint8)
                  for _ in range(3)]
        fb = 48 * 64

        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        # frame 0 complete + half of an (abandoned) frame, then drop
        s.sendall(frames[0].tobytes() + b"\xAA" * (fb // 2))
        time.sleep(0.3)
        s.close()

        got = ing.pop_frame(0, timeout=5.0)
        assert got is not None
        np.testing.assert_array_equal(got, frames[0])

        # reconnect: same peer address -> same slot, fresh reassembly
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        s.sendall(frames[1].tobytes() + frames[2].tobytes())
        time.sleep(0.2)
        s.close()

        for k in (1, 2):
            got = ing.pop_frame(0, timeout=5.0)
            assert got is not None, f"frame {k} missing after reconnect"
            np.testing.assert_array_equal(got, frames[k])
    finally:
        ing.stop()


@pytest.mark.parametrize("backend", ["python", "native"])
def test_framed_ingest_resync_after_byte_loss(backend):
    """Framed capture protocol (cfg.capture_framing): inject garbage bytes
    and truncate a frame mid-stream; the ingest must resynchronize on the
    next magic within ~1 frame and account for the loss — the reference's
    raw protocol (networking.cpp:15-65) shears every subsequent frame."""
    if backend == "native":
        from video_stitcher_tpu.io_plane import native
        if native.load() is None:
            pytest.skip("native lib unavailable")
    from video_stitcher_tpu.io_plane.ingest import pack_frame
    port = 16690 + (0 if backend == "python" else 1)
    cfg = StitcherConfig(num_images=1, capture_img_width=64,
                         capture_img_height=48, capture_tcp_port=port,
                         capture_framing=True)
    fb = 64 * 48
    ing = CaptureIngest(cfg, debug_order=True, backend=backend,
                        max_queue=16)
    ing.start()
    try:
        rng = np.random.default_rng(7)
        frames = [rng.integers(0, 255, (48, 64)).astype(np.uint8)
                  for _ in range(6)]
        wire = pack_frame(frames[0].tobytes(), 0)
        wire += pack_frame(frames[1].tobytes(), 1)
        wire += b"\x99" * 777                          # injected garbage
        # frame 2 truncated by 100 bytes: its payload swallows the head of
        # frame 3, shearing both (cost bounded at the overlapped frames)
        wire += pack_frame(frames[2].tobytes(), 2)[:12 + fb - 100]
        wire += pack_frame(frames[3].tobytes(), 5)     # seqs 3,4 lost upstream
        wire += pack_frame(frames[4].tobytes(), 6)
        wire += pack_frame(frames[5].tobytes(), 7)

        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        for i in range(0, len(wire), 1024):            # dribble in chunks
            s.sendall(wire[i:i + 1024])
        time.sleep(0.3)
        s.close()

        got = []
        for _ in range(5):
            f = ing.pop_frame(0, timeout=5.0)
            assert f is not None
            got.append(f)
        np.testing.assert_array_equal(got[0], frames[0])
        np.testing.assert_array_equal(got[1], frames[1])
        # got[2] is the corrupted frame-2 composite (undetectable without a
        # checksum); frames 4 and 5 must arrive INTACT — recovery proof
        np.testing.assert_array_equal(got[3], frames[4])
        np.testing.assert_array_equal(got[4], frames[5])
        st = ing.stats()[0]
        assert st["frames_ok"] == 5
        assert st["resyncs"] == 2, st            # garbage run + truncation
        assert st["bytes_skipped"] >= 777, st
        # seq 2 arrived (corrupt), then seq jumped 3 -> 6: 3 missing
        assert st["seq_gaps"] == 3, st
        assert "cam0" in ing.stats_summary()
    finally:
        ing.stop()


@pytest.mark.parametrize("backend", ["python", "native"])
def test_ingest_queue_drop_counter(backend):
    """Force the bounded ingest queue's drop-oldest policy and assert the
    per-camera drop counter reports exactly what was lost (VERDICT r3 #4:
    the native counter was never incremented, silently under-reporting
    losses in the fps log)."""
    if backend == "native":
        from video_stitcher_tpu.io_plane import native
        if native.load() is None:
            pytest.skip("native lib unavailable")
    port = 16694 + (0 if backend == "python" else 1)
    cfg = StitcherConfig(num_images=1, capture_img_width=64,
                         capture_img_height=48, capture_tcp_port=port)
    ing = CaptureIngest(cfg, debug_order=True, backend=backend, max_queue=2)
    ing.start()
    try:
        rng = np.random.default_rng(3)
        frames = [rng.integers(0, 255, (48, 64)).astype(np.uint8)
                  for _ in range(7)]
        # 7 frames into a 2-deep queue with no consumer: 5 must drop
        _stream_frames(port, frames)
        deadline = time.time() + 5.0
        while time.time() < deadline and ing.stats()[0]["frames_ok"] < 7:
            time.sleep(0.05)
        st = ing.stats()[0]
        assert st["frames_ok"] == 7, st
        assert st["drops"] == 5, st
        assert "drop=5" in ing.stats_summary()
        # the two survivors are the NEWEST frames (drop-oldest policy)
        np.testing.assert_array_equal(ing.pop_frame(0, 2.0), frames[5])
        np.testing.assert_array_equal(ing.pop_frame(0, 2.0), frames[6])
    finally:
        ing.stop()


def test_runner_framed_ingest_fault_recovery(tmp_path, monkeypatch):
    """VERDICT r3 #9: the PRODUCT loop (Runner + TCP ingest server) with
    the framed capture protocol, byte corruption injected mid-stream. The
    runner must keep producing stitched frames after the fault and the
    ingest counters must record the resync — the reference's raw protocol
    (networking.cpp:15-65) shears every frame after a lost byte, forever.
    Unit tests cover the framer; this covers the full loop."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_stitch_e2e import make_scene, render_views
    from video_stitcher_tpu.calib.calibration import plan_geometry
    from video_stitcher_tpu.io_plane.ingest import pack_frame
    from video_stitcher_tpu.ops.color import rgb_to_nv12
    from video_stitcher_tpu.pipeline.runner import Runner
    from video_stitcher_tpu.utils.hostdev import host_eager

    monkeypatch.chdir(tmp_path)
    port = 16697
    cfg = StitcherConfig(num_images=2, input_width=320, input_height=180,
                         enable_local=False, recalibrate=False,
                         use_stream=True, capture_framing=True,
                         capture_tcp_port=port, capture_img_width=320,
                         capture_img_height=270)
    geom, _ = plan_geometry(cfg)
    rng = np.random.default_rng(5)
    scene = make_scene(geom.layout.pano_w, geom.layout.pano_h, rng)
    frames = render_views(cfg, geom, scene)
    with host_eager():
        nv12 = np.stack([np.asarray(rgb_to_nv12(f)) for f in frames])

    n_frames = 24
    fault_at = 8
    stop = threading.Event()
    faulted = threading.Event()
    connected = [threading.Event() for _ in range(cfg.num_images + 1)]
    connected[0].set()

    def board(cam):
        connected[cam].wait(timeout=120)
        s = None
        for _ in range(600):
            try:
                s = socket.create_connection(("127.0.0.1", port), timeout=5)
                break
            except OSError:
                time.sleep(0.1)
        time.sleep(0.2)
        connected[cam + 1].set()
        assert s is not None
        payload = nv12[cam].tobytes()
        seq = 0
        try:
            while not stop.is_set():
                s.sendall(pack_frame(payload, seq))
                if seq == fault_at:
                    s.sendall(b"\x7f" * 1333)      # mid-stream corruption
                    faulted.set()
                seq += 1
                time.sleep(0.03)
        except OSError:
            pass
        finally:
            s.close()

    boards = [threading.Thread(target=board, args=(c,), daemon=True)
              for c in range(cfg.num_images)]
    for t in boards:
        t.start()
    r = Runner(cfg, max_frames=n_frames, consume_device=True)
    try:
        r.run()
    finally:
        stop.set()
    assert faulted.is_set(), "fault was never injected"
    assert r.frames_done >= n_frames, (
        f"runner stalled after fault: {r.frames_done}/{n_frames}")
    stats = r._ingest.stats()
    total_resyncs = sum(s["resyncs"] for s in stats)
    total_skipped = sum(s["bytes_skipped"] for s in stats)
    assert total_resyncs >= 1, stats
    assert total_skipped >= 1333, stats


@pytest.mark.parametrize("backend", ["python", "native"])
def test_debug_order_reconnect_reuses_freed_slot(backend):
    """Accept-order mode: fresh slots go out in accept order, and once
    all n are used a dropped board's reconnect takes the freed slot
    instead of being rejected forever (review r5 — the old counter kept
    incrementing past n; the native server had the same bug)."""
    if backend == "native":
        from video_stitcher_tpu.io_plane import native
        if native.load() is None:
            pytest.skip("native lib unavailable")
    tmp = socket.socket()
    tmp.bind(("127.0.0.1", 0))
    port = tmp.getsockname()[1]
    tmp.close()
    cfg = StitcherConfig(num_images=2, capture_img_width=32,
                         capture_img_height=24, capture_tcp_port=port)
    ing = CaptureIngest(cfg, backend=backend)
    assert ing.debug_order        # cfg.capture_debug_order default
    ing.start()
    try:
        fb = 32 * 24
        rng = np.random.default_rng(11)
        a, b, c = (rng.integers(0, 255, (24, 32)).astype(np.uint8)
                   for _ in range(3))
        s0 = socket.create_connection(("127.0.0.1", port), timeout=5)
        s0.sendall(a.tobytes())
        time.sleep(0.3)
        s1 = socket.create_connection(("127.0.0.1", port), timeout=5)
        s1.sendall(b.tobytes())
        time.sleep(0.2)
        np.testing.assert_array_equal(ing.pop_frame(0, timeout=5.0), a)
        np.testing.assert_array_equal(ing.pop_frame(1, timeout=5.0), b)
        # drop board 0; its reconnect must land back on slot 0
        s0.close()
        time.sleep(0.3)
        s2 = socket.create_connection(("127.0.0.1", port), timeout=5)
        s2.sendall(c.tobytes())
        time.sleep(0.2)
        got = ing.pop_frame(0, timeout=5.0)
        assert got is not None, "reconnected board rejected"
        np.testing.assert_array_equal(got, c)
        s1.close()
        s2.close()
    finally:
        ing.stop()


def test_get_frames_retains_partial_pops():
    """A per-camera timeout must not discard frames already popped for
    the other cameras: the retained frames pair with the stalled
    camera's frame on the next call (review r5 — the old discard left a
    persistent one-frame temporal skew between camera groups)."""
    cfg = StitcherConfig(num_images=2, capture_img_width=16,
                         capture_img_height=12, capture_tcp_port=0)
    ing = CaptureIngest(cfg, backend="python")   # not started: queues only
    f0 = np.full((12, 16), 1, np.uint8)
    f1 = np.full((12, 16), 2, np.uint8)
    ing._queues[0].push(f0)
    assert ing.get_frames(timeout=0.1) is None   # cam1 empty -> timeout
    ing._queues[1].push(f1)
    out = ing.get_frames(timeout=0.5)
    assert out is not None
    np.testing.assert_array_equal(out[0], f0)    # retained, not dropped
    np.testing.assert_array_equal(out[1], f1)


def test_ingest_stop_closes_accepted_connections():
    """stop() must close per-camera connections, not just the listener:
    otherwise recv threads stay blocked on live sockets and the boards
    keep streaming into closed queues (review r5)."""
    tmp = socket.socket()
    tmp.bind(("127.0.0.1", 0))
    port = tmp.getsockname()[1]
    tmp.close()
    cfg = StitcherConfig(num_images=1, capture_img_width=16,
                         capture_img_height=12, capture_tcp_port=port)
    ing = CaptureIngest(cfg, backend="python")
    ing.start()
    s = socket.create_connection(("127.0.0.1", port), timeout=5)
    time.sleep(0.3)
    ing.stop()
    # the server-side close must surface on the board's socket promptly
    s.settimeout(5.0)
    deadline = time.monotonic() + 5.0
    closed = False
    while time.monotonic() < deadline:
        try:
            if s.recv(4096) == b"":
                closed = True
                break
        except socket.timeout:
            break
        except OSError:
            closed = True
            break
    s.close()
    assert closed, "accepted connection still open after stop()"
