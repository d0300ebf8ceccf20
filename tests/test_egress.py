"""Egress hardening tests: Annex-B unit framing, reconnect-with-clean-
restart (timed.cpp:331-348 semantics), and the (gated) HEVC subprocess
encoder."""

import shutil
import socket
import struct
import threading

import numpy as np
import pytest

from video_stitcher_tpu.config import StitcherConfig
from video_stitcher_tpu.io_plane.egress import AnnexBFramer, PlayerEgress


# ---------------------------------------------------------------- framer

def _mk_unit(start, payload):
    return start + payload


# payloads follow Annex-B rules: emulation prevention guarantees no
# 00 00 01 inside a NAL (zero runs are broken by 03 bytes), and units end
# on the rbsp stop bit (non-zero last byte)
UNITS = [
    _mk_unit(b"\x00\x00\x00\x01", b"\x40\x01" + bytes(range(2, 40))),
    _mk_unit(b"\x00\x00\x01", b"\x42\x01\x01" + bytes(range(1, 7))),
    _mk_unit(b"\x00\x00\x00\x01",
             b"\x44\x01" + b"\x00\x00\x03\x00\x00\x03" * 4 + b"\x80"),
    _mk_unit(b"\x00\x00\x01", b"\x26\x01" + bytes(range(200, 255))),
]


@pytest.mark.parametrize("chunk", [1, 2, 3, 5, 64, 1000])
def test_annexb_framer_boundaries(chunk):
    """Units survive arbitrary read-boundary splits, byte-exact."""
    stream = b"".join(UNITS)
    fr = AnnexBFramer()
    out = []
    for i in range(0, len(stream), chunk):
        out.extend(fr.push(stream[i:i + chunk]))
    tail = fr.flush()
    assert b"".join(out) + tail == stream
    for u in out + ([tail] if tail else []):
        assert u.startswith(b"\x00\x00\x01") or \
            u.startswith(b"\x00\x00\x00\x01")
    # every complete unit was emitted; only the last can be tail-pending
    assert out + [tail] == UNITS


def test_annexb_framer_no_start_code_yet():
    fr = AnnexBFramer()
    assert fr.push(b"\x00\x00") == []
    assert fr.push(b"\x01\xaa\xbb") == []        # first unit still open
    units = fr.push(b"\x00\x00\x01\xcc")
    assert units == [b"\x00\x00\x01\xaa\xbb"]
    assert fr.flush() == b"\x00\x00\x01\xcc"


# ------------------------------------------------------------- reconnect

class _FakePlayer:
    """Accept loop that records height preludes + received bytes and can
    kill the connection mid-stream."""

    def __init__(self):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind(("127.0.0.1", 0))
        self.listener.listen(2)
        self.port = self.listener.getsockname()[1]
        self.sessions = []               # list of bytearrays, one per accept
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while not self._stop.is_set():
            try:
                self.listener.settimeout(0.2)
                conn, _ = self.listener.accept()
            except socket.timeout:
                continue
            buf = bytearray()
            self.sessions.append(buf)
            conn.settimeout(0.2)
            try:
                while not self._stop.is_set():
                    if getattr(self, "_kill_after", None) is not None \
                            and len(buf) >= self._kill_after:
                        self._kill_after = None
                        conn.close()
                        break
                    try:
                        data = conn.recv(65536)
                    except socket.timeout:
                        continue
                    if not data:
                        break
                    buf += data
            finally:
                try:
                    conn.close()
                except OSError:
                    pass

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=2)
        self.listener.close()


def test_egress_reconnect_clean_restart():
    player = _FakePlayer()
    cfg = StitcherConfig(num_images=2, player_address="127.0.0.1",
                         player_tcp_port=player.port)
    eg = PlayerEgress(cfg, encoder="mjpeg")
    frame = (np.random.default_rng(0).random((32, 64, 3)) * 255
             ).astype(np.uint8)
    try:
        eg.send_frame(frame)
        # let the first session land, then have the player drop the link
        deadline = threading.Event()
        for _ in range(50):
            if player.sessions and len(player.sessions[0]) > 4:
                break
            deadline.wait(0.05)
        player._kill_after = 0           # kill on next byte check
        # keep sending; the egress must detect the failure, reconnect,
        # and restart the stream with a fresh height prelude
        for _ in range(40):
            eg.send_frame(frame)
            if len(player.sessions) >= 2 and len(player.sessions[1]) > 4:
                break
            deadline.wait(0.05)
        assert len(player.sessions) >= 2, "egress never reconnected"
        first, second = player.sessions[0], player.sessions[-1]
        h = frame.shape[0]
        assert struct.unpack("<i", bytes(first[:4]))[0] == h
        # clean restart: the new session begins with the height prelude
        # again, then a complete length-framed JPEG
        assert struct.unpack("<i", bytes(second[:4]))[0] == h
        for _ in range(50):
            if len(second) >= 8:
                n = struct.unpack("<I", bytes(second[4:8]))[0]
                if len(second) >= 8 + n:
                    break
            deadline.wait(0.05)
        n = struct.unpack("<I", bytes(second[4:8]))[0]
        jpeg = bytes(second[8:8 + n])
        assert jpeg[:2] == b"\xff\xd8", "restart did not begin on a frame"
    finally:
        eg.close()
        player.stop()


# ------------------------------------------------------------ hevc gated

@pytest.mark.skipif(shutil.which("kvazaar") is None
                    and shutil.which("ffmpeg") is None,
                    reason="no HEVC encoder (kvazaar/ffmpeg) in this env")
def test_hevc_encoder_stream_structure():
    from video_stitcher_tpu.io_plane.egress import HevcEncoder
    w, h = 64, 32
    enc = HevcEncoder(w, h)
    rng = np.random.default_rng(0)
    frame = (rng.random((h * 3 // 2, w)) * 255).astype(np.uint8).tobytes()
    out = b""
    for _ in range(5):
        out += enc.encode(frame)
    out += enc.finish()
    assert out.startswith(b"\x00\x00\x00\x01") or \
        out.startswith(b"\x00\x00\x01")
    # VPS (nal type 32) must open an HEVC stream
    sc = 4 if out.startswith(b"\x00\x00\x00\x01") else 3
    assert (out[sc] >> 1) & 0x3F == 32, "stream does not start with VPS"
