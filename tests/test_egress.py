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


# -------------------------------------------- hevc pipeline, codec-free
#
# This image ships NO HEVC encoder (no kvazaar, no ffmpeg binary, and
# cv2's bundled avcodec has only device-backed v4l2 wrappers) — so the
# real-codec roundtrip below (test_hevc_real_roundtrip_psnr) is gated and
# SKIPS here; see README "HEVC egress" for the statement of what is and
# is not proven in this environment. What CAN be proven codec-free is
# everything the product owns: the subprocess plumbing, the stdout
# reader thread, Annex-B unit framing, per-frame data integrity through
# the whole encoder->framer->socket path, and the clean VPS-led restart
# after a mid-stream reconnect. The fake kvazaar below is protocol-
# faithful Annex-B (parameter sets on open, one frame NAL + AUD per
# input frame, payload = frame index + CRC of the exact I420 bytes).

_FAKE_KVAZAAR = r'''#!/usr/bin/env -S python3 -S
# -S skips site imports: this environment's sitecustomize imports jax at
# interpreter start (seconds), which would stall the "encoder" spawn
import sys, zlib
args = sys.argv[1:]
res = args[args.index("--input-res") + 1]
w, h = map(int, res.split("x"))
fb = w * h * 3 // 2
out = sys.stdout.buffer
# parameter sets: VPS (32), SPS (33), PPS (34)
out.write(b"\x00\x00\x00\x01" + bytes([32 << 1, 1]) + b"\x11\x22\x33")
out.write(b"\x00\x00\x01" + bytes([33 << 1, 1]) + b"\x44\x55")
out.write(b"\x00\x00\x01" + bytes([34 << 1, 1]) + b"\x66")
out.flush()
idx = 0
while True:
    data = sys.stdin.buffer.read(fb)
    if len(data) < fb:
        break
    crc = zlib.crc32(data)
    payload = ("%04d%08x" % (idx, crc)).encode()      # ascii: no 00 bytes
    out.write(b"\x00\x00\x01" + bytes([1 << 1, 1]) + payload)
    out.write(b"\x00\x00\x01" + bytes([35 << 1, 1]) + b"\x50")  # AUD
    out.flush()
    idx += 1
'''


def _install_fake_kvazaar(tmp_path, monkeypatch):
    import os
    import shutil as _sh
    exe = tmp_path / "kvazaar"
    exe.write_text(_FAKE_KVAZAAR)
    os.chmod(exe, 0o755)
    real_which = _sh.which
    monkeypatch.setattr(
        _sh, "which",
        lambda name: str(exe) if name == "kvazaar" else real_which(name))
    return exe


def _parse_session_nals(session_bytes):
    """height prelude + Annex-B stream -> (height, [nal units])."""
    h = struct.unpack("<i", bytes(session_bytes[:4]))[0]
    fr = AnnexBFramer()
    units = fr.push(bytes(session_bytes[4:]))
    tail = fr.flush()
    if tail:
        units.append(tail)
    return h, units


def _nal_type(unit):
    sc = 4 if unit.startswith(b"\x00\x00\x00\x01") else 3
    return (unit[sc] >> 1) & 0x3F


def test_hevc_pipeline_integrity_and_reconnect(tmp_path, monkeypatch):
    """Full hevc-mode egress path with the protocol-faithful fake encoder:
    per-frame CRCs survive encoder->reader-thread->framer->TCP, the
    stream opens VPS/SPS/PPS, and a mid-stream reconnect restarts with
    fresh parameter sets (timed.cpp:331-348's encoder-reopen semantics).
    """
    import time
    import zlib

    from video_stitcher_tpu.io_plane import hevc_lavc
    from video_stitcher_tpu.ops.color import rgb_to_i420

    # pin the SUBPROCESS layer: the in-process x265 encoder outranks it
    # in the hevc selection chain and would otherwise be chosen
    monkeypatch.setattr(hevc_lavc, "create_encoder", lambda *a, **k: None)
    _install_fake_kvazaar(tmp_path, monkeypatch)
    player = _FakePlayer()
    cfg = StitcherConfig(num_images=2, player_address="127.0.0.1",
                         player_tcp_port=player.port)
    eg = PlayerEgress(cfg, encoder="hevc")
    rng = np.random.default_rng(1)
    h, w = 32, 64
    frames = [(rng.random((h, w, 3)) * 255).astype(np.uint8)
              for _ in range(6)]
    crcs = [zlib.crc32(np.asarray(rgb_to_i420(f)).tobytes())
            for f in frames]
    try:
        for f in frames[:3]:
            eg.send_frame(f)
        # the encoder's output is pipelined: units reach the socket on the
        # NEXT send_frame (exactly like the real encoder's lookahead), so
        # keep feeding frame 2 until session 1 carries 3 frame NALs
        for _ in range(100):
            if player.sessions:
                _, units = _parse_session_nals(player.sessions[0])
                if sum(1 for u in units if _nal_type(u) == 1) >= 3:
                    break
            eg.send_frame(frames[2])
            time.sleep(0.05)
        hh, units = _parse_session_nals(player.sessions[0])
        assert hh == h
        assert [_nal_type(u) for u in units[:3]] == [32, 33, 34], \
            "stream must open with VPS/SPS/PPS"
        frame_nals = [u for u in units if _nal_type(u) == 1]
        assert len(frame_nals) >= 3
        for k, u in enumerate(frame_nals[:3]):
            sc = 4 if u.startswith(b"\x00\x00\x00\x01") else 3
            payload = u[sc + 2:].decode()
            assert int(payload[:4]) == k, "frame order corrupted"
            assert int(payload[4:], 16) == crcs[k], \
                f"frame {k} bytes corrupted through the pipeline"

        # mid-stream reconnect: player kills the link; the egress must
        # reopen the ENCODER too so the new session is a decodable stream
        player._kill_after = 0
        for i in range(40):
            eg.send_frame(frames[3 + (i % 3)])
            if len(player.sessions) >= 2:
                _, units2 = _parse_session_nals(player.sessions[-1])
                if sum(1 for u in units2 if _nal_type(u) == 1) >= 1:
                    break
            time.sleep(0.05)
        assert len(player.sessions) >= 2, "egress never reconnected"
        hh2, units2 = _parse_session_nals(player.sessions[-1])
        assert hh2 == h
        assert [_nal_type(u) for u in units2[:3]] == [32, 33, 34], \
            "reconnected stream must restart with fresh VPS/SPS/PPS"
        # the restarted encoder numbers frames from 0 again
        f0 = [u for u in units2 if _nal_type(u) == 1][0]
        sc = 4 if f0.startswith(b"\x00\x00\x00\x01") else 3
        assert int(f0[sc + 2:sc + 6]) == 0
    finally:
        eg.close()
        player.stop()


def test_hevc_real_roundtrip_psnr(tmp_path):
    """Real-codec roundtrip through the egress encoder selection: encode
    with whatever the 'hevc' mode would pick (kvazaar/ffmpeg subprocess
    when present, otherwise the built-in I_PCM encoder), decode back
    with cv2's INDEPENDENT avcodec hevc decoder, PSNR >= 30 dB (the
    I_PCM path is lossless, so it lands at inf)."""
    import cv2

    from video_stitcher_tpu.ops.color import rgb_to_i420

    h, w = 64, 96
    rng = np.random.default_rng(2)
    base = (rng.random((h, w, 3)) * 127).astype(np.uint8)
    frames = [np.roll(base, 2 * i, axis=1) for i in range(8)]
    if shutil.which("kvazaar") or shutil.which("ffmpeg"):
        from video_stitcher_tpu.io_plane.egress import HevcEncoder
        enc = HevcEncoder(w, h)
    else:
        from video_stitcher_tpu.io_plane import hevc_pcm
        enc = hevc_pcm.create(w, h)
    out = b""
    for f in frames:
        out += enc.encode(np.asarray(rgb_to_i420(f)).tobytes())
    out += enc.finish()
    path = tmp_path / "stream.h265"
    path.write_bytes(out)
    cap = cv2.VideoCapture(str(path))
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)   # raw luma: no color-convert loss
    ok, dec = cap.read()
    assert ok, "cv2 could not decode the emitted stream"
    y_ref = np.asarray(rgb_to_i420(frames[0])).reshape(-1)[:w * h]
    y_dec = np.asarray(dec).reshape(-1)[:w * h]
    err = np.mean((y_dec.astype(np.float64) - y_ref) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(err, 1e-9))
    assert psnr >= 30, f"roundtrip PSNR {psnr:.1f} dB"
    cap.release()
