"""Built-in HEVC I_PCM encoder (io_plane/hevc_pcm.py + native twin).

The reference streams kvazaar-encoded HEVC to the player
(360_stitcher/timed.cpp:198-352). This image ships no encoder binary,
so the egress "hevc" mode falls back to the in-tree spec-compliant
I_PCM encoder. These tests prove:
  * the emitted bitstream is accepted and decoded by FFmpeg's
    INDEPENDENT hevc decoder (via cv2) — bit-exact, multi-frame;
  * chroma planes survive too (encoded-as-luma cross-check, since
    cv2's VideoCapture only hands back the Y plane for yuv420p);
  * the native C++ twin is byte-identical to the Python reference
    implementation, including emulation-prevention stress patterns;
  * the egress path transparently uses the built-in encoder when no
    kvazaar/ffmpeg binary exists.
"""

import shutil
import struct

import numpy as np
import pytest

from video_stitcher_tpu.io_plane import hevc_pcm
from video_stitcher_tpu.io_plane.hevc_pcm import PcmHevcEncoder


def _cv2_decode_y(stream_bytes, tmp_path, n_frames):
    """Decode an Annex-B HEVC file with cv2 (FFmpeg's hevc decoder);
    returns the raw Y planes (CONVERT_RGB=0 -> 8UC1 luma only)."""
    import cv2
    p = tmp_path / "stream.h265"
    p.write_bytes(stream_bytes)
    cap = cv2.VideoCapture(str(p))
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    planes = []
    for _ in range(n_frames):
        ok, dec = cap.read()
        if not ok:
            break
        planes.append(np.asarray(dec).reshape(-1).copy())
    cap.release()
    return planes


def _has_hevc_decoder():
    import cv2
    build = cv2.getBuildInformation()
    return "FFMPEG" in build and "YES" in build.split("FFMPEG", 1)[1][:40]


pytestmark = pytest.mark.skipif(
    not _has_hevc_decoder(),
    reason="cv2 lacks FFmpeg (independent hevc decoder unavailable)")


def test_ffmpeg_decodes_luma_bit_exact(tmp_path):
    """Multi-frame stream through FFmpeg's independent decoder: every
    decoded Y plane equals the input exactly (I_PCM is lossless)."""
    w, h = 96, 64
    enc = PcmHevcEncoder(w, h)
    rng = np.random.default_rng(0)
    frames, stream = [], b""
    for _ in range(4):
        f = (rng.random(w * h * 3 // 2) * 255).astype(np.uint8)
        frames.append(f)
        stream += enc.encode(f.tobytes())
    planes = _cv2_decode_y(stream, tmp_path, len(frames))
    assert len(planes) == len(frames), "decoder rejected some frames"
    for i, (dec, f) in enumerate(zip(planes, frames)):
        assert np.array_equal(dec[:w * h], f[:w * h]), f"frame {i} luma"


def test_ffmpeg_decodes_chroma_via_luma_reencode(tmp_path):
    """cv2 only returns Y for yuv420p — so prove the chroma path by
    re-encoding each chroma plane AS the luma of a second stream and
    decoding that: if the pcm_sample chroma ordering (7.3.8.7) were
    wrong, the first stream would already have desynced the decoder
    (test above); this one pins the exact chroma bytes end-to-end."""
    w, h = 64, 32
    rng = np.random.default_rng(1)
    frame = (rng.random(w * h * 3 // 2) * 255).astype(np.uint8)
    u = frame[w * h:w * h + w * h // 4]
    v = frame[w * h + w * h // 4:]
    cw, ch = w // 2, h // 2
    for plane in (u, v):
        enc = PcmHevcEncoder(cw, ch)
        gray = np.concatenate(
            [plane, np.full(cw * ch // 2, 128, np.uint8)])
        stream = enc.encode(gray.tobytes())
        dec = _cv2_decode_y(stream, tmp_path, 1)
        assert dec and np.array_equal(dec[0][:cw * ch], plane)


def test_non_ctb_aligned_dims_decode(tmp_path):
    """Dims not multiples of 32 use the conformance window (SPS
    cropping); the decoder must return the REAL dims' luma."""
    w, h = 50, 34                       # pads to 64x64 internally
    enc = PcmHevcEncoder(w, h)
    f = (np.random.default_rng(2).random(w * h * 3 // 2)
         * 255).astype(np.uint8)
    stream = enc.encode(f.tobytes())
    planes = _cv2_decode_y(stream, tmp_path, 1)
    assert planes, "decoder rejected the cropped stream"
    assert planes[0].size == w * h, "conformance window not honored"
    assert np.array_equal(planes[0], f[:w * h])


def test_stream_structure():
    """Headers VPS/SPS/PPS once, IDR per frame; Annex-B start codes."""
    enc = PcmHevcEncoder(64, 32)
    f = np.full(64 * 32 * 3 // 2, 77, np.uint8)
    first = enc.encode(f.tobytes())
    second = enc.encode(f.tobytes())

    def nal_types(stream):
        types, i = [], 0
        while True:
            j = stream.find(b"\x00\x00\x01", i)
            if j < 0:
                return types
            types.append((stream[j + 3] >> 1) & 0x3F)
            i = j + 3
    assert nal_types(first)[:4] == [32, 33, 34, 19]   # VPS SPS PPS IDR
    assert nal_types(second) == [19]                  # headers sent once


def test_native_twin_byte_identical():
    """native/hevc_pcm.cpp produces the exact bytes of the Python
    reference implementation, incl. emulation-prevention stress (runs
    of zeros force an 0x03 escape every two bytes) and edge padding."""
    lib = hevc_pcm.load_native()
    if lib is None:
        pytest.skip("no C++ toolchain to build libhevcpcm.so")
    rng = np.random.default_rng(3)
    for (w, h) in [(64, 32), (50, 34), (160, 90)]:
        py = PcmHevcEncoder(w, h)
        nat = hevc_pcm.NativePcmHevcEncoder(w, h, lib)
        for fi in range(4):
            f = (rng.random(w * h * 3 // 2) * 255).astype(np.uint8)
            if fi == 2:
                f[:] = 0                # all zeros: max escape density
            if fi == 3:
                f[::3] = 0              # dense zero pairs
            assert py.encode(f.tobytes()) == nat.encode(f.tobytes()), \
                (w, h, fi)
        nat.close()


def test_egress_hevc_falls_back_to_builtin(tmp_path, monkeypatch):
    """With no kvazaar/ffmpeg binary, encoder='hevc' must transparently
    use the built-in I_PCM encoder and stream a VPS-led Annex-B stream
    over the socket (decoded back bit-exact)."""
    import socket
    import threading

    from video_stitcher_tpu.config import StitcherConfig
    from video_stitcher_tpu.io_plane import hevc_lavc
    from video_stitcher_tpu.io_plane.egress import PlayerEgress
    from video_stitcher_tpu.ops.color import rgb_to_i420

    monkeypatch.setattr(shutil, "which", lambda name: None)
    # pin the BUILT-IN layer: both the in-process x265 encoder and the
    # subprocess layer outrank it in the hevc selection chain
    monkeypatch.setattr(hevc_lavc, "create_encoder", lambda *a, **k: None)

    listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    listener.bind(("127.0.0.1", 0))
    listener.listen(1)
    port = listener.getsockname()[1]
    received = bytearray()
    done = threading.Event()

    def server():
        conn, _ = listener.accept()
        conn.settimeout(5)
        try:
            while True:
                data = conn.recv(1 << 16)
                if not data:
                    break
                received.extend(data)
        except socket.timeout:
            pass
        finally:
            conn.close()
            done.set()

    t = threading.Thread(target=server, daemon=True)
    t.start()
    cfg = StitcherConfig(num_images=2, player_address="127.0.0.1",
                         player_tcp_port=port)
    eg = PlayerEgress(cfg, encoder="hevc")
    h, w = 32, 64
    frame = (np.random.default_rng(4).random((h, w, 3))
             * 255).astype(np.uint8)
    i420 = np.asarray(rgb_to_i420(frame)).tobytes()
    try:
        eg.send_frame(frame)
        eg.send_frame(frame)
    finally:
        eg.close()
    done.wait(5)
    listener.close()
    assert struct.unpack("<i", bytes(received[:4]))[0] == h
    stream = bytes(received[4:])
    assert stream.startswith(b"\x00\x00\x00\x01")
    assert (stream[4] >> 1) & 0x3F == 32, "stream must open with VPS"
    # decode back through FFmpeg: both frames' luma bit-exact
    planes = _cv2_decode_y(stream, tmp_path, 2)
    assert len(planes) == 2
    for dec in planes:
        assert np.array_equal(dec[:w * h],
                              np.frombuffer(i420, np.uint8)[:w * h])
