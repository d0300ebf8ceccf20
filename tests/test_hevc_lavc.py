"""In-process compressed HEVC egress (x265 via the system libavcodec):
the reference's in-process-kvazaar shape (timed.cpp:198-229) with REAL
compression — validated by roundtrip PSNR, by cv2's INDEPENDENT FFmpeg
build as a second decoder, and at the PlayerEgress level over a real
socket. Skips cleanly where the system libavcodec (or its libx265) is
absent."""

import socket
import struct
import threading

import numpy as np
import pytest

from video_stitcher_tpu.io_plane import hevc_lavc


def _have_lavc():
    lib = hevc_lavc.load_native()
    if lib is None:
        return False
    return hevc_lavc.create_encoder(64, 64) is not None


pytestmark = pytest.mark.skipif(
    not _have_lavc(), reason="system libavcodec/libx265 unavailable")


def _frames(w, h, n=5):
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        y = ((xx + 3 * t) % 256).astype(np.uint8)
        u = np.full((h // 2, w // 2), 100 + t, np.uint8)
        v = ((yy[::2, ::2] + 2 * t) % 256).astype(np.uint8)
        out.append(np.concatenate([y.ravel(), u.ravel(), v.ravel()])
                   .tobytes())
    return out


def _psnr(a, b):
    a = np.frombuffer(a, np.uint8).astype(np.float32)
    b = np.frombuffer(b, np.uint8).astype(np.float32)
    mse = ((a - b) ** 2).mean()
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))


def test_roundtrip_quality_and_compression():
    w, h = 320, 192
    frames = _frames(w, h)
    enc = hevc_lavc.X265Encoder(w, h, crf=23)
    stream = b"".join(enc.encode(f) for f in frames) + enc.finish()
    enc.close()
    dec = hevc_lavc.LavcHevcDecoder()
    out = dec.decode(stream) + dec.flush()
    dec.close()
    assert len(out) == len(frames)
    for (got, ow, oh), ref in zip(out, frames):
        assert (ow, oh) == (w, h)
        assert _psnr(got, ref) >= 35.0
    raw = sum(len(f) for f in frames)
    # REAL compression: far under the I_PCM mux's ~1.02x raw
    assert len(stream) < 0.10 * raw, (len(stream), raw)


def test_cross_validated_by_cv2_ffmpeg(tmp_path):
    """cv2 ships its own (independent) FFmpeg; its decode of our
    bitstream must agree with our in-process decoder (Y plane — cv2
    only hands back luma for raw yuv420p streams)."""
    import cv2
    w, h = 320, 192
    frames = _frames(w, h, n=3)
    enc = hevc_lavc.X265Encoder(w, h, crf=20)
    stream = b"".join(enc.encode(f) for f in frames) + enc.finish()
    enc.close()
    p = tmp_path / "out.hevc"
    p.write_bytes(stream)
    cap = cv2.VideoCapture(str(p))
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    dec = hevc_lavc.LavcHevcDecoder()
    ours = dec.decode(stream) + dec.flush()
    dec.close()
    n_ok = 0
    for i in range(len(frames)):
        ok, y = cap.read()
        if not ok:
            break
        y = y.reshape(-1)[: w * h]
        mine = np.frombuffer(ours[i][0], np.uint8)[: w * h]
        assert np.array_equal(y, mine), f"decoder disagreement frame {i}"
        n_ok += 1
    cap.release()
    assert n_ok >= 2, "cv2 decoded too few frames"


def test_egress_selects_x265_and_streams():
    """PlayerEgress 'hevc' mode must pick the in-process x265 encoder
    and stream decodable compressed HEVC over a real TCP connection."""
    from video_stitcher_tpu.config import StitcherConfig
    from video_stitcher_tpu.io_plane.egress import PlayerEgress

    recv = bytearray()
    lsock = socket.socket()
    lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    port = lsock.getsockname()[1]
    done = threading.Event()

    def player():
        c, _ = lsock.accept()
        c.settimeout(5.0)
        try:
            while True:
                b = c.recv(1 << 16)
                if not b:
                    break
                recv.extend(b)
        except OSError:
            pass
        c.close()
        done.set()

    th = threading.Thread(target=player, daemon=True)
    th.start()

    cfg = StitcherConfig(num_images=2, input_width=64, input_height=64,
                         player_address="127.0.0.1", player_tcp_port=port)
    eg = PlayerEgress(cfg, encoder="hevc")
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
    import cv2
    base = cv2.GaussianBlur(base, (0, 0), 3)      # compressible content
    for t in range(4):
        eg.send_frame(np.roll(base, 4 * t, axis=1))
    assert isinstance(eg._enc, hevc_lavc.X265Encoder), type(eg._enc)
    eg.close()
    done.wait(timeout=5)
    lsock.close()

    data = bytes(recv)
    # height prelude (timed.cpp:296-305), then the Annex-B stream
    (hh,) = struct.unpack("<i", data[:4])
    assert hh == 96
    dec = hevc_lavc.LavcHevcDecoder()
    out = dec.decode(data[4:]) + dec.flush()
    dec.close()
    assert len(out) >= 3
    assert out[0][1] == 128 and out[0][2] == 96


def test_encoder_reopen_after_reconnect_starts_clean():
    """A fresh encoder (the egress reconnect path) must start VPS-led so
    a newly connected player can decode from byte 0."""
    w, h = 128, 96
    f = _frames(w, h, n=1)[0]
    enc1 = hevc_lavc.X265Encoder(w, h)
    first = enc1.encode(f)
    enc1.close()
    # VPS NAL (type 32) near the head of the stream
    assert first[:4] == b"\x00\x00\x00\x01"
    nal_type = (first[4] >> 1) & 0x3F
    assert nal_type == 32, nal_type
