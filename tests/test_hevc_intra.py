"""Built-in LOSSY HEVC intra encoder (io_plane/hevc_intra.py): the
emitted Main-profile bitstream must decode on FFmpeg's independent
decoder to EXACTLY the encoder's own reconstruction (the conformance
property that matters — prediction, transform, quant, CABAC all
decoder-exact), at useful quality and real compression.

Also pins the CABAC spec tables against the system libavcodec's ground
truth: hunting this encoder's first desync exposed two wrong constants
in the shared tables (RangeTabLps[31][0] was 28 not 29,
TransIdxLps[28] was 23 not 22) that the I_PCM encoder's tiny per-CTU
CABAC segments never reached."""

import numpy as np
import pytest

from video_stitcher_tpu.io_plane import hevc_lavc
from video_stitcher_tpu.io_plane.hevc_intra import IntraHevcEncoder


def _have_decoder():
    lib = hevc_lavc.load_native()
    if lib is None:
        return False
    try:
        d = hevc_lavc.LavcHevcDecoder()
        d.close()
        return True
    except RuntimeError:
        return False


pytestmark = pytest.mark.skipif(
    not _have_decoder(), reason="no in-process hevc decoder")


def _roundtrip(frames, w, h, qp):
    enc = IntraHevcEncoder(w, h, qp=qp)
    stream = b""
    recons = []
    for fr in frames:
        stream += enc.encode(fr)
        recons.append(np.concatenate([enc.recon_y.ravel(),
                                      enc.recon_u.ravel(),
                                      enc.recon_v.ravel()]))
    dec = hevc_lavc.LavcHevcDecoder()
    out = dec.decode(stream) + dec.flush()
    dec.close()
    return stream, out, recons


def _mk(w, h, seed=0, kind="mixed"):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "noise":
        y = rng.integers(0, 255, (h, w)).astype(np.uint8)
        u = rng.integers(0, 255, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 255, (h // 2, w // 2)).astype(np.uint8)
    else:
        y = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
        u = ((xx[::2, ::2] * 5) % 256).astype(np.uint8)
        v = rng.integers(0, 255, (h // 2, w // 2)).astype(np.uint8)
    return np.concatenate([y.ravel(), u.ravel(), v.ravel()]).tobytes()


def _psnr(a, b):
    a = np.frombuffer(a, np.uint8).astype(np.float64)
    mse = ((a - b) ** 2).mean()
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))


@pytest.mark.parametrize("qp", [20, 30, 40])
def test_decoder_exact_and_quality(qp):
    w, h = 64, 32
    f = _mk(w, h)
    stream, out, recons = _roundtrip([f], w, h, qp)
    assert len(out) == 1
    got = np.frombuffer(out[0][0], np.uint8)
    assert np.array_equal(got, recons[0]), "decode != encoder recon"
    assert _psnr(f, recons[0]) >= 45 - qp * 0.5   # monotone-ish quality
    assert len(stream) < 0.5 * len(f)              # real compression


def test_multi_frame_stream_and_sizes():
    # non-multiple-of-16 dims exercise the conformance window
    w, h = 72, 36
    frames = [_mk(w, h, seed=s) for s in range(3)]
    stream, out, recons = _roundtrip(frames, w, h, qp=30)
    assert len(out) == 3
    for (got, ow, oh), rec in zip(out, recons):
        assert (ow, oh) == (w, h)
        assert np.array_equal(np.frombuffer(got, np.uint8), rec)


def test_noise_worst_case_stays_conformant():
    # pure noise maximizes coefficient activity (every CG full, escape
    # Golomb-Rice paths, Rice escalation) — the CABAC stress case that
    # originally exposed the wrong spec constants
    w, h = 48, 48
    f = _mk(w, h, kind="noise")
    for qp in (18, 30, 45):
        stream, out, recons = _roundtrip([f], w, h, qp)
        got = np.frombuffer(out[0][0], np.uint8)
        assert np.array_equal(got, recons[0]), f"qp {qp}"


def test_rate_quality_tradeoff_vs_pcm():
    w, h = 64, 64
    f = _mk(w, h)
    sizes = {}
    for qp in (20, 30, 40):
        enc = IntraHevcEncoder(w, h, qp=qp)
        sizes[qp] = len(enc.encode(f))
    assert sizes[40] < sizes[30] < sizes[20]
    # PCM is ~1.02x raw; the lossy mode must be far under it
    assert sizes[30] < 0.4 * len(f)


def test_cabac_tables_match_system_decoder():
    """The shared CABAC tables (hevc_pcm) must equal the spec tables as
    compiled into the system libavcodec (extracted from its cabac.o —
    ground truth both encoders must satisfy)."""
    import ctypes
    import ctypes.util
    from video_stitcher_tpu.io_plane.hevc_pcm import (_RANGE_LPS,
                                                      _TRANS_LPS)
    # spec row 31 and transition 28 are the two historically-wrong spots
    assert _RANGE_LPS[31, 0] == 29
    assert int(_TRANS_LPS[28]) == 22
    # full invariants from the spec structure
    assert _RANGE_LPS.shape == (64, 4)
    assert (_RANGE_LPS[:-1] >= _RANGE_LPS[1:]).all()      # rows non-incr
    assert (_RANGE_LPS[:, 1:] >= _RANGE_LPS[:, :-1]).all()  # cols non-decr
    assert _RANGE_LPS[63].tolist() == [2, 2, 2, 2]
    assert int(_TRANS_LPS[63]) == 63


def test_egress_hevc_intra_mode():
    """PlayerEgress encoder='hevc_intra' streams a decodable compressed
    stream over a real socket (the zero-dependency lossy egress)."""
    import socket
    import struct
    import threading
    from video_stitcher_tpu.config import StitcherConfig
    from video_stitcher_tpu.io_plane.egress import PlayerEgress

    recv = bytearray()
    ls = socket.socket()
    ls.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    ls.bind(("127.0.0.1", 0))
    ls.listen(1)
    done = threading.Event()

    def player():
        c, _ = ls.accept()
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

    threading.Thread(target=player, daemon=True).start()
    cfg = StitcherConfig(num_images=2, player_address="127.0.0.1",
                         player_tcp_port=ls.getsockname()[1])
    eg = PlayerEgress(cfg, encoder="hevc_intra", hevc_qp=28)
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 255, (63, 96, 3)).astype(np.uint8)  # odd h
    for t in range(2):
        eg.send_frame(np.roll(frame, t, axis=1))
    eg.close()
    done.wait(timeout=5)
    ls.close()
    data = bytes(recv)
    (hh,) = struct.unpack("<i", data[:4])
    assert hh == 64                       # odd height edge-padded even
    dec = hevc_lavc.LavcHevcDecoder()
    out = dec.decode(data[4:]) + dec.flush()
    dec.close()
    assert len(out) == 2 and out[0][1] == 96 and out[0][2] == 64


def test_native_twin_byte_identical():
    """native/hevc_intra.cpp must emit byte-identical bitstreams to the
    Python reference implementation, across sizes/QPs/frames."""
    from video_stitcher_tpu.io_plane.hevc_intra import (
        NativeIntraHevcEncoder, load_native)
    if load_native() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    for (w, h, qp) in [(64, 32, 30), (72, 36, 22), (48, 48, 45)]:
        py = IntraHevcEncoder(w, h, qp=qp)
        nat = NativeIntraHevcEncoder(w, h, qp=qp)
        for s in range(2):
            f = rng.integers(0, 255, (w * h * 3 // 2,)) \
                .astype(np.uint8).tobytes()
            assert py.encode(f) == nat.encode(f), (w, h, qp, s)
        nat.close()


def test_create_prefers_native():
    from video_stitcher_tpu.io_plane import hevc_intra
    enc = hevc_intra.create(64, 32, qp=30)
    if hevc_intra.load_native() is not None:
        assert isinstance(enc, hevc_intra.NativeIntraHevcEncoder)
    enc.close()
