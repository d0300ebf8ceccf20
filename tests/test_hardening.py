"""Pins for the round-5 review-fix batch: small behaviors that would
regress silently (error surfacing, recovery paths, resource hygiene)."""

import socket
import struct
import threading
import time

import numpy as np
import pytest

from video_stitcher_tpu.config import StitcherConfig


# --- config validation -------------------------------------------------

def test_config_rejects_short_alphas():
    with pytest.raises(ValueError, match="alphas"):
        StitcherConfig(num_images=2, alphas=(1.0, 0.01))


def test_config_rejects_bad_pipeline_mode():
    with pytest.raises(ValueError, match="pipeline_mode"):
        StitcherConfig(num_images=2, pipeline_mode="threded")


def test_negative_seam_megapix_means_full_res():
    c = StitcherConfig(num_images=2, seam_megapix=-1.0)
    assert c.seam_scale == 1.0


def test_fixed_rig_rejects_yaw_count_mismatch():
    from video_stitcher_tpu.geometry.camera import fixed_rig_cameras
    with pytest.raises(ValueError, match="yaws"):
        fixed_rig_cameras(6, 320, 180, 1.0, yaws=[0.0, 1.0])


# --- timers ------------------------------------------------------------

def test_stage_timers_declared_order_and_zero_stages():
    from video_stitcher_tpu.utils.timing import StageTimers
    t = StageTimers(["a", "b", "c"])
    with t.time("b"):
        pass
    s = t.summary()
    # declared order preserved; never-run stages present at 0.0ms
    assert s.index("a=") < s.index("b=") < s.index("c=")
    assert "a=0.0ms" in s and "c=0.0ms" in s


# --- viz ---------------------------------------------------------------

def test_viz_scales_normalized_floats():
    from video_stitcher_tpu.utils.viz import _as_u8_rgb
    img = np.full((4, 4), 0.5, np.float32)
    out = _as_u8_rgb(img)
    assert out.dtype == np.uint8 and out.max() >= 120   # not all-black
    # u8-range floats stay unscaled
    out2 = _as_u8_rgb(np.full((4, 4), 200.0, np.float32))
    assert int(out2.max()) == 200


def test_viz_save_falls_back_on_unwritable_path(tmp_path):
    from video_stitcher_tpu.utils import viz
    bad = str(tmp_path / "no_such_dir" / "x.png")
    with pytest.raises(Exception):
        viz.save(bad, np.zeros((4, 4, 3), np.uint8))


# --- offset alignment tool --------------------------------------------

def test_offset_align_raises_on_unreadable_video():
    from tools.offset_align import best_lag
    with pytest.raises(ValueError, match="too few readable frames"):
        best_lag(np.array([]), np.array([]), 10)


def test_offset_align_raises_on_constant_luma():
    from tools.offset_align import best_lag
    a = np.full(60, 5.0)
    with pytest.raises(ValueError, match="correlation undefined"):
        best_lag(a, a, 10)


# --- encoders ----------------------------------------------------------

def test_native_encoders_raise_after_close():
    """A NULL handle into native code would segfault the process; all
    three native encoders must raise instead (egress reconnect clears
    encoders from another thread)."""
    from video_stitcher_tpu.io_plane import hevc_pcm, hevc_intra, hevc_lavc
    made = 0
    for mod, kw in ((hevc_pcm, {}), (hevc_intra, {"qp": 30})):
        enc = mod.create(64, 64, **kw)
        if type(enc).__name__.startswith("Native"):
            enc.close()
            with pytest.raises(RuntimeError, match="closed"):
                enc.encode(b"\x00" * (64 * 64 * 3 // 2))
            made += 1
    enc = hevc_lavc.create_encoder(64, 64)
    if enc is not None:
        enc.close()
        with pytest.raises(RuntimeError, match="closed"):
            enc.encode(b"\x00" * (64 * 64 * 3 // 2))
        made += 1
    if made == 0:
        pytest.skip("no native encoder built")


def test_egress_recovers_from_dead_encoder():
    """send_frame's recovery must cover the ENCODE step: a crashed
    encoder raises OSError from encode(), and the egress must reopen a
    fresh encoder + connection instead of caching the dead one."""
    from video_stitcher_tpu.io_plane.egress import PlayerEgress

    drained = {"bytes": 0, "conns": 0}
    ls = socket.socket()
    ls.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    ls.bind(("127.0.0.1", 0))
    ls.listen(2)
    stop = threading.Event()

    def player():
        ls.settimeout(1.0)
        while not stop.is_set():
            try:
                c, _ = ls.accept()
            except socket.timeout:
                continue
            drained["conns"] += 1
            c.settimeout(1.0)
            while not stop.is_set():
                try:
                    b = c.recv(1 << 16)
                except socket.timeout:
                    continue
                except OSError:
                    break
                if not b:
                    break
                drained["bytes"] += len(b)
            c.close()

    t = threading.Thread(target=player, daemon=True)
    t.start()
    cfg = StitcherConfig(num_images=2, player_address="127.0.0.1",
                         player_tcp_port=ls.getsockname()[1],
                         send_height_info=False)
    eg = PlayerEgress(cfg, encoder="hevc")
    eg.connect()
    frame = np.random.default_rng(0).integers(
        0, 255, (64, 64, 3)).astype(np.uint8)
    eg.send_frame(frame)
    assert eg._enc is not None

    class DeadEncoder:
        def encode(self, b):
            raise BrokenPipeError("encoder subprocess died")

        def close(self):
            raise OSError("already dead")

    eg._enc = DeadEncoder()
    eg.send_frame(frame)          # must recover, not raise
    assert not isinstance(eg._enc, DeadEncoder), "dead encoder cached"
    eg.send_frame(frame)          # and keep working
    stop.set()
    eg.close()
    ls.close()


def test_x265_finish_raises_on_native_error():
    from video_stitcher_tpu.io_plane import hevc_lavc
    enc = hevc_lavc.create_encoder(64, 64)
    if enc is None:
        pytest.skip("libhevclavc unavailable")
    enc.encode(b"\x10" * (64 * 64 * 3 // 2))
    enc.finish()
    with pytest.raises(RuntimeError, match="flush"):
        enc.finish()              # double flush = native error, not b""
    enc.close()


# --- devsync commit placement -----------------------------------------

def test_commit_targets_default_device_inside_host_eager():
    import jax
    from video_stitcher_tpu.utils.hostdev import commit, host_eager
    default = jax.devices()[0]
    with host_eager():
        out = commit({"x": np.ones((4,), np.float32)})
    assert default in out["x"].devices()
