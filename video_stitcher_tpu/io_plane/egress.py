"""Player egress: encode + TCP send of the stitched output.

Replaces the consumer's network path (360_stitcher/timed.cpp:156-352):
height prelude once (the player places the image on its sphere), encoded
frames streamed over TCP, reconnect-on-failure with encoder reopen.

The reference links kvazaar for HEVC; this environment has no HEVC encoder,
so encoding is pluggable:
  * "hevc"  — kvazaar or ffmpeg subprocess when available (gated)
  * "mjpeg" — cv2.imencode JPEG per frame (always available)
  * "raw"   — raw I420 bytes (device-converted via ops/color.rgb_to_i420)
"""

from __future__ import annotations

import shutil
import socket
import struct
import subprocess
import time
from typing import Optional

import numpy as np

from video_stitcher_tpu.config import StitcherConfig


def _open_encoder(kind: str, w: int, h: int):
    if kind == "hevc":
        exe = shutil.which("kvazaar") or shutil.which("ffmpeg")
        if exe is None:
            raise RuntimeError("no HEVC encoder available (kvazaar/ffmpeg)")
        if exe.endswith("ffmpeg"):
            cmd = [exe, "-f", "rawvideo", "-pix_fmt", "yuv420p",
                   "-s", f"{w}x{h}", "-i", "-", "-c:v", "libx265",
                   "-preset", "ultrafast", "-f", "hevc", "-"]
        else:
            cmd = [exe, "-i", "-", "--input-res", f"{w}x{h}",
                   "--preset", "ultrafast", "-o", "-"]
        return subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL)
    return None


class PlayerEgress:
    """PC-player mode: the stitcher is the TCP client (timed.cpp:161-165);
    set server_mode=True for the android-player topology (stitcher listens).
    """

    def __init__(self, cfg: StitcherConfig, encoder: str = "mjpeg",
                 server_mode: bool = False, jpeg_quality: int = 90):
        self.cfg = cfg
        self.encoder_kind = encoder
        self.server_mode = server_mode
        self.jpeg_quality = jpeg_quality
        self.sock: Optional[socket.socket] = None
        self._listener: Optional[socket.socket] = None
        self._enc = None
        self._sent_height = False

    # --- connection management (timed.cpp:156-180) --------------------
    def connect(self) -> None:
        self.close_socket()
        if self.server_mode:
            if self._listener is None:
                self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
                self._listener.setsockopt(socket.SOL_SOCKET,
                                          socket.SO_REUSEADDR, 1)
                self._listener.bind(("", self.cfg.player_tcp_port))
                self._listener.listen(1)
            self.sock, _ = self._listener.accept()
        else:
            self.sock = socket.create_connection(
                (self.cfg.player_address, self.cfg.player_tcp_port), timeout=10)
        self._sent_height = False

    def close_socket(self) -> None:
        if self.sock is not None:
            try:
                self.sock.close()
            except OSError:
                pass
            self.sock = None

    def close(self) -> None:
        self.close_socket()
        if self._listener is not None:
            self._listener.close()
            self._listener = None
        if self._enc is not None:
            self._enc.stdin.close()
            self._enc.terminate()
            self._enc = None

    # --- frame path ----------------------------------------------------
    def _encode(self, frame_rgb: np.ndarray) -> bytes:
        h, w = frame_rgb.shape[:2]
        if self.encoder_kind == "mjpeg":
            import cv2
            ok, data = cv2.imencode(
                ".jpg", frame_rgb[..., ::-1],
                [int(cv2.IMWRITE_JPEG_QUALITY), self.jpeg_quality])
            if not ok:
                raise RuntimeError("jpeg encode failed")
            return struct.pack("<I", len(data)) + data.tobytes()
        if self.encoder_kind == "raw":
            from video_stitcher_tpu.ops.color import rgb_to_i420
            return np.asarray(rgb_to_i420(frame_rgb)).tobytes()
        # hevc subprocess
        if self._enc is None:
            self._enc = _open_encoder("hevc", w, h)
        from video_stitcher_tpu.ops.color import rgb_to_i420
        self._enc.stdin.write(np.asarray(rgb_to_i420(frame_rgb)).tobytes())
        self._enc.stdin.flush()
        return self._enc.stdout.read1(1 << 20)

    def send_frame(self, frame_rgb: np.ndarray) -> None:
        """Send one frame; on failure reconnect + reopen the encoder
        (timed.cpp:331-348)."""
        if self.sock is None:
            self.connect()
        if not self._sent_height and self.cfg.send_height_info:
            # height prelude (timed.cpp:296-305)
            self.sock.sendall(struct.pack("<i", frame_rgb.shape[0]))
            self._sent_height = True
        payload = self._encode(frame_rgb)
        try:
            self.sock.sendall(payload)
        except OSError:
            # reconnect + reopen encoder for a clean bitstream
            if self._enc is not None:
                self._enc.terminate()
                self._enc = None
            self.connect()
            if self.cfg.send_height_info:
                self.sock.sendall(struct.pack("<i", frame_rgb.shape[0]))
                self._sent_height = True
            self.sock.sendall(payload)
