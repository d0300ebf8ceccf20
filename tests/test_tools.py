"""Tools tests: automatic start-frame offset alignment (the reference's
calibrate.py human-in-the-loop tool, 360_stitcher/calibrate.py, plus the
automatic luma cross-correlation mode)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _write_video(path, n_frames, flash_at, fps=30, size=(64, 48)):
    import cv2
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), fps,
                        size)
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        base = 40 + (215 if i in flash_at else 0)
        frame = np.clip(rng.normal(base, 10, (size[1], size[0], 3)),
                        0, 255).astype(np.uint8)
        w.write(frame)
    w.release()


def test_offset_align_auto(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from tools.offset_align import auto_align

    # same scene events, camera b starts 7 frames EARLIER (sees the
    # flashes 7 frames later in its file) -> b must skip 7 more frames
    flashes = {20, 55, 90}
    a = tmp_path / "a.avi"
    b = tmp_path / "b.avi"
    _write_video(a, 130, flashes)
    _write_video(b, 130, {f + 7 for f in flashes})
    offsets = auto_align([str(a), str(b)], window=120)
    assert offsets == [0, 7], f"got {offsets}"
