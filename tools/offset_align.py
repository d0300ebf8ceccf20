#!/usr/bin/env python
"""Per-video start-frame offset alignment.

The reference ships an interactive OpenCV viewer (360_stitcher/calibrate.py)
where a human steps frames per camera until the six videos line up, then
copies the printed offsets into defs.h:44. This tool keeps that interactive
mode and adds an automatic one: temporal cross-correlation of global-luma
derivatives — scene-wide brightness changes (flashes, motion) hit all
cameras at the same instant, so the lag that maximizes correlation IS the
frame offset.

Usage:
  python tools/offset_align.py auto  cam0.mp4 ... cam5.mp4 [--window 300]
  python tools/offset_align.py view  cam0.mp4 ... cam5.mp4
Outputs a JSON list usable as StitcherConfig.offsets.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def luma_series(path: str, n_frames: int, step: int = 1) -> np.ndarray:
    """Mean-luma time series of the first n_frames of a video."""
    import cv2
    cap = cv2.VideoCapture(path)
    vals = []
    i = 0
    while len(vals) < n_frames:
        ok, frame = cap.read()
        if not ok:
            break
        if i % step == 0:
            small = cv2.resize(frame, (64, 36))
            vals.append(float(small.mean()))
        i += 1
    cap.release()
    return np.asarray(vals, np.float64)


def best_lag(a: np.ndarray, b: np.ndarray, max_lag: int) -> int:
    """Lag of b relative to a maximizing correlation of diff series."""
    if len(a) < 9 or len(b) < 9:
        # cv2.VideoCapture never raises on a bad path — it just yields
        # zero frames; without this, auto mode printed confidently
        # WRONG offsets [0, ...] for an unreadable/typo'd video
        raise ValueError(
            f"too few readable frames for alignment ({len(a)}/{len(b)})"
            " — check the video paths")
    da = np.diff(a)
    db = np.diff(b)
    best, arg = -np.inf, 0
    for lag in range(-max_lag, max_lag + 1):
        if lag >= 0:
            x, y = da[lag:], db[:len(db) - lag]
        else:
            x, y = da[:len(da) + lag], db[-lag:]
        n = min(len(x), len(y))
        if n < 8:
            continue
        x, y = x[:n], y[:n]
        sx, sy = x.std(), y.std()
        if sx == 0 or sy == 0:
            continue
        c = float(np.dot(x - x.mean(), y - y.mean()) / (n * sx * sy))
        if c > best:
            best, arg = c, lag
    if best == -np.inf:
        raise ValueError("correlation undefined at every lag "
                         "(constant-luma or too-short videos)")
    return arg


def auto_align(paths, window: int = 300) -> list:
    series = [luma_series(p, window) for p in paths]
    ref = series[0]
    lags = [0]
    for s in series[1:]:
        # best_lag aligns ref[t+lag] ~ s[t], i.e. lag = skip_ref - skip_s;
        # a video whose events arrive later must itself skip more frames
        lags.append(-best_lag(ref, s, max_lag=window // 3))
    # offsets must be non-negative frame skips (defs.h:44 semantics)
    m = min(lags)
    return [int(l - m) for l in lags]


def interactive(paths) -> list:
    """Key-driven viewer: keys 1..N advance one video a frame, 0 advances
    all, 9 rewinds all is not supported (forward-only), q quits+prints."""
    import cv2
    caps = [cv2.VideoCapture(p) for p in paths]
    offsets = [0] * len(paths)
    frames = []
    for c in caps:
        ok, f = c.read()
        frames.append(f if ok else None)

    def grid():
        th = 180
        tiles = []
        for f in frames:
            t = cv2.resize(f, (320, th)) if f is not None else \
                np.zeros((th, 320, 3), np.uint8)
            tiles.append(t)
        rows = [np.concatenate(tiles[i:i + 3], axis=1)
                for i in range(0, len(tiles), 3)]
        w = max(r.shape[1] for r in rows)
        rows = [np.pad(r, ((0, 0), (0, w - r.shape[1]), (0, 0))) for r in rows]
        return np.concatenate(rows, axis=0)

    while True:
        cv2.imshow("offset_align (1..N step cam, 0 step all, q quit)", grid())
        k = cv2.waitKey(0) & 0xFF
        if k == ord("q"):
            break
        if k == ord("0"):
            for i, c in enumerate(caps):
                ok, f = c.read()
                if ok:
                    frames[i] = f
        elif ord("1") <= k <= ord(str(min(9, len(paths)))):
            i = k - ord("1")
            ok, f = caps[i].read()
            if ok:
                frames[i] = f
                offsets[i] += 1
    for c in caps:
        c.release()
    m = min(offsets)
    return [o - m for o in offsets]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["auto", "view"])
    ap.add_argument("videos", nargs="+")
    ap.add_argument("--window", type=int, default=300,
                    help="frames to scan in auto mode")
    args = ap.parse_args(argv)
    if args.mode == "auto":
        offsets = auto_align(args.videos, args.window)
    else:
        offsets = interactive(args.videos)
    print(json.dumps({"offsets": offsets}))
    return offsets


if __name__ == "__main__":
    main()
