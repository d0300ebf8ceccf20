"""Deadline-bounded device synchronization.

The reference handles a wedged peer by dropping it: ingest gives a
capture client 3 failed recvs before disconnecting
(360_stitcher/networking.cpp:29-37) and the player link reconnects on
send failure (timed.cpp:334-348). The TPU-side equivalent hazard is the
host<->device link itself: on the tunneled dev backend, device_put /
jax.Array._value have been measured to block for MINUTES (stack traces
in VERDICT r4), and any unbounded np.asarray() in the live loop then
freezes the whole product silently — no log, no drop, no recovery.

This module gives every sync a deadline. The blocking call runs on a
disposable daemon thread (jaxlib releases the GIL around its blocking
awaits, so the main thread stays live); the caller waits with a
timeout, and a stall becomes a raised StallError — a logged, counted,
skippable event — instead of a hang. A stalled worker keeps running to
completion in the background and its result is discarded; a cap on
concurrently-stalled workers makes a known-wedged link fail fast
instead of accumulating threads.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable, Optional

import numpy as np

#: max concurrently-outstanding stalled workers before call_deadline
#: fails fast (link considered wedged; each stalled worker is a leaked
#: daemon thread until its blocking call eventually returns)
MAX_STALLED = 8

_stalled = 0
_lock = threading.Lock()


class StallError(RuntimeError):
    """A device sync exceeded its deadline (link stall, not a crash)."""


def stalled_workers() -> int:
    """Number of deadline-exceeded calls still blocked in the runtime."""
    with _lock:
        return _stalled


def call_deadline(fn: Callable[[], Any], timeout_s: float) -> Any:
    """Run fn() with a wall-clock deadline.

    Returns fn's result; raises StallError if the deadline passes (the
    call keeps running on its daemon thread and is discarded when it
    eventually finishes); re-raises fn's own exception otherwise.
    timeout_s <= 0 disables the deadline (plain call).
    """
    if timeout_s is None or timeout_s <= 0:
        return fn()
    global _stalled
    with _lock:
        if _stalled >= MAX_STALLED:
            raise StallError(
                f"link wedged: {_stalled} syncs already past deadline")
    # running -> done (worker finished) | stalled (deadline passed first);
    # every transition holds _lock, so the stalled-worker count stays
    # exact under any interleaving
    box: dict = {"status": "running"}
    done = threading.Event()

    def work():
        global _stalled
        try:
            value, error = fn(), None
        except BaseException as e:          # surfaced to the caller
            value, error = None, e
        with _lock:
            if box["status"] == "stalled":
                _stalled -= 1               # caller gave up; discard
            box.update(status="done", value=value, error=error)
        done.set()

    threading.Thread(target=work, daemon=True,
                     name="devsync-deadline").start()
    if not done.wait(timeout_s):
        with _lock:
            if box["status"] == "running":
                box["status"] = "stalled"
                _stalled += 1
                raise StallError(f"device sync exceeded {timeout_s:.1f}s")
    if box["error"] is not None:
        raise box["error"]
    return box["value"]


def read_head(x, timeout_s: float, n: int = 4) -> np.ndarray:
    """Force completion of a device array by reading its first n
    elements, bounded by timeout_s. The 4-byte read is the product's
    standard completion sync (one link round trip, no full-frame
    download). Raises StallError past the deadline."""
    return call_deadline(lambda: np.asarray(x.ravel()[:n]), timeout_s)


def to_host(x, timeout_s: float) -> np.ndarray:
    """Full device->host download with a deadline (StallError past it)."""
    return call_deadline(lambda: np.asarray(x), timeout_s)


def is_ready_within(x, timeout_s: float, poll_s: float = 0.005) -> bool:
    """Poll jax.Array.is_ready() until ready or deadline. Non-blocking
    alternative when the caller only needs completion, not the bytes —
    note is_ready() covers device compute, not a host copy."""
    deadline = time.monotonic() + timeout_s
    probe = getattr(x, "is_ready", None)
    if probe is None:
        return True
    while True:
        try:
            if call_deadline(probe, min(1.0, timeout_s)):
                return True
        except StallError:
            pass                    # runtime RPC itself wedged; keep trying
        if time.monotonic() >= deadline:
            return False
        time.sleep(poll_s)
