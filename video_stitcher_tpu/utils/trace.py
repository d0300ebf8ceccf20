"""Device-level tracing (SURVEY §5: the reference's hand-rolled
`times[5]` checkpoints, 360_stitcher/timed.cpp:43-44,61-119, become
`jax.profiler` traces + the StageTimers host timers in utils/timing)."""

from __future__ import annotations

import contextlib


def start_device_trace(trace_dir: str) -> None:
    import jax
    jax.profiler.start_trace(trace_dir)


def stop_device_trace() -> None:
    import jax
    jax.profiler.stop_trace()


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """Capture a jax.profiler trace (TensorBoard/Perfetto readable) of the
    enclosed block. No-op when trace_dir is falsy."""
    if not trace_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-span inside a device_trace (jax.profiler.TraceAnnotation);
    usable as a context manager."""
    import jax
    return jax.profiler.TraceAnnotation(name)
