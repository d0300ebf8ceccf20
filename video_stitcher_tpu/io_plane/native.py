"""ctypes bindings for the native libraries (libstitchio.so, libhevcpcm.so).

Builds on demand with the in-tree Makefile (g++); falls back cleanly when a
compiler isn't available — io_plane.ingest then uses the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Dict, Optional

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
_lock = threading.Lock()
_cache: Dict[str, Optional[ctypes.CDLL]] = {}


def _is_current(target: str) -> bool:
    """True when the built .so is newer than every native source file —
    the stale-ABI check make would do, without paying a subprocess (or a
    present-but-broken toolchain's worst-case 120 s stall) per process."""
    ndir = os.path.abspath(_NATIVE_DIR)
    path = os.path.join(ndir, target)
    try:
        t_so = os.path.getmtime(path)
    except OSError:
        return False
    try:
        for name in os.listdir(ndir):
            if name.endswith((".cpp", ".cc", ".hpp", ".h")) \
                    or name == "Makefile":
                if os.path.getmtime(os.path.join(ndir, name)) > t_so:
                    return False
    except OSError:
        return False
    return True


def _make(target: str) -> bool:
    if _is_current(target):
        return True
    try:
        subprocess.run(["make", "-s", target],
                       cwd=os.path.abspath(_NATIVE_DIR), check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_or_build(lib_name: str,
                  configure: Callable[[ctypes.CDLL], None]
                  ) -> Optional[ctypes.CDLL]:
    """Load a native library, (re)building it first, or None on failure.

    make is invoked even when the .so already exists: the binaries are
    gitignored, so a checkout updates the C++ source but not a previously
    built .so — loading that stale binary would silently run an old ABI
    (e.g. a 4-counter stats layout under a 5-counter caller). make's
    mtime check makes the up-to-date case a ~10 ms no-op, paid once per
    process. A pre-existing .so is still used when no compiler is
    available (the prebuilt-elsewhere fallback).
    """
    path = os.path.abspath(os.path.join(_NATIVE_DIR, lib_name))
    with _lock:
        if lib_name in _cache:
            return _cache[lib_name]
        lib: Optional[ctypes.CDLL] = None
        if _make(lib_name) or os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                configure(lib)
            except (OSError, AttributeError):
                # AttributeError = a prebuilt .so missing a newly-added
                # symbol (older ABI, no compiler to rebuild): degrade to
                # the pure-Python paths instead of crashing the caller
                lib = None
        _cache[lib_name] = lib
        return lib


def _configure_stitchio(lib: ctypes.CDLL) -> None:
    lib.stitchio_start_server.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_long, ctypes.c_int]
    lib.stitchio_start_server.restype = ctypes.c_int
    lib.stitchio_stats.argtypes = [ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_long)]
    lib.stitchio_stats.restype = ctypes.c_int
    lib.stitchio_pop_frame.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    lib.stitchio_pop_frame.restype = ctypes.c_int
    lib.stitchio_queue_size.argtypes = [ctypes.c_int]
    lib.stitchio_queue_size.restype = ctypes.c_int
    lib.stitchio_clients.restype = ctypes.c_int
    lib.stitchio_stop_server.restype = None
    lib.stitchio_nv12_to_rgb.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.stitchio_rgb_to_i420.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8)]


def load() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) libstitchio.so, or None."""
    return load_or_build("libstitchio.so", _configure_stitchio)
