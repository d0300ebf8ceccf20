"""ctypes bindings for the native I/O library (libstitchio.so).

Builds on demand with the in-tree Makefile (g++); falls back cleanly when a
compiler isn't available — io_plane.ingest then uses the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libstitchio.so"))
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-s", "libstitchio.so"],
                       cwd=os.path.abspath(_NATIVE_DIR), check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
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
        _lib = lib
        return _lib
