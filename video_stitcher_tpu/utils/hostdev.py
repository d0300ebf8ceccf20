"""Pin eager control-plane array work to the host CPU backend.

Calibration / mesh bookkeeping runs op-by-op (not jitted); on a tunneled
TPU backend every eager op is a network round trip, so the control plane
executes on the CPU backend while jitted per-frame paths stay on TPU.
"""

from __future__ import annotations

import contextlib
import functools

import jax


@functools.lru_cache(maxsize=1)
def _cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


@contextlib.contextmanager
def host_eager():
    dev = _cpu_device()
    if dev is None:
        yield
        return
    with jax.default_device(dev):
        yield


def commit(tree):
    """Move a pytree of arrays to the default (accelerator) device.

    Always round-trips leaves through host numpy: on the tunneled TPU
    backend, a buffer device_put directly from the CPU *jax* backend stays
    pathologically slow to access from compiled programs (measured 25x on
    the blend step); a fresh device_put from host memory is fast.
    """
    import numpy as np

    default = jax.devices()[0]

    def leaf(x):
        if x is None:
            return None
        # leaves already living on the default device (e.g. unchanged
        # state between mesh recalibrations, or arrays produced by jitted
        # device code) stay put — re-roundtripping them through host
        # numpy is pure transfer cost
        if isinstance(x, jax.Array):
            try:
                if default in x.devices():
                    return x
            except Exception:
                pass
        # EXPLICIT target device: a bare device_put follows the ambient
        # default, so a commit() issued inside a host_eager() /
        # jax.default_device(cpu) scope would silently place the state
        # on CPU while the resident check above compared against the
        # accelerator — exactly the slow-access pattern this module
        # exists to prevent
        return jax.device_put(np.asarray(x), default)

    return jax.tree_util.tree_map(leaf, tree)
