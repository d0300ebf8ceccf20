"""TPU-native 360 live video stitcher (JAX/XLA/Pallas).

A ground-up rebuild of ultravideo/video-stitcher (VCIP 2019) for TPU:
calibration produces a pytree of arrays; the per-frame hot loop is a single
jitted XLA program. See README.md and SURVEY.md for the architecture map.
"""

from video_stitcher_tpu.config import StitcherConfig

__version__ = "0.1.0"

__all__ = ["StitcherConfig", "Stitcher", "__version__"]


def __getattr__(name):
    # Lazy import: keeps `import video_stitcher_tpu` light and avoids pulling
    # the pipeline (and jax compilation paths) into op-level tooling.
    if name == "Stitcher":
        from video_stitcher_tpu.pipeline.stitcher import Stitcher
        return Stitcher
    raise AttributeError(name)
