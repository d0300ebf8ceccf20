"""Runtime configuration surface.

Mirrors the reference's compile-time constant block (360_stitcher/defs.h:8-76)
as a real runtime config (dataclass + JSON file + CLI), which the reference's
own TODO list admits it never implemented ("Implement command line arguments").

Every field that BASELINE.md lists as "config surface preserved" is here under
a pythonic name; the defaults match defs.h.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple


@dataclass
class StitcherConfig:
    # --- rig / inputs (defs.h:37, defs.h:15-17) ---
    num_images: int = 6
    input_width: int = 1920
    input_height: int = 1080
    #: Optional explicit camera yaws (radians). Default: ring, 2*pi*i/N
    #: (360_stitcher/calibration.cpp:35).
    yaws: Optional[Tuple[float, ...]] = None
    #: Horizontal field of view in degrees (focal from 90deg FoV,
    #: 360_stitcher/calibration.cpp:31-32).
    fov_deg: float = 90.0

    # --- stitching behavior (defs.h:25-27) ---
    wrap_around: bool = True
    recalibrate: bool = True
    enable_local: bool = True

    # --- scales (defs.h:51-53) ---
    work_megapix: float = 0.6
    seam_megapix: float = 0.01
    compose_megapix: float = 1.4

    # --- blending (defs.h:55) ---
    blend_strength: float = 5.0
    #: "multiband" | "feather" | "none"
    blend_type: str = "multiband"

    # --- features / matching (defs.h:60-61) ---
    #: (defs.h:54 MATCH_CONF is intentionally absent: the reference never
    #: reads it — featurefinder.cpp:108 force-sets confidence = 1. The knn
    #: ratio test is lowe_ratio below. Likewise the reference's hardcoded
    #: +-400 px overlap bands, meshwarper.cpp:89, are replaced by exact
    #: >=2-camera coverage masks, calib/calibration.py.)
    max_features_per_image: int = 100
    #: ORB detector budget. The reference uses 2500 kp / 8 levels
    #: (featurefinder.cpp:15); the default here is 512 / 4 because (a)
    #: the mesh solve caps matches at max_features_per_image per seam
    #: anyway, so detections beyond ~512 are discarded, (b) 2500/8
    #: multiplies recalibration latency ~4-8x (the kNN is K^2 Hamming;
    #: measured 1.1 s -> 9.1 s CPU re-solve) against the 1 s RECALIB_DEL
    #: cadence budget, and (c) the solved CPW mesh is IDENTICAL at both
    #: settings on a natural-photograph rig (median and max backward-map
    #: delta 0.000 px — tests/test_features_natural.py::
    #: test_orb_512_vs_2500_mesh_equivalence_natural, which also measures
    #: detector repeatability at parity with cv2.ORB: 0.94-0.96 vs
    #: 0.91-0.96 under shift). Set 2500/1.2/8 for reference parity.
    orb_num_features: int = 512
    orb_scale_factor: float = 1.2
    orb_num_levels: int = 4
    lowe_ratio: float = 0.7               # 360_stitcher/featurefinder.cpp:65

    # --- CPW mesh (defs.h:65-71) ---
    mesh_width: int = 10
    mesh_height: int = 10
    #: [local, global, smoothness, temporal] cost weights (defs.h:69).
    alphas: Tuple[float, float, float, float] = (1.0, 0.01, 0.00005, 0.0)
    global_dist: int = 30
    #: Soft-shrink solved mesh displacements by this many px toward the
    #: rest grid (suppresses sub-pixel feature-localization jitter; real
    #: parallax passes through). 0 disables. No reference equivalent.
    mesh_shrink_px: float = 0.75

    # --- recalibration (defs.h:48-50) ---
    recalib_del_ms: int = 1000
    recalib_thresh_px: int = 15
    recalib_interp: bool = False
    #: Dispatch the recalibration's feature programs one camera / one
    #: seam at a time with a completion gate between units, instead of
    #: one batched program per stage. The batched detect is a single
    #: ~128 ms device program (match+RANSAC ~110 ms): a live stitch
    #: frame dispatched behind it waits the whole block, which showed up
    #: as 200+ ms p99 frames around every mesh install. Chunked units
    #: are ~20 ms, so concurrent 8 ms stitch frames interleave. Costs
    #: the solve one device round trip per unit (12 total) — well inside
    #: the 1 s cadence budget; disable to make an isolated solve as fast
    #: as possible when no live loop shares the chip.
    recalib_chunked: bool = True
    #: Re-warp seam weights through the mesh on recalibration
    #: (MultiBandBlender::update_mask; disabled in the reference,
    #: 360_stitcher/timed.cpp:598-606).
    update_masks: bool = False
    #: Dump match / solved-mesh visualizations from each recalibration
    #: into viz_dir (VISUALIZE_MATCHES / VISUALIZE_WARPED, defs.h:62-64).
    visualize_matches: bool = False
    visualize_mesh: bool = False
    viz_dir: str = "viz"

    # --- output / consumer (defs.h:39-40,35-36,28-33,41) ---
    output_width: int = 4096
    output_height: int = 2048
    keep_aspect_ratio: bool = True
    add_black_bars: bool = False
    save_video: bool = False
    show_out: bool = False
    send_results: bool = False
    send_height_info: bool = True
    #: Runner pipeline shape: "inline" = one host thread (acquire ->
    #: stage -> dispatch -> consume over an in-flight ring; async dispatch
    #: provides the overlap), "threaded" = reference-shaped 3-stage thread
    #: pipeline, "auto" = inline on small hosts / light consumption (see
    #: pipeline/runner.py module docstring)
    pipeline_mode: str = "auto"
    #: bound on the results queue (timed.cpp:141-151 RESULTS_MAX_SIZE).
    #: Nonzero by default: with async dispatch the results queue is what
    #: bounds how far the stitch loop runs ahead of consumer-confirmed
    #: completion — unbounded (0) + a slow consumer would pin pano-sized
    #: device buffers without limit (ADVICE r3). 0 = unbounded (opt-in,
    #: threaded mode only — the inline loop's in-flight ring must be
    #: finite, so inline treats 0 as the default depth 4 and logs it).
    results_max_size: int = 4
    clear_buffers: bool = False
    #: write a jax.profiler device trace of the first trace_frames stitched
    #: frames here (TensorBoard/Perfetto readable); "" = off
    trace_dir: str = ""
    trace_frames: int = 20

    # --- live capture plane (defs.h:8,10-20,38) ---
    use_stream: bool = False
    capture_tcp_port: int = 6666
    capture_img_width: int = 1920
    capture_img_height: int = 1620        # NV12: H*1.5 rows of bytes
    player_address: str = "localhost"
    player_tcp_port: int = 55555
    client_addr_start: int = 41
    #: opt-in framed capture wire protocol (magic+seq+len header per
    #: frame): lets the ingest resynchronize after byte loss and count
    #: dropped frames. Off = the reference's raw NV12 stream
    #: (networking.cpp:15-65), which shears forever on a lost byte.
    capture_framing: bool = False
    #: camera-slot assignment: True = accept order (local rigs / tests,
    #: where every board connects from the same address); False = the
    #: reference's fixed-IP scheme, slot = last address octet -
    #: client_addr_start (networking.cpp:17, defs.h:31) — use on
    #: production rigs so slots survive connect races and reconnects.
    capture_debug_order: bool = True

    # --- file input (defs.h:22-24,44,74) ---
    video_files: Tuple[str, ...] = ()
    skip_frames: int = 0
    offsets: Tuple[int, ...] = ()

    # --- TPU-specific knobs (no reference equivalent) ---
    #: Blend pyramid math: "bfloat16" = fast MXU passes AND bf16-stored
    #: pyramid tensors (default; halves blend HBM traffic, measured 56 dB
    #: against the f32 chain — far inside the reference's own +-3/255
    #: tolerance, test_blenders.cuda.cpp:95), "float32" = exact.
    blend_dtype: str = "bfloat16"
    #: Fuse compose-resize + global warp + mesh warp into one backward map
    #: (the TPU-native fast path). Disable for bit-closer reference parity.
    fuse_maps: bool = True
    #: Coordinate convention for the backward warp maps. "exact" (default)
    #: evaluates the cylindrical backward projection with SOURCE-resolution
    #: intrinsics, so map values land directly in warp-source pixels.
    #: "reference" reproduces calibration.cpp:171-213 + timed.cpp:75-90:
    #: intrinsics naively scaled by the ideal compose_work_aspect, maps
    #: built in compose coordinates, then converted back through the
    #: rounded compose size — which bakes in a constant 0.5*(1-s)/s px
    #: offset (naive pp*s scaling vs the cv2 resize pixel-center
    #: convention) plus an int-truncation scale error of up to ~0.7 px at
    #: frame edges. Measured on the scene-truth harness (bench.py):
    #: "reference" = 36.1 dB, "exact" = see psnr_vs_scene_db. Parity
    #: tests/keys vs the cv2 gold select "reference" explicitly.
    map_convention: str = "exact"
    #: Use the Pallas strip-warp kernel (ops/remap_strips) for the per-frame
    #: resample on TPU; falls back to the XLA gather when off or unsupported
    #: (CPU backend, source width not 128-aligned).
    use_pallas_remap: bool = True
    #: devices along the camera axis for multi-chip stitching (1 = single chip)
    camera_shards: int = 1
    #: deadline (ms) on every live-loop device sync — the per-frame
    #: completion read, the full-frame download, frame staging. Past it
    #: the Runner logs + drops the frame and keeps running instead of
    #: blocking forever (the TPU-plane analog of the reference ingest's
    #: 3-failed-recv client drop, networking.cpp:29-37; the tunneled dev
    #: link has measured minutes-long wedges inside jax.Array._value).
    #: 0 disables (unbounded syncs).
    sync_timeout_ms: float = 10000.0

    # ------------------------------------------------------------------
    def __post_init__(self):
        if self.yaws is not None and len(self.yaws) != self.num_images:
            raise ValueError("yaws must have num_images entries")
        if self.offsets and len(self.offsets) != self.num_images:
            raise ValueError("offsets must have num_images entries")
        if self.blend_type not in ("multiband", "feather", "none"):
            raise ValueError(f"unknown blend_type {self.blend_type!r}")
        if self.blend_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown blend_dtype {self.blend_dtype!r}")
        if self.map_convention not in ("exact", "reference"):
            raise ValueError(
                f"unknown map_convention {self.map_convention!r}")
        if len(self.alphas) != 4:
            # the CPW solve indexes alphas[0..3] (defs.h ALPHAS[4]); a
            # short CLI/JSON list otherwise crashed the recalib thread
            # mid-run with IndexError instead of failing at parse time
            raise ValueError(f"alphas needs 4 entries, got "
                             f"{len(self.alphas)}")
        if self.pipeline_mode not in ("auto", "inline", "threaded"):
            # a typo otherwise silently fell back to the auto heuristic,
            # ignoring the user's explicit choice
            raise ValueError(
                f"unknown pipeline_mode {self.pipeline_mode!r}")

    # --- scale math (360_stitcher/calibration.cpp:269-281,147-153) ---
    @property
    def full_area(self) -> int:
        return self.input_width * self.input_height

    @property
    def work_scale(self) -> float:
        if self.work_megapix < 0:
            return 1.0
        return min(1.0, (self.work_megapix * 1e6 / self.full_area) ** 0.5)

    @property
    def seam_scale(self) -> float:
        if self.seam_megapix < 0:      # same full-res convention as
            return 1.0                 # work/compose (negative ** 0.5
        return min(1.0, (self.seam_megapix * 1e6 / self.full_area) ** 0.5)

    @property
    def compose_scale(self) -> float:
        if self.compose_megapix < 0:
            return 1.0
        return min(1.0, (self.compose_megapix * 1e6 / self.full_area) ** 0.5)

    @property
    def seam_work_aspect(self) -> float:
        return self.seam_scale / self.work_scale

    @property
    def compose_work_aspect(self) -> float:
        return self.compose_scale / self.work_scale

    def camera_yaws(self) -> List[float]:
        import math
        if self.yaws is not None:
            return list(self.yaws)
        return [2.0 * math.pi * i / self.num_images for i in range(self.num_images)]

    # --- serialization ---
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "StitcherConfig":
        data = json.loads(text)
        for k in ("yaws", "video_files", "offsets", "alphas"):
            if k in data and data[k] is not None:
                data[k] = tuple(data[k])
        return cls(**data)

    @classmethod
    def from_file(cls, path: str) -> "StitcherConfig":
        with open(path) as f:
            return cls.from_json(f.read())

    @classmethod
    def from_args(cls, argv: Optional[Sequence[str]] = None) -> "StitcherConfig":
        """CLI over the config surface: --config file.json plus per-field overrides."""
        parser = argparse.ArgumentParser(description="TPU 360 video stitcher")
        parser.add_argument("--config", type=str, default=None)
        for f in dataclasses.fields(cls):
            name = "--" + f.name.replace("_", "-")
            if f.type in ("bool", bool):
                parser.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                                    default=None)
            elif f.type in ("int", int):
                parser.add_argument(name, type=int, default=None)
            elif f.type in ("float", float):
                parser.add_argument(name, type=float, default=None)
            elif f.name in ("video_files",):
                parser.add_argument(name, type=str, nargs="*", default=None)
            elif f.name in ("offsets", "yaws", "alphas"):
                parser.add_argument(name, type=float, nargs="*", default=None)
            else:
                parser.add_argument(name, type=str, default=None)
        ns = parser.parse_args(argv)
        cfg = cls.from_file(ns.config) if ns.config else cls()
        overrides = {}
        for f in dataclasses.fields(cls):
            v = getattr(ns, f.name, None)
            if v is not None:
                if f.name in ("offsets",):
                    v = tuple(int(x) for x in v)
                elif f.name in ("yaws", "alphas"):
                    v = tuple(float(x) for x in v)
                elif f.name == "video_files":
                    v = tuple(v)
                overrides[f.name] = v
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        return cfg
