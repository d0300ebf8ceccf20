"""Built-in HEVC encoder: Main profile, all-intra, every CTU coded I_PCM.

The reference links kvazaar and streams HEVC to the player
(360_stitcher/timed.cpp:198-352). This image ships no HEVC encoder
binary or library, so the egress "hevc" mode gets a self-contained
fallback codec: a spec-compliant ITU-T H.265 encoder that codes every
32x32 CTU as an I_PCM coding unit — raw 8-bit samples, loop filters
off — producing a LOSSLESS bitstream any conforming decoder accepts
(validated in tests against FFmpeg's independent hevc decoder via cv2).

Why I_PCM: pcm_flag is a CABAC *terminate* bin (H.265 table 9-48), after
which the arithmetic engine is flushed, the stream re-byte-aligns, the
samples go in raw, and the engine restarts (9.3.1). With CTB = MinCb =
PCM size = 32 there are no split flags, so the only context-coded bin in
the whole slice is part_mode (one per CTU) — the entire CABAC surface is
a handful of bins per CTU around a memcpy. That makes the encoder ~a
bitstream mux: fast enough for live egress, and bit-exact (PSNR = inf on
the I420 plane data) where kvazaar would be lossy.

Cost: PCM is uncompressed (~1.5 B/px + 3/1536 framing overhead), which
is the right trade for a LAN egress link and the only spec-compliant
option without an entropy-coded residual pipeline. When a kvazaar or
ffmpeg binary IS present, egress.py prefers it (io_plane/egress.py).

Bit-level references are to ITU-T H.265 (02/2018): NAL header 7.3.1.2,
VPS 7.3.2.1, SPS 7.3.2.2, PPS 7.3.2.3, slice header 7.3.6.1, coding
unit / pcm_sample 7.3.8.5/7.3.8.7, CABAC 9.3 (encoder side 9.3.4.3).
A C++ twin lives in native/hevc_pcm.cpp (ctypes ABI, used when built);
this module is the always-available reference implementation.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

# ---------------------------------------------------------------- tables
# H.265 table 9-46 (identical to H.264's): LPS range by (pStateIdx,
# (ivlCurrRange >> 6) & 3)
_RANGE_LPS = np.array([
    [128, 176, 208, 240], [128, 167, 197, 227], [128, 158, 187, 216],
    [123, 150, 178, 205], [116, 142, 169, 195], [111, 135, 160, 185],
    [105, 128, 152, 175], [100, 122, 144, 166], [95, 116, 137, 158],
    [90, 110, 130, 150], [85, 104, 123, 142], [81, 99, 117, 135],
    [77, 94, 111, 128], [73, 89, 105, 122], [69, 85, 100, 116],
    [66, 80, 95, 110], [62, 76, 90, 104], [59, 72, 86, 99],
    [56, 69, 81, 94], [53, 65, 77, 89], [51, 62, 73, 85],
    [48, 59, 69, 80], [46, 56, 66, 76], [43, 53, 63, 72],
    [41, 50, 59, 69], [39, 48, 56, 65], [37, 45, 54, 62],
    [35, 43, 51, 59], [33, 41, 48, 56], [32, 39, 46, 53],
    [30, 37, 43, 50], [29, 35, 41, 48], [27, 33, 39, 45],
    [26, 31, 37, 43], [24, 30, 35, 41], [23, 28, 33, 39],
    [22, 27, 32, 37], [21, 26, 30, 35], [20, 24, 29, 33],
    [19, 23, 27, 31], [18, 22, 26, 30], [17, 21, 25, 28],
    [16, 20, 23, 27], [15, 19, 22, 25], [14, 18, 21, 24],
    [14, 17, 20, 23], [13, 16, 19, 22], [12, 15, 18, 21],
    [12, 14, 17, 20], [11, 14, 16, 19], [11, 13, 15, 18],
    [10, 12, 15, 17], [10, 12, 14, 16], [9, 11, 13, 15],
    [9, 11, 12, 14], [8, 10, 12, 14], [8, 9, 11, 13],
    [7, 9, 11, 12], [7, 9, 10, 12], [7, 8, 10, 11],
    [6, 8, 9, 11], [6, 7, 9, 10], [6, 7, 8, 9], [2, 2, 2, 2],
], dtype=np.int32)

# H.265 table 9-47: state transition on an LPS (MPS transition is
# min(state + 1, 62))
_TRANS_LPS = np.array([
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12, 13, 13, 15, 15,
    16, 16, 18, 18, 19, 19, 21, 21, 22, 22, 23, 24, 24, 25, 26, 26, 27,
    27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33, 33, 33, 34, 34, 35, 35,
    35, 36, 36, 36, 37, 37, 37, 38, 38, 63], dtype=np.int32)

_CTB = 32                     # CTB = MinCb = PCM size: no split flags


class _Bits:
    """MSB-first bit sink with Exp-Golomb helpers (H.265 9.2)."""

    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def u(self, val: int, width: int) -> None:
        self._acc = (self._acc << width) | (val & ((1 << width) - 1))
        self._n += width
        while self._n >= 8:
            self._n -= 8
            self.buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def ue(self, v: int) -> None:
        v += 1
        n = v.bit_length()
        self.u(0, n - 1)
        self.u(v, n)

    def se(self, v: int) -> None:                 # 9.2.3 mapping
        self.ue(2 * abs(v) - (1 if v > 0 else 0))

    def align_zero(self) -> None:
        if self._n:
            self.u(0, 8 - self._n)

    def append_bytes(self, b) -> None:
        assert self._n == 0, "appending bytes to an unaligned stream"
        self.buf += b


class _Cabac:
    """Arithmetic encoder, H.265 9.3.4.3 (EncodeDecision / EncodeTerminate
    / EncodeFlush / PutBit verbatim). Only exercises what an all-PCM
    slice needs: one context, terminate bins, and the post-PCM restart."""

    def __init__(self, bits: _Bits):
        self.b = bits
        self.low = 0
        self.range = 510
        self.outstanding = 0
        self.first = True

    def _putbit(self, v: int) -> None:
        if self.first:                  # the very first bit is discarded
            self.first = False
        else:
            self.b.u(v, 1)
        if self.outstanding:
            inv = 1 - v
            for _ in range(self.outstanding):
                self.b.u(inv, 1)
            self.outstanding = 0

    def _renorm(self) -> None:
        while self.range < 256:
            if self.low >= 512:
                self.low -= 512
                self._putbit(1)
            elif self.low < 256:
                self._putbit(0)
            else:
                self.low -= 256
                self.outstanding += 1
            self.range <<= 1
            self.low <<= 1

    def bin(self, ctx: list, binval: int) -> None:
        """EncodeDecision; ctx = [pStateIdx, valMps] (mutated)."""
        lps = int(_RANGE_LPS[ctx[0], (self.range >> 6) & 3])
        self.range -= lps
        if binval != ctx[1]:
            self.low += self.range
            self.range = lps
            if ctx[0] == 0:
                ctx[1] = 1 - ctx[1]
            ctx[0] = int(_TRANS_LPS[ctx[0]])
        else:
            ctx[0] = min(ctx[0] + 1, 62)
        self._renorm()

    def bypass(self, binval: int) -> None:
        """EncodeBypass (9.3.4.3.4) — used by the lossy intra encoder
        (io_plane/hevc_intra.py); the all-PCM slice never needs it."""
        self.low <<= 1
        if binval:
            self.low += self.range
        if self.low >= 1024:
            self.low -= 1024
            self._putbit(1)
        elif self.low < 512:
            self._putbit(0)
        else:
            self.low -= 512
            self.outstanding += 1

    def term(self, binval: int) -> None:
        self.range -= 2
        if binval:
            self.low += self.range
            self._flush()
        else:
            self._renorm()

    def _flush(self) -> None:
        self.range = 2
        self._renorm()
        self._putbit((self.low >> 9) & 1)
        self.b.u(((self.low >> 7) & 3) | 1, 2)    # last bit = stop bit

    def restart(self) -> None:                    # after pcm_sample, 9.3.1
        self.low = 0
        self.range = 510
        self.outstanding = 0
        self.first = True


def _ep_escape(rbsp: bytes) -> bytes:
    """Emulation prevention (7.4.2): 0x03 after any 00 00 preceding
    00/01/02/03. Candidates found vectorized; the (rare) fixups are a
    short Python loop."""
    a = np.frombuffer(rbsp, np.uint8)
    if len(a) < 3:
        return rbsp
    z = a == 0
    cand = np.nonzero(z[:-2] & z[1:-1] & (a[2:] <= 3))[0] + 2
    if not len(cand):
        return rbsp
    # an inserted escape breaks the zero pair spanning it, so within
    # each maximal run of CONSECUTIVE candidate positions only every
    # other one needs an escape. Fully vectorized: a Python per-
    # candidate loop degenerated on zero-heavy frames (large exact-zero
    # pano regions -> millions of candidates on a dark 4K I420 frame)
    n = len(cand)
    breaks = np.nonzero(np.diff(cand) > 1)[0] + 1        # run starts
    first = np.concatenate([[0], breaks])
    counts = np.diff(np.concatenate([first, [n]]))
    pos_in_run = np.arange(n) - np.repeat(first, counts)
    kept = cand[pos_in_run % 2 == 0]
    return np.insert(a, kept, np.uint8(3)).tobytes()


def _nal(nal_type: int, rbsp: bytes) -> bytes:
    """Annex-B NAL: start code + 2-byte header (7.3.1.2) + escaped RBSP."""
    return (b"\x00\x00\x00\x01" + bytes([nal_type << 1, 1])
            + _ep_escape(rbsp))


def _profile_tier_level(b: _Bits) -> None:
    b.u(0, 2)                   # general_profile_space
    b.u(0, 1)                   # general_tier_flag
    b.u(1, 5)                   # general_profile_idc = Main
    b.u(0x60000000, 32)         # compatibility: Main + Main10
    b.u(0b1001, 4)              # progressive, not interlaced, frame_only
    b.u(0, 43)                  # general_reserved_zero_43bits
    b.u(0, 1)                   # general_inbld_flag (reserved)
    b.u(180, 8)                 # general_level_idc = 6.0 (8K-capable;
    #                             PCM bitrates exceed every level's CPB —
    #                             decoders do not enforce that)


class PcmHevcEncoder:
    """Streaming encoder: encode(i420_bytes) -> Annex-B bytes.

    Duck-types io_plane.egress.HevcEncoder (encode/take/finish/close) so
    PlayerEgress can swap it in when no kvazaar/ffmpeg binary exists.
    Headers (VPS/SPS/PPS) are emitted before the first frame and after
    restart() — the egress reconnect path opens a fresh encoder, so every
    connection starts VPS-led exactly like the reference's
    (timed.cpp:331-348)."""

    def __init__(self, w: int, h: int):
        if w % 2 or h % 2:
            raise ValueError("I420 frame dims must be even")
        self.w, self.h = w, h
        self.pw = (w + _CTB - 1) // _CTB * _CTB
        self.ph = (h + _CTB - 1) // _CTB * _CTB
        self._headers = (self._vps() + self._sps() + self._pps())
        self._sent_headers = False

    # ----------------------------------------------------------- headers
    def _vps(self) -> bytes:
        b = _Bits()
        b.u(0, 4)               # vps_video_parameter_set_id
        b.u(1, 1)               # vps_base_layer_internal_flag
        b.u(1, 1)               # vps_base_layer_available_flag
        b.u(0, 6)               # vps_max_layers_minus1
        b.u(0, 3)               # vps_max_sub_layers_minus1
        b.u(1, 1)               # vps_temporal_id_nesting_flag
        b.u(0xFFFF, 16)         # vps_reserved_0xffff_16bits
        _profile_tier_level(b)
        b.u(0, 1)               # vps_sub_layer_ordering_info_present
        b.ue(0)                 # vps_max_dec_pic_buffering_minus1[0]
        b.ue(0)                 # vps_max_num_reorder_pics[0]
        b.ue(0)                 # vps_max_latency_increase_plus1[0]
        b.u(0, 6)               # vps_max_layer_id
        b.ue(0)                 # vps_num_layer_sets_minus1
        b.u(0, 1)               # vps_timing_info_present_flag
        b.u(0, 1)               # vps_extension_flag
        b.u(1, 1)               # rbsp_stop_one_bit
        b.align_zero()
        return _nal(32, bytes(b.buf))

    def _sps(self) -> bytes:
        b = _Bits()
        b.u(0, 4)               # sps_video_parameter_set_id
        b.u(0, 3)               # sps_max_sub_layers_minus1
        b.u(1, 1)               # sps_temporal_id_nesting_flag
        _profile_tier_level(b)
        b.ue(0)                 # sps_seq_parameter_set_id
        b.ue(1)                 # chroma_format_idc = 4:2:0
        b.ue(self.pw)           # pic_width_in_luma_samples (CTB-padded)
        b.ue(self.ph)
        pad = self.pw != self.w or self.ph != self.h
        b.u(1 if pad else 0, 1)  # conformance_window_flag
        if pad:                  # offsets in chroma units (SubWidthC = 2)
            b.ue(0)
            b.ue((self.pw - self.w) // 2)
            b.ue(0)
            b.ue((self.ph - self.h) // 2)
        b.ue(0)                 # bit_depth_luma_minus8
        b.ue(0)                 # bit_depth_chroma_minus8
        b.ue(0)                 # log2_max_pic_order_cnt_lsb_minus4
        b.u(0, 1)               # sps_sub_layer_ordering_info_present
        b.ue(0)                 # sps_max_dec_pic_buffering_minus1[0]
        b.ue(0)                 # sps_max_num_reorder_pics[0]
        b.ue(0)                 # sps_max_latency_increase_plus1[0]
        b.ue(2)                 # log2_min_luma_coding_block_size_minus3=2
        b.ue(0)                 # log2_diff_max_min: CTB = MinCb = 32
        b.ue(0)                 # log2_min_luma_transform_block_size_minus2
        b.ue(3)                 # log2_diff max TB = 32 (<= min(CTB, 32))
        b.ue(0)                 # max_transform_hierarchy_depth_inter
        b.ue(0)                 # max_transform_hierarchy_depth_intra
        b.u(0, 1)               # scaling_list_enabled_flag
        b.u(0, 1)               # amp_enabled_flag
        b.u(0, 1)               # sample_adaptive_offset_enabled_flag
        b.u(1, 1)               # pcm_enabled_flag
        b.u(7, 4)               # pcm_sample_bit_depth_luma_minus1
        b.u(7, 4)               # pcm_sample_bit_depth_chroma_minus1
        b.ue(2)                 # log2_min_pcm_luma_cb_size_minus3 = 32
        b.ue(0)                 # log2_diff_max_min_pcm
        b.u(1, 1)               # pcm_loop_filter_disabled_flag
        b.ue(0)                 # num_short_term_ref_pic_sets
        b.u(0, 1)               # long_term_ref_pics_present_flag
        b.u(0, 1)               # sps_temporal_mvp_enabled_flag
        b.u(0, 1)               # strong_intra_smoothing_enabled_flag
        b.u(0, 1)               # vui_parameters_present_flag
        b.u(0, 1)               # sps_extension_present_flag
        b.u(1, 1)
        b.align_zero()
        return _nal(33, bytes(b.buf))

    def _pps(self) -> bytes:
        b = _Bits()
        b.ue(0)                 # pps_pic_parameter_set_id
        b.ue(0)                 # pps_seq_parameter_set_id
        b.u(0, 1)               # dependent_slice_segments_enabled_flag
        b.u(0, 1)               # output_flag_present_flag
        b.u(0, 3)               # num_extra_slice_header_bits
        b.u(0, 1)               # sign_data_hiding_enabled_flag
        b.u(0, 1)               # cabac_init_present_flag
        b.ue(0)                 # num_ref_idx_l0_default_active_minus1
        b.ue(0)                 # num_ref_idx_l1_default_active_minus1
        b.se(0)                 # init_qp_minus26 (SliceQpY = 26; the
        #                         part_mode context init below assumes it)
        b.u(0, 1)               # constrained_intra_pred_flag
        b.u(0, 1)               # transform_skip_enabled_flag
        b.u(0, 1)               # cu_qp_delta_enabled_flag
        b.se(0)                 # pps_cb_qp_offset
        b.se(0)                 # pps_cr_qp_offset
        b.u(0, 1)               # pps_slice_chroma_qp_offsets_present
        b.u(0, 1)               # weighted_pred_flag
        b.u(0, 1)               # weighted_bipred_flag
        b.u(0, 1)               # transquant_bypass_enabled_flag
        b.u(0, 1)               # tiles_enabled_flag
        b.u(0, 1)               # entropy_coding_sync_enabled_flag
        b.u(0, 1)               # pps_loop_filter_across_slices_enabled
        b.u(1, 1)               # deblocking_filter_control_present_flag
        b.u(0, 1)               # deblocking_filter_override_enabled_flag
        b.u(1, 1)               # pps_deblocking_filter_disabled_flag
        #                         (PCM must pass through untouched; SAO
        #                         is off in the SPS, and
        #                         pcm_loop_filter_disabled backs both up)
        b.u(0, 1)               # pps_scaling_list_data_present_flag
        b.u(0, 1)               # lists_modification_present_flag
        b.ue(0)                 # log2_parallel_merge_level_minus2
        b.u(0, 1)               # slice_segment_header_extension_present
        b.u(0, 1)               # pps_extension_present_flag
        b.u(1, 1)
        b.align_zero()
        return _nal(34, bytes(b.buf))

    # ------------------------------------------------------------- frame
    def _pcm_blocks(self, i420: np.ndarray) -> np.ndarray:
        """[nCTU, 1536] uint8: per CTU, 32x32 luma then 16x16 Cb + Cr
        (pcm_sample order, 7.3.8.7), edge-padded to the CTB grid."""
        w, h, pw, ph = self.w, self.h, self.pw, self.ph
        y = i420[:w * h].reshape(h, w)
        u = i420[w * h:w * h + w * h // 4].reshape(h // 2, w // 2)
        v = i420[w * h + w * h // 4:].reshape(h // 2, w // 2)
        if pw != w or ph != h:
            y = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
            u = np.pad(u, ((0, (ph - h) // 2), (0, (pw - w) // 2)),
                       mode="edge")
            v = np.pad(v, ((0, (ph - h) // 2), (0, (pw - w) // 2)),
                       mode="edge")
        nr, nc = ph // _CTB, pw // _CTB

        def tiles(p, t):
            return (p.reshape(nr, t, nc, t).transpose(0, 2, 1, 3)
                    .reshape(nr * nc, t * t))

        return np.concatenate(
            [tiles(y, _CTB), tiles(u, _CTB // 2), tiles(v, _CTB // 2)],
            axis=1)

    def _slice(self, i420: np.ndarray) -> bytes:
        b = _Bits()
        b.u(1, 1)               # first_slice_segment_in_pic_flag
        b.u(0, 1)               # no_output_of_prior_pics_flag (IRAP)
        b.ue(0)                 # slice_pic_parameter_set_id
        b.ue(2)                 # slice_type = I
        b.se(0)                 # slice_qp_delta -> SliceQpY = 26
        b.u(1, 1)               # byte_alignment: alignment_bit_equal_to_1
        b.align_zero()
        cab = _Cabac(b)
        # part_mode context init (9.3.2.2): initValue 184 (table 9-26,
        # initType 0), SliceQpY 26 -> preCtxState 64 -> pState 0, MPS 1
        ctx_part = [0, 1]
        blocks = self._pcm_blocks(i420)
        n = len(blocks)
        for i in range(n):
            # coding_quadtree: CTB == MinCb -> split_cu_flag inferred 0.
            # coding_unit: I slice, intra inferred; size == MinCb ->
            # part_mode signaled; PART_2Nx2N enables pcm_flag.
            cab.bin(ctx_part, 1)        # part_mode = PART_2Nx2N
            cab.term(1)                 # pcm_flag (terminate bin + flush)
            b.align_zero()              # pcm_alignment_zero_bit
            b.append_bytes(blocks[i].tobytes())
            cab.restart()               # 9.3.1: engine re-init after PCM
            cab.term(1 if i == n - 1 else 0)    # end_of_slice_segment
        b.align_zero()          # rbsp trailing (stop bit was the flush's)
        return _nal(19, bytes(b.buf))           # IDR_W_RADL

    # --------------------------------------------- egress-facing surface
    def encode(self, i420_bytes: bytes) -> bytes:
        """Feed one raw I420 frame; returns complete Annex-B bytes
        (headers + IDR on the first call, IDR after)."""
        i420 = np.frombuffer(i420_bytes, np.uint8)
        expect = self.w * self.h * 3 // 2
        if i420.size != expect:
            raise ValueError(f"I420 frame is {i420.size} B, "
                             f"expected {expect}")
        out = self._slice(i420)
        if not self._sent_headers:
            self._sent_headers = True
            return self._headers + out
        return out

    def take(self) -> bytes:            # synchronous: nothing buffered
        return b""

    def finish(self, timeout: float = 0.0) -> bytes:
        return b""

    def close(self) -> None:
        pass


# ------------------------------------------------------- native twin
def _configure_hevcpcm(lib: ctypes.CDLL) -> None:
    lib.hevcpcm_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.hevcpcm_create.restype = ctypes.c_void_p
    lib.hevcpcm_max_size.argtypes = [ctypes.c_void_p]
    lib.hevcpcm_max_size.restype = ctypes.c_long
    lib.hevcpcm_encode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.hevcpcm_encode.restype = ctypes.c_long
    lib.hevcpcm_destroy.argtypes = [ctypes.c_void_p]
    lib.hevcpcm_destroy.restype = None


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building on demand) libhevcpcm.so, or None."""
    from video_stitcher_tpu.io_plane.native import load_or_build
    return load_or_build("libhevcpcm.so", _configure_hevcpcm)


class NativePcmHevcEncoder:
    """ctypes wrapper over native/hevc_pcm.cpp — bitstream byte-identical
    to PcmHevcEncoder (tested), ~3x faster (2.1 GB/s at 4096x2048, i.e.
    ~6 ms per panorama frame on the 1-core bench host)."""

    def __init__(self, w: int, h: int, lib: ctypes.CDLL):
        self._lib = lib
        self._enc = lib.hevcpcm_create(w, h)
        if not self._enc:
            raise ValueError(f"bad encoder dims {w}x{h}")
        self.w, self.h = w, h
        self._cap = lib.hevcpcm_max_size(self._enc)
        self._out = np.empty(self._cap, np.uint8)

    def encode(self, i420_bytes: bytes) -> bytes:
        if self._enc is None:
            # egress close()/reconnect clears encoders from another
            # thread; a NULL handle into native code would segfault the
            # whole process instead of raising a catchable error
            raise RuntimeError("encoder closed")
        expect = self.w * self.h * 3 // 2
        if len(i420_bytes) != expect:
            raise ValueError(f"I420 frame is {len(i420_bytes)} B, "
                             f"expected {expect}")
        src = np.frombuffer(i420_bytes, np.uint8)
        n = self._lib.hevcpcm_encode(
            self._enc,
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._cap)
        if n < 0:
            raise RuntimeError("hevcpcm_encode overflow")
        return self._out[:n].tobytes()

    def take(self) -> bytes:
        return b""

    def finish(self, timeout: float = 0.0) -> bytes:
        return b""

    def close(self) -> None:
        if self._enc:
            self._lib.hevcpcm_destroy(self._enc)
            self._enc = None


def create(w: int, h: int):
    """Built-in HEVC encoder: native when the library builds, else the
    pure-Python reference implementation."""
    lib = load_native()
    if lib is not None:
        try:
            return NativePcmHevcEncoder(w, h, lib)
        except (ValueError, RuntimeError):
            pass
    return PcmHevcEncoder(w, h)
