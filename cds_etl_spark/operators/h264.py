"""H.264/AVC bitstream layer + I_PCM baseline codec (pure numpy /
stdlib — no external codec library).

Scope — the r9 decision closing the r8 verdict's task 6 ("decide the
H.264 story"):

* **Implemented, tested, exact**: the NAL unit layer (Annex-B
  framing, emulation-prevention escape/unescape, AVCC length-prefix
  conversion), Exp-Golomb bit I/O, SPS/PPS parse + build (baseline
  profile), IDR slice headers, and a full encoder/decoder for
  IDR frames whose macroblocks are **I_PCM** — the one macroblock
  type H.264 specifies losslessly (raw 4:2:0 samples), so the
  round-trip is bit-exact and independently checkable against the
  spec's syntax tables rather than only against itself.

* **Permanently gated**: CAVLC/CABAC entropy decode of predicted
  macroblocks (`decode_h264` raises NotImplementedError naming the
  PyAV escape hatch). Rationale, recorded here so it stops being an
  implicit TODO: (1) at 100 TB, frame pixel decode happens ONCE at
  ingest on hardware decoders (NVDEC-class ASICs decode ~100×
  realtime; a pure-Python CAVLC loop measures ~10⁻³× — six orders
  of magnitude, and unlike JPEG's straight-line Huffman tables the
  hot loop is context-adaptive and cannot be vectorized across
  blocks); (2) everything the ENGINE itself must do with video at
  scale — shard on keyframe boundaries, extract resolution/profile/
  level for partition planning, sample frames by index, detect scene
  cuts from sample sizes — needs exactly the container + header
  layers implemented here plus operators/mp4.py, not entropy decode;
  (3) a from-memory CAVLC table set could only be validated against
  its own encoder in this sandbox (no reference decoder, no
  network), and a self-consistent-but-wrong VLC table ships silent
  corruption on wild streams — the JPEG codec never had this risk
  because T.81's tables are small and its battery cross-checks
  encoder and decoder through independent structural parses.

Reference parity note: the reference pipeline (CBIIT/cds-etl) has no
video surface at all; this module exists for the beyond-reference
multimodal inventory (SURVEY.md §2.4) where blob columns carry
training media.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Exp-Golomb bit I/O
# --------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("invalid Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def byte_align(self) -> None:
        while self.pos & 7:
            self.pos += 1

    def read_bytes(self, n: int) -> bytes:
        assert (self.pos & 7) == 0
        start = self.pos >> 3
        self.pos += 8 * n
        return self.data[start : start + n]


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def byte_align_zero(self) -> None:
        while len(self.bits) & 7:
            self.bits.append(0)

    def write_bytes(self, b: bytes) -> None:
        assert (len(self.bits) & 7) == 0
        for byte in b:
            self.u(byte, 8)

    def rbsp_trailing(self) -> None:
        self.bits.append(1)
        self.byte_align_zero()

    def tobytes(self) -> bytes:
        assert (len(self.bits) & 7) == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for bit in self.bits[i : i + 8]:
                v = (v << 1) | bit
            out.append(v)
        return bytes(out)


# --------------------------------------------------------------------------
# NAL layer: emulation prevention + Annex-B / AVCC framing
# --------------------------------------------------------------------------


def ep_escape(rbsp: bytes) -> bytes:
    """Insert emulation-prevention 0x03 bytes (7.4.1.1): any
    00 00 {00,01,02,03} in the raw payload becomes 00 00 03 xx."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def ep_unescape(ebsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    n = len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2 and b == 3 and i + 1 < n and ebsp[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def annexb_split(data: bytes) -> list[bytes]:
    """Split an Annex-B stream into NAL units (header byte included,
    start codes stripped, emulation prevention NOT yet removed)."""
    nals = []
    i = 0
    n = len(data)
    starts = []
    while i < n - 2:
        if data[i] == 0 and data[i + 1] == 0:
            if data[i + 2] == 1:
                starts.append((i, i + 3))
                i += 3
                continue
            if i < n - 3 and data[i + 2] == 0 and data[i + 3] == 1:
                starts.append((i, i + 4))
                i += 4
                continue
        i += 1
    for k, (s, payload) in enumerate(starts):
        end = starts[k + 1][0] if k + 1 < len(starts) else n
        nals.append(data[payload:end])
    return nals


def avcc_to_annexb(data: bytes, nal_length_size: int = 4) -> bytes:
    """Convert AVCC length-prefixed NAL framing (mp4 sample payloads)
    to Annex-B start codes."""
    out = bytearray()
    i = 0
    n = len(data)
    while i + nal_length_size <= n:
        ln = int.from_bytes(data[i : i + nal_length_size], "big")
        i += nal_length_size
        out += b"\x00\x00\x00\x01" + data[i : i + ln]
        i += ln
    return bytes(out)


def _nal(nal_type: int, rbsp: bytes, ref_idc: int = 3) -> bytes:
    return (
        b"\x00\x00\x00\x01"
        + bytes([(ref_idc << 5) | nal_type])
        + ep_escape(rbsp)
    )


# --------------------------------------------------------------------------
# SPS / PPS
# --------------------------------------------------------------------------


def build_sps(width: int, height: int) -> bytes:
    """Baseline-profile SPS RBSP for a frame-coded 4:2:0 stream.
    Even dims required: the 4:2:0 cropping unit is 2 samples, so odd
    frame sizes are unrepresentable in this chroma format."""
    if width % 2 or height % 2:
        raise ValueError("4:2:0 frame cropping works in 2-sample units")
    w_mbs = (width + 15) // 16
    h_mbs = (height + 15) // 16
    crop_r = (16 * w_mbs - width) // 2
    crop_b = (16 * h_mbs - height) // 2
    w = _BitWriter()
    w.u(66, 8)                       # profile_idc: Baseline
    w.u(0xC0, 8)                     # constraint_set0+1, reserved 0
    w.u(30, 8)                       # level_idc 3.0
    w.ue(0)                          # seq_parameter_set_id
    w.ue(0)                          # log2_max_frame_num_minus4
    w.ue(2)                          # pic_order_cnt_type
    w.ue(0)                          # max_num_ref_frames
    w.u(0, 1)                        # gaps_in_frame_num_allowed
    w.ue(w_mbs - 1)
    w.ue(h_mbs - 1)
    w.u(1, 1)                        # frame_mbs_only_flag
    w.u(1, 1)                        # direct_8x8_inference_flag
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)                        # vui_parameters_present_flag
    w.rbsp_trailing()
    return w.tobytes()


def parse_sps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    profile = r.u(8)
    r.u(8)                           # constraint flags + reserved
    level = r.u(8)
    r.ue()                           # sps id
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        chroma = r.ue()
        if chroma == 3:
            r.u(1)
        r.ue()                       # bit_depth_luma_minus8
        r.ue()                       # bit_depth_chroma_minus8
        r.u(1)                       # qpprime_y_zero_transform_bypass
        if r.u(1):                   # seq_scaling_matrix_present
            raise NotImplementedError("scaling matrices not supported")
    log2_mfn = r.ue() + 4
    poc_type = r.ue()
    log2_max_poc_lsb = 0
    delta_poc_always_zero = 1
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        # delta_pic_order_always_zero_flag governs whether slice headers
        # carry delta_pic_order_cnt[0/1] (7.3.3) — discarding it desyncs
        # the slice bit reader (r10 ADVICE).
        delta_poc_always_zero = r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()                           # max_num_ref_frames
    r.u(1)
    w_mbs = r.ue() + 1
    h_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)                       # mb_adaptive_frame_field
    r.u(1)                           # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    h_mbs = h_units * (1 if frame_mbs_only else 2)
    return {
        "profile_idc": profile,
        "level_idc": level,
        "log2_max_frame_num": log2_mfn,
        "pic_order_cnt_type": poc_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "delta_pic_order_always_zero": delta_poc_always_zero,
        "frame_mbs_only": frame_mbs_only,
        "width_mbs": w_mbs,
        "height_mbs": h_mbs,
        "width": 16 * w_mbs - 2 * (crop_l + crop_r),
        "height": 16 * h_mbs - 2 * (crop_t + crop_b),
        "crop": (crop_l, crop_r, crop_t, crop_b),
    }


def build_pps() -> bytes:
    w = _BitWriter()
    w.ue(0)                          # pps id
    w.ue(0)                          # sps id
    w.u(0, 1)                        # entropy_coding_mode: CAVLC
    w.u(0, 1)                        # bottom_field_pic_order
    w.ue(0)                          # num_slice_groups_minus1
    w.ue(0)                          # num_ref_idx_l0
    w.ue(0)                          # num_ref_idx_l1
    w.u(0, 1)                        # weighted_pred
    w.u(0, 2)                        # weighted_bipred_idc
    w.se(0)                          # pic_init_qp_minus26
    w.se(0)                          # pic_init_qs_minus26
    w.se(0)                          # chroma_qp_index_offset
    w.u(1, 1)                        # deblocking_filter_control_present
    w.u(0, 1)                        # constrained_intra_pred
    w.u(0, 1)                        # redundant_pic_cnt_present
    w.rbsp_trailing()
    return w.tobytes()


def parse_pps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    out = {
        "pps_id": r.ue(),
        "sps_id": r.ue(),
        "entropy_coding_mode": r.u(1),
        "bottom_field_pic_order": r.u(1),
        "num_slice_groups": r.ue() + 1,
    }
    if out["num_slice_groups"] > 1:
        raise NotImplementedError("slice groups (FMO) not supported")
    r.ue()
    r.ue()
    r.u(1)
    r.u(2)
    out["pic_init_qp"] = 26 + r.se()
    r.se()
    out["chroma_qp_index_offset"] = r.se()
    out["deblocking_control_present"] = r.u(1)
    out["constrained_intra_pred"] = r.u(1)
    out["redundant_pic_cnt_present"] = r.u(1)
    return out


# --------------------------------------------------------------------------
# Probe: the sharding-metadata operation (no frame decode needed)
# --------------------------------------------------------------------------

_NAL_NAMES = {
    1: "slice",
    5: "idr",
    6: "sei",
    7: "sps",
    8: "pps",
    9: "aud",
}


def probe_h264(data: bytes) -> dict:
    """Stream metadata WITHOUT entropy decode — what a 100 TB video
    pipeline needs for partition planning: resolution / profile /
    level from the SPS, NAL inventory, and IDR (keyframe) offsets
    usable as split points for parallel ingest."""
    nals = annexb_split(data)
    info: dict = {"n_nal": len(nals), "nal_types": [], "idr_indices": []}
    for i, nal in enumerate(nals):
        t = nal[0] & 0x1F
        info["nal_types"].append(_NAL_NAMES.get(t, str(t)))
        if t == 5:
            info["idr_indices"].append(i)
        if t == 7 and "width" not in info:
            info.update(parse_sps(ep_unescape(nal[1:])))
    return info


# --------------------------------------------------------------------------
# I_PCM codec: bit-exact 4:2:0 IDR frames
# --------------------------------------------------------------------------


def _rgb_to_yuv420(arr: np.ndarray):
    """Full-range BT.601 (same matrix as operators/jpeg.py, so media
    pipelines get identical luma statistics across codecs). Chroma is
    2×2 box-averaged then rounded half-up — exact integer policy."""
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = (
        -0.168736 * rgb[..., 0]
        - 0.331264 * rgb[..., 1]
        + 0.5 * rgb[..., 2]
        + 128
    )
    cr = (
        0.5 * rgb[..., 0]
        - 0.418688 * rgb[..., 1]
        - 0.081312 * rgb[..., 2]
        + 128
    )
    h, w = y.shape
    cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    clip = lambda p: np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def _yuv420_to_rgb(y, cb, cr):
    cbf = np.repeat(np.repeat(cb.astype(np.float64), 2, 0), 2, 1) - 128
    crf = np.repeat(np.repeat(cr.astype(np.float64), 2, 0), 2, 1) - 128
    yf = y.astype(np.float64)
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    return np.clip(
        np.floor(np.stack([r, g, b], axis=-1) + 0.5), 0, 255
    ).astype(np.uint8)


def _pad_mb(plane: np.ndarray, mb: int) -> np.ndarray:
    h, w = plane.shape
    ph = (h + mb - 1) // mb * mb
    pw = (w + mb - 1) // mb * mb
    if ph == h and pw == w:
        return plane
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_h264_ipcm(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB (or (H, W) grayscale) frame as a
    conformant Annex-B H.264 stream: SPS + PPS + one IDR slice whose
    macroblocks are all I_PCM (lossless raw 4:2:0 samples; H and W
    must be even — the 4:2:0 crop-unit constraint). Deblocking is
    disabled in the slice header (disable_deblocking_filter_idc = 1),
    which the standard permits, so decode is sample-exact."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w, _ = arr.shape
    y, cb, cr = _rgb_to_yuv420(arr)
    yp = _pad_mb(y, 16)
    cbp = _pad_mb(cb, 8)
    crp = _pad_mb(cr, 8)
    mbs_y, mbs_x = yp.shape[0] // 16, yp.shape[1] // 16

    bw = _BitWriter()
    bw.ue(0)                         # first_mb_in_slice
    bw.ue(7)                         # slice_type: I (all slices)
    bw.ue(0)                         # pps id
    bw.u(0, 4)                       # frame_num (log2_max_frame_num=4)
    bw.ue(0)                         # idr_pic_id
    bw.u(0, 1)                       # no_output_of_prior_pics
    bw.u(0, 1)                       # long_term_reference_flag
    bw.se(0)                         # slice_qp_delta
    bw.ue(1)                         # disable_deblocking_filter_idc
    for my in range(mbs_y):
        for mx in range(mbs_x):
            bw.ue(25)                # mb_type: I_PCM
            bw.byte_align_zero()     # pcm_alignment_zero_bit
            bw.write_bytes(
                yp[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16]
                .tobytes()
            )
            bw.write_bytes(
                cbp[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8].tobytes()
            )
            bw.write_bytes(
                crp[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8].tobytes()
            )
    bw.rbsp_trailing()

    return (
        _nal(7, build_sps(w, h))
        + _nal(8, build_pps())
        + _nal(5, bw.tobytes())
    )


def decode_h264(data: bytes) -> np.ndarray:
    """Decode an Annex-B H.264 IDR frame to (H, W, 3) uint8 RGB.

    Supported: baseline frame-coded 4:2:0 streams whose macroblocks
    are I_PCM (the losslessly-specified type — encode_h264_ipcm's
    output and any conformant all-PCM stream). Predicted macroblocks
    need CAVLC/CABAC entropy decode, which is permanently gated here
    (module docstring records the decision and rationale): the raise
    names the PyAV escape hatch used by operators/multimodal.py."""
    sps = None
    pps = None
    frame = None
    for nal in annexb_split(data):
        t = nal[0] & 0x1F
        rbsp = ep_unescape(nal[1:])
        if t == 7:
            sps = parse_sps(rbsp)
        elif t == 8:
            pps = parse_pps(rbsp)
        elif t in (1, 5):
            if sps is None or pps is None:
                raise ValueError("slice before SPS/PPS")
            if pps["entropy_coding_mode"]:
                raise NotImplementedError(
                    "CABAC streams need an external decoder (PyAV)"
                )
            frame = _decode_idr_slice(
                rbsp, sps, pps, idr=(t == 5), ref_idc=(nal[0] >> 5) & 3
            )
    if frame is None:
        raise ValueError("no slice NAL found")
    y, cb, cr = frame
    h, wd = sps["height"], sps["width"]
    return _yuv420_to_rgb(
        y[:h, :wd], cb[: h // 2, : wd // 2], cr[: h // 2, : wd // 2]
    )


def _decode_idr_slice(
    rbsp: bytes, sps: dict, pps: dict, idr: bool = True, ref_idc: int = 3
):
    r = _BitReader(rbsp)
    if r.ue() != 0:
        raise NotImplementedError("multi-slice frames not supported")
    slice_type = r.ue()
    if slice_type % 5 != 2:
        raise NotImplementedError(
            "only I slices decode in-engine (P/B prediction needs "
            "reference frames and entropy decode — PyAV gate)"
        )
    r.ue()                           # pps id
    r.u(sps["log2_max_frame_num"])   # frame_num
    if not sps["frame_mbs_only"]:
        if r.u(1):                   # field_pic_flag
            raise NotImplementedError(
                "field pictures (interlaced) unsupported — PyAV gate"
            )
    # idr_pic_id is present only when IdrPicFlag (ISO 14496-10 7.3.3);
    # reading it on a t=1 non-IDR I slice desyncs the bit reader
    # (r9 ADVICE).
    if idr:
        r.ue()                       # idr_pic_id
    # POC slice-header fields (7.3.3) — field_pic_flag is gated above,
    # so the bottom-field variants apply whenever the PPS flag is set.
    if sps["pic_order_cnt_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])  # pic_order_cnt_lsb
        if pps["bottom_field_pic_order"]:
            r.se()                   # delta_pic_order_cnt_bottom
    elif (
        sps["pic_order_cnt_type"] == 1
        and not sps["delta_pic_order_always_zero"]
    ):
        r.se()                       # delta_pic_order_cnt[0]
        if pps["bottom_field_pic_order"]:
            r.se()                   # delta_pic_order_cnt[1]
    if pps["redundant_pic_cnt_present"]:
        r.ue()                       # redundant_pic_cnt
    # dec_ref_pic_marking (7.3.3.3): IDR carries the two flags; a
    # non-IDR reference slice carries adaptive_ref_pic_marking_mode_flag
    # whose mmco loop is entropy-decode territory — gate it.
    if idr:
        r.u(1)                       # no_output_of_prior_pics
        r.u(1)                       # long_term_reference_flag
    elif ref_idc != 0:
        if r.u(1):                   # adaptive_ref_pic_marking_mode_flag
            raise NotImplementedError(
                "adaptive ref-pic marking (mmco) unsupported — PyAV gate"
            )
    r.se()                           # slice_qp_delta
    if pps["deblocking_control_present"]:
        idc = r.ue()
        if idc != 1:
            r.se()
            r.se()
    mbs_x, mbs_y = sps["width_mbs"], sps["height_mbs"]
    y = np.zeros((16 * mbs_y, 16 * mbs_x), np.uint8)
    cb = np.zeros((8 * mbs_y, 8 * mbs_x), np.uint8)
    cr = np.zeros((8 * mbs_y, 8 * mbs_x), np.uint8)
    for my in range(mbs_y):
        for mx in range(mbs_x):
            mb_type = r.ue()
            if mb_type != 25:
                raise NotImplementedError(
                    f"mb_type {mb_type} needs CAVLC residual decode — "
                    "in-engine support covers I_PCM; install PyAV "
                    "(import name 'av') for full-codec frames"
                )
            r.byte_align()
            y[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16] = (
                np.frombuffer(r.read_bytes(256), np.uint8).reshape(16, 16)
            )
            cb[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = (
                np.frombuffer(r.read_bytes(64), np.uint8).reshape(8, 8)
            )
            cr[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8] = (
                np.frombuffer(r.read_bytes(64), np.uint8).reshape(8, 8)
            )
    return y, cb, cr


def avcc_config_to_annexb(record: bytes) -> tuple[bytes, int]:
    """Parse an AVCDecoderConfigurationRecord (ISO 14496-15 §5.2.4.1)
    into (Annex-B SPS+PPS prefix, NAL length-prefix size) — the
    out-of-band parameter sets an AVCC-framed mp4 keeps in its avcC
    box rather than in the sample payloads."""
    if len(record) < 7 or record[0] != 1:
        raise ValueError("not an AVCDecoderConfigurationRecord")
    nal_len_size = (record[4] & 0x03) + 1
    out = bytearray()
    i = 5
    n_sps = record[i] & 0x1F
    i += 1
    for _ in range(n_sps):
        ln = int.from_bytes(record[i : i + 2], "big")
        i += 2
        out += b"\x00\x00\x00\x01" + record[i : i + ln]
        i += ln
    n_pps = record[i]
    i += 1
    for _ in range(n_pps):
        ln = int.from_bytes(record[i : i + 2], "big")
        i += 2
        out += b"\x00\x00\x00\x01" + record[i : i + ln]
        i += ln
    return bytes(out), nal_len_size


def build_avcc_config(sps_rbsp: bytes, pps_rbsp: bytes) -> bytes:
    """Build the avcC record for encode-side mp4 muxing (4-byte NAL
    length prefixes)."""
    sps_nal = bytes([0x67]) + ep_escape(sps_rbsp)
    pps_nal = bytes([0x68]) + ep_escape(pps_rbsp)
    return (
        bytes([1, sps_nal[1], sps_nal[2], sps_nal[3], 0xFF, 0xE1])
        + len(sps_nal).to_bytes(2, "big")
        + sps_nal
        + bytes([1])
        + len(pps_nal).to_bytes(2, "big")
        + pps_nal
    )
