"""H.264 bitstream layer + I_PCM codec tests (operators/h264.py).

The in-engine scope is the NAL/SPS/PPS/slice-header layers plus
bit-exact I_PCM frames; CAVLC/CABAC entropy decode is permanently
gated (module docstring records the decision) — the gate itself is
asserted here so it cannot silently widen or vanish.
"""

import numpy as np
import pytest

from cds_etl_spark.operators.h264 import (
    _BitReader,
    _BitWriter,
    annexb_split,
    avcc_to_annexb,
    build_pps,
    build_sps,
    decode_h264,
    encode_h264_ipcm,
    ep_escape,
    ep_unescape,
    parse_pps,
    parse_sps,
    probe_h264,
    _rgb_to_yuv420,
    _yuv420_to_rgb,
)


def test_exp_golomb_roundtrip():
    w = _BitWriter()
    vals_ue = [0, 1, 2, 3, 7, 8, 254, 255, 1023]
    vals_se = [0, 1, -1, 2, -2, 17, -31]
    for v in vals_ue:
        w.ue(v)
    for v in vals_se:
        w.se(v)
    w.rbsp_trailing()
    r = _BitReader(w.tobytes())
    assert [r.ue() for _ in vals_ue] == vals_ue
    assert [r.se() for _ in vals_se] == vals_se


def test_emulation_prevention_roundtrip():
    # Sequences that NEED escaping: raw 00 00 0x patterns.
    payloads = [
        b"\x00\x00\x00\x00\x01",
        b"\x00\x00\x01\x02\x03",
        b"\xff\x00\x00\x02\x00\x00\x03\x00\x00",
        bytes(range(256)) * 3,
        b"\x00" * 64,
    ]
    for p in payloads:
        esc = ep_escape(p)
        # No start-code emulation survives in the escaped form.
        assert b"\x00\x00\x00" not in esc
        assert b"\x00\x00\x01" not in esc
        assert b"\x00\x00\x02" not in esc
        assert ep_unescape(esc) == p


def test_sps_pps_roundtrip_and_fields():
    for w_px, h_px in [(64, 48), (18, 34), (320, 240), (2, 2)]:
        sps = parse_sps(build_sps(w_px, h_px))
        assert sps["profile_idc"] == 66
        assert sps["width"] == w_px and sps["height"] == h_px, (w_px, h_px)
    pps = parse_pps(build_pps())
    assert pps["entropy_coding_mode"] == 0          # CAVLC
    assert pps["deblocking_control_present"] == 1
    assert pps["pic_init_qp"] == 26
    with pytest.raises(ValueError, match="2-sample units"):
        build_sps(17, 16)


def test_annexb_split_and_probe():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    stream = encode_h264_ipcm(img)
    nals = annexb_split(stream)
    assert [n[0] & 0x1F for n in nals] == [7, 8, 5]  # SPS, PPS, IDR
    info = probe_h264(stream)
    assert info["nal_types"] == ["sps", "pps", "idr"]
    assert info["idr_indices"] == [2]
    assert info["width"] == 64 and info["height"] == 48
    assert info["profile_idc"] == 66 and info["level_idc"] == 30


def test_ipcm_roundtrip_is_sample_exact():
    # I_PCM carries raw 4:2:0 samples, so decode(encode(x)) must
    # reproduce the encoder's own color-converted frame BIT-EXACTLY —
    # including odd-in-MB (crop) sizes and flat/extreme inputs that
    # stress the emulation-prevention path (long zero runs).
    rng = np.random.default_rng(7)
    cases = [
        rng.integers(0, 256, (48, 64, 3)).astype(np.uint8),
        rng.integers(0, 256, (18, 34, 3)).astype(np.uint8),
        np.zeros((16, 16, 3), np.uint8),              # all-zero: EP stress
        np.full((34, 2, 3), 255, np.uint8),
    ]
    for img in cases:
        y, cb, cr = _rgb_to_yuv420(img)
        want = _yuv420_to_rgb(y, cb, cr)
        got = decode_h264(encode_h264_ipcm(img))
        assert got.shape == img.shape
        assert np.array_equal(got, want), img.shape
    # Grayscale input upconverts like the JPEG codec.
    g = (np.mgrid[0:18, 0:22][0] * 11 % 256).astype(np.uint8)
    assert decode_h264(encode_h264_ipcm(g)).shape == (18, 22, 3)


def test_avcc_conversion_decodes():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    annexb = encode_h264_ipcm(img)
    avcc = b"".join(
        len(n).to_bytes(4, "big") + n for n in annexb_split(annexb)
    )
    assert np.array_equal(
        decode_h264(avcc_to_annexb(avcc)), decode_h264(annexb)
    )


def test_entropy_decode_gate_is_explicit():
    # A non-PCM macroblock type must raise the documented gate, not
    # misdecode: craft a stream whose first mb_type is 0 (I_4x4).
    img = np.zeros((16, 16, 3), np.uint8)
    stream = encode_h264_ipcm(img)
    nals = annexb_split(stream)
    sps_rbsp = ep_unescape(nals[0][1:])
    pps_rbsp = ep_unescape(nals[1][1:])
    # Rather than bit-surgery on the encoded slice, rebuild one whose
    # first mb_type is 0 (I_4x4) through the writer.
    from cds_etl_spark.operators.h264 import _BitWriter, _nal

    bw = _BitWriter()
    bw.ue(0)
    bw.ue(7)
    bw.ue(0)
    bw.u(0, 4)
    bw.ue(0)
    bw.u(0, 1)
    bw.u(0, 1)
    bw.se(0)
    bw.ue(1)
    bw.ue(0)                      # mb_type 0: I_4x4 — gated
    bw.rbsp_trailing()
    bad = (
        _nal(7, sps_rbsp) + _nal(8, pps_rbsp) + _nal(5, bytes(bw.tobytes()))
    )
    with pytest.raises(NotImplementedError, match="CAVLC|PyAV"):
        decode_h264(bad)
    # And the I-slice / CABAC gates:
    with pytest.raises(ValueError, match="no slice"):
        decode_h264(_nal(7, sps_rbsp) + _nal(8, pps_rbsp))


def test_mp4_avc1_ipcm_end_to_end():
    # Mux I_PCM IDR frames as an avc1 mp4 (avcC out-of-band SPS/PPS,
    # AVCC 4-byte length prefixes) and decode through the multimodal
    # _decode_bytes mp4 branch — the full container→codec path with
    # no external library.
    from cds_etl_spark.operators.h264 import (
        build_avcc_config,
        build_pps,
        build_sps,
    )
    from cds_etl_spark.operators.mp4 import encode_mp4, extract_avcc
    from cds_etl_spark.operators.multimodal import _decode_bytes

    rng = np.random.default_rng(13)
    frames_rgb = [
        rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
        for _ in range(3)
    ]
    samples = []
    for f in frames_rgb:
        annexb = encode_h264_ipcm(f)
        # Keep only the IDR NAL in samples (SPS/PPS travel in avcC).
        idr = [n for n in annexb_split(annexb) if (n[0] & 0x1F) == 5][0]
        samples.append(len(idr).to_bytes(4, "big") + idr)
    record = build_avcc_config(build_sps(48, 32), build_pps())
    mp4 = encode_mp4(samples, 48, 32, codec=b"avc1", extradata=record)
    assert extract_avcc(mp4) == record
    got = _decode_bytes(mp4, "mp4")
    assert got.shape == (3, 32, 48, 3)
    for k, f in enumerate(frames_rgb):
        y, cb, cr = _rgb_to_yuv420(f)
        assert np.array_equal(got[k], _yuv420_to_rgb(y, cb, cr)), k


def test_probe_multi_idr_and_sei_aud_inventory():
    # Keyframe-offset sharding metadata on a multi-frame stream with
    # interleaved non-VCL NALs (SEI, AUD) — probe must inventory all
    # NAL types and list every IDR index without decoding anything.
    from cds_etl_spark.operators.h264 import _nal

    rng = np.random.default_rng(15)
    imgs = [
        rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        for _ in range(3)
    ]
    streams = [encode_h264_ipcm(im) for im in imgs]
    nals0 = annexb_split(streams[0])
    sps_nal = b"\x00\x00\x00\x01" + nals0[0]
    pps_nal = b"\x00\x00\x00\x01" + nals0[1]
    idrs = [
        b"\x00\x00\x00\x01"
        + [n for n in annexb_split(s) if (n[0] & 0x1F) == 5][0]
        for s in streams
    ]
    sei = _nal(6, b"\x05\x04test\x80", ref_idc=0)   # payload arbitrary
    aud = _nal(9, b"\x10", ref_idc=0)
    stream = sps_nal + pps_nal + aud + idrs[0] + sei + idrs[1] + idrs[2]
    info = probe_h264(stream)
    assert info["nal_types"] == [
        "sps", "pps", "aud", "idr", "sei", "idr", "idr",
    ]
    assert info["idr_indices"] == [3, 5, 6]
    assert info["width"] == 16 and info["height"] == 16


def test_non_idr_i_slice_decodes():
    # A conformant t=1 (non-IDR) I slice omits idr_pic_id and carries
    # dec_ref_pic_marking only when nal_ref_idc != 0 — routing it
    # through the IDR header parse desynced the bit reader (r9
    # ADVICE). Re-emit an I_PCM frame's slice with the non-IDR header
    # in both ref_idc variants and require sample-exact decode.
    from cds_etl_spark.operators.h264 import (
        _nal,
        _pad_mb,
    )

    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (16, 32, 3)).astype(np.uint8)
    y, cb, cr = _rgb_to_yuv420(img)
    yp, cbp, crp = _pad_mb(y, 16), _pad_mb(cb, 8), _pad_mb(cr, 8)
    mbs_y, mbs_x = yp.shape[0] // 16, yp.shape[1] // 16

    def non_idr_slice(ref_idc):
        bw = _BitWriter()
        bw.ue(0)                     # first_mb_in_slice
        bw.ue(7)                     # slice_type: I (all slices)
        bw.ue(0)                     # pps id
        bw.u(0, 4)                   # frame_num
        # no idr_pic_id on t=1
        if ref_idc:
            bw.u(0, 1)               # adaptive_ref_pic_marking_mode_flag
        bw.se(0)                     # slice_qp_delta
        bw.ue(1)                     # disable_deblocking_filter_idc
        for my in range(mbs_y):
            for mx in range(mbs_x):
                bw.ue(25)
                bw.byte_align_zero()
                bw.write_bytes(
                    yp[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16]
                    .tobytes()
                )
                bw.write_bytes(
                    cbp[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8]
                    .tobytes()
                )
                bw.write_bytes(
                    crp[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8]
                    .tobytes()
                )
        bw.rbsp_trailing()
        return _nal(1, bw.tobytes(), ref_idc=ref_idc)

    want = _yuv420_to_rgb(y, cb, cr)
    head = _nal(7, build_sps(32, 16)) + _nal(8, build_pps())
    for ref_idc in (0, 2):
        got = decode_h264(head + non_idr_slice(ref_idc))
        assert np.array_equal(got, want), ref_idc


def test_poc_and_redundant_slice_header_fields():
    # Conformant streams may carry pic_order_cnt_lsb /
    # delta_pic_order_cnt[0..1] / redundant_pic_cnt in the slice header
    # (ISO 14496-10 7.3.3) depending on SPS poc_type +
    # delta_pic_order_always_zero_flag and the two PPS presence flags.
    # parse_sps used to discard delta_pic_order_always_zero_flag and the
    # slice parse never read redundant_pic_cnt — the same bit-reader
    # desync class as the r9 idr_pic_id bug (r10 ADVICE). Build each
    # variant with NONZERO field values and require sample-exact decode.
    from cds_etl_spark.operators.h264 import _nal, _pad_mb, parse_pps

    rng = np.random.default_rng(57)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    y, cb, cr = _rgb_to_yuv420(img)
    yp, cbp, crp = _pad_mb(y, 16), _pad_mb(cb, 8), _pad_mb(cr, 8)
    mbs_y, mbs_x = yp.shape[0] // 16, yp.shape[1] // 16

    def sps_rbsp(poc_type, always_zero=1):
        w = _BitWriter()
        w.u(66, 8)                   # profile_idc Baseline
        w.u(0xC0, 8)
        w.u(30, 8)                   # level_idc
        w.ue(0)                      # sps id
        w.ue(0)                      # log2_max_frame_num_minus4
        w.ue(poc_type)
        if poc_type == 0:
            w.ue(2)                  # log2_max_pic_order_cnt_lsb_minus4
        elif poc_type == 1:
            w.u(always_zero, 1)      # delta_pic_order_always_zero_flag
            w.se(0)                  # offset_for_non_ref_pic
            w.se(0)                  # offset_for_top_to_bottom_field
            w.ue(0)                  # num_ref_frames_in_poc_cycle
        w.ue(0)                      # max_num_ref_frames
        w.u(0, 1)                    # gaps_in_frame_num
        w.ue(mbs_x - 1)
        w.ue(mbs_y - 1)
        w.u(1, 1)                    # frame_mbs_only_flag
        w.u(1, 1)                    # direct_8x8_inference
        w.u(0, 1)                    # no cropping
        w.u(0, 1)                    # no vui
        w.rbsp_trailing()
        return w.tobytes()

    def pps_rbsp(bottom_field=0, redundant=0):
        w = _BitWriter()
        w.ue(0)                      # pps id
        w.ue(0)                      # sps id
        w.u(0, 1)                    # CAVLC
        w.u(bottom_field, 1)         # bottom_field_pic_order_in_frame
        w.ue(0)                      # num_slice_groups_minus1
        w.ue(0)
        w.ue(0)
        w.u(0, 1)                    # weighted_pred
        w.u(0, 2)                    # weighted_bipred_idc
        w.se(0)                      # pic_init_qp_minus26
        w.se(0)                      # pic_init_qs_minus26
        w.se(0)                      # chroma_qp_index_offset
        w.u(1, 1)                    # deblocking_filter_control_present
        w.u(0, 1)                    # constrained_intra_pred
        w.u(redundant, 1)            # redundant_pic_cnt_present
        w.rbsp_trailing()
        return w.tobytes()

    def idr_slice(poc_fields=(), redundant=None):
        bw = _BitWriter()
        bw.ue(0)                     # first_mb_in_slice
        bw.ue(7)                     # slice_type I
        bw.ue(0)                     # pps id
        bw.u(0, 4)                   # frame_num
        bw.ue(3)                     # idr_pic_id (nonzero-ish)
        for kind, val in poc_fields:
            if kind == "u6":
                bw.u(val, 6)         # pic_order_cnt_lsb (log2=6)
            else:
                bw.se(val)
        if redundant is not None:
            bw.ue(redundant)         # redundant_pic_cnt
        bw.u(1, 1)                   # no_output_of_prior_pics
        bw.u(0, 1)                   # long_term_reference_flag
        bw.se(0)                     # slice_qp_delta
        bw.ue(1)                     # disable_deblocking_filter_idc
        for my in range(mbs_y):
            for mx in range(mbs_x):
                bw.ue(25)
                bw.byte_align_zero()
                bw.write_bytes(
                    yp[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16]
                    .tobytes()
                )
                bw.write_bytes(
                    cbp[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8]
                    .tobytes()
                )
                bw.write_bytes(
                    crp[8 * my : 8 * my + 8, 8 * mx : 8 * mx + 8]
                    .tobytes()
                )
        bw.rbsp_trailing()
        return _nal(5, bw.tobytes())

    want = _yuv420_to_rgb(y, cb, cr)
    cases = [
        # poc type 0: pic_order_cnt_lsb, + delta_pic_order_cnt_bottom
        # when the PPS bottom-field flag is up
        (sps_rbsp(0), pps_rbsp(), [("u6", 37)], None),
        (sps_rbsp(0), pps_rbsp(bottom_field=1), [("u6", 37), ("se", -3)],
         None),
        # poc type 1, always_zero=0: delta_pic_order_cnt[0] (+[1])
        (sps_rbsp(1, always_zero=0), pps_rbsp(), [("se", -5)], None),
        (sps_rbsp(1, always_zero=0), pps_rbsp(bottom_field=1),
         [("se", -5), ("se", 7)], None),
        # poc type 1, always_zero=1: NO poc fields (no over-read)
        (sps_rbsp(1, always_zero=1), pps_rbsp(), [], None),
        # redundant_pic_cnt read when the PPS flag is up (poc type 2)
        (sps_rbsp(2), pps_rbsp(redundant=1), [], 4),
        # everything at once
        (sps_rbsp(1, always_zero=0), pps_rbsp(bottom_field=1, redundant=1),
         [("se", 9), ("se", -1)], 2),
    ]
    for i, (sps_b, pps_b, poc_fields, red) in enumerate(cases):
        pps = parse_pps(pps_b)
        assert pps["redundant_pic_cnt_present"] == (red is not None), i
        stream = (
            _nal(7, sps_b) + _nal(8, pps_b)
            + idr_slice(poc_fields, redundant=red)
        )
        got = decode_h264(stream)
        assert np.array_equal(got, want), f"case {i} desynced"
