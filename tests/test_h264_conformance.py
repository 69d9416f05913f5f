"""Independent H.264 I_PCM conformance parse of the certification
vector (_h264_ipcm_frame).

The pyav decode test skips in this container, so the hand-assembled
Annex-B access unit used to ship structurally-checked but never
actually PARSED per spec — which let a missing dec_ref_pic_marking()
(ITU-T H.264 7.3.3: two flags required on every nal_ref_idc != 0 IDR
slice, ADVICE r8 medium) go unnoticed. This module is a from-scratch,
spec-section-by-spec-section bitstream reader for exactly the
conformance point the vector claims (Baseline, CAVLC, frame_mbs_only,
pic_order_cnt_type 2, all-I_PCM macroblocks): it consumes every
syntax element the spec requires, so any missing/extra header bit
shifts the following Exp-Golomb codes and the parse fails loudly.
For I_PCM the 'decode' after the header IS sample reconstruction —
raw 4:2:0 samples — so the frame check is bit-exact with zero codec
dependencies.
"""

import pytest

from distributed_system_mapreduce_spark.operators import multimodal as M


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit cursor

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos // 8]
            v = (v << 1) | ((byte >> (7 - self.pos % 8)) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:  # 9.1
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            assert zeros < 32, "runaway Exp-Golomb prefix"
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:  # 9.1.1
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self) -> None:
        while self.pos % 8:
            assert self.u(1) == 0, "pcm_alignment_zero_bit must be 0"

    def bytes_(self, n: int) -> bytes:
        assert self.pos % 8 == 0
        start = self.pos // 8
        self.pos += 8 * n
        return self.data[start:start + n]

    def rbsp_trailing_bits(self) -> None:  # 7.3.2.11
        assert self.u(1) == 1, "rbsp_stop_one_bit"
        while self.pos % 8:
            assert self.u(1) == 0, "rbsp_alignment_zero_bit"

    def exhausted(self) -> bool:
        return self.pos == 8 * len(self.data)


def _unescape(nal: bytes) -> bytes:
    """Reverse emulation-prevention: drop 0x03 after 00 00 (7.4.1)."""
    out, zeros = bytearray(), 0
    i = 0
    while i < len(nal):
        b = nal[i]
        if zeros >= 2 and b == 3:
            assert i + 1 < len(nal) and nal[i + 1] <= 3, \
                "emulation_prevention_three_byte must precede 00-03"
            zeros = 0
            i += 1
            continue
        zeros = zeros + 1 if b == 0 else 0
        out.append(b)
        i += 1
    return bytes(out)


def _split_nals(au: bytes):
    parts = au.split(b"\x00\x00\x00\x01")
    assert parts[0] == b""
    out = []
    for p in parts[1:]:
        header, rbsp = p[0], _unescape(p[1:])
        assert header >> 7 == 0, "forbidden_zero_bit"
        out.append(((header >> 5) & 3, header & 0x1F, rbsp))
    return out


def parse_sps(r: BitReader):
    """7.3.2.1.1 for profile_idc 66 (no chroma_format_idc branch)."""
    profile = r.u(8)
    assert profile == 66, "certification vector claims Baseline"
    r.u(8)  # constraint flags + reserved
    r.u(8)  # level_idc
    assert r.ue() == 0  # seq_parameter_set_id
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    assert poc_type == 2, "vector pins pic_order_cnt_type 2"
    r.ue()      # max_num_ref_frames
    r.u(1)      # gaps_in_frame_num_value_allowed_flag
    wmbs = r.ue() + 1
    hmbs = r.ue() + 1
    assert r.u(1) == 1, "frame_mbs_only_flag"
    r.u(1)      # direct_8x8_inference_flag
    assert r.u(1) == 0, "frame_cropping_flag"
    assert r.u(1) == 0, "vui_parameters_present_flag"
    r.rbsp_trailing_bits()
    assert r.exhausted(), "SPS has trailing garbage"
    return {"wmbs": wmbs, "hmbs": hmbs,
            "log2_max_frame_num": log2_max_frame_num}


def parse_pps(r: BitReader):
    """7.3.2.2 (Baseline: no more-rbsp-data extension)."""
    assert r.ue() == 0          # pic_parameter_set_id
    assert r.ue() == 0          # seq_parameter_set_id
    entropy = r.u(1)
    assert entropy == 0, "vector pins CAVLC"
    r.u(1)                      # bottom_field_pic_order_in_frame
    assert r.ue() == 0          # num_slice_groups_minus1
    r.ue()                      # num_ref_idx_l0_default_active_minus1
    r.ue()                      # num_ref_idx_l1_default_active_minus1
    r.u(1)                      # weighted_pred_flag
    r.u(2)                      # weighted_bipred_idc
    r.se()                      # pic_init_qp_minus26
    r.se()                      # pic_init_qs_minus26
    r.se()                      # chroma_qp_index_offset
    deblock_present = r.u(1)
    r.u(1)                      # constrained_intra_pred_flag
    r.u(1)                      # redundant_pic_cnt_present_flag
    r.rbsp_trailing_bits()
    assert r.exhausted(), "PPS has trailing garbage"
    return {"deblock_present": deblock_present}


def parse_idr_slice(r: BitReader, sps: dict, pps: dict,
                    nal_ref_idc: int):
    """7.3.3 slice_header + 7.3.4 slice_data for an all-I_PCM
    CAVLC I slice, returning the reconstructed (luma, cb, cr)
    sample planes (I_PCM decoding process, 8.3.5)."""
    assert r.ue() == 0          # first_mb_in_slice
    slice_type = r.ue()
    assert slice_type % 5 == 2, "must be an I slice"
    assert r.ue() == 0          # pic_parameter_set_id
    r.u(sps["log2_max_frame_num"])  # frame_num
    # frame_mbs_only_flag == 1 -> no field_pic_flag
    r.ue()                      # idr_pic_id (IdrPicFlag == 1)
    # pic_order_cnt_type 2 -> no POC syntax
    # I slice -> no ref_pic_list modification / reordering
    # 7.3.3: dec_ref_pic_marking() iff nal_ref_idc != 0; for IDR it
    # is exactly these two flags. THIS is the element the r8 advice
    # found missing — an old-format stream fails right here (the two
    # absent bits shift slice_qp_delta and the first mb_type).
    if nal_ref_idc != 0:
        r.u(1)                  # no_output_of_prior_pics_flag
        r.u(1)                  # long_term_reference_flag
    r.se()                      # slice_qp_delta
    if pps["deblock_present"]:
        r.ue()                  # disable_deblocking_filter_idc ...
    n_mbs = sps["wmbs"] * sps["hmbs"]
    luma, cb, cr = bytearray(), bytearray(), bytearray()
    for _ in range(n_mbs):
        mb_type = r.ue()
        assert mb_type == 25, f"expected I_PCM (25), got {mb_type}"
        r.byte_align()          # pcm_alignment_zero_bit
        luma += r.bytes_(256)
        chroma = r.bytes_(128)
        cb += chroma[:64]
        cr += chroma[64:]
    r.rbsp_trailing_bits()
    assert r.exhausted(), "slice has bits past rbsp_trailing_bits"
    return bytes(luma), bytes(cb), bytes(cr)


@pytest.mark.parametrize("wmbs,hmbs,luma", [(2, 2, 200), (1, 3, 0),
                                            (4, 2, 255), (2, 2, 17)])
def test_ipcm_access_unit_parses_and_reconstructs(wmbs, hmbs, luma):
    au = M._h264_ipcm_frame(wmbs, hmbs, luma)
    nals = _split_nals(au)
    assert [(ri, t) for ri, t, _ in nals] == [(3, 7), (3, 8), (3, 5)]
    sps = parse_sps(BitReader(nals[0][2]))
    assert (sps["wmbs"], sps["hmbs"]) == (wmbs, hmbs)
    pps = parse_pps(BitReader(nals[1][2]))
    y, cb, cr = parse_idr_slice(
        BitReader(nals[2][2]), sps, pps, nal_ref_idc=nals[2][0])
    n_mbs = wmbs * hmbs
    assert y == bytes([luma]) * (256 * n_mbs)
    assert cb == cr == bytes([128]) * (64 * n_mbs)


def test_parser_rejects_stream_missing_dec_ref_pic_marking():
    """Re-assemble the r8-buggy slice (idr_pic_id directly followed
    by slice_qp_delta) and prove the spec parser REJECTS it — i.e.
    this test suite would have caught the advice finding."""
    wmbs = hmbs = 2
    sl = M._BitWriter()
    sl.ue(0)
    sl.ue(7)
    sl.ue(0)
    sl.u(0, 4)
    sl.ue(0)
    sl.se(0)  # slice_qp_delta immediately after idr_pic_id (the bug)
    for _ in range(wmbs * hmbs):
        sl.ue(25)
        sl.align()
        sl.raw_bytes(bytes([200]) * 256)
        sl.raw_bytes(bytes([128]) * 128)
    sl.stop()
    rbsp = M._ep_escape(sl.tobytes())
    good = M._h264_ipcm_frame(wmbs, hmbs, 200)
    sps_n, pps_n, _ = _split_nals(good)
    sps = parse_sps(BitReader(sps_n[2]))
    pps = parse_pps(BitReader(pps_n[2]))
    with pytest.raises(AssertionError):
        parse_idr_slice(BitReader(_unescape(rbsp)), sps, pps,
                        nal_ref_idc=3)


def test_avi_wrapped_frames_parse_per_frame():
    """Every frame the AVI container carries is its own conformant
    access unit at the documented per-frame luma."""
    doc_id, nf = 5, 2
    payload = M._encode_avi_h264_ipcm(doc_id, nf=nf)

    frames = []

    def walk(pos, end):
        for cc, sub, body, stop in M._riff_chunks(payload, pos, end):
            if cc == b"LIST":
                walk(body, stop)
            elif cc[2:4] in (b"db", b"dc") and cc[:2].isdigit():
                frames.append(payload[body:stop])

    walk(12, len(payload))
    assert len(frames) == nf
    for f, au in enumerate(frames):
        nals = _split_nals(au)
        sps = parse_sps(BitReader(nals[0][2]))
        pps = parse_pps(BitReader(nals[1][2]))
        y, _, _ = parse_idr_slice(
            BitReader(nals[2][2]), sps, pps, nal_ref_idc=nals[2][0])
        want = (doc_id * 37 + f * 29) % 256
        assert y == bytes([want]) * len(y)
