"""SPS/PPS/slice-header writers (spec 7.3.2; capability parity with
reference encoder/set.c x264_sps_write/x264_pps_write and
encoder/encoder.c slice_header_write)."""

from __future__ import annotations

from dataclasses import dataclass

from x264_tpu.bitstream.bits import BitWriter
from x264_tpu.bitstream.nal import (
    NAL_PPS,
    NAL_PRIORITY_HIGHEST,
    NAL_SLICE,
    NAL_SLICE_IDR,
    NAL_SPS,
    make_nal,
)
from x264_tpu.params import EncoderParams

SLICE_P, SLICE_B, SLICE_I = 0, 1, 2


@dataclass
class SpsInfo:
    profile_idc: int
    level_idc: int
    log2_max_frame_num: int = 8
    poc_type: int = 2
    num_ref_frames: int = 1
    mb_width: int = 22
    mb_height: int = 18
    crop_right: int = 0   # pixels
    crop_bottom: int = 0


def auto_level(mb_width: int, mb_height: int, fps: float) -> int:
    """Pick the smallest level that fits (abbreviated x264_validate_levels,
    encoder/set.c:876 — full table lands with the level API)."""
    mbs = mb_width * mb_height
    mbps = mbs * fps
    # (level, max_fs, max_mbps) from spec Table A-1 (subset)
    table = [(10, 99, 1485), (11, 396, 3000), (12, 396, 6000), (13, 396, 11880),
             (20, 396, 11880), (21, 792, 19800), (22, 1620, 20250),
             (30, 1620, 40500), (31, 3600, 108000), (32, 5120, 216000),
             (40, 8192, 245760), (41, 8192, 245760), (42, 8704, 522240),
             (50, 22080, 589824), (51, 36864, 983040), (52, 36864, 2073600)]
    for lev, max_fs, max_mbps in table:
        if mbs <= max_fs and mbps <= max_mbps:
            return lev
    return 52


def sps_from_params(p: EncoderParams) -> SpsInfo:
    fps = p.fps_num / max(1, p.fps_den)
    level = p.level_idc or auto_level(p.mb_width, p.mb_height, fps)
    return SpsInfo(
        profile_idc=p.profile_idc,
        level_idc=level,
        # poc_type 2 forbids reordering; B frames need explicit POC, and
        # both anchors must survive in the decoder DPB (sliding window)
        poc_type=0 if p.bframes else 2,
        num_ref_frames=max(p.ref_frames, 2) if p.bframes else p.ref_frames,
        mb_width=p.mb_width,
        mb_height=p.mb_height,
        crop_right=p.mb_width * 16 - p.width,
        crop_bottom=p.mb_height * 16 - p.height,
    )


def write_sps(s: SpsInfo) -> bytes:
    bs = BitWriter()
    bs.put(8, s.profile_idc)
    # constraint_set0..5 + 2 reserved zero bits
    cs0 = 1 if s.profile_idc == 66 else 0
    cs1 = 1 if s.profile_idc in (66, 77) else 0
    bs.put(8, (cs0 << 7) | (cs1 << 6))
    bs.put(8, s.level_idc)
    bs.ue(0)                                # sps_id
    if s.profile_idc >= 100:
        bs.ue(1)                            # chroma_format_idc 4:2:0
        bs.ue(0)                            # bit_depth_luma_minus8
        bs.ue(0)                            # bit_depth_chroma_minus8
        bs.put1(0)                          # qpprime_y_zero_transform_bypass
        bs.put1(0)                          # seq_scaling_matrix_present
    bs.ue(s.log2_max_frame_num - 4)
    bs.ue(s.poc_type)
    if s.poc_type == 0:
        bs.ue(s.log2_max_frame_num - 4)     # log2_max_poc_lsb_minus4
    bs.ue(s.num_ref_frames)
    bs.put1(0)                              # gaps_in_frame_num_value_allowed
    bs.ue(s.mb_width - 1)
    bs.ue(s.mb_height - 1)
    bs.put1(1)                              # frame_mbs_only_flag
    bs.put1(1)                              # direct_8x8_inference_flag
    if s.crop_right or s.crop_bottom:
        bs.put1(1)
        bs.ue(0)
        bs.ue(s.crop_right // 2)
        bs.ue(0)
        bs.ue(s.crop_bottom // 2)
    else:
        bs.put1(0)
    bs.put1(0)                              # vui_parameters_present (later)
    return make_nal(NAL_SPS, NAL_PRIORITY_HIGHEST, bs.to_rbsp())


def write_pps(p: EncoderParams) -> bytes:
    bs = BitWriter()
    bs.ue(0)                                # pps_id
    bs.ue(0)                                # sps_id
    bs.put1(1 if p.cabac else 0)
    bs.put1(0)                              # bottom_field_pic_order_present
    bs.ue(0)                                # num_slice_groups_minus1
    bs.ue(p.ref_frames - 1)
    bs.ue(0)                                # num_ref_idx_l1_active_minus1
    bs.put1(1 if p.weightp else 0)          # weighted_pred_flag
    bs.put(2, 0)                            # weighted_bipred_idc
    bs.se(p.qp - 26)                        # pic_init_qp_minus26
    bs.se(0)                                # pic_init_qs_minus26
    bs.se(p.chroma_qp_offset)
    bs.put1(1)                              # deblocking_filter_control_present
    bs.put1(1 if p.constrained_intra else 0)
    bs.put1(0)                              # redundant_pic_cnt_present
    if p.transform_8x8:
        # PPS extension (7.3.2.2 more_rbsp_data branch)
        bs.put1(1)                          # transform_8x8_mode_flag
        bs.put1(0)                          # pic_scaling_matrix_present
        bs.se(p.chroma_qp_offset)           # second_chroma_qp_index_offset
    return make_nal(NAL_PPS, NAL_PRIORITY_HIGHEST, bs.to_rbsp())


def write_slice_header(bs: BitWriter, p: EncoderParams, sps: SpsInfo, *,
                       slice_type: int, idr: bool, frame_num: int,
                       idr_pic_id: int = 0, first_mb: int = 0,
                       qp: int | None = None, num_ref: int = 1,
                       poc_lsb: int = 0, num_ref_l1: int = 1,
                       is_ref: bool = True, weights=None) -> None:
    """Appends slice_header() bits to bs. Caller wraps into a NAL."""
    bs.ue(first_mb)
    bs.ue(slice_type + 5)                   # "all slices same type" variant
    bs.ue(0)                                # pps_id
    bs.put(sps.log2_max_frame_num, frame_num)
    if idr:
        bs.ue(idr_pic_id)
    if sps.poc_type == 0:
        # callers pass the UNWRAPPED POC; only the LSBs go in the header
        # (reference encoder.c:241 masks i_poc the same way)
        bs.put(sps.log2_max_frame_num,
               poc_lsb & ((1 << sps.log2_max_frame_num) - 1))
    if slice_type == SLICE_B:
        bs.put1(0)                          # direct_spatial_mv_pred: temporal
    if slice_type in (SLICE_P, SLICE_B):
        override = 1 if (num_ref != p.ref_frames
                         or (slice_type == SLICE_B and num_ref_l1 != 1)) \
            else 0
        bs.put1(override)
        if override:
            bs.ue(num_ref - 1)
            if slice_type == SLICE_B:
                bs.ue(num_ref_l1 - 1)
        bs.put1(0)                          # ref_pic_list_modification_flag_l0
        if slice_type == SLICE_B:
            bs.put1(0)                      # ref_pic_list_modification_flag_l1
    if slice_type == SLICE_P and p.weightp:
        # pred_weight_table (7.3.3.2) — mandatory once the PPS sets
        # weighted_pred_flag; luma explicit, chroma default weights
        from x264_tpu.models.weightp import LOG2_DENOM, NEUTRAL
        w_list = weights if weights is not None else [NEUTRAL] * num_ref
        bs.ue(LOG2_DENOM)                   # luma_log2_weight_denom
        bs.ue(LOG2_DENOM)                   # chroma_log2_weight_denom
        for (w, off) in w_list[:num_ref]:
            if (w, off) == NEUTRAL:
                bs.put1(0)                  # luma_weight_l0_flag
            else:
                bs.put1(1)
                bs.se(w)
                bs.se(off)
            bs.put1(0)                      # chroma_weight_l0_flag
    # dec_ref_pic_marking (reference pictures only)
    if idr:
        bs.put1(0)                          # no_output_of_prior_pics
        bs.put1(0)                          # long_term_reference_flag
    elif is_ref:
        bs.put1(0)                          # adaptive_ref_pic_marking_mode
    if p.cabac and slice_type != SLICE_I:
        bs.ue(0)                            # cabac_init_idc
    qp = p.qp if qp is None else qp
    bs.se(qp - p.qp)                        # slice_qp_delta vs pic_init_qp
    # deblocking_filter_control_present is always on in our PPS
    if p.deblock:
        bs.ue(0)
        bs.se(p.deblock_alpha)
        bs.se(p.deblock_beta)
    else:
        bs.ue(1)                            # disable deblocking


def wrap_slice_nal(rbsp: bytes, idr: bool, is_ref: bool = True) -> bytes:
    return make_nal(NAL_SLICE_IDR if idr else NAL_SLICE,
                    NAL_PRIORITY_HIGHEST if idr else (2 if is_ref else 0),
                    rbsp)
