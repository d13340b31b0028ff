"""VUI / HRD SEI / level validation (Annex E + D.1 + A.3; reference
encoder/set.c x264_sps_init VUI block, sei_buffering_period/pic_timing,
x264_validate_levels)."""

import numpy as np
import pytest

from x264_tpu.api import Encoder
from x264_tpu.bitstream.headers import validate_levels
from x264_tpu.params import EncoderParams
from x264_tpu.utils.oracle import decode_annexb
from x264_tpu.utils.yuv import Frame420

from test_e2e import encode_and_check, synth_frames


def test_vui_stream_decodes_bitexact():
    frames = synth_frames(96, 64, 4)
    p = EncoderParams(width=96, height=64, qp=28, backend="device",
                      sar_width=4, sar_height=3, fullrange=True,
                      colorprim=1, transfer=1, colmatrix=1, chroma_loc=1,
                      fps_num=30000, fps_den=1001)
    encode_and_check(frames, p)


def test_vui_fields_roundtrip_ffprobe():
    """libavcodec must parse our VUI: SAR and color info surface in the
    decoded stream metadata."""
    import subprocess

    frames = synth_frames(64, 48, 2)
    p = EncoderParams(width=64, height=48, qp=30, backend="device",
                      sar_width=16, sar_height=11, fullrange=True,
                      colorprim=1, transfer=1, colmatrix=1)
    enc = Encoder(p)
    stream = b"".join(enc.encode(f) for f in frames)
    try:
        r = subprocess.run(["ffprobe", "-hide_banner", "-show_streams",
                            "-f", "h264", "-"], input=stream,
                           capture_output=True)
    except FileNotFoundError:
        pytest.skip("no ffprobe binary")
    if r.returncode != 0:
        pytest.skip("ffprobe failed")
    txt = r.stdout.decode()
    assert "sample_aspect_ratio=16:11" in txt, txt
    assert "color_range=pc" in txt
    assert "color_space=bt709" in txt


def test_nal_hrd_stream_decodes():
    frames = synth_frames(96, 64, 6)
    p = EncoderParams(width=96, height=64, qp=30, backend="device",
                      rc_method=2, bitrate=400, vbv_maxrate=400,
                      vbv_bufsize=800, nal_hrd=True)
    enc = Encoder(p)
    stream = b"".join(enc.encode(f) for f in frames) + enc.flush()
    dec = decode_annexb(stream, 96, 64)
    assert len(dec) == len(frames)
    # buffering-period (type 0) + pic-timing (type 1) SEI present
    assert bytes([0x06, 0x00]) in stream      # SEI NAL, payload type 0
    assert bytes([0x06, 0x01]) in stream


def test_nal_hrd_with_bframes_decodes():
    frames = synth_frames(96, 64, 7)
    p = EncoderParams(width=96, height=64, qp=30, backend="device",
                      rc_method=1, crf=30, vbv_maxrate=500,
                      vbv_bufsize=1000, nal_hrd=True, bframes=2)
    enc = Encoder(p)
    stream = b"".join(enc.encode(f) for f in frames) + enc.flush()
    assert len(decode_annexb(stream, 96, 64)) == len(frames)


def test_nal_hrd_requires_vbv():
    with pytest.raises(ValueError):
        EncoderParams(width=64, height=48, nal_hrd=True).validate()


def test_level_table():
    lv, w = validate_levels(EncoderParams(width=1920, height=1080,
                                          fps_num=25))
    assert lv == 40 and not w
    lv, w = validate_levels(EncoderParams(width=352, height=288,
                                          fps_num=25))
    assert lv == 13            # CIF@25 exceeds MaxMBPS of 1.2 and DPB of 1.1
    lv, w = validate_levels(EncoderParams(width=1920, height=1080,
                                          fps_num=25, level_idc=30))
    assert lv == 30 and w      # forced too-small level warns
    lv, w = validate_levels(EncoderParams(width=3840, height=2160,
                                          fps_num=60))
    assert lv == 52


def test_sps_level_in_stream():
    p = EncoderParams(width=1920, height=1088, qp=30)
    enc = Encoder(p)
    sps = enc.headers()
    # level_idc is the 4th byte of the SPS RBSP (profile, flags, level)
    i = sps.find(b"\x00\x00\x01") + 3
    assert sps[i + 3] == 40
