"""Run-time API entry points: reconfig / delayed_frames /
intra_refresh / invalidate_reference (reference encoder/encoder.c:1955,
:3280, :3286; x264.h:930-1019)."""

import numpy as np
import pytest

from x264_tpu.api import Encoder
from x264_tpu.params import EncoderParams
from x264_tpu.utils.oracle import decode_annexb

from test_e2e import synth_frames


def test_reconfig_qp_midstream():
    frames = synth_frames(64, 48, 6)
    p = EncoderParams(width=64, height=48, qp=30, backend="device")
    enc = Encoder(p)
    stream, recs = b"", []
    for i, fr in enumerate(frames):
        if i == 3:
            enc.reconfig(qp=40, deblock_alpha=2, deblock_beta=-2)
        stream += enc.encode(fr)
        recs.append(np.asarray(enc.last_recon.y))
    assert enc.stats[4].qp == 40
    dec = decode_annexb(stream, 64, 48)
    for i in range(6):
        assert np.array_equal(dec[i][0], recs[i][:48, :64]), i


def test_reconfig_rejects_structural():
    enc = Encoder(EncoderParams(width=64, height=48, backend="device"))
    with pytest.raises(ValueError):
        enc.reconfig(width=128)
    with pytest.raises(ValueError):
        enc.reconfig(cabac=True)


def test_delayed_frames_and_flush():
    frames = synth_frames(64, 48, 5)
    enc = Encoder(EncoderParams(width=64, height=48, qp=30,
                                backend="device", bframes=2))
    enc.encode(frames[0])
    assert enc.delayed_frames() == 0
    enc.encode(frames[1])
    assert enc.delayed_frames() == 1
    enc.encode(frames[2])
    assert enc.delayed_frames() == 2
    enc.encode(frames[3])      # mini-GOP closes -> deferred finalize
    # the closed mini-GOP sits in the cross-GOP finalize queue (the
    # frame-threads delay analog, encoder.c:1610); flush drains it
    assert enc.delayed_frames() == 3
    assert enc.flush() != b""
    assert enc.delayed_frames() == 0


def test_intra_refresh_forces_idr():
    frames = synth_frames(64, 48, 5)
    enc = Encoder(EncoderParams(width=64, height=48, qp=30,
                                backend="device"))
    stream = b""
    for i, fr in enumerate(frames):
        if i == 2:
            enc.intra_refresh()
        stream += enc.encode(fr)
    assert [s.frame_type for s in enc.stats][2] == "IDR"
    assert len(decode_annexb(stream, 64, 48)) == 5


def test_invalidate_reference():
    frames = synth_frames(64, 48, 8)
    enc = Encoder(EncoderParams(width=64, height=48, qp=30,
                                backend="device", ref_frames=3))
    stream, recs = b"", []
    for i, fr in enumerate(frames):
        if i == 4:
            # "frames with frame_num >= 2 were lost downstream"
            invalid = enc.invalidate_reference(2)
            assert invalid >= 1
        stream += enc.encode(fr)
        recs.append(np.asarray(enc.last_recon.y))
    # recovery: the next frame is an IDR, nothing references the loss
    assert [s.frame_type for s in enc.stats][4] == "IDR"
    dec = decode_annexb(stream, 64, 48)
    for i in range(8):
        assert np.array_equal(dec[i][0], recs[i][:48, :64]), i
