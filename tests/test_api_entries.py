"""Run-time API entry points: reconfig / delayed_frames /
intra_refresh / invalidate_reference (reference encoder/encoder.c:1955,
:3280, :3286; x264.h:930-1019)."""

import numpy as np
import pytest

from x264_tpu.api import Encoder
from x264_tpu.params import EncoderParams
from x264_tpu.utils.oracle import decode_annexb

from test_e2e import synth_frames
from x264_tpu.utils.yuv import Frame420


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


def test_periodic_intra_refresh():
    """--intra-refresh: one IDR at stream start, then a moving forced-
    intra column instead of periodic IDRs (encoder.c:3626 refresh bar);
    bit-exact vs the decoder, recovery-point SEI at sweep starts."""
    import numpy as np
    W, H, N = 96, 64, 12
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for t in range(N):
        y = np.clip(128 + 60 * np.sin((xx + 3 * t) / 11.0)
                    + rng.normal(0, 5, (H, W)), 0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 120, np.uint8)
        frames.append(Frame420(y, u, u))
    enc = Encoder(EncoderParams(width=W, height=H, qp=30,
                                backend="device", deblock=True,
                                cabac=True, intra_refresh=True,
                                keyint_max=4))
    recs = {}
    enc.recon_hook = lambda d, r: recs.__setitem__(
        d, (np.asarray(r.y), np.asarray(r.u), np.asarray(r.v)))
    stream = b"".join(enc.encode(f) for f in frames) + enc.flush()
    # frame types: IDR only at 0
    types = [s.frame_type for s in enc.stats]
    assert types[0] == "IDR" and all(t == "P" for t in types[1:]), types
    # NAL scan: exactly one IDR slice; recovery-point SEI present
    import re
    nals = [stream[m.start() + 3] & 31
            for m in re.finditer(b"\x00\x00\x01", stream)]
    assert nals.count(5) == 1
    assert 6 in nals                       # SEI (recovery point)
    # refresh bars actually coded: P frames contain intra MBs
    assert enc._agg["P"]["imb"] >= (H // 16) * 2
    # conformance: decoder output == our recon for every frame
    dec = decode_annexb(stream, W, H)
    assert len(dec) == N
    for d in range(N):
        ry, ru, rv = recs[d]
        assert np.array_equal(dec[d][0], ry[:H, :W]), f"frame {d} luma"
        assert np.array_equal(dec[d][1], ru[:H // 2, :W // 2])
        assert np.array_equal(dec[d][2], rv[:H // 2, :W // 2])
