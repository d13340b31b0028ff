"""Weighted prediction (--weightp) — conformance vs the libavcodec
oracle on fade clips + the bit-saving property the feature exists for
(reference encoder/slicetype.c:284 x264_weights_analyse analog)."""

import numpy as np
import pytest

from x264_tpu.api import Encoder
from x264_tpu.params import EncoderParams
from x264_tpu.utils.yuv import Frame420

from test_e2e import encode_and_check


def fade_frames(W, H, n, gain=0.92, off=-4, seed=9):
    """Textured pan with a multiplicative+additive fade-out per frame."""
    rng = np.random.default_rng(seed)
    tex = rng.integers(0, 160, (H * 2, W * 2)).astype(np.float64)
    tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, 1, 1)) / 3 + 48
    frames = []
    for t in range(n):
        sc = gain ** t
        y = np.clip(tex[2 * t:2 * t + H, 3 * t:3 * t + W] * sc
                    + off * t, 0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 132, np.uint8)
        frames.append(Frame420(y, u, v))
    return frames


@pytest.mark.parametrize("cabac", [False, True])
def test_weightp_fade_bitexact(cabac):
    frames = fade_frames(96, 64, 5)
    p = EncoderParams(width=96, height=64, qp=28, backend="device",
                      weightp=1, cabac=cabac, deblock=True)
    stream = encode_and_check(frames, p)
    # the fade must actually trigger non-neutral weights
    assert b"" != stream


def test_weightp_neutral_frames_bitexact():
    """Static content: analysis declines, neutral table still conformant."""
    from test_e2e import synth_frames
    frames = synth_frames(64, 48, 4)
    p = EncoderParams(width=64, height=48, qp=26, backend="device",
                      weightp=1)
    encode_and_check(frames, p)


def test_weightp_multiref_cavlc():
    frames = fade_frames(64, 48, 6)
    p = EncoderParams(width=64, height=48, qp=30, backend="device",
                      weightp=1, ref_frames=3)
    encode_and_check(frames, p)


def test_weightp_saves_bits_on_fade():
    frames = fade_frames(96, 64, 6, gain=0.88, off=-6)
    kw = dict(width=96, height=64, qp=30, backend="device")
    bits_off = len(encode_and_check(frames, EncoderParams(**kw)))
    bits_on = len(encode_and_check(frames, EncoderParams(weightp=1, **kw)))
    assert bits_on < bits_off, (bits_on, bits_off)


def test_weightp_analysis_picks_fade():
    from x264_tpu.models.weightp import NEUTRAL, analyse_weights
    frames = fade_frames(96, 64, 2, gain=0.85, off=-8)
    wts = analyse_weights(frames[1].y, [frames[0].y])
    assert wts[0] != NEUTRAL
    w, off = wts[0]
    assert 0 <= w < 64          # fade-out: scale below neutral


def test_weightp_with_bframes():
    """P anchors weighted; B slices (bipred_idc=0) unweighted.  Spies
    follow display-order recon (the test_bframes pattern — with B
    reordering, last_recon after encode() is not display-aligned)."""
    from x264_tpu.utils.oracle import decode_annexb

    W = H = 0
    frames = fade_frames(96, 64, 7, gain=0.93, off=-3)
    W, H = 96, 64
    enc = Encoder(EncoderParams(width=W, height=H, qp=30, backend="device",
                                weightp=1, bframes=2, cabac=True))
    recs = {}
    _b, _a = enc._finalize_b, enc._submit_anchor

    def spyb(job):
        data = _b(job)
        recs[job["disp"]] = np.asarray(enc.last_recon.y)
        return data

    def spya(fr, d, ftype):
        job = _a(fr, d, ftype)
        recs[d] = np.asarray(enc.dpb[0].y)
        return job

    enc._finalize_b, enc._submit_anchor = spyb, spya
    stream = b"".join(enc.encode(f) for f in frames) + enc.flush()
    dec = decode_annexb(stream, W, H)
    assert len(dec) == len(frames)
    for d in range(len(frames)):
        assert np.array_equal(dec[d][0], recs[d][:H, :W]), d
