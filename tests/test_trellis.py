"""Trellis (RD-optimal) quantization — conformance vs the libavcodec
oracle plus the rate-distortion property it exists for (reference
encoder/rdo.c:642 quant_trellis_cabac analog)."""

import numpy as np
import pytest

from x264_tpu.api import Encoder
from x264_tpu.params import EncoderParams
from x264_tpu.utils.yuv import Frame420

from test_e2e import encode_and_check


def textured_frames(W, H, n, seed=5):
    rng = np.random.default_rng(seed)
    tex = rng.integers(0, 200, (H * 2, W * 2)).astype(np.int16)
    tex = ((tex + np.roll(tex, 1, 0) + np.roll(tex, 1, 1)) // 3 + 20)
    out = []
    for t in range(n):
        y = np.clip(tex[2 * t:2 * t + H, 3 * t:3 * t + W],
                    0, 255).astype(np.uint8)
        u = (y[::2, ::2] // 2 + 60)
        v = np.full((H // 2, W // 2), 110, np.uint8)
        out.append(Frame420(y.copy(), u.copy(), v.copy()))
    return out


@pytest.mark.parametrize("t8", [False, True])
def test_trellis_bitexact(t8):
    frames = textured_frames(96, 64, 5)
    p = EncoderParams(width=96, height=64, qp=30, backend="device",
                      cabac=True, trellis=1, transform_8x8=t8)
    encode_and_check(frames, p)


def test_trellis_rd_win():
    """Fewer bits at no PSNR loss vs deadzone quant on textured content."""
    from x264_tpu.utils.oracle import decode_annexb

    def run(trellis):
        frames = textured_frames(112, 80, 6)
        p = EncoderParams(width=112, height=80, qp=30, backend="device",
                          cabac=True, trellis=trellis)
        stream = encode_and_check(frames, p)
        dec = decode_annexb(stream, 112, 80)
        ssd = float(np.sum([
            ((dec[i][0].astype(np.int64)
              - np.asarray(frames[i].y, np.int64)) ** 2).sum()
            for i in range(len(frames))]))
        return len(stream) * 8, ssd

    b0, s0 = run(0)
    b1, s1 = run(1)
    # trellis minimizes J = SSD + lambda2*bits (lambda2 = the me_lambda
    # law at qp30 = 54); it may spend OR save bits, but J must improve
    lam2 = 54.0
    j0 = s0 + lam2 * b0
    j1 = s1 + lam2 * b1
    assert j1 < j0, (j1, j0, (b0, s0), (b1, s1))


def test_trellis_bframes_qpextremes():
    frames = textured_frames(96, 64, 7)
    p = EncoderParams(width=96, height=64, qp=38, backend="device",
                      cabac=True, trellis=1, bframes=2, transform_8x8=True)
    # stream-level conformance (display-order spies covered elsewhere)
    enc = Encoder(p)
    stream = b"".join(enc.encode(f) for f in frames) + enc.flush()
    from x264_tpu.utils.oracle import decode_annexb
    assert len(decode_annexb(stream, 96, 64)) == len(frames)
    frames = textured_frames(64, 48, 3)
    for qp in (4, 51):
        p = EncoderParams(width=64, height=48, qp=qp, backend="device",
                          cabac=True, trellis=1)
        encode_and_check(frames, p)


def test_trellis_requires_cabac():
    with pytest.raises(NotImplementedError):
        EncoderParams(width=64, height=48, trellis=1).validate()


def test_trellis_quant_unit():
    """DP picks sane levels: never raises above nearest-round, zeroes
    cost-ineffective tails, exact signs."""
    import jax.numpy as jnp
    from x264_tpu.ops.device.trellis import (K4_ZZ, dq1_4x4, frame_trellis,
                                             trellis_quant)
    tbl4, _, lam2f = frame_trellis(30, "P", 54, False)[:3]
    rng = np.random.default_rng(7)
    c = (rng.normal(0, 2500, (64, 16))
         * (rng.random((64, 16)) < 0.5)).astype(np.int32)
    qp = np.full(64, 30, np.int32)
    dq = dq1_4x4(qp)
    lv = np.asarray(trellis_quant(jnp.asarray(c), dq, lam2f, tbl4, 16))
    lr = np.floor(np.abs(c) * K4_ZZ / np.asarray(dq) + 0.5).astype(np.int64)
    assert (np.abs(lv) <= lr).all()
    assert (np.sign(lv) * np.sign(c) >= 0).all()
    assert np.abs(lv).sum() > 0
