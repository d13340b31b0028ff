"""Inter partitions (16x8/8x16/8x8) end-to-end: encode with --partitions
p8x8 and require bit-exact reconstruction from the libavcodec oracle,
on content engineered to make sub-MB motion win."""

import numpy as np
import pytest

from x264_tpu.api import Encoder
from x264_tpu.params import EncoderParams
from x264_tpu.utils.oracle import decode_annexb
from x264_tpu.utils.yuv import Frame420

from tests.test_e2e import encode_and_check


def split_motion_frames(W, H, n, seed=9):
    """Two interleaved motion fields at 8-px granularity: the top half
    of every MB pans right, the bottom half pans down — and in the right
    third of the frame the split is vertical instead (left half-MB pans
    right, right half-MB pans down).  Forces 16x8/8x16/8x8 decisions in
    nearly every inter MB while each half still has a perfect match."""
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (H * 3, W * 3)).astype(np.uint8)
    # smooth it a bit so subpel matters
    big = ((big[:-1, :-1].astype(np.int32) + big[1:, :-1] + big[:-1, 1:]
            + big[1:, 1:]) // 4).astype(np.uint8)
    frames = []
    for t in range(n):
        a = big[8:8 + H, 8 + 3 * t:8 + 3 * t + W]     # pans right (3,0)
        b = big[8 + 2 * t:8 + 2 * t + H, 8:8 + W]     # pans down (0,2)
        y = a.copy()
        for my in range(H // 16):
            y[my * 16 + 8: my * 16 + 16, :] = \
                b[my * 16 + 8: my * 16 + 16, :]
        for mx in range(2 * (W // 16) // 3, W // 16):
            x0 = mx * 16
            y[:, x0:x0 + 8] = a[:, x0:x0 + 8]
            y[:, x0 + 8:x0 + 16] = b[:, x0 + 8:x0 + 16]
        u = big[1:1 + H // 2, 2:2 + W // 2] // 2 + 60
        v = big[3:3 + H // 2, 5:5 + W // 2] // 2 + 70
        frames.append(Frame420(y.copy(), u.copy(), v.copy()))
    return frames


@pytest.mark.parametrize("qp,deblock,aq", [
    (24, False, 0), (30, True, 0), (36, True, 1), (18, True, 0)])
def test_parts_cavlc_bitexact(qp, deblock, aq):
    frames = split_motion_frames(96, 64, 4)
    p = EncoderParams(width=96, height=64, qp=qp, keyint_max=250,
                      deblock=deblock, me_range=8, subpel=2,
                      p8x8=True, aq_mode=aq)
    encode_and_check(frames, p)


def test_parts_multiref_bitexact():
    frames = split_motion_frames(96, 64, 5)
    p = EncoderParams(width=96, height=64, qp=28, keyint_max=250,
                      deblock=True, me_range=8, subpel=2,
                      p8x8=True, ref_frames=3)
    encode_and_check(frames, p)


def test_parts_8x8dct_bitexact():
    frames = split_motion_frames(96, 64, 3)
    p = EncoderParams(width=96, height=64, qp=26, keyint_max=250,
                      deblock=True, me_range=8, subpel=2,
                      p8x8=True, transform_8x8=True)
    encode_and_check(frames, p)


def test_parts_weightp_bitexact():
    base = split_motion_frames(96, 64, 4)
    # superimpose a fade so weightp engages alongside partitions
    frames = []
    for t, fr in enumerate(base):
        g = max(0.55, 1.0 - 0.13 * t)
        frames.append(Frame420(
            np.clip(fr.y.astype(np.float32) * g, 0, 255).astype(np.uint8),
            fr.u, fr.v))
    p = EncoderParams(width=96, height=64, qp=27, keyint_max=250,
                      deblock=True, me_range=8, subpel=2,
                      p8x8=True, weightp=1)
    encode_and_check(frames, p)


@pytest.mark.parametrize("qp,aq,t8,trellis", [
    (24, 0, False, 0), (30, 1, False, 0), (26, 0, True, 0),
    (18, 0, False, 0), (28, 0, True, 1)])
def test_parts_cabac_bitexact(qp, aq, t8, trellis):
    """Partition syntax through the native CABAC coder (mb_type prefix,
    sub_mb_type, per-partition mvd with 8x8-grain contexts)."""
    frames = split_motion_frames(96, 64, 4)
    p = EncoderParams(width=96, height=64, qp=qp, keyint_max=250,
                      deblock=True, me_range=8, subpel=2,
                      p8x8=True, cabac=True, aq_mode=aq,
                      transform_8x8=t8, trellis=trellis)
    encode_and_check(frames, p)


def test_parts_cabac_multiref_bitexact():
    """Per-partition ref_idx bins with 8x8-grain neighbour contexts."""
    frames = split_motion_frames(96, 64, 5)
    p = EncoderParams(width=96, height=64, qp=28, keyint_max=250,
                      deblock=True, me_range=8, subpel=2,
                      p8x8=True, cabac=True, ref_frames=3)
    encode_and_check(frames, p)


@pytest.mark.parametrize("bframes,cabac,qp", [
    (1, False, 26), (2, False, 30), (2, True, 26), (1, True, 33)])
def test_parts_bframes_bitexact(bframes, cabac, qp):
    """p8x8 anchors + B frames: the B core derives temporal direct from
    the anchor's QUADRANT-grain motion field (8.4.1.2.2 with
    direct_8x8_inference_flag=1), so a partitioned colocated MB gives
    each 8x8 quad its own scaled direct mv.  Display-order recon must be
    bit-exact (B streams reorder, so encode_and_check doesn't apply)."""
    frames = split_motion_frames(96, 64, 7)
    W, H = 96, 64
    p = EncoderParams(width=W, height=H, qp=qp, keyint_max=250,
                      deblock=True, me_range=8, subpel=2,
                      p8x8=True, bframes=bframes, cabac=cabac)
    enc = Encoder(p)
    recs = {}
    _b, _a = enc._finalize_b, enc._submit_anchor

    def spyb(job):
        data = _b(job)
        r = enc.last_recon
        recs[job["disp"]] = (np.asarray(r.y), np.asarray(r.u),
                             np.asarray(r.v))
        return data

    def spya(fr, d, ftype):
        job = _a(fr, d, ftype)
        r = enc.dpb[0]
        recs[d] = (np.asarray(r.y), np.asarray(r.u), np.asarray(r.v))
        return job

    enc._finalize_b, enc._submit_anchor = spyb, spya
    stream = b"".join(enc.encode(f) for f in frames) + enc.flush()
    dec = decode_annexb(stream, W, H)
    assert len(dec) == len(frames)
    for d in range(len(frames)):
        ry, ru, rv = recs[d]
        assert np.array_equal(dec[d][0], ry[:H, :W]), f"display {d} luma"
        assert np.array_equal(dec[d][1], ru[:H // 2, :W // 2]), f"{d} cb"
        assert np.array_equal(dec[d][2], rv[:H // 2, :W // 2]), f"{d} cr"


def test_parts_actually_chosen():
    """The decision must actually produce non-16x16 shapes on this
    content (otherwise the conformance tests above are vacuous)."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp
    from x264_tpu.models.inter_device import p_frame_core

    frames = split_motion_frames(96, 64, 2)
    p = EncoderParams(width=96, height=64, qp=28, p8x8=True, me_range=8)
    enc = Encoder(p)
    enc.encode(frames[0])
    y1 = frames[1]
    from x264_tpu.utils.yuv import pad_to_mb
    ref = enc.dpb[0]
    out = p_frame_core(jnp.asarray(pad_to_mb(y1.y, 16)),
                       jnp.asarray(pad_to_mb(y1.u, 8)),
                       jnp.asarray(pad_to_mb(y1.v, 8)),
                       ref.y, ref.u, ref.v,
                       np.int32(28), np.int32(8),
                       mbw=6, mbh=4, me_range=8, cqp_off=0,
                       subpel=2, parts=True)
    shapes = np.asarray(out["shape"])
    assert (shapes > 0).sum() >= 3, shapes
