"""End-to-end conformance tests — the analog of the reference's
regression test (doc/regression_test.txt): encode, decode with a real
decoder (libavcodec oracle), require bit-exact reconstruction."""

import numpy as np
import pytest

from x264_tpu.api import Encoder
from x264_tpu.params import EncoderParams
from x264_tpu.utils.oracle import decode_annexb
from x264_tpu.utils.yuv import Frame420


def synth_frames(W, H, n, motion=True, seed=3):
    yy, xx = np.mgrid[0:H * 2, 0:W * 2]
    tex = (110 + 70 * np.sin(xx / 11) * np.cos(yy / 8)
           + 20 * np.sin((xx + 2 * yy) / 23)).astype(np.uint8)
    frames = []
    for t in range(n):
        ox, oy = (3 * t, 2 * t) if motion else (0, 0)
        y = tex[oy:oy + H, ox:ox + W]
        u = tex[oy // 2:oy // 2 + H // 2, ox // 2:ox // 2 + W // 2] // 2 + 64
        v = tex[oy // 2 + 5:oy // 2 + 5 + H // 2, ox // 2 + 7:ox // 2 + 7 + W // 2] // 2 + 64
        frames.append(Frame420(y.copy(), u.copy(), v.copy()))
    return frames


def encode_and_check(frames, p: EncoderParams):
    W, H = p.width, p.height
    enc = Encoder(p)
    stream = b""
    recons = []
    for fr in frames:
        stream += enc.encode(fr)
        recons.append((enc.last_recon.y.copy(), enc.last_recon.u.copy(),
                       enc.last_recon.v.copy()))
    dec = decode_annexb(stream, W, H)
    assert len(dec) == len(frames)
    for i, (d, r) in enumerate(zip(dec, recons)):
        np.testing.assert_array_equal(d[0], r[0][:H, :W], err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(d[1], r[1][:H // 2, :W // 2], err_msg=f"frame {i} cb")
        np.testing.assert_array_equal(d[2], r[2][:H // 2, :W // 2], err_msg=f"frame {i} cr")
    return stream


@pytest.mark.parametrize("qp", [0, 18, 30, 44, 51])
def test_iframes_bitexact(qp):
    frames = synth_frames(64, 48, 2)
    p = EncoderParams(width=64, height=48, qp=qp, keyint_max=1, deblock=False)
    encode_and_check(frames, p)


def test_odd_size_cropping():
    frames = synth_frames(50, 38, 1)
    p = EncoderParams(width=50, height=38, qp=26, keyint_max=1, deblock=False)
    encode_and_check(frames, p)


@pytest.mark.parametrize("qp", [14, 28, 40])
def test_pframes_bitexact(qp):
    frames = synth_frames(96, 64, 4)
    p = EncoderParams(width=96, height=64, qp=qp, keyint_max=250,
                      deblock=False, me_range=8)
    encode_and_check(frames, p)


def test_pframes_static_all_skip():
    frames = [Frame420(np.full((48, 64), 100, np.uint8),
                       np.full((24, 32), 110, np.uint8),
                       np.full((24, 32), 120, np.uint8)) for _ in range(4)]
    p = EncoderParams(width=64, height=48, qp=30, keyint_max=250,
                      deblock=False, sei_version=False)
    stream = encode_and_check(frames, p)
    assert len(stream) < 200  # P frames must collapse to skip runs


def test_periodic_idr():
    frames = synth_frames(64, 48, 5)
    p = EncoderParams(width=64, height=48, qp=30, keyint_max=2,
                      deblock=False, me_range=8)
    encode_and_check(frames, p)


def test_noise_content_low_qp():
    rng = np.random.default_rng(1)
    frames = [Frame420(rng.integers(0, 256, (48, 64)).astype(np.uint8),
                       rng.integers(0, 256, (24, 32)).astype(np.uint8),
                       rng.integers(0, 256, (24, 32)).astype(np.uint8))
              for _ in range(2)]
    p = EncoderParams(width=64, height=48, qp=8, keyint_max=250,
                      deblock=False, me_range=4)
    encode_and_check(frames, p)


@pytest.mark.parametrize("qp,ao,bo", [(20, 0, 0), (32, 0, 0), (44, 0, 0), (32, 2, -1)])
def test_deblock_bitexact(qp, ao, bo):
    frames = synth_frames(96, 64, 3)
    p = EncoderParams(width=96, height=64, qp=qp, keyint_max=250, deblock=True,
                      deblock_alpha=ao, deblock_beta=bo, me_range=8)
    encode_and_check(frames, p)


def test_deblock_iframes_high_qp():
    frames = synth_frames(64, 48, 2)
    p = EncoderParams(width=64, height=48, qp=48, keyint_max=1, deblock=True)
    encode_and_check(frames, p)


@pytest.mark.parametrize("qp,db", [(20, False), (30, True), (40, True)])
def test_transform_8x8_bitexact(qp, db):
    """High-profile adaptive 8x8 transform on P frames (CAVLC), oracle
    bit-exact incl. the t8 deblock edge rule (8.7: no interior 4x4 luma
    edges in 8x8-coded MBs)."""
    frames = synth_frames(96, 64, 4)
    p = EncoderParams(width=96, height=64, qp=qp, keyint_max=250,
                      deblock=db, me_range=8, cabac=False,
                      transform_8x8=True)
    encode_and_check(frames, p)


def test_transform_8x8_with_aq_multiref():
    frames = synth_frames(96, 64, 5)
    p = EncoderParams(width=96, height=64, qp=30, keyint_max=250,
                      deblock=True, me_range=8, cabac=False,
                      transform_8x8=True, aq_mode=1, ref_frames=2)
    encode_and_check(frames, p)


@pytest.mark.parametrize("qp", [18, 30, 42])
def test_transform_8x8_cabac_bitexact(qp):
    """8x8 transform + CABAC (ctxBlockCat-5 residuals + flag contexts)."""
    frames = synth_frames(96, 64, 4)
    p = EncoderParams(width=96, height=64, qp=qp, keyint_max=250,
                      deblock=True, me_range=8, cabac=True,
                      transform_8x8=True)
    encode_and_check(frames, p)


@pytest.mark.parametrize("qp", [14, 26, 40])
def test_i4x4_iframes_bitexact(qp):
    """I4x4 MBs in I slices (reference tier): mode-chain prediction,
    full-16-coeff residual blocks, cbp per 8x8 group — oracle bit-exact."""
    frames = synth_frames(64, 48, 2)
    p = EncoderParams(width=64, height=48, qp=qp, keyint_max=1,
                      deblock=True, backend="reference", i4x4=True)
    encode_and_check(frames, p)


def test_i4x4_pgop_bitexact():
    """I4x4 on the IDR of an IPP GOP; P frames reference the mixed
    I4/I16 recon."""
    frames = synth_frames(64, 48, 3)
    p = EncoderParams(width=64, height=48, qp=28, keyint_max=0,
                      deblock=True, backend="reference", i4x4=True)
    encode_and_check(frames, p)


def test_i4x4_device_backend_bitexact():
    """I4x4 through the device backend (syntax entropy path)."""
    frames = synth_frames(96, 64, 3)
    p = EncoderParams(width=96, height=64, qp=28, keyint_max=0,
                      deblock=True, backend="device", i4x4=True, aq_mode=1)
    encode_and_check(frames, p)


@pytest.mark.parametrize("qp", [14, 26, 40])
def test_i4x4_cabac_packed_bitexact(qp):
    """I4x4 through the device-packed CABAC fast path (pred-mode nibble
    fields in the blob -> native coder I_NxN trees)."""
    frames = synth_frames(64, 48, 2)
    p = EncoderParams(width=64, height=48, qp=qp, keyint_max=1,
                      deblock=True, backend="device", i4x4=True,
                      cabac=True)
    encode_and_check(frames, p)


def test_i4x4_cabac_pgop_bitexact():
    """I4x4 IDR (packed CABAC) + P frames referencing the mixed recon."""
    frames = synth_frames(96, 64, 4)
    p = EncoderParams(width=96, height=64, qp=28, keyint_max=0,
                      deblock=True, backend="device", i4x4=True,
                      cabac=True, aq_mode=1)
    encode_and_check(frames, p)


def test_i4x4_with_8x8dct_cabac():
    """Composition: i4x4 (I slices) + adaptive 8x8 transform (P slices)
    under one PPS with transform_8x8_mode_flag=1 — the I_NxN MBs must
    code transform_size_8x8_flag=0."""
    frames = synth_frames(96, 64, 4)
    p = EncoderParams(width=96, height=64, qp=26, keyint_max=0,
                      deblock=True, backend="device", i4x4=True,
                      cabac=True, transform_8x8=True)
    encode_and_check(frames, p)


def test_medium_composition_bitexact():
    """The round-3 'medium-equivalent' composition gate:
    i4x4 + p8x8 + 8x8dct + weightp + trellis + CABAC + 2 B frames
    in ONE encode (VERDICT.md round-2 item 2).  B streams reorder, so
    recons are captured per display index via the submit/finalize hooks
    and compared against the decoder in display order."""
    W, H = 96, 64
    frames = synth_frames(W, H, 7)
    p = EncoderParams(width=W, height=H, qp=26, keyint_max=0,
                      deblock=True, backend="device", i4x4=True,
                      cabac=True, transform_8x8=True, weightp=1,
                      trellis=1, p8x8=True, bframes=2,
                      scenecut_threshold=0)
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
