"""Intra MBs in P slices (I16x16-in-P): decision policy parity between
tiers, conformance vs the libavcodec oracle, CAVLC + CABAC.

Content recipe: a predictable panning background (inter wins) with a
block of fresh uncorrelated noise each frame (inter fails there, intra
wins) — small enough that the scenecut logic never promotes to IDR."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from x264_tpu.api import Encoder  # noqa: E402
from x264_tpu.models.syntax import MB_I16  # noqa: E402
from x264_tpu.params import EncoderParams  # noqa: E402
from x264_tpu.utils.oracle import decode_annexb  # noqa: E402
from x264_tpu.utils.yuv import Frame420  # noqa: E402

W, H = 160, 96


def _frames(rng, n):
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for t in range(n):
        y = (120 + 70 * np.sin((xx + 3 * t) / 13.0)
             * np.cos((yy - 2 * t) / 19.0)).astype(np.uint8)
        y += rng.integers(0, 5, (H, W)).astype(np.uint8)
        if t > 0:
            # fresh uncorrelated content: intra should win here
            y[32:64, 64:112] = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        u = (128 + 40 * np.sin((xx[::2, ::2] + 3 * t) / 23.0)).astype(np.uint8)
        v = (128 + 40 * np.cos((yy[::2, ::2] + 2 * t) / 29.0)).astype(np.uint8)
        out.append(Frame420(y, u, v))
    return out


def _roundtrip(frames, **kw):
    enc = Encoder(EncoderParams(width=W, height=H, me_range=8,
                                backend="device", scenecut_threshold=0,
                                **kw))
    recs, stream = [], b""
    for f in frames:
        stream += enc.encode(f)
        r = enc.last_recon
        recs.append((np.asarray(r.y), np.asarray(r.u), np.asarray(r.v)))
    stream += enc.flush()
    dec = decode_annexb(stream, W, H)
    assert len(dec) == len(frames)
    for d in range(len(frames)):
        assert np.array_equal(dec[d][0], recs[d][0][:H, :W]), (d, "Y")
        assert np.array_equal(dec[d][1], recs[d][1][:H // 2, :W // 2]), d
        assert np.array_equal(dec[d][2], recs[d][2][:H // 2, :W // 2]), d
    return enc, stream


def test_intra_mbs_chosen(rng):
    """The device P pipeline must actually choose intra MBs on the
    noise-block content, and the syn tiers must agree bit-exactly."""
    from x264_tpu.models import inter_device
    from x264_tpu.models.inter_frame import encode_pframe
    from x264_tpu.models.intra_frame import encode_iframe

    frames = _frames(rng, 2)
    p = EncoderParams(width=W, height=H, qp=30, me_range=8,
                      backend="device")
    ry, ru, rv, _ = encode_iframe(frames[0].y, frames[0].u, frames[0].v, 28)

    class _Ref:
        pass

    ref = _Ref()
    ref.y, ref.u, ref.v = ry, ru, rv
    dy, du, dv, syn_d = inter_device.encode_pframe_device(
        frames[1].y, frames[1].u, frames[1].v, ref, 30, p)
    n_intra = int((syn_d.mb_class == MB_I16).sum())
    assert n_intra > 0, "content should force intra MBs"

    ny, nu, nv, syn_n = encode_pframe(
        frames[1].y, frames[1].u, frames[1].v, ref, 30, p)
    assert np.array_equal(syn_d.mb_class, syn_n.mb_class)
    assert np.array_equal(syn_d.i16_mode, syn_n.i16_mode)
    assert np.array_equal(syn_d.chroma_mode, syn_n.chroma_mode)
    assert np.array_equal(syn_d.mvd, syn_n.mvd)
    assert np.array_equal(np.asarray(dy), ny)
    assert np.array_equal(np.asarray(du), nu)
    assert np.array_equal(np.asarray(dv), nv)


@pytest.mark.parametrize("qp", [22, 30, 44])
def test_intra_in_p_conformance(rng, qp):
    _roundtrip(_frames(rng, 5), qp=qp, deblock=True)


def test_intra_in_p_cabac(rng):
    _roundtrip(_frames(rng, 5), qp=30, deblock=True, cabac=True)


def test_intra_in_p_aq(rng):
    """AQ exercises per-MB qp + the qp_delta chain through intra MBs."""
    _roundtrip(_frames(rng, 4), qp=30, deblock=True, aq_mode=1,
               aq_strength=1.5)


def test_intra_in_p_bframes(rng):
    """Anchors with intra MBs feed temporal direct (col_intra)."""
    frames = _frames(rng, 7)
    enc = Encoder(EncoderParams(width=W, height=H, qp=30, me_range=8,
                                backend="device", scenecut_threshold=0,
                                deblock=True, bframes=2))
    recs = {}
    _b, _a = enc._finalize_b, enc._submit_anchor

    def spyb(job):
        data = _b(job)
        r = enc.last_recon
        recs[job["disp"]] = np.asarray(r.y)
        return data

    def spya(fr, d, ftype):
        job = _a(fr, d, ftype)
        recs[d] = np.asarray(enc.dpb[0].y)
        return job

    enc._finalize_b, enc._submit_anchor = spyb, spya
    stream = b"".join(enc.encode(f) for f in frames) + enc.flush()
    dec = decode_annexb(stream, W, H)
    assert len(dec) == 7
    for d in range(7):
        assert np.array_equal(dec[d][0], recs[d][:H, :W]), d
