"""CABAC fast-path generalization: multi-ref ref_idx bins + multi-slice
per-band payloads (reference encoder/cabac.c x264_cabac_mb_ref; slices
as in encoder/encoder.c:3219)."""

import numpy as np
import pytest

from x264_tpu.api import Encoder
from x264_tpu.params import EncoderParams
from x264_tpu.utils.oracle import decode_annexb
from x264_tpu.utils.yuv import Frame420


def periodic_frames(W, H, n, seed=11):
    """3-periodic content: older references win, so ref_idx > 0 bins are
    actually exercised."""
    rng = np.random.default_rng(seed)
    base = [rng.integers(0, 220, (H, W)).astype(np.uint8) for _ in range(3)]
    return [Frame420(base[i % 3].copy(),
                     np.full((H // 2, W // 2), 100, np.uint8),
                     np.full((H // 2, W // 2), 120, np.uint8))
            for i in range(n)]


def run_bitexact(frames, p):
    W, H = p.width, p.height
    enc = Encoder(p)
    recs, stream = [], b""
    for f in frames:
        stream += enc.encode(f)
        recs.append(np.asarray(enc.last_recon.y))
    dec = decode_annexb(stream, W, H)
    assert len(dec) == len(frames)
    for i in range(len(frames)):
        assert np.array_equal(dec[i][0], recs[i][:H, :W]), i
    return stream


def test_cabac_multiref_uses_older_refs():
    frames = periodic_frames(96, 64, 7)
    p = EncoderParams(width=96, height=64, qp=28, backend="device",
                      cabac=True, ref_frames=3)
    run_bitexact(frames, p)
    # the encoder must actually pick nonzero ref_idx on periodic content
    enc = Encoder(p)
    for f in frames[:5]:
        enc.encode(f)
    job = enc._submit_device(np.asarray(frames[5].y),
                             np.asarray(frames[5].u),
                             np.asarray(frames[5].v), "P", 28)
    refs = np.asarray(job["out"]["ref_mb"])
    assert (refs > 0).any()


def test_cabac_multiref_trellis_weightp():
    frames = periodic_frames(96, 64, 6)
    p = EncoderParams(width=96, height=64, qp=30, backend="device",
                      cabac=True, ref_frames=2, trellis=1, weightp=1)
    run_bitexact(frames, p)


@pytest.mark.parametrize("slices", [2, 3])
def test_cabac_multislice(slices):
    frames = periodic_frames(96, 96, 4)
    p = EncoderParams(width=96, height=96, qp=26, backend="device",
                      cabac=True, slices=slices)
    stream = run_bitexact(frames, p)
    # one slice NAL per band per frame
    n_slices = stream.count(b"\x00\x00\x01\x65") \
        + stream.count(b"\x00\x00\x01\x41")
    assert n_slices == slices * len(frames)
