"""Lookahead / adaptive B placement (b_adapt=1 analog)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from x264_tpu.api import Encoder  # noqa: E402
from x264_tpu.models.lookahead import Lookahead, lowres_plane  # noqa: E402
from x264_tpu.params import EncoderParams  # noqa: E402
from x264_tpu.utils.oracle import decode_annexb  # noqa: E402
from x264_tpu.utils.yuv import Frame420  # noqa: E402

W, H = 160, 96


def _scene(rng, t, phase=0):
    yy, xx = np.mgrid[0:H, 0:W]
    y = (120 + 70 * np.sin((xx + 4 * t + 50 * phase) / (13.0 + 7 * phase))
         * np.cos((yy - 2 * t) / 19.0)).astype(np.uint8)
    return y + rng.integers(0, 4, (H, W)).astype(np.uint8)


def test_lowres_plane():
    y = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64)
    import jax.numpy as jnp
    lr = np.asarray(lowres_plane(jnp.asarray(y)))
    assert lr.shape == (32, 32)
    q = y.astype(np.int64).reshape(32, 2, 32, 2).sum((1, 3))
    assert np.array_equal(lr, ((q + 2) >> 2).astype(np.uint8))


def test_plan_static_scene_max_b(rng):
    """A static, well-predicted scene should run at maximum B density."""
    p = EncoderParams(width=W, height=H, bframes=2, b_adapt=1)
    la = Lookahead(p)
    frames = [_scene(rng, t) for t in range(4)]
    la.push_anchor(frames[0])
    m = la.plan(frames[1:4])
    assert m == 2


def test_plan_hard_cut(rng):
    """Uncorrelated-content boundary: the run must not span the cut with
    forward-only prediction (any plan is legal; it must stay in range)."""
    p = EncoderParams(width=W, height=H, bframes=2, b_adapt=1)
    la = Lookahead(p)
    a = _scene(rng, 0)
    la.push_anchor(a)
    q = [_scene(rng, 1),
         rng.integers(0, 256, (H, W)).astype(np.uint8),
         rng.integers(0, 256, (H, W)).astype(np.uint8)]
    m = la.plan(q)
    assert 0 <= m <= 2


def test_b_adapt_conformance(rng):
    """Adaptive placement end to end: stream decodes bit-exact and the
    mini-GOP structure varies with content."""
    frames = []
    for t in range(12):
        phase = 1 if t >= 6 else 0    # scene change at t=6
        frames.append(Frame420(
            _scene(rng, t, phase),
            (128 + 40 * np.ones((H // 2, W // 2))).astype(np.uint8),
            np.full((H // 2, W // 2), 100, np.uint8)))
    enc = Encoder(EncoderParams(width=W, height=H, qp=28, me_range=8,
                                backend="device", bframes=2, b_adapt=1,
                                deblock=True))
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
    assert len(dec) == 12
    for d in range(12):
        assert np.array_equal(dec[d][0], recs[d][:H, :W]), d
    types = [s.frame_type for s in enc.stats]
    assert "B" in types and "P" in types


def test_scenecut_with_bframes(rng):
    """Pre-encode lowres scenecut inside B GOPs (slicetype.c:1430 rule;
    round-1 disabled scenecut whenever bframes>0)."""
    from x264_tpu.utils.oracle import decode_annexb
    sc1 = rng.integers(0, 140, (H, W)).astype(np.uint8)
    sc2 = rng.integers(100, 255, (H, W)).astype(np.uint8)
    frames = [Frame420((sc1 if i < 5 else sc2).copy(),
                       np.full((H // 2, W // 2), 100, np.uint8),
                       np.full((H // 2, W // 2), 120, np.uint8))
              for i in range(10)]
    enc = Encoder(EncoderParams(width=W, height=H, qp=30,
                                backend="device", bframes=2, cabac=True,
                                scenecut_threshold=40, keyint_min=1))
    stream = b"".join(enc.encode(f) for f in frames) + enc.flush()
    types = [s.frame_type for s in enc.stats]
    assert types.count("IDR") >= 2, types
    assert types[5] == "IDR" or "IDR" in types[4:7], types
    assert len(decode_annexb(stream, W, H)) == 10
