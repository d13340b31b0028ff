"""MB-tree temporal QP propagation."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from x264_tpu.api import Encoder  # noqa: E402
from x264_tpu.models import mbtree as MT  # noqa: E402
from x264_tpu.params import RC_CRF, EncoderParams  # noqa: E402
from x264_tpu.utils.oracle import decode_annexb  # noqa: E402
from x264_tpu.utils.yuv import Frame420  # noqa: E402


def test_propagate_zero_motion_referenced():
    """A perfectly predicted static window: everything propagates, the
    head MBs get strongly negative offsets."""
    mbw, mbh, n = 4, 3, 12
    ic = np.full(n, 1000.0)
    ics = [ic] * 4
    pcs = [None] + [np.zeros(n)] * 3
    mvs = [None] + [np.zeros((n, 2), np.int32)] * 3
    prop = MT.propagate(ics, pcs, mvs, mbw, mbh)
    assert (prop > 0).all()
    off = MT.finish(ic, prop)
    assert (off < -1.0).all()


def test_propagate_unreferenced_is_zero():
    """inter cost == intra cost (nothing predicted): no propagation."""
    mbw, mbh, n = 4, 3, 12
    ic = np.full(n, 1000.0)
    ics = [ic] * 3
    pcs = [None, np.full(n, 1000.0), np.full(n, 2000.0)]
    mvs = [None] + [np.zeros((n, 2), np.int32)] * 2
    prop = MT.propagate(ics, pcs, mvs, mbw, mbh)
    assert np.allclose(prop, 0.0)
    assert np.allclose(MT.finish(ic, prop), 0.0)


def test_splat_bilinear_weights():
    """mv (8,8) fullpel (qpel 32) splits the amount over a 2x2 block
    neighbourhood with equal weights."""
    mbw, mbh = 3, 3
    amount = np.zeros(9)
    amount[4] = 256.0                  # centre MB
    mv = np.zeros((9, 2), np.int32)
    mv[4] = (32, 32)
    out = MT._splat(amount, mv, mbw, mbh)
    g = out.reshape(3, 3)
    assert g[1, 1] == g[1, 2] == g[2, 1] == g[2, 2] == 64.0


def test_mbtree_bframes_e2e(rng):
    """Unified lookahead window: CRF + MB-tree + B frames (the
    slicetype.c macroblock_tree-with-B analog).  The queue feeds the
    B-GOP machinery in display order; the stream decodes bit-exact and
    anchors carry per-MB offsets (8x8 lowres grain = one per MB)."""
    from tests.test_bframes import _run
    from x264_tpu.params import RC_CRF
    types = _run(rng, 12, 2, 250, 30, rc_method=RC_CRF, crf=30.0,
                 mbtree=True, rc_lookahead=3)
    assert "B" in types


def test_mbtree_e2e(rng):
    """CRF + MB-tree: lookahead delay drains at flush, stream decodes
    bit-exact, and offsets leave persistent content at lower QP."""
    W, H = 160, 96
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for t in range(10):
        y = (120 + 70 * np.sin((xx + 2 * t) / 13.0)
             * np.cos((yy - t) / 19.0)).astype(np.uint8)
        y += rng.integers(0, 4, (H, W)).astype(np.uint8)
        u = (128 + 40 * np.sin((xx[::2, ::2]) / 23.0)).astype(np.uint8)
        v = (128 + 40 * np.cos((yy[::2, ::2]) / 29.0)).astype(np.uint8)
        frames.append(Frame420(y, u, v))
    enc = Encoder(EncoderParams(width=W, height=H, me_range=8,
                                backend="device", deblock=True,
                                rc_method=RC_CRF, crf=30.0,
                                mbtree=True, rc_lookahead=4))
    recs, chunks = [], []
    for f in frames:
        data = enc.encode(f)
        chunks.append(data)
        if data:
            r = enc.last_recon
            recs.append((np.asarray(r.y), np.asarray(r.u),
                         np.asarray(r.v)))
    tail = enc.flush()
    # the first rc_lookahead encodes are delayed
    assert chunks[0] == b"" and chunks[3] == b""
    stream = b"".join(chunks) + tail
    # collect remaining recons from flush? recon order == encode order,
    # but flush-time recons were not captured: decode-check frame count
    # and the frames we did capture
    dec = decode_annexb(stream, W, H)
    assert len(dec) == 10
    for d, (ry, ru, rv) in enumerate(recs):
        assert np.array_equal(dec[d][0], ry[:H, :W]), d
        assert np.array_equal(dec[d][1], ru[:H // 2, :W // 2]), d
