"""B-frame path (temporal direct, bi-prediction, B_Skip) vs the
libavcodec oracle — display-order reconstruction must be bit-exact."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from x264_tpu.api import Encoder  # noqa: E402
from x264_tpu.params import EncoderParams  # noqa: E402
from x264_tpu.utils.oracle import decode_annexb  # noqa: E402
from x264_tpu.utils.yuv import Frame420  # noqa: E402


def _run(rng, nframes, bf, keyint, qp, w=96, h=64, **kw):
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(nframes):
        y = (120 + 70 * np.sin((xx + 5 * t) / 13.0)
             * np.cos((yy - 3 * t) / 19.0)).astype(np.uint8)
        y += rng.integers(0, 5, (h, w)).astype(np.uint8)
        u = (128 + 40 * np.sin((xx[::2, ::2] + 5 * t) / 23.0)).astype(np.uint8)
        v = (128 + 40 * np.cos((yy[::2, ::2] + 7 * t) / 29.0)).astype(np.uint8)
        frames.append(Frame420(y, u, v))
    enc = Encoder(EncoderParams(width=w, height=h, qp=qp, me_range=8,
                                backend="device", bframes=bf,
                                keyint_max=keyint, **kw))
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
        r = enc.dpb[0]   # deblocked anchor recon, device-resident
        recs[d] = (np.asarray(r.y), np.asarray(r.u), np.asarray(r.v))
        return job

    enc._finalize_b, enc._submit_anchor = spyb, spya
    stream = b"".join(enc.encode(f) for f in frames) + enc.flush()
    dec = decode_annexb(stream, w, h)
    assert len(dec) == nframes
    for d in range(nframes):
        ry, ru, rv = recs[d]
        assert np.array_equal(dec[d][0], ry[:h, :w]), f"display {d} luma"
        assert np.array_equal(dec[d][1], ru[:h // 2, :w // 2])
        assert np.array_equal(dec[d][2], rv[:h // 2, :w // 2])
    return [s.frame_type for s in enc.stats]


@pytest.mark.parametrize("bf,keyint", [(1, 250), (2, 250), (3, 250),
                                       (2, 6)])
def test_bframes_conformance(rng, bf, keyint):
    types = _run(rng, 11, bf, keyint, 26)
    assert "B" in types


def _run_flash(rng, w=96, h=64, **kw):
    """Moving content with a one-frame NOISE FLASH at a B position:
    unpredictable from both anchors, so the B core's I16x16 escape
    (intra-in-B, analyse.c:3180 role) must fire.  Returns the per-frame
    mb_class maps captured from the B finalizer."""
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(8):
        y = (120 + 70 * np.sin((xx + 5 * t) / 13.0)
             * np.cos((yy - 3 * t) / 19.0)).astype(np.uint8)
        y += rng.integers(0, 5, (h, w)).astype(np.uint8)
        if t == 4:          # flash: B slot for bframes=2 (I P bb P ...)
            y[16:48, 16:80] = rng.integers(0, 256, (32, 64))
        u = (128 + 40 * np.sin((xx[::2, ::2] + 5 * t) / 23.0)).astype(np.uint8)
        v = (128 + 40 * np.cos((yy[::2, ::2] + 7 * t) / 29.0)).astype(np.uint8)
        frames.append(Frame420(y, u, v))
    enc = Encoder(EncoderParams(width=w, height=h, qp=26, me_range=8,
                                backend="device", bframes=2,
                                keyint_max=250, full_recon=True,
                                deblock=True, **kw))
    classes = {}
    recs = {}
    _b, _a = enc._finalize_b, enc._submit_anchor

    def spyb(job):
        data = _b(job)
        classes[job["disp"]] = np.asarray(job["out"]["mb_class"])
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
    dec = decode_annexb(stream, w, h)
    assert len(dec) == len(frames)
    for d in range(len(frames)):
        ry, ru, rv = recs[d]
        assert np.array_equal(dec[d][0], ry[:h, :w]), f"display {d} luma"
        assert np.array_equal(dec[d][1], ru[:h // 2, :w // 2]), d
        assert np.array_equal(dec[d][2], rv[:h // 2, :w // 2]), d
    return classes


def test_intra_in_b_cavlc(rng):
    classes = _run_flash(rng, cabac=False)
    assert any((c == 0).any() for c in classes.values()), \
        "flash B frame coded no intra MBs"


def test_intra_in_b_cabac(rng):
    classes = _run_flash(rng, cabac=True)
    assert any((c == 0).any() for c in classes.values())


def test_intra_in_b_cabac_t8(rng):
    """8x8dct PPS on: I16-in-B must not emit the transform flag."""
    classes = _run_flash(rng, cabac=True, transform_8x8=True)
    assert any((c == 0).any() for c in classes.values())


def test_bframes_qp_extremes(rng):
    _run(rng, 6, 2, 250, 4)
    _run(rng, 6, 2, 250, 51)


def test_bframes_cabac(rng):
    """B + CABAC (main profile combination)."""
    w, h = 96, 64
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(8):
        y = (120 + 70 * np.sin((xx + 5 * t) / 13.0)
             * np.cos((yy - 3 * t) / 19.0)).astype(np.uint8)
        y += rng.integers(0, 5, (h, w)).astype(np.uint8)
        u = (128 + 40 * np.sin((xx[::2, ::2] + 5 * t) / 23.0)).astype(np.uint8)
        v = (128 + 40 * np.cos((yy[::2, ::2] + 7 * t) / 29.0)).astype(np.uint8)
        frames.append(Frame420(y, u, v))
    enc = Encoder(EncoderParams(width=w, height=h, qp=26, me_range=8,
                                backend="device", bframes=2, cabac=True,
                                keyint_max=250))
    recs = {}
    _b, _a = enc._finalize_b, enc._submit_anchor

    def spyb(job):
        data = _b(job)
        r = enc.last_recon
        recs[job["disp"]] = (np.asarray(r.y), np.asarray(r.u))
        return data

    def spya(fr, d, ftype):
        job = _a(fr, d, ftype)
        r = enc.dpb[0]
        recs[d] = (np.asarray(r.y), np.asarray(r.u))
        return job

    enc._finalize_b, enc._submit_anchor = spyb, spya
    stream = b"".join(enc.encode(f) for f in frames) + enc.flush()
    dec = decode_annexb(stream, w, h)
    assert len(dec) == 8
    for d in range(8):
        assert np.array_equal(dec[d][0], recs[d][0][:h, :w])
        assert np.array_equal(dec[d][1], recs[d][1][:h // 2, :w // 2])


def test_full_recon_off_same_stream(rng):
    """full_recon=False (x264 b_full_recon analog) skips deblocking of
    non-reference B recon; the emitted bitstream must be identical."""
    w, h = 96, 64
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(7):
        y = (120 + 70 * np.sin((xx + 5 * t) / 13.0)
             * np.cos((yy - 3 * t) / 19.0)).astype(np.uint8)
        y += rng.integers(0, 5, (h, w)).astype(np.uint8)
        u = (128 + 40 * np.sin((xx[::2, ::2] + 5 * t) / 23.0)).astype(np.uint8)
        v = (128 + 40 * np.cos((yy[::2, ::2] + 7 * t) / 29.0)).astype(np.uint8)
        frames.append(Frame420(y, u, v))
    streams = []
    for fr in (True, False):
        enc = Encoder(EncoderParams(width=w, height=h, qp=26, me_range=8,
                                    backend="device", bframes=2,
                                    keyint_max=250, full_recon=fr))
        streams.append(b"".join(enc.encode(f) for f in frames) + enc.flush())
    assert streams[0] == streams[1]


def test_poc_lsb_wrap(rng):
    """POC LSB wraps mid-GOP (~128 display frames after IDR with
    log2_max_poc_lsb=8): temporal-direct tb/td must use UNWRAPPED POC
    (8.4.1.2.3) or every B after the wrap decodes corrupt.  135 frames
    crosses the wrap; bit-exact recon proves the fix."""
    types = _run(rng, 135, 1, 250, 30, w=32, h=32)
    assert types.count("B") > 60


@pytest.mark.parametrize("cab", [False, True])
def test_bframes_transform_8x8(rng, cab):
    """B frames in a High-profile transform_8x8 stream: anchors select
    the 8x8 transform per MB, B MBs carry the (zero) flag bit (7.3.5)."""
    types = _run(rng, 9, 2, 250, 24, cabac=cab, transform_8x8=True,
                 deblock=True)
    assert "B" in types


def test_bframes_i4x4_syn_path(rng):
    """i4x4 anchors (syntax entropy path) + device B frames."""
    w, h = 96, 64
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(7):
        y = (120 + 70 * np.sin((xx + 5 * t) / 13.0)
             * np.cos((yy - 3 * t) / 19.0)).astype(np.uint8)
        u = (128 + 40 * np.sin((xx[::2, ::2] + 5 * t) / 23.0)).astype(np.uint8)
        v = (128 + 40 * np.cos((yy[::2, ::2] + 7 * t) / 29.0)).astype(np.uint8)
        frames.append(Frame420(y, u, v))
    enc = Encoder(EncoderParams(width=w, height=h, qp=30, backend="device",
                                i4x4=True, bframes=2, deblock=True))
    recs = {}
    _b, _a = enc._finalize_b, enc._encode_anchor

    def spyb(job):
        data = _b(job)
        r = enc.last_recon
        recs[job["disp"]] = (np.asarray(r.y), np.asarray(r.u),
                             np.asarray(r.v))
        return data

    def spya(fr, d, ftype):
        out = _a(fr, d, ftype)
        r = enc.dpb[0]
        recs[d] = (np.asarray(r.y), np.asarray(r.u), np.asarray(r.v))
        return out

    enc._finalize_b, enc._encode_anchor = spyb, spya
    stream = b"".join(enc.encode(f) for f in frames) + enc.flush()
    dec = decode_annexb(stream, w, h)
    assert len(dec) == len(frames)
    for d in range(len(frames)):
        ry, ru, rv = recs[d]
        assert np.array_equal(dec[d][0], ry[:h, :w]), f"display {d}"
        assert np.array_equal(dec[d][1], ru[:h // 2, :w // 2])
        assert np.array_equal(dec[d][2], rv[:h // 2, :w // 2])


def test_b_pair_core_bitexact_vs_single(rng):
    """The mini-GOP pair core (both Bs in one vmapped program, shared
    anchors/hpel planes — round-5 throughput lever) must produce a
    bitstream IDENTICAL to two single b_frame_core submissions."""
    yy, xx = np.mgrid[0:64, 0:96]
    frames = []
    for t in range(8):
        y = (120 + 70 * np.sin((xx + 5 * t) / 13.0)
             * np.cos((yy - 3 * t) / 19.0)).astype(np.uint8)
        y += rng.integers(0, 5, (64, 96)).astype(np.uint8)
        u = (128 + 40 * np.sin((xx[::2, ::2] + 5 * t) / 23.0)).astype(np.uint8)
        v = (128 + 40 * np.cos((yy[::2, ::2] + 7 * t) / 29.0)).astype(np.uint8)
        frames.append(Frame420(y, u, v))

    def run(pair):
        enc = Encoder(EncoderParams(width=96, height=64, qp=26, me_range=8,
                                    backend="device", bframes=2,
                                    keyint_max=250, cabac=True,
                                    deblock=True, transform_8x8=True,
                                    trellis=1, full_recon=True))
        if not pair:
            enc._submit_b_pair = lambda b1, b2, prev, nxt: [
                enc._submit_b(b1[0], b1[1], prev, nxt),
                enc._submit_b(b2[0], b2[1], prev, nxt)]
        return b"".join(enc.encode(f) for f in frames) + enc.flush()

    s_pair, s_single = run(True), run(False)
    assert s_pair == s_single
    assert len(decode_annexb(s_pair, 96, 64)) == 8


@pytest.mark.parametrize("refs", [2, 3])
def test_multiref_with_bframes(rng, refs):
    """Round-5: multi-ref P anchors compose with B frames (the round-2
    `bframes => ref_frames=1` gate dropped).  B slices stay one-ref-per-
    list; temporal direct is barred at MBs whose colocated quad used an
    older anchor (ref_idx > 0), so the one-entry list0 stays conformant.
    Gate: display-order recon bit-exact vs libavcodec."""
    w, h = 96, 64
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(10):
        # alternate content so older refs sometimes win (ref_idx > 0)
        y = (120 + 70 * np.sin((xx + 5 * (t // 2 * 2)) / 13.0)
             * np.cos((yy - 3 * t) / 19.0)).astype(np.uint8)
        y += rng.integers(0, 6, (h, w)).astype(np.uint8)
        u = (128 + 40 * np.sin((xx[::2, ::2] + 5 * t) / 23.0)).astype(np.uint8)
        v = (128 + 40 * np.cos((yy[::2, ::2] + 7 * t) / 29.0)).astype(np.uint8)
        frames.append(Frame420(y, u, v))
    enc = Encoder(EncoderParams(width=w, height=h, qp=26, me_range=8,
                                backend="device", bframes=2,
                                ref_frames=refs, keyint_max=250,
                                cabac=True, deblock=True,
                                transform_8x8=True, trellis=1,
                                full_recon=True))
    recs = {}
    _fin_b, _fin_a = enc._finalize_b, enc._finalize_device

    def spy_b(job):
        data = _fin_b(job)
        r = enc.last_recon
        recs[job["disp"]] = (np.asarray(r.y), np.asarray(r.u),
                             np.asarray(r.v))
        return data

    def spy_a(job):
        data = _fin_a(job)
        r = job.get("rec") or enc.dpb[0]
        d = job.get("poc_lsb", 0) // 2 + enc._idr_disp
        recs[d] = (np.asarray(r.y), np.asarray(r.u), np.asarray(r.v))
        return data

    enc._finalize_b, enc._finalize_device = spy_b, spy_a
    stream = b"".join(enc.encode(f) for f in frames) + enc.flush()
    dec = decode_annexb(stream, w, h)
    assert len(dec) == len(frames)
    for d in range(len(frames)):
        ry, ru, rv = recs[d]
        assert np.array_equal(dec[d][0], ry[:h, :w]), f"display {d} luma"
        assert np.array_equal(dec[d][1], ru[:h // 2, :w // 2]), d
        assert np.array_equal(dec[d][2], rv[:h // 2, :w // 2]), d
