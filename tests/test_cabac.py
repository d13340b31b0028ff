"""CABAC entropy path (native/cabac.c) vs the libavcodec oracle."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from x264_tpu.api import Encoder  # noqa: E402
from x264_tpu.params import EncoderParams  # noqa: E402
from x264_tpu.utils.oracle import decode_annexb  # noqa: E402
from x264_tpu.utils.yuv import Frame420  # noqa: E402


def _run(rng, w, h, n, kind, **kw):
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        if kind == "noise":
            y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        elif kind == "flat":
            y = np.full((h, w), 90, np.uint8)
        else:
            y = (120 + 70 * np.sin((xx + 3 * t) / 13.0)
                 * np.cos((yy - 2 * t) / 19.0)).astype(np.uint8)
            y += rng.integers(0, 5, (h, w)).astype(np.uint8)
        u = (128 + 40 * np.sin((xx[::2, ::2] + 5 * t) / 23.0)).astype(np.uint8)
        v = (128 + 40 * np.cos((yy[::2, ::2] + 7 * t) / 29.0)).astype(np.uint8)
        frames.append(Frame420(y, u, v))
    enc = Encoder(EncoderParams(width=w, height=h, me_range=8, cabac=True,
                                backend="device", **kw))
    stream = b""
    recs = []
    for f in frames:
        stream += enc.encode(f)
        r = enc.last_recon
        recs.append((np.asarray(r.y), np.asarray(r.u), np.asarray(r.v)))
    dec = decode_annexb(stream, w, h)
    assert len(dec) == n
    for i, (dy, du, dv) in enumerate(dec):
        assert np.array_equal(dy, recs[i][0][:h, :w]), f"frame {i} luma"
        assert np.array_equal(du, recs[i][1][:h // 2, :w // 2])
        assert np.array_equal(dv, recs[i][2][:h // 2, :w // 2])
    return stream


@pytest.mark.parametrize("qp,kind", [(0, "noise"), (26, "move"),
                                     (51, "move"), (30, "flat")])
def test_cabac_conformance(rng, qp, kind):
    _run(rng, 96, 64, 4, kind, qp=qp, keyint_max=4)


def test_cabac_aq_dqp(rng):
    _run(rng, 96, 64, 5, "move", qp=26, aq_mode=1, aq_strength=2.0)


def test_cabac_smaller_than_cavlc(rng):
    yy, xx = np.mgrid[0:64, 0:96]
    frames = []
    for t in range(5):
        y = (120 + 70 * np.sin((xx + 3 * t) / 13.0)).astype(np.uint8)
        y += rng.integers(0, 5, (64, 96)).astype(np.uint8)
        u = np.full((32, 48), 120, np.uint8)
        v = np.full((32, 48), 130, np.uint8)
        frames.append(Frame420(y, u, v))
    sizes = {}
    for cab in (False, True):
        enc = Encoder(EncoderParams(width=96, height=64, qp=26, me_range=8,
                                    cabac=cab, backend="device"))
        sizes[cab] = len(b"".join(enc.encode(f) for f in frames))
    assert sizes[True] < sizes[False]


def test_multislice_conformance(rng):
    """Multi-slice CAVLC streams (sliced-band path) decode bit-exact."""
    w, h = 96, 96
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(4):
        y = (120 + 70 * np.sin((xx + 3 * t) / 13.0)).astype(np.uint8)
        y += rng.integers(0, 5, (h, w)).astype(np.uint8)
        u = (128 + 40 * np.sin((xx[::2, ::2] + 5 * t) / 23.0)).astype(np.uint8)
        v = (128 + 40 * np.cos((yy[::2, ::2] + 7 * t) / 29.0)).astype(np.uint8)
        frames.append(Frame420(y, u, v))
    enc = Encoder(EncoderParams(width=w, height=h, qp=26, me_range=8,
                                backend="device", slices=3, aq_mode=1))
    stream = b""
    recs = []
    for f in frames:
        stream += enc.encode(f)
        r = enc.last_recon
        recs.append((np.asarray(r.y), np.asarray(r.u), np.asarray(r.v)))
    dec = decode_annexb(stream, w, h)
    assert len(dec) == 4
    for i, (dy, du, dv) in enumerate(dec):
        assert np.array_equal(dy, recs[i][0][:h, :w])
        assert np.array_equal(du, recs[i][1][:h // 2, :w // 2])


def test_multiref_conformance(rng):
    """2- and 3-reference P frames (ref_idx te(), per-MB ref MC/MVP)."""
    w, h = 96, 64
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(8):
        ph = [0, 3, 0, 3, 1, 0, 3, 2][t]
        y = (120 + 70 * np.sin((xx + 3 * ph) / 13.0)).astype(np.uint8)
        y += rng.integers(0, 5, (h, w)).astype(np.uint8)
        u = (128 + 40 * np.sin((xx[::2, ::2] + 5 * ph) / 23.0)).astype(np.uint8)
        v = (128 + 40 * np.cos((yy[::2, ::2] + 7 * ph) / 29.0)).astype(np.uint8)
        frames.append(Frame420(y, u, v))
    for nref in (2, 3):
        enc = Encoder(EncoderParams(width=w, height=h, qp=26, me_range=8,
                                    backend="device", ref_frames=nref,
                                    scenecut_threshold=0))
        stream = b""
        recs = []
        for f in frames:
            stream += enc.encode(f)
            r = enc.last_recon
            recs.append((np.asarray(r.y), np.asarray(r.u)))
        dec = decode_annexb(stream, w, h)
        assert len(dec) == 8
        for i, (dy, du, dv) in enumerate(dec):
            assert np.array_equal(dy, recs[i][0][:h, :w])
            assert np.array_equal(du, recs[i][1][:h // 2, :w // 2])


def test_cabac_fast_path_matches_syn(rng):
    """The compact-blob fast path (device blob -> C packed entry) must
    produce the same bitstream as the syntax-tensor path."""
    from x264_tpu.utils.yuv import Frame420
    w, h = 96, 64
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(6):
        y = (120 + 70 * np.sin((xx + 4 * t) / 13.0)
             * np.cos((yy - 3 * t) / 19.0)).astype(np.uint8)
        y += rng.integers(0, 5, (h, w)).astype(np.uint8)
        if t == 3:
            y[16:48, 32:80] = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        u = (128 + 40 * np.sin((xx[::2, ::2] + 4 * t) / 23.0)).astype(np.uint8)
        v = (128 + 40 * np.cos((yy[::2, ::2] + 5 * t) / 29.0)).astype(np.uint8)
        frames.append(Frame420(y, u, v))
    streams = []
    for backend in ("device", "device_host_entropy"):
        enc = Encoder(EncoderParams(width=w, height=h, qp=27, me_range=8,
                                    backend=backend, cabac=True,
                                    scenecut_threshold=0, deblock=True))
        streams.append(b"".join(enc.encode(f) for f in frames) + enc.flush())
    assert streams[0] == streams[1]


def test_blob_compaction_stress(rng):
    """The log-shift stable compaction in cabac_blob must equal python
    nonzero-compaction for adversarial density patterns."""
    import jax.numpy as jnp

    from x264_tpu.ops.device.entropy_pack import N_VALS, cabac_blob

    for trial in range(8):
        n = int(rng.integers(1, 24))
        flat = rng.integers(-3000, 3000, (n, N_VALS)).astype(np.int64)
        style = trial % 4
        if style == 0:
            flat[rng.random((n, N_VALS)) > 0.05] = 0
        elif style == 1:
            flat[rng.random((n, N_VALS)) > 0.7] = 0      # dense
        elif style == 2:
            flat[:, ::2] = 0                              # alternating
        else:
            flat[:, :200] = 0                             # long zero run
        flat[flat == 0] += 0
        K = int(rng.choice([8, 64, 216, 408]))
        z = jnp.zeros(n, jnp.int32)
        blob = np.asarray(cabac_blob(
            jnp.asarray(flat[:, :16], jnp.int32),
            jnp.asarray(flat[:, 16:272].reshape(n, 16, 16), jnp.int32),
            jnp.asarray(flat[:, 272:280].reshape(n, 2, 4), jnp.int32),
            jnp.asarray(flat[:, 280:].reshape(n, 2, 4, 16), jnp.int32),
            z, jnp.zeros((n, 2), jnp.int32), z, z, z, z, z, z, z, K))
        from x264_tpu.ops.device.entropy_pack import blob_stride
        st = blob_stride(False)
        rows = blob[:n * st].reshape(n, st)
        lvw = blob[n * st:].astype(np.uint32)
        got = np.zeros(n * K, np.int16)
        got[0::2] = (lvw & 0xffff).astype(np.uint16).astype(np.int16)
        got[1::2] = (lvw >> 16).astype(np.uint16).astype(np.int16)
        allnz = flat[flat != 0].astype(np.int16)     # frame emission order
        m = min(len(allnz), n * K)
        assert np.array_equal(got[:m], allnz[:m]), trial
        if len(allnz) < n * K:
            assert not got[len(allnz):].any(), trial
        # per-MB prefixes match the cumulative counts
        nnz_mb = (flat != 0).sum(1)
        assert np.array_equal(rows[:, 13],
                              np.cumsum(nnz_mb) - nnz_mb), trial
        assert np.array_equal(rows[:, 14 + 8], nnz_mb), trial


@pytest.mark.parametrize("qp", [14, 28, 40])
def test_cabac_i4x4_iframes(qp):
    """I_NxN mb_type tree, prev/rem intra4x4 pred mode bins, cat-2 luma
    residuals of intra MBs — oracle bit-exact (reference backend)."""
    from tests.test_e2e import encode_and_check, synth_frames
    p = EncoderParams(width=96, height=64, qp=qp, keyint_max=1,
                      deblock=True, backend="reference", i4x4=True,
                      cabac=True)
    encode_and_check(synth_frames(96, 64, 2), p)


def test_cabac_i4x4_device_gop():
    from tests.test_e2e import encode_and_check, synth_frames
    p = EncoderParams(width=96, height=64, qp=28, keyint_max=0,
                      deblock=True, backend="device", i4x4=True,
                      cabac=True, aq_mode=1)
    encode_and_check(synth_frames(96, 64, 4), p)
