"""Reference-kernel unit tests (checkasm-style, random-input property tests).
These kernels are the oracles that the Pallas/XLA tier is later tested
against, so they get their own independent checks here."""

import numpy as np
import pytest

from x264_tpu.ops.reference import mc, pixel, predict, quant, transform


# -- transforms ---------------------------------------------------------------

def test_dct_idct_roundtrip_exact_scale(rng):
    """idct(dct(x) * scale_identity) == x for the integer transform when the
    dequant stage is replaced by the exact inverse scaling at qp where
    MF*V == 2^(qbits+6)... instead we check the full quant pipeline error
    bound below; here: linearity + DC behavior."""
    r = rng.integers(-255, 256, size=(50, 4, 4))
    c = transform.dct4x4(r)
    # DC coefficient equals sum of residuals
    np.testing.assert_array_equal(c[:, 0, 0], r.sum((1, 2)))
    # linearity
    c2 = transform.dct4x4(2 * r)
    np.testing.assert_array_equal(c2, 2 * c)


@pytest.mark.parametrize("qp", [0, 4, 10, 17, 23, 29, 35, 40, 47, 51])
def test_quant_pipeline_error_bound(rng, qp):
    """Encoder forward -> quant -> dequant -> idct must reconstruct within
    the quantizer step size (Qstep ~ 2^(qp/6) * 0.625..1.0 scaling)."""
    r = rng.integers(-200, 201, size=(200, 4, 4))
    c = transform.dct4x4(r)
    for intra in (True, False):
        lv = quant.quant4x4(c, qp, intra)
        d = quant.dequant4x4(lv, qp)
        r2 = transform.idct4x4(d)
        qstep = 0.625 * 2 ** (qp / 6)
        err = np.abs(r2 - r).max()
        assert err <= max(3, 2.5 * qstep), f"qp={qp} intra={intra} err={err}"


def test_quant_zero_preserved(rng):
    z = np.zeros((3, 4, 4), dtype=np.int64)
    assert np.all(quant.quant4x4(z, 26, True) == 0)
    assert np.all(transform.idct4x4(quant.dequant4x4(z, 26)) == 0)


@pytest.mark.parametrize("qp", [0, 12, 26, 38, 51])
def test_dc_luma_pipeline(rng, qp):
    """I16x16 DC path: fwd hadamard -> quant -> dequant chain error bound."""
    dc = rng.integers(-2000, 2001, size=(50, 4, 4))
    f = transform.hadamard4x4_fwd(dc)
    lv = quant.quant_dc4(f, qp)
    fi = transform.hadamard4x4_inv(lv)
    out = quant.dequant_dc4(fi, qp)
    # The dequantized-coefficient domain carries gain 4 vs the forward DCT
    # domain (IDCT normalizes by 64 while the forward gains 16), so the DC
    # round trip must give ~4*dc.
    qstep = 0.625 * 2 ** (qp / 6)
    err = np.abs(out - 4 * dc).max() / 4
    assert err <= max(4, 6 * qstep), f"qp={qp} err={err}"


def test_block_reshape_roundtrip(rng):
    p = rng.integers(0, 256, size=(48, 64))
    b = transform.plane_to_blocks4(p)
    np.testing.assert_array_equal(transform.blocks4_to_plane(b, 48, 64), p)
    mb = rng.integers(0, 256, size=(7, 16, 16))
    blk = transform.mb_luma_to_blocks(mb)
    np.testing.assert_array_equal(transform.blocks_to_mb_luma(blk), mb)
    # block 5 of MB = rows 4:8, cols 4:8 (raster order b = 4*y4 + x4)
    np.testing.assert_array_equal(blk[:, 5], mb[:, 4:8, 4:8])


# -- intra prediction ---------------------------------------------------------

def test_predict_16x16_basic(rng):
    n = 8
    top = rng.integers(0, 256, size=(n, 16))
    left = rng.integers(0, 256, size=(n, 16))
    tl = rng.integers(0, 256, size=(n,))
    at = np.ones(n, bool)
    al = np.ones(n, bool)
    p = predict.predict_16x16_all(top, left, tl, at, al)
    assert p.shape == (n, 4, 16, 16)
    np.testing.assert_array_equal(p[:, 0], np.broadcast_to(top[:, None, :], (n, 16, 16)))
    np.testing.assert_array_equal(p[:, 1], np.broadcast_to(left[:, :, None], (n, 16, 16)))
    dc = (top.sum(1) + left.sum(1) + 16) >> 5
    np.testing.assert_array_equal(p[:, 2], np.broadcast_to(dc[:, None, None], (n, 16, 16)))
    assert p.min() >= 0 and p.max() <= 255


def test_predict_16x16_dc_unavailable():
    n = 3
    top = np.full((n, 16), 77)
    left = np.full((n, 16), 33)
    tl = np.zeros(n, np.int64)
    p = predict.predict_16x16_all(top, left, tl, np.zeros(n, bool), np.zeros(n, bool))
    assert np.all(p[:, 2] == 128)
    p = predict.predict_16x16_all(top, left, tl, np.ones(n, bool), np.zeros(n, bool))
    assert np.all(p[:, 2] == 77)
    p = predict.predict_16x16_all(top, left, tl, np.zeros(n, bool), np.ones(n, bool))
    assert np.all(p[:, 2] == 33)


def test_predict_chroma_dc_quadrants():
    n = 1
    top = np.concatenate([np.full((n, 4), 10), np.full((n, 4), 50)], axis=1)
    left = np.concatenate([np.full((n, 4), 30), np.full((n, 4), 70)], axis=1)
    tl = np.zeros(n, np.int64)
    p = predict.predict_chroma_all(top, left, tl, np.ones(n, bool), np.ones(n, bool))
    dc = p[0, 0]
    assert dc[0, 0] == (10 * 4 + 30 * 4 + 4) >> 3
    assert dc[0, 7] == (50 * 4 + 2) >> 2
    assert dc[7, 0] == (70 * 4 + 2) >> 2
    assert dc[7, 7] == (50 * 4 + 70 * 4 + 4) >> 3


def test_predict_4x4_flat_consistency(rng):
    """On a constant edge every mode must predict that constant."""
    n = 4
    c = 99
    top8 = np.full((n, 8), c)
    left = np.full((n, 4), c)
    tl = np.full((n,), c)
    ones = np.ones(n, bool)
    p = predict.predict_4x4_all(top8, left, tl, ones, ones, ones)
    assert p.shape == (n, 9, 4, 4)
    assert np.all(p == c)


def test_predict_4x4_v_h_exact(rng):
    n = 5
    top8 = rng.integers(0, 256, size=(n, 8))
    left = rng.integers(0, 256, size=(n, 4))
    tl = rng.integers(0, 256, size=(n,))
    ones = np.ones(n, bool)
    p = predict.predict_4x4_all(top8, left, tl, ones, ones, ones)
    np.testing.assert_array_equal(p[:, 0], np.broadcast_to(top8[:, None, :4], (n, 4, 4)))
    np.testing.assert_array_equal(p[:, 1], np.broadcast_to(left[:, :, None], (n, 4, 4)))
    dc = (top8[:, :4].sum(1) + left.sum(1) + 4) >> 3
    np.testing.assert_array_equal(p[:, 2], np.broadcast_to(dc[:, None, None], (n, 4, 4)))


def test_predict_4x4_topright_substitution():
    n = 1
    top8 = np.concatenate([np.full((n, 4), 10), np.full((n, 4), 200)], axis=1)
    left = np.full((n, 4), 10)
    tl = np.full((n,), 10)
    ones = np.ones(n, bool)
    p_with = predict.predict_4x4_all(top8, left, tl, ones, ones, ones)
    p_without = predict.predict_4x4_all(top8, left, tl, ones, ones, np.zeros(n, bool))
    # without top-right, substitution makes the edge flat -> DDL predicts 10
    assert np.all(p_without[0, 3] == 10)
    assert not np.all(p_with[0, 3] == 10)


# -- pixel metrics ------------------------------------------------------------

def test_sad_satd_ssd(rng):
    a = rng.integers(0, 256, size=(10, 16, 16))
    b = rng.integers(0, 256, size=(10, 16, 16))
    assert np.all(pixel.sad(a, a) == 0)
    assert np.all(pixel.satd(a, a) == 0)
    assert np.all(pixel.ssd(a, a) == 0)
    s = pixel.sad(a, b)
    assert s.shape == (10,)
    np.testing.assert_array_equal(s, np.abs(a.astype(int) - b.astype(int)).sum((1, 2)))
    # satd of a DC-only difference: hadamard packs it into 1 coef * 16, >>1
    d = np.zeros((1, 4, 4), np.int64)
    a0 = np.full((1, 4, 4), 100)
    b0 = np.full((1, 4, 4), 90)
    assert pixel.satd4x4(a0, b0)[0] == (10 * 16) >> 1


# -- motion compensation ------------------------------------------------------

def test_hpel_flat(rng):
    p = np.full((32, 40), 123, dtype=np.int64)
    fp, hh, hv, hc = mc.hpel_planes(p)
    for q in (hh, hv, hc):
        assert q.shape == p.shape
        assert np.all(q == 123)


def test_hpel_linear_ramp():
    """6-tap filter reproduces linear signals exactly away from clipping."""
    x = np.arange(64, dtype=np.int64)
    p = np.broadcast_to(x * 2 + 40, (32, 64)).copy()
    fp, hh, hv, hc = mc.hpel_planes(p)
    inner = hh[:, 2:-3]
    expected = (p[:, 2:-3] + p[:, 3:-2]) // 2 + ((p[:, 3:-2] - p[:, 2:-3]) % 2 > 0)
    # linear ramp: filter value = midpoint (rounded)
    mid = (p[:, 2:-3] + p[:, 3:-2] + 1) // 2
    np.testing.assert_array_equal(inner, mid)
    assert np.all(hv == p)  # vertically constant


def test_qpel_fullpel_identity(rng):
    p = rng.integers(0, 256, size=(40, 40)).astype(np.int64)
    planes = mc.hpel_planes(p)
    blk = mc.qpel_sample(*planes, 0, 0, 8, 8, 16, 16)
    np.testing.assert_array_equal(blk, p[8:24, 8:24])
    blk = mc.qpel_sample(*planes, 4, -8, 8, 8, 16, 16)
    np.testing.assert_array_equal(blk, p[6:22, 9:25])


def test_chroma_mc_fullpel_and_bilinear(rng):
    p = rng.integers(0, 256, size=(24, 24)).astype(np.int64)
    blk = mc.chroma_mc(p, 0, 0, 4, 4, 8, 8)
    np.testing.assert_array_equal(blk, p[4:12, 4:12])
    blk = mc.chroma_mc(p, 4, 4, 4, 4, 8, 8)  # half-pel both -> 4-tap avg
    exp = (p[4:12, 4:12] + p[4:12, 5:13] + p[5:13, 4:12] + p[5:13, 5:13] + 2) >> 2
    np.testing.assert_array_equal(blk, exp)


def test_lowres(rng):
    p = rng.integers(0, 256, size=(16, 16)).astype(np.int64)
    lr = mc.lowres_downsample(p)
    assert lr.shape == (8, 8)
    assert lr[0, 0] == (p[0, 0] + p[0, 1] + p[1, 0] + p[1, 1] + 2) >> 2


def test_predict_8x8_device_parity(rng):
    """Device I8x8 prediction (filter + 9 modes) vs the NumPy tier on
    random edges across every availability pattern."""
    import jax.numpy as jnp
    from x264_tpu.ops.device import predict as DP
    from x264_tpu.ops.reference import predict as RP
    n = 64
    t = rng.integers(0, 256, (n, 16))
    l = rng.integers(0, 256, (n, 8))
    tl = rng.integers(0, 256, n)
    at = rng.random(n) < 0.8
    al = rng.random(n) < 0.8
    atl = at & al & (rng.random(n) < 0.8)
    atr = at & (rng.random(n) < 0.7)
    ref = RP.predict_8x8_all(t, l, tl, at, al, atl, atr)
    dev = DP.predict_8x8_all(jnp.asarray(t), jnp.asarray(l),
                             jnp.asarray(tl), jnp.asarray(at),
                             jnp.asarray(al), jnp.asarray(atl),
                             jnp.asarray(atr))
    np.testing.assert_array_equal(ref, np.asarray(dev))
