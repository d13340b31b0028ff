"""Device (JAX) tier vs NumPy reference tier — the checkasm analog for the
TPU 'architecture' (SURVEY §4.1): every device kernel must match the
reference kernels bit-exactly on random inputs, and whole-frame device
pipelines must produce byte-identical bitstreams."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from x264_tpu.ops.reference import pixel as rpixel  # noqa: E402
from x264_tpu.ops.reference import predict as rpredict  # noqa: E402
from x264_tpu.ops.reference import quant as rquant  # noqa: E402
from x264_tpu.ops.reference import transform as rtransform  # noqa: E402
from x264_tpu.ops.device import pixel as dpixel  # noqa: E402
from x264_tpu.ops.device import predict as dpredict  # noqa: E402
from x264_tpu.ops.device import transform as dtransform  # noqa: E402

QPS = [0, 1, 11, 17, 26, 35, 36, 43, 51]


def _eq(dev, ref):
    np.testing.assert_array_equal(np.asarray(dev), np.asarray(ref))


class TestTransforms:
    def test_dct_idct(self, rng):
        res = rng.integers(-255, 256, (64, 4, 4))
        _eq(dtransform.dct4x4(jnp.asarray(res)), rtransform.dct4x4(res))
        coefs = rng.integers(-2048, 2048, (64, 4, 4))
        _eq(dtransform.idct4x4(jnp.asarray(coefs)), rtransform.idct4x4(coefs))

    def test_hadamard(self, rng):
        dc = rng.integers(-4080, 4081, (32, 4, 4))
        _eq(dtransform.hadamard4x4_fwd(jnp.asarray(dc)),
            rtransform.hadamard4x4_fwd(dc))
        _eq(dtransform.hadamard4x4_inv(jnp.asarray(dc)),
            rtransform.hadamard4x4_inv(dc))
        c2 = rng.integers(-4080, 4081, (32, 2, 2))
        _eq(dtransform.hadamard2x2(jnp.asarray(c2)), rtransform.hadamard2x2(c2))

    @pytest.mark.parametrize("qp", QPS)
    def test_quant_roundtrip(self, rng, qp):
        coefs = rng.integers(-9180, 9181, (64, 4, 4))
        for intra in (True, False):
            lv_r = rquant.quant4x4(coefs, qp, intra)
            _eq(dtransform.quant4x4(jnp.asarray(coefs), jnp.int32(qp), intra),
                lv_r)
            _eq(dtransform.dequant4x4(jnp.asarray(lv_r), jnp.int32(qp)),
                rquant.dequant4x4(lv_r, qp))

    def test_dct8_idct8(self, rng):
        res = rng.integers(-255, 256, (32, 8, 8))
        _eq(dtransform.dct8x8(jnp.asarray(res)), rtransform.dct8x8(res))
        coefs = rng.integers(-16320, 16321, (32, 8, 8))
        _eq(dtransform.idct8x8(jnp.asarray(coefs)), rtransform.idct8x8(coefs))

    @pytest.mark.parametrize("qp", QPS)
    def test_quant8_roundtrip(self, rng, qp):
        coefs = rng.integers(-16320, 16321, (32, 8, 8))
        for intra in (True, False):
            lv_r = rquant.quant8x8(coefs, qp, intra)
            _eq(dtransform.quant8x8(jnp.asarray(coefs), jnp.int32(qp), intra),
                lv_r)
            _eq(dtransform.dequant8x8(jnp.asarray(lv_r), jnp.int32(qp)),
                rquant.dequant8x8(lv_r, qp))
        # encode/decode closes the loop: idct8(dequant8(quant8(dct8(r))))
        # stays within the usual quantization error bound.
        res = rng.integers(-255, 256, (8, 8, 8))
        lv = rquant.quant8x8(rtransform.dct8x8(res), qp, False)
        r2 = rtransform.idct8x8(rquant.dequant8x8(lv, qp))
        assert np.abs(r2 - res).max() <= (1 << (qp // 6 + 3))

    def test_blocks8_layout(self, rng):
        mb = rng.integers(0, 256, (5, 16, 16))
        b_r = rtransform.mb_luma_to_blocks8(mb)
        _eq(dtransform.mb_luma_to_blocks8(jnp.asarray(mb)), b_r)
        _eq(dtransform.blocks8_to_mb_luma(jnp.asarray(b_r)), mb)
        assert (rtransform.blocks8_to_mb_luma(b_r) == mb).all()
        from x264_tpu.bitstream.tables import ZIGZAG_8x8
        blk = rng.integers(-99, 100, (6, 8, 8))
        _eq(dtransform.zigzag8(jnp.asarray(blk)),
            blk.reshape(6, 64)[:, ZIGZAG_8x8])

    @pytest.mark.parametrize("qp", QPS)
    def test_dc_paths(self, rng, qp):
        fdc = rng.integers(-32640, 32641, (16, 4, 4))
        lv = rquant.quant_dc4(fdc, qp, True)
        _eq(dtransform.quant_dc4(jnp.asarray(fdc), jnp.int32(qp), True), lv)
        _eq(dtransform.dequant_dc4(jnp.asarray(lv), jnp.int32(qp)),
            rquant.dequant_dc4(lv, qp))
        c2 = rng.integers(-8160, 8161, (16, 2, 2))
        for intra in (True, False):
            lv2 = rquant.quant_dc2(c2, qp, intra)
            _eq(dtransform.quant_dc2(jnp.asarray(c2), jnp.int32(qp), intra), lv2)
            _eq(dtransform.dequant_dc2(jnp.asarray(lv2), jnp.int32(qp)),
                rquant.dequant_dc2(lv2, qp))

    def test_layout(self, rng):
        mb = rng.integers(0, 256, (5, 16, 16))
        _eq(dtransform.mb_luma_to_blocks(jnp.asarray(mb)),
            rtransform.mb_luma_to_blocks(mb))
        blk = rng.integers(-99, 99, (5, 16, 4, 4))
        _eq(dtransform.blocks_to_mb_luma(jnp.asarray(blk)),
            rtransform.blocks_to_mb_luma(blk))
        blocks = rng.integers(-9, 9, (7, 4, 4))
        from x264_tpu.bitstream.tables import ZIGZAG_4x4
        zz_d = dtransform.zigzag(jnp.asarray(blocks))
        _eq(zz_d, blocks.reshape(7, 16)[:, ZIGZAG_4x4])
        _eq(dtransform.unzigzag(zz_d), blocks)


class TestPixel:
    def test_sad_ssd_satd(self, rng):
        a = rng.integers(0, 256, (10, 16, 16))
        b = rng.integers(0, 256, (10, 16, 16))
        _eq(dpixel.sad(jnp.asarray(a), jnp.asarray(b)), rpixel.sad(a, b))
        _eq(dpixel.ssd(jnp.asarray(a), jnp.asarray(b)), rpixel.ssd(a, b))
        _eq(dpixel.satd(jnp.asarray(a), jnp.asarray(b)), rpixel.satd(a, b))
        a8 = rng.integers(0, 256, (10, 8, 8))
        b8 = rng.integers(0, 256, (10, 8, 8))
        _eq(dpixel.satd(jnp.asarray(a8), jnp.asarray(b8)), rpixel.satd(a8, b8))


class TestPredict:
    def test_i16x16_chroma_modes(self, rng):
        n = 16
        top = rng.integers(0, 256, (n, 16))
        left = rng.integers(0, 256, (n, 16))
        tl = rng.integers(0, 256, (n,))
        at = rng.integers(0, 2, (n,)).astype(bool)
        al = rng.integers(0, 2, (n,)).astype(bool)
        _eq(dpredict.predict_16x16_all(jnp.asarray(top), jnp.asarray(left),
                                       jnp.asarray(tl), jnp.asarray(at),
                                       jnp.asarray(al)),
            rpredict.predict_16x16_all(top, left, tl, at, al))
        ctop = rng.integers(0, 256, (n, 8))
        cleft = rng.integers(0, 256, (n, 8))
        _eq(dpredict.predict_chroma_all(jnp.asarray(ctop), jnp.asarray(cleft),
                                        jnp.asarray(tl), jnp.asarray(at),
                                        jnp.asarray(al)),
            rpredict.predict_chroma_all(ctop, cleft, tl, at, al))
        _eq(dpredict.i16x16_mode_avail(jnp.asarray(at), jnp.asarray(al),
                                       jnp.asarray(at & al)),
            rpredict.i16x16_mode_avail(at, al, at & al))
        _eq(dpredict.chroma_mode_avail(jnp.asarray(at), jnp.asarray(al),
                                       jnp.asarray(at & al)),
            rpredict.chroma_mode_avail(at, al, at & al))


def _test_clip(rng, w, h, n):
    """Smooth-ish moving test clip (same generator family as test_e2e)."""
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = (128 + 64 * np.sin(xx / 17.0 + t * 0.4)
             * np.cos(yy / 23.0 - t * 0.2)).astype(np.uint8)
        y += (rng.integers(0, 6, (h, w))).astype(np.uint8)
        u = (128 + 32 * np.sin((xx[::2, ::2] + 4 * t) / 31.0)).astype(np.uint8)
        v = (128 + 32 * np.cos((yy[::2, ::2] - 3 * t) / 29.0)).astype(np.uint8)
        frames.append((y, u, v))
    return frames


class TestFramePipelines:
    """Whole-frame device vs reference: byte-identical bitstreams."""

    @pytest.mark.parametrize("qp", [16, 26, 38])
    def test_bitstream_identical(self, rng, qp):
        from x264_tpu.api import Encoder
        from x264_tpu.params import EncoderParams
        from x264_tpu.utils.yuv import Frame420

        w, h = 96, 64
        frames = _test_clip(rng, w, h, 5)
        outs = []
        for backend in ("reference", "device"):
            p = EncoderParams(width=w, height=h, qp=qp, keyint_max=4,
                              me_range=8, backend=backend)
            enc = Encoder(p)
            data = b"".join(enc.encode(Frame420(y, u, v))
                            for (y, u, v) in frames)
            outs.append(data)
        assert outs[0] == outs[1]


def test_me_pallas_bit_exact(rng):
    """The Mosaic exhaustive-search kernel must match the XLA fori_loop
    search exactly, mv and cost — in COMPILED mode (a cross-call buffer
    donation miscompile once corrupted every SAD on hardware while
    interpret mode stayed clean; geometries with mbw >= 7 triggered
    it)."""
    import jax.numpy as jnp

    from x264_tpu.models.inter_frame import PAD
    from x264_tpu.ops.device.me import _full_search_xla
    from x264_tpu.ops.device.me_pallas import full_search_pallas

    for (mbw, mbh, mer) in [(6, 4, 8), (7, 5, 16), (10, 6, 8),
                            (16, 9, 8)]:
        h, w = mbh * 16, mbw * 16
        src = rng.integers(0, 256, (h, w)).astype(np.uint8)
        big = rng.integers(0, 256, (h + 2 * PAD, w + 2 * PAD)
                           ).astype(np.int32)
        big[PAD - 3:PAD - 3 + h, PAD + 5:PAD + 5 + w] = src
        ref = np.clip(big + rng.integers(-6, 7, big.shape), 0, 255
                      ).astype(np.uint8)
        lam = np.int32(14)
        mv_a, c_a = _full_search_xla(jnp.asarray(src), jnp.asarray(ref),
                                     lam, me_range=mer, mbw=mbw, mbh=mbh)
        import jax
        interp_modes = ([True, False] if jax.default_backend() == "tpu"
                        else [True])
        for interp in interp_modes:
            mv_b, c_b = full_search_pallas(
                jnp.asarray(src), jnp.asarray(ref), lam, me_range=mer,
                mbw=mbw, mbh=mbh, interpret=interp)
            assert np.array_equal(np.asarray(mv_a), np.asarray(mv_b)), \
                (mbw, mbh, mer, interp)
            assert np.array_equal(np.asarray(c_a), np.asarray(c_b)), \
                (mbw, mbh, mer, interp)


def test_subpel_window_hpel_bit_exact(rng):
    """The in-window half-pel option (ref_pad=) must match the
    hpel-planes path exactly (kept as an alternative formulation; the
    planes path measured faster at 1080p on TPU)."""
    import jax.numpy as jnp

    from x264_tpu.models.inter_frame import PAD
    from x264_tpu.ops.device.mc import hpel_planes
    from x264_tpu.ops.device.me import subpel_refine

    mbw, mbh, mer = 6, 4, 8
    h, w = mbh * 16, mbw * 16
    src = rng.integers(0, 256, (h, w)).astype(np.uint8)
    ref = rng.integers(0, 256, (h + 2 * PAD, w + 2 * PAD)).astype(np.uint8)
    src_mbs = (src.reshape(mbh, 16, mbw, 16).transpose(0, 2, 1, 3)
               .reshape(mbw * mbh, 16, 16).astype(np.int64))
    mv0 = (4 * rng.integers(-mer, mer + 1, (mbw * mbh, 2))).astype(np.int32)
    lam = np.int32(14)
    planes = hpel_planes(jnp.asarray(ref))
    a = subpel_refine(jnp.asarray(src_mbs), planes, jnp.asarray(mv0),
                      lam, mer, 2, mbw, mbh, return_pred=True)
    b = subpel_refine(jnp.asarray(src_mbs), None, jnp.asarray(mv0),
                      lam, mer, 2, mbw, mbh, return_pred=True,
                      ref_pad=jnp.asarray(ref))
    for x1, x2 in zip(a, b):
        assert np.array_equal(np.asarray(x1), np.asarray(x2))


def test_i4_frame_core_parity():
    """Device knight-wavefront I4x4 core vs the serial reference tier:
    recon planes + every syntax tensor bit-equal (incl. the I16-vs-I4
    decision and the i4 mode chain)."""
    import collections
    from x264_tpu.models import intra_device, intra_frame
    from x264_tpu.models.inter_frame import me_lambda
    rng = np.random.default_rng(11)
    w, h = 96, 64
    yy, xx = np.mgrid[0:h, 0:w]
    y = (120 + 70 * np.sin(xx / 11) * np.cos(yy / 8)
         + rng.integers(0, 9, (h, w))).astype(np.uint8)
    # hard directional structure so the I4x4 candidate beats I16 in
    # TRUE RD cost somewhere (the round-5 SSD+rate arbitration picks
    # I16 on purely smooth content — legitimately)
    y[16:32, 16:32] = (((xx[16:32, 16:32] + yy[16:32, 16:32]) // 2) % 2
                       * 200 + 30)
    y[32:48, 48:64] = ((xx[32:48, 48:64] % 4 < 2) * 180 + 40)
    u = (y[::2, ::2] // 2 + 50).astype(np.uint8)
    v = (y[1::2, ::2] // 2 + 70).astype(np.uint8)
    lam = me_lambda(26)
    i4_any = 0
    for qp in (14, 26, 40):
        r1 = intra_frame.encode_iframe(y, u, v, qp, 0, i4x4=True, lam=lam)
        r2 = intra_device.encode_iframe_device(y, u, v, qp, 0, i4x4=True,
                                               lam=lam)
        for i in range(3):
            np.testing.assert_array_equal(np.asarray(r1[i]),
                                          np.asarray(r2[i]))
        s1, s2 = r1[3], r2[3]
        for k in ("mb_class", "i16_mode", "i4_modes", "chroma_mode",
                  "cbp_luma", "cbp_chroma", "luma_dc", "luma_ac",
                  "luma_nnz", "chroma_dc", "chroma_ac", "chroma_nnz"):
            np.testing.assert_array_equal(getattr(s1, k), getattr(s2, k),
                                          err_msg=f"qp{qp} {k}")
        mix = collections.Counter(s1.mb_class.tolist())
        i4_any += mix[1]
    assert i4_any > 0, "no I4x4 chosen at any qp: decision degenerate"
