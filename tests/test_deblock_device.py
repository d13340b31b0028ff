"""Device deblocking + vectorized/device CAVLC vs their NumPy reference
tiers (checkasm-style equivalence, SURVEY §4.1)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from x264_tpu.bitstream.bits import BitWriter  # noqa: E402
from x264_tpu.bitstream.slice_writer import SLICE_I, SLICE_P  # noqa: E402
from x264_tpu.bitstream.slice_writer import write_slice_data  # noqa: E402
from x264_tpu.bitstream.slice_writer_vec import write_slice_data_vec  # noqa: E402
from x264_tpu.bitstream.tables import CHROMA_QP_TABLE  # noqa: E402
from x264_tpu.models import intra_frame  # noqa: E402
from x264_tpu.models.syntax import MB_I16, MB_P16, MB_PSKIP, empty_syntax  # noqa: E402
from x264_tpu.ops.device.deblock import deblock_core  # noqa: E402
from x264_tpu.ops.reference.deblock import deblock_frame  # noqa: E402


def _rand_syntax(rng, mbw, mbh, slice_type):
    n = mbw * mbh
    syn = empty_syntax(mbw, mbh)
    if slice_type == SLICE_I:
        syn.mb_class[:] = MB_I16
    else:
        syn.mb_class[:] = rng.choice([MB_I16, MB_P16, MB_PSKIP], n,
                                     p=[.2, .5, .3])
    intra = syn.mb_class == MB_I16
    skip = syn.mb_class == MB_PSKIP
    syn.qp[:] = rng.integers(20, 33, n)
    syn.qp[0] = 26
    syn.i16_mode[:] = rng.integers(0, 4, n) * intra
    syn.chroma_mode[:] = rng.integers(0, 4, n) * intra
    syn.mvd[:] = rng.integers(-64, 65, (n, 2)) * (syn.mb_class == MB_P16)[:, None]

    def sparse(shape, density):
        return (rng.integers(-30, 30, shape)
                * (rng.random(shape) < density)).astype(np.int64)

    syn.luma_dc[:] = sparse((n, 16), .3) * intra[:, None]
    syn.luma_ac[:] = sparse((n, 16, 16), .15)
    syn.luma_ac[intra, :, 0] = 0
    syn.luma_ac[skip] = 0
    syn.luma_nnz[:] = np.count_nonzero(syn.luma_ac, axis=2)
    quad = (np.arange(16) // 4 // 2) * 2 + (np.arange(16) % 4) // 2
    cbp = np.zeros(n, np.int64)
    for q in range(4):
        cbp |= ((syn.luma_nnz[:, quad == q] > 0).any(1).astype(np.int64) << q)
    syn.cbp_luma[:] = np.where(intra, np.where(syn.luma_nnz.any(1), 15, 0), cbp)
    z = intra & (syn.cbp_luma == 0)
    syn.luma_ac[z] = 0
    syn.luma_nnz[z] = 0
    syn.chroma_dc[:] = sparse((n, 2, 4), .3)
    syn.chroma_ac[..., 1:] = sparse((n, 2, 4, 15), .1)
    syn.chroma_dc[skip] = 0
    syn.chroma_ac[skip] = 0
    any_ac = syn.chroma_ac.any((1, 2, 3))
    any_dc = syn.chroma_dc.any((1, 2))
    syn.cbp_chroma[:] = np.where(any_ac, 2, np.where(any_dc, 1, 0))
    syn.chroma_ac[syn.cbp_chroma < 2] = 0
    syn.chroma_dc[syn.cbp_chroma < 1] = 0
    syn.chroma_nnz[:] = np.count_nonzero(syn.chroma_ac, axis=3)
    return syn


class TestVecWriter:
    @pytest.mark.parametrize("st", [SLICE_I, SLICE_P])
    def test_vs_scalar(self, rng, st):
        for (mbw, mbh) in [(6, 4), (12, 9), (3, 3), (1, 2)]:
            syn = _rand_syntax(rng, mbw, mbh, st)
            b1 = BitWriter()
            write_slice_data(b1, syn, st)
            b2 = BitWriter()
            write_slice_data_vec(b2, syn, st)
            assert b1.to_rbsp() == b2.to_rbsp(), (mbw, mbh, st)


class TestDeblockDevice:
    @pytest.mark.parametrize("offs", [(0, 0), (2, -1)])
    def test_vs_reference(self, rng, offs):
        oa, ob = offs
        for (w, h) in [(96, 64), (48, 48)]:
            y = rng.integers(0, 256, (h, w), dtype=np.uint8)
            u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
            v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
            ry, ru, rv, syn = intra_frame.encode_iframe(y, u, v, 30)
            r1 = deblock_frame(ry.copy(), ru.copy(), rv.copy(), syn, oa, ob, 1)
            qpc = CHROMA_QP_TABLE[np.clip(syn.qp + 1, 0, 51)].astype(np.int32)
            r2 = deblock_core(ry, ru, rv, np.ones(syn.n_mbs, bool),
                              syn.luma_nnz.astype(np.int32),
                              syn.mv.astype(np.int32),
                              syn.ref.astype(np.int32),
                              syn.qp.astype(np.int32), qpc,
                              np.int32(oa * 2), np.int32(ob * 2),
                              mbw=syn.mb_width, mbh=syn.mb_height)
            for a, b in zip(r1, r2):
                np.testing.assert_array_equal(a, np.asarray(b))


def test_pallas_kernel_bit_exact(rng):
    """The Mosaic wavefront kernel (interpret mode on CPU) must match the
    XLA scan exactly — P-style and B-style strengths."""
    import jax.numpy as jnp

    from x264_tpu.ops.device.deblock import (bs_grids, bs_grids_b,
                                             _deblock_filter)
    from x264_tpu.ops.device.deblock_pallas import deblock_filter_pallas

    for (mbw, mbh) in [(6, 4), (5, 7)]:
        h, w = mbh * 16, mbw * 16
        n = mbw * mbh
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        nnz = (rng.random((n, 16)) < 0.4).astype(np.int32)
        mv = rng.integers(-32, 33, (n, 2)).astype(np.int32)
        qp = rng.integers(10, 46, n).astype(np.int32)
        qpc = np.clip(qp - 3, 0, 51).astype(np.int32)
        grids = [
            bs_grids(jnp.asarray(rng.random(n) < 0.2), jnp.asarray(nnz),
                     jnp.asarray(mv), jnp.asarray(np.zeros(n, np.int32)),
                     mbw, mbh),
            bs_grids_b(jnp.asarray(nnz), jnp.asarray(mv),
                       jnp.asarray(-mv),
                       jnp.asarray(rng.random(n) < 0.8),
                       jnp.asarray(rng.random(n) < 0.8), mbw, mbh),
        ]
        for bs_v, bs_h in grids:
            a = _deblock_filter(jnp.asarray(y), jnp.asarray(u),
                                jnp.asarray(v), bs_v, bs_h,
                                jnp.asarray(qp), jnp.asarray(qpc),
                                np.int32(2), np.int32(-2),
                                mbw=mbw, mbh=mbh)
            b = deblock_filter_pallas(jnp.asarray(y), jnp.asarray(u),
                                      jnp.asarray(v), bs_v, bs_h,
                                      jnp.asarray(qp), jnp.asarray(qpc),
                                      np.int32(2), np.int32(-2),
                                      mbw=mbw, mbh=mbh, interpret=True)
            for x1, x2 in zip(a, b):
                assert np.array_equal(np.asarray(x1), np.asarray(x2))


def test_deblock_core_impls_agree_small_mbh(rng):
    """Regression: the Mosaic deblock kernel embedded in an outer jit
    produced wrong second-band content at mbh=2 (32-lane skewed
    planes); deblock_core must give impl-independent results at every
    geometry (the mbh<3 XLA fallback)."""
    for (mbw, mbh) in [(3, 2), (8, 2), (2, 2), (3, 3)]:
        h, w = mbh * 16, mbw * 16
        n = mbw * mbh
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        import jax.numpy as jnp
        intra = jnp.ones(n, bool)
        nnz = jnp.asarray(rng.integers(0, 3, (n, 16)).astype(np.int32))
        mv = jnp.zeros((n, 2), jnp.int32)
        ref = jnp.zeros(n, jnp.int32)
        qp = jnp.full(n, 30, jnp.int32)
        outs = [deblock_core(jnp.asarray(y), jnp.asarray(u),
                             jnp.asarray(v), intra, nnz, mv, ref, qp, qp,
                             np.int32(0), np.int32(0), mbw=mbw, mbh=mbh,
                             impl=impl)
                for impl in ("xla", "pallas")]
        for a, b in zip(*outs):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"{mbw}x{mbh}")
