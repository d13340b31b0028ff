"""Device (JAX) integer transforms + quantization — bit-exact counterparts of
ops/reference/{transform,quant}.py (parity anchors: reference common/dct.c,
common/quant.c), batched over leading dims, int32 throughout (TPU-native;
value-range analysis in comments shows int32 suffices at every step).

QP enters as a *traced* scalar: quant tables are gathered by qp%6 and shift
amounts are computed on device, so a single compiled program covers qp 0..51.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from x264_tpu.bitstream.tables import (DEQUANT4, DEQUANT8, QUANT4_MF,
                                       QUANT8_MF, ZIGZAG_4x4, ZIGZAG_8x8)

_CF = jnp.array([[1, 1, 1, 1],
                 [2, 1, -1, -2],
                 [1, -1, -1, 1],
                 [1, -2, 2, -1]], dtype=jnp.int32)
_H4 = jnp.array([[1, 1, 1, 1],
                 [1, 1, -1, -1],
                 [1, -1, -1, 1],
                 [1, -1, 1, -1]], dtype=jnp.int32)
_H2 = jnp.array([[1, 1], [1, -1]], dtype=jnp.int32)

_QUANT4_MF = jnp.asarray(QUANT4_MF.astype(np.int32))    # (6,4,4)
_DEQUANT4 = jnp.asarray(DEQUANT4.astype(np.int32))      # (6,4,4)
_ZZ = jnp.asarray(ZIGZAG_4x4.astype(np.int32))          # (16,)
_UNZZ = jnp.asarray(np.argsort(ZIGZAG_4x4).astype(np.int32))


def _mat2(m, x):
    """m @ x @ m.T batched over leading dims, integer exact."""
    return jnp.einsum("ij,...jk,lk->...il", m, x, m,
                      preferred_element_type=jnp.int32)


def dct4x4(residual):
    """Forward 4x4 core transform Cf.X.Cf^T.  |res|<=255 -> |coef|<=9180."""
    return _mat2(_CF, residual.astype(jnp.int32))


def idct4x4(d):
    """Normative inverse transform (8.5.12.2) incl. final (x+32)>>6."""
    d = d.astype(jnp.int32)
    e0 = d[..., :, 0] + d[..., :, 2]
    e1 = d[..., :, 0] - d[..., :, 2]
    e2 = (d[..., :, 1] >> 1) - d[..., :, 3]
    e3 = d[..., :, 1] + (d[..., :, 3] >> 1)
    f = jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    g0 = f[..., 0, :] + f[..., 2, :]
    g1 = f[..., 0, :] - f[..., 2, :]
    g2 = (f[..., 1, :] >> 1) - f[..., 3, :]
    g3 = f[..., 1, :] + (f[..., 3, :] >> 1)
    h = jnp.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=-2)
    return (h + 32) >> 6


def _dct8_1d(s, axis):
    """Standard High-profile forward 8-point transform along `axis`
    (bit-exact twin of ops/reference/transform._dct8_1d)."""
    s = jnp.moveaxis(s.astype(jnp.int32), axis, -1)
    d = [s[..., k] for k in range(8)]
    s07, s16, s25, s34 = d[0] + d[7], d[1] + d[6], d[2] + d[5], d[3] + d[4]
    a0, a1 = s07 + s34, s16 + s25
    a2, a3 = s07 - s34, s16 - s25
    d07, d16, d25, d34 = d[0] - d[7], d[1] - d[6], d[2] - d[5], d[3] - d[4]
    a4 = d16 + d25 + (d07 + (d07 >> 1))
    a5 = d07 - d34 - (d25 + (d25 >> 1))
    a6 = d07 + d34 - (d16 + (d16 >> 1))
    a7 = d16 - d25 + (d34 + (d34 >> 1))
    out = jnp.stack([
        a0 + a1, a4 + (a7 >> 2), a2 + (a3 >> 1), a5 + (a6 >> 2),
        a0 - a1, a6 - (a5 >> 2), (a2 >> 1) - a3, (a4 >> 2) - a7], axis=-1)
    return jnp.moveaxis(out, -1, axis)


def _idct8_1d(s, axis):
    """Normative inverse 8-point transform (8.5.12.3) along `axis`."""
    s = jnp.moveaxis(s.astype(jnp.int32), axis, -1)
    d = [s[..., k] for k in range(8)]
    e0 = d[0] + d[4]
    e2 = d[0] - d[4]
    e4 = (d[2] >> 1) - d[6]
    e6 = d[2] + (d[6] >> 1)
    e1 = -d[3] + d[5] - d[7] - (d[7] >> 1)
    e3 = d[1] + d[7] - d[3] - (d[3] >> 1)
    e5 = -d[1] + d[7] + d[5] + (d[5] >> 1)
    e7 = d[3] + d[5] + d[1] + (d[1] >> 1)
    f0, f2, f4, f6 = e0 + e6, e2 + e4, e2 - e4, e0 - e6
    f1 = e1 + (e7 >> 2)
    f3 = e3 + (e5 >> 2)
    f5 = (e3 >> 2) - e5
    f7 = e7 - (e1 >> 2)
    out = jnp.stack([f0 + f7, f2 + f5, f4 + f3, f6 + f1,
                     f6 - f1, f4 - f3, f2 - f5, f0 - f7], axis=-1)
    return jnp.moveaxis(out, -1, axis)


def dct8x8(residual):
    """Forward 8x8 transform on (..., 8, 8): vertical then horizontal
    (x264/JM ordering).  |res|<=255 -> |coef| <= 64*255 = 16320."""
    return _dct8_1d(_dct8_1d(residual, -2), -1)


def idct8x8(d):
    """Normative inverse 8x8 (8.5.12.3): horizontal, vertical, (+32)>>6."""
    return (_idct8_1d(_idct8_1d(d, -1), -2) + 32) >> 6


def hadamard4x4_fwd(dc):
    y = _mat2(_H4, dc.astype(jnp.int32))
    return (y + 1) >> 1


def hadamard4x4_inv(c):
    return _mat2(_H4, c.astype(jnp.int32))


def hadamard2x2(dc):
    return _mat2(_H2, dc.astype(jnp.int32))


# -- quant (traced qp; scalar or per-block array broadcast against the
#    blocks' leading dims — per-MB adaptive quantization feeds (N,1)-shaped
#    qp for (N,16,4,4) blocks etc.) ---------------------------------------

def _bcast(x, qp):
    """Align a per-block scalar derived from qp against (..., 4, 4) data."""
    return jnp.asarray(x)[..., None, None]


def _qparams(qp, intra: bool):
    qbits = 15 + qp // 6
    f = jnp.where(jnp.bool_(intra), (1 << qbits) // 3, (1 << qbits) // 6)
    return qbits, f


def quant4x4(coefs, qp, intra: bool):
    """Deadzone quant; max |coef|*mf = 9180*13107 < 2^31."""
    qp = jnp.asarray(qp, jnp.int32)
    qbits, f = _qparams(qp, intra)
    mf = _QUANT4_MF[qp % 6]
    c = coefs.astype(jnp.int32)
    level = (jnp.abs(c) * mf + _bcast(f, qp)) >> _bcast(qbits, qp)
    return jnp.where(c < 0, -level, level)


def dequant4x4(levels, qp):
    qp = jnp.asarray(qp, jnp.int32)
    v = _DEQUANT4[qp % 6]
    return (levels.astype(jnp.int32) * v) << _bcast(qp // 6, qp)


_QUANT8_MF = jnp.asarray(QUANT8_MF.astype(np.int32))    # (6,8,8)
_DEQUANT8 = jnp.asarray(DEQUANT8.astype(np.int32))      # (6,8,8)
_ZZ8 = jnp.asarray(ZIGZAG_8x8.astype(np.int32))         # (64,)


def quant8x8(coefs, qp, intra: bool):
    """Deadzone 8x8 quant (qbits = 16 + qp/6); max |coef|*mf =
    16320*20972 < 2^31."""
    qp = jnp.asarray(qp, jnp.int32)
    qbits = 16 + qp // 6
    f = jnp.where(jnp.bool_(intra), (1 << qbits) // 3, (1 << qbits) // 6)
    mf = _QUANT8_MF[qp % 6]
    c = coefs.astype(jnp.int32)
    level = (jnp.abs(c) * mf + _bcast(f, qp)) >> _bcast(qbits, qp)
    return jnp.where(c < 0, -level, level)


def dequant8x8(levels, qp):
    """Normative 8x8 dequant (8.5.13.1), both shift regimes selected
    elementwise (LevelScale8x8 = 16 * normAdjust, flat weightScale)."""
    qp = jnp.asarray(qp, jnp.int32)
    ls16 = _DEQUANT8[qp % 6] * 16
    lv = levels.astype(jnp.int32)
    q6 = _bcast(qp // 6, qp)
    hi = (lv * ls16) << jnp.maximum(q6 - 6, 0)
    lo = (lv * ls16 + (1 << jnp.maximum(5 - q6, 0))) >> jnp.maximum(6 - q6, 0)
    return jnp.where(q6 >= 6, hi, lo)


def zigzag8(blocks8):
    """(..., 8, 8) -> (..., 64) in 8x8 zigzag order."""
    return blocks8.reshape(*blocks8.shape[:-2], 64)[..., _ZZ8]


_UNZZ8 = jnp.asarray(np.argsort(ZIGZAG_8x8).astype(np.int32))


def unzigzag8(scan):
    return scan[..., _UNZZ8].reshape(*scan.shape[:-1], 8, 8)


def mb_luma_to_blocks8(mb):
    """(..., 16, 16) -> (..., 4, 8, 8) raster 8x8 quadrants."""
    sh = mb.shape[:-2]
    nd = len(sh)
    return (mb.reshape(*sh, 2, 8, 2, 8)
              .transpose(*range(nd), nd, nd + 2, nd + 1, nd + 3)
              .reshape(*sh, 4, 8, 8))


def blocks8_to_mb_luma(blocks):
    sh = blocks.shape[:-3]
    nd = len(sh)
    return (blocks.reshape(*sh, 2, 2, 8, 8)
                  .transpose(*range(nd), nd, nd + 2, nd + 1, nd + 3)
                  .reshape(*sh, 16, 16))


def quant_dc4(coefs, qp, intra: bool = True):
    """Luma DC quant (pairs with hadamard4x4_fwd's >>1): qbits+1, deadzone 2f.
    |fdc| <= (255*16*16)>>1 = 32640; 32640*13107 < 2^31."""
    qp = jnp.asarray(qp, jnp.int32)
    qbits, f = _qparams(qp, intra)
    mf = _QUANT4_MF[qp % 6, 0, 0]
    c = coefs.astype(jnp.int32)
    level = (jnp.abs(c) * _bcast(mf, qp) + 2 * _bcast(f, qp)) \
        >> _bcast(qbits + 1, qp)
    return jnp.where(c < 0, -level, level)


def dequant_dc4(f_had, qp):
    """Normative luma-DC scaling (8.5.10); both qp-regime branches computed
    with clamped shifts and selected elementwise."""
    qp = jnp.asarray(qp, jnp.int32)
    ls16 = _bcast(_DEQUANT4[qp % 6, 0, 0] * 16, qp)
    f_had = f_had.astype(jnp.int32)
    q6 = _bcast(qp // 6, qp)
    hi = (f_had * ls16) << jnp.maximum(q6 - 6, 0)
    lo = (f_had * ls16 + (1 << jnp.maximum(5 - q6, 0))) >> jnp.maximum(6 - q6, 0)
    return jnp.where(_bcast(qp, qp) >= 36, hi, lo)


def quant_dc2(coefs, qp, intra: bool):
    qp = jnp.asarray(qp, jnp.int32)
    qbits, f = _qparams(qp, intra)
    mf = _QUANT4_MF[qp % 6, 0, 0]
    c = coefs.astype(jnp.int32)
    level = (jnp.abs(c) * _bcast(mf, qp) + 2 * _bcast(f, qp)) \
        >> _bcast(qbits + 1, qp)
    return jnp.where(c < 0, -level, level)


def dequant_dc2(f_had, qp):
    qp = jnp.asarray(qp, jnp.int32)
    ls16 = _bcast(_DEQUANT4[qp % 6, 0, 0] * 16, qp)
    return ((f_had.astype(jnp.int32) * ls16) << _bcast(qp // 6, qp)) >> 5


# -- layout helpers -----------------------------------------------------------

def zigzag(blocks4):
    """(..., 4, 4) -> (..., 16) in zigzag order."""
    return blocks4.reshape(*blocks4.shape[:-2], 16)[..., _ZZ]


def unzigzag(scan):
    return scan[..., _UNZZ].reshape(*scan.shape[:-1], 4, 4)


def mb_luma_to_blocks(mb):
    """(..., 16, 16) -> (..., 16, 4, 4) raster 4x4 blocks."""
    sh = mb.shape[:-2]
    nd = len(sh)
    return (mb.reshape(*sh, 4, 4, 4, 4)
              .transpose(*range(nd), nd, nd + 2, nd + 1, nd + 3)
              .reshape(*sh, 16, 4, 4))


def blocks_to_mb_luma(blocks):
    sh = blocks.shape[:-3]
    nd = len(sh)
    return (blocks.reshape(*sh, 4, 4, 4, 4)
                  .transpose(*range(nd), nd, nd + 2, nd + 1, nd + 3)
                  .reshape(*sh, 16, 16))


def plane_to_mbs(plane, mbh: int, mbw: int, s: int = 16):
    """(H, W) -> (mbh*mbw, s, s) raster MB order."""
    return (plane.reshape(mbh, s, mbw, s).transpose(0, 2, 1, 3)
                 .reshape(mbh * mbw, s, s))


def mbs_to_plane(mbs, mbh: int, mbw: int, s: int = 16):
    return (mbs.reshape(mbh, mbw, s, s).transpose(0, 2, 1, 3)
               .reshape(mbh * s, mbw * s))
