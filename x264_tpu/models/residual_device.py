"""Batched device residual paths (JAX) shared by the I- and P-frame device
models — transform/quant/reconstruct for all MBs at once.

Bit-exact counterparts of models/intra_frame.encode_i16x16_mb /
encode_chroma_mb and models/inter_frame.encode_p_luma_mb (parity anchors:
reference encoder/macroblock.c x264_mb_encode_i16x16 and the inter residual
path of x264_macroblock_encode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from x264_tpu.ops.device import transform as T

# one-hot map raster-4x4-block -> 8x8 quadrant ((y4>=2)*2 + (x4>=2))
_QUAD_1HOT = jnp.asarray(np.eye(4, dtype=np.int32)[
    (np.arange(16) // 4 // 2) * 2 + (np.arange(16) % 4) // 2])  # (16,4)

# JVT-B118 decimation run tables (reference common/tables.c
# x264_decimate_table4/8): the per-run score of an isolated |level|==1
_DS4 = jnp.asarray(np.array(
    [3, 2, 2, 1, 1, 1] + [0] * 10, np.int32))
_DS8 = jnp.asarray(np.array(
    [3, 3, 3, 3] + [2] * 8 + [1] * 12 + [0] * 40, np.int32))


def decimate_score(zz, nc: int):
    """Batched JVT-B118 decimation score (reference common/quant.c:326
    decimate_score_internal): zz (..., nc) zigzag levels -> (...,) int32.
    Any |level| > 1 scores 9 (keep); each |level|==1 adds table[run]
    where run = zero gap below it in scan order.  Low score = the block
    is cheap noise worth zeroing."""
    tbl = _DS8 if nc == 64 else _DS4
    a = jnp.abs(zz.astype(jnp.int32))
    nz = a > 0
    big = (a > 1).any(axis=-1)
    j = jnp.arange(zz.shape[-1], dtype=jnp.int32)
    idxs = jnp.where(nz, j, -1)
    # previous nonzero index below each position (exclusive cummax)
    prev = jax.lax.associative_scan(jnp.maximum, idxs, axis=-1)
    prev = jnp.concatenate(
        [jnp.full(prev.shape[:-1] + (1,), -1, jnp.int32), prev[..., :-1]],
        axis=-1)
    run = jnp.clip(j - prev - 1, 0, tbl.shape[0] - 1)
    sc = jnp.where(nz, tbl[run], 0).sum(axis=-1)
    return jnp.where(big, 9, sc)


def _qp_mb(qp, extra_dims: int):
    """Normalize qp (scalar or per-MB (N,)) for per-block broadcast with
    `extra_dims` block axes between the MB axis and the (4,4) tail."""
    qp = jnp.asarray(qp, jnp.int32)
    if qp.ndim == 0:
        return qp
    return qp.reshape(qp.shape[0], *([1] * extra_dims))


def encode_i16_luma(src, pred, qp, trellis=None):
    """src/pred (N,16,16); qp scalar or per-MB (N,) ->
    (recon, dc_zz (N,16), ac_zz (N,16,16), nnz (N,16), cbp_luma (N,)).
    trellis: None (deadzone) or (tbl_cat1, lam2f) for RD-optimal AC
    levels (the DC hadamard path stays deadzone)."""
    n = src.shape[0]
    res = src.astype(jnp.int32) - pred.astype(jnp.int32)
    blocks = T.mb_luma_to_blocks(res)                  # (N,16,4,4)
    coefs = T.dct4x4(blocks)
    qp1 = _qp_mb(qp, 1)
    qp0 = _qp_mb(qp, 0)

    dc = coefs[:, :, 0, 0].reshape(-1, 4, 4)
    fdc = T.hadamard4x4_fwd(dc)
    dc_lv = T.quant_dc4(fdc, qp0, intra=True)
    dc_zz = T.zigzag(dc_lv)
    fi = T.hadamard4x4_inv(dc_lv)
    dc_deq = T.dequant_dc4(fi, qp0).reshape(-1, 16)

    if trellis is not None:
        from x264_tpu.ops.device.trellis import dq1_4x4, trellis_quant
        tbl1, lam2f = trellis
        qpb = jnp.broadcast_to(
            jnp.asarray(qp, jnp.int32).reshape(-1)[:, None],
            (n, 16)).reshape(-1)
        czz = T.zigzag(coefs).reshape(n * 16, 16)
        lz = trellis_quant(czz[:, 1:], dq1_4x4(qpb)[:, 1:], lam2f,
                           tbl1, 15)
        zz = jnp.concatenate(
            [jnp.zeros((n * 16, 1), jnp.int32), lz], axis=1)
        ac_lv = T.unzigzag(zz.reshape(n, 16, 16))
    else:
        ac_lv = T.quant4x4(coefs, qp1, intra=True)
        ac_lv = ac_lv.at[:, :, 0, 0].set(0)
    nnz = jnp.count_nonzero(ac_lv.reshape(-1, 16, 16), axis=2).astype(jnp.int32)
    cbp_luma = jnp.where(nnz.any(axis=1), 15, 0).astype(jnp.int32)
    ac_zz = T.zigzag(ac_lv)

    deq = T.dequant4x4(ac_lv, qp1)
    deq = deq.at[:, :, 0, 0].set(dc_deq)
    res_rec = T.idct4x4(deq)
    recon = jnp.clip(pred.astype(jnp.int32) + T.blocks_to_mb_luma(res_rec),
                     0, 255)
    return recon, dc_zz, ac_zz, nnz, cbp_luma


def encode_p_luma(src, pred, qp, trellis=None, decimate: bool = True):
    """Inter luma residual: (N,16,16) -> (recon, ac_zz, nnz, cbp_luma) with
    per-8x8-quadrant cbp bits.  trellis: None (deadzone quant) or
    (tbl4, lam2f) for RD-optimal levels (ops/device/trellis.py).
    decimate: JVT-B118 coefficient decimation (reference
    encoder/macroblock.c:900-918): per 8x8 quadrant, zero it when its
    score < 4; zero the whole MB when the total score < 6 — quant noise
    becomes skippable MBs instead of coded dust."""
    n = src.shape[0]
    res = src.astype(jnp.int32) - pred.astype(jnp.int32)
    blocks = T.mb_luma_to_blocks(res)
    coefs = T.dct4x4(blocks)
    qp1 = _qp_mb(qp, 1)
    if trellis is not None:
        from x264_tpu.ops.device.trellis import dq1_4x4, trellis_quant
        tbl4, lam2f = trellis
        qpv = jnp.broadcast_to(jnp.asarray(qp, jnp.int32).reshape(-1),
                               (n,))
        qpb = jnp.broadcast_to(qpv[:, None], (n, 16)).reshape(-1)
        czz = T.zigzag(coefs).reshape(n * 16, 16)
        lzz = trellis_quant(czz, dq1_4x4(qpb), lam2f, tbl4, 16)
        lv = T.unzigzag(lzz.reshape(n, 16, 16))
    else:
        lv = T.quant4x4(coefs, qp1, intra=False)
    if decimate:
        sc = decimate_score(T.zigzag(lv), 16)             # (N,16)
        sc8 = sc @ _QUAD_1HOT                             # (N,4) quadrant
        keep8 = (sc8 >= 4) & (sc8.sum(axis=1, keepdims=True) >= 6)
        keep = (keep8[:, (jnp.arange(16) // 4 // 2) * 2
                      + (jnp.arange(16) % 4) // 2])       # (N,16)
        lv = lv * keep[:, :, None, None].astype(lv.dtype)
    nnz = jnp.count_nonzero(lv.reshape(-1, 16, 16), axis=2).astype(jnp.int32)
    quad_counts = (nnz > 0).astype(jnp.int32) @ _QUAD_1HOT        # (N,4)
    cbp = ((quad_counts > 0).astype(jnp.int32)
           * (1 << jnp.arange(4, dtype=jnp.int32))[None, :]).sum(1)
    ac_zz = T.zigzag(lv)
    deq = T.dequant4x4(lv, qp1)
    res_rec = T.idct4x4(deq)
    recon = jnp.clip(pred.astype(jnp.int32) + T.blocks_to_mb_luma(res_rec),
                     0, 255)
    return recon, ac_zz, nnz, cbp


# raster 4x4 index -> coded (zigzag-of-quadrant) index; inverse of the
# _C2R permutation in ops/device/cavlc.py
_R2C = jnp.asarray(np.argsort(np.array(
    [0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15])).astype(np.int32))


def encode_p_luma_t8(src, pred, qp, trellis=None, decimate: bool = True):
    """Inter luma residual with the High-profile 8x8 transform
    (transform_size_8x8_flag=1; parity anchor: reference common/dct.c
    sub8x8_dct8 + encoder/macroblock.c's 8x8 branch).

    Returns (recon (N,16,16), ac_zz (N,16,16), nnz (N,16), nnz_deblock
    (N,16), cbp_luma (N,)).  ac_zz/nnz use the CAVLC interleave (8.5.6 run
    inverse): coded 4x4 block i4 of quadrant q8 holds zigzag-64 positions
    4*k+i4, laid out raster-block-major like the 4x4 path so the CAVLC
    slot machinery is unchanged.  nnz_deblock replicates each 8x8 block's
    coded state to its 4 cells (8.7's bS nonzero check is per containing
    transform block)."""
    n = src.shape[0]
    res = src.astype(jnp.int32) - pred.astype(jnp.int32)
    blocks8 = T.mb_luma_to_blocks8(res)                # (N,4,8,8)
    coefs = T.dct8x8(blocks8)
    qp1 = _qp_mb(qp, 1)
    if trellis is not None:
        from x264_tpu.ops.device.trellis import dq1_8x8, trellis_quant
        tbl8, lam2f = trellis
        qpv = jnp.broadcast_to(jnp.asarray(qp, jnp.int32).reshape(-1),
                               (n,))
        qpb = jnp.broadcast_to(qpv[:, None], (n, 4)).reshape(-1)
        czz = T.zigzag8(coefs).reshape(n * 4, 64)
        lzz = trellis_quant(czz, dq1_8x8(qpb), lam2f, tbl8, 64)
        lv64 = lzz.reshape(n, 4, 64)
        lv8 = T.unzigzag8(lv64)
    else:
        lv8 = T.quant8x8(coefs, qp1, intra=False)      # (N,4,8,8)
        lv64 = T.zigzag8(lv8)                          # (N,4,64)

    # JVT-B118 decimation on the 8x8 quadrants (reference
    # encoder/macroblock.c:821-836).  x264 skips it when trellis+CABAC
    # ("8x8 trellis is inherently optimal decimation", :804) — trellis
    # here implies the CABAC cost model, so mirror that.
    if decimate and trellis is None:
        sc8 = decimate_score(lv64, 64)                 # (N,4)
        keep8 = (sc8 >= 4) & (sc8.sum(axis=1, keepdims=True) >= 6)
        lv64 = lv64 * keep8[:, :, None].astype(lv64.dtype)
        lv8 = lv8 * keep8[:, :, None, None].astype(lv8.dtype)

    # CAVLC interleave: (N,4,64) -> (N, q8, k, i4) -> coded (N,16,16)
    inter = lv64.reshape(n, 4, 16, 4).transpose(0, 1, 3, 2)   # (N,q8,i4,16)
    ac_zz = inter.reshape(n, 16, 16)[:, _R2C, :]       # raster-block-major
    nnz = jnp.count_nonzero(ac_zz, axis=2).astype(jnp.int32)

    nz8 = jnp.count_nonzero(lv64, axis=2).astype(jnp.int32)   # (N,4)
    cbp = ((nz8 > 0).astype(jnp.int32)
           * (1 << jnp.arange(4, dtype=jnp.int32))[None, :]).sum(1)
    # quadrant of each raster 4x4 cell -> replicate the 8x8 count to all 4
    quad_of_raster = (jnp.arange(16) // 4 // 2) * 2 + (jnp.arange(16) % 4) // 2
    nnz_deblock = nz8[:, quad_of_raster]

    deq = T.dequant8x8(lv8, qp1)
    res_rec = T.idct8x8(deq)
    recon = jnp.clip(pred.astype(jnp.int32) + T.blocks8_to_mb_luma(res_rec),
                     0, 255)
    return recon, ac_zz, nnz, nnz_deblock, cbp


def _chroma_blocks(res):
    """(N,8,8) -> (N,4,4,4) raster 4x4 blocks."""
    n = res.shape[0]
    return res.reshape(n, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(n, 4, 4, 4)


def _chroma_plane(blocks):
    n = blocks.shape[0]
    return blocks.reshape(n, 2, 2, 4, 4).transpose(0, 1, 3, 2, 4).reshape(n, 8, 8)


def encode_chroma(src_u, src_v, pred_u, pred_v, qp_c, intra: bool,
                  decimate: bool = True, trellis=None):
    """(N,8,8) x4 -> (recon_u, recon_v, dc (N,2,4), ac (N,2,4,16),
    nnz (N,2,4), cbp_chroma (N,)).  Joint U+V cbp per MB (normative).
    trellis: None or (tbl_cat4, lam2f) for RD-optimal AC levels (DC
    hadamard path stays deadzone)."""
    n = src_u.shape[0]
    srcs = jnp.stack([src_u, src_v], axis=1).astype(jnp.int32)    # (N,2,8,8)
    preds = jnp.stack([pred_u, pred_v], axis=1).astype(jnp.int32)
    res = srcs - preds
    blocks = _chroma_blocks(res.reshape(n * 2, 8, 8)).reshape(n, 2, 4, 4, 4)
    coefs = T.dct4x4(blocks)
    qp2 = _qp_mb(qp_c, 2)
    qp1 = _qp_mb(qp_c, 1)

    dc = coefs[:, :, :, 0, 0].reshape(n, 2, 2, 2)
    fdc = T.hadamard2x2(dc)
    dc_lv = T.quant_dc2(fdc, qp1, intra)
    dcs = dc_lv.reshape(n, 2, 4)

    if trellis is not None:
        from x264_tpu.ops.device.trellis import dq1_4x4, trellis_quant
        tblc, lam2f = trellis
        qpb = jnp.broadcast_to(
            jnp.asarray(qp_c, jnp.int32).reshape(-1)[:, None],
            (n, 8)).reshape(-1)
        czz = T.zigzag(coefs).reshape(n * 8, 16)
        lz = trellis_quant(czz[:, 1:], dq1_4x4(qpb)[:, 1:], lam2f,
                           tblc, 15)
        zz = jnp.concatenate(
            [jnp.zeros((n * 8, 1), jnp.int32), lz], axis=1)
        ac_lv = T.unzigzag(zz.reshape(n, 2, 4, 16))
    else:
        ac_lv = T.quant4x4(coefs, qp2, intra)
        ac_lv = ac_lv.at[:, :, :, 0, 0].set(0)
    acs = T.zigzag(ac_lv)                                          # (N,2,4,16)
    if not intra and decimate:
        # chroma AC decimation (reference encoder/macroblock.c:347-431):
        # total decimate_score15 of the 8 AC blocks < 7 -> zero all
        # chroma AC for the MB (DC survives)
        sc = decimate_score(acs[..., 1:], 16).sum(axis=(1, 2))    # (N,)
        keep = (sc >= 7)[:, None, None, None]
        acs = acs * keep.astype(acs.dtype)
        ac_lv = ac_lv * keep[..., None].astype(ac_lv.dtype)
    nnz = jnp.count_nonzero(acs, axis=3).astype(jnp.int32)

    any_ac = (acs != 0).any(axis=(1, 2, 3))
    any_dc = (dcs != 0).any(axis=(1, 2))
    cbp_chroma = jnp.where(any_ac, 2, jnp.where(any_dc, 1, 0)).astype(jnp.int32)

    fi = T.hadamard2x2(dc_lv)
    dc_deq = T.dequant_dc2(fi, qp1).reshape(n, 2, 4)
    deq = T.dequant4x4(ac_lv, qp2)
    deq = deq.at[:, :, :, 0, 0].set(dc_deq)
    res_rec = T.idct4x4(deq)
    planes = _chroma_plane(res_rec.reshape(n * 2, 4, 4, 4)).reshape(n, 2, 8, 8)
    recons = jnp.clip(preds + planes, 0, 255)
    return (recons[:, 0], recons[:, 1], dcs, acs, nnz, cbp_chroma)
