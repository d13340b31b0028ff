"""I-frame encoding: mode decision, transform/quant, reconstruction.

This module is the bit-exact NumPy pipeline (the "C reference" tier).  The
mode decision/transform math is written in batched style so the JAX
wavefront version (models/intra_jax.py) mirrors it 1:1; here the MB scan is
serial because intra prediction consumes reconstructed neighbors (the
wavefront batching is the TPU optimization, same dataflow).

Capability parity: encoder/analyse.c mb_analyse_intra (I16x16 + chroma +
I4x4), encoder/macroblock.c x264_mb_encode_i16x16 / i4x4.
"""

from __future__ import annotations

import numpy as np

from x264_tpu.bitstream.tables import ZIGZAG_4x4, chroma_qp
from x264_tpu.models.syntax import MB_I4, MB_I16, FrameSyntax, empty_syntax
from x264_tpu.ops.reference import pixel, predict, quant, transform

ZZ = ZIGZAG_4x4


def zigzag(blocks4: np.ndarray) -> np.ndarray:
    """(..., 4, 4) -> (..., 16) zigzag order."""
    return blocks4.reshape(*blocks4.shape[:-2], 16)[..., ZZ]


def unzigzag(scan: np.ndarray) -> np.ndarray:
    out = np.zeros_like(scan)
    out[..., ZZ] = scan
    return out.reshape(*scan.shape[:-1], 4, 4)


def encode_i16x16_mb(src: np.ndarray, pred: np.ndarray, qp: int):
    """Given chosen 16x16 prediction, run the I16x16 residual path.
    Returns (recon, dc_zz(16,), ac_zz(16,16) raster-block order,
    nnz(16,), cbp_luma)."""
    res = src.astype(np.int64) - pred.astype(np.int64)
    blocks = transform.mb_luma_to_blocks(res)          # (16,4,4) raster
    coefs = transform.dct4x4(blocks)

    # DC path
    dc = coefs[:, 0, 0].reshape(4, 4)
    fdc = transform.hadamard4x4_fwd(dc)
    dc_lv = quant.quant_dc4(fdc, qp, intra=True)
    dc_zz = zigzag(dc_lv)
    fi = transform.hadamard4x4_inv(dc_lv)
    dc_deq = quant.dequant_dc4(fi, qp).reshape(16)

    # AC path
    ac_lv = quant.quant4x4(coefs, qp, intra=True)
    ac_lv[:, 0, 0] = 0
    nnz = np.count_nonzero(ac_lv.reshape(16, 16), axis=1).astype(np.int32)
    cbp_luma = 15 if nnz.any() else 0
    if cbp_luma == 0:
        ac_lv[:] = 0
        nnz[:] = 0
    ac_zz = zigzag(ac_lv)

    # reconstruct
    deq = quant.dequant4x4(ac_lv, qp)
    deq[:, 0, 0] = dc_deq
    res_rec = transform.idct4x4(deq)
    recon = np.clip(pred.astype(np.int64) + transform.blocks_to_mb_luma(res_rec),
                    0, 255).astype(np.uint8)
    return recon, dc_zz.astype(np.int32), ac_zz.astype(np.int32), nnz, cbp_luma


def encode_chroma_mb(srcs, preds, qp_c: int, intra: bool):
    """srcs/preds: [(8,8) u, (8,8) v].  Returns (recons, dc(2,4), ac(2,4,16),
    nnz(2,4), cbp_chroma)."""
    dcs = np.zeros((2, 4), np.int64)
    acs = np.zeros((2, 4, 16), np.int64)
    deqs = []
    for pl in range(2):
        res = srcs[pl].astype(np.int64) - preds[pl].astype(np.int64)
        blocks = (res.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3).reshape(4, 4, 4))
        coefs = transform.dct4x4(blocks)
        dc = coefs[:, 0, 0].reshape(2, 2)
        fdc = transform.hadamard2x2(dc)
        dc_lv = quant.quant_dc2(fdc, qp_c, intra)
        dcs[pl] = dc_lv.reshape(4)           # raster scan of 2x2
        ac_lv = quant.quant4x4(coefs, qp_c, intra)
        ac_lv[:, 0, 0] = 0
        acs[pl] = zigzag(ac_lv)
        deqs.append((coefs, dc_lv, ac_lv))

    any_ac = acs.any()
    any_dc = dcs.any()
    cbp_chroma = 2 if any_ac else (1 if any_dc else 0)

    recons = []
    nnz = np.zeros((2, 4), np.int32)
    for pl in range(2):
        coefs, dc_lv, ac_lv = deqs[pl]
        if cbp_chroma < 2:
            ac_lv = np.zeros_like(ac_lv)
            acs[pl] = 0
        if cbp_chroma == 0:
            dc_lv = np.zeros_like(dc_lv)
            dcs[pl] = 0
        nnz[pl] = np.count_nonzero(acs[pl], axis=1)
        fi = transform.hadamard2x2(dc_lv)
        dc_deq = quant.dequant_dc2(fi, qp_c).reshape(4)
        deq = quant.dequant4x4(ac_lv, qp_c)
        deq[:, 0, 0] = dc_deq
        res_rec = transform.idct4x4(deq)
        plane = (res_rec.reshape(2, 2, 4, 4).transpose(0, 2, 1, 3).reshape(8, 8))
        recons.append(np.clip(preds[pl].astype(np.int64) + plane, 0, 255).astype(np.uint8))
    return recons, dcs.astype(np.int32), acs.astype(np.int32), nnz, cbp_chroma


def encode_iframe(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                  qp, chroma_qp_offset: int = 0):
    """Encode one I frame (planes already padded to MB multiples).
    qp: scalar or per-MB (N,) array.  Returns
    (recon_y, recon_u, recon_v, FrameSyntax)."""
    h, w = y.shape
    mbw, mbh = w // 16, h // 16
    syn = empty_syntax(mbw, mbh)
    qp_mb = np.broadcast_to(np.atleast_1d(qp).astype(np.int64),
                            (mbw * mbh,))
    syn.qp[:] = qp_mb
    syn.mb_cost = np.zeros(mbw * mbh, np.int64)

    ry = np.zeros_like(y)
    ru = np.zeros_like(u)
    rv = np.zeros_like(v)

    for mb in range(mbw * mbh):
        mby, mbx = divmod(mb, mbw)
        y0, x0 = mby * 16, mbx * 16
        at = np.array([mby > 0])
        al = np.array([mbx > 0])

        # --- luma I16x16 ---
        top = ry[y0 - 1, x0:x0 + 16][None] if mby > 0 else np.zeros((1, 16), np.uint8)
        left = ry[y0:y0 + 16, x0 - 1][None] if mbx > 0 else np.zeros((1, 16), np.uint8)
        tl = (ry[y0 - 1, x0 - 1][None] if (mby > 0 and mbx > 0)
              else np.zeros((1,), np.uint8))
        preds = predict.predict_16x16_all(top, left, tl, at, al)[0]
        avail = predict.i16x16_mode_avail(at, al, at & al)[0]
        src = y[y0:y0 + 16, x0:x0 + 16]
        costs = pixel.satd(np.broadcast_to(src, (4, 16, 16)), preds)
        costs = np.where(avail, costs, 1 << 30)
        mode = int(np.argmin(costs))
        qp_i = int(qp_mb[mb])
        qpc = chroma_qp(qp_i, chroma_qp_offset)
        syn.mb_cost[mb] = int(costs[mode])

        recon, dc_zz, ac_zz, nnz, cbp_l = encode_i16x16_mb(src, preds[mode], qp_i)
        ry[y0:y0 + 16, x0:x0 + 16] = recon

        # --- chroma ---
        cy0, cx0 = mby * 8, mbx * 8
        ctop = [pl[cy0 - 1, cx0:cx0 + 8][None] if mby > 0 else np.zeros((1, 8), np.uint8)
                for pl in (ru, rv)]
        cleft = [pl[cy0:cy0 + 8, cx0 - 1][None] if mbx > 0 else np.zeros((1, 8), np.uint8)
                 for pl in (ru, rv)]
        ctl = [pl[cy0 - 1, cx0 - 1][None] if (mby > 0 and mbx > 0) else np.zeros((1,), np.uint8)
               for pl in (ru, rv)]
        cpreds = [predict.predict_chroma_all(ctop[i], cleft[i], ctl[i], at, al)[0]
                  for i in range(2)]
        cavail = predict.chroma_mode_avail(at, al, at & al)[0]
        csrc = [u[cy0:cy0 + 8, cx0:cx0 + 8], v[cy0:cy0 + 8, cx0:cx0 + 8]]
        ccosts = (pixel.satd(np.broadcast_to(csrc[0], (4, 8, 8)), cpreds[0])
                  + pixel.satd(np.broadcast_to(csrc[1], (4, 8, 8)), cpreds[1]))
        ccosts = np.where(cavail, ccosts, 1 << 30)
        cmode = int(np.argmin(ccosts))

        crecons, cdc, cac, cnnz, cbp_c = encode_chroma_mb(
            csrc, [cpreds[0][cmode], cpreds[1][cmode]], qpc, intra=True)
        ru[cy0:cy0 + 8, cx0:cx0 + 8] = crecons[0]
        rv[cy0:cy0 + 8, cx0:cx0 + 8] = crecons[1]

        # --- record syntax ---
        syn.mb_class[mb] = MB_I16
        syn.i16_mode[mb] = mode
        syn.chroma_mode[mb] = cmode
        syn.cbp_luma[mb] = cbp_l
        syn.cbp_chroma[mb] = cbp_c
        syn.luma_dc[mb] = dc_zz
        syn.luma_ac[mb] = ac_zz
        syn.chroma_dc[mb] = cdc
        syn.chroma_ac[mb] = cac
        syn.luma_nnz[mb] = nnz
        syn.chroma_nnz[mb] = cnnz

    return ry, ru, rv, syn
