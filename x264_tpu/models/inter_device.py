"""P-frame device model: the whole per-frame pixel pipeline — exhaustive
fullpel ME, luma/chroma MC, residual transform/quant, reconstruction — as
ONE jitted JAX program over all MBs; only the normative skip/MVP
classification (a tiny sequential scan) and entropy coding stay on host.

This is the TPU-first restructuring of x264's slice_write MB loop
(reference encoder/encoder.c:2752): what x264 does per-MB with a neighbor
cache, we do frame-batched, because the only *normative* sequential
dependencies of a P16x16 frame are the decoded-MV prediction chain
(host scan) and the entropy coder (host).  Bit-exact vs the NumPy tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x264_tpu.utils.aotcache import aot_jit

from x264_tpu.bitstream.tables import CHROMA_QP_TABLE
from x264_tpu.models import mvpred
from x264_tpu.models.inter_frame import PAD, me_lambda, sad_lambda
from x264_tpu.models.residual_device import (encode_chroma,
                                             encode_i16_luma,
                                             encode_p_luma,
                                             encode_p_luma_t8)
from x264_tpu.ops.device import header as dheader
from x264_tpu.ops.device import pixel as P
from x264_tpu.ops.device import predict as PR
from x264_tpu.ops.device.bitpack import pack_tokens
from x264_tpu.ops.device.cavlc import residual_slots
from x264_tpu.models.syntax import MB_P16, MB_PSKIP, empty_syntax
from x264_tpu.ops.device import transform as T
from x264_tpu.ops.device.mc import (
    hpel_planes as mc_hpel_planes,
    mc_chroma_uv,
    mc_luma_fullpel,
    mc_luma_qpel,
)
from x264_tpu.ops.device.me import full_search_16x16, subpel_refine

_CHROMA_QP = jnp.asarray(CHROMA_QP_TABLE.astype(np.int32))


def _pad_edge(p, pad):
    return jnp.pad(p, pad, mode="edge")


def _te_ref_bits(num_ref: int) -> np.ndarray:
    """te() bit count per ref_idx (CAVLC cost model for ref selection)."""
    if num_ref <= 1:
        return np.zeros(1, np.int32)
    if num_ref == 2:
        return np.ones(2, np.int32)
    return np.array([2 * int(k + 1).bit_length() - 1
                     for k in range(num_ref)], np.int32)


def _cavlc_bits_proxy(ac):
    """Per-MB CAVLC rate estimate over (N, B, 16) zigzag levels:
    sum of (2*bit_length(|l|) + 1) per nonzero level — the exp-golombish
    cost the transform-size decision trades against SSD (the non-RDO
    analog of reference encoder/analyse.c x264_mb_analyse_transform)."""
    a = jnp.abs(ac.astype(jnp.int32))
    nbits = jnp.zeros_like(a)
    for k in range(14):                      # levels fit in 14 bits
        nbits = nbits + (a >= (1 << k)).astype(jnp.int32)
    return (2 * nbits + (a > 0).astype(jnp.int32)).sum((-1, -2))


def select_transform_8x8(src_mbs, pred, qp, lam,
                         recon4, ac4, nnz4, cbp4, trellis8=None,
                         decimate: bool = True):
    """Per-MB adaptive transform size: encode the 8x8 alternative and pick
    by SSD + lambda2*rate (both encodings are batched device work, so the
    true-cost decision is free vs x264's satd/sa8d proxy).  Returns
    (t8 (N,) bool, recon, ac_zz, nnz, nnz_deblock, cbp_luma)."""
    rec8, ac8, nnz8, nnzdb8, cbp8 = encode_p_luma_t8(src_mbs, pred, qp,
                                                     trellis=trellis8,
                                                     decimate=decimate)
    lam2 = jnp.maximum((lam * lam * 9) // 10, jnp.int32(1))
    cost4 = P.ssd(src_mbs, recon4) + lam2 * _cavlc_bits_proxy(ac4)
    cost8 = P.ssd(src_mbs, rec8) + lam2 * _cavlc_bits_proxy(ac8)
    sel8 = cost8 < cost4
    # an all-zero 8x8 winner is emitted as a zero-residual 4x4 MB (the
    # flag is only written when cbp_luma > 0 and is inferred 0 otherwise)
    t8 = sel8 & (cbp8 > 0)
    m1, m2 = sel8[:, None], sel8[:, None, None]
    return (t8,
            jnp.where(m2, rec8, recon4),
            jnp.where(m2, ac8, ac4),
            jnp.where(m1, nnz8, nnz4),
            jnp.where(m1, nnzdb8, nnz4),
            jnp.where(sel8, cbp8, cbp4))



def _pir_column_pass(y, u, v, ry_pl, ru_pl, rv_pl, acc: dict,
                     qp, qpc, pir_col, mbw: int, mbh: int,
                     pir_ncols: int):
    """Forced-intra refresh bar: encode the pir_ncols MB columns at
    pir_col as I16x16, top-to-bottom (a lax.scan over MB rows — each MB
    predicts from the live recon plane, so vertical intra chains are
    exact; reference encoder/encoder.c:3626 refresh bar).  Returns the
    updated (ry_pl, ru_pl, rv_pl, acc)."""
    from x264_tpu.models.residual_device import (encode_chroma,
                                                 encode_i16_luma)
    from x264_tpu.ops.device import pixel as P
    from x264_tpu.ops.device import predict as PR

    n = mbw * mbh
    ysrc = y.astype(jnp.int32)
    usrc = u.astype(jnp.int32)
    vsrc = v.astype(jnp.int32)
    BIG = jnp.int32(1 << 30)

    def step(carry, r):
        ry, ru, rv, acc = carry
        for ci in range(pir_ncols):
            cc = pir_col + ci
            live = cc < mbw
            c = jnp.minimum(cc, mbw - 1)
            y0, x0 = r * 16, c * 16
            at = jnp.asarray([r > 0])
            al = jnp.asarray([c > 0])
            atl = at & al
            top = jax.lax.dynamic_slice(
                ry, (jnp.maximum(y0 - 1, 0), x0), (1, 16))
            left = jax.lax.dynamic_slice(
                ry, (y0, jnp.maximum(x0 - 1, 0)), (16, 1)).T
            tl = jax.lax.dynamic_slice(
                ry, (jnp.maximum(y0 - 1, 0), jnp.maximum(x0 - 1, 0)),
                (1, 1))[0]
            src = jax.lax.dynamic_slice(ysrc, (y0, x0), (16, 16))[None]
            preds = PR.predict_16x16_all(top, left, tl, at, al)
            avail = PR.i16x16_mode_avail(at, al, atl)
            costs = jnp.where(avail, P.satd(src[:, None], preds), BIG)
            mode = jnp.argmin(costs, axis=1).astype(jnp.int32)
            mcost = jnp.min(costs, axis=1).astype(jnp.int32)
            pred = jnp.take_along_axis(
                preds, mode[:, None, None, None], axis=1)[:, 0]
            mb = r * mbw + c
            qp_l = qp[mb][None]
            rec, dc_zz, ac_zz, nnz_b, cbp_b = encode_i16_luma(
                src, pred, qp_l)

            cy0, cx0 = r * 8, c * 8
            ctu = jax.lax.dynamic_slice(
                ru, (jnp.maximum(cy0 - 1, 0), cx0), (1, 8))
            ctv = jax.lax.dynamic_slice(
                rv, (jnp.maximum(cy0 - 1, 0), cx0), (1, 8))
            clu = jax.lax.dynamic_slice(
                ru, (cy0, jnp.maximum(cx0 - 1, 0)), (8, 1)).T
            clv = jax.lax.dynamic_slice(
                rv, (cy0, jnp.maximum(cx0 - 1, 0)), (8, 1)).T
            ctlu = jax.lax.dynamic_slice(
                ru, (jnp.maximum(cy0 - 1, 0), jnp.maximum(cx0 - 1, 0)),
                (1, 1))[0]
            ctlv = jax.lax.dynamic_slice(
                rv, (jnp.maximum(cy0 - 1, 0), jnp.maximum(cx0 - 1, 0)),
                (1, 1))[0]
            csu = jax.lax.dynamic_slice(usrc, (cy0, cx0), (8, 8))[None]
            csv = jax.lax.dynamic_slice(vsrc, (cy0, cx0), (8, 8))[None]
            cpu_ = PR.predict_chroma_all(ctu, clu, ctlu, at, al)
            cpv_ = PR.predict_chroma_all(ctv, clv, ctlv, at, al)
            ccosts = jnp.where(PR.chroma_mode_avail(at, al, atl),
                               P.satd(csu[:, None], cpu_)
                               + P.satd(csv[:, None], cpv_), BIG)
            cmode = jnp.argmin(ccosts, axis=1).astype(jnp.int32)
            cpu = jnp.take_along_axis(
                cpu_, cmode[:, None, None, None], axis=1)[:, 0]
            cpv = jnp.take_along_axis(
                cpv_, cmode[:, None, None, None], axis=1)[:, 0]
            cr_u, cr_v, cdc_b, cac_b, cnnz_b, cbpc_b = encode_chroma(
                csu, csv, cpu, cpv, qpc[mb][None], intra=True)

            ry2 = jax.lax.dynamic_update_slice(
                ry, rec[0].astype(ry.dtype), (y0, x0))
            ru2 = jax.lax.dynamic_update_slice(
                ru, cr_u[0].astype(ru.dtype), (cy0, cx0))
            rv2 = jax.lax.dynamic_update_slice(
                rv, cr_v[0].astype(rv.dtype), (cy0, cx0))
            ry = jnp.where(live, ry2, ry)
            ru = jnp.where(live, ru2, ru)
            rv = jnp.where(live, rv2, rv)
            mbk = jnp.where(live, mb, jnp.int32(n))
            acc = dict(
                luma_dc=acc["luma_dc"].at[mbk].set(dc_zz[0], mode="drop"),
                luma_ac=acc["luma_ac"].at[mbk].set(ac_zz[0], mode="drop"),
                luma_nnz=acc["luma_nnz"].at[mbk].set(nnz_b[0],
                                                     mode="drop"),
                nnz_deblock=acc["nnz_deblock"].at[mbk].set(nnz_b[0],
                                                           mode="drop"),
                cbp_luma=acc["cbp_luma"].at[mbk].set(cbp_b[0],
                                                     mode="drop"),
                chroma_dc=acc["chroma_dc"].at[mbk].set(cdc_b[0],
                                                       mode="drop"),
                chroma_ac=acc["chroma_ac"].at[mbk].set(cac_b[0],
                                                       mode="drop"),
                chroma_nnz=acc["chroma_nnz"].at[mbk].set(cnnz_b[0],
                                                         mode="drop"),
                cbp_chroma=acc["cbp_chroma"].at[mbk].set(cbpc_b[0],
                                                         mode="drop"),
                i16_mode=acc["i16_mode"].at[mbk].set(mode[0],
                                                     mode="drop"),
                chroma_mode=acc["chroma_mode"].at[mbk].set(cmode[0],
                                                           mode="drop"),
                mb_cost=acc["mb_cost"].at[mbk].set(mcost[0], mode="drop"),
                intra_mask=acc["intra_mask"].at[mbk].set(True,
                                                         mode="drop"),
                t8=acc["t8"].at[mbk].set(False, mode="drop"),
            )
        return (ry, ru, rv, acc), None

    (ry_pl, ru_pl, rv_pl, acc), _ = jax.lax.scan(
        step, (ry_pl.astype(jnp.int32), ru_pl.astype(jnp.int32),
               rv_pl.astype(jnp.int32), acc),
        jnp.arange(mbh, dtype=jnp.int32))
    return ry_pl, ru_pl, rv_pl, acc


def p_frame_pipeline(y, u, v, ref_y_pad, ref_u_pad, ref_v_pad, qp, lam,
                     mbw: int, mbh: int, me_range: int, cqp_off: int,
                     n_words: int = 24, subpel: int = 0,
                     entropy: str = "cavlc", lv_cap: int = 64,
                     t8: bool = False, wts=None, trellis_tbl=None,
                     parts: bool = False, decimate: bool = True,
                     pir_ncols: int = 0, pir_col=None, pir_bound=None):
    """All-device P-frame pixel pipeline on *pre-padded* reference planes
    (so the sharded band path can hand in halo slices — parallel/sliced.py).
    y/u/v: source planes (uint8, H=16*mbh x W=16*mbw); ref_*_pad: STACKED
    reference planes (K, ...) padded by PAD (luma) / PAD//2 (chroma) in
    list0 order (most recent first), or unstacked (K=1); qp: traced int32
    scalar or per-MB (N,) array; lam traced int32.
    Returns a dict of per-MB syntax tensors + pre-deblock recon planes."""
    n = mbw * mbh
    qp = jnp.broadcast_to(jnp.asarray(qp, jnp.int32).reshape(-1), (n,))
    qpc = _CHROMA_QP[jnp.clip(qp + cqp_off, 0, 51)]
    if ref_y_pad.ndim == 2:
        ref_y_pad = ref_y_pad[None]
        ref_u_pad = ref_u_pad[None]
        ref_v_pad = ref_v_pad[None]
    n_refs = ref_y_pad.shape[0]
    refbits = _te_ref_bits(n_refs)

    src_mbs = T.plane_to_mbs(y.astype(jnp.int32), mbh, mbw, 16)

    # ---- periodic intra refresh (PIR; reference encoder/encoder.c:3626
    # refresh-bar state machine + encoder/analyse.c:340 MV clamp).
    # pir_ncols > 0 enables it (static): pir_col (traced) = first MB
    # column forced intra this frame; pir_bound (traced, px) = the
    # reference's refreshed boundary.  MBs LEFT of the refresh bar may
    # only predict from the reference's refreshed region: their mvx is
    # clamped so the interpolation window (qpel taps + subpel refine
    # margin, 8 px) stays below pir_bound. ----
    pir = pir_ncols > 0
    mbx_of = jnp.arange(n, dtype=jnp.int32) % mbw

    def _pir_clamp_mvx(mvx_q, x0_px):
        """Clamp qpel mvx for units whose left edge (px) is x0_px."""
        maxq = 4 * (pir_bound - x0_px - 16 - 8)
        lim = mbx_of < pir_col
        return jnp.where(lim, jnp.minimum(mvx_q, maxq), mvx_q)

    shape = None
    if parts:
        # partition path (16x16/16x8/8x16/8x8): one exhaustive pass
        # accumulates all nine unit argmins; the partition shape is
        # decided at fullpel and the subpel refine runs at quadrant
        # granularity with partition-pooled costs (me_parts.py).
        # Reference shares one per-MB ref across partitions (chosen by
        # the 16x16 unit cost; mixed-ref p8x8 pending).
        from x264_tpu.ops.device.me_parts import (choose_shape,
                                                  full_search_parts,
                                                  subpel_refine_parts)
        assert subpel > 0, "partitions require subpel >= 1"
        units = None
        for k in range(n_refs):
            u_k = full_search_parts(y, ref_y_pad[k], lam,
                                    me_range=me_range, mbw=mbw, mbh=mbh)
            c16_k = u_k["cost_f"] + lam * int(refbits[k])
            if units is None:
                units, best16 = u_k, c16_k
                ref = jnp.zeros(n, jnp.int32)
            else:
                better = c16_k < best16
                best16 = jnp.where(better, c16_k, best16)
                ref = jnp.where(better, k, ref)
                units = {
                    key: jnp.where(
                        better.reshape((n,) + (1,) * (u_k[key].ndim - 1)),
                        u_k[key], units[key])
                    for key in units}
        shape, mv8, _ = choose_shape(units, lam)
        if pir:
            qx_px = (mbx_of[:, None] * 16
                     + jnp.asarray([0, 8, 0, 8], jnp.int32)[None, :])
            maxq8 = 4 * (pir_bound - qx_px - 8 - 8)
            lim8 = (mbx_of < pir_col)[:, None]
            mv8 = mv8.at[:, :, 0].set(
                jnp.where(lim8, jnp.minimum(mv8[:, :, 0], maxq8),
                          mv8[:, :, 0]))
        if jax.default_backend() == "tpu":
            from x264_tpu.ops.device.wingather import pack_planes4
            planes = jnp.stack([mc_hpel_planes(ref_y_pad[k])
                                for k in range(n_refs)])
            mv8, part_costs, pred = subpel_refine_parts(
                src_mbs, mv8, shape, lam, me_range, subpel, mbw, mbh,
                ref_idx=ref, packed_planes=pack_planes4(planes))
        else:
            mv8, part_costs, pred = subpel_refine_parts(
                src_mbs, mv8, shape, lam, me_range, subpel, mbw, mbh,
                ref_idx=ref if n_refs > 1 else None,
                ref_pad=ref_y_pad[0] if n_refs == 1 else ref_y_pad)
        mb_cost = part_costs.sum(1)
        mv = mv8[:, 0]
    else:
        # fullpel search per reference; pick per-MB best by cost + ref
        # cost (encoder/analyse.c mb_analyse_inter_p16x16's per-ref loop)
        mv = None
        for k in range(n_refs):
            mv_k, cost_k = full_search_16x16(y, ref_y_pad[k], lam,
                                             me_range=me_range, mbw=mbw,
                                             mbh=mbh)
            cost_k = cost_k + lam * int(refbits[k])
            if mv is None:
                mv, _cost, ref = mv_k, cost_k, jnp.zeros(n, jnp.int32)
            else:
                better = cost_k < _cost
                _cost = jnp.where(better, cost_k, _cost)
                mv = jnp.where(better[:, None], mv_k, mv)
                ref = jnp.where(better, k, ref)

        if pir:
            mv = mv.at[:, 0].set(_pir_clamp_mvx(mv[:, 0], mbx_of * 16))
        if subpel > 0:
            planes = jnp.stack([mc_hpel_planes(ref_y_pad[k])
                                for k in range(n_refs)])  # (K,4,Hp,Wp)
            mv, mb_cost, pred = subpel_refine(src_mbs, planes, mv, lam,
                                              me_range, subpel, mbw, mbh,
                                              ref_idx=ref,
                                              return_pred=True)
        else:
            mb_cost = _cost
            if n_refs == 1:
                pred = mc_luma_fullpel(ref_y_pad[0], mv, mbw, mbh, PAD)
            else:
                # fullpel gather from each MB's chosen reference
                stacked = jnp.stack([ref_y_pad[k].astype(jnp.int32)[None]
                                     for k in range(n_refs)]).squeeze(1)
                pred = mc_luma_qpel(
                    jnp.broadcast_to(stacked[:, None], (n_refs, 4)
                                     + stacked.shape[1:]),
                    mv, mbw, mbh, PAD, ref_idx=ref)
    if wts is not None:
        # explicit weighted prediction (spec 8.4.2.3.3: interpolate,
        # THEN weight) — models/weightp.py; search stayed unweighted
        from x264_tpu.models.weightp import apply_weights_jnp
        pred = apply_weights_jnp(pred, wts, ref)
    tr4 = tr8 = tr16 = trc = None
    if trellis_tbl is not None:
        tbl4, tbl8, lam2f = trellis_tbl[:3]
        tr4 = (tbl4, lam2f)
        tr8 = (tbl8, lam2f) if tbl8 is not None else None
        if len(trellis_tbl) > 3:
            tr16 = (trellis_tbl[3], lam2f)
            trc = (trellis_tbl[4], lam2f)
    recon_y_mbs, ac_zz, nnz, cbp_l = encode_p_luma(src_mbs, pred, qp,
                                                   trellis=tr4,
                                                   decimate=decimate)
    nnz_deblock = nnz
    t8_flag = jnp.zeros(n, bool)
    if t8:
        (t8_flag, recon_y_mbs, ac_zz, nnz, nnz_deblock,
         cbp_l) = select_transform_8x8(src_mbs, pred, qp, lam,
                                       recon_y_mbs, ac_zz, nnz, cbp_l,
                                       trellis8=tr8, decimate=decimate)

    if parts:
        from x264_tpu.ops.device.mc import mc_chroma_uv_quad
        pred_u, pred_v = mc_chroma_uv_quad(
            ref_u_pad[0] if n_refs == 1 else ref_u_pad,
            ref_v_pad[0] if n_refs == 1 else ref_v_pad,
            mv8, mbw, mbh, PAD // 2,
            ref_idx=None if n_refs == 1 else ref)
    else:
        pred_u, pred_v = mc_chroma_uv(
            ref_u_pad[0] if n_refs == 1 else ref_u_pad,
            ref_v_pad[0] if n_refs == 1 else ref_v_pad,
            mv, mbw, mbh, PAD // 2, ref_idx=None if n_refs == 1 else ref)
    src_u = T.plane_to_mbs(u.astype(jnp.int32), mbh, mbw, 8)
    src_v = T.plane_to_mbs(v.astype(jnp.int32), mbh, mbw, 8)
    ru_mbs, rv_mbs, cdc, cac, cnnz, cbp_c = encode_chroma(
        src_u, src_v, pred_u, pred_v, qpc, intra=False, decimate=decimate,
        trellis=trc)

    # source-edge intra cost estimate (scenecut + the intra-in-P decision;
    # x264 slicetype's lowres intra analog — source pixels as neighbours,
    # so it's fully parallel)
    ysrc = y.astype(jnp.int32)
    mby = jnp.arange(mbw * mbh, dtype=jnp.int32) // mbw
    mbx = jnp.arange(mbw * mbh, dtype=jnp.int32) % mbw
    yp_ = jnp.pad(ysrc, ((1, 0), (1, 0)), mode="edge")
    r16 = jnp.arange(16, dtype=jnp.int32)
    top = yp_[(mby * 16)[:, None], (mbx * 16 + 1)[:, None] + r16[None, :]]
    left = yp_[(mby * 16 + 1)[:, None] + r16[None, :], (mbx * 16)[:, None]]
    tl = yp_[mby * 16, mbx * 16]
    at = mby > 0
    al = mbx > 0
    ipreds = PR.predict_16x16_all(top, left, tl, at, al)
    iavail = PR.i16x16_mode_avail(at, al, at & al)
    icosts = jnp.where(iavail, P.satd(src_mbs[:, None], ipreds),
                       jnp.int32(1 << 30))
    icost = jnp.min(icosts, axis=1).astype(jnp.int32)

    # ---- intra-in-P (I16x16 MBs in P slices; encoder/analyse.c
    # mb_analyse_intra's role).  TPU-first shape: the decision comes from
    # the already-computed source-edge estimate, and a parallel ISOLATION
    # rule drops any candidate whose prediction would depend on another
    # intra MB's recon (neighbour pairs L/R, U/D, UL/DR).  Every surviving
    # intra MB then predicts from the pure-inter recon plane, so the whole
    # intra pass is ONE batched computation under a lax.cond that costs
    # nothing when no MB goes intra (the common case). ----
    cand = (icost + 8 * lam) < mb_cost
    if pir:
        # refresh-bar interaction: the batch intra fixup predicts from
        # the PRE-column recon, but the decoder sees the column's final
        # recon — exclude the bar itself and its right-adjacent MBs
        # (their left/topleft neighbours are bar MBs)
        in_bar = (mbx_of >= pir_col) & (mbx_of < pir_col + pir_ncols)
        cand = cand & ~in_bar & (mbx_of != pir_col + pir_ncols)
    cg = cand.reshape(mbh, mbw)

    def _sh(g, dy, dx):
        out = jnp.zeros_like(g)
        ys = slice(max(dy, 0), mbh + min(dy, 0))
        xs = slice(max(dx, 0), mbw + min(dx, 0))
        yd = slice(max(-dy, 0), mbh + min(-dy, 0))
        xd = slice(max(-dx, 0), mbw + min(-dx, 0))
        return out.at[yd, xd].set(g[ys, xs])

    iso = (cg & ~_sh(cg, 0, -1) & ~_sh(cg, 0, 1) & ~_sh(cg, -1, 0)
           & ~_sh(cg, 1, 0) & ~_sh(cg, -1, -1) & ~_sh(cg, 1, 1))
    # dense candidate clusters would self-suppress entirely; keep a
    # conflict-free lattice inside them: the offsets (0,1),(1,0),(1,1)
    # have (x+2y) differences 1,2,3 (mod 4), so the class-0 lattice never
    # pairs two kept MBs, and lattice-kept never conflicts with isolated
    # (isolated has no candidate neighbour at all).  ~25% of a cluster
    # converts per frame; the rest converges over following frames.
    xxg = jnp.arange(mbw, dtype=jnp.int32)[None, :]
    yyg = jnp.arange(mbh, dtype=jnp.int32)[:, None]
    latt = ((xxg + 2 * yyg) % 4) == 0
    keep = iso | (cg & latt)
    intra_mask = keep.reshape(n)

    ry_pl = T.mbs_to_plane(recon_y_mbs, mbh, mbw, 16)
    ru_pl = T.mbs_to_plane(ru_mbs, mbh, mbw, 8)
    rv_pl = T.mbs_to_plane(rv_mbs, mbh, mbw, 8)

    def _neigh(plane, s):
        """(top (N,s), left (N,s), topleft (N,)) of every sxs tile via
        strided slices of the 1-padded plane (no per-MB gathers)."""
        tp = jnp.pad(plane, ((1, 0), (0, 0)))[0::s][:mbh]
        topv = tp.reshape(mbh, mbw, s)
        lp = jnp.pad(plane, ((0, 0), (1, 0)))[:, 0::s][:, :mbw]
        leftv = lp.reshape(mbh, s, mbw).transpose(0, 2, 1)
        tlv = jnp.pad(plane, ((1, 0), (1, 0)))[0::s, 0::s][:mbh, :mbw]
        return (topv.reshape(n, s), leftv.reshape(n, s), tlv.reshape(n))

    def _intra_fixup(_):
        itop, ileft, itl = _neigh(ry_pl, 16)
        preds = PR.predict_16x16_all(itop, ileft, itl, at, al)
        costs = jnp.where(PR.i16x16_mode_avail(at, al, at & al),
                          P.satd(src_mbs[:, None], preds), jnp.int32(1 << 30))
        mode = jnp.argmin(costs, axis=1).astype(jnp.int32)
        mcost = jnp.min(costs, axis=1).astype(jnp.int32)
        ipred = jnp.take_along_axis(preds, mode[:, None, None, None],
                                    axis=1)[:, 0]
        irec, idc, iac, innz, icbp_l = encode_i16_luma(src_mbs, ipred, qp,
                                                       trellis=tr16)

        ctop_u, cleft_u, ctl_u = _neigh(ru_pl, 8)
        ctop_v, cleft_v, ctl_v = _neigh(rv_pl, 8)
        cpreds_u = PR.predict_chroma_all(ctop_u, cleft_u, ctl_u, at, al)
        cpreds_v = PR.predict_chroma_all(ctop_v, cleft_v, ctl_v, at, al)
        ccosts = jnp.where(PR.chroma_mode_avail(at, al, at & al),
                           P.satd(src_u[:, None], cpreds_u)
                           + P.satd(src_v[:, None], cpreds_v),
                           jnp.int32(1 << 30))
        cmode = jnp.argmin(ccosts, axis=1).astype(jnp.int32)
        cpu = jnp.take_along_axis(cpreds_u, cmode[:, None, None, None],
                                  axis=1)[:, 0]
        cpv = jnp.take_along_axis(cpreds_v, cmode[:, None, None, None],
                                  axis=1)[:, 0]
        icr_u, icr_v, icdc, icac, icnnz, icbp_c = encode_chroma(
            src_u, src_v, cpu, cpv, qpc, intra=True, trellis=trc)

        mk1 = intra_mask[:, None]
        mk2 = intra_mask[:, None, None]
        mk3 = intra_mask[:, None, None, None]
        return (jnp.where(mk1, idc, 0),
                jnp.where(mk2, iac, ac_zz),
                jnp.where(mk1, innz, nnz),
                jnp.where(mk1, innz, nnz_deblock),
                jnp.where(intra_mask, icbp_l, cbp_l),
                jnp.where(mk2, icdc, cdc),
                jnp.where(mk3, icac, cac),
                jnp.where(mk2, icnnz, cnnz),
                jnp.where(intra_mask, icbp_c, cbp_c),
                jnp.where(intra_mask, mode, 0),
                jnp.where(intra_mask, cmode, 0),
                jnp.where(intra_mask, mcost, mb_cost),
                jnp.where(mk2, irec, recon_y_mbs),
                jnp.where(mk2, icr_u, ru_mbs),
                jnp.where(mk2, icr_v, rv_mbs))

    def _no_intra(_):
        return (jnp.zeros((n, 16), jnp.int32), ac_zz, nnz, nnz_deblock,
                cbp_l, cdc, cac, cnnz, cbp_c,
                jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
                mb_cost, recon_y_mbs, ru_mbs, rv_mbs)

    (luma_dc, ac_zz, nnz, nnz_deblock, cbp_l, cdc, cac, cnnz, cbp_c,
     i16_mode, chroma_mode, mb_cost, recon_y_mbs, ru_mbs,
     rv_mbs) = jax.lax.cond(
        intra_mask.any(), _intra_fixup, _no_intra, None)
    t8_flag = t8_flag & ~intra_mask & (cbp_l > 0)

    ry_out = T.mbs_to_plane(recon_y_mbs, mbh, mbw, 16)
    ru_out = T.mbs_to_plane(ru_mbs, mbh, mbw, 8)
    rv_out = T.mbs_to_plane(rv_mbs, mbh, mbw, 8)
    if pir:
        pacc = dict(luma_dc=luma_dc, luma_ac=ac_zz, luma_nnz=nnz,
                    nnz_deblock=nnz_deblock, cbp_luma=cbp_l,
                    chroma_dc=cdc, chroma_ac=cac, chroma_nnz=cnnz,
                    cbp_chroma=cbp_c, i16_mode=i16_mode,
                    chroma_mode=chroma_mode, mb_cost=mb_cost,
                    intra_mask=intra_mask, t8=t8_flag)
        ry_out, ru_out, rv_out, pacc = _pir_column_pass(
            y, u, v, ry_out, ru_out, rv_out, pacc, qp, qpc,
            jnp.asarray(pir_col, jnp.int32), mbw, mbh, pir_ncols)
        (luma_dc, ac_zz, nnz, nnz_deblock, cbp_l, cdc, cac, cnnz,
         cbp_c, i16_mode, chroma_mode, mb_cost, intra_mask,
         t8_flag) = (pacc["luma_dc"], pacc["luma_ac"], pacc["luma_nnz"],
                     pacc["nnz_deblock"], pacc["cbp_luma"],
                     pacc["chroma_dc"], pacc["chroma_ac"],
                     pacc["chroma_nnz"], pacc["cbp_chroma"],
                     pacc["i16_mode"], pacc["chroma_mode"],
                     pacc["mb_cost"], pacc["intra_mask"], pacc["t8"])

    pre = dict(
        mb_cost=mb_cost, qp_mb=qp, icost=icost,
        mv=mv, ref_mb=ref,
        i16_mode=i16_mode, chroma_mode=chroma_mode, luma_dc=luma_dc,
        luma_ac=ac_zz, luma_nnz=nnz, nnz_deblock=nnz_deblock,
        t8=t8_flag, cbp_luma=cbp_l,
        chroma_dc=cdc, chroma_ac=cac, chroma_nnz=cnnz, cbp_chroma=cbp_c,
        intra_mask=intra_mask,
        recon_y=ry_out.astype(jnp.uint8),
        recon_u=ru_out.astype(jnp.uint8),
        recon_v=rv_out.astype(jnp.uint8),
    )
    if parts:
        pre.update(shape=shape, mv8=mv8)
    if entropy == "pixels":
        # staged mode: the classification + entropy tail runs as a
        # SECOND device program (p_entropy_tail).  Monolithic compiles
        # of the parts path hit a backend miscompile (worker kernel
        # fault, content-independent — bisected to the classify stage
        # being fused into the full program); two programs sidestep it
        # with device-resident intermediates and one extra dispatch.
        return pre
    return p_entropy_tail(pre, mbw=mbw, mbh=mbh, n_refs=n_refs,
                          n_words=n_words, entropy=entropy,
                          lv_cap=lv_cap, t8=t8, parts=parts)


def p_entropy_tail(pre: dict, mbw: int, mbh: int, n_refs: int,
                   n_words: int, entropy: str, lv_cap: int,
                   t8: bool, parts: bool):
    """Classification + entropy packing over the pixel stage's
    intermediates (see p_frame_pipeline's staging note)."""
    n = mbw * mbh
    qp = pre["qp_mb"]
    mb_cost, icost = pre["mb_cost"], pre["icost"]
    mv, ref = pre["mv"], pre["ref_mb"]
    intra_mask = pre["intra_mask"]
    luma_dc, ac_zz, nnz = pre["luma_dc"], pre["luma_ac"], pre["luma_nnz"]
    cbp_l, cbp_c = pre["cbp_luma"], pre["cbp_chroma"]
    cdc, cac, cnnz = pre["chroma_dc"], pre["chroma_ac"], pre["chroma_nnz"]
    i16_mode, chroma_mode = pre["i16_mode"], pre["chroma_mode"]
    t8_flag = pre["t8"]

    if parts:
        mv8, shape = pre["mv8"], pre["shape"]
        ref8 = jnp.broadcast_to(ref[:, None], (n, 4))
        mb_class, mvd_part, _ = dheader.classify_p_parts(
            mv8, ref8, shape, cbp_l, cbp_c, mbw, mbh, intra=intra_mask)
        mvd = mvd_part[:, 0]
        shape = jnp.where(intra_mask | (mb_class == dheader.MB_PSKIP_D),
                          0, shape)
    else:
        mb_class, mvd = dheader.classify_p(mv, cbp_l, cbp_c, mbw, mbh,
                                           ref=ref if n_refs > 1 else None,
                                           intra=intra_mask)
    ref = jnp.where(mb_class == dheader.MB_PSKIP_D, 0, ref)

    outs = dict(pre, mb_class=mb_class, mvd=mvd, ref_mb=ref)
    del outs["intra_mask"]
    if parts:
        # quadrant-granular motion for deblock bS and temporal direct
        # (intra MBs' mvs are never consulted: bS intra rules win, and
        # the direct path masks by col_intra)
        outs.update(shape=shape, mv8=mv8,
                    ref8=jnp.broadcast_to(ref[:, None], (n, 4)),
                    mvd_part=mvd_part)

    if entropy == "cabac":
        # compact syntax blob; the serial arithmetic coding runs in C on
        # the host (ops/device/entropy_pack.py rationale)
        from x264_tpu.ops.device.entropy_pack import cabac_blob
        outs["host_blob"] = cabac_blob(
            luma_dc, ac_zz, cdc, cac, mb_class, mvd, i16_mode,
            chroma_mode, cbp_l, cbp_c, qp, mb_cost, icost, K=lv_cap,
            t8=t8_flag, ref=ref if n_refs > 1 else None,
            shape=shape if parts else None,
            mvd_part=mvd_part if parts else None,
            ref_part=outs["ref8"] if parts else None)
        return outs

    # CAVLC: full entropy on device — slot grids + per-MB bit packing;
    # the host only bit-merges N packed strings (slice_assemble.py)
    res_vals, res_lens = residual_slots(
        luma_dc, ac_zz, nnz, cdc, cac, cnnz,
        cbp_l, cbp_c, intra_mask, mbw, mbh)
    if parts:
        hv, hl = dheader.header_slots_parts(
            mb_class, shape, i16_mode, chroma_mode, mvd_part,
            outs["ref8"], cbp_l, cbp_c, qp, num_ref=n_refs,
            t8=t8_flag if t8 else None)
    else:
        hv, hl = dheader.header_slots(
            mb_class, i16_mode, chroma_mode, mvd, cbp_l, cbp_c, qp,
            is_p_slice=True, ref=ref, num_ref=n_refs,
            t8=t8_flag if t8 else None)
    words, nbits = pack_tokens(jnp.concatenate([hv, res_vals], axis=1),
                               jnp.concatenate([hl, res_lens], axis=1),
                               n_words)
    outs.update(
        res_vals=res_vals, res_lens=res_lens, words=words, nbits=nbits,
        host_blob=jnp.concatenate(
            [jax.lax.bitcast_convert_type(words, jnp.int32),
             nbits[:, None], mb_class[:, None], mb_cost[:, None],
             icost[:, None]], axis=1))
    return outs


# band entry for multi-slice encoding: same pipeline, pre-sliced padded
# refs (parallel/sliced.py uses the identical contract under shard_map)
p_band_core = aot_jit(
    p_frame_pipeline,
    static_argnames=("mbw", "mbh", "me_range", "cqp_off",
                     "n_words", "subpel", "entropy",
                     "lv_cap", "t8", "parts", "decimate", "pir_ncols"))


@aot_jit(static_argnames=("mbw", "mbh", "me_range", "cqp_off",
                          "n_words", "subpel", "entropy",
                          "lv_cap", "t8", "parts", "decimate",
                          "pir_ncols"))
def _p_frame_core_jit(y, u, v, ref_y, ref_u, ref_v, qp, lam,
                      mbw: int, mbh: int, me_range: int, cqp_off: int,
                      n_words: int = 24, subpel: int = 0,
                      entropy: str = "cavlc", lv_cap: int = 64,
                      t8: bool = False, wts=None, trellis_tbl=None,
                      parts: bool = False, decimate: bool = True,
                      pir_ncols: int = 0, pir_col=None, pir_bound=None):
    def padk(p, pad):
        if p.ndim == 2:
            return _pad_edge(p, pad)[None]
        return jnp.pad(p, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    return p_frame_pipeline(y, u, v,
                            padk(ref_y, PAD),
                            padk(ref_u, PAD // 2),
                            padk(ref_v, PAD // 2),
                            qp, lam, mbw=mbw, mbh=mbh,
                            me_range=me_range, cqp_off=cqp_off,
                            n_words=n_words, subpel=subpel,
                            entropy=entropy, lv_cap=lv_cap, t8=t8,
                            wts=wts, trellis_tbl=trellis_tbl,
                            parts=parts, decimate=decimate,
                            pir_ncols=pir_ncols, pir_col=pir_col,
                            pir_bound=pir_bound)


p_entropy_core = aot_jit(
    p_entropy_tail,
    static_argnames=("mbw", "mbh", "n_refs", "n_words", "entropy",
                     "lv_cap", "t8", "parts"))


def p_frame_core(y, u, v, ref_y, ref_u, ref_v, qp, lam,
                 mbw: int, mbh: int, me_range: int, cqp_off: int,
                 n_words: int = 24, subpel: int = 0,
                 entropy: str = "cavlc", lv_cap: int = 64,
                 t8: bool = False, wts=None, trellis_tbl=None,
                 parts: bool = False, decimate: bool = True,
                 pir_ncols: int = 0, pir_col=None, pir_bound=None):
    """Single-chip entry: edge-pad the references on device, run the
    pipeline (see p_frame_pipeline for the contract).  ref_* may be
    (H, W) single-ref or stacked (K, H, W) in list0 order.

    The parts path runs as TWO device programs (pixels, then
    classification+entropy) — see p_frame_pipeline's staging note; the
    non-parts path stays monolithic."""
    if not parts:
        return _p_frame_core_jit(y, u, v, ref_y, ref_u, ref_v, qp, lam,
                                 mbw=mbw, mbh=mbh, me_range=me_range,
                                 cqp_off=cqp_off, n_words=n_words,
                                 subpel=subpel, entropy=entropy,
                                 lv_cap=lv_cap, t8=t8, wts=wts,
                                 trellis_tbl=trellis_tbl, parts=False,
                                 decimate=decimate, pir_ncols=pir_ncols,
                                 pir_col=pir_col, pir_bound=pir_bound)
    pre = _p_frame_core_jit(y, u, v, ref_y, ref_u, ref_v, qp, lam,
                            mbw=mbw, mbh=mbh, me_range=me_range,
                            cqp_off=cqp_off, n_words=n_words,
                            subpel=subpel, entropy="pixels",
                            lv_cap=lv_cap, t8=t8, wts=wts,
                            trellis_tbl=trellis_tbl, parts=True,
                            decimate=decimate, pir_ncols=pir_ncols,
                            pir_col=pir_col, pir_bound=pir_bound)
    n_refs = 1 if ref_y.ndim == 2 else int(ref_y.shape[0])
    return p_entropy_core(pre, mbw=mbw, mbh=mbh, n_refs=n_refs,
                          n_words=n_words, entropy=entropy,
                          lv_cap=lv_cap, t8=t8, parts=True)


def classify_pframe_vec(syn, mv: np.ndarray, cbp_l: np.ndarray,
                        cbp_c: np.ndarray):
    """Vectorized P_Skip classification + normative mvd (8.4.1).

    x264 runs this as part of the serial MB scan because its decoded state
    evolves MB by MB — but for P16x16-only frames the decoded mv of EVERY
    MB equals its chosen mv (a skip's mv is the skip mv by definition) and
    every ref is 0, so MVP/skip for all MBs are pure functions of the mv
    field and compute in parallel.  Bit-identical to classify_pframe (the
    scan version, kept as the test oracle)."""
    mbw, mbh = syn.mb_width, syn.mb_height
    m = mv.astype(np.int64).reshape(mbh, mbw, 2)
    zeros = np.zeros_like(m)

    def shifted(dy, dx):
        """Neighbor mv grid + availability mask."""
        mvn = np.zeros_like(m)
        av = np.zeros((mbh, mbw), bool)
        ys = slice(max(dy, 0), mbh + min(dy, 0))
        xs = slice(max(dx, 0), mbw + min(dx, 0))
        yd = slice(max(-dy, 0), mbh + min(-dy, 0))
        xd = slice(max(-dx, 0), mbw + min(-dx, 0))
        mvn[yd, xd] = m[ys, xs]
        av[yd, xd] = True
        return mvn, av

    mva, av_a = shifted(0, -1)
    mvb, av_b = shifted(-1, 0)
    mvc, av_c = shifted(-1, 1)
    mvd_, av_d = shifted(-1, -1)
    # C substitution by D when C out of frame (8.4.1.3 neighbor derivation)
    use_d = ~av_c
    mvc = np.where(use_d[..., None], mvd_, mvc)
    av_c = np.where(use_d, av_d, av_c)

    # rule 1: only A available among {B, C} missing -> mva
    only_a = av_a & ~av_b & ~av_c
    # rule 2: exactly one neighbor with ref==cur_ref (avail => ref 0 here)
    n_av = av_a.astype(np.int64) + av_b + av_c
    one = n_av == 1
    one_mv = (mva * av_a[..., None] + mvb * av_b[..., None]
              + mvc * av_c[..., None])
    med = (np.sort(np.stack([mva * av_a[..., None], mvb * av_b[..., None],
                             mvc * av_c[..., None]], axis=0), axis=0)[1])
    mvp = np.where(only_a[..., None], mva,
                   np.where(one[..., None], one_mv, med))

    # P_Skip mv (8.4.1.1)
    yy = np.arange(mbh)[:, None]
    xx = np.arange(mbw)[None, :]
    edge = (yy == 0) | (xx == 0)
    a_zero = av_a & (mva == 0).all(-1)
    b_zero = av_b & (mvb == 0).all(-1)
    skip_mv = np.where((edge | a_zero | b_zero)[..., None], zeros, mvp)

    flat_mv = m.reshape(-1, 2)
    flat_skip = skip_mv.reshape(-1, 2)
    flat_mvp = mvp.reshape(-1, 2)
    is_skip = ((cbp_l == 0) & (cbp_c == 0)
               & (flat_mv == flat_skip).all(1))
    syn.mb_class[:] = np.where(is_skip, MB_PSKIP, MB_P16)
    syn.mvd[:] = np.where(is_skip[:, None], 0, flat_mv - flat_mvp)


def classify_pframe(syn, mv: np.ndarray, cbp_l: np.ndarray, cbp_c: np.ndarray):
    """Host sequential scan: P_Skip classification + normative mvd
    (8.4.1) over decoded-so-far state.  Shared by both backends."""
    mbw, mbh = syn.mb_width, syn.mb_height
    n = mbw * mbh
    mv_dec = np.zeros((n, 2), np.int32)
    ref_dec = np.full(n, -1, np.int32)
    for i in range(n):
        mby, mbx = divmod(i, mbw)
        skip_mv = mvpred.pskip_mv(mv_dec, ref_dec, mbx, mby, mbw)
        if (cbp_l[i] == 0 and cbp_c[i] == 0
                and mv[i, 0] == skip_mv[0] and mv[i, 1] == skip_mv[1]):
            syn.mb_class[i] = MB_PSKIP
            mv_dec[i] = skip_mv
            ref_dec[i] = 0
            continue
        mvp = mvpred.predict_mv_16x16(mv_dec, ref_dec, mbx, mby, mbw, 0)
        syn.mb_class[i] = MB_P16
        syn.mvd[i] = mv[i] - mvp
        mv_dec[i] = mv[i]
        ref_dec[i] = 0


def encode_pframe_device(y, u, v, ref, qp, params, lam=None):
    """Host wrapper: run the device core, assemble FrameSyntax, run the
    host skip/mvd scan.  Drop-in replacement for
    inter_frame.encode_pframe.  qp: scalar or per-MB array."""
    h, w = y.shape
    mbw, mbh = w // 16, h // 16
    if lam is None:
        lam = sad_lambda(int(np.atleast_1d(qp)[0]))
    out = p_frame_core(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                       jnp.asarray(ref.y), jnp.asarray(ref.u),
                       jnp.asarray(ref.v),
                       np.asarray(qp, np.int32), np.int32(lam),
                       mbw=mbw, mbh=mbh, me_range=params.me_range,
                       cqp_off=params.chroma_qp_offset,
                       subpel=params.subpel,
                       decimate=params.dct_decimate)
    out = {k: np.asarray(val) for k, val in out.items()}

    syn = empty_syntax(mbw, mbh)
    syn.qp[:] = out["qp_mb"]
    syn.mb_cost = out["mb_cost"].astype(np.int64)
    syn.icost = out["icost"].astype(np.int64)
    syn.mv[:] = out["mv"]
    syn.ref[:] = 0
    syn.i16_mode[:] = out["i16_mode"]
    syn.chroma_mode[:] = out["chroma_mode"]
    syn.luma_dc[:] = out["luma_dc"]
    syn.luma_ac[:] = out["luma_ac"]
    syn.luma_nnz[:] = out["luma_nnz"]
    syn.cbp_luma[:] = out["cbp_luma"]
    syn.chroma_dc[:] = out["chroma_dc"]
    syn.chroma_ac[:] = out["chroma_ac"]
    syn.chroma_nnz[:] = out["chroma_nnz"]
    syn.cbp_chroma[:] = out["cbp_chroma"]
    syn.res_vals = out["res_vals"]
    syn.res_lens = out["res_lens"]

    # the pipeline classified on device (incl. intra-in-P neighbour rules)
    syn.mb_class[:] = out["mb_class"]
    syn.mvd[:] = np.where((out["mb_class"] == MB_P16)[:, None],
                          out["mvd"], 0)
    return out["recon_y"], out["recon_u"], out["recon_v"], syn
