"""B-frame device model: bi-predictive 16x16 encoding with TEMPORAL
direct mode — the TPU-first B design.

x264 defaults to spatial direct, whose MV derivation reads the *current*
frame's neighbour MVs (a raster dependency chain when neighbours are
themselves direct-coded).  Temporal direct (8.4.1.2.3) derives every MB's
direct MVs from the COLOCATED macroblock of the future reference — a pure
per-MB function of the already-encoded L1 picture's motion field — so the
entire B frame stays one batched program (the slice header signals
direct_spatial_mv_pred_flag = 0, which x264 also supports via
--direct temporal).

Coverage: one reference per list (L0 = past anchor, L1 = future anchor),
mb types B_Direct_16x16 / B_L0_16x16 / B_L1_16x16 / B_Bi_16x16 / B_Skip,
CAVLC.  Parity anchors: encoder/slicetype + analyse.c B paths,
common/mvpred.c direct derivation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x264_tpu.utils.aotcache import aot_jit

from x264_tpu.bitstream.tables import CHROMA_QP_TABLE
from x264_tpu.models.inter_frame import PAD
from x264_tpu.models.residual_device import (encode_chroma,
                                             encode_i16_luma,
                                             encode_p_luma)
from x264_tpu.ops.device import header as dheader
from x264_tpu.ops.device import pixel as P
from x264_tpu.ops.device import predict as PR
from x264_tpu.ops.device import transform as T
from x264_tpu.ops.device.bitpack import pack_tokens
from x264_tpu.ops.device.cavlc import residual_slots
from x264_tpu.ops.device.mc import (
    hpel_planes as mc_hpel_planes,
    mc_chroma_uv_quad,
    mc_luma_qpel,
    mc_luma_qpel_quad,
)
from x264_tpu.ops.device.me import (
    full_search_16x16,
    mv_bits_arr,
    subpel_refine,
)

_CHROMA_QP = jnp.asarray(CHROMA_QP_TABLE.astype(np.int32))


def _pad_edge(p, pad):
    return jnp.pad(p, pad, mode="edge")


@aot_jit(static_argnames=("mbw", "mbh", "me_range", "cqp_off",
                          "n_words", "subpel", "entropy",
                          "lv_cap", "t8_mode", "decimate"))
def b_frame_core(y, u, v,
                 l0_y, l0_u, l0_v, l1_y, l1_u, l1_v,
                 col_mv, col_intra, dist_scale, qp, lam,
                 mbw: int, mbh: int, me_range: int, cqp_off: int,
                 n_words: int = 24, subpel: int = 2,
                 entropy: str = "cavlc", lv_cap: int = 64,
                 t8_mode: bool = False, trellis_tbl=None,
                 decimate: bool = True, col_ref=None):
    """Encode one B frame.  col_mv (N,4,2): the L1 anchor's QUADRANT-
    grain motion field (uniform quads when the anchor is 16x16-only;
    distinct when the anchor used partitions — 8.4.1.2.2's
    direct_8x8_inference corner rule resolves to the quadrant's own mv
    at our >= 8x8 partition grain); col_intra (N,) bool; dist_scale:
    temporal-direct DistScaleFactor (8.4.1.2.3), traced int32.

    col_ref (N,4) int32 or None: the L1 anchor's per-quad ref_idx
    field.  With multi-ref anchors, a colocated quad that referenced
    an older anchor (ref_idx > 0) would make the spec's temporal
    derivation (8.4.1.2.3 MapColToList0) point outside our one-entry
    B list0 — such MBs simply never choose direct (explicit L0/L1/BI
    instead), keeping num_ref_idx_l0_active = 1 conformant."""
    l0y = _pad_edge(l0_y, PAD)
    l1y = _pad_edge(l1_y, PAD)
    planes0 = mc_hpel_planes(l0y)
    planes1 = mc_hpel_planes(l1y)
    mv0_fp, cost0_fp = full_search_16x16(y, l0y, lam, me_range=me_range,
                                         mbw=mbw, mbh=mbh)
    mv1_fp, cost1_fp = full_search_16x16(y, l1y, lam, me_range=me_range,
                                         mbw=mbw, mbh=mbh)
    return _b_body(y, u, v, planes0, planes1,
                   _pad_edge(l0_u, PAD // 2), _pad_edge(l0_v, PAD // 2),
                   _pad_edge(l1_u, PAD // 2), _pad_edge(l1_v, PAD // 2),
                   col_mv, col_intra, dist_scale, qp, lam,
                   mv0_fp, cost0_fp, mv1_fp, cost1_fp,
                   mbw=mbw, mbh=mbh, me_range=me_range, cqp_off=cqp_off,
                   n_words=n_words, subpel=subpel, entropy=entropy,
                   lv_cap=lv_cap, t8_mode=t8_mode,
                   trellis_tbl=trellis_tbl, decimate=decimate,
                   col_ref=col_ref)


@aot_jit(static_argnames=("mbw", "mbh", "me_range", "cqp_off",
                          "n_words", "subpel", "entropy",
                          "lv_cap", "t8_mode", "decimate"))
def b_pair_core(y2, u2, v2,
                l0_y, l0_u, l0_v, l1_y, l1_u, l1_v,
                col_mv, col_intra, dist_scale2, qp2, lam,
                mbw: int, mbh: int, me_range: int, cqp_off: int,
                n_words: int = 24, subpel: int = 2,
                entropy: str = "cabac", lv_cap: int = 64,
                t8_mode: bool = False, trellis_tbl=None,
                decimate: bool = True, col_ref=None):
    """Both B frames of a mini-GOP in ONE program: sources stacked on a
    leading axis (y2 (2,H,W)), anchors/hpel planes/colocated motion
    SHARED (computed once), the per-frame body vmapped.  Halves the
    per-op dispatch count that dominates the B cores (see
    doc/PROFILE_r5.md) and skips the second hpel filter bank.
    dist_scale2/qp2: (2,) per-frame.  Every output gains a leading
    frame axis; math is identical to b_frame_core per frame (vmap does
    not change integer arithmetic), so streams are bit-identical."""
    l0y = _pad_edge(l0_y, PAD)
    l1y = _pad_edge(l1_y, PAD)
    planes0 = mc_hpel_planes(l0y)
    planes1 = mc_hpel_planes(l1y)
    fp = [full_search_16x16(y2[i], ref, lam, me_range=me_range,
                            mbw=mbw, mbh=mbh)
          for i in range(2) for ref in (l0y, l1y)]
    mv0_fp = jnp.stack([fp[0][0], fp[2][0]])
    cost0_fp = jnp.stack([fp[0][1], fp[2][1]])
    mv1_fp = jnp.stack([fp[1][0], fp[3][0]])
    cost1_fp = jnp.stack([fp[1][1], fp[3][1]])
    l0u, l0v = _pad_edge(l0_u, PAD // 2), _pad_edge(l0_v, PAD // 2)
    l1u, l1v = _pad_edge(l1_u, PAD // 2), _pad_edge(l1_v, PAD // 2)

    def body(y, u, v, dsf, qp, m0, c0, m1, c1):
        return _b_body(y, u, v, planes0, planes1, l0u, l0v, l1u, l1v,
                       col_mv, col_intra, dsf, qp, lam,
                       m0, c0, m1, c1,
                       mbw=mbw, mbh=mbh, me_range=me_range,
                       cqp_off=cqp_off, n_words=n_words, subpel=subpel,
                       entropy=entropy, lv_cap=lv_cap, t8_mode=t8_mode,
                       trellis_tbl=trellis_tbl, decimate=decimate,
                       col_ref=col_ref)

    return jax.vmap(body)(y2, u2, v2, dist_scale2, qp2,
                          mv0_fp, cost0_fp, mv1_fp, cost1_fp)


def _b_body(y, u, v, planes0, planes1, l0u, l0v, l1u, l1v,
            col_mv, col_intra, dist_scale, qp, lam,
            mv0_fp, cost0_fp, mv1_fp, cost1_fp,
            mbw: int, mbh: int, me_range: int, cqp_off: int,
            n_words: int, subpel: int, entropy: str, lv_cap: int,
            t8_mode: bool, trellis_tbl, decimate: bool, col_ref=None):
    """Per-frame B encode given shared padded refs / hpel planes and the
    frame's fullpel ME results (hoisted so b_pair_core can vmap this
    body over two sources while sharing the anchor-side work)."""
    n = mbw * mbh
    qp = jnp.broadcast_to(jnp.asarray(qp, jnp.int32).reshape(-1), (n,))
    qpc = _CHROMA_QP[jnp.clip(qp + cqp_off, 0, 51)]

    src_mbs = T.plane_to_mbs(y.astype(jnp.int32), mbh, mbw, 16)

    # ---- temporal direct MVs (8.4.1.2.3), per quadrant ----
    mvcol = jnp.where(col_intra[:, None, None], 0,
                      col_mv.astype(jnp.int32))          # (N,4,2)
    dmv0 = (dist_scale * mvcol + 128) >> 8
    dmv1 = dmv0 - mvcol
    # clamp into the reachable window (interp padding safety)
    lim = 4 * (me_range + 3)
    dmv0 = jnp.clip(dmv0, -lim, lim)
    dmv1 = jnp.clip(dmv1, -lim, lim)

    def me(planes, mv, cost):
        if subpel > 0:
            mv, cost, pred = subpel_refine(src_mbs, planes, mv, lam,
                                           me_range, subpel, mbw, mbh,
                                           return_pred=True)
        else:
            pred = mc_luma_qpel(planes, mv, mbw, mbh, PAD)
        return mv, cost, pred

    mv0, cost0, pred0 = me(planes0, mv0_fp, cost0_fp)
    mv1, cost1, pred1 = me(planes1, mv1_fp, cost1_fp)
    pred_bi = (pred0 + pred1 + 1) >> 1
    pd0 = mc_luma_qpel_quad(planes0, dmv0, mbw, mbh, PAD)
    pd1 = mc_luma_qpel_quad(planes1, dmv1, mbw, mbh, PAD)
    pred_dir = (pd0 + pd1 + 1) >> 1

    off = 4 * me_range + 4
    bits = jnp.asarray(mv_bits_arr(off).astype(np.int32))

    def mvcost(mv, mvp):
        d0 = jnp.clip(mv[:, 0] - mvp[:, 0], -off + 1, off - 1)
        d1 = jnp.clip(mv[:, 1] - mvp[:, 1], -off + 1, off - 1)
        return lam * (bits[d0 + off] + bits[d1 + off])

    # mode decision (SATD + mv bits + ue(mb_type) bits, analyse.c B path)
    cost_dir = P.satd(src_mbs, pred_dir) + lam * 1
    if col_ref is not None:
        # multi-ref anchors: direct barred where any colocated quad
        # referenced an older anchor (see b_frame_core docstring)
        dir_ok = (col_ref.astype(jnp.int32) == 0).all(axis=1)
        cost_dir = jnp.where(dir_ok, cost_dir, jnp.int32(1 << 29))
    cost_bi = (P.satd(src_mbs, pred_bi) + (cost0 - P.satd(src_mbs, pred0))
               + (cost1 - P.satd(src_mbs, pred1)) + lam * 5)
    costs = jnp.stack([cost_dir, cost0 + lam * 3, cost1 + lam * 3, cost_bi])
    bmode = jnp.argmin(costs, axis=0).astype(jnp.int32)

    use0 = (bmode == dheader.B_L0) | (bmode == dheader.B_BI)
    use1 = (bmode == dheader.B_L1) | (bmode == dheader.B_BI)
    # quadrant-grain final motion: explicit modes broadcast their one mv
    fmv0 = jnp.where(use0[:, None, None],
                     jnp.broadcast_to(mv0[:, None], (n, 4, 2)), dmv0)
    fmv1 = jnp.where(use1[:, None, None],
                     jnp.broadcast_to(mv1[:, None], (n, 4, 2)), dmv1)
    any0 = use0 | (bmode == dheader.B_DIRECT)
    any1 = use1 | (bmode == dheader.B_DIRECT)

    pred = jnp.where((bmode == dheader.B_DIRECT)[:, None, None], pred_dir,
           jnp.where((bmode == dheader.B_L0)[:, None, None], pred0,
           jnp.where((bmode == dheader.B_L1)[:, None, None], pred1,
                     pred_bi)))

    tr4 = tr8 = tr16 = trc = None
    if trellis_tbl is not None:
        tr4 = (trellis_tbl[0], trellis_tbl[2])
        if trellis_tbl[1] is not None:
            tr8 = (trellis_tbl[1], trellis_tbl[2])
        if len(trellis_tbl) > 3:
            tr16 = (trellis_tbl[3], trellis_tbl[2])
            trc = (trellis_tbl[4], trellis_tbl[2])
    recon_y_mbs, ac_zz, nnz, cbp_l = encode_p_luma(src_mbs, pred, qp,
                                                   decimate=decimate,
                                                   trellis=tr4)
    nnz_deblock = nnz
    t8_flag = jnp.zeros(n, bool)
    if t8_mode and entropy == "cabac":
        # adaptive 8x8 transform in B (the P core's true-cost selection,
        # reference analyse.c x264_mb_analyse_transform for B slices);
        # the CAVLC B header writer still hardcodes the flag to 0, so
        # the selection is CABAC-path-only
        from x264_tpu.models.inter_device import select_transform_8x8
        (t8_flag, recon_y_mbs, ac_zz, nnz, nnz_deblock,
         cbp_l) = select_transform_8x8(src_mbs, pred, qp, lam,
                                       recon_y_mbs, ac_zz, nnz, cbp_l,
                                       trellis8=tr8, decimate=decimate)

    # chroma: per-list MC at the final mvs, averaged per mode
    # (l0u/l0v/l1u/l1v arrive pre-padded from the callers)
    cu0, cv0 = mc_chroma_uv_quad(l0u, l0v, fmv0, mbw, mbh, PAD // 2)
    cu1, cv1 = mc_chroma_uv_quad(l1u, l1v, fmv1, mbw, mbh, PAD // 2)
    both = (any0 & any1)[:, None, None]
    cpred_u = jnp.where(both, (cu0 + cu1 + 1) >> 1,
                        jnp.where(any0[:, None, None], cu0, cu1))
    cpred_v = jnp.where(both, (cv0 + cv1 + 1) >> 1,
                        jnp.where(any0[:, None, None], cv0, cv1))
    src_u = T.plane_to_mbs(u.astype(jnp.int32), mbh, mbw, 8)
    src_v = T.plane_to_mbs(v.astype(jnp.int32), mbh, mbw, 8)
    ru_mbs, rv_mbs, cdc, cac, cnnz, cbp_c = encode_chroma(
        src_u, src_v, cpred_u, cpred_v, qpc, intra=False,
        decimate=decimate, trellis=trc)

    # ---- intra-in-B (I16x16 escape for occlusions/scene-ish Bs; the
    # encoder/analyse.c:3180-3259 intra probe in B role).  Same TPU-first
    # shape as the P core: a source-edge cost estimate picks candidates,
    # a parallel isolation lattice drops any whose prediction would read
    # another intra MB's recon, and the survivors re-predict from the
    # pure-inter recon plane in ONE batched lax.cond pass. ----
    ysrc = y.astype(jnp.int32)
    mby = jnp.arange(n, dtype=jnp.int32) // mbw
    mbx = jnp.arange(n, dtype=jnp.int32) % mbw
    yp_ = jnp.pad(ysrc, ((1, 0), (1, 0)), mode="edge")
    r16 = jnp.arange(16, dtype=jnp.int32)
    stop = yp_[(mby * 16)[:, None], (mbx * 16 + 1)[:, None] + r16[None, :]]
    sleft = yp_[(mby * 16 + 1)[:, None] + r16[None, :], (mbx * 16)[:, None]]
    stl = yp_[mby * 16, mbx * 16]
    at = mby > 0
    al = mbx > 0
    ipreds = PR.predict_16x16_all(stop, sleft, stl, at, al)
    iavail = PR.i16x16_mode_avail(at, al, at & al)
    icost_src = jnp.min(jnp.where(iavail, P.satd(src_mbs[:, None], ipreds),
                                  jnp.int32(1 << 30)), axis=1)
    bcost = jnp.min(costs, axis=0)
    cand = (icost_src + 8 * lam) < bcost
    cg = cand.reshape(mbh, mbw)

    def _sh(g, dy, dx):
        out2 = jnp.zeros_like(g)
        ys = slice(max(dy, 0), mbh + min(dy, 0))
        xs = slice(max(dx, 0), mbw + min(dx, 0))
        yd = slice(max(-dy, 0), mbh + min(-dy, 0))
        xd = slice(max(-dx, 0), mbw + min(-dx, 0))
        return out2.at[yd, xd].set(g[ys, xs])

    iso = (cg & ~_sh(cg, 0, -1) & ~_sh(cg, 0, 1) & ~_sh(cg, -1, 0)
           & ~_sh(cg, 1, 0) & ~_sh(cg, -1, -1) & ~_sh(cg, 1, 1))
    xxg = jnp.arange(mbw, dtype=jnp.int32)[None, :]
    yyg = jnp.arange(mbh, dtype=jnp.int32)[:, None]
    latt = ((xxg + 2 * yyg) % 4) == 0
    intra_mask = (iso | (cg & latt)).reshape(n)

    ry_pl = T.mbs_to_plane(recon_y_mbs, mbh, mbw, 16)
    ru_pl = T.mbs_to_plane(ru_mbs, mbh, mbw, 8)
    rv_pl = T.mbs_to_plane(rv_mbs, mbh, mbw, 8)

    def _neigh(plane, s):
        tp = jnp.pad(plane, ((1, 0), (0, 0)))[0::s][:mbh]
        topv = tp.reshape(mbh, mbw, s)
        lp = jnp.pad(plane, ((0, 0), (1, 0)))[:, 0::s][:, :mbw]
        leftv = lp.reshape(mbh, s, mbw).transpose(0, 2, 1)
        tlv = jnp.pad(plane, ((1, 0), (1, 0)))[0::s, 0::s][:mbh, :mbw]
        return (topv.reshape(n, s), leftv.reshape(n, s), tlv.reshape(n))

    def _intra_fixup(_):
        itop, ileft, itl = _neigh(ry_pl, 16)
        preds = PR.predict_16x16_all(itop, ileft, itl, at, al)
        icosts = jnp.where(PR.i16x16_mode_avail(at, al, at & al),
                           P.satd(src_mbs[:, None], preds),
                           jnp.int32(1 << 30))
        mode = jnp.argmin(icosts, axis=1).astype(jnp.int32)
        ipred = jnp.take_along_axis(preds, mode[:, None, None, None],
                                    axis=1)[:, 0]
        irec, idc, iac, innz, icbp_l = encode_i16_luma(src_mbs, ipred, qp,
                                                       trellis=tr16)

        ctu, clu, ctlu = _neigh(ru_pl, 8)
        ctv, clv, ctlv = _neigh(rv_pl, 8)
        cpreds_u = PR.predict_chroma_all(ctu, clu, ctlu, at, al)
        cpreds_v = PR.predict_chroma_all(ctv, clv, ctlv, at, al)
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
                jnp.where(intra_mask, icbp_l, cbp_l),
                jnp.where(mk2, icdc, cdc),
                jnp.where(mk3, icac, cac),
                jnp.where(mk2, icnnz, cnnz),
                jnp.where(intra_mask, icbp_c, cbp_c),
                jnp.where(intra_mask, mode, 0),
                jnp.where(intra_mask, cmode, 0),
                jnp.where(mk2, irec, recon_y_mbs),
                jnp.where(mk2, icr_u, ru_mbs),
                jnp.where(mk2, icr_v, rv_mbs))

    def _no_intra(_):
        return (jnp.zeros((n, 16), jnp.int32), ac_zz, nnz, cbp_l,
                cdc, cac, cnnz, cbp_c,
                jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
                recon_y_mbs, ru_mbs, rv_mbs)

    (luma_dc, ac_zz, nnz, cbp_l, cdc, cac, cnnz, cbp_c, i16_mode,
     chroma_mode, recon_y_mbs, ru_mbs, rv_mbs) = jax.lax.cond(
        intra_mask.any(), _intra_fixup, _no_intra, None)
    nnz_deblock = jnp.where(intra_mask[:, None], nnz, nnz_deblock)
    t8_flag = t8_flag & ~intra_mask & (cbp_l > 0)

    # intra MBs leave the inter signalling path entirely
    use0 = use0 & ~intra_mask
    use1 = use1 & ~intra_mask
    any0 = any0 & ~intra_mask
    any1 = any1 & ~intra_mask

    # ---- mvd vs per-list median MVP; skip = direct + no residual ----
    # (quad-grain fmv: the MVP picks the normative neighbouring 4x4
    # block's quadrant, so direct neighbours contribute their own quad)
    mvp0 = dheader.mvp_for_list(fmv0, any0, mbw, mbh)
    mvp1 = dheader.mvp_for_list(fmv1, any1, mbw, mbh)
    mvd0 = jnp.where(use0[:, None], mv0 - mvp0, 0)
    mvd1 = jnp.where(use1[:, None], mv1 - mvp1, 0)
    is_skip = ((bmode == dheader.B_DIRECT) & (cbp_l == 0) & (cbp_c == 0)
               & ~intra_mask)
    # 0 = intra (CLS_I16), 2 = coded inter, 3 = skip
    mb_class = jnp.where(intra_mask, 0,
                         jnp.where(is_skip, 3, 2)).astype(jnp.int32)

    outs = dict(
        mb_class=mb_class,
        bmode=bmode, mv0=fmv0, mv1=fmv1, any0=any0, any1=any1,
        mvd0=mvd0, mvd1=mvd1, i16_mode=i16_mode, chroma_mode=chroma_mode,
        luma_dc=luma_dc,
        luma_ac=ac_zz, chroma_dc=cdc, chroma_ac=cac, chroma_nnz=cnnz,
        luma_nnz=nnz, nnz_deblock=nnz_deblock, t8=t8_flag,
        cbp_luma=cbp_l, cbp_chroma=cbp_c, qp_mb=qp,
        mb_cost=jnp.minimum(cost0, cost1),
        recon_y=T.mbs_to_plane(recon_y_mbs, mbh, mbw, 16).astype(jnp.uint8),
        recon_u=T.mbs_to_plane(ru_mbs, mbh, mbw, 8).astype(jnp.uint8),
        recon_v=T.mbs_to_plane(rv_mbs, mbh, mbw, 8).astype(jnp.uint8),
    )

    if entropy == "cabac":
        from x264_tpu.ops.device.entropy_pack import cabac_blob
        z = jnp.zeros(n, jnp.int32)
        outs["host_blob"] = cabac_blob(
            luma_dc, ac_zz, cdc, cac, mb_class,
            mvd0, i16_mode, chroma_mode, cbp_l, cbp_c, qp,
            jnp.minimum(cost0, cost1), z,
            K=lv_cap, bmode=bmode, mvd1=mvd1, t8=t8_flag)
        return outs

    res_vals, res_lens = residual_slots(
        luma_dc, ac_zz, nnz, cdc, cac, cnnz,
        cbp_l, cbp_c, intra_mask, mbw, mbh)
    hv, hl = dheader.header_slots_b(bmode, is_skip, mvd0, mvd1,
                                    cbp_l, cbp_c, qp, t8_mode=t8_mode,
                                    intra=intra_mask, i16_mode=i16_mode,
                                    chroma_mode=chroma_mode)
    words, nbits = pack_tokens(jnp.concatenate([hv, res_vals], axis=1),
                               jnp.concatenate([hl, res_lens], axis=1),
                               n_words)
    outs.update(
        words=words, nbits=nbits,
        host_blob=jnp.concatenate(
            [jax.lax.bitcast_convert_type(words, jnp.int32),
             nbits[:, None], mb_class[:, None],
             jnp.minimum(cost0, cost1)[:, None]], axis=1))
    return outs
