"""I-frame device model: wavefront-batched I16x16 + chroma encoding.

Intra prediction consumes *reconstructed* neighbors, so the frame is a
wavefront: every MB on anti-diagonal d = mbx + mby depends only on
diagonals < d.  The device program is a lax.scan over diagonals; each step
encodes all (<= min(mbw, mbh)) MBs of one diagonal as a batch — the
TPU-first replacement for x264's serial MB raster with neighbor cache
(reference common/macroblock.c cache_load / encoder/analyse.c
mb_analyse_intra).  Bit-exact vs the NumPy tier (wavefront order is
equivalence-preserving: each MB reads only finalized neighbor pixels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x264_tpu.utils.aotcache import aot_jit

from x264_tpu.bitstream.tables import CHROMA_QP_TABLE
from x264_tpu.models.residual_device import encode_chroma, encode_i16_luma
from x264_tpu.ops.device import header as dheader
from x264_tpu.ops.device.bitpack import pack_tokens
from x264_tpu.ops.device.cavlc import residual_slots
from x264_tpu.models.syntax import MB_I4, MB_I16, empty_syntax
from x264_tpu.ops.device import pixel as P
from x264_tpu.ops.device import predict as PR
from x264_tpu.ops.device import transform as T

_CHROMA_QP = jnp.asarray(CHROMA_QP_TABLE.astype(np.int32))
_BIG = jnp.int32(1 << 30)


def _gather_rowslice(plane, y0, x0, w):
    """dynamic_slice a (1,w) row at traced (y0,x0), vmapped over lanes."""
    return jax.lax.dynamic_slice(plane, (y0, x0), (1, w))[0]


def _gather_colslice(plane, y0, x0, h):
    return jax.lax.dynamic_slice(plane, (y0, x0), (h, 1))[:, 0]


def _gather_block(plane, y0, x0, s):
    return jax.lax.dynamic_slice(plane, (y0, x0), (s, s))


@aot_jit(static_argnames=("mbw", "mbh", "cqp_off", "n_words",
                          "entropy", "lv_cap"))
def i_frame_core(y, u, v, qp, mbw: int, mbh: int, cqp_off: int,
                 n_words: int = 32, entropy: str = "cavlc",
                 lv_cap: int = 64, trellis_tbl=None):
    """All-device I-frame pipeline.  Returns per-MB syntax tensors (raster
    MB order) + recon planes (pre-deblock).  trellis_tbl: the
    frame_trellis bundle — RD-optimal I16-AC (cat 1) + chroma-AC (cat 4)
    levels, x264's trellis=1 intra scope (rdo.c quant_trellis)."""
    n = mbw * mbh
    tr16 = trc = None
    if trellis_tbl is not None:
        tr16 = (trellis_tbl[3], trellis_tbl[2])
        trc = (trellis_tbl[4], trellis_tbl[2])
    d_lanes = min(mbw, mbh)
    n_diag = mbw + mbh - 1
    qp = jnp.broadcast_to(jnp.asarray(qp, jnp.int32).reshape(-1), (n,))
    qpc = _CHROMA_QP[jnp.clip(qp + cqp_off, 0, 51)]

    ysrc = y.astype(jnp.int32)
    usrc = u.astype(jnp.int32)
    vsrc = v.astype(jnp.int32)

    lane = jnp.arange(d_lanes, dtype=jnp.int32)
    r16 = jnp.arange(16, dtype=jnp.int32)
    r8 = jnp.arange(8, dtype=jnp.int32)

    acc0 = dict(
        i16_mode=jnp.zeros(n, jnp.int32),
        chroma_mode=jnp.zeros(n, jnp.int32),
        cbp_luma=jnp.zeros(n, jnp.int32),
        cbp_chroma=jnp.zeros(n, jnp.int32),
        luma_dc=jnp.zeros((n, 16), jnp.int32),
        luma_ac=jnp.zeros((n, 16, 16), jnp.int32),
        luma_nnz=jnp.zeros((n, 16), jnp.int32),
        chroma_dc=jnp.zeros((n, 2, 4), jnp.int32),
        chroma_ac=jnp.zeros((n, 2, 4, 16), jnp.int32),
        chroma_nnz=jnp.zeros((n, 2, 4), jnp.int32),
        mb_cost=jnp.zeros(n, jnp.int32),
    )
    ry0 = jnp.zeros_like(ysrc)
    ru0 = jnp.zeros_like(usrc)
    rv0 = jnp.zeros_like(vsrc)

    def step(carry, d):
        ry, ru, rv, acc = carry
        xmin = jnp.maximum(0, d - (mbh - 1))
        xs = xmin + lane                       # (D,) mbx per lane
        ys = d - xs                            # mby per lane
        valid = (xs < mbw) & (ys >= 0)
        at = valid & (ys > 0)
        al = valid & (xs > 0)
        atl = at & al

        y0, x0 = ys * 16, xs * 16
        # clamped neighbor coords (garbage where unavailable -> masked by avail)
        ytop = jnp.maximum(y0 - 1, 0)
        xleft = jnp.maximum(x0 - 1, 0)

        top = jax.vmap(lambda a, b: _gather_rowslice(ry, a, b, 16))(ytop, x0)
        left = jax.vmap(lambda a, b: _gather_colslice(ry, a, b, 16))(y0, xleft)
        tl = ry[ytop, xleft]
        src = jax.vmap(lambda a, b: _gather_block(ysrc, a, b, 16))(y0, x0)

        preds = PR.predict_16x16_all(top, left, tl, at, al)      # (D,4,16,16)
        avail = PR.i16x16_mode_avail(at, al, atl)
        costs = P.satd(src[:, None], preds)
        costs = jnp.where(avail, costs, _BIG)
        mode = jnp.argmin(costs, axis=1).astype(jnp.int32)
        mode_cost = jnp.min(costs, axis=1).astype(jnp.int32)
        pred = jnp.take_along_axis(
            preds, mode[:, None, None, None], axis=1)[:, 0]

        mb_c = jnp.where(valid, ys * mbw + xs, 0)
        recon, dc_zz, ac_zz, nnz, cbp_l = encode_i16_luma(
            src, pred, qp[mb_c], trellis=tr16)

        # ---- chroma ----
        cy0, cx0 = ys * 8, xs * 8
        cytop = jnp.maximum(cy0 - 1, 0)
        cxleft = jnp.maximum(cx0 - 1, 0)
        ctop_u = jax.vmap(lambda a, b: _gather_rowslice(ru, a, b, 8))(cytop, cx0)
        ctop_v = jax.vmap(lambda a, b: _gather_rowslice(rv, a, b, 8))(cytop, cx0)
        cleft_u = jax.vmap(lambda a, b: _gather_colslice(ru, a, b, 8))(cy0, cxleft)
        cleft_v = jax.vmap(lambda a, b: _gather_colslice(rv, a, b, 8))(cy0, cxleft)
        ctl_u = ru[cytop, cxleft]
        ctl_v = rv[cytop, cxleft]
        csrc_u = jax.vmap(lambda a, b: _gather_block(usrc, a, b, 8))(cy0, cx0)
        csrc_v = jax.vmap(lambda a, b: _gather_block(vsrc, a, b, 8))(cy0, cx0)

        cpreds_u = PR.predict_chroma_all(ctop_u, cleft_u, ctl_u, at, al)
        cpreds_v = PR.predict_chroma_all(ctop_v, cleft_v, ctl_v, at, al)
        cavail = PR.chroma_mode_avail(at, al, atl)
        ccosts = (P.satd(csrc_u[:, None], cpreds_u)
                  + P.satd(csrc_v[:, None], cpreds_v))
        ccosts = jnp.where(cavail, ccosts, _BIG)
        cmode = jnp.argmin(ccosts, axis=1).astype(jnp.int32)
        cpred_u = jnp.take_along_axis(
            cpreds_u, cmode[:, None, None, None], axis=1)[:, 0]
        cpred_v = jnp.take_along_axis(
            cpreds_v, cmode[:, None, None, None], axis=1)[:, 0]

        cr_u, cr_v, cdc, cac, cnnz, cbp_c = encode_chroma(
            csrc_u, csrc_v, cpred_u, cpred_v, qpc[mb_c], intra=True,
            trellis=trc)

        # ---- scatter recon (OOB-dropped for invalid lanes) ----
        oobl = jnp.where(valid, y0, jnp.int32(n * 16))
        yy = oobl[:, None, None] + r16[None, :, None]
        xx = x0[:, None, None] + r16[None, None, :]
        ry = ry.at[yy, xx].set(recon, mode="drop")
        oobc = jnp.where(valid, cy0, jnp.int32(n * 8))
        cyy = oobc[:, None, None] + r8[None, :, None]
        cxx = cx0[:, None, None] + r8[None, None, :]
        ru = ru.at[cyy, cxx].set(cr_u, mode="drop")
        rv = rv.at[cyy, cxx].set(cr_v, mode="drop")

        # ---- scatter syntax at flat MB index ----
        mb = jnp.where(valid, ys * mbw + xs, jnp.int32(n))
        acc = dict(
            i16_mode=acc["i16_mode"].at[mb].set(mode, mode="drop"),
            chroma_mode=acc["chroma_mode"].at[mb].set(cmode, mode="drop"),
            cbp_luma=acc["cbp_luma"].at[mb].set(cbp_l, mode="drop"),
            cbp_chroma=acc["cbp_chroma"].at[mb].set(cbp_c, mode="drop"),
            luma_dc=acc["luma_dc"].at[mb].set(dc_zz, mode="drop"),
            luma_ac=acc["luma_ac"].at[mb].set(ac_zz, mode="drop"),
            luma_nnz=acc["luma_nnz"].at[mb].set(nnz, mode="drop"),
            chroma_dc=acc["chroma_dc"].at[mb].set(cdc, mode="drop"),
            chroma_ac=acc["chroma_ac"].at[mb].set(cac, mode="drop"),
            chroma_nnz=acc["chroma_nnz"].at[mb].set(cnnz, mode="drop"),
            mb_cost=acc["mb_cost"].at[mb].set(mode_cost, mode="drop"),
        )
        return (ry, ru, rv, acc), None

    (ry, ru, rv, acc), _ = jax.lax.scan(
        step, (ry0, ru0, rv0, acc0),
        jnp.arange(n_diag, dtype=jnp.int32))

    out = dict(acc)
    mb_class = jnp.full(n, dheader.MB_I16_D, jnp.int32)
    if entropy == "cabac":
        from x264_tpu.ops.device.entropy_pack import cabac_blob
        out["mb_class"] = mb_class
        out["host_blob"] = cabac_blob(
            acc["luma_dc"], acc["luma_ac"], acc["chroma_dc"],
            acc["chroma_ac"], mb_class, jnp.zeros((n, 2), jnp.int32),
            acc["i16_mode"], acc["chroma_mode"], acc["cbp_luma"],
            acc["cbp_chroma"], qp, acc["mb_cost"], jnp.zeros(n, jnp.int32),
            K=lv_cap)
        out["recon_y"] = ry.astype(jnp.uint8)
        out["recon_u"] = ru.astype(jnp.uint8)
        out["recon_v"] = rv.astype(jnp.uint8)
        out["qp_mb"] = qp
        return out
    out["res_vals"], out["res_lens"] = residual_slots(
        acc["luma_dc"], acc["luma_ac"], acc["luma_nnz"],
        acc["chroma_dc"], acc["chroma_ac"], acc["chroma_nnz"],
        acc["cbp_luma"], acc["cbp_chroma"],
        jnp.ones(n, bool), mbw, mbh)

    hv, hl = dheader.header_slots(
        mb_class, acc["i16_mode"], acc["chroma_mode"],
        jnp.zeros((n, 2), jnp.int32), acc["cbp_luma"], acc["cbp_chroma"],
        qp, is_p_slice=False)
    out["words"], out["nbits"] = pack_tokens(
        jnp.concatenate([hv, out["res_vals"]], axis=1),
        jnp.concatenate([hl, out["res_lens"]], axis=1), n_words)
    out["mb_class"] = mb_class
    out["host_blob"] = jnp.concatenate(
        [jax.lax.bitcast_convert_type(out["words"], jnp.int32),
         out["nbits"][:, None], mb_class[:, None],
         acc["mb_cost"][:, None]], axis=1)
    out["recon_y"] = ry.astype(jnp.uint8)
    out["recon_u"] = ru.astype(jnp.uint8)
    out["recon_v"] = rv.astype(jnp.uint8)
    out["qp_mb"] = qp
    return out


# ---- I4x4-capable core -----------------------------------------------------
# Knight-order sub-steps of the 16 4x4 blocks inside an MB: s = x4 + 2*y4.
# Left/top/top-right recon dependencies (z-scan availability, 8.3.1.2.1)
# all point to earlier sub-steps, so each sub-step's 1-2 blocks batch
# across every MB of the outer diagonal.
_SUBSTEPS = [[(0, 0)], [(1, 0)], [(2, 0), (0, 1)], [(3, 0), (1, 1)],
             [(2, 1), (0, 2)], [(3, 1), (1, 2)], [(2, 2), (0, 3)],
             [(3, 2), (1, 3)], [(2, 3)], [(3, 3)]]


def _z4(x4: int, y4: int) -> int:
    return 8 * (y4 >> 1) + 4 * (x4 >> 1) + 2 * (y4 & 1) + (x4 & 1)


# raster 4x4 cell -> coded (zigzag-of-quadrant) cell for the 8x8
# transform's CAVLC-interleave layout (same map as residual_device._R2C)
_R2C_I8 = jnp.asarray(np.argsort(np.array(
    [0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15])).astype(np.int32))


@aot_jit(static_argnames=("mbw", "mbh", "cqp_off",
                          "entropy", "lv_cap", "t8_mode"))
def i4_frame_core(y, u, v, qp, lam, mbw: int, mbh: int, cqp_off: int,
                  entropy: str = "syntax", lv_cap: int = 96,
                  t8_mode: bool = False, trellis_tbl=None):
    """All-device I-frame pipeline with per-MB I16x16-vs-I4x4 decision
    (reference encoder/analyse.c mb_analyse_intra + macroblock.c
    x264_mb_encode_i4x4).  The MB wavefront runs in KNIGHT order
    (d = mbx + 2*mby) because I4x4 consumes the above-RIGHT MB's bottom
    row — the same dependency that makes x264's threaded wavefront use
    this order.  Returns per-MB syntax tensors (host entropy path).
    trellis_tbl: RD-optimal I16-AC + chroma-AC levels (the I4/I8 block
    paths stay deadzone — their per-substep batches are too small for
    the DP to pay)."""
    n = mbw * mbh
    tr16 = trc = None
    if trellis_tbl is not None:
        tr16 = (trellis_tbl[3], trellis_tbl[2])
        trc = (trellis_tbl[4], trellis_tbl[2])
    d_lanes = min(mbh, (mbw + 1) // 2 + 1)
    n_diag = mbw + 2 * mbh - 2
    qp = jnp.broadcast_to(jnp.asarray(qp, jnp.int32).reshape(-1), (n,))
    qpc = _CHROMA_QP[jnp.clip(qp + cqp_off, 0, 51)]
    lam = jnp.asarray(lam, jnp.int32)

    ysrc = y.astype(jnp.int32)
    usrc = u.astype(jnp.int32)
    vsrc = v.astype(jnp.int32)

    lane = jnp.arange(d_lanes, dtype=jnp.int32)
    r16 = jnp.arange(16, dtype=jnp.int32)
    r8 = jnp.arange(8, dtype=jnp.int32)
    r4 = jnp.arange(4, dtype=jnp.int32)

    acc0 = dict(
        mb_class=jnp.zeros(n, jnp.int32),
        i16_mode=jnp.zeros(n, jnp.int32),
        i4_modes=jnp.zeros((n, 16), jnp.int32),
        chroma_mode=jnp.zeros(n, jnp.int32),
        cbp_luma=jnp.zeros(n, jnp.int32),
        cbp_chroma=jnp.zeros(n, jnp.int32),
        luma_dc=jnp.zeros((n, 16), jnp.int32),
        luma_ac=jnp.zeros((n, 16, 16), jnp.int32),
        luma_nnz=jnp.zeros((n, 16), jnp.int32),
        chroma_dc=jnp.zeros((n, 2, 4), jnp.int32),
        chroma_ac=jnp.zeros((n, 2, 4, 16), jnp.int32),
        chroma_nnz=jnp.zeros((n, 2, 4), jnp.int32),
        mb_cost=jnp.zeros(n, jnp.int32),
        t8=jnp.zeros(n, bool),
    )
    ry0 = jnp.zeros_like(ysrc)
    ru0 = jnp.zeros_like(usrc)
    rv0 = jnp.zeros_like(vsrc)
    # per-4x4-block chosen-mode grid (predIntra4x4PredMode chain):
    # -1 unavailable, 2 for blocks of non-I4x4 MBs
    grid0 = jnp.full((4 * mbh, 4 * mbw), -1, jnp.int32)

    def step(carry, d):
        ry, ru, rv, grid, acc = carry
        jmin = jnp.maximum(0, (d - mbw + 2) // 2)
        ys = jmin + lane                       # (D,) mby per lane
        xs = d - 2 * ys                        # mbx per lane
        valid = (xs >= 0) & (xs < mbw) & (ys < mbh)
        at = valid & (ys > 0)
        al = valid & (xs > 0)
        atl = at & al

        y0 = jnp.where(valid, ys, 0) * 16
        x0 = jnp.where(valid, xs, 0) * 16
        ytop = jnp.maximum(y0 - 1, 0)
        xleft = jnp.maximum(x0 - 1, 0)

        top = jax.vmap(lambda a, b: _gather_rowslice(ry, a, b, 16))(ytop, x0)
        left = jax.vmap(lambda a, b: _gather_colslice(ry, a, b, 16))(y0, xleft)
        tl = ry[ytop, xleft]
        src = jax.vmap(lambda a, b: _gather_block(ysrc, a, b, 16))(y0, x0)

        preds = PR.predict_16x16_all(top, left, tl, at, al)
        avail = PR.i16x16_mode_avail(at, al, atl)
        costs = P.satd(src[:, None], preds)
        costs = jnp.where(avail, costs, _BIG)
        mode16 = jnp.argmin(costs, axis=1).astype(jnp.int32)
        cost16 = jnp.min(costs, axis=1).astype(jnp.int32)
        pred16 = jnp.take_along_axis(
            preds, mode16[:, None, None, None], axis=1)[:, 0]

        mb_c = jnp.where(valid, ys * mbw + xs, 0)
        qp_l = qp[mb_c]
        rec16, dc_zz, ac16_zz, nnz16, cbp16 = encode_i16_luma(
            src, pred16, qp_l, trellis=tr16)

        # ---- true-cost luma-size arbitration (round 5) ----
        # The I16-vs-I4x4-vs-I8x8 choice used to compare prediction
        # SATDs, which is blind to the transform-size coding gain (the
        # whole point of I8x8 on smooth content: x264 codes ~87% of I
        # MBs as I8x8 on the bench clip, this core picked ~8%).  All
        # three candidates are encoded anyway, so arbitrate like
        # select_transform_8x8: J = recon SSD + lambda2 * rate proxy
        # (reference analyse.c intra_rd_refine's role, done batched).
        lam2 = jnp.maximum(lam * lam * 9 // 10, jnp.int32(1))

        def _rate_proxy(lv):
            a = jnp.abs(lv.reshape(lv.shape[0], -1).astype(jnp.int32))
            nbits = jnp.zeros_like(a)
            for kbit in range(14):
                nbits = nbits + (a >= (1 << kbit)).astype(jnp.int32)
            return (2 * nbits + (a > 0).astype(jnp.int32)).sum(-1)

        j16 = (P.ssd(src, rec16)
               + lam2 * (_rate_proxy(dc_zz) + _rate_proxy(ac16_zz) + 8))

        # ---- I4x4 candidate (writes blocks into ry as it goes; the
        # I16x16 winner overwrites the whole MB afterwards) ----
        cost4 = jnp.full(xs.shape, 24, jnp.int32) * lam   # x264 i4x4 const
        ssd4_acc = jnp.zeros(xs.shape, jnp.int32)
        rb4_acc = jnp.full(xs.shape, 24, jnp.int32)   # header-cost const
        modes4 = jnp.zeros((d_lanes, 16), jnp.int32)
        acs4 = jnp.zeros((d_lanes, 16, 16), jnp.int32)
        nnzs4 = jnp.zeros((d_lanes, 16), jnp.int32)
        at_mb, al_mb = at, al
        H16, W16 = 16 * mbh, 16 * mbw
        for blocks in _SUBSTEPS:
            for (x4, y4) in blocks:
                r = 4 * y4 + x4
                by, bx = y0 + 4 * y4, x0 + 4 * x4
                a4 = valid if y4 > 0 else at_mb
                l4 = valid if x4 > 0 else al_mb
                if y4 > 0 and x4 > 0:
                    tl4 = valid
                elif y4 > 0:
                    tl4 = al_mb
                elif x4 > 0:
                    tl4 = at_mb
                else:
                    tl4 = at_mb & al_mb
                if y4 == 0 and x4 < 3:
                    tr4 = at_mb
                elif y4 == 0:
                    tr4 = at_mb & (xs < mbw - 1)
                elif x4 < 3 and _z4(x4 + 1, y4 - 1) < _z4(x4, y4):
                    tr4 = valid
                else:
                    tr4 = jnp.zeros_like(valid)
                byt = jnp.maximum(by - 1, 0)
                bxl = jnp.maximum(bx - 1, 0)
                topa = jax.vmap(
                    lambda a, b: _gather_rowslice(ry, a, b, 4))(byt, bx)
                topb = jax.vmap(
                    lambda a, b: _gather_rowslice(ry, a, b, 4))(
                        byt, jnp.minimum(bx + 4, W16 - 4))
                top8 = jnp.concatenate([topa, topb], axis=1)
                left4 = jax.vmap(
                    lambda a, b: _gather_colslice(ry, a, b, 4))(by, bxl)
                tlp = ry[byt, bxl]
                p4 = PR.predict_4x4_all(top8, left4, tlp, a4, l4, tr4)
                av4 = PR.i4x4_mode_avail(a4, l4, tl4)
                gy, gx = ys * 4 + y4, xs * 4 + x4
                lm = jnp.where(gx > 0, grid[gy, jnp.maximum(gx - 1, 0)], -1)
                tm = jnp.where(gy > 0, grid[jnp.maximum(gy - 1, 0), gx], -1)
                pmode = jnp.where((lm < 0) | (tm < 0), 2,
                                  jnp.minimum(lm, tm))
                src4 = src[:, 4 * y4:4 * y4 + 4, 4 * x4:4 * x4 + 4]
                mbits = jnp.where(
                    jnp.arange(9)[None] == pmode[:, None], 1, 4)
                c4 = P.satd(src4[:, None], p4) + lam * mbits
                c4 = jnp.where(av4, c4, _BIG)
                m4 = jnp.argmin(c4, axis=1).astype(jnp.int32)
                bc4 = jnp.min(c4, axis=1).astype(jnp.int32)
                psel = jnp.take_along_axis(
                    p4, m4[:, None, None, None], axis=1)[:, 0]
                lv = T.quant4x4(T.dct4x4(src4 - psel), qp_l, intra=True)
                nnz_b = jnp.count_nonzero(
                    lv.reshape(-1, 16), axis=1).astype(jnp.int32)
                rec4 = jnp.clip(psel + T.idct4x4(T.dequant4x4(lv, qp_l)),
                                0, 255)
                mb4_sel = jnp.take_along_axis(
                    jnp.broadcast_to(mbits, (d_lanes, 9)),
                    m4[:, None], axis=1)[:, 0]
                sb = src4 - rec4
                ssd4_acc = ssd4_acc + jnp.where(
                    valid, (sb * sb).sum((1, 2)), 0)
                rb4_acc = rb4_acc + jnp.where(
                    valid, _rate_proxy(lv.reshape(-1, 16)) + mb4_sel, 0)
                oob = jnp.where(valid, by, jnp.int32(H16))
                yy4 = oob[:, None, None] + r4[None, :, None]
                xx4 = bx[:, None, None] + r4[None, None, :]
                ry = ry.at[yy4, xx4].set(rec4.astype(ry.dtype), mode="drop")
                goob = jnp.where(valid, gy, jnp.int32(4 * mbh))
                grid = grid.at[goob, gx].set(m4, mode="drop")
                cost4 = cost4 + jnp.where(valid, bc4, 0)
                modes4 = modes4.at[:, r].set(m4)
                acs4 = acs4.at[:, r].set(T.zigzag(lv))
                nnzs4 = nnzs4.at[:, r].set(jnp.where(valid, nnz_b, 0))

        qgrid = (nnzs4.reshape(d_lanes, 2, 2, 2, 2) > 0).any((2, 4))
        cbp4 = (qgrid[:, 0, 0] * 1 + qgrid[:, 0, 1] * 2
                + qgrid[:, 1, 0] * 4 + qgrid[:, 1, 1] * 8).astype(jnp.int32)

        # ---- I8x8 candidate (8.3.2: filtered-edge prediction + the
        # High-profile 8x8 transform; reference encoder/analyse.c
        # mb_analyse_intra's i8x8 arm).  The 4 blocks run sequentially
        # batched over the diagonal; intra-MB neighbour pixels come from
        # the candidate's own recon TILE (ry holds the I4 trial), MB-
        # external ones from ry. ----
        if t8_mode:
            i8tile = jnp.zeros((d_lanes, 16, 16), jnp.int32)
            cost8t = jnp.full(xs.shape, 24, jnp.int32) * lam
            ssd8_acc = jnp.zeros(xs.shape, jnp.int32)
            rb8_acc = jnp.full(xs.shape, 24, jnp.int32)
            modes8 = jnp.zeros((d_lanes, 4), jnp.int32)
            lv64s = jnp.zeros((d_lanes, 4, 64), jnp.int32)
            notlast = xs < (mbw - 1)
            for b8 in range(4):
                x8, y8 = b8 & 1, b8 >> 1
                by, bx = y0 + 8 * y8, x0 + 8 * x8
                if b8 == 0:
                    a_t, a_l, a_tl, a_tr = at, al, atl, at
                elif b8 == 1:
                    a_t, a_l, a_tl, a_tr = at, valid, at, at & notlast
                elif b8 == 2:
                    a_t, a_l, a_tl, a_tr = valid, al, al, valid
                else:
                    a_t, a_l, a_tl = valid, valid, valid
                    a_tr = jnp.zeros_like(valid)
                if y8 == 0:
                    byt = jnp.maximum(by - 1, 0)
                    topa = jax.vmap(
                        lambda a, b: _gather_rowslice(ry, a, b, 8))(byt, bx)
                    topb = jax.vmap(
                        lambda a, b: _gather_rowslice(ry, a, b, 8))(
                            byt, jnp.minimum(bx + 8, W16 - 8))
                    top16 = jnp.concatenate([topa, topb], axis=1)
                    tl8 = ry[byt, jnp.maximum(bx - 1, 0)]
                else:
                    rowt = i8tile[:, 7, :]
                    if x8 == 0:
                        top16 = rowt
                        tl8 = ry[jnp.maximum(by - 1, 0),
                                 jnp.maximum(x0 - 1, 0)]
                    else:
                        top16 = jnp.concatenate(
                            [rowt[:, 8:16], rowt[:, 8:16]], axis=1)
                        tl8 = i8tile[:, 7, 7]
                if x8 == 0:
                    left8 = jax.vmap(
                        lambda a, b: _gather_colslice(ry, a, b, 8))(
                            by, jnp.maximum(bx - 1, 0))
                else:
                    left8 = i8tile[:, 8 * y8:8 * y8 + 8, 7]
                preds8 = PR.predict_8x8_all(top16, left8, tl8,
                                            a_t, a_l, a_tl, a_tr)
                av8 = PR.i8x8_mode_avail(a_t, a_l, a_tl)
                gy8 = ys * 4 + 2 * y8
                gx8 = xs * 4 + 2 * x8
                if b8 == 0:
                    lm8 = jnp.where(gx8 > 0,
                                    grid[gy8, jnp.maximum(gx8 - 1, 0)], -1)
                    tm8 = jnp.where(gy8 > 0,
                                    grid[jnp.maximum(gy8 - 1, 0), gx8], -1)
                elif b8 == 1:
                    lm8 = modes8[:, 0]
                    tm8 = jnp.where(gy8 > 0,
                                    grid[jnp.maximum(gy8 - 1, 0), gx8], -1)
                elif b8 == 2:
                    lm8 = jnp.where(gx8 > 0,
                                    grid[gy8, jnp.maximum(gx8 - 1, 0)], -1)
                    tm8 = modes8[:, 0]
                else:
                    lm8 = modes8[:, 2]
                    tm8 = modes8[:, 1]
                pmode8 = jnp.where((lm8 < 0) | (tm8 < 0), 2,
                                   jnp.minimum(lm8, tm8))
                src8 = src[:, 8 * y8:8 * y8 + 8, 8 * x8:8 * x8 + 8]
                mbits8 = jnp.where(
                    jnp.arange(9)[None] == pmode8[:, None], 1, 4)
                c8 = P.satd(src8[:, None], preds8) + lam * mbits8
                c8 = jnp.where(av8, c8, _BIG)
                m8 = jnp.argmin(c8, axis=1).astype(jnp.int32)
                bc8 = jnp.min(c8, axis=1).astype(jnp.int32)
                psel8 = jnp.take_along_axis(
                    preds8, m8[:, None, None, None], axis=1)[:, 0]
                lv8b = T.quant8x8(T.dct8x8(src8 - psel8), qp_l, intra=True)
                rec8b = jnp.clip(
                    psel8 + T.idct8x8(T.dequant8x8(lv8b, qp_l)), 0, 255)
                mb8_sel = jnp.take_along_axis(
                    jnp.broadcast_to(mbits8, (d_lanes, 9)),
                    m8[:, None], axis=1)[:, 0]
                sb8 = src8 - rec8b
                ssd8_acc = ssd8_acc + jnp.where(
                    valid, (sb8 * sb8).sum((1, 2)), 0)
                rb8_acc = rb8_acc + jnp.where(
                    valid, _rate_proxy(lv8b.reshape(-1, 64)) + mb8_sel, 0)
                i8tile = i8tile.at[:, 8 * y8:8 * y8 + 8,
                                   8 * x8:8 * x8 + 8].set(rec8b)
                lv64s = lv64s.at[:, b8].set(T.zigzag8(lv8b))
                modes8 = modes8.at[:, b8].set(m8)
                cost8t = cost8t + jnp.where(valid, bc8, 0)
            nz8q = jnp.count_nonzero(lv64s, axis=2).astype(jnp.int32)
            cbp8 = ((nz8q > 0).astype(jnp.int32)
                    * (1 << jnp.arange(4, dtype=jnp.int32))[None]).sum(1)
            # CAVLC-interleave cell layout (matches encode_p_luma_t8 /
            # native gather_t8_levels): cell i4 of quadrant q8 holds
            # zigzag-64 positions 4*k + i4, cells raster-block-major
            inter8 = lv64s.reshape(d_lanes, 4, 16, 4).transpose(0, 1, 3, 2)
            cells8 = inter8.reshape(d_lanes, 16, 16)[:, _R2C_I8]
            nnz8c = jnp.count_nonzero(cells8, axis=2).astype(jnp.int32)

        j4 = ssd4_acc + lam2 * rb4_acc
        best4 = j4 < j16
        cost_n = jnp.minimum(j4, j16)
        if t8_mode:
            j8 = ssd8_acc + lam2 * rb8_acc
            sel8x8 = valid & (j8 < cost_n)
        else:
            sel8x8 = jnp.zeros_like(valid)
        sel4 = valid & best4 & ~sel8x8

        # I16 winners overwrite the I4 trial recon + mode grid
        oobl = jnp.where(valid & ~sel4 & ~sel8x8, y0, jnp.int32(H16))
        yy = oobl[:, None, None] + r16[None, :, None]
        xx = x0[:, None, None] + r16[None, None, :]
        ry = ry.at[yy, xx].set(rec16.astype(ry.dtype), mode="drop")
        g_oob = jnp.where(valid & ~sel4 & ~sel8x8, ys * 4,
                          jnp.int32(4 * mbh))
        gyy = g_oob[:, None, None] + r4[None, :, None]
        gxx = (xs * 4)[:, None, None] + r4[None, None, :]
        grid = grid.at[gyy, gxx].set(2, mode="drop")
        if t8_mode:
            # I8x8 winners overwrite recon + grid (modes replicated to
            # the quadrant's 4 cells — 8.3.2.1's Intra4x4PredMode map)
            oob8 = jnp.where(sel8x8, y0, jnp.int32(H16))
            yy8 = oob8[:, None, None] + r16[None, :, None]
            ry = ry.at[yy8, xx].set(i8tile.astype(ry.dtype), mode="drop")
            g_oob8 = jnp.where(sel8x8, ys * 4, jnp.int32(4 * mbh))
            gyy8 = g_oob8[:, None, None] + r4[None, :, None]
            quad_of_cell = jnp.asarray(
                ((np.arange(16) // 4 // 2) * 2
                 + (np.arange(16) % 4) // 2).astype(np.int32))
            gmodes = jnp.take_along_axis(
                modes8, jnp.broadcast_to(quad_of_cell[None],
                                         (d_lanes, 16)), axis=1
            ).reshape(d_lanes, 4, 4)
            grid = grid.at[gyy8, gxx].set(gmodes, mode="drop")

        # ---- chroma (identical for both luma choices) ----
        cy0, cx0 = y0 // 2, x0 // 2
        cytop = jnp.maximum(cy0 - 1, 0)
        cxleft = jnp.maximum(cx0 - 1, 0)
        ctop_u = jax.vmap(lambda a, b: _gather_rowslice(ru, a, b, 8))(cytop, cx0)
        ctop_v = jax.vmap(lambda a, b: _gather_rowslice(rv, a, b, 8))(cytop, cx0)
        cleft_u = jax.vmap(lambda a, b: _gather_colslice(ru, a, b, 8))(cy0, cxleft)
        cleft_v = jax.vmap(lambda a, b: _gather_colslice(rv, a, b, 8))(cy0, cxleft)
        ctl_u = ru[cytop, cxleft]
        ctl_v = rv[cytop, cxleft]
        csrc_u = jax.vmap(lambda a, b: _gather_block(usrc, a, b, 8))(cy0, cx0)
        csrc_v = jax.vmap(lambda a, b: _gather_block(vsrc, a, b, 8))(cy0, cx0)

        cpreds_u = PR.predict_chroma_all(ctop_u, cleft_u, ctl_u, at, al)
        cpreds_v = PR.predict_chroma_all(ctop_v, cleft_v, ctl_v, at, al)
        cavail = PR.chroma_mode_avail(at, al, atl)
        ccosts = (P.satd(csrc_u[:, None], cpreds_u)
                  + P.satd(csrc_v[:, None], cpreds_v))
        ccosts = jnp.where(cavail, ccosts, _BIG)
        cmode = jnp.argmin(ccosts, axis=1).astype(jnp.int32)
        cpred_u = jnp.take_along_axis(
            cpreds_u, cmode[:, None, None, None], axis=1)[:, 0]
        cpred_v = jnp.take_along_axis(
            cpreds_v, cmode[:, None, None, None], axis=1)[:, 0]

        cr_u, cr_v, cdc, cac, cnnz, cbp_c = encode_chroma(
            csrc_u, csrc_v, cpred_u, cpred_v, qpc[mb_c], intra=True,
            trellis=trc)

        oobc = jnp.where(valid, cy0, jnp.int32(8 * mbh))
        cyy = oobc[:, None, None] + r8[None, :, None]
        cxx = cx0[:, None, None] + r8[None, None, :]
        ru = ru.at[cyy, cxx].set(cr_u, mode="drop")
        rv = rv.at[cyy, cxx].set(cr_v, mode="drop")

        # ---- scatter per-MB syntax ----
        mb = jnp.where(valid, ys * mbw + xs, jnp.int32(n))
        zero16 = jnp.zeros_like(dc_zz)
        nxn = sel4 | sel8x8
        if t8_mode:
            modes_nxn = jnp.where(
                sel8x8[:, None],
                jnp.concatenate([modes8,
                                 jnp.zeros((d_lanes, 12), jnp.int32)], 1),
                modes4)
            ac_nxn = jnp.where(sel8x8[:, None, None], cells8, acs4)
            nnz_nxn = jnp.where(sel8x8[:, None], nnz8c, nnzs4)
            cbp_nxn = jnp.where(sel8x8, cbp8, cbp4)
            cost_nxn = jnp.where(sel8x8, cost8t, cost4)
        else:
            modes_nxn, ac_nxn = modes4, acs4
            nnz_nxn, cbp_nxn, cost_nxn = nnzs4, cbp4, cost4
        acc = dict(
            mb_class=acc["mb_class"].at[mb].set(
                jnp.where(nxn, 1, 0), mode="drop"),
            i16_mode=acc["i16_mode"].at[mb].set(
                jnp.where(nxn, 0, mode16), mode="drop"),
            i4_modes=acc["i4_modes"].at[mb].set(
                jnp.where(nxn[:, None], modes_nxn, -1), mode="drop"),
            chroma_mode=acc["chroma_mode"].at[mb].set(cmode, mode="drop"),
            cbp_luma=acc["cbp_luma"].at[mb].set(
                jnp.where(nxn, cbp_nxn, cbp16), mode="drop"),
            cbp_chroma=acc["cbp_chroma"].at[mb].set(cbp_c, mode="drop"),
            luma_dc=acc["luma_dc"].at[mb].set(
                jnp.where(nxn[:, None], zero16, dc_zz), mode="drop"),
            luma_ac=acc["luma_ac"].at[mb].set(
                jnp.where(nxn[:, None, None], ac_nxn, ac16_zz),
                mode="drop"),
            luma_nnz=acc["luma_nnz"].at[mb].set(
                jnp.where(nxn[:, None], nnz_nxn, nnz16), mode="drop"),
            chroma_dc=acc["chroma_dc"].at[mb].set(cdc, mode="drop"),
            chroma_ac=acc["chroma_ac"].at[mb].set(cac, mode="drop"),
            chroma_nnz=acc["chroma_nnz"].at[mb].set(cnnz, mode="drop"),
            mb_cost=acc["mb_cost"].at[mb].set(
                jnp.where(nxn, cost_nxn, cost16), mode="drop"),
            t8=acc["t8"].at[mb].set(sel8x8, mode="drop"),
        )
        return (ry, ru, rv, grid, acc), None

    (ry, ru, rv, _, acc), _ = jax.lax.scan(
        step, (ry0, ru0, rv0, grid0, acc0),
        jnp.arange(n_diag, dtype=jnp.int32))

    out = dict(acc)
    out["recon_y"] = ry.astype(jnp.uint8)
    out["recon_u"] = ru.astype(jnp.uint8)
    out["recon_v"] = rv.astype(jnp.uint8)
    out["qp_mb"] = qp
    if entropy == "cabac":
        # packed fast-path blob (entropy_pack layout + 2 trailing I_NxN
        # pred-mode nibble fields) — the host C coder consumes it directly
        from x264_tpu.ops.device.entropy_pack import cabac_blob
        out["host_blob"] = cabac_blob(
            acc["luma_dc"], acc["luma_ac"], acc["chroma_dc"],
            acc["chroma_ac"], acc["mb_class"],
            jnp.zeros((n, 2), jnp.int32), acc["i16_mode"],
            acc["chroma_mode"], acc["cbp_luma"], acc["cbp_chroma"],
            qp, acc["mb_cost"], jnp.zeros(n, jnp.int32), K=lv_cap,
            t8=acc["t8"] if t8_mode else None,
            i4_modes=acc["i4_modes"])
    return out


def encode_iframe_device(y, u, v, qp, chroma_qp_offset: int = 0,
                         i4x4: bool = False, lam: int = 0):
    """Host wrapper, drop-in for intra_frame.encode_iframe (qp scalar or
    per-MB array)."""
    h, w = y.shape
    mbw, mbh = w // 16, h // 16
    if i4x4:
        out = i4_frame_core(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                            np.asarray(qp, np.int32), np.int32(lam),
                            mbw=mbw, mbh=mbh, cqp_off=chroma_qp_offset)
        out = {k: np.asarray(val) for k, val in out.items()}
        syn = empty_syntax(mbw, mbh)
        syn.mb_class[:] = np.where(out["mb_class"] == 1, MB_I4, MB_I16)
        for k in ("i16_mode", "i4_modes", "chroma_mode", "cbp_luma",
                  "cbp_chroma", "luma_dc", "luma_ac", "luma_nnz",
                  "chroma_dc", "chroma_ac", "chroma_nnz"):
            getattr(syn, k)[:] = out[k]
        syn.mb_cost = out["mb_cost"].astype(np.int64)
        syn.qp[:] = out["qp_mb"]
        return out["recon_y"], out["recon_u"], out["recon_v"], syn
    out = i_frame_core(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                       np.asarray(qp, np.int32), mbw=mbw, mbh=mbh,
                       cqp_off=chroma_qp_offset)
    out = {k: np.asarray(val) for k, val in out.items()}

    syn = empty_syntax(mbw, mbh)
    syn.qp[:] = qp
    syn.mb_class[:] = MB_I16
    for k in ("i16_mode", "chroma_mode", "cbp_luma", "cbp_chroma",
              "luma_dc", "luma_ac", "luma_nnz",
              "chroma_dc", "chroma_ac", "chroma_nnz"):
        getattr(syn, k)[:] = out[k]
    syn.res_vals = out["res_vals"]
    syn.res_lens = out["res_lens"]
    syn.mb_cost = out["mb_cost"].astype(np.int64)
    syn.qp[:] = out["qp_mb"]
    return out["recon_y"], out["recon_u"], out["recon_v"], syn
