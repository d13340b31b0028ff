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

from x264_tpu.bitstream.tables import CHROMA_QP_TABLE
from x264_tpu.models.residual_device import encode_chroma, encode_i16_luma
from x264_tpu.ops.device import header as dheader
from x264_tpu.ops.device.bitpack import pack_tokens
from x264_tpu.ops.device.cavlc import residual_slots
from x264_tpu.models.syntax import MB_I16, empty_syntax
from x264_tpu.ops.device import pixel as P
from x264_tpu.ops.device import predict as PR

_CHROMA_QP = jnp.asarray(CHROMA_QP_TABLE.astype(np.int32))
_BIG = jnp.int32(1 << 30)


def _gather_rowslice(plane, y0, x0, w):
    """dynamic_slice a (1,w) row at traced (y0,x0), vmapped over lanes."""
    return jax.lax.dynamic_slice(plane, (y0, x0), (1, w))[0]


def _gather_colslice(plane, y0, x0, h):
    return jax.lax.dynamic_slice(plane, (y0, x0), (h, 1))[:, 0]


def _gather_block(plane, y0, x0, s):
    return jax.lax.dynamic_slice(plane, (y0, x0), (s, s))


@functools.partial(jax.jit,
                   static_argnames=("mbw", "mbh", "cqp_off", "n_words",
                                    "entropy", "lv_cap"))
def i_frame_core(y, u, v, qp, mbw: int, mbh: int, cqp_off: int,
                 n_words: int = 32, entropy: str = "cavlc",
                 lv_cap: int = 64):
    """All-device I-frame pipeline.  Returns per-MB syntax tensors (raster
    MB order) + recon planes (pre-deblock)."""
    n = mbw * mbh
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
        recon, dc_zz, ac_zz, nnz, cbp_l = encode_i16_luma(src, pred, qp[mb_c])

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
            csrc_u, csrc_v, cpred_u, cpred_v, qpc[mb_c], intra=True)

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


def encode_iframe_device(y, u, v, qp, chroma_qp_offset: int = 0):
    """Host wrapper, drop-in for intra_frame.encode_iframe (qp scalar or
    per-MB array)."""
    h, w = y.shape
    mbw, mbh = w // 16, h // 16
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
