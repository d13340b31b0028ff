"""Device (JAX) motion compensation — index-array gathers over padded
reference planes (parity: reference common/mc.c): half-pel plane
computation (6-tap), quarter-pel sampling as branchless two-plane average,
fullpel luma MC, normative chroma 1/8-pel bilinear.

TPU-first structure mirrors x264's own: the 3 half-pel planes are computed
once per reference frame (x264 hpel_filter over the whole frame,
common/mc.c), making every quarter-pel position a pure gather + pairwise
average — and since (2a+1)>>1 == a, exact positions are the same gather
with both operands equal, so MC is entirely branch-free.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _filt6(a, b, c, d, e, f):
    return a - 5 * b + 20 * c + 20 * d - 5 * e + f


def hpel_planes(plane):
    """(H, W) int -> (4, H, W) int32 stacked [fp, hh, hv, hc]
    (bit-exact port of ops/reference/mc.hpel_planes with pad=4)."""
    pad = 4
    hgt, wid = plane.shape
    p = jnp.pad(plane.astype(jnp.int32), pad, mode="edge")

    bh_full = _filt6(p[:, :-5], p[:, 1:-4], p[:, 2:-3],
                     p[:, 3:-2], p[:, 4:-1], p[:, 5:])
    bh = bh_full[:, pad - 2: bh_full.shape[1] - pad + 3]
    hh = jnp.clip((bh[pad:-pad, :] + 16) >> 5, 0, 255)

    bv_full = _filt6(p[:-5, :], p[1:-4, :], p[2:-3, :],
                     p[3:-2, :], p[4:-1, :], p[5:, :])
    bv = bv_full[pad - 2: bv_full.shape[0] - pad + 3, :]
    hv = jnp.clip((bv[:, pad:-pad] + 16) >> 5, 0, 255)

    cc = _filt6(bh[:-5, :], bh[1:-4, :], bh[2:-3, :],
                bh[3:-2, :], bh[4:-1, :], bh[5:, :])
    cc = cc[pad - 2: cc.shape[0] - pad + 3, :]
    hc = jnp.clip((cc + 512) >> 10, 0, 255)

    return jnp.stack([plane.astype(jnp.int32), hh, hv, hc])


from x264_tpu.ops.reference.mc import QPEL_TWO_SAMPLE_TBL

_QP_TBL_J = jnp.asarray(QPEL_TWO_SAMPLE_TBL)


def _qp_tbl():
    return _QP_TBL_J


def mc_luma_qpel(planes4, mv, mbw: int, mbh: int, pad: int, ref_idx=None):
    """Quarter-pel MC for all MBs: planes4 (4, Hp, Wp) from hpel_planes on
    the padded reference — or stacked (K,4,Hp,Wp) with per-MB ref_idx;
    mv (N,2) qpel.  Returns (N,16,16) int32.

    One (N,18,18) packed-word window per MB via the one-hot MXU gather
    (wingather.py) replaces the two per-sample (N,16,16) gathers; the
    two-sample selection becomes 16 static-slice selects (plane x
    {0,1}^2 integer offsets of QPEL_TWO_SAMPLE_TBL)."""
    from x264_tpu.ops.device.wingather import gather_win18, pack_planes4

    n = mbw * mbh
    mby = jnp.arange(n, dtype=jnp.int32) // mbw
    mbx = jnp.arange(n, dtype=jnp.int32) % mbw
    ix, iy = mv[:, 0] >> 2, mv[:, 1] >> 2
    fx, fy = mv[:, 0] & 3, mv[:, 1] & 3
    y0 = pad + mby * 16 + iy - 1
    x0 = pad + mbx * 16 + ix - 1
    packed = pack_planes4(planes4)
    w32 = gather_win18(packed, y0, x0, mbw, mbh,
                       ref_idx=(None if planes4.ndim == 3
                                else ref_idx))[:, :, :18]
    w4 = [((w32 >> (8 * p)) & 0xFF).astype(jnp.int32) for p in range(4)]
    tbl = _qp_tbl()[fx, fy]                       # (N, 6)

    def sample(pp, dy, dx):
        out = jnp.zeros((n, 16, 16), jnp.int32)
        for p in range(4):
            for a in range(2):
                for b in range(2):
                    m = ((pp == p) & (dy == a) & (dx == b))[:, None, None]
                    out = jnp.where(m, w4[p][:, 1 + a:17 + a, 1 + b:17 + b],
                                    out)
        return out

    s1 = sample(tbl[:, 0], tbl[:, 1], tbl[:, 2])
    s2 = sample(tbl[:, 3], tbl[:, 4], tbl[:, 5])
    return (s1 + s2 + 1) >> 1


def mc_luma_qpel_quad(planes4, mv8, mbw: int, mbh: int, pad: int):
    """Quarter-pel MC at 8x8 quadrant granularity: mv8 (N,4,2) qpel mvs
    (quadrant q = 2*qy + qx).  Same two-sample selection over 10x10
    windows; bit-identical to mc_luma_qpel when all quads share one mv
    (the samples are pure functions of absolute position + mv).  Used by
    the quad-grain temporal direct path (8.4.1.2.2 with
    direct_8x8_inference_flag = 1).  Returns (N,16,16) int32."""
    from x264_tpu.ops.device.wingather import gather_win, pack_planes4

    n = mbw * mbh
    m = 4 * n
    mvf = mv8.reshape(m, 2)
    mby = jnp.arange(n, dtype=jnp.int32) // mbw
    mbx = jnp.arange(n, dtype=jnp.int32) % mbw
    qy = jnp.asarray([0, 0, 1, 1])
    qx = jnp.asarray([0, 1, 0, 1])
    uy = (mby[:, None] * 16 + qy[None, :] * 8).reshape(m)
    ux = (mbx[:, None] * 16 + qx[None, :] * 8).reshape(m)
    ix, iy = mvf[:, 0] >> 2, mvf[:, 1] >> 2
    fx, fy = mvf[:, 0] & 3, mvf[:, 1] & 3
    y0 = pad + uy + iy - 1
    x0 = pad + ux + ix - 1
    packed = pack_planes4(planes4)
    band = jnp.repeat(mby, 4)
    w32 = gather_win(packed, y0, x0, band, win=10)[:, :, :10]
    w4 = [((w32 >> (8 * p)) & 0xFF).astype(jnp.int32) for p in range(4)]
    tbl = _qp_tbl()[fx, fy]                       # (M, 6)

    def sample(pp, dy, dx):
        out = jnp.zeros((m, 8, 8), jnp.int32)
        for p in range(4):
            for a in range(2):
                for b in range(2):
                    msk = ((pp == p) & (dy == a) & (dx == b))[:, None, None]
                    out = jnp.where(msk, w4[p][:, 1 + a:9 + a, 1 + b:9 + b],
                                    out)
        return out

    s1 = sample(tbl[:, 0], tbl[:, 1], tbl[:, 2])
    s2 = sample(tbl[:, 3], tbl[:, 4], tbl[:, 5])
    pred = (s1 + s2 + 1) >> 1
    return (pred.reshape(n, 2, 2, 8, 8).transpose(0, 1, 3, 2, 4)
            .reshape(n, 16, 16))


def mc_luma_fullpel(ref_pad, mv, mbw: int, mbh: int, pad: int):
    """Gather (N,16,16) fullpel predictions.  mv (N,2) qpel (multiples of 4)."""
    n = mbw * mbh
    mby = jnp.arange(n, dtype=jnp.int32) // mbw
    mbx = jnp.arange(n, dtype=jnp.int32) % mbw
    y0 = pad + mby * 16 + (mv[:, 1] >> 2)
    x0 = pad + mbx * 16 + (mv[:, 0] >> 2)
    yi = y0[:, None, None] + jnp.arange(16, dtype=jnp.int32)[None, :, None]
    xi = x0[:, None, None] + jnp.arange(16, dtype=jnp.int32)[None, None, :]
    return ref_pad[yi, xi].astype(jnp.int32)


def mc_chroma(ref_c_pad, mv, mbw: int, mbh: int, pad_c: int, ref_idx=None):
    """Normative 1/8-pel bilinear chroma interpolation (8.4.2.2.2) for all
    MBs at once; mv is the *luma* qpel mv.  ref_c_pad (Hc,Wc) or stacked
    (K,Hc,Wc) with per-MB ref_idx.  Returns (N,8,8) int32."""
    n = mbw * mbh
    mby = jnp.arange(n, dtype=jnp.int32) // mbw
    mbx = jnp.arange(n, dtype=jnp.int32) % mbw
    ix, iy = mv[:, 0] >> 3, mv[:, 1] >> 3
    fx, fy = mv[:, 0] & 7, mv[:, 1] & 7
    y0 = pad_c + mby * 8 + iy
    x0 = pad_c + mbx * 8 + ix
    yi = y0[:, None, None] + jnp.arange(9, dtype=jnp.int32)[None, :, None]
    xi = x0[:, None, None] + jnp.arange(9, dtype=jnp.int32)[None, None, :]
    if ref_idx is None:
        a = ref_c_pad[yi, xi].astype(jnp.int32)    # (N, 9, 9)
    else:
        a = ref_c_pad[ref_idx[:, None, None], yi, xi].astype(jnp.int32)
    p00, p01 = a[:, :8, :8], a[:, :8, 1:]
    p10, p11 = a[:, 1:, :8], a[:, 1:, 1:]
    fx = fx[:, None, None]
    fy = fy[:, None, None]
    return ((8 - fx) * (8 - fy) * p00 + fx * (8 - fy) * p01
            + (8 - fx) * fy * p10 + fx * fy * p11 + 32) >> 6


def mc_chroma_uv_quad(ref_u_pad, ref_v_pad, mv8, mbw: int, mbh: int,
                      pad_c: int, ref_idx=None):
    """Per-quadrant chroma MC: mv8 (N,4,2) luma qpel mvs (quadrant
    q = 2*qy + qx) -> each 4x4 chroma block interpolated at its own mv
    (8.4.2.2.2, the partitioned-MB case).  Returns (pred_u, pred_v)
    (N,8,8) int32; reduces to mc_chroma_uv when all quads share one mv."""
    n = mbw * mbh
    m = 4 * n
    mvf = mv8.reshape(m, 2)
    mby = jnp.arange(n, dtype=jnp.int32) // mbw
    mbx = jnp.arange(n, dtype=jnp.int32) % mbw
    qy = jnp.asarray([0, 0, 1, 1])
    qx = jnp.asarray([0, 1, 0, 1])
    cy = (mby[:, None] * 8 + qy[None, :] * 4).reshape(m)
    cx = (mbx[:, None] * 8 + qx[None, :] * 4).reshape(m)
    ix, iy = mvf[:, 0] >> 3, mvf[:, 1] >> 3
    fx, fy = mvf[:, 0] & 7, mvf[:, 1] & 7
    y0 = pad_c + cy + iy
    x0 = pad_c + cx + ix
    yi = y0[:, None, None] + jnp.arange(5, dtype=jnp.int32)[None, :, None]
    xi = x0[:, None, None] + jnp.arange(5, dtype=jnp.int32)[None, None, :]
    uv = jnp.stack([ref_u_pad, ref_v_pad])         # (2,Hc,Wc) / (2,K,...)
    if ref_idx is None:
        a = uv[:, yi, xi].astype(jnp.int32)        # (2, M, 5, 5)
    else:
        rix = jnp.repeat(ref_idx, 4)
        a = uv[:, rix[:, None, None], yi, xi].astype(jnp.int32)
    p00, p01 = a[:, :, :4, :4], a[:, :, :4, 1:]
    p10, p11 = a[:, :, 1:, :4], a[:, :, 1:, 1:]
    fx = fx[None, :, None, None]
    fy = fy[None, :, None, None]
    pred = ((8 - fx) * (8 - fy) * p00 + fx * (8 - fy) * p01
            + (8 - fx) * fy * p10 + fx * fy * p11 + 32) >> 6
    pred = (pred.reshape(2, n, 2, 2, 4, 4).transpose(0, 1, 2, 4, 3, 5)
            .reshape(2, n, 8, 8))
    return pred[0], pred[1]


def mc_chroma_uv(ref_u_pad, ref_v_pad, mv, mbw: int, mbh: int,
                 pad_c: int, ref_idx=None):
    """Both chroma planes in ONE window gather (the per-MB indices are
    identical, and the gather dominates mc_chroma's cost — one indexed
    read of a (2,Hc,Wc) stack halves it).  Returns (pred_u, pred_v),
    each (N,8,8) int32; bit-identical to two mc_chroma calls."""
    n = mbw * mbh
    mby = jnp.arange(n, dtype=jnp.int32) // mbw
    mbx = jnp.arange(n, dtype=jnp.int32) % mbw
    ix, iy = mv[:, 0] >> 3, mv[:, 1] >> 3
    fx, fy = mv[:, 0] & 7, mv[:, 1] & 7
    y0 = pad_c + mby * 8 + iy
    x0 = pad_c + mbx * 8 + ix
    yi = y0[:, None, None] + jnp.arange(9, dtype=jnp.int32)[None, :, None]
    xi = x0[:, None, None] + jnp.arange(9, dtype=jnp.int32)[None, None, :]
    uv = jnp.stack([ref_u_pad, ref_v_pad])         # (2,Hc,Wc) / (2,K,...)
    if ref_idx is None:
        a = uv[:, yi, xi].astype(jnp.int32)        # (2, N, 9, 9)
    else:
        a = uv[:, ref_idx[:, None, None], yi, xi].astype(jnp.int32)
    p00, p01 = a[:, :, :8, :8], a[:, :, :8, 1:]
    p10, p11 = a[:, :, 1:, :8], a[:, :, 1:, 1:]
    fx = fx[None, :, None, None]
    fy = fy[None, :, None, None]
    pred = ((8 - fx) * (8 - fy) * p00 + fx * (8 - fy) * p01
            + (8 - fx) * fy * p10 + fx * fy * p11 + 32) >> 6
    return pred[0], pred[1]
