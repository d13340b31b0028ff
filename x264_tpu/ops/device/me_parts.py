"""Device (JAX) partition motion estimation: 16x16 / 16x8 / 8x16 / 8x8.

Parity anchor: reference encoder/analyse.c mb_analyse_inter_p16x16/_p16x8/
_p8x16/_p8x8 — x264 runs a separate predictive search per partition shape
on the CPU.  The TPU-first restructuring: the fullpel SAD of every shape
decomposes into the four 8x8 quadrant SADs at the same displacement, so
ONE exhaustive pass accumulates argmin registers for all NINE units
(4 quadrants, 2 16x8 halves, 2 8x16 halves, 1 16x16) at the cost of the
16x16-only pass; the shape decision is a per-MB argmin over unit-cost
sums + lambda * header-bit estimates, and subpel refinement then runs
ONCE at quadrant granularity with candidate costs pooled per partition
(so a 16x8 partition refines its shared mv over the union of its two
quadrants' SATDs — same pixel count as the 16x16-only refine).

Quadrant indexing everywhere: q = 2*qy + qx (raster: TL, TR, BL, BR).
part_of_quad[shape][q] maps quadrants to partition slots; partitions are
numbered in spec decode order (7.4.5.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x264_tpu.models.inter_frame import PAD, mv_bits_arr

# shape codes (== CAVLC P mb_type values)
SH_16x16, SH_16x8, SH_8x16, SH_8x8 = 0, 1, 2, 3

# quad -> partition slot, per shape
PART_OF_QUAD = np.array([[0, 0, 0, 0],
                         [0, 0, 1, 1],
                         [0, 1, 0, 1],
                         [0, 1, 2, 3]], np.int32)
# partition slot -> first member quad (representative), per shape
FIRST_QUAD = np.array([[0, 0, 0, 0],
                       [0, 2, 0, 0],
                       [0, 1, 0, 0],
                       [0, 1, 2, 3]], np.int32)
N_PARTS = np.array([1, 2, 2, 4], np.int32)

# per-shape header-bit estimates (CAVLC-ish: mb_type ue + sub_mb_type):
# ue(0)=1, ue(1)=ue(2)=3, ue(3)=5 + 4x sub_mb_type "1" bits
SHAPE_BITS = np.array([1, 3, 3, 9], np.int32)


def _quad_sads(ad, mbw: int, mbh: int):
    """|src-shifted| (H, W) -> per-quadrant SAD (N, 4), q = 2*qy + qx."""
    n = mbw * mbh
    s8 = ad.reshape(mbh, 2, 8, mbw, 2, 8).sum((2, 5))     # (mbh,2,mbw,2)
    return s8.transpose(0, 2, 1, 3).reshape(n, 4)


@functools.partial(jax.jit, static_argnames=("me_range", "mbw", "mbh"))
def full_search_parts_xla(src_y, ref_pad, lam, me_range: int, mbw: int,
                          mbh: int):
    """Exhaustive fullpel search, all 9 units at once.

    Returns dict: cost_q (N,4), mv_q (N,4,2), cost_h (N,2), mv_h (N,2,2)
    [16x8 top/bottom], cost_v (N,2), mv_v (N,2,2) [8x16 left/right],
    cost_f (N,), mv_f (N,2).  Costs are SAD + lam*bits(mv) per unit; ties
    break toward the first candidate in (dy, dx) raster order (same rule
    as me.full_search_16x16, so the 16x16 unit is bit-identical to it)."""
    r = me_range
    span = 2 * r + 1
    h, w = mbh * 16, mbw * 16
    n = mbw * mbh
    src = src_y.astype(jnp.int32)
    ref = ref_pad.astype(jnp.int32)
    bits = jnp.asarray(mv_bits_arr(4 * r).astype(np.int32))

    def body(t, carry):
        (bq, mq, bh_, mh, bv, mv_, bf, mf) = carry
        dy = t - r
        band = jax.lax.dynamic_slice(ref, (PAD + dy, 0), (h, w + 2 * PAD))
        cost_y = lam * bits[4 * dy + 4 * r]
        for dx in range(-r, r + 1):
            shifted = band[:, PAD + dx:PAD + dx + w]
            q = _quad_sads(jnp.abs(src - shifted), mbw, mbh)   # (N,4)
            bb = cost_y + lam * bits[4 * dx + 4 * r]
            cand = jnp.array([4 * dx, 4 * dy], jnp.int32)

            cq = q + bb
            bet = cq < bq
            bq = jnp.where(bet, cq, bq)
            mq = jnp.where(bet[..., None], cand, mq)

            ch = jnp.stack([q[:, 0] + q[:, 1], q[:, 2] + q[:, 3]], 1) + bb
            bet = ch < bh_
            bh_ = jnp.where(bet, ch, bh_)
            mh = jnp.where(bet[..., None], cand, mh)

            cv = jnp.stack([q[:, 0] + q[:, 2], q[:, 1] + q[:, 3]], 1) + bb
            bet = cv < bv
            bv = jnp.where(bet, cv, bv)
            mv_ = jnp.where(bet[..., None], cand, mv_)

            cf = q.sum(1) + bb
            bet = cf < bf
            bf = jnp.where(bet, cf, bf)
            mf = jnp.where(bet[:, None], cand, mf)
        return bq, mq, bh_, mh, bv, mv_, bf, mf

    big = jnp.int32(1 << 30)
    init = (jnp.full((n, 4), big), jnp.zeros((n, 4, 2), jnp.int32),
            jnp.full((n, 2), big), jnp.zeros((n, 2, 2), jnp.int32),
            jnp.full((n, 2), big), jnp.zeros((n, 2, 2), jnp.int32),
            jnp.full((n,), big), jnp.zeros((n, 2), jnp.int32))
    bq, mq, bh_, mh, bv, mv_, bf, mf = jax.lax.fori_loop(
        0, span, body, init)
    return dict(cost_q=bq, mv_q=mq, cost_h=bh_, mv_h=mh,
                cost_v=bv, mv_v=mv_, cost_f=bf, mv_f=mf)


def full_search_parts(src_y, ref_pad, lam, me_range: int, mbw: int,
                      mbh: int):
    """Dispatch: Mosaic kernel on TPU (me_range <= 24, the packed-key
    cap), XLA fori_loop elsewhere.  Same contract/bit-exactness."""
    if jax.default_backend() == "tpu" and me_range <= 24:
        try:
            from x264_tpu.ops.device.me_parts_pallas import (
                full_search_parts_pallas)
        except ImportError:
            pass
        else:
            return full_search_parts_pallas(src_y, ref_pad, lam,
                                            me_range=me_range, mbw=mbw,
                                            mbh=mbh)
    return full_search_parts_xla(src_y, ref_pad, lam, me_range=me_range,
                                 mbw=mbw, mbh=mbh)


def choose_shape(units, lam, enable_8x8: bool = True):
    """Per-MB partition-shape decision from fullpel unit costs.

    cost(shape) = sum of member unit costs + lam * SHAPE_BITS[shape]
    (the analyse.c a->l0.me16x16.cost vs i_cost16x8... comparison, with
    the mb_type/sub_mb_type bit estimate standing in for x264's
    REF_COST/partition costs).  Returns (shape (N,), mv8 (N,4,2) fullpel
    qpel mvs per quadrant, cost (N,))."""
    sb = jnp.asarray(SHAPE_BITS)
    costs = jnp.stack([
        units["cost_f"] + lam * sb[0],
        units["cost_h"].sum(1) + lam * sb[1],
        units["cost_v"].sum(1) + lam * sb[2],
        units["cost_q"].sum(1) + lam * sb[3],
    ], axis=1)                                             # (N, 4)
    if not enable_8x8:
        costs = costs.at[:, 3].set(jnp.int32(1 << 30))
    shape = jnp.argmin(costs, axis=1).astype(jnp.int32)    # first min wins
    cost = jnp.min(costs, axis=1).astype(jnp.int32)

    # per-quadrant mv for each shape, then select by the chosen shape
    mvq_by_shape = jnp.stack([
        jnp.broadcast_to(units["mv_f"][:, None], units["mv_q"].shape),
        units["mv_h"][:, jnp.asarray([0, 0, 1, 1])],
        units["mv_v"][:, jnp.asarray([0, 1, 0, 1])],
        units["mv_q"],
    ], axis=1)                                             # (N, 4, 4, 2)
    mv8 = jnp.take_along_axis(
        mvq_by_shape, shape[:, None, None, None], axis=1)[:, 0]
    return shape, mv8, cost


def _hpel_windows10(g):
    """Per-unit half-pel 10x10 windows from fullpel windows g (M,15,15)
    int32 whose [0,0] sits at (y0-2, x0-2): the 8x8-block analog of
    me._hpel_windows (same 6-tap chain; the 2-sample margin covers every
    tap a 10x10 interior needs).  Returns (4, M, 10, 10)."""
    def f6(a, b, c, d, e, f):
        return a - 5 * b + 20 * c + 20 * d - 5 * e + f

    bh = f6(g[:, :, 0:10], g[:, :, 1:11], g[:, :, 2:12],
            g[:, :, 3:13], g[:, :, 4:14], g[:, :, 5:15])   # (M,15,10)
    hh = jnp.clip((bh[:, 2:12, :] + 16) >> 5, 0, 255)
    bv = f6(g[:, 0:10, :], g[:, 1:11, :], g[:, 2:12, :],
            g[:, 3:13, :], g[:, 4:14, :], g[:, 5:15, :])   # (M,10,15)
    hv = jnp.clip((bv[:, :, 2:12] + 16) >> 5, 0, 255)
    cc = f6(bh[:, 0:10], bh[:, 1:11], bh[:, 2:12],
            bh[:, 3:13], bh[:, 4:14], bh[:, 5:15])         # (M,10,10)
    hc = jnp.clip((cc + 512) >> 10, 0, 255)
    return jnp.stack([g[:, 2:12, 2:12], hh, hv, hc])


def subpel_refine_parts(src_mbs, mv8, shape, lam, me_range: int,
                        steps: int, mbw: int, mbh: int, ref_idx=None,
                        ref_pad=None, packed_planes=None):
    """SATD subpel refinement at quadrant granularity with candidate
    costs POOLED per partition: every quadrant evaluates the same +-3
    qpel deltas around its partition's shared fullpel mv, the per-delta
    SATDs are segment-summed onto partition slots (one-hot einsum over
    PART_OF_QUAD), each partition argmins independently, and the winning
    delta broadcasts back to its member quadrants — so every shape
    refines with exactly one SATD pass over N*4 8x8 units (the same
    pixel count as the 16x16-only refine; encoder/me.c refine_subpel's
    per-partition loop re-thought as a batched lattice).

    src_mbs (N,16,16) int32; mv8 (N,4,2) fullpel qpel; shape (N,).
    ref_pad: (Hp,Wp) or (K,Hp,Wp) padded fullpel reference (gather path);
    packed_planes: packed hpel planes for the wingather path (optional,
    used on TPU).  Returns (mv8', cost (N,4) per-partition-slot costs,
    pred (N,16,16) the winning prediction)."""
    from x264_tpu.ops.device.me import subpel_candidates
    from x264_tpu.ops.device.pixel import satd
    from x264_tpu.ops.reference.mc import QPEL_TWO_SAMPLE_TBL

    n = mbw * mbh
    m = 4 * n
    off = 4 * me_range + 4
    bits = jnp.asarray(mv_bits_arr(off).astype(np.int32))

    # unit geometry: unit u = 4*mb + q
    mby = jnp.arange(n, dtype=jnp.int32) // mbw
    mbx = jnp.arange(n, dtype=jnp.int32) % mbw
    qy = jnp.asarray([0, 0, 1, 1])
    qx = jnp.asarray([0, 1, 0, 1])
    uy = (mby[:, None] * 16 + qy[None, :] * 8).reshape(m)
    ux = (mbx[:, None] * 16 + qx[None, :] * 8).reshape(m)
    mvq = mv8.reshape(m, 2)
    y0 = PAD + uy + (mvq[:, 1] >> 2) - 1
    x0 = PAD + ux + (mvq[:, 0] >> 2) - 1

    src_q = (src_mbs.reshape(n, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4)
             .reshape(m, 8, 8))

    if packed_planes is not None:
        from x264_tpu.ops.device.wingather import gather_win
        band = jnp.repeat(mby, 4)
        rix = None if ref_idx is None else jnp.repeat(ref_idx, 4)
        w32 = gather_win(packed_planes, y0, x0, band, win=10,
                         ref_idx=rix)[:, :, :10]
        win = jnp.stack([((w32 >> (8 * i)) & 0xFF).astype(jnp.int32)
                         for i in range(4)])               # (4, M, 10, 10)
    else:
        r15 = jnp.arange(15, dtype=jnp.int32)
        yi = (y0 - 2)[:, None, None] + r15[None, :, None]
        xi = (x0 - 2)[:, None, None] + r15[None, None, :]
        if ref_pad.ndim == 2:
            g = ref_pad[yi, xi].astype(jnp.int32)
        else:
            rix = jnp.repeat(ref_idx, 4)
            g = ref_pad[rix[:, None, None], yi, xi].astype(jnp.int32)
        win = _hpel_windows10(g)                           # (4, M, 10, 10)

    # partition pooling operators from the chosen shape
    pq = jnp.asarray(PART_OF_QUAD)[shape]                  # (N, 4)
    pool = (pq[:, :, None]
            == jnp.arange(4, dtype=jnp.int32)[None, None, :])
    poolf = pool.astype(jnp.int32)                         # (N, q, p)
    # first-member mask: quad q carries its partition's mv-bit cost
    fq = jnp.asarray(FIRST_QUAD)[shape]                    # (N, 4) slots
    is_first = jnp.zeros((n, 4), bool).at[
        jnp.arange(n)[:, None], fq].set(True)
    nparts = jnp.asarray(N_PARTS)[shape]                   # (N,)
    slot_live = (jnp.arange(4, dtype=jnp.int32)[None, :]
                 < nparts[:, None])                        # (N, 4)

    cands = subpel_candidates(steps)
    CHUNK = 7
    best = None
    best_d = jnp.zeros((n, 4, 2), jnp.int32)               # per slot
    best_pred = None
    for ci in range(0, len(cands), CHUNK):
        chunk = cands[ci:ci + CHUNK]
        preds, ds, bitc = [], [], []
        for (dy, dx) in chunk:
            fy, fx = dy & 3, dx & 3
            iy, ix = dy >> 2, dx >> 2
            p1, dy1, dx1, p2, dy2, dx2 = (int(t) for t in
                                          QPEL_TWO_SAMPLE_TBL[fx, fy])
            s1 = win[p1, :, 1 + iy + dy1:9 + iy + dy1,
                     1 + ix + dx1:9 + ix + dx1]
            s2 = win[p2, :, 1 + iy + dy2:9 + iy + dy2,
                     1 + ix + dx2:9 + ix + dx2]
            preds.append((s1 + s2 + 1) >> 1)
            cand = mvq + jnp.array([dx, dy], jnp.int32)    # (M, 2)
            ds.append(jnp.array([dx, dy], jnp.int32))
            bitc.append(bits[cand[:, 0] + off] + bits[cand[:, 1] + off])
        nc = len(chunk)
        predm = jnp.stack(preds)                           # (c, M, 8, 8)
        src_rep = jnp.broadcast_to(src_q, (nc, m, 8, 8)
                                   ).reshape(nc * m, 8, 8)
        sc = satd(src_rep, predm.reshape(nc * m, 8, 8)).reshape(nc, n, 4)
        bc = jnp.stack(bitc).reshape(nc, n, 4)
        # per-quad contribution: SATD always, mv bits only on the
        # partition's first member quad
        contrib = sc + lam * jnp.where(is_first[None], bc, 0)
        # pool onto partition slots: (c, N, p)
        cp = jnp.einsum("cnq,nqp->cnp", contrib, poolf)
        cp = jnp.where(slot_live[None], cp, jnp.int32(1 << 30))
        idx = jnp.argmin(cp, axis=0)                       # (N, p) first min
        cmin = jnp.take_along_axis(cp, idx[None], axis=0)[0]
        dsel = jnp.stack(ds)[idx]                          # (N, p, 2)
        # quadrant-level winning pred for this chunk: quad q follows its
        # partition slot's choice
        qidx = jnp.take_along_axis(idx, pq, axis=1)        # (N, 4)
        predq = jnp.take_along_axis(
            predm.reshape(nc, n, 4, 8, 8),
            qidx[None, :, :, None, None], axis=0)[0]       # (N, 4, 8, 8)
        if best is None:
            best, best_d, best_pred = cmin, dsel, predq
        else:
            better = cmin < best                           # (N, p)
            best = jnp.where(better, cmin, best)
            best_d = jnp.where(better[..., None], dsel, best_d)
            bq = jnp.take_along_axis(better, pq, axis=1)   # (N, 4)
            best_pred = jnp.where(bq[..., None, None], predq, best_pred)
    # broadcast slot deltas back to quadrants
    dq = jnp.take_along_axis(best_d, pq[..., None], axis=1)   # (N, 4, 2)
    mv8p = mv8 + dq
    pred = (best_pred.reshape(n, 2, 2, 8, 8).transpose(0, 1, 3, 2, 4)
            .reshape(n, 16, 16))
    return mv8p, jnp.where(slot_live, best, 0), pred
