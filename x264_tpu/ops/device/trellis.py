"""RD-optimal quantization (trellis) — the rdo.c quant_trellis_cabac
analog (reference encoder/rdo.c:642), restructured TPU-first: a batched
9-state Viterbi DP over ALL residual blocks of a frame at once instead of
x264's per-block scalar DP inside the MB loop.

States: 8 CABAC level-context nodes (the (numEq1, numGt1) chain compressed
exactly as the entropy coder walks it — native/cabac.c lvl_trans) plus an
"unstarted" state (no nonzero chosen yet = positions beyond the last
significant coefficient, where no flags are coded).

Bit costs: CABAC bin costs from the NORMATIVE context-initialisation
probabilities at the slice QP (bitstream/cabac_init.py) in 1/256-bit
units — a stationary approximation of rdo.c's live-state snapshot (the
states x264 snapshots are themselves adapted from these inits).  The
result is conformant regardless: trellis only changes WHICH levels are
coded, never how.

Distortion: transform-domain SSD with exact inverse-basis weights
(computed numerically from float twins of the normative inverse
transforms), so cost units are true pixel-domain SSD — directly
comparable with lambda2 as used by select_transform_8x8.
"""

from __future__ import annotations

import functools

import numpy as np

from x264_tpu.bitstream.cabac_init import (CTX_INIT_I, CTX_INIT_PB,
                                           LAST8X8_MAP, SIG8X8_MAP)
from x264_tpu.bitstream.tables import (DEQUANT4, DEQUANT8, ZIGZAG_4x4,
                                       ZIGZAG_8x8)

# dequant-of-level-1 per zigzag position, (6, nc) — 4x4 exact; 8x8 is the
# float linearisation of the two-regime normative dequant (8.5.13.1),
# which only feeds the distortion model, not the reconstruction
DEQ4_ZZ = DEQUANT4.reshape(6, 16)[:, ZIGZAG_4x4].astype(np.float32)
DEQ8_ZZ = (DEQUANT8.reshape(6, 64)[:, ZIGZAG_8x8].astype(np.float32))

# quant->dequant roundtrip gain per position: the H.264 tables fold the
# transform orthonormalisation into mf/V, so the dequant domain is the
# DCT domain SCALED by k = mf*V/2^qbits (~{4.0, 2.56, 3.2} per parity
# class, qp-independent by table design).  The trellis target is c*k.
from x264_tpu.bitstream.tables import QUANT4_MF, QUANT8_MF  # noqa: E402

K4_ZZ = ((QUANT4_MF[0].reshape(16).astype(np.float64)
          * DEQUANT4[0].reshape(16)) / 2 ** 15
         )[ZIGZAG_4x4].astype(np.float32)
K8_ZZ = ((QUANT8_MF[0].reshape(64).astype(np.float64)
          * DEQUANT8[0].reshape(64) * 16) / 2 ** 22
         )[ZIGZAG_8x8].astype(np.float32)


def dq1_4x4(qp_blk):
    """(B,) per-block qp -> (B, 16) f32 dequant scale of level 1 in
    zigzag order (matches dequant4x4: v * 2^(qp//6))."""
    import jax.numpy as jnp
    q = jnp.asarray(qp_blk, jnp.int32)
    return (jnp.asarray(DEQ4_ZZ)[q % 6]
            * jnp.exp2((q // 6).astype(jnp.float32))[:, None])


def dq1_8x8(qp_blk):
    """(B,) -> (B, 64) f32: DEQUANT8*16 * 2^(qp//6 - 6) (8.5.13.1
    linearised)."""
    import jax.numpy as jnp
    q = jnp.asarray(qp_blk, jnp.int32)
    return (jnp.asarray(DEQ8_ZZ)[q % 6]
            * jnp.exp2((q // 6).astype(jnp.float32) - 2.0)[:, None])

# CABAC state probability model: pLPS(state) = 0.5 * ALPHA^state — the
# design rule of the normative rangeTabLPS (9.3.3.2.1.1).
_ALPHA = (0.01875 / 0.5) ** (1.0 / 63)

# level-context walk, identical to the entropy coder (native/cabac.c)
LVL1_CTX = np.array([1, 2, 3, 4, 0, 0, 0, 0])          # bin0 ctxIdxInc
LVLGT1_CTX = np.array([5, 5, 5, 5, 6, 7, 8, 9])        # bins>0 ctxIdxInc
TRANS_EQ1 = np.array([1, 2, 3, 3, 4, 5, 6, 7])         # after |level|==1
TRANS_GT1 = np.array([4, 4, 4, 4, 5, 6, 7, 7])         # after |level|>1


def _ctx_bits(qp: int, slice_type: str, idx) -> np.ndarray:
    """(..., 2) f32: cost (1/256 bits) of coding bin 0 / bin 1 in ctx idx,
    at the ctx-init operating point for slice qp (9.3.1.1)."""
    init = CTX_INIT_I if slice_type == "I" else CTX_INIT_PB[0]
    idx = np.asarray(idx)
    m = init[idx, 0].astype(np.int64)
    n = init[idx, 1].astype(np.int64)
    pre = np.clip(((m * np.clip(qp, 0, 51)) >> 4) + n, 1, 126)
    state = np.where(pre <= 63, 63 - pre, pre - 64)
    mps1 = pre > 63
    plps = 0.5 * _ALPHA ** state
    p1 = np.where(mps1, 1.0 - plps, plps)
    return (np.stack([-np.log2(1.0 - p1), -np.log2(p1)], axis=-1)
            * 256.0).astype(np.float32)


def _basis_weights_1d(inv1d, n):
    """||inverse basis vector||^2 per coefficient, from a float twin of
    the normative inverse transform (shifts become exact halves)."""
    eye = np.eye(n, dtype=np.float64)
    out = np.array([inv1d(eye[k]) for k in range(n)])
    return (out * out).sum(axis=1)


def _idct4_1d_f(d):
    e0, e1 = d[0] + d[2], d[0] - d[2]
    e2, e3 = d[1] / 2 - d[3], d[1] + d[3] / 2
    return np.array([e0 + e3, e1 + e2, e1 - e2, e0 - e3])


def _idct8_1d_f(d):
    e0, e2 = d[0] + d[4], d[0] - d[4]
    e4, e6 = d[2] / 2 - d[6], d[2] + d[6] / 2
    e1 = -d[3] + d[5] - d[7] - d[7] / 2
    e3 = d[1] + d[7] - d[3] - d[3] / 2
    e5 = -d[1] + d[7] + d[5] + d[5] / 2
    e7 = d[3] + d[5] + d[1] + d[1] / 2
    f0, f2, f4, f6 = e0 + e6, e2 + e4, e2 - e4, e0 - e6
    f1, f3 = e1 + e7 / 4, e3 + e5 / 4
    f5, f7 = e3 / 4 - e5, e7 - e1 / 4
    return np.array([f0 + f7, f2 + f5, f4 + f3, f6 + f1,
                     f6 - f1, f4 - f3, f2 - f5, f0 - f7])


@functools.lru_cache(maxsize=None)
def _w_zz(nc: int) -> np.ndarray:
    """Pixel-SSD weight of a transform-domain coefficient error at each
    zigzag position: ||inv basis||^2 / 64^2 (the inverse ends with >>6)."""
    if nc == 16:
        w1 = _basis_weights_1d(_idct4_1d_f, 4)
        w2 = np.outer(w1, w1).reshape(16) / 4096.0
        return w2[ZIGZAG_4x4].astype(np.float32)
    w1 = _basis_weights_1d(_idct8_1d_f, 8)
    w2 = np.outer(w1, w1).reshape(64) / 4096.0
    return w2[ZIGZAG_8x8].astype(np.float32)


def trellis_tables(slice_qp: int, slice_type: str, cat: int) -> dict:
    """Host-side cost tables for one frame: sig/last per scan position,
    level-bin costs per node, cbf costs.  ctx layout matches
    native/cabac.c (SIG_OFF/LAST_OFF/LVL_OFF/CBF_OFF and the 8x8 maps)."""
    if cat == 5:
        sig = _ctx_bits(slice_qp, slice_type, 402 + SIG8X8_MAP)   # (63,2)
        last = _ctx_bits(slice_qp, slice_type, 417 + LAST8X8_MAP)
        lvl_off = 426
        # no coded_block_flag for cat5 (cbp covers it): charge one bit
        # as the cbp-delta proxy for a nonzero 8x8
        cbf = np.array([0.0, 256.0], np.float32)
    else:
        off = {0: 0, 1: 15, 2: 29, 3: 44, 4: 47}[cat]
        npos = {0: 16, 1: 15, 2: 16, 3: 4, 4: 15}[cat] - 1
        sig = _ctx_bits(slice_qp, slice_type,
                        105 + off + np.arange(npos))
        last = _ctx_bits(slice_qp, slice_type,
                         166 + off + np.arange(npos))
        lvl_off = 227 + {0: 0, 1: 10, 2: 20, 3: 30, 4: 39}[cat]
        cbf = _ctx_bits(slice_qp, slice_type, 85 + 4 * cat)[()]
    b0 = _ctx_bits(slice_qp, slice_type, lvl_off + LVL1_CTX)      # (8,2)
    gt1 = _ctx_bits(slice_qp, slice_type, lvl_off + LVLGT1_CTX)   # (8,2)
    return dict(sig=sig, last=last, b0=b0, gt1=gt1,
                cbf=np.asarray(cbf, np.float32).reshape(2),
                w=_w_zz(16 if cat != 5 else 64))


@functools.lru_cache(maxsize=64)
def tables_tuple(slice_qp: int, slice_type: str, cat: int) -> tuple:
    """(sig, last, b0, gt1, cbf) f32 arrays for trellis_quant — cached
    per (qp, type, cat) so repeated frames reuse the same host arrays."""
    t = trellis_tables(slice_qp, slice_type, cat)
    return (t["sig"], t["last"], t["b0"], t["gt1"], t["cbf"])


def _state_bits(states: np.ndarray, idx) -> np.ndarray:
    """(..., 2) bin costs from LIVE engine states (packed as
    (pStateIdx<<1)|mps by native/cabac.c) — the rdo.c snapshot model,
    one frame stale instead of x264's same-MB snapshot."""
    st = states[np.asarray(idx)].astype(np.int64)
    plps = 0.5 * _ALPHA ** (st >> 1)
    p1 = np.where(st & 1, 1.0 - plps, plps)
    p1 = np.clip(p1, 1e-4, 1.0 - 1e-4)
    return (np.stack([-np.log2(1.0 - p1), -np.log2(p1)], axis=-1)
            * 256.0).astype(np.float32)


def tables_from_states(states: np.ndarray, cat: int) -> tuple:
    """Trellis cost tuple from the previous frame's final CABAC states
    (the adaptive analog of tables_tuple; layout identical)."""
    if cat == 5:
        sig = _state_bits(states, 402 + SIG8X8_MAP)
        last = _state_bits(states, 417 + LAST8X8_MAP)
        lvl_off = 426
        cbf = np.array([0.0, 256.0], np.float32)
    else:
        off = {0: 0, 1: 15, 2: 29, 3: 44, 4: 47}[cat]
        npos = {0: 16, 1: 15, 2: 16, 3: 4, 4: 15}[cat] - 1
        sig = _state_bits(states, 105 + off + np.arange(npos))
        last = _state_bits(states, 166 + off + np.arange(npos))
        lvl_off = 227 + {0: 0, 1: 10, 2: 20, 3: 30, 4: 39}[cat]
        cbf = _state_bits(states, 85 + 4 * cat)
    b0 = _state_bits(states, lvl_off + LVL1_CTX)
    gt1 = _state_bits(states, lvl_off + LVLGT1_CTX)
    return (sig, last, b0, gt1, np.asarray(cbf, np.float32).reshape(2))


def frame_trellis(slice_qp: int, slice_type: str, lam: int,
                  t8: bool, states=None) -> tuple:
    """The (tbl4, tbl8, lam2f, tbl_i16ac, tbl_cac) bundle the frame
    cores take.  lam2f = lambda2/256 (bit costs are 1/256-bit units).
    tbl_i16ac (cat 1) covers Intra16x16 AC blocks, tbl_cac (cat 4) the
    chroma AC blocks — x264's trellis=1 quantizes these too
    (encoder/rdo.c quant_trellis dispatch by ctxBlockCat).

    NOTE: me_lambda already follows the LAMBDA2 law (0.85*2^((qp-12)/3),
    the reference's x264_lambda2_tab rate-distortion slope) — the ME
    SAD-lambda role it plays elsewhere over-weights mv bits rather than
    under-weighting them, but for RD it IS lambda2; squaring it would
    over-penalize bits ~45x and zero out most residual.

    CALIBRATION (round 5): the ctx-init bit-cost tables are a
    stationary model of a coder whose contexts ADAPT far below the
    init operating point on real residual streams, so they overprice
    bits ~3x; with the distortion model verified exact against pixel
    SSD, the correction rides lambda.  An RD sweep on the bench-style
    clip (doc/PROFILE_r5.md): raw lambda2 lost 0.5-0.9 dB vs trellis
    OFF at equal rate; x0.35 puts the encoder within ~0.1 dB of
    x264-medium's (rate, PSNR) point.  The one-frame-stale live-state
    feedback measured slightly WORSE than the init tables at equal
    rate (stale states mis-rank sig flags) and cost a host sync per
    frame, so frames use the static tables."""
    lam = lam * 0.35
    if states is not None:
        src = lambda cat: tables_from_states(states, cat)  # noqa: E731
    else:
        src = lambda cat: tables_tuple(  # noqa: E731
            slice_qp, slice_type, cat)
    tbl4 = src(2)
    tbl8 = src(5) if t8 else None
    lam2f = np.float32(max(float(lam), 1.0) / 256.0)
    return (tbl4, tbl8, lam2f, src(1), src(4))


def trellis_quant(coefs_zz, dq_zz, lam2f, tbl, nc: int):
    """RD-optimal levels for (B, nc) zigzag DCT coefficients.

    coefs_zz: (B, nc) int32 signed transform coefficients.
    dq_zz:    (B, nc) int32 dequant-of-level-1 per position (folds the
              per-block qp — AQ-compatible; contexts stay at slice qp
              like the real coder's).
    lam2f:    traced f32 scalar = lambda2 / 256 (bits are 1/256 units).
    tbl:      tuple (sig (nc-1,2), last (nc-1,2), b0 (8,2), gt1 (8,2),
              cbf (2,)) — f32 arrays from trellis_tables.
    nc:       16 (luma 4x4, cat 0/2), 64 (8x8, cat 5), or 15 (AC-only
              cats 1/4: zigzag positions 1..15 of a 4x4 block — pass
              coefs_zz[..., 1:]).
    Returns (B, nc) int32 signed levels."""
    import jax.numpy as jnp

    sig, last, b0, gt1, cbf = tbl
    # fold lambda into every bit cost up front: accumulated cost IS the
    # RD objective J = SSD + lambda2 * bits
    lam2f = jnp.asarray(lam2f, jnp.float32)
    sig = jnp.asarray(sig) * lam2f
    last = jnp.asarray(last) * lam2f
    b0 = jnp.asarray(b0) * lam2f
    gt1 = jnp.asarray(gt1) * lam2f
    cbf = jnp.asarray(cbf) * lam2f
    byp = 256.0 * lam2f                       # one bypass bin (sign bit)
    B = coefs_zz.shape[0]
    # target in the DEQUANT domain: |c| * roundtrip gain (see K4_ZZ note)
    if nc == 64:
        k_np, w_np = K8_ZZ, _w_zz(64)
    elif nc == 16:
        k_np, w_np = K4_ZZ, _w_zz(16)
    else:                        # 15: AC-only 4x4 (zigzag 1..15)
        k_np, w_np = K4_ZZ[1:], _w_zz(16)[1:]
    k = jnp.asarray(k_np)
    absc = jnp.abs(coefs_zz).astype(jnp.float32) * k
    dqf = dq_zz.astype(jnp.float32)
    w = jnp.asarray(w_np)
    # nearest-rounding quant seed: Lr = round(target / dq) — identical to
    # the mf-table nearest quant up to float rounding; candidates
    # {Lr-1, Lr, 0} bracket the RD optimum either way
    Lr = jnp.floor(absc / dqf + 0.5).astype(jnp.int32)

    # BIG, not inf: costs ride a one-hot MXU contraction (inf*0 = nan)
    BIG = jnp.float32(1e30)
    nstate = 9                   # 0..7 = level nodes, 8 = unstarted
    cost = jnp.concatenate([jnp.full((B, 8), BIG),
                            jnp.zeros((B, 1))], axis=1)

    # the 5 move kinds per DP step, each with a STATIC target map over the
    # 9 source states (8 = unstarted, entering via node 0's contexts);
    # lvl_kind: 0 -> level 0, 1 -> a1, 2 -> a2
    TE = [int(x) for x in TRANS_EQ1]
    TG = [int(x) for x in TRANS_GT1]
    MOVES = [
        (list(range(8)) + [8], 0),           # zero: keep state
        (TE + [TE[0]], 1),                   # a1 == 1
        (TG + [TG[0]], 1),                   # a1 > 1
        (TE + [TE[0]], 2),                   # a2 == 1
        (TG + [TG[0]], 2),                   # a2 > 1
    ]
    tgt45 = np.array([MOVES[m][0][s] for m in range(5) for s in range(9)])
    src45 = np.tile(np.arange(9), 5).astype(np.int32)
    kind45 = np.repeat([0, 1, 1, 2, 2], 9).astype(np.int32)
    # group the 45 (move, src) transitions by target, padded to a
    # rectangle with a BIG dummy column (index 45)
    groups = [[i for i in range(45) if tgt45[i] == t] for t in range(9)]
    G = max(len(x) for x in groups)
    IDX = np.full((9, G), 45, np.int64)
    for t, cols in enumerate(groups):
        IDX[t, :len(cols)] = cols
    SEL = np.zeros((46, 9 * G), np.float32)
    SEL[IDX.reshape(-1), np.arange(9 * G)] = 1.0
    SELj = jnp.asarray(SEL)
    SRCG = jnp.asarray(np.where(IDX < 45, src45[np.minimum(IDX, 44)],
                                8).astype(np.int32))     # (9, G)
    KINDG = jnp.asarray(np.where(IDX < 45, kind45[np.minimum(IDX, 44)],
                                 0).astype(np.int32))
    # per-source-column extensions (col 8 = unstarted uses node 0's ctx)
    lc1_ext = jnp.concatenate([b0[:, 0], b0[0:1, 0]]) + byp     # (9,)
    b0e1 = jnp.concatenate([b0[:, 1], b0[0:1, 1]])              # (9,)
    gt1e0 = jnp.concatenate([gt1[:, 0], gt1[0:1, 0]])
    gt1e1 = jnp.concatenate([gt1[:, 1], gt1[0:1, 1]])
    started_ind = jnp.asarray(
        np.concatenate([np.ones(8, np.float32), [0.0]]))        # (9,)
    unstart_ind = 1.0 - started_ind
    prec = None

    def step(cost, c_p, dq_p, lr, wp, sig0, flags_last, flags_mid):
        """One Viterbi step.  cost (B,9) -> (new_cost, lvl_rec, src_rec).
        All transitions evaluated as five (B,9) move tensors, grouped by
        target through a one-hot MXU contraction, argmin over the group
        axis — ~10 big ops instead of ~100 (B,)-sized ones (the op-soup
        form cost ~8ms/step in TPU While-loop overhead)."""
        import jax
        a1 = lr
        a2 = jnp.maximum(lr - 1, 0)
        a1f = a1.astype(jnp.float32)
        a2f = a2.astype(jnp.float32)
        d0 = wp * c_p * c_p
        e1 = c_p - a1f * dq_p
        e2 = c_p - a2f * dq_p
        da1 = wp * e1 * e1
        da2 = wp * e2 * e2

        flv = flags_mid * started_ind + flags_last * unstart_ind   # (9,)
        base_e = cost + (flv + lc1_ext)[None, :]
        m1 = jnp.where((a1 == 1)[:, None], base_e + da1[:, None], BIG)
        m3 = jnp.where((a2 == 1)[:, None], base_e + da2[:, None], BIG)

        def lcg(a, af):
            mm = jnp.minimum(af, 15.0)[:, None]
            eg0 = jnp.where(
                (a >= 15)[:, None],
                byp * (2.0 * jnp.floor(
                    jnp.log2(jnp.maximum(af - 14.0, 1.0)))[:, None] + 1.0),
                gt1e0[None, :])
            return b0e1[None, :] + (mm - 2.0) * gt1e1[None, :] + eg0 + byp

        gt_base = cost + flv[None, :]
        m2 = jnp.where((a1 > 1)[:, None], gt_base + lcg(a1, a1f)
                       + da1[:, None], BIG)
        m4 = jnp.where((a2 > 1)[:, None], gt_base + lcg(a2, a2f)
                       + da2[:, None], BIG)
        mc0 = cost + d0[:, None] + (sig0 * started_ind)[None, :]
        mc = jnp.concatenate([mc0, m1, m2, m3, m4,
                              jnp.full((B, 1), BIG)], axis=1)  # (B,46)
        grouped = jnp.einsum("bf,fg->bg", mc, SELj,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32
                             ).reshape(B, 9, G)
        kk = jnp.argmin(grouped, axis=2)                       # (B,9)
        new_cost = jnp.min(grouped, axis=2)
        oneh = (jnp.arange(G, dtype=jnp.int32)[None, None, :]
                == kk[:, :, None])
        new_src = jnp.where(oneh, SRCG[None], 0).sum(axis=2)
        kind = jnp.where(oneh, KINDG[None], 0).sum(axis=2)
        new_lvl = jnp.where(kind == 1, a1[:, None],
                            jnp.where(kind == 2, a2[:, None], 0))
        return new_cost, new_lvl.astype(jnp.int32), \
            new_src.astype(jnp.int32)

    del prec
    # position nc-1 first: significance inferred (no flags), no started
    # sources yet (their cost is BIG)
    cost, lvl0, src0 = step(cost, absc[:, nc - 1], dqf[:, nc - 1],
                            Lr[:, nc - 1], w[nc - 1],
                            jnp.float32(0.0), jnp.float32(0.0), BIG)

    # remaining positions nc-2 .. 0; unrolled scan: with ~10-op bodies the
    # While-loop per-iteration overhead dominated (~8ms/step), so unroll
    # buys ~100x here
    idx = np.arange(nc - 2, -1, -1)
    xs = (absc[:, idx].T, dqf[:, idx].T, Lr[:, idx].T,
          w[idx], sig[idx, 0], sig[idx, 1] + last[idx, 1],
          sig[idx, 1] + last[idx, 0])

    def body(cost, x):
        c_p, dq_p, lr, wp, sig0, fl, fm = x
        cost, lvl, src = step(cost, c_p, dq_p, lr, wp, sig0, fl, fm)
        return cost, (lvl, src)

    import jax
    cost, (lvls_s, srcs_s) = jax.lax.scan(
        body, cost, xs, unroll=nc - 1 if nc == 16 else 9)
    lvl_recs = jnp.concatenate([lvl0[None], lvls_s])    # (nc, B, 9)
    src_recs = jnp.concatenate([src0[None], srcs_s])

    # coded_block_flag decides all-zero (unstarted) vs any-nonzero
    fin = cost + jnp.concatenate(
        [jnp.broadcast_to(cbf[1], (B, 8)),
         jnp.broadcast_to(cbf[0], (B, 1))], axis=1)
    state = jnp.argmin(fin, axis=1).astype(jnp.int32)

    # backtrack: walk the records last-step-first (reverse scan); output
    # index k of the scan = DP step k = scan position nc-1-k
    def back(state, rec):
        lrec, srec = rec
        onehot = (jnp.arange(nstate)[None, :] == state[:, None])
        a = jnp.where(onehot, lrec, 0).sum(axis=1)
        state = jnp.where(onehot, srec, 0).sum(axis=1).astype(jnp.int32)
        return state, a

    _, lv_steps = jax.lax.scan(back, state, (lvl_recs, src_recs),
                               reverse=True, unroll=nc)
    lv = lv_steps[::-1].T                    # (B, nc), position order
    return jnp.where(coefs_zz < 0, -lv, lv).astype(jnp.int32)
