"""Device (JAX) in-loop deblocking (spec 8.7; parity: reference
common/deblock.c x264_frame_deblock_row + x264_macroblock_deblock_strength).

TPU-first split:
  * boundary strengths are a pure function of (mb class, nnz, mv, ref) —
    computed for every edge of the frame in one batched pass (bs_grids);
  * pixel filtering has the classic MB wavefront dependency
    (V(x,y) <- H(x-1,y); H(x,y) <- V(x+1,y-1), H(x,y-1)), so MBs on the
    knight diagonal t = x + 2y are independent: a lax.scan over t filters
    each diagonal's MBs as a batch, each MB working on a 20x20 halo window
    (12x12 chroma) with disjoint scatter-backs.
Bit-exact vs ops/reference/deblock.py (MB raster order), because every MB
reads only finalized neighbor pixels under this schedule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x264_tpu.ops.reference.deblock import ALPHA, BETA, TC0

_ALPHA = jnp.asarray(ALPHA.astype(np.int32))
_BETA = jnp.asarray(BETA.astype(np.int32))
_TC0 = jnp.asarray(TC0.astype(np.int32))


def bs_grids(mb_intra, luma_nnz, mv, ref, mbw: int, mbh: int, t8=None):
    """Boundary strengths for every 4-px edge.

    mb_intra (N,) bool; luma_nnz (N,16) raster-block; mv (N,2) per-MB or
    (N,4,2) per-QUADRANT (partitioned P frames: internal 8x8 edges then
    get the mv-discontinuity bS=1 rule, 8.7.2.1); ref (N,) or (N,4).
    t8 (N,) bool or None: MBs coded with the 8x8 transform do not filter
    their interior 4x4 luma edges (8.7: only edges 0 and 2 exist).
    Returns (bs_v, bs_h) (4*mbh, 4*mbw) int32: bs_v[gy,gx] = strength of
    the vertical edge left of block (gy,gx); frame-boundary edges are 0."""
    gh, gw = 4 * mbh, 4 * mbw
    nnz = (luma_nnz.reshape(mbh, mbw, 4, 4).transpose(0, 2, 1, 3)
           .reshape(gh, gw))
    intra_mb = mb_intra.reshape(mbh, mbw)
    intra_g = jnp.repeat(jnp.repeat(intra_mb, 4, 0), 4, 1)
    if mv.ndim == 3:         # quadrant-granular (q = 2*qy + qx)
        mv_g = (jnp.repeat(jnp.repeat(
            mv.reshape(mbh, mbw, 2, 2, 2), 2, axis=2), 2, axis=3)
            .transpose(0, 2, 1, 3, 4).reshape(gh, gw, 2))
        ref_g = (jnp.repeat(jnp.repeat(
            ref.reshape(mbh, mbw, 2, 2), 2, axis=2), 2, axis=3)
            .transpose(0, 2, 1, 3).reshape(gh, gw))
    else:
        mv_g = jnp.repeat(jnp.repeat(mv.reshape(mbh, mbw, 2), 4, 0), 4, 1)
        ref_g = jnp.repeat(jnp.repeat(ref.reshape(mbh, mbw), 4, 0), 4, 1)

    col = jnp.arange(gw)[None, :]
    row = jnp.arange(gh)[:, None]

    def one_dir(shift_axis):
        if shift_axis == 1:     # vertical edges: p = left neighbor
            p_nnz = jnp.pad(nnz[:, :-1], ((0, 0), (1, 0)))
            p_intra = jnp.pad(intra_g[:, :-1], ((0, 0), (1, 0)))
            p_mv = jnp.pad(mv_g[:, :-1], ((0, 0), (1, 0), (0, 0)))
            p_ref = jnp.pad(ref_g[:, :-1], ((0, 0), (1, 0)))
            mb_edge = (col % 4) == 0
            exists = col > 0
        else:                   # horizontal edges: p = top neighbor
            p_nnz = jnp.pad(nnz[:-1, :], ((1, 0), (0, 0)))
            p_intra = jnp.pad(intra_g[:-1, :], ((1, 0), (0, 0)))
            p_mv = jnp.pad(mv_g[:-1, :], ((1, 0), (0, 0), (0, 0)))
            p_ref = jnp.pad(ref_g[:-1, :], ((1, 0), (0, 0)))
            mb_edge = (row % 4) == 0
            exists = row > 0

        nz = (nnz > 0) | (p_nnz > 0)
        mvdiff = ((ref_g != p_ref)
                  | (jnp.abs(mv_g[..., 0] - p_mv[..., 0]) >= 4)
                  | (jnp.abs(mv_g[..., 1] - p_mv[..., 1]) >= 4))
        bs = jnp.where(mb_edge & (intra_g | p_intra), 4,
             jnp.where(intra_g, 3,
             jnp.where(nz, 2, jnp.where(mvdiff, 1, 0))))
        if t8 is not None:
            t8_g = jnp.repeat(jnp.repeat(t8.reshape(mbh, mbw), 4, 0), 4, 1)
            odd = ((col if shift_axis == 1 else row) % 2) == 1
            bs = jnp.where(t8_g & odd, 0, bs)
        return jnp.where(exists, bs, 0).astype(jnp.int32)

    return one_dir(1), one_dir(0)


def bs_grids_b(luma_nnz, mv0, mv1, any0, any1, mbw: int, mbh: int,
               intra=None, t8=None):
    """Boundary strengths for a B frame (8.7.2.1 B rules): our B MBs use
    one ref per list and L0pic != L1pic, so the reference SETS are
    characterised by the (uses L0, uses L1) flag pair and the
    swapped-assignment case cannot occur.  intra (N,) bool or None:
    I16x16 escape MBs — bS 4 on their MB edges, 3 inside."""
    gh, gw = 4 * mbh, 4 * mbw
    nnz = (luma_nnz.reshape(mbh, mbw, 4, 4).transpose(0, 2, 1, 3)
           .reshape(gh, gw))

    def rep(x):
        return jnp.repeat(jnp.repeat(x.reshape(mbh, mbw, *x.shape[1:]),
                                     4, 0), 4, 1)

    def rep_mv(x):
        """(N,2) uniform or (N,4,2) quad-grain -> per-4x4 (gh,gw,2)."""
        if x.ndim == 2:
            return rep(x)
        g = x.reshape(mbh, mbw, 2, 2, 2).transpose(0, 2, 1, 3, 4)
        g = g.reshape(2 * mbh, 2 * mbw, 2)
        return jnp.repeat(jnp.repeat(g, 2, 0), 2, 1)

    m0 = rep_mv(mv0)
    m1 = rep_mv(mv1)
    a0 = rep(any0.astype(jnp.int32))
    a1 = rep(any1.astype(jnp.int32))
    ig = (rep(intra.astype(jnp.int32)) if intra is not None else None)
    col = jnp.arange(gw)[None, :]
    row = jnp.arange(gh)[:, None]

    def one_dir(axis):
        if axis == 1:
            def sh(x):
                pad = [(0, 0)] * x.ndim
                pad[1] = (1, 0)
                return jnp.pad(x[:, :-1], pad)
            exists = col > 0
            mb_edge = (col % 4) == 0
        else:
            def sh(x):
                pad = [(0, 0)] * x.ndim
                pad[0] = (1, 0)
                return jnp.pad(x[:-1], pad)
            exists = row > 0
            mb_edge = (row % 4) == 0
        nz = (nnz > 0) | (sh(nnz) > 0)
        set_diff = (a0 != sh(a0)) | (a1 != sh(a1))
        d0 = (jnp.abs(m0 - sh(m0)) >= 4).any(-1) & (a0 > 0)
        d1 = (jnp.abs(m1 - sh(m1)) >= 4).any(-1) & (a1 > 0)
        bs = jnp.where(nz, 2,
                       jnp.where(set_diff | d0 | d1, 1, 0))
        if ig is not None:
            bs = jnp.where(mb_edge & ((ig > 0) | (sh(ig) > 0)), 4,
                           jnp.where(ig > 0, 3, bs))
        if t8 is not None:
            t8_g = jnp.repeat(jnp.repeat(t8.reshape(mbh, mbw), 4, 0), 4, 1)
            odd = ((col if axis == 1 else row) % 2) == 1
            bs = jnp.where(t8_g & odd, 0, bs)
        return jnp.where(exists, bs, 0).astype(jnp.int32)

    return one_dir(1), one_dir(0)


def _luma_filter_params(p3, p2, p1, p0, q0, q1, q2, q3,
                        on, bs4, alpha, beta, tc0):
    """Normative luma edge filter (8.7.2.2/.3) on precomputed per-line
    parameters: on = bs>0, bs4 = bs==4, alpha/beta/tc0 table values.
    Shared verbatim by the XLA scan and the Pallas kernel."""
    filt = on & (jnp.abs(p0 - q0) < alpha) & \
           (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta

    tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0_n = jnp.clip(p0 + delta, 0, 255)
    q0_n = jnp.clip(q0 - delta, 0, 255)
    p1_n = jnp.where(ap, p1 + jnp.clip(
        (p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1, -tc0, tc0), p1)
    q1_n = jnp.where(aq, q1 + jnp.clip(
        (q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1, -tc0, tc0), q1)

    strong = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = ap & strong
    sq = aq & strong
    p0_s = jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                     (2 * p1 + p0 + q1 + 2) >> 2)
    p1_s = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    p2_s = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    q0_s = jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                     (2 * q1 + q0 + p1 + 2) >> 2)
    q1_s = jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    q2_s = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)

    return (jnp.where(filt & bs4, p2_s, p2),
            jnp.where(filt, jnp.where(bs4, p1_s, p1_n), p1),
            jnp.where(filt, jnp.where(bs4, p0_s, p0_n), p0),
            jnp.where(filt, jnp.where(bs4, q0_s, q0_n), q0),
            jnp.where(filt, jnp.where(bs4, q1_s, q1_n), q1),
            jnp.where(filt & bs4, q2_s, q2))


def _edge_tables(bs, qp_av, off_a, off_b):
    idx_a = jnp.clip(qp_av + off_a, 0, 51)
    idx_b = jnp.clip(qp_av + off_b, 0, 51)
    return (bs > 0, bs == 4, _ALPHA[idx_a], _BETA[idx_b],
            _TC0[idx_a, jnp.clip(bs, 1, 3) - 1])


def _luma_filter(p3, p2, p1, p0, q0, q1, q2, q3, bs, qp_av, off_a, off_b):
    on, bs4, alpha, beta, tc0 = _edge_tables(bs, qp_av, off_a, off_b)
    return _luma_filter_params(p3, p2, p1, p0, q0, q1, q2, q3,
                               on, bs4, alpha, beta, tc0)


def _chroma_filter_params(p1, p0, q0, q1, on, bs4, alpha, beta, tc0):
    """Normative chroma edge filter (8.7.2.2/.3), parameter form."""
    filt = (on & (jnp.abs(p0 - q0) < alpha)
            & (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta))
    tc = tc0 + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0_n = jnp.clip(p0 + delta, 0, 255)
    q0_n = jnp.clip(q0 - delta, 0, 255)
    p0_s = (2 * p1 + p0 + q1 + 2) >> 2
    q0_s = (2 * q1 + q0 + p1 + 2) >> 2
    return (jnp.where(filt, jnp.where(bs4, p0_s, p0_n), p0),
            jnp.where(filt, jnp.where(bs4, q0_s, q0_n), q0))


def _chroma_filter(p1, p0, q0, q1, bs, qp_av, off_a, off_b):
    on, bs4, alpha, beta, tc0 = _edge_tables(bs, qp_av, off_a, off_b)
    return _chroma_filter_params(p1, p0, q0, q1, on, bs4, alpha, beta, tc0)


def _filter_mb_luma(w, bsv4, bsh4, qp_c, qp_l, qp_t, off_a, off_b):
    """w (20,20) int32 window (4-px top/left halo); bsv4/bsh4 (4,4):
    [block-row, edge] / [edge, block-col]."""
    for e in range(4):
        wc = 4 + 4 * e
        cols = [w[4:20, wc - 4 + i] for i in range(8)]
        bs16 = jnp.repeat(bsv4[:, e], 4)
        nb_qp = qp_l if e == 0 else qp_c
        qp_av = (qp_c + nb_qp + 1) >> 1
        res = _luma_filter(*cols, bs16, qp_av, off_a, off_b)
        w = w.at[4:20, wc - 3:wc + 3].set(jnp.stack(res, axis=1))
    for e in range(4):
        wr = 4 + 4 * e
        rows = [w[wr - 4 + i, 4:20] for i in range(8)]
        bs16 = jnp.repeat(bsh4[e, :], 4)
        nb_qp = qp_t if e == 0 else qp_c
        qp_av = (qp_c + nb_qp + 1) >> 1
        res = _luma_filter(*rows, bs16, qp_av, off_a, off_b)
        w = w.at[wr - 3:wr + 3, 4:20].set(jnp.stack(res, axis=0))
    return w


def _filter_mb_chroma(w, bsv4, bsh4, qpc_c, qpc_l, qpc_t, off_a, off_b):
    """w (12,12) chroma window (2-px halo); edges e in {0,2} only."""
    for e in (0, 2):
        wc = 2 + 2 * e
        bs8 = jnp.repeat(bsv4[:, e], 2)
        nb = qpc_l if e == 0 else qpc_c
        qp_av = (qpc_c + nb + 1) >> 1
        p1, p0 = w[2:10, wc - 2], w[2:10, wc - 1]
        q0, q1 = w[2:10, wc], w[2:10, wc + 1]
        np0, nq0 = _chroma_filter(p1, p0, q0, q1, bs8, qp_av, off_a, off_b)
        w = w.at[2:10, wc - 1].set(np0).at[2:10, wc].set(nq0)
    for e in (0, 2):
        wr = 2 + 2 * e
        bs8 = jnp.repeat(bsh4[e, :], 2)
        nb = qpc_t if e == 0 else qpc_c
        qp_av = (qpc_c + nb + 1) >> 1
        p1, p0 = w[wr - 2, 2:10], w[wr - 1, 2:10]
        q0, q1 = w[wr, 2:10], w[wr + 1, 2:10]
        np0, nq0 = _chroma_filter(p1, p0, q0, q1, bs8, qp_av, off_a, off_b)
        w = w.at[wr - 1, 2:10].set(np0).at[wr, 2:10].set(nq0)
    return w


def _skew(p, band_h: int, shift: int, left: int, width: int):
    """(H, W) -> (H, width): band y (rows y*band_h..) moved right by
    left + shift*y.  Out-of-content cells are 0."""
    hh, ww = p.shape
    r = jnp.arange(hh)
    c = jnp.arange(width)
    src = c[None, :] - left - shift * (r // band_h)[:, None]
    valid = (src >= 0) & (src < ww)
    return jnp.where(valid, p[r[:, None], jnp.clip(src, 0, ww - 1)], 0)


def _unskew(sp, band_h: int, shift: int, left: int, ww: int):
    hh = sp.shape[0]
    r = jnp.arange(hh)
    c = jnp.arange(ww)
    src = c[None, :] + left + shift * (r // band_h)[:, None]
    return sp[r[:, None], src]


def deblock_impl() -> str:
    """Pick the filter implementation for the current backend: the
    Mosaic kernel on real TPUs (9x faster at 1080p), the XLA scan
    elsewhere (CPU tests; interpret-mode Mosaic is far slower)."""
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _filter_by_impl(impl, y, u, v, bs_v, bs_h, qp_mb, qpc_mb,
                    off_a, off_b, mbw, mbh):
    # mbh=2 (32-lane skewed planes) miscompiles the Mosaic kernel when
    # it is embedded in an outer jit (wrong content in the second MB
    # band; standalone eager execution is fine — observed on v5e).
    # Frames this small are perf-irrelevant: use the XLA twin.
    if mbh < 3:
        impl = "xla"
    if impl == "pallas":
        from x264_tpu.ops.device.deblock_pallas import deblock_filter_pallas
        return deblock_filter_pallas(y, u, v, bs_v, bs_h, qp_mb, qpc_mb,
                                     off_a, off_b, mbw=mbw, mbh=mbh)
    return _deblock_filter(y, u, v, bs_v, bs_h, qp_mb, qpc_mb,
                           off_a, off_b, mbw=mbw, mbh=mbh)


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "impl",
                                             "cqp_off", "has_t8"))
def deblock_frame(y, u, v, mb_class, cbp_luma, cbp_chroma, luma_nnz,
                  mv, ref, qp_mb, off_a, off_b, mbw: int, mbh: int,
                  impl: str = "xla", cqp_off: int = 0, has_t8: bool = False,
                  t8=None, chroma_qp_table=None):
    """One-dispatch anchor deblock: the decoder-visible QP chain (7.4.5
    carry-over when a MB emits no residual), the chroma QP lookup, the
    intra mask, and the filter — fused so the host issues ONE module
    instead of ~25 eager ops per frame (each eager dispatch costs
    milliseconds of tunnel latency; see round-5 stage profile)."""
    n = mbw * mbh
    qp_mb = jnp.broadcast_to(jnp.asarray(qp_mb, jnp.int32).reshape(-1),
                             (n,))
    emits = (mb_class != 3) & ((cbp_luma != 0) | (cbp_chroma != 0)
                               | (mb_class == 0))
    idx = jnp.where(emits, jnp.arange(n, dtype=jnp.int32), -1)
    last = jax.lax.cummax(idx)
    qp_mb = jnp.where(last >= 0, qp_mb[jnp.maximum(last, 0)], qp_mb[0])
    qpc_mb = chroma_qp_table[jnp.clip(qp_mb + cqp_off, 0, 51)]
    bs_v, bs_h = bs_grids(mb_class <= 1, luma_nnz, mv, ref, mbw, mbh,
                          t8=t8 if has_t8 else None)
    return _filter_by_impl(impl, y, u, v, bs_v, bs_h, qp_mb, qpc_mb,
                           off_a, off_b, mbw, mbh)


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "impl"))
def deblock_core(y, u, v, mb_intra, luma_nnz, mv, ref, qp_mb, qpc_mb,
                 off_a, off_b, mbw: int, mbh: int, impl: str = "xla",
                 t8=None):
    """Filter recon planes, skewed-wavefront schedule.

    The knight wavefront t = x + 2y maps every diagonal MB to the SAME
    column in a layout where MB-row y is shifted right by 32y px — so each
    scan step filters one contiguous (H, 56) column slab with plain
    dynamic-update-slices (no scatter, no per-lane vmap).  Bit-exact vs
    the MB-raster reference (wavefront schedule preserves the spec's
    read-after-write order; see module docstring).  impl='pallas' runs
    the same schedule as one Mosaic kernel (deblock_pallas.py)."""
    bs_v, bs_h = bs_grids(mb_intra, luma_nnz, mv, ref, mbw, mbh, t8=t8)
    return _filter_by_impl(impl, y, u, v, bs_v, bs_h, qp_mb, qpc_mb,
                           off_a, off_b, mbw, mbh)


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "impl",
                                             "cqp_off", "has_t8"))
def deblock_frame_b(y, u, v, luma_nnz, mv0, mv1, any0, any1, qp,
                    off_a, off_b, mbw: int, mbh: int, impl: str = "xla",
                    cqp_off: int = 0, has_t8: bool = False,
                    intra=None, t8=None, chroma_qp_table=None):
    """One-dispatch B deblock: per-MB QP broadcast + chroma lookup +
    strengths + filter fused (see deblock_frame's rationale)."""
    n = mbw * mbh
    qp_mb = jnp.full((n,), jnp.asarray(qp, jnp.int32))
    qpc_mb = chroma_qp_table[jnp.clip(qp_mb + cqp_off, 0, 51)]
    bs_v, bs_h = bs_grids_b(luma_nnz, mv0, mv1, any0, any1, mbw, mbh,
                            intra=intra, t8=t8 if has_t8 else None)
    return _filter_by_impl(impl, y, u, v, bs_v, bs_h, qp_mb, qpc_mb,
                           off_a, off_b, mbw, mbh)


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "impl"))
def deblock_core_b(y, u, v, luma_nnz, mv0, mv1, any0, any1, qp_mb, qpc_mb,
                   off_a, off_b, mbw: int, mbh: int, impl: str = "xla",
                   intra=None, t8=None):
    """B-frame variant: strengths from the two-list rules (+ I16
    escapes when intra is given; t8: 8x8-transform MBs skip their
    internal 4x4 edges, 8.7's transform-block rule)."""
    bs_v, bs_h = bs_grids_b(luma_nnz, mv0, mv1, any0, any1, mbw, mbh,
                            intra=intra, t8=t8)
    return _filter_by_impl(impl, y, u, v, bs_v, bs_h, qp_mb, qpc_mb,
                           off_a, off_b, mbw, mbh)


def _deblock_filter(y, u, v, bs_v, bs_h, qp_mb, qpc_mb,
                    off_a, off_b, mbw: int, mbh: int):
    h, w = mbh * 16, mbw * 16
    n_steps = mbw + 2 * mbh - 2
    i32 = jnp.int32

    # +1 diagonal of slack so the scan can process diagonals in pairs
    # (the extra step lands on zero-bs padding and is a no-op)
    wsk_y = 16 * mbw + 32 * mbh + 24 + 16
    wsk_c = 8 * mbw + 16 * mbh + 12 + 8
    wsk_b = 4 * mbw + 8 * mbh - 4 + 4 + 4
    ysk = _skew(y.astype(i32), 16, 32, 36, wsk_y)
    usk = _skew(u.astype(i32), 8, 16, 18, wsk_c)
    vsk = _skew(v.astype(i32), 8, 16, 18, wsk_c)
    bsv_sk = _skew(bs_v, 4, 8, 0, wsk_b)
    bsh_sk = _skew(bs_h, 4, 8, 0, wsk_b)
    qp_sk = _skew(qp_mb.reshape(mbh, mbw), 1, 2, 2, mbw + 2 * mbh + 2)
    qpc_sk = _skew(qpc_mb.reshape(mbh, mbw), 1, 2, 2, mbw + 2 * mbh + 2)

    def one_diag(carry, t):
        ysk, usk, vsk = carry
        slab = jax.lax.dynamic_slice(ysk, (0, 16 * t), (h, 56))
        slab = slab.reshape(mbh, 16, 56)
        bsv = jax.lax.dynamic_slice(bsv_sk, (0, 4 * t), (4 * mbh, 4)
                                    ).reshape(mbh, 4, 4)   # [band, k, e]
        bsh = jax.lax.dynamic_slice(bsh_sk, (0, 4 * t), (4 * mbh, 4)
                                    ).reshape(mbh, 4, 4)   # [band, e, kcol]
        qp3 = jax.lax.dynamic_slice(qp_sk, (0, t), (mbh, 3))
        qp_t = jnp.concatenate([qp3[:1, 0], qp3[:-1, 0]])  # top MB qp
        qp_l, qp_c = qp3[:, 1], qp3[:, 2]

        # ---- luma vertical edges (all bands at once) ----
        for e in range(4):
            c = 36 + 4 * e
            cols = [slab[:, :, c - 4 + i] for i in range(8)]
            bs16 = jnp.repeat(bsv[:, :, e], 4, axis=1)
            nb = qp_l if e == 0 else qp_c
            qp_av = ((qp_c + nb + 1) >> 1)[:, None]
            res = _luma_filter(*cols, bs16, qp_av, off_a, off_b)
            slab = slab.at[:, :, c - 3:c + 3].set(jnp.stack(res, axis=2))

        # ---- luma horizontal edges ----
        for e in range(4):
            bs16 = jnp.repeat(bsh[:, e, :], 4, axis=1)
            if e == 0:
                p = jnp.concatenate(
                    [jnp.zeros((1, 4, 16), i32), slab[:-1, 12:16, 4:20]], 0)
                q = slab[:, 0:4, 36:52]
                lines = [p[:, i] for i in range(4)] + [q[:, i] for i in range(4)]
                qp_av = ((qp_c + qp_t + 1) >> 1)[:, None]
                res = _luma_filter(*lines, bs16, qp_av, off_a, off_b)
                slab = slab.at[:-1, 13:16, 4:20].set(
                    jnp.stack(res[:3], axis=1)[1:])
                slab = slab.at[:, 0:3, 36:52].set(jnp.stack(res[3:], axis=1))
            else:
                wr = 4 * e
                lines = [slab[:, wr - 4 + i, 36:52] for i in range(8)]
                qp_av = ((qp_c + qp_c + 1) >> 1)[:, None]
                res = _luma_filter(*lines, bs16, qp_av, off_a, off_b)
                slab = slab.at[:, wr - 3:wr + 3, 36:52].set(
                    jnp.stack(res, axis=1))
        ysk = jax.lax.dynamic_update_slice(ysk, slab.reshape(h, 56),
                                           (0, 16 * t))

        # ---- chroma (U, V) ----
        qpc3 = jax.lax.dynamic_slice(qpc_sk, (0, t), (mbh, 3))
        qpc_t = jnp.concatenate([qpc3[:1, 0], qpc3[:-1, 0]])
        qpc_l, qpc_c = qpc3[:, 1], qpc3[:, 2]

        def chroma(psk):
            cs = jax.lax.dynamic_slice(psk, (0, 8 * t), (8 * mbh, 28))
            cs = cs.reshape(mbh, 8, 28)
            for e in (0, 2):
                c = 18 + 2 * e
                bs8 = jnp.repeat(bsv[:, :, e], 2, axis=1)
                nb = qpc_l if e == 0 else qpc_c
                qp_av = ((qpc_c + nb + 1) >> 1)[:, None]
                p1, p0 = cs[:, :, c - 2], cs[:, :, c - 1]
                q0, q1 = cs[:, :, c], cs[:, :, c + 1]
                np0, nq0 = _chroma_filter(p1, p0, q0, q1, bs8, qp_av,
                                          off_a, off_b)
                cs = cs.at[:, :, c - 1].set(np0).at[:, :, c].set(nq0)
            for e in (0, 2):
                bs8 = jnp.repeat(bsh[:, e, :], 2, axis=1)
                if e == 0:
                    p1 = jnp.concatenate(
                        [jnp.zeros((1, 8), i32), cs[:-1, 6, 2:10]], 0)
                    p0 = jnp.concatenate(
                        [jnp.zeros((1, 8), i32), cs[:-1, 7, 2:10]], 0)
                    q0, q1 = cs[:, 0, 18:26], cs[:, 1, 18:26]
                    qp_av = ((qpc_c + qpc_t + 1) >> 1)[:, None]
                    np0, nq0 = _chroma_filter(p1, p0, q0, q1, bs8, qp_av,
                                              off_a, off_b)
                    cs = cs.at[:-1, 7, 2:10].set(np0[1:])
                    cs = cs.at[:, 0, 18:26].set(nq0)
                else:
                    wr = 2 * e
                    p1, p0 = cs[:, wr - 2, 18:26], cs[:, wr - 1, 18:26]
                    q0, q1 = cs[:, wr, 18:26], cs[:, wr + 1, 18:26]
                    qp_av = qpc_c[:, None]
                    np0, nq0 = _chroma_filter(p1, p0, q0, q1, bs8, qp_av,
                                              off_a, off_b)
                    cs = cs.at[:, wr - 1, 18:26].set(np0)
                    cs = cs.at[:, wr, 18:26].set(nq0)
            return jax.lax.dynamic_update_slice(psk, cs.reshape(8 * mbh, 28),
                                                (0, 8 * t))

        usk = chroma(usk)
        vsk = chroma(vsk)
        return (ysk, usk, vsk)

    def step(carry, i):
        carry = one_diag(carry, 2 * i)
        carry = one_diag(carry, 2 * i + 1)
        return carry, None

    (ysk, usk, vsk), _ = jax.lax.scan(
        step, (ysk, usk, vsk),
        jnp.arange((n_steps + 1) // 2, dtype=i32))
    return (_unskew(ysk, 16, 32, 36, w).astype(jnp.uint8),
            _unskew(usk, 8, 16, 18, w // 2).astype(jnp.uint8),
            _unskew(vsk, 8, 16, 18, w // 2).astype(jnp.uint8))


@functools.partial(jax.jit, static_argnames=("mbw", "mbh"))
def deblock_core_windows(y, u, v, mb_intra, luma_nnz, mv, ref, qp_mb, qpc_mb,
                         off_a, off_b, mbw: int, mbh: int):
    """Original per-lane window implementation (kept as cross-check)."""
    h, w = mbh * 16, mbw * 16
    bs_v, bs_h = bs_grids(mb_intra, luma_nnz, mv, ref, mbw, mbh)

    # luma windows (20x20 at 16 spacing) exactly fit a 4-px top/left pad;
    # chroma windows (12x12 at 8 spacing) also overhang 2 px right/bottom —
    # pad both sides there or dynamic_slice clamps and shifts the gather.
    yp = jnp.pad(y.astype(jnp.int32), ((4, 0), (4, 0)))
    up = jnp.pad(u.astype(jnp.int32), ((2, 2), (2, 2)))
    vp = jnp.pad(v.astype(jnp.int32), ((2, 2), (2, 2)))

    lanes = min(mbh, (mbw + 1) // 2 + 1)
    n_steps = mbw + 2 * mbh - 2
    lane = jnp.arange(lanes, dtype=jnp.int32)
    r20 = jnp.arange(20, dtype=jnp.int32)
    r12 = jnp.arange(12, dtype=jnp.int32)

    def step(carry, t):
        yp, up, vp = carry
        ymin = jnp.maximum(0, -(-(t - (mbw - 1)) // 2))
        ys = ymin + lane
        xs = t - 2 * ys
        valid = (ys < mbh) & (xs >= 0) & (xs < mbw)
        ysv = jnp.where(valid, ys, 0)
        xsv = jnp.where(valid, xs, 0)
        mb = ysv * mbw + xsv
        mb_l = jnp.maximum(mb - 1, 0)
        mb_t = jnp.maximum(mb - mbw, 0)

        wy = jax.vmap(lambda a, b: jax.lax.dynamic_slice(
            yp, (a * 16, b * 16), (20, 20)))(ysv, xsv)
        bsv4 = jax.vmap(lambda a, b: jax.lax.dynamic_slice(
            bs_v, (a * 4, b * 4), (4, 4)))(ysv, xsv)
        bsh4 = jax.vmap(lambda a, b: jax.lax.dynamic_slice(
            bs_h, (a * 4, b * 4), (4, 4)))(ysv, xsv)
        wy = jax.vmap(_filter_mb_luma,
                      in_axes=(0, 0, 0, 0, 0, 0, None, None))(
            wy, bsv4, bsh4, qp_mb[mb], qp_mb[mb_l], qp_mb[mb_t],
            off_a, off_b)

        oob = jnp.where(valid, ysv * 16, jnp.int32(16 * mbh * mbw + 64))
        yy = oob[:, None, None] + r20[None, :, None]
        xx = (xsv * 16)[:, None, None] + r20[None, None, :]
        yp = yp.at[yy, xx].set(wy, mode="drop")

        wu = jax.vmap(lambda a, b: jax.lax.dynamic_slice(
            up, (a * 8, b * 8), (12, 12)))(ysv, xsv)
        wv = jax.vmap(lambda a, b: jax.lax.dynamic_slice(
            vp, (a * 8, b * 8), (12, 12)))(ysv, xsv)
        wu = jax.vmap(_filter_mb_chroma,
                      in_axes=(0, 0, 0, 0, 0, 0, None, None))(
            wu, bsv4, bsh4, qpc_mb[mb], qpc_mb[mb_l], qpc_mb[mb_t],
            off_a, off_b)
        wv = jax.vmap(_filter_mb_chroma,
                      in_axes=(0, 0, 0, 0, 0, 0, None, None))(
            wv, bsv4, bsh4, qpc_mb[mb], qpc_mb[mb_l], qpc_mb[mb_t],
            off_a, off_b)
        oc = jnp.where(valid, ysv * 8, jnp.int32(8 * mbh * mbw + 64))
        cyy = oc[:, None, None] + r12[None, :, None]
        cxx = (xsv * 8)[:, None, None] + r12[None, None, :]
        up = up.at[cyy, cxx].set(wu, mode="drop")
        vp = vp.at[cyy, cxx].set(wv, mode="drop")
        return (yp, up, vp), None

    (yp, up, vp), _ = jax.lax.scan(
        step, (yp, up, vp), jnp.arange(n_steps, dtype=jnp.int32))
    return (yp[4:, 4:].astype(jnp.uint8),
            up[2:-2, 2:-2].astype(jnp.uint8),
            vp[2:-2, 2:-2].astype(jnp.uint8))
