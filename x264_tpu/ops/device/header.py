"""Device (JAX) MB-header syntax: P_Skip/MVP classification and the per-MB
header codes, so the entire slice body is device-resident (parity:
reference common/mvpred.c x264_mb_predict_mv / x264_mb_predict_mv_pskip
and encoder/cavlc.c macroblock header writing; bit-exact ports of
models/inter_device.classify_pframe_vec and
bitstream/slice_writer_vec.header_slots)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from x264_tpu.bitstream.tables import CBP_TO_GOLOMB

_CBP2G = jnp.asarray(CBP_TO_GOLOMB.astype(np.int32))
MB_P16_D, MB_PSKIP_D = 2, 3   # match models.syntax MB_P16 / MB_PSKIP
MB_I16_D = 0

HEADER_SLOTS = 9


def bit_length(x):
    """Exact bit_length for 0 <= x < 2^16 via comparisons."""
    x = x.astype(jnp.int32)
    out = jnp.zeros_like(x)
    for k in range(16):
        out = out + (x >= (1 << k)).astype(jnp.int32)
    return out


def ue_codes(v):
    vv = v.astype(jnp.int32) + 1
    nb = bit_length(vv)
    return vv, 2 * nb - 1


def se_codes(v):
    v = v.astype(jnp.int32)
    return ue_codes(jnp.where(v > 0, 2 * v - 1, -2 * v))


def classify_p(mv, cbp_luma, cbp_chroma, mbw: int, mbh: int, ref=None,
               intra=None):
    """P16x16 skip/MVP classification (8.4.1), fully parallel (see
    classify_pframe_vec for why; still true with multi-ref: every decoded
    (mv, ref) equals the chosen one).  mv (N,2) int32 qpel; ref (N,) or
    None (all 0); intra (N,) bool or None — intra-coded MBs contribute
    (mv 0, ref -1) to their neighbours (8.4.1.3.2) and are classed
    MB_I16_D.  Returns (mb_class (N,), mvd (N,2))."""
    n = mbw * mbh
    m = mv.astype(jnp.int32).reshape(mbh, mbw, 2)
    r = (jnp.zeros(n, jnp.int32) if ref is None
         else ref.astype(jnp.int32)).reshape(mbh, mbw)
    if intra is not None:
        ig = intra.reshape(mbh, mbw)
        m = jnp.where(ig[..., None], 0, m)
        r = jnp.where(ig, -1, r)

    def shifted(dy, dx):
        mvn = jnp.zeros_like(m)
        rn = jnp.full_like(r, -1)
        av = jnp.zeros((mbh, mbw), bool)
        ys = slice(max(dy, 0), mbh + min(dy, 0))
        xs = slice(max(dx, 0), mbw + min(dx, 0))
        yd = slice(max(-dy, 0), mbh + min(-dy, 0))
        xd = slice(max(-dx, 0), mbw + min(-dx, 0))
        mvn = mvn.at[yd, xd].set(m[ys, xs])
        rn = rn.at[yd, xd].set(r[ys, xs])
        av = av.at[yd, xd].set(True)
        return mvn, rn, av

    mva, ra, av_a = shifted(0, -1)
    mvb, rb, av_b = shifted(-1, 0)
    mvc, rc, av_c = shifted(-1, 1)
    mvd_, rd, av_d = shifted(-1, -1)
    use_d = ~av_c
    mvc = jnp.where(use_d[..., None], mvd_, mvc)
    rc = jnp.where(use_d, rd, rc)
    av_c = jnp.where(use_d, av_d, av_c)

    za = mva * av_a[..., None]
    zb = mvb * av_b[..., None]
    zc = mvc * av_c[..., None]
    med = jnp.sort(jnp.stack([za, zb, zc], axis=0), axis=0)[1]
    only_a = av_a & ~av_b & ~av_c

    def mvp_for(cur_ref):
        """Median MVP for reference index cur_ref (8.4.1.3)."""
        sa = ra == cur_ref
        sb = rb == cur_ref
        sc = rc == cur_ref
        one = (sa.astype(jnp.int32) + sb + sc) == 1
        one_mv = (mva * sa[..., None] + mvb * sb[..., None]
                  + mvc * sc[..., None])
        return jnp.where(only_a[..., None], mva,
                         jnp.where(one[..., None], one_mv, med))

    mvp = mvp_for(r)
    mvp0 = mvp_for(jnp.zeros_like(r))

    yy = jnp.arange(mbh)[:, None]
    xx = jnp.arange(mbw)[None, :]
    edge = (yy == 0) | (xx == 0)
    a_zero = av_a & (ra == 0) & (mva == 0).all(-1)
    b_zero = av_b & (rb == 0) & (mvb == 0).all(-1)
    skip_mv = jnp.where((edge | a_zero | b_zero)[..., None],
                        jnp.zeros_like(m), mvp0)

    flat_mv = m.reshape(-1, 2)
    is_skip = ((cbp_luma == 0) & (cbp_chroma == 0)
               & (r.reshape(-1) == 0)
               & (flat_mv == skip_mv.reshape(-1, 2)).all(1))
    mb_class = jnp.where(is_skip, MB_PSKIP_D, MB_P16_D).astype(jnp.int32)
    if intra is not None:
        mb_class = jnp.where(intra, MB_I16_D, mb_class)
    mvd = jnp.where(is_skip[:, None], 0, flat_mv - mvp.reshape(-1, 2))
    return mb_class, mvd


# (shape, part) -> (lbx, lby, pw, ph) in 4x4-block units (7.4.5.2 order)
_PART_GEOM = {
    (0, 0): (0, 0, 4, 4),
    (1, 0): (0, 0, 4, 2), (1, 1): (0, 2, 4, 2),
    (2, 0): (0, 0, 2, 4), (2, 1): (2, 0, 2, 4),
    (3, 0): (0, 0, 2, 2), (3, 1): (2, 0, 2, 2),
    (3, 2): (0, 2, 2, 2), (3, 3): (2, 2, 2, 2),
}


def classify_p_parts(mv8, ref8, shape, cbp_luma, cbp_chroma, mbw: int,
                     mbh: int, intra=None):
    """Partition-aware P classification: P_Skip + normative per-partition
    MVP/mvd (8.4.1.3) — fully parallel.  The 16x16-only proof
    (classify_p) extends: every decoded 4x4 block's (mv, ref) equals the
    encoder's chosen value regardless of neighbours (a skip's mv is the
    skip mv by definition), so partition MVPs are pure functions of the
    chosen 4x4-grain field; decode-order availability (e.g. the C
    neighbour of a 16x8 bottom partition lies in the not-yet-decoded
    right MB) is STATIC per (shape, part), enumerated below.  Oracle:
    models/mvpred.classify_p_parts_scan (bit-exact, tested).

    mv8 (N,4,2) per-quadrant chosen mvs (q = 2*qy+qx); ref8 (N,4);
    shape (N,) in {0:16x16, 1:16x8, 2:8x16, 3:8x8}; intra (N,) bool or
    None.  Returns (mb_class (N,), mvd_part (N,4,2) partition-slot
    order, is_skip (N,))."""
    n = mbw * mbh
    h4, w4 = 4 * mbh, 4 * mbw
    mv8 = mv8.astype(jnp.int32)
    ref8 = ref8.astype(jnp.int32)
    # 4x4-grain chosen grids (quad -> 2x2 blocks)
    mvq = mv8.reshape(mbh, mbw, 2, 2, 2)       # (my, mx, qy, qx, 2)
    mv4 = (jnp.repeat(jnp.repeat(mvq, 2, axis=2), 2, axis=3)
           .transpose(0, 2, 1, 3, 4).reshape(h4, w4, 2))
    refq = ref8.reshape(mbh, mbw, 2, 2)
    ref4 = (jnp.repeat(jnp.repeat(refq, 2, axis=2), 2, axis=3)
            .transpose(0, 2, 1, 3).reshape(h4, w4))
    if intra is not None:
        ig = jnp.repeat(jnp.repeat(intra.reshape(mbh, mbw), 4, 0), 4, 1)
        mv4 = jnp.where(ig[..., None], 0, mv4)
        ref4 = jnp.where(ig, -1, ref4)

    # pad 4 blocks on every side so any (oy, ox) in [-1, 4] resolves
    # (samp()'s contiguous-slice pick needs a full 4*mbh/4*mbw window,
    # so 4 is the max offset this pad supports)
    # (bottom pad feeds only the contiguous-slice length in samp(), the
    # picked rows never reach it)
    mv4p = jnp.pad(mv4, ((4, 4), (4, 4), (0, 0)))
    ref4p = jnp.pad(ref4, ((4, 4), (4, 4)), constant_values=-1)

    def samp(oy: int, ox: int):
        """Grid values at (4*my + oy, 4*mx + ox) for all MBs -> flat
        (mv (N,2), ref (N,)).  Written as contiguous slice + reshape
        (not a doubly-strided slice): the strided form, fused into a
        larger program, hits a backend miscompile (worker kernel
        fault) — the reshape lowering is equivalent and safe."""
        def pick(a):
            rows = a[oy + 4: oy + 4 + 4 * mbh]
            rows = rows.reshape((mbh, 4) + rows.shape[1:])[:, 0]
            cols = rows[:, ox + 4: ox + 4 + 4 * mbw]
            cols = cols.reshape((mbh, mbw, 4) + cols.shape[2:])[:, :, 0]
            return cols
        return pick(mv4p).reshape(n, 2), pick(ref4p).reshape(n)

    mbyv = (jnp.arange(n, dtype=jnp.int32) // mbw)
    mbxv = (jnp.arange(n, dtype=jnp.int32) % mbw)
    TRUE = jnp.ones(n, bool)
    at = mbyv > 0
    al = mbxv > 0
    ar = mbxv < (mbw - 1)

    def neigh(oy, ox, avail):
        mv, rf = samp(oy, ox)
        mv = jnp.where(avail[:, None], mv, 0)
        rf = jnp.where(avail, rf, -1)
        return mv, rf, avail

    def median3(a, b, c):
        # comparison form (no sort op): exact median of three ints
        return jnp.maximum(jnp.minimum(a, b),
                           jnp.minimum(jnp.maximum(a, b), c))

    def mvp_of(A, B, C, cur_ref, directional=None):
        """8.4.1.3 / 8.4.1.3.1 from neighbour triples (mv, ref, avail)."""
        mva, ra, av_a = A
        mvb, rb, av_b = B
        mvc, rc, av_c = C
        sa = ra == cur_ref
        sb = rb == cur_ref
        sc = rc == cur_ref
        one = (sa.astype(jnp.int32) + sb + sc) == 1
        one_mv = (mva * sa[:, None] + mvb * sb[:, None]
                  + mvc * sc[:, None])
        med = median3(mva, mvb, mvc)
        only_a = av_a & ~av_b & ~av_c
        mvp = jnp.where(only_a[:, None], mva,
                        jnp.where(one[:, None], one_mv, med))
        if directional is not None:
            dmv, dref = directional
            mvp = jnp.where((dref == cur_ref)[:, None], dmv, mvp)
        return mvp

    # per-combo MVPs; combo key (shape, part)
    mvp_combo = {}
    skip_parts = {}
    for (sh, p), (lbx, lby, pw, ph) in _PART_GEOM.items():
        A = neigh(lby, lbx - 1, TRUE if lbx > 0 else al)
        B = neigh(lby - 1, lbx, TRUE if lby > 0 else at)
        # C availability / D substitution (static decode-order rules)
        cy, cx = lby - 1, lbx + pw
        if (sh, p) in ((1, 1), (3, 3)):
            c_av = jnp.zeros(n, bool)           # right MB: not decoded
        elif cy >= 0 and cx < 4:
            c_av = TRUE                          # same MB, earlier part
        elif cy < 0 and cx >= 4:
            c_av = at & ar                       # above-right MB
        elif cy < 0:
            c_av = at                            # above MB
        else:
            c_av = TRUE
        dy_, dx_ = lby - 1, lbx - 1
        if dy_ >= 0 and dx_ >= 0:
            d_av = TRUE                          # same MB, earlier part
        elif dy_ >= 0:
            d_av = al                            # left MB
        elif dx_ >= 0:
            d_av = at                            # above MB
        else:
            d_av = at & al                       # above-left MB
        Cmv, Cr = samp(cy, cx)
        Dmv, Dr = samp(dy_, dx_)
        use_d = ~c_av
        Cn = (jnp.where(use_d[:, None], jnp.where(d_av[:, None], Dmv, 0),
                        jnp.where(c_av[:, None], Cmv, 0)),
              jnp.where(use_d, jnp.where(d_av, Dr, -1),
                        jnp.where(c_av, Cr, -1)),
              jnp.where(use_d, d_av, c_av))

        q = (lby // 2) * 2 + (lbx // 2)
        cur_ref = ref8[:, q]
        directional = None
        if sh == 1:
            directional = (B[0], B[1]) if p == 0 else (A[0], A[1])
        elif sh == 2:
            directional = (A[0], A[1]) if p == 0 else (Cn[0], Cn[1])
        mvp_combo[(sh, p)] = mvp_of(A, B, Cn, cur_ref, directional)
        if (sh, p) == (0, 0):
            # P_Skip pieces (8.4.1.1): zero-mv A/B shortcut + ref-0 MVP
            mvp0 = mvp_of(A, B, Cn, jnp.zeros(n, jnp.int32))
            a_zero = A[2] & (A[1] == 0) & (A[0] == 0).all(-1)
            b_zero = B[2] & (B[1] == 0) & (B[0] == 0).all(-1)
            edge = ~at | ~al
            skip_parts = dict(mvp0=mvp0, zero=edge | a_zero | b_zero)

    skip_mv = jnp.where(skip_parts["zero"][:, None], 0,
                        skip_parts["mvp0"])
    is_skip = ((shape == 0) & (cbp_luma == 0) & (cbp_chroma == 0)
               & (ref8[:, 0] == 0) & (mv8[:, 0] == skip_mv).all(-1))
    if intra is not None:
        is_skip = is_skip & ~intra

    # mvd per partition slot, selected by the MB's shape
    mvd_part = jnp.zeros((n, 4, 2), jnp.int32)
    first_q = {(0, 0): 0, (1, 0): 0, (1, 1): 2, (2, 0): 0, (2, 1): 1,
               (3, 0): 0, (3, 1): 1, (3, 2): 2, (3, 3): 3}
    for (sh, p), mvp in mvp_combo.items():
        sel = shape == sh
        mvd_part = mvd_part.at[:, p].set(
            jnp.where(sel[:, None], mv8[:, first_q[(sh, p)]] - mvp,
                      mvd_part[:, p]))
    mvd_part = jnp.where(is_skip[:, None, None], 0, mvd_part)
    if intra is not None:
        mvd_part = jnp.where(intra[:, None, None], 0, mvd_part)

    mb_class = jnp.where(is_skip, MB_PSKIP_D, MB_P16_D).astype(jnp.int32)
    if intra is not None:
        mb_class = jnp.where(intra, MB_I16_D, mb_class)
    return mb_class, mvd_part, is_skip


def header_slots(mb_class, i16_mode, chroma_mode, mvd, cbp_luma, cbp_chroma,
                 qp_mb, is_p_slice: bool, ref=None, num_ref: int = 1,
                 t8=None):
    """Per-MB header codes [skip_run, mb_type, chroma_mode, ref_idx,
    mvd_x, mvd_y, cbp, transform_size_8x8_flag, qp_delta] ->
    (hvals, hlens) (N,9) int32.  Bit-exact port of
    slice_writer_vec.header_slots (I16/P16/PSKIP classes).
    ref_idx is te()-coded: absent at num_ref 1, a single !ref bit at
    num_ref 2, ue(ref) beyond.  t8 (N,) bool or None: the flag bit is
    written for inter MBs with CodedBlockPatternLuma > 0 (7.3.5)."""
    n = mb_class.shape[0]
    skip = mb_class == MB_PSKIP_D
    coded = ~skip
    intra = mb_class == MB_I16_D
    p16 = mb_class == MB_P16_D
    cbp_l = cbp_luma.astype(jnp.int32)
    cbp_c = cbp_chroma.astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)

    hv = [jnp.zeros(n, jnp.int32) for _ in range(HEADER_SLOTS)]
    hl = [jnp.zeros(n, jnp.int32) for _ in range(HEADER_SLOTS)]

    if is_p_slice:
        # skip_run before each coded MB = distance to previous coded MB - 1
        marker = jnp.where(coded, idx, -1)
        run_max = jax.lax.cummax(marker)
        prev_coded = jnp.concatenate([jnp.array([-1], jnp.int32),
                                      run_max[:-1]])
        v, ln = ue_codes(idx - prev_coded - 1)
        hv[0] = v
        hl[0] = jnp.where(coded, ln, 0)

    mb_type = jnp.where(intra,
                        1 + i16_mode.astype(jnp.int32) + 4 * cbp_c
                        + 12 * (cbp_l != 0), 0)
    if is_p_slice:
        mb_type = mb_type + 5 * intra
    v, ln = ue_codes(mb_type)
    hv[1] = v
    hl[1] = jnp.where(coded, ln, 0)

    v, ln = ue_codes(chroma_mode.astype(jnp.int32))
    hv[2] = jnp.where(intra, v, 0)
    hl[2] = jnp.where(intra, ln, 0)

    if num_ref > 1 and ref is not None:
        if num_ref == 2:
            v, ln = 1 - ref.astype(jnp.int32), jnp.ones(n, jnp.int32)
        else:
            v, ln = ue_codes(ref.astype(jnp.int32))
        hv[3] = jnp.where(p16, v, 0)
        hl[3] = jnp.where(p16, ln, 0)

    for c in range(2):
        v, ln = se_codes(mvd[:, c])
        hv[4 + c] = jnp.where(p16, v, 0)
        hl[4 + c] = jnp.where(p16, ln, 0)

    v, ln = ue_codes(_CBP2G[0, (cbp_c << 4) | cbp_l])
    hv[6] = jnp.where(p16, v, 0)
    hl[6] = jnp.where(p16, ln, 0)

    if t8 is not None:
        on = p16 & (cbp_l > 0)
        hv[7] = jnp.where(on, t8.astype(jnp.int32), 0)
        hl[7] = on.astype(jnp.int32)

    # mb_qp_delta: chained over emitting MBs
    emits = coded & ((cbp_l != 0) | (cbp_c != 0) | intra)
    qp = qp_mb.astype(jnp.int32)
    ordn = jnp.cumsum(emits.astype(jnp.int32)) - 1
    qp_compact = jnp.zeros(n, jnp.int32).at[
        jnp.where(emits, ordn, n)].set(qp, mode="drop")
    prev_qp = jnp.where(ordn > 0, qp_compact[jnp.maximum(ordn - 1, 0)], qp[0])
    delta = qp - prev_qp
    delta = jnp.where(delta > 25, delta - 52,
                      jnp.where(delta < -26, delta + 52, delta))
    v, ln = se_codes(delta)
    hv[8] = jnp.where(emits, v, 0)
    hl[8] = jnp.where(emits, ln, 0)

    return jnp.stack(hv, axis=1), jnp.stack(hl, axis=1)


HEADER_SLOTS_PARTS = 22


def header_slots_parts(mb_class, shape, i16_mode, chroma_mode, mvd_part,
                       ref_part, cbp_luma, cbp_chroma, qp_mb,
                       num_ref: int = 1, t8=None):
    """Per-MB CAVLC header codes for partitioned P slices (7.3.5/7.3.5.1
    emission order): [skip_run, mb_type, chroma_mode, sub_mb_type x4,
    ref x4, (mvd_x, mvd_y) x4, cbp, t8_flag, qp_delta] -> (N, 22).

    shape (N,) 0..3 (== inter mb_type ue value, P_8x8ref0 handled);
    mvd_part (N,4,2) partition-slot order; ref_part (N,4).  Slots unused
    by a shape get zero length.  Parity: reference encoder/cavlc.c
    cavlc_mb_header_p."""
    n = mb_class.shape[0]
    skip = mb_class == MB_PSKIP_D
    coded = ~skip
    intra = mb_class == MB_I16_D
    p_inter = coded & ~intra
    cbp_l = cbp_luma.astype(jnp.int32)
    cbp_c = cbp_chroma.astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    nparts = jnp.asarray([1, 2, 2, 4], jnp.int32)[shape]

    hv = [jnp.zeros(n, jnp.int32) for _ in range(HEADER_SLOTS_PARTS)]
    hl = [jnp.zeros(n, jnp.int32) for _ in range(HEADER_SLOTS_PARTS)]

    # skip_run
    marker = jnp.where(coded, idx, -1)
    run_max = jax.lax.cummax(marker)
    prev_coded = jnp.concatenate([jnp.array([-1], jnp.int32),
                                  run_max[:-1]])
    v, ln = ue_codes(idx - prev_coded - 1)
    hv[0] = v
    hl[0] = jnp.where(coded, ln, 0)

    # mb_type: inter = shape (P_8x8ref0=4 when 8x8 and all refs 0 with
    # multi-ref active); intra I16 = 5 + formula
    # P_8x8ref0 whenever every sub-partition references picture 0 —
    # x264's rule (cavlc.c b_sub_ref), not gated on num_ref: at
    # num_ref 1 ue(4) and ue(3) cost the same 5 bits
    all_ref0 = (ref_part == 0).all(-1)
    use_ref0 = (shape == 3) & all_ref0
    sh_code = jnp.where(use_ref0, 4, shape)
    mb_type = jnp.where(
        intra, 5 + 1 + i16_mode.astype(jnp.int32) + 4 * cbp_c
        + 12 * (cbp_l != 0), sh_code)
    v, ln = ue_codes(mb_type)
    hv[1] = v
    hl[1] = jnp.where(coded, ln, 0)

    v, ln = ue_codes(chroma_mode.astype(jnp.int32))
    hv[2] = jnp.where(intra, v, 0)
    hl[2] = jnp.where(intra, ln, 0)

    # sub_mb_type: P_L0_8x8 only -> ue(0) = single "1" bit, x4
    is8 = p_inter & (shape == 3)
    for k in range(4):
        hv[3 + k] = jnp.where(is8, 1, 0)
        hl[3 + k] = jnp.where(is8, 1, 0)

    # ref_idx per live partition (te(); absent at num_ref 1 and for
    # P_8x8ref0)
    if num_ref > 1:
        write_ref = p_inter & ~use_ref0
        for k in range(4):
            live = write_ref & (k < nparts)
            r = ref_part[:, k].astype(jnp.int32)
            if num_ref == 2:
                v, ln = 1 - r, jnp.ones(n, jnp.int32)
            else:
                v, ln = ue_codes(r)
            hv[7 + k] = jnp.where(live, v, 0)
            hl[7 + k] = jnp.where(live, ln, 0)

    # mvd per live partition
    for k in range(4):
        live = p_inter & (k < nparts)
        for c in range(2):
            v, ln = se_codes(mvd_part[:, k, c])
            hv[11 + 2 * k + c] = jnp.where(live, v, 0)
            hl[11 + 2 * k + c] = jnp.where(live, ln, 0)

    v, ln = ue_codes(_CBP2G[0, (cbp_c << 4) | cbp_l])
    hv[19] = jnp.where(p_inter, v, 0)
    hl[19] = jnp.where(p_inter, ln, 0)

    if t8 is not None:
        on = p_inter & (cbp_l > 0)
        hv[20] = jnp.where(on, t8.astype(jnp.int32), 0)
        hl[20] = on.astype(jnp.int32)

    emits = coded & ((cbp_l != 0) | (cbp_c != 0) | intra)
    qp = qp_mb.astype(jnp.int32)
    ordn = jnp.cumsum(emits.astype(jnp.int32)) - 1
    qp_compact = jnp.zeros(n, jnp.int32).at[
        jnp.where(emits, ordn, n)].set(qp, mode="drop")
    prev_qp = jnp.where(ordn > 0, qp_compact[jnp.maximum(ordn - 1, 0)],
                        qp[0])
    delta = qp - prev_qp
    delta = jnp.where(delta > 25, delta - 52,
                      jnp.where(delta < -26, delta + 52, delta))
    v, ln = se_codes(delta)
    hv[21] = jnp.where(emits, v, 0)
    hl[21] = jnp.where(emits, ln, 0)

    return jnp.stack(hv, axis=1), jnp.stack(hl, axis=1)


# B-frame 16x16 modes (internal enumeration == CAVLC mb_type values)
B_DIRECT, B_L0, B_L1, B_BI = 0, 1, 2, 3


def header_slots_b(bmode, is_skip, mvd0, mvd1, cbp_luma, cbp_chroma, qp_mb,
                   t8_mode: bool = False, intra=None, i16_mode=None,
                   chroma_mode=None):
    """Per-MB B-slice header codes (one ref per list, 16x16 partitions):
    [skip_run, mb_type, chroma_mode, mvd0x, mvd0y, mvd1x, mvd1y, cbp,
    transform_size_8x8_flag, qp_delta].
    bmode (N,) in {B_DIRECT,B_L0,B_L1,B_BI}; is_skip (N,) bool (direct +
    no residual).  intra (N,) bool or None: I_16x16 escapes — mb_type
    23 + I-slice code (Table 7-14), intra_chroma_pred_mode follows, no
    cbp element (it lives in mb_type), no mvds.  Returns (hvals, hlens)
    (N,10) int32.  t8_mode: the PPS advertises transform_8x8_mode —
    every coded-luma INTER MB must then carry the flag bit (7.3.5; B
    uses 4x4 only for now, so the bit is 0; B_Direct included since SPS
    direct_8x8_inference_flag=1)."""
    n = bmode.shape[0]
    coded = ~is_skip
    if intra is None:
        intra = jnp.zeros(n, bool)
    inter = coded & ~intra
    cbp_l = cbp_luma.astype(jnp.int32)
    cbp_c = cbp_chroma.astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)

    hv = [jnp.zeros(n, jnp.int32) for _ in range(10)]
    hl = [jnp.zeros(n, jnp.int32) for _ in range(10)]
    if t8_mode:
        hl[8] = (inter & (cbp_l > 0)).astype(jnp.int32)  # flag bit = 0

    marker = jnp.where(coded, idx, -1)
    run_max = jax.lax.cummax(marker)
    prev_coded = jnp.concatenate([jnp.array([-1], jnp.int32), run_max[:-1]])
    v, ln = ue_codes(idx - prev_coded - 1)
    hv[0] = v
    hl[0] = jnp.where(coded, ln, 0)

    mb_type = bmode.astype(jnp.int32)
    if i16_mode is not None:
        mb_type = jnp.where(
            intra, 23 + 1 + i16_mode.astype(jnp.int32) + 4 * cbp_c
            + 12 * (cbp_l != 0), mb_type)
    v, ln = ue_codes(mb_type)
    hv[1] = v
    hl[1] = jnp.where(coded, ln, 0)

    if chroma_mode is not None:
        v, ln = ue_codes(chroma_mode.astype(jnp.int32))
        hv[2] = jnp.where(intra, v, 0)
        hl[2] = jnp.where(intra, ln, 0)

    use0 = inter & ((bmode == B_L0) | (bmode == B_BI))
    use1 = inter & ((bmode == B_L1) | (bmode == B_BI))
    for c in range(2):
        v, ln = se_codes(mvd0[:, c])
        hv[3 + c] = jnp.where(use0, v, 0)
        hl[3 + c] = jnp.where(use0, ln, 0)
        v, ln = se_codes(mvd1[:, c])
        hv[5 + c] = jnp.where(use1, v, 0)
        hl[5 + c] = jnp.where(use1, ln, 0)

    v, ln = ue_codes(_CBP2G[0, (cbp_c << 4) | cbp_l])
    hv[7] = v
    hl[7] = jnp.where(inter, ln, 0)

    emits = coded & ((cbp_l != 0) | (cbp_c != 0) | intra)
    qp = qp_mb.astype(jnp.int32)
    ordn = jnp.cumsum(emits.astype(jnp.int32)) - 1
    qp_compact = jnp.zeros(n, jnp.int32).at[
        jnp.where(emits, ordn, n)].set(qp, mode="drop")
    prev_qp = jnp.where(ordn > 0, qp_compact[jnp.maximum(ordn - 1, 0)], qp[0])
    delta = qp - prev_qp
    delta = jnp.where(delta > 25, delta - 52,
                      jnp.where(delta < -26, delta + 52, delta))
    v, ln = se_codes(delta)
    hv[9] = jnp.where(emits, v, 0)
    hl[9] = jnp.where(emits, ln, 0)

    return jnp.stack(hv, axis=1), jnp.stack(hl, axis=1)


def mvp_for_list(mv, used, mbw: int, mbh: int):
    """Median MVP over neighbours that use this list (ref 0), 8.4.1.3.
    mv (N,2) per-MB, or (N,4,2) quadrant-grain (direct MBs under quad
    temporal direct); used (N,) bool.  Returns mvp (N,2).

    With quad-grain input the neighbouring 4x4 block of the current
    16x16 partition resolves to a specific quadrant of the neighbour MB
    (6.4.11.7): A = left MB's top-right quad, B = top MB's bottom-left,
    C = top-right MB's bottom-left, D = top-left MB's bottom-right.
    Reduces to the per-MB form when all quads agree."""
    if mv.ndim == 2:
        mv = jnp.broadcast_to(mv[:, None, :], (mv.shape[0], 4, 2))
    m4 = mv.astype(jnp.int32).reshape(mbh, mbw, 4, 2)
    u = used.reshape(mbh, mbw)

    def shifted(dy, dx, q):
        mvn = jnp.zeros((mbh, mbw, 2), jnp.int32)
        un = jnp.zeros_like(u)
        av = jnp.zeros((mbh, mbw), bool)
        ys = slice(max(dy, 0), mbh + min(dy, 0))
        xs = slice(max(dx, 0), mbw + min(dx, 0))
        yd = slice(max(-dy, 0), mbh + min(-dy, 0))
        xd = slice(max(-dx, 0), mbw + min(-dx, 0))
        mvn = mvn.at[yd, xd].set(m4[ys, xs, q])
        un = un.at[yd, xd].set(u[ys, xs])
        av = av.at[yd, xd].set(True)
        return mvn, un, av

    mva, ua, av_a = shifted(0, -1, 1)
    mvb, ub, av_b = shifted(-1, 0, 2)
    mvc, uc, av_c = shifted(-1, 1, 2)
    mvd_, ud_, av_d = shifted(-1, -1, 3)
    use_d = ~av_c
    mvc = jnp.where(use_d[..., None], mvd_, mvc)
    uc = jnp.where(use_d, ud_, uc)
    av_c = jnp.where(use_d, av_d, av_c)

    ua = ua & av_a
    ub = ub & av_b
    uc = uc & av_c
    # 8.4.1.3.2: a neighbour not using this list contributes mv 0
    za = mva * ua[..., None]
    zb = mvb * ub[..., None]
    zc = mvc * uc[..., None]
    med = jnp.sort(jnp.stack([za, zb, zc], axis=0), axis=0)[1]
    only_a = av_a & ~av_b & ~av_c
    one = (ua.astype(jnp.int32) + ub + uc) == 1
    one_mv = za + zb + zc
    mvp = jnp.where(only_a[..., None], za,
                    jnp.where(one[..., None], one_mv, med))
    return mvp.reshape(-1, 2)
