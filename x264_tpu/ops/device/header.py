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


# B-frame 16x16 modes (internal enumeration == CAVLC mb_type values)
B_DIRECT, B_L0, B_L1, B_BI = 0, 1, 2, 3


def header_slots_b(bmode, is_skip, mvd0, mvd1, cbp_luma, cbp_chroma, qp_mb,
                   t8_mode: bool = False):
    """Per-MB B-slice header codes (one ref per list, 16x16 partitions):
    [skip_run, mb_type, mvd0x, mvd0y, mvd1x, mvd1y, cbp,
    transform_size_8x8_flag, qp_delta].
    bmode (N,) in {B_DIRECT,B_L0,B_L1,B_BI}; is_skip (N,) bool (direct +
    no residual).  Returns (hvals, hlens) (N,9) int32.  t8_mode: the PPS
    advertises transform_8x8_mode — every coded-luma MB must then carry
    the flag bit (7.3.5; B uses 4x4 only for now, so the bit is 0;
    B_Direct included since SPS direct_8x8_inference_flag=1)."""
    n = bmode.shape[0]
    coded = ~is_skip
    cbp_l = cbp_luma.astype(jnp.int32)
    cbp_c = cbp_chroma.astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)

    hv = [jnp.zeros(n, jnp.int32) for _ in range(9)]
    hl = [jnp.zeros(n, jnp.int32) for _ in range(9)]
    if t8_mode:
        hl[7] = (coded & (cbp_l > 0)).astype(jnp.int32)  # flag bit = 0

    marker = jnp.where(coded, idx, -1)
    run_max = jax.lax.cummax(marker)
    prev_coded = jnp.concatenate([jnp.array([-1], jnp.int32), run_max[:-1]])
    v, ln = ue_codes(idx - prev_coded - 1)
    hv[0] = v
    hl[0] = jnp.where(coded, ln, 0)

    v, ln = ue_codes(bmode.astype(jnp.int32))
    hv[1] = v
    hl[1] = jnp.where(coded, ln, 0)

    use0 = coded & ((bmode == B_L0) | (bmode == B_BI))
    use1 = coded & ((bmode == B_L1) | (bmode == B_BI))
    for c in range(2):
        v, ln = se_codes(mvd0[:, c])
        hv[2 + c] = jnp.where(use0, v, 0)
        hl[2 + c] = jnp.where(use0, ln, 0)
        v, ln = se_codes(mvd1[:, c])
        hv[4 + c] = jnp.where(use1, v, 0)
        hl[4 + c] = jnp.where(use1, ln, 0)

    v, ln = ue_codes(_CBP2G[0, (cbp_c << 4) | cbp_l])
    hv[6] = v
    hl[6] = jnp.where(coded, ln, 0)

    emits = coded & ((cbp_l != 0) | (cbp_c != 0))
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


def mvp_for_list(mv, used, mbw: int, mbh: int):
    """Median MVP over neighbours that use this list (ref 0), 8.4.1.3.
    mv (N,2), used (N,) bool.  Returns mvp (N,2)."""
    m = mv.astype(jnp.int32).reshape(mbh, mbw, 2)
    u = used.reshape(mbh, mbw)

    def shifted(dy, dx):
        mvn = jnp.zeros_like(m)
        un = jnp.zeros_like(u)
        av = jnp.zeros((mbh, mbw), bool)
        ys = slice(max(dy, 0), mbh + min(dy, 0))
        xs = slice(max(dx, 0), mbw + min(dx, 0))
        yd = slice(max(-dy, 0), mbh + min(-dy, 0))
        xd = slice(max(-dx, 0), mbw + min(-dx, 0))
        mvn = mvn.at[yd, xd].set(m[ys, xs])
        un = un.at[yd, xd].set(u[ys, xs])
        av = av.at[yd, xd].set(True)
        return mvn, un, av

    mva, ua, av_a = shifted(0, -1)
    mvb, ub, av_b = shifted(-1, 0)
    mvc, uc, av_c = shifted(-1, 1)
    mvd_, ud_, av_d = shifted(-1, -1)
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
