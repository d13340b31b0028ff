"""Exhaustive fullpel PARTITION motion search as a Pallas (Mosaic) TPU
kernel — the 9-unit analog of me_pallas.full_search_pallas.

The XLA fori_loop version (me_parts.full_search_parts_xla) costs ~1.1 s
at 1080p (dispatch-bound across ~1089 candidates x 9 unit argmins); this
kernel computes per-candidate QUADRANT SADs with the same strip/phase/
roll structure as the fixed 16x16 kernel and accumulates FOUR packed-key
planes (quads, 16x8 halves, 8x16 halves, 16x16) held at (2 sublanes x
2 lanes)-per-MB granularity so no strided register ops are needed:

  qsad[2i+qy, 2j+qx]  = SAD of quadrant (qy,qx) of MB (i,j)
  h   [2i+t,  2j]     = qsad[.,2j] + qsad[.,2j+1]     (lane roll -1)
  v   [2i,    2j+qx]  = qsad[2i,.] + qsad[2i+1,.]     (sublane shift)
  f   [2i,    2j]     = h[2i,.] + h[2i+1,.]

Lessons baked in from the 16x16 kernel's debugging on v5e (see
me_pallas.py): NO input_output_aliases chaining (donated accumulators
miscompiled), q offsets looped inside the body, lane dims padded to 128
multiples, and exact hi/lo-byte MXU sums (default f32 matmul is bf16).

Parity anchor: bit-exact vs me_parts.full_search_parts_xla (asserted in
tests/test_device_parity.py), which itself ties to encoder/me.c ESA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from x264_tpu.models.inter_frame import PAD, mv_bits_arr

_I32 = jnp.int32
_STRIP_MB = 8                       # MB rows per strip (128 px)


def _key_shift(span: int) -> int:
    return max(11, int(np.ceil(np.log2(span * span))))


def _roll_fn(interpret):
    if interpret:
        return lambda x, s: jnp.roll(x, s, axis=1)
    return lambda x, s: pltpu.roll(x, s % x.shape[1], axis=1)


def _phase_body(bias_ref, src_ref, ref_ref, kq_in, kh_in, kv_in, kf_in,
                ones_ref, kq_ref, kh_ref, kv_ref, kf_ref,
                r: int, n_q: int, span: int, me_range: int, w: int,
                w2: int, interpret: bool):
    """Phase r: candidates dy == r - me_range (mod 8), all q offsets in
    one body.  Grid (n_strips,); the four key planes' rows
    [16i, 16i+16) get min(key_in, min over this phase's candidates)."""
    i = pl.program_id(0)
    rl = _roll_fn(interpret)
    ks = _key_shift(span)
    sh = 16 * _STRIP_MB
    qh = 2 * _STRIP_MB                       # key sublanes per strip

    src = src_ref[:].astype(_I32)                               # (sh, w)
    ones = ones_ref[:]                                # (w, 2*mbw_pad) f32
    bq = kq_in[pl.ds(qh * i, qh), :]
    bh = kh_in[pl.ds(qh * i, qh), :]
    bv = kv_in[pl.ds(qh * i, qh), :]
    bf = kf_in[pl.ds(qh * i, qh), :]
    for q in range(n_q):
        s = 8 * q + r
        if s >= span:
            continue
        band = ref_ref[pl.ds(8 * q + sh * i, sh), :].astype(_I32)
        for d in range(span):
            col = PAD - me_range + d
            rolled = rl(band, (w2 - col) % w2)
            diff = jnp.abs(src - rolled[:, :w])
            # 8-row half sums: sublane 2m = MB-row m top, 2m+1 bottom
            rows8 = diff.reshape(_STRIP_MB * 2, 8, w).sum(axis=1)
            # bf16 operands (exact: hi < 16, lo < 256, ones 0/1) with
            # f32 accumulation; bf16 halves the matmul VMEM footprint
            # (the f32 form blew the 16MB scoped limit at 1080p)
            hi = (rows8 >> 8).astype(jnp.bfloat16)
            lo = (rows8 & 255).astype(jnp.bfloat16)
            qsad = (jnp.dot(hi, ones, preferred_element_type=jnp.float32)
                    * 256.0
                    + jnp.dot(lo, ones,
                              preferred_element_type=jnp.float32)
                    ).astype(_I32)                       # (qh, 2*mbw_pad)
            hsad = qsad + rl(qsad, qsad.shape[1] - 1)    # lane j + j+1
            vsad = qsad + jnp.concatenate(
                [qsad[1:], qsad[:1]], axis=0)            # sublane m + m+1
            fsad = hsad + jnp.concatenate(
                [hsad[1:], hsad[:1]], axis=0)
            base = (bias_ref[s, d] << ks) + (s * span + d)
            bq = jnp.minimum(bq, (qsad << ks) + base)
            bh = jnp.minimum(bh, (hsad << ks) + base)
            bv = jnp.minimum(bv, (vsad << ks) + base)
            bf = jnp.minimum(bf, (fsad << ks) + base)
    kq_ref[pl.ds(qh * i, qh), :] = bq
    kh_ref[pl.ds(qh * i, qh), :] = bh
    kv_ref[pl.ds(qh * i, qh), :] = bv
    kf_ref[pl.ds(qh * i, qh), :] = bf


def full_search_parts_pallas(src_y, ref_pad, lam, me_range: int,
                             mbw: int, mbh: int,
                             interpret: bool = False):
    """Drop-in for me_parts.full_search_parts_xla (same contract,
    bit-exact): returns dict cost_q/mv_q/cost_h/mv_h/cost_v/mv_v/
    cost_f/mv_f."""
    r_ = me_range
    span = 2 * r_ + 1
    h, w = mbh * 16, mbw * 16
    w2 = ((w + 2 * PAD + 127) // 128) * 128
    mbw2_pad = max(128, ((2 * mbw + 127) // 128) * 128)
    mbh_pad = ((mbh + _STRIP_MB - 1) // _STRIP_MB) * _STRIP_MB
    n_strips = mbh_pad // _STRIP_MB
    hp = 16 * mbh_pad
    ks = _key_shift(span)

    src = jnp.pad(src_y.astype(jnp.int16), ((0, hp - h), (0, 0)),
                  mode="edge")
    ref = jnp.pad(ref_pad.astype(jnp.int16),
                  ((0, hp - h), (0, w2 - (w + 2 * PAD))), mode="edge")
    bits = jnp.asarray(mv_bits_arr(4 * r_).astype(np.int32))
    d = jnp.arange(span, dtype=_I32) - r_
    dbits = bits[4 * d + 4 * r_]
    bias = lam * (dbits[:, None] + dbits[None, :])       # (span, span)

    # one-hot over 8-px column groups: lane 2j+l sums cols of MB j half l
    blocks8 = jnp.arange(w, dtype=_I32) // 8
    ones = (blocks8[:, None]
            == jnp.arange(mbw2_pad, dtype=_I32)[None, :]
            ).astype(jnp.bfloat16)

    mx = np.iinfo(np.int32).max
    kq = jnp.full((2 * mbh_pad, mbw2_pad), mx, _I32)
    kh = jnp.full_like(kq, mx)
    kv = jnp.full_like(kq, mx)
    kf = jnp.full_like(kq, mx)
    for r in range(min(8, span)):
        n_q = (span - r + 7) // 8
        start = PAD - r_ + r
        ref_r = jax.lax.slice_in_dim(ref, start,
                                     start + hp + 8 * (n_q - 1), axis=0)
        kq, kh, kv, kf = pl.pallas_call(
            functools.partial(_phase_body, r=r, n_q=n_q, span=span,
                              me_range=r_, w=w, w2=w2,
                              interpret=interpret),
            grid=(n_strips,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((16 * _STRIP_MB, w), lambda i: (i, 0)),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_shape=[jax.ShapeDtypeStruct((2 * mbh_pad, mbw2_pad),
                                            _I32)] * 4,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
            interpret=interpret,
        )(bias, src, ref_r, kq, kh, kv, kf, ones)

    def unpack(key):
        cand = key & ((1 << ks) - 1)
        s = cand // span
        i = cand % span
        mv = jnp.stack([4 * (i - r_), 4 * (s - r_)], axis=-1).astype(_I32)
        return key >> ks, mv

    n = mbw * mbh
    # quads: [2i+qy, 2j+qx] -> (N, 4) in q = 2*qy + qx order
    kq2 = kq[:2 * mbh, :2 * mbw].reshape(mbh, 2, mbw, 2)
    cq, mq = unpack(kq2.transpose(0, 2, 1, 3).reshape(n, 4))
    # halves: meaningful at even lanes / appropriate sublanes
    kh2 = kh[:2 * mbh, :2 * mbw:2].reshape(mbh, 2, mbw)
    ch, mh = unpack(kh2.transpose(0, 2, 1).reshape(n, 2))
    kv2 = kv[:2 * mbh:2, :2 * mbw].reshape(mbh, mbw, 2)
    cv, mv_ = unpack(kv2.reshape(n, 2))
    kf2 = kf[:2 * mbh:2, :2 * mbw:2]
    cf, mf = unpack(kf2.reshape(n))
    return dict(cost_q=cq, mv_q=mq, cost_h=ch, mv_h=mh,
                cost_v=cv, mv_v=mv_, cost_f=cf, mv_f=mf)
