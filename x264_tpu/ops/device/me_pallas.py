"""Exhaustive fullpel motion search as Pallas (Mosaic) TPU kernels.

The XLA fori_loop version (me.py) costs ~114ms at 1080p — dispatch-bound
across ~1089 candidate steps of small fused ops.  The arithmetic floor
is a few ms (2.3G absolute differences + per-MB reductions); this kernel
approaches it by keeping the reference in VMEM and turning the 16x16 SAD
reduction into (a) a sublane-regroup row sum and (b) one MXU matmul
against a block-diagonal ones matrix per candidate.

Mosaic constraints that shape the design (each verified on hardware):
  - dynamic sublane slicing must be 8-aligned -> the dy walk is split
    into 8 PHASES; phase r gets a ref view pre-shifted by r rows (an
    XLA slice), so in-kernel offsets are 8q + 128*strip (provably
    aligned);
  - lane slicing must be 128-aligned and lane rotates are 32-bit only
    -> the dx walk uses static pltpu.roll rotations on the widened band;
  - the frame is processed in STRIPS of 8 MB rows (whole-frame int32
    temporaries blow the 16MB VMEM scoped limit);
  - argmin with x264's first-candidate tie-break == min over packed
    keys (cost << ks | candidate_index) with candidates numbered in the
    XLA version's (dy, dx) raster order; the key plane accumulates
    across the 8 phase calls through input/output aliasing.

Parity anchor: reference encoder/me.c (ESA is the TPU-native choice —
see me.py's rationale); bit-exact vs me.full_search_16x16 (asserted in
tests and on hardware).
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


def _phase_body(bias_ref, src_ref, ref_ref, keyin_ref, ones_ref, key_ref,
                r: int, n_q: int, span: int, me_range: int, w: int,
                w2: int, interpret: bool):
    """Phase r: candidates dy == r - me_range (mod 8), all q offsets in
    one body.  Grid (n_strips,); key_ref rows [8i, 8i+8) get
    min(keyin, min over this phase's candidates) for strip i.

    keyin_ref is a SEPARATE input (NOT aliased with key_ref): reading
    the output ref as the accumulator under input_output_aliases
    miscompiled on v5e — keys came back with wrong SADs at every
    geometry; the copy per phase is noise next to the SAD work."""
    i = pl.program_id(0)
    rl = _roll_fn(interpret)
    ks = _key_shift(span)
    sh = 16 * _STRIP_MB

    src = src_ref[:].astype(_I32)                               # (sh, w)
    ones = ones_ref[:]                                  # (w, mbw_pad) f32
    best = keyin_ref[pl.ds(_STRIP_MB * i, _STRIP_MB), :]
    for q in range(n_q):
        s = 8 * q + r
        if s >= span:
            continue
        # lane rotates are 32-bit only -> widen once per q
        band = ref_ref[pl.ds(8 * q + sh * i, sh), :].astype(_I32)
        for d in range(span):
            col = PAD - me_range + d
            rolled = rl(band, (w2 - col) % w2)
            diff = jnp.abs(src - rolled[:, :w])
            rows = diff.reshape(_STRIP_MB, 16, w).sum(axis=1)
            # EXACT MXU sum: the default f32 matmul runs bf16 passes on
            # v5e, rounding row sums > 2^8 — SADs came back off by up to
            # ~20 (Precision.HIGHEST would be exact but blows the 16MB
            # scoped-vmem limit at 1080p).  Split rows (< 2^12) into
            # hi/lo bytes: both operands are bf16-exact, accumulation is
            # f32, so hi*256 + lo is exact.
            rf = rows.astype(jnp.float32)
            hi = jnp.floor(rf * (1.0 / 256.0))
            lo = rf - hi * 256.0
            sad = (jnp.dot(hi, ones, preferred_element_type=jnp.float32)
                   * 256.0
                   + jnp.dot(lo, ones, preferred_element_type=jnp.float32))
            key = ((sad.astype(_I32) + bias_ref[s, d]) << ks) \
                + (s * span + d)
            best = jnp.minimum(best, key)
    key_ref[pl.ds(_STRIP_MB * i, _STRIP_MB), :] = best


def full_search_pallas(src_y, ref_pad, lam, me_range: int, mbw: int,
                       mbh: int, interpret: bool = False):
    """Drop-in for me.full_search_16x16 (same contract, bit-exact):
    src_y (H, W) uint8, ref_pad (H+2PAD, W+2PAD) uint8, lam traced int32.
    Returns (mv (N,2) int32 qpel, cost (N,) int32)."""
    r_ = me_range
    span = 2 * r_ + 1
    h, w = mbh * 16, mbw * 16
    # lane dims padded to 128 multiples: Mosaic miscompiles this kernel
    # at odd register-padded widths (w2=176 gave wrong SADs on v5e; the
    # candidate window never wraps, so extra dead lanes are harmless)
    w2 = ((w + 2 * PAD + 127) // 128) * 128
    mbw_pad = max(128, ((mbw + 127) // 128) * 128)
    mbh_pad = ((mbh + _STRIP_MB - 1) // _STRIP_MB) * _STRIP_MB
    n_strips = mbh_pad // _STRIP_MB
    hp = 16 * mbh_pad
    ks = _key_shift(span)

    # pad to a whole number of strips (edge content; cropped afterwards)
    src = jnp.pad(src_y.astype(jnp.int16), ((0, hp - h), (0, 0)),
                  mode="edge")
    ref = jnp.pad(ref_pad.astype(jnp.int16),
                  ((0, hp - h), (0, w2 - (w + 2 * PAD))),
                  mode="edge")
    bits = jnp.asarray(mv_bits_arr(4 * r_).astype(np.int32))
    d = jnp.arange(span, dtype=_I32) - r_
    dbits = bits[4 * d + 4 * r_]
    bias = lam * (dbits[:, None] + dbits[None, :])       # (span, span)

    blocks = jnp.arange(w, dtype=_I32) // 16
    ones = (blocks[:, None]
            == jnp.arange(mbw_pad, dtype=_I32)[None, :]).astype(jnp.float32)

    key = jnp.full((mbh_pad, mbw_pad), np.iinfo(np.int32).max, _I32)
    for r in range(min(8, span)):
        n_q = (span - r + 7) // 8
        start = PAD - r_ + r
        ref_r = jax.lax.slice_in_dim(ref, start,
                                     start + hp + 8 * (n_q - 1), axis=0)
        key = pl.pallas_call(
            functools.partial(_phase_body, r=r, n_q=n_q, span=span,
                              me_range=r_, w=w, w2=w2,
                              interpret=interpret),
            grid=(n_strips,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((16 * _STRIP_MB, w),
                                   lambda i: (i, 0)),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mbh_pad, mbw_pad), _I32),
            interpret=interpret,
        )(bias, src, ref_r, key, ones)

    key = key[:mbh, :mbw].reshape(mbh * mbw)
    cost = key >> ks
    cand = key & ((1 << ks) - 1)
    s = cand // span
    i = cand % span
    mv = jnp.stack([4 * (i - r_), 4 * (s - r_)], axis=1).astype(_I32)
    return mv, cost
