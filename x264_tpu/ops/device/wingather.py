"""MXU window gather: per-MB 18x18 reference windows via one-hot
matmul contractions instead of XLA gathers.

Why: XLA lowers per-MB window gathers to ~20ns/ELEMENT scalar loads —
the (N,18,18) subpel window gather alone costs ~52 ms at 1080p and the
two direct-mode qpel MC gathers in a B frame another ~125 ms.  The same
selection expressed as one-hot matrix products runs on the MXU at
tensor-core speed (the playbook's "one-hot einsum" pattern, also used by
the CAVLC compaction).

Shape: the padded plane (PAD=32) is cut into per-MB-row bands of 80 rows
starting at row 16*mby (this exactly tiles H+2*PAD), so every legal
window (|mv_int| <= PAD-8+1) lives inside its MB's band:
  1. coarse column select: 16-column groups, one-hot over (group, 3)
     contracted on the MXU -> (N, 80, 48) candidate columns
  2. row select: one-hot (N, 18, 80) contraction -> (N, 18, 48)
  3. fine shift: 16 static slices + per-MB select -> (N, 18, 32)
Values travel as two exact u16 halves in f32 (one-hot sums touch exactly
one element, so everything is exact); callers pack 4 bytes per u32 word
(e.g. the 4 half-pel planes) and unpack after.

Parity: bit-exact with the direct advanced-indexing gather — asserted in
tests/test_device_parity.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_F32 = jnp.float32
_BAND = 80          # rows per MB-row band (window start slack + 18)
_WIN = 18           # window height/width callers consume
_OUTW = 32          # padded output width (fine shift needs 32 lanes)


def pack_planes4(planes4):
    """(4, Hp, Wp) -> (Hp, Wp) uint32, one byte per plane (values must be
    8-bit).  Also accepts stacked (K, 4, Hp, Wp) -> (K, Hp, Wp)."""
    p = planes4.astype(jnp.uint32)
    return (p[..., 0, :, :] | (p[..., 1, :, :] << 8)
            | (p[..., 2, :, :] << 16) | (p[..., 3, :, :] << 24))


def _bands(packed, mbh: int):
    """(K, Hp, Wp) -> (K, mbh, 80, Wp): band r = rows [16r, 16r+80).
    Hp must equal 16*mbh + 64 (PAD=32 padding); built from 5 shifted
    16-row block views — no gathers."""
    k, hp, wp = packed.shape
    blocks = packed.reshape(k, hp // 16, 16, wp)
    return jnp.concatenate(
        [blocks[:, i:i + mbh] for i in range(5)], axis=2)


def gather_win18(packed, y0, x0, mbw: int, mbh: int, ref_idx=None):
    """Windows packed[y0+i, x0+j] for i,j in [0,18) per MB, as
    (N, 18, 32) uint32 (columns 18..31 are junk padding).

    packed: (Hp, Wp) uint32 or (K, Hp, Wp) with per-MB ref_idx (N,).
    y0/x0: (N,) absolute top-left window coordinates in the padded
    plane; must satisfy y0 - 16*mby in [0, 62] and x0+18 <= Wp (true for
    any |mv_int| <= PAD-8+1 with PAD=32 planes)."""
    n = mbw * mbh
    band = jnp.arange(n, dtype=jnp.int32) // mbw
    return gather_win(packed, y0, x0, band, win=_WIN, ref_idx=ref_idx,
                      mbh=mbh)


def gather_win(packed, y0, x0, band, win: int, ref_idx=None,
               mbh: int | None = None):
    """General form: M windows packed[y0+i, x0+j], i,j in [0, win), as
    (M, win, 32) uint32 (columns win..31 junk).  band (M,): the MB row
    whose 80-row band contains the window (y0 - 16*band must lie in
    [0, 80 - win]).  M must be mbh * per_row with windows ORDERED BY
    BAND (all of band 0 first, ...) — true for per-MB windows (per_row
    = mbw) and for per-quadrant units u = 4*mb + q (per_row = 4*mbw);
    the band batching is what keeps the one-hot contraction small (the
    r axis is shared between bands and windows, exactly as in the
    original per-MB form)."""
    if packed.ndim == 2:
        packed = packed[None]
    k, hp, wp = packed.shape
    if mbh is None:
        mbh = (hp - 2 * 32) // 16
    m = y0.shape[0]
    per_row = m // mbh
    wp2 = -(-wp // 16) * 16
    if wp2 != wp:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, wp2 - wp)))
    ngrp = wp2 // 16

    bands = _bands(packed, mbh)                       # (K, mbh, 80, Wp2)
    b_lo = (bands & 0xFFFF).astype(_F32).reshape(k, mbh, _BAND, ngrp, 16)
    b_hi = (bands >> 16).astype(_F32).reshape(k, mbh, _BAND, ngrp, 16)

    dy = y0 - 16 * band                                # [0, 80 - win]
    g0 = x0 >> 4
    s = x0 & 15

    # coarse column one-hot (mbh, per_row, K, ngrp, 3), ref select folded
    gi = jnp.arange(ngrp, dtype=jnp.int32)
    ti = jnp.arange(3, dtype=jnp.int32)
    csel = (gi[None, :, None] == g0[:, None, None] + ti[None, None, :])
    if ref_idx is None:
        ref_idx = jnp.zeros(m, jnp.int32)
    ksel = (jnp.arange(k, dtype=jnp.int32)[None, :] == ref_idx[:, None])
    csel = (csel[:, None, :, :] & ksel[:, :, None, None]).astype(_F32)
    csel = csel.reshape(mbh, per_row, k, ngrp, 3)

    # precision=HIGHEST: TPU f32 matmuls default to a single bf16 pass
    # (8-bit mantissa), which corrupts u16 operands — the one-hot sums
    # are only exact with true f32 multiplies.
    prec = jax.lax.Precision.HIGHEST

    # (K, r, 80, g, 16) x (r, m, K, g, 3) -> (r, m, 80, 3, 16)
    def coarse(b):
        return jnp.einsum("KrRgk,rmKgt->rmRtk", b, csel,
                          precision=prec, preferred_element_type=_F32)

    c_lo = coarse(b_lo).reshape(m, _BAND, 48)
    c_hi = coarse(b_hi).reshape(m, _BAND, 48)

    # row one-hot (M, win, 80)
    ri = jnp.arange(_BAND, dtype=jnp.int32)
    ii = jnp.arange(win, dtype=jnp.int32)
    rsel = (ri[None, None, :] == dy[:, None, None] + ii[None, :, None]
            ).astype(_F32)
    r_lo = jnp.einsum("niR,nRc->nic", rsel, c_lo,
                      precision=prec, preferred_element_type=_F32)
    r_hi = jnp.einsum("niR,nRc->nic", rsel, c_hi,
                      precision=prec, preferred_element_type=_F32)

    # fine shift: 16 static 32-column slices, per-window select
    lo = r_lo[:, :, 0:_OUTW]
    hi = r_hi[:, :, 0:_OUTW]
    for sh in range(1, 16):
        msk = (s == sh)[:, None, None]
        lo = jnp.where(msk, r_lo[:, :, sh:sh + _OUTW], lo)
        hi = jnp.where(msk, r_hi[:, :, sh:sh + _OUTW], hi)

    return (lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << 16))
