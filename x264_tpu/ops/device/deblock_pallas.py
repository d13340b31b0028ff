"""In-loop deblocking as a single Pallas (Mosaic) TPU kernel.

Why: the XLA scan version (deblock.py) is correct but dispatch-bound —
~250 wavefront steps of tiny ops cost ~180ms at 1080p, dominated by
per-op overhead, not arithmetic.  One sequential-grid Mosaic kernel
keeps the whole skewed plane resident in VMEM and runs each diagonal
step as a few dozen raw vector ops.

Layout (the transposed twist on deblock.py's skew): Mosaic only allows
dynamic slicing on the SUBLANE axis (lane starts must be 128-aligned),
so the skewed plane is stored TRANSPOSED — image columns (the wavefront
axis) are sublanes, image rows are lanes:
  - luma:   (wsk_y, 16*mbh) int16, per-step window rows [16t, 16t+64)
  - chroma: (wsk_c, 16*mbh) int32 (int32 so 8t starts satisfy the
    8-sublane tile), U rows stacked over V rows in the lane axis
Vertical edges become single-row (full-lane) ops; horizontal edges are
computed for all macroblock bands at once with static lane rolls and
masked writebacks (mask = edge-lane pattern & range & bs>0).

All filter arithmetic is _luma_filter_params/_chroma_filter_params from
deblock.py — the exact functions the XLA scan uses — with alpha/beta/tc0
table lookups hoisted into packed per-edge parameter planes built in XLA
(Mosaic has no gather).  Bit-exactness vs the scan is asserted in
tests/test_deblock_device.py.

Parity anchor: reference common/deblock.c (normative 8.7), x264's
frame-parallel deblock lag being the CPU-shaped equivalent schedule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from x264_tpu.ops.device.deblock import (
    _chroma_filter_params,
    _edge_tables,
    _luma_filter_params,
)

_I32 = jnp.int32


def _pack_word(bs, qp_av, off_a, off_b):
    """on<<25 | bs4<<24 | alpha<<16 | beta<<8 | tc0 per edge segment."""
    on, bs4, alpha, beta, tc0 = _edge_tables(bs, qp_av, off_a, off_b)
    return (on.astype(_I32) << 25) | (bs4.astype(_I32) << 24) | \
        (alpha.astype(_I32) << 16) | (beta.astype(_I32) << 8) | \
        tc0.astype(_I32)


def _pack_byte(bs, qp_av, off_a, off_b):
    """on<<7 | bs4<<6 | tc0 per edge segment (alpha/beta ride word A)."""
    on, bs4, _, _, tc0 = _edge_tables(bs, qp_av, off_a, off_b)
    return (on.astype(_I32) << 7) | (bs4.astype(_I32) << 6) | \
        tc0.astype(_I32)


def _unpack_word(w):
    return (((w >> 25) & 1) == 1, ((w >> 24) & 1) == 1,
            (w >> 16) & 0xff, (w >> 8) & 0xff, w & 0x3f)


def _grid_gather(grid, gy, gx, valid):
    """grid (GH, GW); gy/gx/valid broadcastable index arrays."""
    gh, gw = grid.shape
    g = jnp.where(valid, grid[jnp.clip(gy, 0, gh - 1),
                              jnp.clip(gx, 0, gw - 1)], 0)
    return g.astype(_I32)


def _qp_av_grids(qp_mb, mbw, mbh):
    """(qp_av_v, qp_av_h) at 4-px grid granularity (4mbh, 4mbw)."""
    qp_g = jnp.repeat(jnp.repeat(qp_mb.reshape(mbh, mbw), 4, 0), 4, 1)
    qp_l = jnp.pad(qp_g[:, :-1], ((0, 0), (1, 0)), mode="edge")
    qp_t = jnp.pad(qp_g[:-1, :], ((1, 0), (0, 0)), mode="edge")
    return (qp_g + qp_l + 1) >> 1, (qp_g + qp_t + 1) >> 1


def _word4(bytes_grid):
    """(4mbh, 4mbw) bytes -> (4mbh, mbw) little-endian 4-byte words."""
    gh, gw = bytes_grid.shape
    b = bytes_grid.reshape(gh, gw // 4, 4)
    return (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)
            | (b[..., 3] << 24))


def _params_skew(mrows, band: int, mbw: int, n_steps: int):
    """mrows (R, L, mbw): per-lane, per-param-row values over MB columns.
    Returns (n_steps, R, L) with lane group b (of `band` lanes) shifted
    by 2b along the step axis — static pads + one concat, replacing the
    2D gathers (which cost ~38ms at 1080p on TPU)."""
    r, lanes, _ = mrows.shape
    pieces = []
    for b in range(lanes // band):
        off = 2 * b
        blk = mrows[:, b * band:(b + 1) * band, :].transpose(2, 0, 1)
        pieces.append(jnp.pad(
            blk, ((off, n_steps - mbw - off), (0, 0), (0, 0))))
    return jnp.concatenate(pieces, axis=2)


def _luma_params(bs_v, bs_h, qp_mb, off_a, off_b, mbw, mbh, n_steps):
    """(n_steps, 16, 16*mbh) int32: rows 0-3 vertical-edge packed words,
    4-7 horizontal word A (alpha<<8|beta), 8-11 horizontal word B
    (4 kcol bytes), 12-15 zero."""
    qp_av_v, qp_av_h = _qp_av_grids(qp_mb, mbw, mbh)
    pv = _pack_word(bs_v, qp_av_v, off_a, off_b)            # (4mbh, 4mbw)
    _, _, alpha_h, beta_h, _ = _edge_tables(bs_h, qp_av_h, off_a, off_b)
    wa_h = ((alpha_h.astype(_I32) << 8) | beta_h.astype(_I32)
            )[:, 0::4]                                       # (4mbh, mbw)
    wb_h = _word4(_pack_byte(bs_h, qp_av_h, off_a, off_b))   # (4mbh, mbw)

    lanes = 16 * mbh
    rows = ([jnp.repeat(pv[:, e::4], 4, axis=0) for e in range(4)]
            + [jnp.repeat(wa_h[e::4], 16, axis=0) for e in range(4)]
            + [jnp.repeat(wb_h[e::4], 16, axis=0) for e in range(4)]
            + [jnp.zeros((lanes, mbw), _I32)] * 4)
    return _params_skew(jnp.stack(rows), 16, mbw, n_steps)


def _chroma_params(bs_v, bs_h, qpc_mb, off_a, off_b, mbw, mbh, n_steps):
    """(n_steps, 8, 16*mbh): rows 0-1 v-edge words (e=0,2), 2-3 h word A,
    4-5 h word B, 6-7 zero.  Lanes: U rows then V rows (same params)."""
    qpc_av_v, qpc_av_h = _qp_av_grids(qpc_mb, mbw, mbh)
    pv = _pack_word(bs_v, qpc_av_v, off_a, off_b)
    _, _, alpha_h, beta_h, _ = _edge_tables(bs_h, qpc_av_h, off_a, off_b)
    wa_h = ((alpha_h.astype(_I32) << 8) | beta_h.astype(_I32))[:, 0::4]
    wb_h = _word4(_pack_byte(bs_h, qpc_av_h, off_a, off_b))

    half = 8 * mbh
    # each luma block-row's bs covers two chroma pixel rows
    rows = ([jnp.repeat(pv[:, e::4], 2, axis=0) for e in (0, 2)]
            + [jnp.repeat(wa_h[e::4], 8, axis=0) for e in (0, 2)]
            + [jnp.repeat(wb_h[e::4], 8, axis=0) for e in (0, 2)]
            + [jnp.zeros((half, mbw), _I32)] * 2)
    del half
    sk = _params_skew(jnp.stack(rows), 8, mbw, n_steps)
    return jnp.concatenate([sk, sk], axis=2)   # U lanes | V lanes (same)


def _skew_T(plane, band_h: int, shift: int, left: int, wsk: int):
    """(H, W) -> transposed skewed (wsk, H): lane group b (image rows
    b*band_h..) shifted down by left + shift*b sublanes.  Static pads +
    one concat — the gather-based deblock._skew costs ~40ms at 1080p on
    TPU, this fuses to plain copies."""
    hh, ww = plane.shape
    tp = plane.T
    cols = []
    for b in range(hh // band_h):
        off = left + shift * b
        cols.append(jnp.pad(tp[:, b * band_h:(b + 1) * band_h],
                            ((off, wsk - ww - off), (0, 0))))
    return jnp.concatenate(cols, axis=1)


def _unskew_T(tsk, band_h: int, shift: int, left: int, ww: int):
    """Inverse of _skew_T: back to (H, W)."""
    nb = tsk.shape[1] // band_h
    cols = []
    for b in range(nb):
        off = left + shift * b
        cols.append(tsk[off:off + ww, b * band_h:(b + 1) * band_h])
    return jnp.concatenate(cols, axis=1).T


def _make_roll(interpret):
    if interpret:
        return lambda x, s: jnp.roll(x, s, axis=-1) if s else x
    # pltpu.roll requires a non-negative shift; rolls are cyclic so
    # negative amounts wrap via the lane count
    return (lambda x, s:
            pltpu.roll(x, s % x.shape[-1], axis=x.ndim - 1) if s else x)


def _luma_kernel_body(p_ref, y_ref, o_ref, interpret):
    del y_ref  # aliased with o_ref; all access via o_ref
    t = pl.program_id(0)
    rl = _make_roll(interpret)
    S = o_ref[pl.ds(16 * t, 64), :].astype(_I32)       # (64, L)
    P = p_ref[0]                                       # (16, L)
    L = S.shape[1]

    # ---- vertical edges: single-row, full-lane ops ----
    for e in range(4):
        on, bs4, alpha, beta, tc0 = _unpack_word(P[e])
        r = 36 + 4 * e
        lines = [S[r - 4 + i] for i in range(8)]
        res = _luma_filter_params(*lines, on, bs4, alpha, beta, tc0)
        # no dynamic_update_slice in this Mosaic: rebuild by concatenation
        S = jnp.concatenate([S[:r - 3], jnp.stack(res), S[r + 3:]], axis=0)

    # ---- horizontal edges: all bands at once, lane rolls + masks ----
    lane = jax.lax.broadcasted_iota(_I32, (16, L), 1)
    subl = jax.lax.broadcasted_iota(_I32, (16, L), 0)
    for e in range(4):
        wa = P[4 + e]
        byte = (P[8 + e][None, :] >> ((subl // 4) * 8)) & 0xff
        on = (byte >> 7) == 1
        bs4 = ((byte >> 6) & 1) == 1
        tc0 = byte & 0x3f
        alpha = ((wa >> 8) & 0xff)[None, :]
        beta = (wa & 0xff)[None, :]
        Q = S[36:52]
        Pm = Q if e else S[4:20]
        lines = ([rl(Pm, 4 - i) for i in range(4)]
                 + [rl(Q, 4 - i) for i in range(4, 8)])
        res = _luma_filter_params(*lines, on, bs4, alpha, beta, tc0)
        newP, newQ = Pm, Q
        for i, o in enumerate(range(-3, 3)):
            m = (((lane % 16) == ((4 * e + o) % 16))
                 & (lane - o >= 0) & (lane - o < L)
                 & (rl(on.astype(_I32), o) == 1))
            sh = rl(res[i], o)
            if e == 0 and o < 0:
                newP = jnp.where(m, sh, newP)
            else:
                newQ = jnp.where(m, sh, newQ)
        if e == 0:
            S = jnp.concatenate([S[:4], newP, S[20:36], newQ, S[52:]],
                                axis=0)
        else:
            S = jnp.concatenate([S[:36], newQ, S[52:]], axis=0)

    o_ref[pl.ds(16 * t, 64), :] = S.astype(jnp.int16)


def _chroma_kernel_body(p_ref, c_ref, o_ref, interpret):
    del c_ref  # aliased with o_ref
    t = pl.program_id(0)
    rl = _make_roll(interpret)
    S = o_ref[pl.ds(8 * t, 32), :]                     # (32, L) int32
    P = p_ref[0]                                       # (8, L)
    L = S.shape[1]

    for j, e in enumerate((0, 2)):
        on, bs4, alpha, beta, tc0 = _unpack_word(P[j])
        r = 18 + 2 * e
        np0, nq0 = _chroma_filter_params(S[r - 2], S[r - 1], S[r], S[r + 1],
                                         on, bs4, alpha, beta, tc0)
        S = jnp.concatenate([S[:r - 1], np0[None, :], nq0[None, :],
                             S[r + 1:]], axis=0)

    lane = jax.lax.broadcasted_iota(_I32, (8, L), 1)
    subl = jax.lax.broadcasted_iota(_I32, (8, L), 0)
    for j, e in enumerate((0, 2)):
        wa = P[2 + j]
        byte = (P[4 + j][None, :] >> ((subl // 2) * 8)) & 0xff
        on = (byte >> 7) == 1
        bs4 = ((byte >> 6) & 1) == 1
        tc0 = byte & 0x3f
        alpha = ((wa >> 8) & 0xff)[None, :]
        beta = (wa & 0xff)[None, :]
        Q = S[18:26]
        Pm = Q if e else S[2:10]
        np0, nq0 = _chroma_filter_params(rl(Pm, 2), rl(Pm, 1), Q, rl(Q, -1),
                                         on, bs4, alpha, beta, tc0)
        newP, newQ = Pm, Q
        for o, val in ((-1, np0), (0, nq0)):
            m = (((lane % 8) == ((2 * e + o) % 8))
                 & (lane - o >= 0) & (lane - o < L)
                 & (rl(on.astype(_I32), o) == 1))
            sh = rl(val, o)
            if e == 0 and o < 0:
                newP = jnp.where(m, sh, newP)
            else:
                newQ = jnp.where(m, sh, newQ)
        if e == 0:
            S = jnp.concatenate([S[:2], newP, S[10:18], newQ, S[26:]],
                                axis=0)
        else:
            S = jnp.concatenate([S[:18], newQ, S[26:]], axis=0)

    o_ref[pl.ds(8 * t, 32), :] = S


def deblock_filter_pallas(y, u, v, bs_v, bs_h, qp_mb, qpc_mb,
                          off_a, off_b, mbw: int, mbh: int,
                          interpret: bool = False):
    """Drop-in for deblock._deblock_filter: same arguments, same result,
    one Mosaic kernel per plane group instead of a ~250-step XLA scan."""
    h, w = mbh * 16, mbw * 16
    n_steps = mbw + 2 * mbh - 2
    lanes = 16 * mbh

    wsk_y = 16 * mbw + 32 * mbh + 40
    wsk_c = 8 * mbw + 16 * mbh + 20
    Ty = _skew_T(y.astype(jnp.int16), 16, 32, 36, wsk_y)
    Tc = jnp.concatenate(
        [_skew_T(u.astype(_I32), 8, 16, 18, wsk_c),
         _skew_T(v.astype(_I32), 8, 16, 18, wsk_c)], axis=1)

    Pl = _luma_params(bs_v, bs_h, qp_mb, off_a, off_b, mbw, mbh, n_steps)
    Pc = _chroma_params(bs_v, bs_h, qpc_mb, off_a, off_b, mbw, mbh,
                        n_steps)

    Ty2 = pl.pallas_call(
        functools.partial(_luma_kernel_body, interpret=interpret),
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((1, 16, lanes), lambda t: (t, 0, 0)),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(Ty.shape, jnp.int16),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(Pl, Ty)
    Tc2 = pl.pallas_call(
        functools.partial(_chroma_kernel_body, interpret=interpret),
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((1, 8, lanes), lambda t: (t, 0, 0)),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(Tc.shape, _I32),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(Pc, Tc)

    return (_unskew_T(Ty2, 16, 32, 36, w).astype(jnp.uint8),
            _unskew_T(Tc2[:, :8 * mbh], 8, 16, 18, w // 2
                      ).astype(jnp.uint8),
            _unskew_T(Tc2[:, 8 * mbh:], 8, 16, 18, w // 2
                      ).astype(jnp.uint8))
