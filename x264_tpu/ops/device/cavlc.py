"""Device (JAX) CAVLC residual coding — per-block (value, length) slot
grids computed on the TPU, leaving the host only concatenation + bit
packing.  Bit-exact port of bitstream/cavlc_vec.code_blocks (parity:
reference encoder/cavlc.c block_residual_write_cavlc), restructured per the
build's north star: entropy symbol preparation is batched device work; the
only serial step left is the final varlen bit concatenation on host.

Slot layout per block (36 slots) — must stay in sync with cavlc_vec.py:
  [0] coeff_token · [1:4] t1 signs · [4:20] level codes (prefix+suffix
  fused) · [20] total_zeros · [21:36] run_before.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from x264_tpu.bitstream.tables import (
    COEFF_TOKEN_LEN,
    COEFF_TOKEN_VAL,
    RUN_BEFORE_LEN,
    RUN_BEFORE_VAL,
    TOTAL_ZEROS_LEN,
    TOTAL_ZEROS_VAL,
    TZ_2x2_LEN,
    TZ_2x2_VAL,
    TZ_2x4_LEN,
    TZ_2x4_VAL,
)

BLOCK_SLOTS = 36

# tables flattened to 1-D and fused (val | len<<16) so every lookup is a
# single-index single-gather
_CT = jnp.asarray((COEFF_TOKEN_VAL.astype(np.int32)
                   | (COEFF_TOKEN_LEN.astype(np.int32) << 16)).reshape(-1))
_TZ = jnp.asarray((TOTAL_ZEROS_VAL.astype(np.int32)
                   | (TOTAL_ZEROS_LEN.astype(np.int32) << 16)).reshape(-1))
_TZ2 = jnp.asarray((TZ_2x2_VAL.astype(np.int32)
                    | (TZ_2x2_LEN.astype(np.int32) << 16)).reshape(-1))
_TZ24 = jnp.asarray((TZ_2x4_VAL.astype(np.int32)
                     | (TZ_2x4_LEN.astype(np.int32) << 16)).reshape(-1))
_RB = jnp.asarray((RUN_BEFORE_VAL.astype(np.int32)
                   | (RUN_BEFORE_LEN.astype(np.int32) << 16)).reshape(-1))


def _level_codes(lc, sl):
    """Fused unary-prefix + suffix level code (cavlc_vec._level_codes)."""
    one = jnp.int32(1)
    mask = (one << sl) - 1
    prefix = lc >> jnp.maximum(sl, 1)
    lc_esc = jnp.where(sl == 0, lc - 15, lc)
    lcr = lc_esc - (jnp.int32(15) << sl)

    cond_a = (sl == 0) & (lc < 14)
    cond_b = (sl == 0) & (lc >= 14) & (lc < 30)
    cond_c = (sl > 0) & (prefix < 15)
    cond_d = lcr < 4096

    val = jnp.where(cond_a, 1,
          jnp.where(cond_b, (one << 4) | (lc - 14),
          jnp.where(cond_c, (one << sl) | (lc & mask),
          jnp.where(cond_d, (one << 12) | jnp.maximum(lcr, 0),
                    (one << 13) | jnp.maximum(lcr - 4096, 0)))))
    ln = jnp.where(cond_a, lc + 1,
         jnp.where(cond_b, 19,
         jnp.where(cond_c, prefix + 1 + sl,
         jnp.where(cond_d, 28, 30))))
    return val, ln


def code_blocks(coefs, blen, nC):
    """coefs (B,16) int32 zigzag left-aligned per block length; blen (B,);
    nC (B,) (-1/-2 chroma DC, else >=0).  Returns (vals, lens) (B,36) int32.
    Uncoded blocks must be masked by the caller (zero their lens)."""
    B, L = coefs.shape
    coefs = coefs.astype(jnp.int32)
    blen = blen.astype(jnp.int32)
    nC = nC.astype(jnp.int32)
    j = jnp.arange(L, dtype=jnp.int32)

    # reversal by one-hot matmul (blen is 4/15/16 per block): rev[b,k] =
    # coefs[b, blen-1-k] — a (B,1,L)@(B,L,L) batched matmul on the MXU
    # beats a take_along_axis gather here
    src = blen[:, None] - 1 - j[None, :]
    rev_1h = (src[:, None, :] == j[None, :, None]).astype(jnp.int8)
    rev = jnp.einsum("bj,bjk->bk", coefs, rev_1h,
                     preferred_element_type=jnp.int32)

    nzmask = rev != 0
    total = nzmask.sum(1).astype(jnp.int32)
    # compaction of nonzeros to the front, order preserved: one-hot of
    # each element's rank among nonzeros (replaces stable argsort +
    # take_along_axis)
    rank = jnp.cumsum(nzmask.astype(jnp.int32), axis=1) - 1
    comp_1h = (nzmask & True)[:, :, None] * \
        (rank[:, :, None] == j[None, None, :])
    seq = jnp.einsum("bj,bjk->bk", rev, comp_1h.astype(jnp.int8),
                     preferred_element_type=jnp.int32)
    pos_src = blen[:, None] - 1 - j[None, :]
    pos_zig_nz = jnp.einsum("bj,bjk->bk", pos_src + 1,
                            comp_1h.astype(jnp.int8),
                            preferred_element_type=jnp.int32) - 1
    # entries beyond `total` are -1; original argsort gave arbitrary pos
    # there — only pos_zig[:, :total] is consumed, plus pos_zig[:, 0] for
    # total==0 blocks (masked by `some`), so keep a safe value
    pos_zig = jnp.where(j[None, :] < total[:, None], pos_zig_nz, 0)

    in_range = j[None, :] < total[:, None]
    abs1 = in_range & (jnp.abs(seq) == 1)
    t1 = (abs1[:, 0].astype(jnp.int32)
          + (abs1[:, 0] & abs1[:, 1]).astype(jnp.int32)
          + (abs1[:, 0] & abs1[:, 1] & abs1[:, 2]).astype(jnp.int32))

    vals = [None] * BLOCK_SLOTS
    lens = [None] * BLOCK_SLOTS

    t = jnp.where(nC == -1, 4,
        jnp.where(nC == -2, 5,
        jnp.where(nC < 2, 0,
        jnp.where(nC < 4, 1,
        jnp.where(nC < 8, 2, 3)))))
    some = total > 0
    ct = _CT[(t * 17 + total) * 4 + t1]
    vals[0] = ct & 0xFFFF
    lens[0] = ct >> 16

    for k in range(3):
        on = (k < t1) & some
        vals[1 + k] = jnp.where(on & (seq[:, k] < 0), 1, 0)
        lens[1 + k] = on.astype(jnp.int32)

    sl = jnp.where((total > 10) & (t1 < 3), 1, 0).astype(jnp.int32)
    for k in range(L):
        active = (k >= t1) & (k < total)
        lvl = seq[:, k]
        lc = jnp.where(lvl > 0, 2 * lvl - 2, -2 * lvl - 1)
        lc = jnp.where((k == t1) & (t1 < 3), lc - 2, lc)
        v, ln = _level_codes(lc, sl)
        vals[4 + k] = jnp.where(active, v, 0)
        lens[4 + k] = jnp.where(active, ln, 0)
        sl_n = jnp.maximum(sl, 1)
        sl_n = jnp.where((jnp.abs(lvl) > (jnp.int32(3) << (sl_n - 1)))
                         & (sl_n < 6), sl_n + 1, sl_n)
        sl = jnp.where(active, sl_n, sl)

    tz = pos_zig[:, 0] + 1 - total
    on = some & (total < blen)
    tzw = jnp.where(nC == -1,
                    _TZ2[jnp.clip(total - 1, 0, 2) * 4 + jnp.clip(tz, 0, 3)],
          jnp.where(nC == -2,
                    _TZ24[jnp.clip(total - 1, 0, 6) * 8 + jnp.clip(tz, 0, 7)],
                    _TZ[jnp.clip(total - 1, 0, 14) * 16
                        + jnp.clip(tz, 0, 15)]))
    vals[20] = jnp.where(on, tzw & 0xFFFF, 0)
    lens[20] = jnp.where(on, tzw >> 16, 0)

    zeros_left = jnp.where(some, tz, 0)
    prev_pos = pos_zig[:, 0]
    for k in range(1, L):
        active = (k < total) & (zeros_left > 0)
        run = jnp.clip(prev_pos - pos_zig[:, k] - 1, 0, 14)
        ri = jnp.clip(jnp.minimum(zeros_left, 7) - 1, 0, 6)
        rb = _RB[ri * 15 + run]
        vals[20 + k] = jnp.where(active, rb & 0xFFFF, 0)
        lens[20 + k] = jnp.where(active, rb >> 16, 0)
        zeros_left = jnp.where(active, zeros_left - run, zeros_left)
        prev_pos = jnp.where(k < total, pos_zig[:, k], prev_pos)

    return jnp.stack(vals, axis=1), jnp.stack(lens, axis=1)


def _nc_from_grid(grid):
    """Vectorized CAVLC nC (9.2.1) over a total_coeff grid (GH, GW)."""
    gh, gw = grid.shape
    left = jnp.pad(grid[:, :-1], ((0, 0), (1, 0)))
    top = jnp.pad(grid[:-1, :], ((1, 0), (0, 0)))
    col = jnp.arange(gw)[None, :]
    row = jnp.arange(gh)[:, None]
    has_l = jnp.broadcast_to(col > 0, (gh, gw))
    has_t = jnp.broadcast_to(row > 0, (gh, gw))
    both = (left + top + 1) >> 1
    return jnp.where(has_l & has_t, both,
           jnp.where(has_l, left, jnp.where(has_t, top, 0))).astype(jnp.int32)


# coded (zigzag-of-quadrant) order of luma 4x4 blocks -> raster index
_C2R = jnp.asarray(np.array(
    [0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15], np.int32))


def _grid_to_mb(grid, mbh, mbw, s):
    return (grid.reshape(mbh, s, mbw, s).transpose(0, 2, 1, 3)
                .reshape(mbh * mbw, s * s))


def residual_slots(luma_dc, luma_ac, luma_nnz, chroma_dc, chroma_ac,
                   chroma_nnz, cbp_luma, cbp_chroma, is_i16,
                   mbw: int, mbh: int):
    """Assemble the full residual slot grids for a frame on device.

    luma_dc (N,16) zigzag; luma_ac (N,16,16) raster-block-major zigzag;
    *_nnz as in FrameSyntax; is_i16 (N,) bool.  Returns
    (vals (N, 27*36) int32, lens (N, 27*36) int32) in emission order:
    [luma DC | 16 luma AC coded-order | 2 chroma DC | 8 chroma AC]."""
    n = mbw * mbh

    nnz_y = (luma_nnz.reshape(mbh, mbw, 4, 4).transpose(0, 2, 1, 3)
             .reshape(4 * mbh, 4 * mbw))
    nc_y_mb = _grid_to_mb(_nc_from_grid(nnz_y), mbh, mbw, 4)   # (N,16) raster

    # luma AC in coded order
    ac = luma_ac[:, _C2R, :].astype(jnp.int32)
    i16b = is_i16[:, None, None]
    l_coefs = jnp.concatenate(
        [jnp.where(i16b, ac[:, :, 1:], ac[:, :, :15]),
         jnp.where(is_i16[:, None], 0, ac[:, :, 15])[:, :, None]], axis=2)
    quad = jnp.arange(16, dtype=jnp.int32) // 4
    blk_on = ((cbp_luma[:, None] >> quad[None, :]) & 1).astype(bool)

    nc_c = []
    for pl in range(2):
        g = (chroma_nnz[:, pl].reshape(mbh, mbw, 2, 2).transpose(0, 2, 1, 3)
             .reshape(2 * mbh, 2 * mbw))
        nc_c.append(_grid_to_mb(_nc_from_grid(g), mbh, mbw, 2))
    nc_c = jnp.stack(nc_c, axis=1)                              # (N,2,4)

    def padr(x, k):
        return jnp.concatenate(
            [x, jnp.zeros((*x.shape[:-1], k), jnp.int32)], axis=-1)

    # one fused code_blocks over all 27 blocks/MB in emission order:
    # [luma DC | 16 luma AC coded-order | 2 chroma DC | 8 chroma AC]
    coefs = jnp.concatenate([
        luma_dc[:, None, :],
        l_coefs,
        padr(chroma_dc.reshape(n, 2, 4), 12),
        padr(chroma_ac[..., 1:].reshape(n, 8, 15), 1)], axis=1)  # (N,27,16)
    blen = jnp.concatenate([
        jnp.full((n, 1), 16, jnp.int32),
        jnp.broadcast_to(jnp.where(is_i16, 15, 16)[:, None], (n, 16)),
        jnp.full((n, 2), 4, jnp.int32),
        jnp.full((n, 8), 15, jnp.int32)], axis=1)
    nC = jnp.concatenate([
        nc_y_mb[:, :1],
        nc_y_mb[:, _C2R],
        jnp.full((n, 2), -1, jnp.int32),
        nc_c.reshape(n, 8)], axis=1)
    gate = jnp.concatenate([
        is_i16[:, None],
        blk_on,
        jnp.broadcast_to((cbp_chroma > 0)[:, None], (n, 2)),
        jnp.broadcast_to((cbp_chroma == 2)[:, None], (n, 8))], axis=1)

    bvals, blens = code_blocks(coefs.reshape(n * 27, 16),
                               blen.reshape(n * 27), nC.reshape(n * 27))
    blens = jnp.where(gate.reshape(n * 27)[:, None], blens, 0)
    return (bvals.reshape(n, 27 * BLOCK_SLOTS),
            blens.reshape(n, 27 * BLOCK_SLOTS))
