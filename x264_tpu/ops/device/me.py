"""Device (JAX) motion estimation — batched exhaustive fullpel search.

TPU-first rationale (parity anchor: reference encoder/me.c): x264's
DIA/HEX/UMH patterns exist to skip work on a latency-bound CPU; on TPU the
whole +-range SAD field for every MB is a dense, regular computation that
maps straight onto the VPU, so ESA *is* the fast path (same reasoning as
x264's own OpenCL lookahead, encoder/slicetype-cl.c).

Cost model matches the reference tier bit-exactly: sad + lambda*bits(mvd_x)
+ lambda*bits(mvd_y) with exp-Golomb bit counts, ties broken toward the
first candidate in (dy, dx) raster order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x264_tpu.models.inter_frame import PAD, mv_bits_arr


@functools.partial(jax.jit, static_argnames=("me_range", "mbw", "mbh"))
def full_search_16x16(src_y, ref_pad, lam, me_range: int, mbw: int, mbh: int):
    """src_y (H,W) uint8, ref_pad (H+2PAD, W+2PAD) uint8, lam traced int32.
    Returns (mv (N,2) int32 qpel, cost (N,) int32)."""
    r = me_range
    span = 2 * r + 1
    h, w = mbh * 16, mbw * 16
    n = mbw * mbh
    src = src_y.astype(jnp.int32)
    ref = ref_pad.astype(jnp.int32)
    bits = jnp.asarray(mv_bits_arr(4 * r).astype(np.int32))

    def body(t, carry):
        best, best_mv = carry
        dy = t // span - r
        dx = t % span - r
        shifted = jax.lax.dynamic_slice(ref, (PAD + dy, PAD + dx), (h, w))
        sad = (jnp.abs(src - shifted)
               .reshape(mbh, 16, mbw, 16).sum((1, 3)).reshape(n))
        cost = sad + lam * (bits[4 * dy + 4 * r] + bits[4 * dx + 4 * r])
        better = cost < best
        best = jnp.where(better, cost, best)
        cand = jnp.stack([jnp.full(n, 4 * dx, jnp.int32),
                          jnp.full(n, 4 * dy, jnp.int32)], axis=1)
        best_mv = jnp.where(better[:, None], cand, best_mv)
        return best, best_mv

    best0 = jnp.full(n, jnp.int32(1 << 30))
    mv0 = jnp.zeros((n, 2), jnp.int32)
    best, best_mv = jax.lax.fori_loop(0, span * span, body, (best0, mv0))
    return best_mv, best


# subpel refinement candidate order (fixed; the NumPy tier mirrors it)
_DIAMOND8 = ((-1, -1), (-1, 0), (-1, 1), (0, -1),
             (0, 1), (1, -1), (1, 0), (1, 1))


def subpel_refine(src_mbs, planes4, mv0, lam, me_range: int, steps: int,
                  mbw: int, mbh: int):
    """SATD-based half- then quarter-pel refinement around the fullpel
    best (parity: reference encoder/me.c refine_subpel — the mbcmp switch
    from SAD to SATD at subpel is x264's, common/pixel mbcmp_init).

    src_mbs (N,16,16); planes4 from mc.hpel_planes(ref_y_pad); mv0 (N,2)
    fullpel-aligned qpel mvs; steps: 1 = hpel, 2 = hpel+qpel.
    Returns (refined mv (N,2), cost (N,))."""
    from x264_tpu.ops.device.mc import mc_luma_qpel
    from x264_tpu.ops.device.pixel import satd

    n = mbw * mbh
    off = 4 * me_range + 4
    bits = jnp.asarray(mv_bits_arr(off).astype(np.int32))

    def cost_of(mv):
        pred = mc_luma_qpel(planes4, mv, mbw, mbh, PAD)
        return (satd(src_mbs, pred)
                + lam * (bits[mv[:, 0] + off] + bits[mv[:, 1] + off]))

    best_mv = mv0
    best = cost_of(mv0)
    for step in ([2, 1] if steps >= 2 else [2])[:max(steps, 0)] or []:
        for (dy, dx) in _DIAMOND8:
            cand = best_mv + jnp.array([dx * step, dy * step], jnp.int32)
            cand = jnp.clip(cand, -off + 1, off - 1)
            c = cost_of(cand)
            better = c < best
            best = jnp.where(better, c, best)
            best_mv = jnp.where(better[:, None], cand, best_mv)
    return best_mv, best
