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
