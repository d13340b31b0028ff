"""Lookahead: lowres frame-cost model + adaptive B placement (b-adapt).

Parity anchor: reference encoder/slicetype.c — slicetype_frame_cost
(lowres ME cost of a frame against its anchors) and the b_adapt=1
decision loop of slicetype_analyse.  TPU-first shape: x264 runs a
per-MB DIA search with early-outs per frame pair; here every frame-pair
cost a mini-GOP decision needs is computed in ONE jitted device call —
a batched half-res exhaustive search (the Mosaic ME kernel on TPU)
whose total arithmetic is smaller than the bookkeeping it replaces.

Decision rule (b_adapt=1 analog): for queued frames f_1..f_k after the
last anchor A, pick the largest m < k such that every f_j (j <= m) is
no more expensive as a B — cost min(ME(f_j|A), ME(f_j|f_{m+1})) — than
as a P continuing the chain (ME(f_j|f_{j-1})); f_{m+1} becomes the P
anchor.  Ties favour B (a static scene runs at maximum B density, like
x264).  The cost model is SAD + lambda*mvbits at half resolution with
16x16 lowres blocks (=32x32 source px; coarser than x264's 8x8 lowres
grain so the standard ME kernel is reused — either grain is legal
encoder policy)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from x264_tpu.models.inter_frame import PAD, sad_lambda
from x264_tpu.ops.device.me import full_search_16x16

_LOOKAHEAD_QP = 24          # fixed decision lambda (policy)


def lowres_plane(y):
    """Half-res luma (frame_init_lowres_core analog: 2x2 rounded mean),
    cropped to a whole number of 16px lowres MBs."""
    h2, w2 = y.shape[0] // 2, y.shape[1] // 2
    q = y.astype(jnp.int32)[:h2 * 2, :w2 * 2].reshape(h2, 2, w2, 2)
    lr = ((q.sum((1, 3)) + 2) >> 2).astype(jnp.uint8)
    mh, mw = (h2 // 16) * 16, (w2 // 16) * 16
    return lr[:mh, :mw]


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "pairs"))
def _pair_costs(stack, pairs, mbw: int, mbh: int):
    """stack (F, h, w) lowres frames; pairs: static tuple of (src, ref)
    indices.  Returns (len(pairs), N) int32 per-MB lowres ME costs —
    per-MB so B costs can take the per-block best direction, exactly
    like slicetype_frame_cost's per-8x8 list min."""
    lam = np.int32(sad_lambda(_LOOKAHEAD_QP))
    outs = []
    for (a, b) in pairs:
        ref = jnp.pad(stack[b], PAD, mode="edge")
        _, cost = full_search_16x16(stack[a], ref, lam, me_range=8,
                                    mbw=mbw, mbh=mbh)
        outs.append(cost)
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("mbw", "mbh"))
def _intra8(lr, mbw: int, mbh: int):
    """Per-8x8-block lowres intra SAD estimate (DC/H/V from decoded-order
    edges of the SOURCE lowres plane) — the slicetype_frame_cost lowres
    intra analog at x264's grain (8x8 on half-res).  SAD (not SATD) so
    the scale matches the lowres inter costs from the SAD ME kernel."""
    nbh, nbw = 2 * mbh, 2 * mbw
    q = lr.astype(jnp.int32)[:mbh * 16, :mbw * 16]
    blocks = q.reshape(nbh, 8, nbw, 8).transpose(0, 2, 1, 3)
    pad = jnp.pad(q, ((1, 0), (1, 0)), mode="edge")
    tops = pad[0:nbh * 8:8, 1:1 + nbw * 8].reshape(nbh, nbw, 8)
    lefts = pad[1:1 + nbh * 8, 0:nbw * 8:8].reshape(nbh, 8, nbw
                                                    ).transpose(0, 2, 1)
    at = (jnp.arange(nbh) > 0)[:, None]
    al = (jnp.arange(nbw) > 0)[None, :]
    st, sl = tops.sum(-1), lefts.sum(-1)
    dc = jnp.where(at & al, (st + sl + 8) >> 4,
         jnp.where(at, (st + 4) >> 3,
         jnp.where(al, (sl + 4) >> 3, 128)))
    big = jnp.int32(1 << 28)
    sad_dc = jnp.abs(blocks - dc[..., None, None]).sum((-1, -2))
    sad_v = jnp.abs(blocks - tops[:, :, None, :]).sum((-1, -2))
    sad_h = jnp.abs(blocks - lefts[:, :, :, None]).sum((-1, -2))
    cost = jnp.minimum(sad_dc, jnp.minimum(
        jnp.where(at, sad_v, big), jnp.where(al, sad_h, big)))
    return cost.reshape(-1)


@functools.partial(jax.jit, static_argnames=("mbw", "mbh"))
def _inter8(lr, prev_lr, mbw: int, mbh: int):
    """Per-8x8-block lowres inter cost + mv vs the previous lowres frame
    (quadrant outputs of the partition ME kernel = 8x8 lowres blocks)."""
    from x264_tpu.ops.device.me_parts import full_search_parts_xla
    lam = np.int32(sad_lambda(_LOOKAHEAD_QP))
    ref = jnp.pad(prev_lr, PAD, mode="edge")
    r = full_search_parts_xla(lr, ref, lam, me_range=8, mbw=mbw, mbh=mbh)
    # quadrant order (TL, TR, BL, BR) -> (2*mbh, 2*mbw) 8-block grid
    cq = r["cost_q"].reshape(mbh, mbw, 2, 2).transpose(0, 2, 1, 3)
    mq = r["mv_q"].reshape(mbh, mbw, 2, 2, 2).transpose(0, 2, 1, 3, 4)
    n8 = 4 * mbh * mbw
    return cq.reshape(n8), mq.reshape(n8, 2)


def lowres_stats8(lr, prev_lr, mbw: int, mbh: int):
    """(intra_cost, inter_cost, mv) at 8x8 lowres grain; inter parts are
    None for the first frame of a chain."""
    ic = _intra8(lr, mbw=mbw, mbh=mbh)
    if prev_lr is None:
        return ic, None, None
    pc, mv = _inter8(lr, prev_lr, mbw=mbw, mbh=mbh)
    return ic, pc, mv


class Lookahead:
    """Holds the last anchor's lowres plane and plans mini-GOP cuts."""

    def __init__(self, params):
        self.p = params
        self.prev_anchor = None        # lowres of the last encoded anchor

    def push_anchor(self, y):
        self.prev_anchor = lowres_plane(jnp.asarray(y))

    def plan(self, ys) -> int:
        """ys: padded source luma planes queued since the last anchor.
        Returns m = number of leading B frames (0..len-1); queue index m
        becomes the P anchor."""
        k = len(ys)
        if self.prev_anchor is None:
            return 0
        if k < 2:
            return k - 1
        lrs = [self.prev_anchor] + [lowres_plane(jnp.asarray(y))
                                    for y in ys]
        h, w = lrs[0].shape
        mbw, mbh = w // 16, h // 16
        if mbw < 1 or mbh < 1:
            return k - 1
        stack = jnp.stack(lrs)         # 0 = prev anchor, 1..k = queue
        pairs = []
        for j in range(1, k + 1):
            pairs.append((j, j - 1))                 # P-chain cost
        for j in range(2, k + 1):
            pairs.append((j, 0))                     # vs previous anchor
        for m in range(1, k):
            for j in range(1, m + 1):
                pairs.append((j, m + 1))             # vs candidate anchor
        c = np.asarray(_pair_costs(stack, tuple(pairs), mbw=mbw, mbh=mbh)
                       ).astype(np.int64)
        cp = {j: c[j - 1] for j in range(1, k + 1)}      # per-MB arrays
        ca = {1: cp[1]}
        ca.update({j: c[k + j - 2] for j in range(2, k + 1)})
        idx = 2 * k - 1
        cb_back = {}
        for m in range(1, k):
            for j in range(1, m + 1):
                cb_back[(j, m)] = c[idx]
                idx += 1
        for m in range(k - 1, 0, -1):  # prefer the longest B run
            if all(int(np.minimum(ca[j], cb_back[(j, m)]).sum())
                   <= int(cp[j].sum())
                   for j in range(1, m + 1)):
                return m
        return 0
