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
from x264_tpu.ops.device.pixel import satd
from x264_tpu.ops.reference.mc import QPEL_TWO_SAMPLE_TBL


def full_search_16x16(src_y, ref_pad, lam, me_range: int, mbw: int,
                      mbh: int):
    """src_y (H,W) uint8, ref_pad (H+2PAD, W+2PAD) uint8, lam traced int32.
    Returns (mv (N,2) int32 qpel, cost (N,) int32).  Dispatches to the
    Mosaic kernel on TPU (8x faster at 1080p, bit-exact; me_pallas.py),
    the XLA fori_loop elsewhere.  The packed-key argmin caps the range
    at 24 (int32 key overflow) — larger ranges use the XLA path."""
    if jax.default_backend() == "tpu" and me_range <= 24:
        from x264_tpu.ops.device.me_pallas import full_search_pallas
        return full_search_pallas(src_y, ref_pad, lam, me_range=me_range,
                                  mbw=mbw, mbh=mbh)
    return _full_search_xla(src_y, ref_pad, lam, me_range=me_range,
                            mbw=mbw, mbh=mbh)


@functools.partial(jax.jit, static_argnames=("me_range", "mbw", "mbh"))
def _full_search_xla(src_y, ref_pad, lam, me_range: int, mbw: int,
                     mbh: int):
    r = me_range
    span = 2 * r + 1
    h, w = mbh * 16, mbw * 16
    n = mbw * mbh
    src = src_y.astype(jnp.int32)
    ref = ref_pad.astype(jnp.int32)
    bits = jnp.asarray(mv_bits_arr(4 * r).astype(np.int32))

    def body(t, carry):
        best, best_mv = carry
        dy = t - r
        # one dynamic row-band slice per dy; the dx axis is unrolled as
        # STATIC slices of the band (33 small fused ops beat 33 sliced
        # loop iterations by ~20x in dispatch overhead)
        band = jax.lax.dynamic_slice(ref, (PAD + dy, 0), (h, w + 2 * PAD))
        cost_y = lam * bits[4 * dy + 4 * r]
        for dx in range(-r, r + 1):
            shifted = band[:, PAD + dx:PAD + dx + w]
            sad = (jnp.abs(src - shifted)
                   .reshape(mbh, 16, mbw, 16).sum((1, 3)).reshape(n))
            cost = sad + cost_y + lam * bits[4 * dx + 4 * r]
            better = cost < best
            best = jnp.where(better, cost, best)
            cand = jnp.stack([jnp.full(n, 4 * dx, jnp.int32),
                              jnp.full(n, 4 * dy, jnp.int32)], axis=1)
            best_mv = jnp.where(better[:, None], cand, best_mv)
        return best, best_mv

    best0 = jnp.full(n, jnp.int32(1 << 30))
    mv0 = jnp.zeros((n, 2), jnp.int32)
    best, best_mv = jax.lax.fori_loop(0, span, body, (best0, mv0))
    return best_mv, best


def subpel_candidates(steps: int):
    """Candidate qpel deltas around the fullpel best: center first (wins
    ties), then raster order.  steps=1: half-pel grid (+-2), steps>=2:
    full quarter-pel +-3 grid.  Shared with the NumPy tier."""
    s = 2 if steps == 1 else 1
    r = 2 if steps == 1 else 3
    return [(0, 0)] + [(dy, dx)
                       for dy in range(-r, r + 1, s)
                       for dx in range(-r, r + 1, s)
                       if not (dy == 0 and dx == 0)]


def _filt6(a, b, c, d, e, f):
    return a - 5 * b + 20 * c + 20 * d - 5 * e + f


def _hpel_windows(g):
    """Per-MB half-pel windows from fullpel windows g (N,23,23) int32
    whose [0,0] sits at plane position (y0-2, x0-2).  Returns
    (4, N, 18, 18) [fp, hh, hv, hc] — bit-exact with gathering the same
    windows from mc.hpel_planes (same 6-tap chain, and the window's
    2-sample margin covers every tap the 18x18 interior needs)."""
    bh = _filt6(g[:, :, 0:18], g[:, :, 1:19], g[:, :, 2:20],
                g[:, :, 3:21], g[:, :, 4:22], g[:, :, 5:23])  # (N,23,18)
    hh = jnp.clip((bh[:, 2:20, :] + 16) >> 5, 0, 255)
    bv = _filt6(g[:, 0:18, :], g[:, 1:19, :], g[:, 2:20, :],
                g[:, 3:21, :], g[:, 4:22, :], g[:, 5:23, :])  # (N,18,23)
    hv = jnp.clip((bv[:, :, 2:20] + 16) >> 5, 0, 255)
    cc = _filt6(bh[:, 0:18], bh[:, 1:19], bh[:, 2:20],
                bh[:, 3:21], bh[:, 4:22], bh[:, 5:23])        # (N,18,18)
    hc = jnp.clip((cc + 512) >> 10, 0, 255)
    return jnp.stack([g[:, 2:20, 2:20], hh, hv, hc])


def subpel_refine(src_mbs, planes4, mv0, lam, me_range: int, steps: int,
                  mbw: int, mbh: int, ref_idx=None, return_pred=False,
                  ref_pad=None):
    """SATD subpel refinement, exhaustive over the +-3 qpel window of the
    fullpel best (parity intent: reference encoder/me.c refine_subpel; an
    exhaustive window is the TPU-shaped equivalent of its iterated
    diamonds — every candidate has a *uniform* fractional position across
    MBs, so prediction is two static slices of a per-MB (4,18,18)
    half-pel window, no per-MB plane gathers).

    src_mbs (N,16,16); planes4 from mc.hpel_planes(ref_y_pad) — or, with
    ref_idx (N,) given, stacked (K,4,Hp,Wp) planes gathered per MB's
    chosen reference; mv0 (N,2) fullpel-aligned qpel mvs.
    Returns (mv (N,2), cost (N,))."""
    n = mbw * mbh
    off = 4 * me_range + 4
    bits = jnp.asarray(mv_bits_arr(off).astype(np.int32))

    mby = jnp.arange(n, dtype=jnp.int32) // mbw
    mbx = jnp.arange(n, dtype=jnp.int32) % mbw
    y0 = PAD + mby * 16 + (mv0[:, 1] >> 2) - 1
    x0 = PAD + mbx * 16 + (mv0[:, 0] >> 2) - 1
    if ref_pad is not None:
        # gather only the fullpel window and run the 6-tap chain inside
        # it: ~2.4x fewer gathered elements than indexing 4 hpel planes,
        # and the caller can skip computing them entirely
        r23 = jnp.arange(23, dtype=jnp.int32)
        yi = (y0 - 2)[:, None, None] + r23[None, :, None]
        xi = (x0 - 2)[:, None, None] + r23[None, None, :]
        if ref_pad.ndim == 2:
            g = ref_pad[yi, xi].astype(jnp.int32)
        else:
            g = ref_pad[ref_idx[:, None, None], yi, xi].astype(jnp.int32)
        win = _hpel_windows(g)                  # (4, N, 18, 18)
    else:
        # the 4 half-pel planes travel packed one-byte-per-plane in a
        # uint32 word and the per-MB (18,18) word windows come from the
        # one-hot MXU gather (ops/device/wingather.py) — the XLA gather
        # this replaces cost ~52 ms/1080p frame at ~20ns/element.
        from x264_tpu.ops.device.wingather import (gather_win18,
                                                   pack_planes4)
        packed = pack_planes4(planes4)
        w32 = gather_win18(packed, y0, x0, mbw, mbh,
                           ref_idx=(None if planes4.ndim == 3
                                    else ref_idx))[:, :, :18]
        win = jnp.stack([((w32 >> (8 * i)) & 0xFF).astype(jnp.int32)
                         for i in range(4)])               # (4, N, 18, 18)

    # candidates are evaluated in CHUNKs stacked into one batched SATD
    # call: 16x16 blocks are tiny for the VPU, so a (chunk*N,16,16)
    # transform amortizes per-op latency ~chunk-fold.  Tie-break parity
    # with the scalar loop: argmin picks the FIRST min within a chunk
    # (candidate list order), strict < keeps the earlier chunk.
    cands = subpel_candidates(steps)
    CHUNK = 7
    best = None
    best_mv = mv0
    best_pred = None
    for ci in range(0, len(cands), CHUNK):
        chunk = cands[ci:ci + CHUNK]
        preds, mvs, bitc = [], [], []
        for (dy, dx) in chunk:
            fy, fx = dy & 3, dx & 3
            iy, ix = dy >> 2, dx >> 2
            p1, dy1, dx1, p2, dy2, dx2 = (int(t) for t in
                                          QPEL_TWO_SAMPLE_TBL[fx, fy])
            s1 = win[p1, :, 1 + iy + dy1:17 + iy + dy1,
                     1 + ix + dx1:17 + ix + dx1]
            s2 = win[p2, :, 1 + iy + dy2:17 + iy + dy2,
                     1 + ix + dx2:17 + ix + dx2]
            preds.append((s1 + s2 + 1) >> 1)
            cand = mv0 + jnp.array([dx, dy], jnp.int32)
            mvs.append(cand)
            bitc.append(bits[cand[:, 0] + off] + bits[cand[:, 1] + off])
        m = len(chunk)
        predm = jnp.stack(preds)                            # (m, N, 16, 16)
        src_rep = jnp.broadcast_to(src_mbs, (m, n, 16, 16)
                                   ).reshape(m * n, 16, 16)
        c = (satd(src_rep, predm.reshape(m * n, 16, 16)).reshape(m, n)
             + lam * jnp.stack(bitc))                       # (m, N)
        idx = jnp.argmin(c, axis=0)                         # first min wins
        cmin = jnp.take_along_axis(c, idx[None], axis=0)[0]
        mvc = jnp.take_along_axis(jnp.stack(mvs), idx[None, :, None],
                                  axis=0)[0]
        if return_pred:
            predc = jnp.take_along_axis(
                predm, idx[None, :, None, None], axis=0)[0]  # (N, 16, 16)
        if best is None:
            best, best_mv = cmin, mvc
            best_pred = predc if return_pred else None
        else:
            better = cmin < best
            best = jnp.where(better, cmin, best)
            best_mv = jnp.where(better[:, None], mvc, best_mv)
            if return_pred:
                best_pred = jnp.where(better[:, None, None], predc,
                                      best_pred)
    if return_pred:
        # the winner's prediction IS the motion-compensated block (same
        # two-sample interpolation as mc_luma_qpel, selected by the same
        # better-mask as the mv), so callers skip a second qpel gather
        return best_mv, best, best_pred
    return best_mv, best
