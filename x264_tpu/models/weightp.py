"""Explicit weighted prediction for P slices (--weightp).

Capability anchor: reference encoder/slicetype.c x264_weights_analyse
(:284) + common/mc.c mc_weight; re-thought for this pipeline:

- Analysis runs on the HOST over *source* frames (like the reference,
  whose analysis uses lookahead lowres fenc planes, not recon) so the
  per-frame weight decision never forces a device round-trip.
- The device core always applies the (possibly neutral) weight to the
  interpolated luma prediction — spec 8.4.2.3.3 order (interpolate,
  then weight) — so there is ONE compiled graph whether or not the
  frame is faded.  Motion search stays unweighted: SATD's non-DC terms
  are offset-invariant, so offset fades don't bias the mv choice.
- Chroma is signaled unweighted (chroma_weight_l0_flag=0 == default
  weights), matching the common weightp=1 usage.

LOG2_DENOM is fixed at 6 (neutral weight 64); the reference picks a
denom per slice, but a fixed denom covers scales up to ~2x and keeps
the device math shift-static.
"""

from __future__ import annotations

import numpy as np

LOG2_DENOM = 6
NEUTRAL = (1 << LOG2_DENOM, 0)


def weight_cost(cur, ref, w: int, off: int) -> int:
    """Subsampled SAD of cur vs weighted ref (analysis metric only)."""
    pred = np.clip(((ref * w + 32) >> LOG2_DENOM) + off, 0, 255)
    return int(np.abs(cur - pred).sum())


def analyse_weights(cur_y: np.ndarray, ref_srcs) -> list:
    """Pick (weight, offset) per list0 reference from SOURCE luma planes.

    cur_y: current source luma (H, W) uint8; ref_srcs: list of source
    luma planes in list0 order.  Returns [(w, off), ...] — NEUTRAL when
    weighting doesn't clearly pay (the reference's acceptance rule is
    also improvement-thresholded, slicetype.c:440)."""
    s = 4                                   # subsample: 1/16 of the pixels
    c = cur_y[::s, ::s].astype(np.int64)
    out = []
    for rv in ref_srcs:
        r = rv[::s, ::s].astype(np.int64)
        base = int(np.abs(c - r).sum())
        mc, mr = float(c.mean()), float(r.mean())
        vc, vr = float(c.var()), float(r.var())
        guess_w = (1 << LOG2_DENOM) if vr <= 0 else int(
            round((1 << LOG2_DENOM) * np.sqrt(max(vc, 0.0) / vr)))
        guess_w = int(np.clip(guess_w, 0, 127))
        best = (base, *NEUTRAL)
        for w in range(max(0, guess_w - 1), min(128, guess_w + 2)):
            off0 = int(round(mc - w * mr / (1 << LOG2_DENOM)))
            for off in range(off0 - 1, off0 + 2):
                if not -128 <= off <= 127:
                    continue
                sad = weight_cost(c, r, w, off)
                if sad < best[0]:
                    best = (sad, w, off)
        sad, w, off = best
        # accept only a clear win (> ~3% SAD reduction), like the
        # reference's fraction-of-cost threshold
        if sad >= base - (base >> 5):
            w, off = NEUTRAL
        out.append((w, off))
    return out


def apply_weights_jnp(pred, wts, ref_idx):
    """Device-side 8.4.2.3.3 explicit weighting of interpolated luma.

    pred: (N, 16, 16) int32 interpolated prediction; wts: (K, 2) int32
    [weight, offset] per list0 ref; ref_idx: (N,) chosen reference."""
    import jax.numpy as jnp
    w = wts[ref_idx, 0][:, None, None]
    off = wts[ref_idx, 1][:, None, None]
    return jnp.clip(((pred * w + (1 << (LOG2_DENOM - 1))) >> LOG2_DENOM)
                    + off, 0, 255)
