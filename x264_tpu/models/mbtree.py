"""Macroblock-tree: temporal QP propagation over the lookahead window.

Parity anchor: reference encoder/slicetype.c macroblock_tree /
macroblock_tree_propagate / macroblock_tree_finish (:1091/:1051/:1029)
and mc.c mbtree_propagate_cost.  The idea: macroblocks that future
frames keep referencing deserve lower QP.  Walking the lookahead window
backward, each lowres MB hands `(intra + carried) * (intra - inter) /
intra` down to the reference MBs its motion vector overlaps (bilinear
area weights); the finish step turns the accumulated amount into
qp_offset = -strength * log2((intra + propagate) / intra), with
strength = 5 * (1 - qcomp) like x264.

TPU-first split: the per-frame lowres ME costs/mvs come from the device
kernels (via models/lookahead.py); the backward walk itself is a tiny
O(frames * lowres-MBs) scatter that runs in NumPy — at half resolution
with 16px blocks a 1080p frame is 528 MBs, far below device dispatch
granularity.  Our lowres grain is 16x16 (=32x32 source px -> one offset
drives a 2x2 group of real MBs); x264 uses 8x8.  Either is legal
encoder policy.
"""

from __future__ import annotations

import numpy as np

_QCOMP = 0.6


def propagate(ics, pcs, mvs, mbw: int, mbh: int):
    """Backward propagation over the window.

    ics: list of (N,) lowres intra cost estimates, oldest first (index 0
    is the frame about to be encoded); pcs[i], mvs[i]: inter cost and mv
    (qpel, lowres) of frame i predicted from frame i-1 (pcs[0]/mvs[0]
    unused).  Returns the accumulated propagate_in for frame 0 (N,)."""
    n = mbw * mbh
    k = len(ics)
    prop = np.zeros(n, np.float64)
    for i in range(k - 1, 0, -1):
        ic = np.maximum(ics[i].astype(np.float64), 1.0)
        pc = np.minimum(pcs[i].astype(np.float64), ic)
        amount = (ic + prop) * (ic - pc) / ic
        prop = _splat(amount, mvs[i], mbw, mbh)
    return prop


def _splat(amount, mv, mbw: int, mbh: int):
    """Distribute per-MB amounts into the reference frame's MB grid at
    the mv-displaced position with bilinear area weights
    (mbtree_propagate_cost analog, 16px lowres blocks)."""
    n = mbw * mbh
    idx = np.arange(n)
    x0 = (idx % mbw) * 16 + (mv[:, 0] >> 2)      # fullpel lowres coords
    y0 = (idx // mbw) * 16 + (mv[:, 1] >> 2)
    bx, fx = np.divmod(x0, 16)
    by, fy = np.divmod(y0, 16)
    out = np.zeros((mbh + 2, mbw + 2), np.float64)   # 1-cell borders
    w00 = (16 - fx) * (16 - fy) / 256.0
    w01 = fx * (16 - fy) / 256.0
    w10 = (16 - fx) * fy / 256.0
    w11 = fx * fy / 256.0
    bxc = np.clip(bx + 1, 0, mbw)
    byc = np.clip(by + 1, 0, mbh)
    for (dy, dx, w) in ((0, 0, w00), (0, 1, w01), (1, 0, w10), (1, 1, w11)):
        np.add.at(out, (byc + dy, bxc + dx), amount * w)
    return out[1:mbh + 1, 1:mbw + 1].reshape(n)


def finish(ic, prop, strength=None):
    """qp offsets (negative where the future references this content)."""
    if strength is None:
        strength = 5.0 * (1.0 - _QCOMP)
    ic = np.maximum(ic.astype(np.float64), 1.0)
    return -strength * np.log2((ic + prop) / ic)


def expand_offsets(off_lr, mbw_lr, mbh_lr, mbw, mbh):
    """Lowres 16px-grid offsets -> fullres MB grid (each lowres MB covers
    a 2x2 group of real MBs; edge MBs reuse the nearest group)."""
    g = off_lr.reshape(mbh_lr, mbw_lr)
    g = np.repeat(np.repeat(g, 2, 0), 2, 1)
    gy = np.minimum(np.arange(mbh), g.shape[0] - 1)
    gx = np.minimum(np.arange(mbw), g.shape[1] - 1)
    return g[np.ix_(gy, gx)].reshape(mbh * mbw)
