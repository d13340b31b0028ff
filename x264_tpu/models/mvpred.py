"""Normative MV prediction (spec 8.4.1; parity with reference
common/mvpred.c x264_mb_predict_mv / x264_mb_predict_mv_pskip).

This is the truly sequential part of inter coding: the skip decision for MB
n depends on the decoded state of its neighbors.  It runs as a cheap host
scan over per-MB arrays after the batched device ME/transform pass — the
TPU-first split of x264's per-MB analyse loop.

All mvs in quarter-pel units, [x, y] order.
"""

from __future__ import annotations

import numpy as np

from x264_tpu.models.syntax import MB_I4, MB_I16, MB_P16, MB_PSKIP


def _median(a, b, c):
    return a + b + c - min(a, b, c) - max(a, b, c)


def predict_mv_16x16(mv_dec: np.ndarray, ref_dec: np.ndarray,
                     mbx: int, mby: int, mbw: int, cur_ref: int = 0):
    """Median MVP for a full-MB partition (8.4.1.3).  mv_dec/ref_dec hold
    the *decoded-so-far* state (intra/unavail -> ref -1, mv 0)."""

    def nb(x, y):
        if x < 0 or y < 0 or x >= mbw:
            return None
        return y * mbw + x

    ia = nb(mbx - 1, mby)
    ib = nb(mbx, mby - 1)
    ic = nb(mbx + 1, mby - 1)
    if ic is None:
        ic = nb(mbx - 1, mby - 1)  # D substitution

    def info(i):
        if i is None:
            return np.zeros(2, np.int32), -1, False
        return mv_dec[i], int(ref_dec[i]), True

    mva, refa, av_a = info(ia)
    mvb, refb, av_b = info(ib)
    mvc, refc, av_c = info(ic)

    if not av_b and not av_c and av_a:
        return mva.copy()

    match = [(mva, refa), (mvb, refb), (mvc, refc)]
    same = [m for m, r in match if r == cur_ref]
    if len(same) == 1:
        return same[0].copy()

    return np.array([_median(int(mva[0]), int(mvb[0]), int(mvc[0])),
                     _median(int(mva[1]), int(mvb[1]), int(mvc[1]))], np.int32)


def pskip_mv(mv_dec: np.ndarray, ref_dec: np.ndarray,
             mbx: int, mby: int, mbw: int):
    """P_Skip motion vector (8.4.1.1)."""
    if mbx == 0 or mby == 0:
        # A or B unavailable (left edge / top edge) -> (0,0)
        return np.zeros(2, np.int32)
    ia = mby * mbw + (mbx - 1)
    ib = (mby - 1) * mbw + mbx
    if (int(ref_dec[ia]) == 0 and mv_dec[ia][0] == 0 and mv_dec[ia][1] == 0):
        return np.zeros(2, np.int32)
    if (int(ref_dec[ib]) == 0 and mv_dec[ib][0] == 0 and mv_dec[ib][1] == 0):
        return np.zeros(2, np.int32)
    return predict_mv_16x16(mv_dec, ref_dec, mbx, mby, mbw, cur_ref=0)
