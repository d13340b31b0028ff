"""Partition MVP/mvd classification: device parallel form vs the host
decode-order scan oracle (and vs the 16x16 classifier when every MB is
16x16) — the checkasm-style gate for ops/device/header.classify_p_parts."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from x264_tpu.models.mvpred import classify_p_parts_scan  # noqa: E402
from x264_tpu.ops.device import header as dheader  # noqa: E402


def _random_field(rng, mbw, mbh, nref=1, with_intra=False):
    n = mbw * mbh
    shape = rng.integers(0, 4, n).astype(np.int32)
    # quadrant mvs consistent with the shape (shared within partitions)
    mvq = rng.integers(-32, 33, (n, 4, 2)).astype(np.int32)
    mv8 = np.zeros_like(mvq)
    pofq = np.array([[0, 0, 0, 0], [0, 0, 1, 1],
                     [0, 1, 0, 1], [0, 1, 2, 3]])
    firstq = np.array([[0, 0, 0, 0], [0, 2, 0, 0],
                       [0, 1, 0, 0], [0, 1, 2, 3]])
    for i in range(n):
        for q in range(4):
            p = pofq[shape[i], q]
            mv8[i, q] = mvq[i, firstq[shape[i], p]]
    ref8 = np.zeros((n, 4), np.int32)
    if nref > 1:
        r = rng.integers(0, nref, n).astype(np.int32)
        ref8[:] = r[:, None]
    # sprinkle zero mvs so skips occur
    zero = rng.random(n) < 0.3
    mv8[zero] = 0
    if nref > 1:
        ref8[zero] = 0
    shape[zero] = 0
    cbp_l = np.where(rng.random(n) < 0.5, 0,
                     rng.integers(1, 16, n)).astype(np.int32)
    cbp_c = np.where(rng.random(n) < 0.6, 0,
                     rng.integers(1, 3, n)).astype(np.int32)
    intra = (rng.random(n) < 0.15) if with_intra else np.zeros(n, bool)
    return shape, mv8, ref8, cbp_l, cbp_c, intra


@pytest.mark.parametrize("mbw,mbh,nref,with_intra,seed", [
    (6, 4, 1, False, 0),
    (6, 4, 1, True, 1),
    (5, 3, 3, True, 2),
    (8, 6, 2, False, 3),
    (1, 1, 1, False, 4),
    (2, 1, 1, True, 5),
])
def test_parts_classify_matches_scan(mbw, mbh, nref, with_intra, seed):
    rng = np.random.default_rng(seed)
    shape, mv8, ref8, cbp_l, cbp_c, intra = _random_field(
        rng, mbw, mbh, nref, with_intra)

    skip_ref, mvd_ref = classify_p_parts_scan(
        shape, mv8, ref8, intra, cbp_l, cbp_c, mbw, mbh)

    cls_d, mvd_d, skip_d = dheader.classify_p_parts(
        jnp.asarray(mv8), jnp.asarray(ref8), jnp.asarray(shape),
        jnp.asarray(cbp_l), jnp.asarray(cbp_c), mbw, mbh,
        intra=jnp.asarray(intra) if with_intra else None)

    np.testing.assert_array_equal(np.asarray(skip_d), skip_ref)
    # oracle reports mvd only for live slots of non-skip inter MBs
    live = ~skip_ref & ~intra
    np.testing.assert_array_equal(np.asarray(mvd_d)[live],
                                  mvd_ref[live])


def test_parts_all_16x16_matches_classify_p():
    rng = np.random.default_rng(7)
    mbw, mbh = 7, 5
    n = mbw * mbh
    mv = rng.integers(-40, 41, (n, 2)).astype(np.int32)
    mv[rng.random(n) < 0.4] = 0
    cbp_l = np.where(rng.random(n) < 0.5, 0, 5).astype(np.int32)
    cbp_c = np.zeros(n, np.int32)
    intra = rng.random(n) < 0.2
    ref = rng.integers(0, 2, n).astype(np.int32)

    cls0, mvd0 = dheader.classify_p(
        jnp.asarray(mv), jnp.asarray(cbp_l), jnp.asarray(cbp_c),
        mbw, mbh, ref=jnp.asarray(ref), intra=jnp.asarray(intra))

    mv8 = np.broadcast_to(mv[:, None, :], (n, 4, 2)).copy()
    ref8 = np.broadcast_to(ref[:, None], (n, 4)).copy()
    cls1, mvd_part, skip1 = dheader.classify_p_parts(
        jnp.asarray(mv8), jnp.asarray(ref8),
        jnp.zeros(n, jnp.int32), jnp.asarray(cbp_l),
        jnp.asarray(cbp_c), mbw, mbh, intra=jnp.asarray(intra))

    np.testing.assert_array_equal(np.asarray(cls0), np.asarray(cls1))
    live = ~np.asarray(skip1) & ~intra
    np.testing.assert_array_equal(np.asarray(mvd0)[live],
                                  np.asarray(mvd_part)[live, 0])
