"""Device (JAX) intra prediction — all modes generated batched, bit-exact
counterpart of ops/reference/predict.py (parity: reference common/predict.c).

Inputs are edge vectors gathered from the reconstruction state by the
wavefront driver (models/intra_device.py); each function emits every mode at
once so mode decision is a vectorized cost argmin.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _clip8(x):
    return jnp.clip(x, 0, 255)


def predict_16x16_all(top, left, topleft, avail_top, avail_left):
    """top (N,16), left (N,16), topleft (N,), avail_* (N,) bool
    -> (N, 4, 16, 16) int32 [V, H, DC, Plane]."""
    n = top.shape[0]
    t = top.astype(jnp.int32)
    l = left.astype(jnp.int32)
    tl = topleft.astype(jnp.int32)
    at = avail_top.astype(bool)
    al = avail_left.astype(bool)

    v = jnp.broadcast_to(t[:, None, :], (n, 16, 16))
    h = jnp.broadcast_to(l[:, :, None], (n, 16, 16))

    st, sl = t.sum(1), l.sum(1)
    dc_val = jnp.where(at & al, (st + sl + 16) >> 5,
             jnp.where(at, (st + 8) >> 4,
             jnp.where(al, (sl + 8) >> 4, 128)))
    dc = jnp.broadcast_to(dc_val[:, None, None], (n, 16, 16))

    xp = jnp.arange(1, 9, dtype=jnp.int32)
    tt = jnp.concatenate([tl[:, None], t], axis=1)
    ll = jnp.concatenate([tl[:, None], l], axis=1)
    idx = np.arange(8)
    hgrad = (xp[None, :] * (tt[:, 9 + idx] - tt[:, 7 - idx])).sum(1)
    vgrad = (xp[None, :] * (ll[:, 9 + idx] - ll[:, 7 - idx])).sum(1)
    b = (5 * hgrad + 32) >> 6
    c = (5 * vgrad + 32) >> 6
    a = 16 * (l[:, 15] + t[:, 15])
    xg = jnp.arange(16, dtype=jnp.int32)
    plane = _clip8((a[:, None, None]
                    + b[:, None, None] * (xg[None, None, :] - 7)
                    + c[:, None, None] * (xg[None, :, None] - 7) + 16) >> 5)

    return jnp.stack([v, h, dc, plane], axis=1).astype(jnp.int32)


def predict_chroma_all(top, left, topleft, avail_top, avail_left):
    """top (N,8), left (N,8) -> (N, 4, 8, 8) [DC, H, V, Plane]."""
    n = top.shape[0]
    t = top.astype(jnp.int32)
    l = left.astype(jnp.int32)
    tl = topleft.astype(jnp.int32)
    at = avail_top.astype(bool)
    al = avail_left.astype(bool)

    st0, st1 = t[:, :4].sum(1), t[:, 4:].sum(1)
    sl0, sl1 = l[:, :4].sum(1), l[:, 4:].sum(1)

    q00 = jnp.where(at & al, (st0 + sl0 + 4) >> 3,
          jnp.where(at, (st0 + 2) >> 2,
          jnp.where(al, (sl0 + 2) >> 2, 128)))
    q11 = jnp.where(at & al, (st1 + sl1 + 4) >> 3,
          jnp.where(at, (st1 + 2) >> 2,
          jnp.where(al, (sl1 + 2) >> 2, 128)))
    q10 = jnp.where(at, (st1 + 2) >> 2, jnp.where(al, (sl0 + 2) >> 2, 128))
    q01 = jnp.where(al, (sl1 + 2) >> 2, jnp.where(at, (st0 + 2) >> 2, 128))

    yy = jnp.arange(8)[None, :, None]
    xx = jnp.arange(8)[None, None, :]
    dc = jnp.where((yy < 4) & (xx < 4), q00[:, None, None],
         jnp.where((yy < 4) & (xx >= 4), q10[:, None, None],
         jnp.where((yy >= 4) & (xx < 4), q01[:, None, None],
                   q11[:, None, None])))

    h = jnp.broadcast_to(l[:, :, None], (n, 8, 8))
    v = jnp.broadcast_to(t[:, None, :], (n, 8, 8))

    xp = jnp.arange(1, 5, dtype=jnp.int32)
    tt = jnp.concatenate([tl[:, None], t], axis=1)
    ll = jnp.concatenate([tl[:, None], l], axis=1)
    idx = np.arange(4)
    hgrad = (xp[None, :] * (tt[:, 5 + idx] - tt[:, 3 - idx])).sum(1)
    vgrad = (xp[None, :] * (ll[:, 5 + idx] - ll[:, 3 - idx])).sum(1)
    a = 16 * (l[:, 7] + t[:, 7])
    b = (17 * hgrad + 16) >> 5
    c = (17 * vgrad + 16) >> 5
    xg = jnp.arange(8, dtype=jnp.int32)
    plane = _clip8((a[:, None, None]
                    + b[:, None, None] * (xg[None, None, :] - 3)
                    + c[:, None, None] * (xg[None, :, None] - 3) + 16) >> 5)

    return jnp.stack([dc, h, v, plane], axis=1).astype(jnp.int32)


def i16x16_mode_avail(at, al, atl):
    """(N,) bools -> (N,4) mode mask [V, H, DC, Plane]."""
    always = jnp.ones_like(at, dtype=bool)
    return jnp.stack([at, al, always, at & al & atl], axis=-1)


def chroma_mode_avail(at, al, atl):
    always = jnp.ones_like(at, dtype=bool)
    return jnp.stack([always, al, at, at & al & atl], axis=-1)
