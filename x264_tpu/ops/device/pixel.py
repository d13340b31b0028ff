"""Device (JAX) pixel metrics — SAD/SSD/SATD batched over leading dims
(parity: reference common/pixel.c; the x264 >>1 SATD convention)."""

from __future__ import annotations

import jax.numpy as jnp

_H4 = jnp.array([[1, 1, 1, 1],
                 [1, 1, -1, -1],
                 [1, -1, -1, 1],
                 [1, -1, 1, -1]], dtype=jnp.int32)


def sad(a, b):
    return jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32)).sum((-1, -2))


def ssd(a, b):
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return (d * d).sum((-1, -2))


def _hadamard4(x):
    return jnp.einsum("ij,...jk,lk->...il", _H4, x, _H4,
                      preferred_element_type=jnp.int32)


def satd(a, b):
    """SATD over (..., h, w), h/w multiples of 4: sum of 4x4 Hadamard SATDs
    (x264 satd_MxN composition), final >>1."""
    h, w = a.shape[-2], a.shape[-1]
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    d = d.reshape(*d.shape[:-2], h // 4, 4, w // 4, 4)
    d = jnp.moveaxis(d, -2, -3)
    t = jnp.abs(_hadamard4(d)).sum((-1, -2))
    return t.sum((-1, -2)) >> 1


def var(a):
    x = a.astype(jnp.int32)
    n = x.shape[-1] * x.shape[-2]
    s = x.sum((-1, -2))
    sq = (x * x).sum((-1, -2))
    return sq - (s * s) // n
