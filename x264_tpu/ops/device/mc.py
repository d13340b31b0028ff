"""Device (JAX) motion compensation — index-array gathers over padded
reference planes (parity: reference common/mc.c; the fullpel + normative
chroma 1/8-pel bilinear paths, hpel/qpel planes follow with subpel ME)."""

from __future__ import annotations

import jax.numpy as jnp


def mc_luma_fullpel(ref_pad, mv, mbw: int, mbh: int, pad: int):
    """Gather (N,16,16) fullpel predictions.  mv (N,2) qpel (multiples of 4)."""
    n = mbw * mbh
    mby = jnp.arange(n, dtype=jnp.int32) // mbw
    mbx = jnp.arange(n, dtype=jnp.int32) % mbw
    y0 = pad + mby * 16 + (mv[:, 1] >> 2)
    x0 = pad + mbx * 16 + (mv[:, 0] >> 2)
    yi = y0[:, None, None] + jnp.arange(16, dtype=jnp.int32)[None, :, None]
    xi = x0[:, None, None] + jnp.arange(16, dtype=jnp.int32)[None, None, :]
    return ref_pad[yi, xi].astype(jnp.int32)


def mc_chroma(ref_c_pad, mv, mbw: int, mbh: int, pad_c: int):
    """Normative 1/8-pel bilinear chroma interpolation (8.4.2.2.2) for all
    MBs at once; mv is the *luma* qpel mv.  Returns (N,8,8) int32."""
    n = mbw * mbh
    mby = jnp.arange(n, dtype=jnp.int32) // mbw
    mbx = jnp.arange(n, dtype=jnp.int32) % mbw
    ix, iy = mv[:, 0] >> 3, mv[:, 1] >> 3
    fx, fy = mv[:, 0] & 7, mv[:, 1] & 7
    y0 = pad_c + mby * 8 + iy
    x0 = pad_c + mbx * 8 + ix
    yi = y0[:, None, None] + jnp.arange(9, dtype=jnp.int32)[None, :, None]
    xi = x0[:, None, None] + jnp.arange(9, dtype=jnp.int32)[None, None, :]
    a = ref_c_pad[yi, xi].astype(jnp.int32)        # (N, 9, 9)
    p00, p01 = a[:, :8, :8], a[:, :8, 1:]
    p10, p11 = a[:, 1:, :8], a[:, 1:, 1:]
    fx = fx[:, None, None]
    fy = fy[:, None, None]
    return ((8 - fx) * (8 - fy) * p00 + fx * (8 - fy) * p01
            + (8 - fx) * fy * p10 + fx * fy * p11 + 32) >> 6
