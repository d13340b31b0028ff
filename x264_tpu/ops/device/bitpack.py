"""Device (JAX) bit packing — append (value, length) token grids into
per-MB packed bitstrings without any scatter.

The final H.264 slice payload is a single bitstring, but its per-MB
segments are independent given the slot grids, so the device packs each
MB's tokens into a fixed word buffer via masked word-splat appends (a
lax.scan over token slots; every step touches only vector registers), and
the host bit-merges the N per-MB strings with one np.bincount pass
(utils in bitstream/slice_assemble.py).  This replaces x264's serial bs_t
bit writer (reference common/bitstream.h:86-126) for the whole slice body.

Words are big-endian bitstrings: bit 0 of the stream is the MSB of
word 0.  Token values must fit 16 bits (CAVLC codes and header exp-Golomb
codes all do — asserted by construction in the slot generators); lengths
up to 30.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_tokens(vals, lens, n_words: int):
    """vals/lens (N, S) int32 -> (words (N, n_words) uint32, nbits (N,)).

    Tokens are appended in slot order; slots with len 0 are no-ops.  If an
    MB overflows n_words*32 bits, its words are garbage — the caller MUST
    check nbits and fall back (the CAVLC-overflow re-encode pattern,
    reference encoder/encoder.c:2893)."""
    n, s = vals.shape
    widx = jnp.arange(n_words, dtype=jnp.uint32)[None, :]

    def step(carry, tok):
        words, bitpos = carry
        val, ln = tok
        val = val.astype(jnp.uint32)
        lnu = ln.astype(jnp.uint32)
        sh = (bitpos & 31).astype(jnp.uint32)
        w0 = (bitpos >> 5).astype(jnp.uint32)
        # bits [bitpos, bitpos+len) across words w0 and w0+1
        fits = sh + lnu <= 32
        # clip shift amounts so the not-taken where-branch never shifts >=32
        sh0 = jnp.where(fits, 32 - sh - lnu, 0).astype(jnp.uint32)
        shr = jnp.where(fits, 0, sh + lnu - 32).astype(jnp.uint32)
        sh1 = jnp.where(fits, 0, 64 - sh - lnu).astype(jnp.uint32)
        part0 = jnp.where(fits, val << sh0, val >> shr)
        part1 = jnp.where(fits, 0, val << sh1)
        live = ln > 0
        upd = (jnp.where((widx == w0[:, None]) & live[:, None], part0[:, None], 0)
               | jnp.where((widx == w0[:, None] + 1) & live[:, None] & ~fits[:, None],
                           part1[:, None], 0))
        words = words | upd
        bitpos = bitpos + jnp.where(live, ln, 0)
        return (words, bitpos), None

    words0 = jnp.zeros((n, n_words), jnp.uint32)
    bitpos0 = jnp.zeros((n,), jnp.int32)
    (words, nbits), _ = jax.lax.scan(
        step, (words0, bitpos0),
        (vals.T.astype(jnp.int32), lens.T.astype(jnp.int32)))
    return words, nbits
