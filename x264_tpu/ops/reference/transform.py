"""Bit-exact NumPy reference transforms (H.264 8.5; capability parity with
reference common/dct.c).  All functions are batched over leading dims: inputs
are (..., 4, 4) (or (..., 2, 2) for chroma DC) int32/int64 arrays.

Encoder-side forward transforms follow the standard JM/x264 integer design;
decoder-side inverse transforms are normative (these must match what any
conforming decoder computes, which the cv2/ffmpeg conformance gate checks).
"""

from __future__ import annotations

import numpy as np

# forward core transform matrix (8.5.12 companion)
_CF = np.array([
    [1, 1, 1, 1],
    [2, 1, -1, -2],
    [1, -1, -1, 1],
    [1, -2, 2, -1],
], dtype=np.int64)

# Hadamard for luma DC (8.5.10) and its own inverse (up to scale 4)
_H4 = np.array([
    [1, 1, 1, 1],
    [1, 1, -1, -1],
    [1, -1, -1, 1],
    [1, -1, 1, -1],
], dtype=np.int64)

_H2 = np.array([[1, 1], [1, -1]], dtype=np.int64)


def dct4x4(residual: np.ndarray) -> np.ndarray:
    """Forward 4x4 core transform: Cf . X . Cf^T (batched)."""
    x = residual.astype(np.int64)
    return np.einsum("ij,...jk,lk->...il", _CF, x, _CF)


def idct4x4(d: np.ndarray) -> np.ndarray:
    """Normative inverse 4x4 transform (8.5.12.2) on dequantized coefs.
    Returns residual (..., 4, 4) after the final (x + 32) >> 6."""
    d = d.astype(np.int64)
    # horizontal (rows of each 4x4: operate on last axis)
    e0 = d[..., :, 0] + d[..., :, 2]
    e1 = d[..., :, 0] - d[..., :, 2]
    e2 = (d[..., :, 1] >> 1) - d[..., :, 3]
    e3 = d[..., :, 1] + (d[..., :, 3] >> 1)
    f = np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    # vertical (second-to-last axis)
    g0 = f[..., 0, :] + f[..., 2, :]
    g1 = f[..., 0, :] - f[..., 2, :]
    g2 = (f[..., 1, :] >> 1) - f[..., 3, :]
    g3 = f[..., 1, :] + (f[..., 3, :] >> 1)
    h = np.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=-2)
    return (h + 32) >> 6


def hadamard4x4_fwd(dc: np.ndarray) -> np.ndarray:
    """Encoder luma-DC Hadamard: (H . DC . H^T) >> 1 (JM/x264 convention,
    paired with the qbits+1 DC quantizer)."""
    y = np.einsum("ij,...jk,lk->...il", _H4, dc.astype(np.int64), _H4)
    return (y + 1) >> 1


def hadamard4x4_inv(c: np.ndarray) -> np.ndarray:
    """Normative inverse luma-DC transform f = H . c . H^T (8.5.10)."""
    return np.einsum("ij,...jk,lk->...il", _H4, c.astype(np.int64), _H4)


def hadamard2x2(dc: np.ndarray) -> np.ndarray:
    """Chroma DC 2x2 transform — self-inverse up to scale (8.5.11)."""
    return np.einsum("ij,...jk,lk->...il", _H2, dc.astype(np.int64), _H2)


# -----------------------------------------------------------------------------
# Block (de)interleave helpers: frame planes <-> (..., nBlocks, 4, 4)
# -----------------------------------------------------------------------------

def plane_to_blocks4(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (H//4 * W//4, 4, 4) in raster block order."""
    h, w = plane.shape
    return (plane.reshape(h // 4, 4, w // 4, 4)
                 .transpose(0, 2, 1, 3)
                 .reshape(-1, 4, 4))


def blocks4_to_plane(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (blocks.reshape(h // 4, w // 4, 4, 4)
                  .transpose(0, 2, 1, 3)
                  .reshape(h, w))


def mb_luma_to_blocks(mb: np.ndarray) -> np.ndarray:
    """(..., 16, 16) MB -> (..., 16, 4, 4) 4x4 blocks in *raster* order
    (block index b = 4*(y4) + x4)."""
    sh = mb.shape[:-2]
    return (mb.reshape(*sh, 4, 4, 4, 4)
              .transpose(*range(len(sh)), -4, -2, -3, -1)
              .reshape(*sh, 16, 4, 4))


def blocks_to_mb_luma(blocks: np.ndarray) -> np.ndarray:
    """Inverse of mb_luma_to_blocks."""
    sh = blocks.shape[:-3]
    return (blocks.reshape(*sh, 4, 4, 4, 4)
                  .transpose(*range(len(sh)), -4, -2, -3, -1)
                  .reshape(*sh, 16, 16))


# H.264 coded order of the 16 luma 4x4 blocks within a MB (zigzag of 8x8
# quadrants, each quadrant in 2x2 sub-raster): raster index of coded block k.
LUMA4x4_CODED_ORDER = np.array(
    [0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15], dtype=np.int32)
# inverse permutation: coded position of raster block r
LUMA4x4_RASTER_TO_CODED = np.argsort(LUMA4x4_CODED_ORDER).astype(np.int32)
