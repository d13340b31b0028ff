#!/usr/bin/env python
"""Sliced-parallelism scaling report — the doc/threads.txt analog.

Produces two tables:
1. Slicing quality tax (doc/threads.txt:27-37): bitrate/PSNR at
   1/2/4/8 slices on a fixed clip — slices break prediction context
   exactly like x264's sliced threads, so the tax is the comparable
   number.
2. Per-band device time (doc/threads.txt:45-95 shape): steady-state
   time of the band core at full-frame vs 1/2, 1/4, 1/8-height bands on
   ONE chip — the per-chip compute of an N-chip band mesh (collective
   overhead excluded; the mesh path's collectives are a band-boundary
   halo only).

Usage:
  python tools/scaling_report.py tax      (CPU ok)
  python tools/scaling_report.py bands    (wants the TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("X264_TPU_FORCE_CPU"):
    # the axon plugin overrides JAX_PLATFORMS; force the CPU backend
    # explicitly for host-side runs of this report
    import jax
    jax.config.update("jax_platforms", "cpu")


def make_clip(n, w, h):
    rng = np.random.default_rng(20260816)
    pad = 4 * n
    tex = rng.integers(-24, 25, (h + pad, w + pad)).astype(np.int16)
    tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, 1, 1)
           + np.roll(tex, (1, 1), (0, 1))) // 4
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        dx, dy = 3 * t, 2 * t
        base = (128 + 60 * np.sin((xx + dx) / 41.0)
                * np.cos((yy + dy) / 59.0))
        y = np.clip(base + tex[dy:dy + h, dx:dx + w] + t, 0, 255
                    ).astype(np.uint8)
        u = (128 + 32 * np.sin((xx[::2, ::2] + dx) / 61.0)).astype(np.uint8)
        v = (128 + 32 * np.cos((yy[::2, ::2] + dy) / 59.0)).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def psnr(a, b):
    d = a.astype(np.int64) - b.astype(np.int64)
    mse = float((d * d).mean())
    return 99.0 if mse == 0 else 10 * np.log10(255.0 * 255.0 / mse)


def tax():
    from x264_tpu.api import Encoder
    from x264_tpu.params import EncoderParams
    from x264_tpu.utils.oracle import decode_annexb
    from x264_tpu.utils.yuv import Frame420
    W, H, N = 640, 384, 16
    frames = make_clip(N, W, H)
    print("| slices | kbit/frame | Y-PSNR dB | bitrate tax |")
    print("|---|---|---|---|")
    base_bits = None
    for nsl in (1, 2, 4, 8):
        p = EncoderParams(width=W, height=H, qp=26, me_range=16,
                          backend="device", deblock=True, keyint_max=250,
                          cabac=False, slices=nsl, scenecut_threshold=0)
        enc = Encoder(p)
        s = b"".join(enc.encode(Frame420(*f)) for f in frames)
        s += enc.flush()
        dec = decode_annexb(s, W, H)
        py = float(np.mean([psnr(dec[i][0], frames[i][0])
                            for i in range(len(dec))]))
        kb = len(s) * 8 / N / 1000.0
        if base_bits is None:
            base_bits = kb
        print(f"| {nsl} | {kb:.1f} | {py:.2f} "
              f"| {100.0 * (kb / base_bits - 1.0):+.1f}% |", flush=True)


def bands():
    import jax
    import jax.numpy as jnp

    from x264_tpu.models.inter_device import p_band_core
    from x264_tpu.models.inter_frame import PAD, sad_lambda
    frames = make_clip(2, 1920, 1088)
    y0 = jnp.asarray(frames[0][0])
    y1 = jnp.asarray(frames[1][0])
    u1 = jnp.asarray(frames[1][1])
    ry_pad = jnp.pad(y0, PAD, mode="edge")
    ru_pad = jnp.pad(jnp.asarray(frames[0][1]), PAD // 2, mode="edge")
    lam = np.int32(sad_lambda(26))
    mbw = 120
    print("| bands | MB rows/band | band core ms | ideal speedup |")
    print("|---|---|---|---|")
    t1 = None
    for nb, bh in ((1, 68), (2, 34), (4, 17), (8, 9)):
        yb = y1[:16 * bh]
        ub = u1[:8 * bh]
        ryb = ry_pad[:16 * bh + 2 * PAD]
        rub = ru_pad[:8 * bh + PAD]
        qp = np.full(mbw * bh, 26, np.int32)
        out = p_band_core(yb, ub, ub, ryb, rub, rub, qp, lam,
                          mbw=mbw, mbh=bh, me_range=16, cqp_off=0,
                          subpel=2, n_words=64)
        np.asarray(out["host_blob"])
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = p_band_core(yb, ub, ub, ryb, rub, rub, qp, lam,
                              mbw=mbw, mbh=bh, me_range=16, cqp_off=0,
                              subpel=2, n_words=64)
            np.asarray(out["host_blob"])
            ts.append(time.time() - t0)
        ms = min(ts) * 1000
        if t1 is None:
            t1 = ms
        print(f"| {nb} | {bh} | {ms:.0f} | {t1 / ms:.2f}x |", flush=True)


if __name__ == "__main__":
    {"tax": tax, "bands": bands}[sys.argv[1]]()
