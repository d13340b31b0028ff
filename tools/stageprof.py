#!/usr/bin/env python
"""Per-stage wall-time profile of the bench config.

Wraps the Encoder's submit/finalize stages (and the native CABAC call)
with timers, encodes a short 1080p clip, and prints a per-stage budget.
Run:  python tools/stageprof.py [n_frames]
"""
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_clip(n, w=1920, h=1080):
    rng = np.random.default_rng(20260816)
    pad = 4 * n
    tex = rng.integers(-24, 25, (h + pad, w + pad)).astype(np.int16)
    tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, 1, 1)
           + np.roll(tex, (1, 1), (0, 1))) // 4
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        dx, dy = 3 * t, 2 * t
        base = (128 + 60 * np.sin((xx + dx) / 41.0) * np.cos((yy + dy) / 59.0))
        y = np.clip(base + tex[dy:dy + h, dx:dx + w] + t, 0, 255).astype(np.uint8)
        u = (128 + 32 * np.sin((xx[::2, ::2] + dx) / 61.0)).astype(np.uint8)
        v = (128 + 32 * np.cos((yy[::2, ::2] + dy) / 59.0)).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    from x264_tpu.api import Encoder
    from x264_tpu.params import EncoderParams
    from x264_tpu.utils.yuv import Frame420

    p = EncoderParams(width=1920, height=1080, qp=26, me_range=16,
                      backend="device", deblock=True, keyint_max=250,
                      bframes=2, full_recon=False, cabac=True,
                      transform_8x8=True, weightp=1, trellis=1,
                      i4x4=True, p8x8=True, scenecut_threshold=0)
    enc = Encoder(p)

    stats = defaultdict(float)
    counts = defaultdict(int)

    def wrap(name, fn):
        def inner(*a, **kw):
            t0 = time.perf_counter()
            r = fn(*a, **kw)
            dt = time.perf_counter() - t0
            stats[name] += dt
            counts[name] += 1
            return r
        return inner

    for m in ["_submit_anchor", "_submit_b", "_finalize_device",
              "_finalize_b", "_finalize_cabac", "_pad", "_run_core",
              "_deblock_device", "_lowres_scenecut"]:
        if hasattr(enc, m):
            setattr(enc, m, wrap(m, getattr(enc, m)))

    # also time the native cabac entry
    try:
        import x264_tpu.native as native_pkg  # noqa
    except Exception:
        pass

    frames = [Frame420(*f) for f in make_clip(n)]
    ok = enc.warm(1500)
    print("warm:", ok, file=sys.stderr)
    warm = 6
    stream = b""
    for i in range(warm):
        stream += enc.encode(frames[i])
    for k in list(stats):
        stats[k] = 0.0
        counts[k] = 0
    t0 = time.perf_counter()
    for i in range(warm, n):
        stream += enc.encode(frames[i])
    stream += enc.flush()
    dt = time.perf_counter() - t0
    meas = n - warm
    print(f"\ntotal: {dt:.3f}s for {meas} frames = {dt/meas*1000:.1f} ms/frame"
          f"  ({meas/dt:.2f} fps)")
    tot = sum(stats.values())
    for k in sorted(stats, key=lambda k: -stats[k]):
        print(f"  {k:24s} {stats[k]*1000:8.1f} ms total  "
              f"{stats[k]/max(counts[k],1)*1000:7.1f} ms/call  x{counts[k]}")
    print(f"  {'(sum of stages)':24s} {tot*1000:8.1f} ms")


if __name__ == "__main__":
    main()
