#!/usr/bin/env python
"""Driver benchmark: 1080p frames/s/chip vs real x264 on this host.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

- ours: x264_tpu device backend (single chip), CQP26, ESA ME range 16,
  qpel subme2, 2 B-frames, CABAC, deblock on — steady-state fps after
  compile warmup.
- baseline: the system libx264 (X264_BUILD 164 — the same build as the
  reference repo, distro-compiled WITH asm) driven via tools/avenc,
  --preset medium --qp 26, all 4 host cores.
Diagnostics (PSNR / bitrate for both) go to stderr.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
W, H, FPS = 1920, 1080, 25
N_FRAMES = 48      # 6 warm + 42 measured: fps noise < ±5% run-to-run
QP = 26


def make_clip():
    """Panning detailed texture + slow luminance drift: temporally
    predictable (like real video), spatially rich (exercises residual +
    entropy), deterministic."""
    rng = np.random.default_rng(20260816)
    pad = 4 * N_FRAMES
    tex = rng.integers(-24, 25, (H + pad, W + pad)).astype(np.int16)
    tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, 1, 1)
           + np.roll(tex, (1, 1), (0, 1))) // 4          # soften a touch
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for t in range(N_FRAMES):
        dx, dy = 3 * t, 2 * t
        base = (128 + 60 * np.sin((xx + dx) / 41.0)
                * np.cos((yy + dy) / 59.0))
        y = np.clip(base + tex[dy:dy + H, dx:dx + W] + t, 0, 255
                    ).astype(np.uint8)
        u = (128 + 32 * np.sin((xx[::2, ::2] + dx) / 61.0)).astype(np.uint8)
        v = (128 + 32 * np.cos((yy[::2, ::2] + dy) / 59.0)).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def psnr(a, b):
    d = a.astype(np.int64) - b.astype(np.int64)
    mse = float((d * d).mean())
    return 99.0 if mse == 0 else 10 * np.log10(255.0 * 255.0 / mse)


def bench_ours(frames):
    from x264_tpu.api import Encoder
    from x264_tpu.params import EncoderParams
    from x264_tpu.utils.yuv import Frame420

    # scenecut off: CQP fixed-GOP measurement (the pre-encode lowres cut
    # adds per-frame blocking device pulls that belong to the lookahead
    # path, not the steady-state core this metric tracks)
    p = EncoderParams(width=W, height=H, qp=QP, me_range=16,
                      backend="device", deblock=True, keyint_max=250,
                      bframes=2, full_recon=False, cabac=True,
                      transform_8x8=True, weightp=1, trellis=1,
                      i4x4=True, p8x8=True,
                      scenecut_threshold=0)
    enc = Encoder(p)
    stream = b""
    warm = 6
    # deterministic warm-up: warm() returns True only once every
    # entropy rung of every frame core is compiled (persistent compile
    # cache makes this fast after the first-ever run on a machine);
    # steady-state throughput is the metric, mid-stream XLA compiles
    # are not.  Bounded so a wedged remote compile can't hang the bench.
    # generous bound: on a cold AOT cache (first run after a source
    # change) the full warm-up re-exports every frame core (~minutes
    # per program through the remote-compile tunnel); warm runs are
    # seconds.  Steady-state throughput is the metric either way.
    ok = enc.warm(3600, full=True)
    print(f"compile warm-up complete: {ok}", file=sys.stderr)
    for i in range(warm):
        stream += enc.encode(Frame420(*frames[i]))
    t0 = time.perf_counter()
    for i in range(warm, N_FRAMES):
        stream += enc.encode(Frame420(*frames[i]))
    stream += enc.flush()
    dt = time.perf_counter() - t0
    fps = (N_FRAMES - warm) / dt
    # quality: decode and average display-order Y-PSNR vs source
    try:
        from x264_tpu.utils.oracle import decode_annexb
        dec = decode_annexb(stream, W, H)
        py = float(np.mean([psnr(dec[i][0], frames[i][0])
                            for i in range(len(dec))]))
    except Exception:
        py = float("nan")
    return fps, len(stream), py, stream


def bench_x264(frames):
    avenc = os.path.join(REPO, "tools", "avenc")
    if not os.path.exists(avenc):
        r = subprocess.run(["gcc", "-O2", avenc + ".c", "-o", avenc,
                            "-lavcodec", "-lavutil"], capture_output=True)
        if r.returncode != 0:
            return None
    raw = b"".join(y.tobytes() + u.tobytes() + v.tobytes()
                   for (y, u, v) in frames)
    # best of 3: the first run on an idle VM measures CPU ramp-up, not
    # x264 (observed 4.5 fps cold vs ~44 fps warm steady-state — the
    # honest baseline is the warm number)
    best = None
    for _ in range(3):
        r = subprocess.run([avenc, str(W), str(H), str(FPS),
                            str(N_FRAMES), "medium", str(QP)],
                           input=raw, capture_output=True)
        if r.returncode != 0:
            return None
        stats = dict(kv.split("=") for kv in r.stderr.decode().split()
                     if "=" in kv)
        fps = N_FRAMES / float(stats["encode_s"])
        if best is None or fps > best[0]:
            best = (fps, int(stats["bytes"]), r.stdout)
    return best


def main():
    frames = make_clip()
    # baseline first: once jax initializes it holds host threads, which
    # would unfairly slow the CPU x264 run
    base = bench_x264(frames)
    ours_fps, ours_bytes, ours_psnr, _ = bench_ours(frames)
    if base is not None:
        x264_fps, x264_bytes, x264_stream = base
        try:
            sys.path.insert(0, REPO)
            from x264_tpu.utils.oracle import decode_annexb
            dec = decode_annexb(x264_stream, W, H)
            x264_psnr = float(np.mean([psnr(dec[i][0], frames[i][0])
                                       for i in range(len(dec))]))
        except Exception:
            x264_psnr = float("nan")
        vs = ours_fps / x264_fps
        print(f"ours: {ours_fps:.2f} fps, {ours_bytes*8/N_FRAMES/1000:.0f} "
              f"kbit/frame, mean Y-PSNR {ours_psnr:.2f} dB | "
              f"x264 medium qp{QP} ({os.cpu_count()} cores): "
              f"{x264_fps:.2f} fps, {x264_bytes*8/N_FRAMES/1000:.0f} "
              f"kbit/frame, Y-PSNR {x264_psnr:.2f} dB", file=sys.stderr)
    else:
        vs = None
        print("x264 baseline unavailable", file=sys.stderr)
    print(json.dumps({
        "metric": "1080p CQP26 encode fps, 1 TPU chip (vs x264 medium qp26"
                  " on host CPU)",
        "value": round(ours_fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
