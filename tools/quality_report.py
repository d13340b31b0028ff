#!/usr/bin/env python
"""BASELINE.json quality metric: 1080p CRF23 (preset-medium-equivalent)
vs `x264 --preset medium --crf 23`, PSNR compared at MATCHED bitrate.

Runs the bench clip (bench.py's generator) through:
  1. ours, CRF 23 (medium-equivalent feature set), recording
     (kbit/frame, mean Y-PSNR);
  2. x264 (tools/avenc build or /tmp/x264ref) at --crf 23;
  3. ours at a small QP ladder, to linearly interpolate our PSNR at
     x264's achieved bitrate (the matched-bitrate delta).

Usage: python tools/quality_report.py [WxH] [nframes]
Writes a markdown table to stdout (commit as doc/QUALITY_r5.md).
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    W, H = (int(v) for v in wh.split("x"))
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 48

    sys.path.insert(0, os.path.join(REPO))
    import bench as bm
    bm.W, bm.H, bm.N_FRAMES = W, H, N
    frames = bm.make_clip()

    from x264_tpu.api import Encoder
    from x264_tpu.params import RC_CRF, EncoderParams
    from x264_tpu.utils.oracle import decode_annexb
    from x264_tpu.utils.yuv import Frame420

    def psnr_y(stream):
        dec = decode_annexb(stream, W, H)
        return float(np.mean([bm.psnr(dec[i][0], frames[i][0])
                              for i in range(len(dec))]))

    def ours(**rc):
        p = EncoderParams(width=W, height=H, me_range=16,
                          backend="device", deblock=True, keyint_max=250,
                          bframes=2, full_recon=False, cabac=True,
                          transform_8x8=True, weightp=1, trellis=1,
                          i4x4=True, p8x8=True, scenecut_threshold=0,
                          **rc)
        enc = Encoder(p)
        enc.warm(3600, full=True)
        s = b"".join(enc.encode(Frame420(*f)) for f in frames)
        s += enc.flush()
        return len(s) * 8 / N / 1000.0, psnr_y(s)

    rows = []
    kb_crf, py_crf = ours(rc_method=RC_CRF, crf=23.0)
    rows.append(("ours CRF23", kb_crf, py_crf))
    for qp in (24, 26, 28):
        kb, py = ours(qp=qp)
        rows.append((f"ours CQP{qp}", kb, py))

    # x264 --crf 23 via the avenc harness (crf passed as negative qp
    # convention not supported there; call the source-built binary)
    import tempfile
    y4m = tempfile.NamedTemporaryFile(suffix=".y4m", delete=False)
    y4m.write(f"YUV4MPEG2 W{W} H{H} F25:1 Ip A1:1 C420mpeg2\n".encode())
    for (y, u, v) in frames:
        y4m.write(b"FRAME\n")
        y4m.write(y.tobytes())
        y4m.write(u.tobytes())
        y4m.write(v.tobytes())
    y4m.close()
    out264 = y4m.name + ".264"
    x264bin = "/tmp/x264ref/x264"
    if not os.path.exists(x264bin):
        print("(reference x264 binary missing; build per "
              ".claude/skills/verify)")
        return
    subprocess.run([x264bin, "--preset", "medium", "--crf", "23",
                    "-o", out264, y4m.name], capture_output=True)
    with open(out264, "rb") as f:
        xs = f.read()
    kb_x, py_x = len(xs) * 8 / N / 1000.0, psnr_y(xs)
    rows.append(("x264 medium CRF23", kb_x, py_x))

    print(f"# CRF23 quality report — {W}x{H}, {N} frames (bench clip)\n")
    print("| encoder | kbit/frame | mean Y-PSNR dB |")
    print("|---|---|---|")
    for name, kb, py in rows:
        print(f"| {name} | {kb:.1f} | {py:.2f} |")

    # matched-bitrate interpolation from the CQP ladder
    lad = sorted((kb, py) for (n, kb, py) in rows if n.startswith("ours CQP"))
    kbs = [k for k, _ in lad]
    pys = [p for _, p in lad]
    ours_at_x = float(np.interp(kb_x, kbs, pys))
    print(f"\nours @ x264's {kb_x:.1f} kbit/frame (interp): "
          f"{ours_at_x:.2f} dB -> delta {ours_at_x - py_x:+.2f} dB "
          f"vs x264 medium CRF23")


if __name__ == "__main__":
    main()
