"""Container muxers (FLV / MP4) vs the libavformat demux oracle
(tools/avdemux): decoded container output must equal decoded raw
Annex-B output frame by frame (reference output/flv.c, output/mp4.c)."""

import os
import subprocess

import numpy as np
import pytest

from x264_tpu.utils.oracle import decode_annexb

from test_e2e import synth_frames

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def _avdemux():
    exe = os.path.join(_TOOLS, "avdemux")
    src = exe + ".c"
    if (not os.path.exists(exe)
            or os.path.getmtime(exe) < os.path.getmtime(src)):
        r = subprocess.run(["gcc", "-O2", src, "-o", exe,
                            "-lavformat", "-lavcodec", "-lavutil"],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("no libavformat")
    return exe


def demux_frames(path, W, H):
    r = subprocess.run([_avdemux(), path], capture_output=True)
    assert r.returncode == 0, r.stderr
    fsz = W * H * 3 // 2
    raw = r.stdout
    n = len(raw) // fsz
    out = []
    for i in range(n):
        b = raw[i * fsz:(i + 1) * fsz]
        y = np.frombuffer(b[:W * H], np.uint8).reshape(H, W)
        u = np.frombuffer(b[W * H:W * H * 5 // 4], np.uint8).reshape(
            H // 2, W // 2)
        v = np.frombuffer(b[W * H * 5 // 4:], np.uint8).reshape(
            H // 2, W // 2)
        out.append((y, u, v))
    return out


def _encode_cli(tmp_path, ext, extra=()):
    from x264_tpu.cli import main
    from x264_tpu.utils.y4m import write_y4m
    W, H, N = 64, 48, 6
    frames = synth_frames(W, H, N)
    src = tmp_path / "in.y4m"
    write_y4m(str(src), frames, (25, 1))
    out = tmp_path / f"out{ext}"
    rc = main([str(src), "-o", str(out), "--qp", "28", "--quiet",
               "--backend", "device", *extra])
    assert rc == 0
    raw = tmp_path / "ref.264"
    rc = main([str(src), "-o", str(raw), "--qp", "28", "--quiet",
               "--backend", "device", *extra])
    assert rc == 0
    return out, raw, W, H, N


@pytest.mark.parametrize("ext", [".flv", ".mp4", ".mkv"])
def test_mux_matches_raw(tmp_path, ext):
    out, raw, W, H, N = _encode_cli(tmp_path, ext)
    got = demux_frames(str(out), W, H)
    ref = decode_annexb(raw.read_bytes(), W, H)
    assert len(got) == len(ref) == N
    for i in range(N):
        for pl in range(3):
            assert np.array_equal(got[i][pl], ref[i][pl]), (i, pl)


@pytest.mark.parametrize("ext", [".flv", ".mp4", ".mkv"])
def test_mux_bframes(tmp_path, ext):
    """Reordered streams: pts/cts bookkeeping must keep display order."""
    out, raw, W, H, N = _encode_cli(tmp_path, ext,
                                    extra=("--bframes", "2", "--cabac"))
    got = demux_frames(str(out), W, H)
    ref = decode_annexb(raw.read_bytes(), W, H)
    assert len(got) == len(ref) == N
    for i in range(N):
        assert np.array_equal(got[i][0], ref[i][0]), i
