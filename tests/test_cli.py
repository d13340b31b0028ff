"""CLI + y4m I/O + metrics (reference x264.c application-layer parity)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from x264_tpu.utils.oracle import decode_annexb  # noqa: E402
from x264_tpu.utils.y4m import RawReader, Y4MReader, write_y4m  # noqa: E402
from x264_tpu.utils.yuv import Frame420  # noqa: E402


def _clip(rng, w, h, n):
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        y = (120 + 70 * np.sin((xx + 3 * t) / 13.0)).astype(np.uint8)
        y += rng.integers(0, 5, (h, w)).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120 + t, np.uint8)
        v = np.full((h // 2, w // 2), 130 - t, np.uint8)
        out.append(Frame420(y, u, v))
    return out


def test_y4m_roundtrip(tmp_path, rng):
    frames = _clip(rng, 64, 48, 3)
    path = tmp_path / "c.y4m"
    write_y4m(path, frames, (30, 1))
    rd = Y4MReader(str(path))
    assert (rd.width, rd.height, rd.fps_num) == (64, 48, 30)
    back = list(rd)
    assert len(back) == 3
    for a, b in zip(back, frames):
        assert np.array_equal(a.y, b.y)
        assert np.array_equal(a.u, b.u)


def test_cli_encode_decode(tmp_path, rng):
    from x264_tpu.cli import main
    frames = _clip(rng, 96, 64, 6)
    src = tmp_path / "in.y4m"
    out = tmp_path / "out.264"
    recon = tmp_path / "recon.y4m"
    write_y4m(src, frames)
    rc = main(["--qp", "28", "--keyint", "4", "--quiet", "--psnr",
               "--dump-recon", str(recon), "-o", str(out), str(src)])
    assert rc == 0
    dec = decode_annexb(out.read_bytes(), 96, 64)
    assert len(dec) == 6
    rr = list(Y4MReader(str(recon)))
    for i in range(6):
        assert np.array_equal(rr[i].y, dec[i][0])


def test_raw_reader(tmp_path, rng):
    frames = _clip(rng, 48, 32, 2)
    raw = b"".join(f.y.tobytes() + f.u.tobytes() + f.v.tobytes()
                   for f in frames)
    p = tmp_path / "in.yuv"
    p.write_bytes(raw)
    rd = RawReader(str(p), 48, 32)
    back = list(rd)
    assert len(back) == 2
    assert np.array_equal(back[1].v, frames[1].v)
