"""Video filter chain, qpfile frame forcing, threaded input, per-frame
API overrides (reference filters/video/, x264.c parse_qpfile,
input/thread.c)."""

import numpy as np
import pytest

from x264_tpu.api import Encoder
from x264_tpu.params import TYPE_IDR, EncoderParams
from x264_tpu.utils.filters import (ThreadedReader, apply_chain,
                                    chain_out_size, parse_qpfile, parse_vf)
from x264_tpu.utils.yuv import Frame420

from test_e2e import encode_and_check, synth_frames


def test_crop_resize_select():
    chain = parse_vf("crop:2,4,6,8/resize:48x32/select_every:2,0")
    assert chain_out_size(chain, 64, 48) == (48, 32)
    frames = synth_frames(64, 48, 4)
    outs = [apply_chain(chain, f) for f in frames]
    kept = [o for o in outs if o is not None]
    assert len(kept) == 2
    assert kept[0].y.shape == (32, 48)
    assert kept[0].u.shape == (16, 24)


def test_resize_identity_and_interp():
    from x264_tpu.utils.filters import _resize_plane
    p = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert _resize_plane(p, 8, 8) is p
    up = _resize_plane(p, 16, 16)
    assert up.shape == (16, 16)
    assert abs(float(up.mean()) - float(p.mean())) < 1.0


def test_threaded_reader_order():
    frames = synth_frames(32, 32, 7)
    got = list(ThreadedReader(iter(frames), depth=2))
    assert len(got) == 7
    assert all(np.array_equal(a.y, b.y) for a, b in zip(got, frames))


def test_qpfile_parse(tmp_path):
    f = tmp_path / "q.txt"
    f.write_text("0 I 20\n3 P\n5 B 40\n# comment\n")
    q = parse_qpfile(str(f))
    assert q[0] == (TYPE_IDR, 20)
    assert q[3][1] is None
    assert q[5][1] == 40


def test_forced_idr_and_qp():
    frames = synth_frames(64, 48, 6)
    p = EncoderParams(width=64, height=48, qp=30, backend="device",
                      keyint_max=250)
    enc = Encoder(p)
    stream = b""
    recs = []
    for i, fr in enumerate(frames):
        kw = dict(frame_type=TYPE_IDR, qp=22) if i == 3 else {}
        stream += enc.encode(fr, **kw)
        recs.append(np.asarray(enc.last_recon.y))
    types = [s.frame_type for s in enc.stats]
    assert types[3] == "IDR"
    assert enc.stats[3].qp == 22
    from x264_tpu.utils.oracle import decode_annexb
    dec = decode_annexb(stream, 64, 48)
    for i in range(6):
        assert np.array_equal(dec[i][0], recs[i][:48, :64]), i


def test_forced_p_cuts_minigop():
    """A forced P inside a B queue closes the mini-GOP early."""
    frames = synth_frames(64, 48, 7)
    p = EncoderParams(width=64, height=48, qp=30, backend="device",
                      bframes=2)
    enc = Encoder(p)
    from x264_tpu.params import TYPE_P
    stream = b""
    for i, fr in enumerate(frames):
        kw = dict(frame_type=TYPE_P) if i == 2 else {}
        stream += enc.encode(fr, **kw)
    stream += enc.flush()
    # display frame 2 forced P: the first mini-GOP is I b P (1 B only)
    types = [s.frame_type for s in enc.stats]
    assert types[0] == "IDR"
    assert types.count("P") >= 2
    from x264_tpu.utils.oracle import decode_annexb
    assert len(decode_annexb(stream, 64, 48)) == 7


def test_cli_qpfile_and_vf(tmp_path):
    from x264_tpu.cli import main
    from x264_tpu.utils.y4m import write_y4m
    frames = synth_frames(64, 48, 4)
    src = tmp_path / "in.y4m"
    write_y4m(str(src), frames, (25, 1))
    qf = tmp_path / "q.txt"
    qf.write_text("2 I 24\n")
    out = tmp_path / "out.264"
    rc = main([str(src), "-o", str(out), "--qp", "30", "--quiet",
               "--qpfile", str(qf), "--vf", "crop:0,0,16,0",
               "--backend", "device"])
    assert rc == 0
    from x264_tpu.utils.oracle import decode_annexb
    dec = decode_annexb(out.read_bytes(), 48, 48)
    assert len(dec) == 4
