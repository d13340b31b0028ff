"""Bit-level foundation tests: writer/reader roundtrip, exp-Golomb, NAL
escape, CAVLC residual block roundtrip (the checkasm-style oracle for the
entropy layer)."""

import numpy as np
import pytest

from x264_tpu.bitstream.bits import BitReader, BitWriter
from x264_tpu.bitstream.cavlc import read_residual_block, write_residual_block
from x264_tpu.bitstream.nal import escape_rbsp, split_annexb, unescape_rbsp, make_nal


def test_bitwriter_roundtrip(rng):
    bw = BitWriter()
    vals = []
    for _ in range(1000):
        n = int(rng.integers(1, 33))
        v = int(rng.integers(0, 1 << n))
        bw.put(n, v)
        vals.append((n, v))
    data = bw.to_rbsp()
    br = BitReader(data)
    for n, v in vals:
        assert br.u(n) == v
    assert br.u(1) == 1  # stop bit


def test_expgolomb_roundtrip(rng):
    bw = BitWriter()
    ues = [int(rng.integers(0, 100000)) for _ in range(200)] + [0, 1, 2, 255]
    ses = [int(rng.integers(-5000, 5000)) for _ in range(200)] + [0, 1, -1, 2048]
    for v in ues:
        bw.ue(v)
    for v in ses:
        bw.se(v)
    br = BitReader(bw.to_rbsp())
    for v in ues:
        assert br.ue() == v
    for v in ses:
        assert br.se() == v


def test_ue_many_matches_scalar(rng):
    v = rng.integers(0, 1000, size=500)
    a, b = BitWriter(), BitWriter()
    a.ue_many(v)
    for x in v:
        b.ue(int(x))
    assert a.to_rbsp() == b.to_rbsp()


@pytest.mark.parametrize("payload,expect", [
    (b"\x00\x00\x00", b"\x00\x00\x03\x00"),
    (b"\x00\x00\x01", b"\x00\x00\x03\x01"),
    (b"\x00\x00\x02", b"\x00\x00\x03\x02"),
    (b"\x00\x00\x03", b"\x00\x00\x03\x03"),
    (b"\x00\x00\x04", b"\x00\x00\x04"),
    (b"\x00\x00\x00\x00\x00", b"\x00\x00\x03\x00\x00\x03\x00"),
    (b"ab\x00\x00\x01cd", b"ab\x00\x00\x03\x01cd"),
])
def test_escape(payload, expect):
    assert escape_rbsp(payload) == expect
    assert unescape_rbsp(expect) == payload


def test_escape_random_roundtrip(rng):
    for _ in range(50):
        raw = rng.integers(0, 4, size=200).astype(np.uint8).tobytes()
        esc = escape_rbsp(raw)
        # no forbidden 00 00 00/01/02 pattern survives (00 00 03 is the marker)
        for i in range(2, len(esc)):
            assert not (esc[i - 2] == 0 and esc[i - 1] == 0 and esc[i] <= 2)
        assert unescape_rbsp(esc) == raw


def test_split_annexb():
    stream = make_nal(7, 3, b"\x11\x22") + make_nal(8, 3, b"\x33", long_startcode=False)
    nals = split_annexb(stream)
    assert len(nals) == 2
    assert nals[0][0] == (3 << 5) | 7
    assert nals[1][0] == (3 << 5) | 8


def _random_block(rng, max_coeff, density, mag):
    c = np.zeros(max_coeff, dtype=np.int64)
    n = int(rng.integers(0, max(1, int(max_coeff * density)) + 1))
    pos = rng.choice(max_coeff, size=n, replace=False)
    c[pos] = rng.integers(1, mag + 1, size=n) * rng.choice([-1, 1], size=n)
    return c


@pytest.mark.parametrize("nC", [-1, 0, 1, 2, 3, 4, 7, 8, 16])
@pytest.mark.parametrize("density,mag", [(0.2, 1), (0.5, 3), (1.0, 9), (1.0, 600), (0.3, 3000)])
def test_cavlc_residual_roundtrip(rng, nC, density, mag):
    max_coeff = 4 if nC == -1 else 16
    for _ in range(60):
        c = _random_block(rng, max_coeff, density, mag)
        bw = BitWriter()
        total = write_residual_block(bw, c, nC, max_coeff)
        assert total == np.count_nonzero(c)
        bw.put(1, 1)  # sentinel
        br = BitReader(bw.to_rbsp())
        out = read_residual_block(br, nC, max_coeff)
        np.testing.assert_array_equal(out, c)
        assert br.u(1) == 1  # sentinel confirms exact consumption


def test_cavlc_15coeff_blocks(rng):
    """AC blocks (maxNumCoeff 15) exercise the total<max_coeff boundary."""
    for nC in (0, 2, 5):
        for _ in range(40):
            c = _random_block(rng, 15, 0.7, 20)
            bw = BitWriter()
            write_residual_block(bw, c, nC, 15)
            bw.put(1, 1)
            br = BitReader(bw.to_rbsp())
            out = read_residual_block(br, nC, 15)
            np.testing.assert_array_equal(out, c)
            assert br.u(1) == 1


def test_sei_version_decodes(rng):
    """SEI version header (user_data_unregistered) must not disturb
    decoding and must carry the encoder identification."""
    import pytest
    pytest.importorskip("jax")
    from x264_tpu.api import Encoder
    from x264_tpu.params import EncoderParams
    from x264_tpu.utils.oracle import decode_annexb
    from x264_tpu.utils.yuv import Frame420

    w, h = 64, 48
    frames = [Frame420(rng.integers(0, 256, (h, w)).astype(np.uint8),
                       np.full((h // 2, w // 2), 128, np.uint8),
                       np.full((h // 2, w // 2), 128, np.uint8))
              for _ in range(3)]
    enc = Encoder(EncoderParams(width=w, height=h, qp=28,
                                backend="device", deblock=True))
    stream = b"".join(enc.encode(f) for f in frames) + enc.flush()
    assert b"x264_tpu" in stream
    dec = decode_annexb(stream, w, h)
    assert len(dec) == 3
    r = enc.last_recon
    assert np.array_equal(dec[2][0], np.asarray(r.y)[:h, :w])
