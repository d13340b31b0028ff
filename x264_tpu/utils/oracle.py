"""Decode oracle: conformance checking against a real H.264 decoder
(libavcodec via the native tools/avdec shim) — the role the JM reference
decoder plays in the reference's regression test (doc/regression_test.txt):
our reconstruction must equal what a conforming decoder outputs, bit-exact.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np

_TOOLS_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "tools")
_AVDEC = os.path.abspath(os.path.join(_TOOLS_DIR, "avdec"))


def _ensure_avdec() -> str:
    if not os.path.exists(_AVDEC):
        import fcntl
        src = os.path.join(os.path.dirname(_AVDEC), "avdec.c")
        # flock: parallel test workers must not race the build
        with open(src) as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            if not os.path.exists(_AVDEC):
                tmp = _AVDEC + ".tmp"
                subprocess.run(
                    ["gcc", "-O2", "-o", tmp, src,
                     "-lavcodec", "-lavutil"], check=True)
                os.replace(tmp, _AVDEC)
    return _AVDEC


def decode_annexb(stream: bytes, width: int, height: int):
    """Decode an Annex-B elementary stream with libavcodec.
    Returns list of (y, u, v) uint8 planes at the decoder's coded size
    cropped to width x height."""
    avdec = _ensure_avdec()
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "in.264")
        outp = os.path.join(td, "out.yuv")
        with open(inp, "wb") as f:
            f.write(stream)
        r = subprocess.run([avdec, inp, outp], capture_output=True)
        if r.returncode != 0:
            raise RuntimeError(f"avdec failed: {r.stderr.decode()}")
        data = np.fromfile(outp, dtype=np.uint8)

    fsize = width * height * 3 // 2
    assert len(data) % fsize == 0, f"decoded size {len(data)} not multiple of {fsize}"
    nframes = len(data) // fsize
    out = []
    for i in range(nframes):
        buf = data[i * fsize:(i + 1) * fsize]
        y = buf[:width * height].reshape(height, width)
        u = buf[width * height: width * height * 5 // 4].reshape(height // 2, width // 2)
        v = buf[width * height * 5 // 4:].reshape(height // 2, width // 2)
        out.append((y, u, v))
    return out
