"""Sliced-band device mesh (--threads N): the shard_map band path must
produce byte-identical bitstreams to the serial per-band loop, and the
stream must decode bit-exact (x264 sliced-threads analog,
doc/threads.txt)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from x264_tpu.api import Encoder  # noqa: E402
from x264_tpu.params import EncoderParams  # noqa: E402
from x264_tpu.utils.oracle import decode_annexb  # noqa: E402
from tests.test_e2e import synth_frames  # noqa: E402

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 devices (CPU mesh)")


def _encode(frames, **kw):
    enc = Encoder(EncoderParams(width=96, height=64, qp=28, slices=4,
                                deblock=True, keyint_max=0, **kw))
    recons = []
    stream = b""
    for f in frames:
        stream += enc.encode(f)
        recons.append((enc.last_recon.y.copy(), enc.last_recon.u.copy(),
                       enc.last_recon.v.copy()))
    return stream, recons


@needs_mesh
def test_mesh_equals_loop_and_decodes(rng):
    frames = synth_frames(96, 64, 4)
    s_loop, recs = _encode(frames, threads=1)
    s_mesh, recs_m = _encode(frames, threads=4)
    assert s_mesh == s_loop, "mesh bitstream != serial band loop"
    for a, b in zip(recs, recs_m):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    dec = decode_annexb(s_mesh, 96, 64)
    assert len(dec) == len(frames)
    for i, (d, r) in enumerate(zip(dec, recs_m)):
        np.testing.assert_array_equal(d[0], np.asarray(r[0])[:64, :96],
                                      err_msg=f"frame {i}")


@needs_mesh
def test_mesh_aq_qp_sharding(rng):
    frames = synth_frames(96, 64, 3)
    s_loop, _ = _encode(frames, threads=1, aq_mode=1)
    s_mesh, _ = _encode(frames, threads=4, aq_mode=1)
    assert s_mesh == s_loop
