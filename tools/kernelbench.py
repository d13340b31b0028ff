#!/usr/bin/env python
"""Per-kernel device microbenchmarks — the `checkasm --bench` analog
(reference tools/checkasm.c:3020): times every hot kernel tier at 1080p
shapes on the current JAX backend and prints a ms/frame table, so perf
regressions are caught by numbers.

Usage: python tools/kernelbench.py [WxH]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402


def timeit(name, fn, n=4):
    """Throughput timing: issue n async dispatches, block on the last —
    a single blocked dispatch through the remote-TPU tunnel measures
    ~1 s of round-trip latency, not the kernel (the encoder pipeline
    runs async-chained, so throughput is the honest number)."""
    out = fn()
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        ts.append((time.perf_counter() - t0) / n)
    print(f"{name:34s} {min(ts) * 1000:9.2f} ms", flush=True)
    return min(ts)


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "1920x1088"
    W, H = (int(v) for v in wh.split("x"))
    mbw, mbh = W // 16, H // 16
    n = mbw * mbh
    rng = np.random.default_rng(0)
    y = jax.device_put(rng.integers(0, 255, (H, W)).astype(np.uint8))
    ref = jax.device_put(rng.integers(0, 255, (H, W)).astype(np.uint8))
    print(f"kernelbench {W}x{H} on {jax.default_backend()} "
          f"({len(jax.devices())} device(s))")

    from x264_tpu.models.inter_frame import PAD, me_lambda
    from x264_tpu.ops.device import transform as T
    from x264_tpu.ops.device.me import (full_search_16x16, subpel_refine)
    from x264_tpu.ops.device.mc import hpel_planes, mc_luma_qpel

    lam = np.int32(me_lambda(26))
    ref_pad = jnp.pad(ref, PAD, mode="edge")
    # each kernel is benchmarked as ITS OWN jitted program (explicit
    # args — closures would constant-fold); in the product they live
    # inside the frame-core jits
    import functools
    jfull = functools.partial(jax.jit,
                              static_argnames=("me_range", "mbw", "mbh")
                              )(full_search_16x16)
    timeit("fullpel ME (esa r16)",
           lambda: jfull(y, ref_pad, lam, me_range=16, mbw=mbw, mbh=mbh))
    jhpel = jax.jit(hpel_planes)
    planes = jhpel(ref_pad)
    planes.block_until_ready()
    timeit("hpel planes (6-tap)", lambda: jhpel(ref_pad))
    mv, _ = jfull(y, ref_pad, lam, me_range=16, mbw=mbw, mbh=mbh)
    src_mbs = T.plane_to_mbs(y.astype(jnp.int32), mbh, mbw, 16)
    jsub = functools.partial(
        jax.jit, static_argnames=("me_range", "steps", "mbw", "mbh",
                                  "return_pred"))(subpel_refine)
    timeit("subpel refine (±3 qpel SATD)",
           lambda: jsub(src_mbs, planes, mv, lam, me_range=16, steps=2,
                        mbw=mbw, mbh=mbh, return_pred=True))
    jmc = functools.partial(jax.jit,
                            static_argnames=("mbw", "mbh", "pad")
                            )(mc_luma_qpel)
    timeit("mc_luma_qpel", lambda: jmc(planes, mv, mbw=mbw, mbh=mbh,
                                       pad=PAD))

    res = jax.device_put(rng.integers(-64, 64, (n, 16, 4, 4))
                         .astype(np.int32))
    qp = np.int32(26)
    jd4 = jax.jit(lambda r, q: T.idct4x4(T.dequant4x4(
        T.quant4x4(T.dct4x4(r), q, False), q)))
    timeit("dct4x4 + quant + dequant + idct", lambda: jd4(res, qp))
    res8 = jax.device_put(rng.integers(-64, 64, (n, 4, 8, 8))
                          .astype(np.int32))
    jd8 = jax.jit(lambda r, q: T.idct8x8(T.dequant8x8(
        T.quant8x8(T.dct8x8(r), q, False), q)))
    timeit("dct8x8 + quant + dequant + idct", lambda: jd8(res8, qp))

    from x264_tpu.ops.device.trellis import (dq1_4x4, dq1_8x8,
                                             frame_trellis, trellis_quant)
    tbl4, tbl8, lam2f = frame_trellis(26, "P", int(lam), True)
    c4 = jax.device_put((rng.normal(0, 900, (n * 16, 16))
                         * (rng.random((n * 16, 16)) < 0.4))
                        .astype(np.int32))
    qpb4 = jnp.full(n * 16, 26, jnp.int32)
    jtq = functools.partial(jax.jit, static_argnames=("nc",)
                            )(trellis_quant)
    dq4 = dq1_4x4(qpb4)
    timeit("trellis 4x4 (frame)",
           lambda: jtq(c4, dq4, lam2f, tbl4, nc=16))
    c8 = jax.device_put((rng.normal(0, 2000, (n * 4, 64))
                         * (rng.random((n * 4, 64)) < 0.3))
                        .astype(np.int32))
    qpb8 = jnp.full(n * 4, 26, jnp.int32)
    dq8 = dq1_8x8(qpb8)
    timeit("trellis 8x8 (frame)",
           lambda: jtq(c8, dq8, lam2f, tbl8, nc=64))

    from x264_tpu.ops.device.deblock import deblock_impl
    from x264_tpu.ops.device.predict import predict_16x16_all
    top = jax.device_put(rng.integers(0, 255, (n, 16)).astype(np.int32))
    left = jax.device_put(rng.integers(0, 255, (n, 16)).astype(np.int32))
    tl = jax.device_put(rng.integers(0, 255, (n,)).astype(np.int32))
    av = jnp.ones(n, bool)
    jpred = jax.jit(predict_16x16_all)
    timeit("intra predict 16x16 all modes",
           lambda: jpred(top, left, tl, av, av))

    from x264_tpu.ops.device.entropy_pack import cabac_blob
    z = jnp.zeros(n, jnp.int32)
    ldc = jnp.zeros((n, 16), jnp.int32)
    lac = jax.device_put((rng.integers(-8, 8, (n, 16, 16))
                          * (rng.random((n, 16, 16)) < 0.15))
                         .astype(np.int32))
    cdc = jnp.zeros((n, 2, 4), jnp.int32)
    cac = jnp.zeros((n, 2, 4, 16), jnp.int32)
    jblob = functools.partial(jax.jit, static_argnames=("K",)
                              )(cabac_blob)
    mvz = jnp.zeros((n, 2), jnp.int32)
    timeit("cabac blob (global compaction)",
           lambda: jblob(ldc, lac, cdc, cac, z, mvz, z, z, z, z,
                         z, z, z, K=64))
    print(f"(deblock impl: {deblock_impl()})")


if __name__ == "__main__":
    main()
