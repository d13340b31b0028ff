"""x264_tpu — a TPU-native H.264/AVC encoder framework.

A from-scratch re-design of the capability surface of x264 (reference:
xrgtn/x264-i386pic) for TPU hardware: batched tensor pipelines in JAX/XLA/
Pallas over HBM-resident frames for all pixel work (analysis, transforms,
reconstruction, deblocking), with the inherently serial entropy-coding
finalization vectorized on the host.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):
  ops/        — kernel layer: ops.reference (NumPy bit-exact oracles, the
                role x264's C kernels play) and ops.pallas / ops.xla (TPU).
  bitstream/  — host entropy layer: bit writer, exp-Golomb, NAL escape,
                SPS/PPS/slice headers, CAVLC block coding (vectorized).
  models/     — frame-encode pipelines (intra wavefront, inter batched ME).
  rc/         — rate control (CQP/CRF/ABR), adaptive quant, lookahead.
  parallel/   — device mesh sharding: MB-row bands over ICI, GOP pipeline.
  utils/      — y4m I/O, PSNR/SSIM, padding helpers.
"""

__version__ = "0.1.0"


def _enable_jax_compile_cache() -> None:
    """Persistent XLA compile cache: our frame pipelines are large programs
    (wavefront scan + unrolled CAVLC), so first-compile latency matters —
    especially through a remote-compile TPU tunnel.  Cache keyed per shape;
    every later process reuses it."""
    try:
        import os
        import jax
        cache = os.environ.get("X264_TPU_JAX_CACHE",
                               os.path.expanduser("~/.cache/x264_tpu_jax"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_jax_compile_cache()

from x264_tpu.params import EncoderParams  # noqa: F401
