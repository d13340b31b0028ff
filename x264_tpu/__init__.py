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

from x264_tpu.params import EncoderParams  # noqa: F401
