"""JAX/XLA device kernels — the TPU compute tier.

Bit-exact (integer) counterparts of x264_tpu.ops.reference, batched over all
macroblocks of a frame and jittable with a traced QP so one compiled program
serves every quantizer.  This layer plays the role of the reference's
per-arch SIMD directory (SURVEY §2.2): same kernel surface, TPU "ISA".
"""
