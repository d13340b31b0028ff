"""Rate control — CQP/CRF/ABR + adaptive quantization (parity target:
reference encoder/ratecontrol.c)."""

from x264_tpu.rc.ratecontrol import RateControl, aq_offsets  # noqa: F401
