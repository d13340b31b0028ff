from x264_tpu.bitstream.bits import BitReader, BitWriter  # noqa: F401
from x264_tpu.bitstream.nal import make_nal, split_annexb  # noqa: F401
