"""Host CABAC finalization — ctypes binding to the native encoder
(native/cabac.c).  The device emits syntax tensors; the serial adaptive
arithmetic coding runs in C at memory speed (the one part of the codec
that is truly sequential per slice — x264 exposes the same boundary via
its sliced threads)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        so = os.path.join(_NATIVE, "libx264tpu_cabac.so")
        src = os.path.join(_NATIVE, "cabac.c")
        hdr = os.path.join(_NATIVE, "cabac_tables.h")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)
                or os.path.getmtime(so) < os.path.getmtime(hdr)):
            import fcntl
            # flock: parallel test workers must not race the build
            with open(src) as lockf:
                fcntl.flock(lockf, fcntl.LOCK_EX)
                if (not os.path.exists(so)
                        or os.path.getmtime(so) < os.path.getmtime(src)
                        or os.path.getmtime(so) < os.path.getmtime(hdr)):
                    tmp = so + ".tmp.so"
                    subprocess.run(["gcc", "-O2", "-shared", "-fPIC",
                                    src, "-o", tmp],
                                   check=True, capture_output=True)
                    os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.encode_slice_cabac.restype = ctypes.c_long
        lib.encode_slice_cabac.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            i32p, i32p, i32p, i32p, i32p, i32p, i32p,
            i16p, i16p, i16p, i16p,
            i32p, i32p, ctypes.c_void_p,   # t8: NULL = 8x8 mode off
            ctypes.c_void_p,               # i4m: NULL = no I4x4 MBs
            ctypes.c_void_p, ctypes.c_int,  # ref (NULL=single), num_ref
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            # shape/mvdp/refp: NULL = 16x16-only frame
            u8p, ctypes.c_long,
            ctypes.c_void_p,                # state_out (1024) or NULL
        ]
        lib.encode_slice_cabac_packed.restype = ctypes.c_long
        lib.encode_slice_cabac_packed.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,                   # parts (P partition fields)
            ctypes.c_int,                   # i4 (I_NxN pred-mode fields)
            u8p, ctypes.c_long,
            ctypes.c_void_p,                # state_out (1024) or NULL
        ]
        _LIB = lib
    return _LIB


def write_slice_cabac_packed(blob: np.ndarray, mbw: int, mbh: int,
                             slice_kind: int, slice_qp: int, K: int,
                             init_idc: int = 0,
                             t8_mode: bool = False,
                             num_ref: int = 1,
                             parts: bool = False,
                             i4: bool = False,
                             want_states: bool = False):
    """Encode slice_data() with CABAC from the device's compact blob
    (ops/device/entropy_pack.cabac_blob layout).  slice_kind 0=I/1=P/2=B.
    t8_mode: PPS transform_8x8_mode_flag (gates the per-MB flag bin).
    blob: the FLAT row+stream array (entropy_pack layout); K = average
    levels-per-MB stream capacity.  Raises OverflowError when the frame
    exceeded the stream capacity (caller retries at the next rung)."""
    from x264_tpu.ops.device.entropy_pack import blob_stride
    n = mbw * mbh
    cap = 1024 + n * 512
    out = np.zeros(cap, np.uint8)
    blob = np.ascontiguousarray(blob.reshape(-1).astype(np.int32,
                                                        copy=False))
    states = np.zeros(1024, np.uint8) if want_states else None
    sz = _lib().encode_slice_cabac_packed(
        mbw, mbh, slice_kind, int(slice_qp), init_idc,
        blob, K, blob_stride(slice_kind == 2, parts, i4), int(t8_mode),
        int(num_ref), int(parts), int(i4), out, cap,
        None if states is None
        else states.ctypes.data_as(ctypes.c_void_p))
    if sz < 0:
        raise OverflowError("CABAC level cap or buffer overflow")
    if want_states:
        return out[:sz].tobytes(), states
    return out[:sz].tobytes()


def write_slice_cabac(syn, slice_type: int, slice_qp: int,
                      init_idc: int = 0, bmode=None, mvd1=None,
                      t8=None) -> bytes:
    """Encode slice_data() with CABAC from a FrameSyntax.  Returns the
    byte-aligned payload (starts after cabac_alignment_one_bit, ends with
    the rbsp stop bit).  For B slices pass bmode (N,) and mvd1 (N,2)."""
    from x264_tpu.bitstream.slice_writer import SLICE_B, SLICE_P

    n = syn.n_mbs
    cap = 1024 + n * 512
    out = np.zeros(cap, np.uint8)
    c = np.ascontiguousarray
    kind = (2 if slice_type == SLICE_B
            else 1 if slice_type == SLICE_P else 0)
    if bmode is None:
        bmode = np.zeros(n, np.int32)
    if mvd1 is None:
        mvd1 = np.zeros((n, 2), np.int32)
    t8_arr = (None if t8 is None
              else np.ascontiguousarray(np.asarray(t8).astype(np.int32)))

    sz = _lib().encode_slice_cabac(
        syn.mb_width, syn.mb_height, kind,
        int(slice_qp), init_idc,
        c(syn.mb_class.astype(np.int32)),
        c(syn.i16_mode.astype(np.int32)),
        c(syn.chroma_mode.astype(np.int32)),
        c(syn.mvd.astype(np.int32)),
        c(syn.cbp_luma.astype(np.int32)),
        c(syn.cbp_chroma.astype(np.int32)),
        c(syn.qp.astype(np.int32)),
        c(syn.luma_dc.astype(np.int16)),
        c(syn.luma_ac.astype(np.int16)),
        c(syn.chroma_dc.astype(np.int16)),
        c(syn.chroma_ac.astype(np.int16)),
        c(np.asarray(bmode).astype(np.int32)),
        c(np.asarray(mvd1).astype(np.int32)),
        None if t8_arr is None else t8_arr.ctypes.data_as(ctypes.c_void_p),
        (None if syn.i4_modes is None else
         np.ascontiguousarray(syn.i4_modes.astype(np.int32))
         .ctypes.data_as(ctypes.c_void_p)),
        None, 1, None, None, None,
        out, cap, None)
    if sz < 0:
        raise RuntimeError("CABAC buffer overflow")
    return out[:sz].tobytes()
