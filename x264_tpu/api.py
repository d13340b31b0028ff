"""Public encoder API — the analog of x264.h's 11 encoder entry points
(x264.h:930-1019): open/headers/encode/flush/close, adapted to Python idiom.

Round-1 surface: Encoder(params) -> .headers() -> .encode(frame) per frame
-> .close().  Each encode() returns the Annex-B bytes for that frame
(zero-latency: no B-frames yet, so no reordering delay).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from x264_tpu.bitstream.bits import BitWriter
from x264_tpu.bitstream.headers import (
    SLICE_I,
    SLICE_P,
    sps_from_params,
    wrap_slice_nal,
    write_pps,
    write_slice_header,
    write_sps,
)
from x264_tpu.bitstream.slice_writer_vec import write_slice_data_vec as write_slice_data
from x264_tpu.models import intra_frame
from x264_tpu.params import EncoderParams
from x264_tpu.utils.yuv import Frame420, pad_to_mb


@dataclass
class ReconFrame:
    y: np.ndarray
    u: np.ndarray
    v: np.ndarray
    frame_num: int = 0
    poc: int = 0


@dataclass
class FrameStats:
    frame_type: str = "I"
    bits: int = 0
    qp: float = 0.0


class Encoder:
    """Capability anchor: x264_encoder_open (encoder/encoder.c:1507) +
    x264_encoder_encode (:3323), restructured: all pixel work is batched
    per-frame; entropy serialization on host."""

    def __init__(self, params: EncoderParams):
        self.p = params.validate()
        self.sps = sps_from_params(self.p)
        self._sps_bytes = write_sps(self.sps)
        self._pps_bytes = write_pps(self.p)
        self.frame_idx = 0
        self.frame_num = 0
        self.idr_pic_id = 0
        self.dpb: list[ReconFrame] = []
        self.stats: list[FrameStats] = []
        self.last_recon: ReconFrame | None = None

    # -- x264_encoder_headers ------------------------------------------------
    def headers(self) -> bytes:
        return self._sps_bytes + self._pps_bytes

    def _use_device(self) -> bool:
        if self.p.backend == "reference":
            return False
        if self.p.backend in ("device", "device_host_entropy"):
            return True
        try:
            import jax  # noqa: F401
            return True
        except ImportError:
            return False

    # -- fast path: device-resident DPB + device-packed slice body ----------
    def _encode_device_fast(self, y, u, v, ftype: str, qp: int):
        """Steady-state path: per-MB bitstrings packed on device; host does
        slice header + one bit-merge; recon/DPB stay on device."""
        import jax.numpy as jnp

        from x264_tpu.bitstream.slice_assemble import (
            append_payload,
            merge_mb_strings,
        )
        from x264_tpu.bitstream.tables import CHROMA_QP_TABLE
        from x264_tpu.models.inter_frame import me_lambda
        from x264_tpu.models.syntax import MB_PSKIP
        from x264_tpu.ops.device.deblock import deblock_core

        h, w = y.shape
        mbw, mbh = w // 16, h // 16
        n = mbw * mbh
        idr = ftype == "IDR"
        # n_words ladder: CAVLC-overflow fallback pattern
        # (reference encoder/encoder.c:2893 re-encodes on overflow)
        ladder = [24, 64, 160, 416] if qp >= 16 else [64, 160, 416]

        # single-buffer upload (the tunnel has ~100ms/call latency)
        import jax
        buf = np.empty((h + h // 2, w), np.uint8)
        buf[:h] = y
        buf[h:, :w // 2] = u
        buf[h:, w // 2:] = v
        d = jax.device_put(buf)
        yd, ud, vd = d[:h], d[h:, :w // 2], d[h:, w // 2:]
        for n_words in ladder:
            if idr or not self.dpb:
                from x264_tpu.models.intra_device import i_frame_core
                out = i_frame_core(yd, ud, vd, np.int32(qp),
                                   mbw=mbw, mbh=mbh,
                                   cqp_off=self.p.chroma_qp_offset,
                                   n_words=n_words)
                slice_type = SLICE_I
            else:
                from x264_tpu.models.inter_device import p_frame_core
                ref = self.dpb[-1]
                out = p_frame_core(yd, ud, vd, ref.y, ref.u, ref.v,
                                   np.int32(qp), np.int32(me_lambda(qp)),
                                   mbw=mbw, mbh=mbh,
                                   me_range=self.p.me_range,
                                   cqp_off=self.p.chroma_qp_offset,
                                   n_words=n_words, subpel=self.p.subpel)
                slice_type = SLICE_P
            # enqueue deblock (device->device) before syncing on the blob
            recon = self._deblock_device(out, qp, mbw, mbh)
            blob = np.asarray(out["host_blob"])
            nbits = blob[:, n_words]
            if int(nbits.max(initial=0)) <= 32 * n_words:
                break

        words = np.ascontiguousarray(blob[:, :n_words]).view(np.uint32)
        mb_class = blob[:, n_words + 1]

        bs = BitWriter()
        write_slice_header(bs, self.p, self.sps, slice_type=slice_type,
                           idr=idr, frame_num=self.frame_num,
                           idr_pic_id=self.idr_pic_id, qp=qp, num_ref=1)
        payload, total = merge_mb_strings(words, nbits)
        append_payload(bs, payload, total)
        if slice_type == SLICE_P:
            coded = mb_class != MB_PSKIP
            trailing = int(n - 1 - (np.nonzero(coded)[0][-1]
                                    if coded.any() else -1))
            if trailing:
                bs.ue(trailing)
        data = wrap_slice_nal(bs.to_rbsp(), idr)
        return data, ReconFrame(*recon, frame_num=self.frame_num)

    def _deblock_device(self, out, qp, mbw, mbh):
        """Enqueue device deblock on the core's outputs (device-resident)."""
        ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
        if not self.p.deblock:
            return ry, ru, rv
        import jax.numpy as jnp

        from x264_tpu.bitstream.tables import CHROMA_QP_TABLE
        from x264_tpu.ops.device.deblock import deblock_core
        n = mbw * mbh
        qpc = int(CHROMA_QP_TABLE[
            min(max(qp + self.p.chroma_qp_offset, 0), 51)])
        return deblock_core(
            ry, ru, rv, out["mb_class"] == 0, out["luma_nnz"],
            out["mv"] if "mv" in out else jnp.zeros((n, 2), jnp.int32),
            jnp.zeros(n, jnp.int32),
            jnp.full(n, qp, jnp.int32), jnp.full(n, qpc, jnp.int32),
            np.int32(self.p.deblock_alpha * 2),
            np.int32(self.p.deblock_beta * 2), mbw=mbw, mbh=mbh)

    def _pad(self, fr: Frame420):
        y = pad_to_mb(fr.y, 16)
        u = pad_to_mb(fr.u, 8)
        v = pad_to_mb(fr.v, 8)
        return y, u, v

    def _decide_type(self) -> str:
        if self.frame_idx == 0 or (self.p.keyint_max > 0
                                   and self.frame_idx % self.p.keyint_max == 0):
            return "IDR"
        return "P"

    def encode(self, fr: Frame420) -> bytes:
        y, u, v = self._pad(fr)
        ftype = self._decide_type()
        qp = self.p.qp

        out = b""
        if ftype == "IDR":
            self.frame_num = 0
            if self.p.repeat_headers:
                out += self.headers()

        use_device = self._use_device()
        if use_device and self.p.backend != "device_host_entropy":
            data, recon = self._encode_device_fast(y, u, v, ftype, qp)
            out += data
            self.last_recon = recon
            self.dpb = [recon]
            if ftype == "IDR":
                self.idr_pic_id = (self.idr_pic_id + 1) % 65536
            self.frame_num = (self.frame_num + 1) % (
                1 << self.sps.log2_max_frame_num)
            self.frame_idx += 1
            self.stats.append(FrameStats(ftype, len(out) * 8, qp))
            return out

        if ftype == "IDR" or not self.dpb:
            if use_device:
                from x264_tpu.models import intra_device
                ry, ru, rv, syn = intra_device.encode_iframe_device(
                    y, u, v, qp, self.p.chroma_qp_offset)
            else:
                ry, ru, rv, syn = intra_frame.encode_iframe(
                    y, u, v, qp, self.p.chroma_qp_offset)
            slice_type = SLICE_I
            idr = True
        else:
            ref = self.dpb[-1]
            if use_device:
                from x264_tpu.models import inter_device
                ry, ru, rv, syn = inter_device.encode_pframe_device(
                    y, u, v, ref, qp, self.p)
            else:
                from x264_tpu.models import inter_frame
                ry, ru, rv, syn = inter_frame.encode_pframe(
                    y, u, v, ref, qp, self.p)
            slice_type = SLICE_P
            idr = False

        bs = BitWriter()
        write_slice_header(bs, self.p, self.sps, slice_type=slice_type,
                           idr=idr, frame_num=self.frame_num,
                           idr_pic_id=self.idr_pic_id, qp=qp, num_ref=1)
        write_slice_data(bs, syn, slice_type)
        out += wrap_slice_nal(bs.to_rbsp(), idr)

        if self.p.deblock:
            if use_device:
                from x264_tpu.bitstream.tables import CHROMA_QP_TABLE
                from x264_tpu.models.syntax import MB_I4, MB_I16
                from x264_tpu.ops.device.deblock import deblock_core
                intra_mb = np.isin(syn.mb_class, (MB_I16, MB_I4))
                qpc = CHROMA_QP_TABLE[np.clip(
                    syn.qp + self.p.chroma_qp_offset, 0, 51)].astype(np.int32)
                ry, ru, rv = deblock_core(
                    ry, ru, rv, intra_mb, syn.luma_nnz.astype(np.int32),
                    syn.mv.astype(np.int32), syn.ref.astype(np.int32),
                    syn.qp.astype(np.int32), qpc,
                    np.int32(self.p.deblock_alpha * 2),
                    np.int32(self.p.deblock_beta * 2),
                    mbw=syn.mb_width, mbh=syn.mb_height)
                ry, ru, rv = (np.asarray(ry), np.asarray(ru), np.asarray(rv))
            else:
                from x264_tpu.ops.reference.deblock import deblock_frame
                ry, ru, rv = deblock_frame(
                    ry, ru, rv, syn, self.p.deblock_alpha,
                    self.p.deblock_beta, self.p.chroma_qp_offset)

        recon = ReconFrame(ry, ru, rv, frame_num=self.frame_num)
        self.last_recon = recon
        self.dpb = [recon]  # sliding window, 1 ref in round 1
        if idr:
            self.idr_pic_id = (self.idr_pic_id + 1) % 65536
        self.frame_num = (self.frame_num + 1) % (1 << self.sps.log2_max_frame_num)
        self.frame_idx += 1
        self.stats.append(FrameStats(ftype, len(out) * 8, qp))
        return out

    def close(self) -> dict:
        """Summary stats (analog of encoder_close's log summary)."""
        if not self.stats:
            return {}
        bits = sum(s.bits for s in self.stats)
        fps = self.p.fps_num / max(1, self.p.fps_den)
        return {
            "frames": len(self.stats),
            "kbps": bits * fps / max(1, len(self.stats)) / 1000.0,
            "avg_qp": float(np.mean([s.qp for s in self.stats])),
        }


def encode_sequence(frames, params: EncoderParams) -> bytes:
    enc = Encoder(params)
    out = b""
    for fr in frames:
        out += enc.encode(fr)
    return out
