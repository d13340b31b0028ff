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
    SLICE_B,
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
    # colocated motion field (temporal direct): per-MB mv + intra mask
    col_mv: object = None
    col_intra: object = None
    # per-quad ref_idx of the anchor (multi-ref temporal-direct gate)
    col_ref: object = None


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
        self._sps_bytes = write_sps(self.sps, self.p)
        self._pps_bytes = write_pps(self.p)
        self.frame_idx = 0
        self.frame_num = 0
        self.idr_pic_id = 0
        self.dpb: list[ReconFrame] = []
        self._src_hist: list = []       # source luma per dpb slot (weightp)
        self.stats: list[FrameStats] = []
        self.last_recon: ReconFrame | None = None
        from x264_tpu.rc import RateControl
        self.rc = RateControl(self.p)
        self._pass2_qps = None
        self._twopass_stats = []
        if self.p.stats_read:
            from x264_tpu.rc.twopass import plan_pass2, read_stats
            entries = read_stats(self.p.stats_read)
            self._pass2_qps = plan_pass2(
                entries, self.p.bitrate or 1000,
                self.p.fps_num / max(1, self.p.fps_den),
                qp_min=self.p.qp_min, qp_max=self.p.qp_max)
        self._init_qp = self.p.qp      # PPS pic_init_qp base (frozen)
        # display-order recon callback (disp_idx, ReconFrame) — fires as
        # each frame's reconstruction is final (B frames out of encode
        # order); the CLI's PSNR/--dump-recon use it (x264's b_full_recon
        # + x264_picture_t recon out-fields analog)
        self.recon_hook = None
        self._zones = []
        if self.p.zones:
            from x264_tpu.params import parse_zones
            self._zones = parse_zones(self.p.zones)
        self._warm_thread = None
        self._warm_done = None
        # only worth a background thread when compiles are expensive
        # (big frames); tiny test encoders would pay thread+compile churn
        if self._use_device() and not self._syn_path() \
                and self.p.slices == 1 \
                and not getattr(Encoder, "_no_warm", False) \
                and self.p.mb_width * self.p.mb_height >= 2000:
            import threading
            self._warm_done = threading.Event()
            self._warm_thread = threading.Thread(
                target=self._warm_compiles, daemon=True)
            self._warm_thread.start()

    def _warm_twin(self):
        """Warm by ENCODING real zero frames through a throwaway twin
        Encoder.  Hand-crafted warm-up calls used to mirror the real
        call signatures — but jit's in-process cache also keys on
        argument COMMITTED-ness (device_put'ed views vs fresh
        jnp.zeros), so the first real frames still missed it and paid a
        persistent-cache READ per program, which round-trips the
        remote-compile tunnel at ~10-40 s each (round-5 faulthandler
        capture: compilation_cache.get_executable_and_time inside the
        first P/B-pair submits).  Driving the genuine encode path makes
        the warm signatures identical by construction: IDR, a full
        P+B..B mini-GOP, and a short tail GOP (the single-B core)."""
        from x264_tpu.utils.yuv import Frame420
        p = self.p
        h, w = 16 * p.mb_height, 16 * p.mb_width
        try:
            Encoder._no_warm = True
            tw = Encoder(p)
        finally:
            Encoder._no_warm = False
        # STATIC textured content (not zeros): the lowres scenecut on an
        # all-zero clip reads inter-cost == intra-cost == 0 and promotes
        # every frame to IDR, which would skip the P/B cores entirely
        rng = np.random.default_rng(0)
        z = Frame420(rng.integers(0, 256, (h, w)).astype(np.uint8),
                     np.full((h // 2, w // 2), 128, np.uint8),
                     np.full((h // 2, w // 2), 128, np.uint8))
        # IDR, one full mini-GOP, then a tail that exercises the OTHER
        # B-core arity at flush (pair for bframes=2 covers the single-B
        # tail with bframes extra frames; bframes=3 runs singles in the
        # main GOP and the pair in the tail)
        n = max(1 + (p.bframes + 1) + p.bframes, 2)
        for _ in range(n):
            tw.encode(z)
            # a noisy I frame overflows the first rung and would ratchet
            # the twin's ladder floor away from it — pin group 1 there
            tw._rung_floor = 0
        tw.flush()
        if self._warm_done is not None:
            self._warm_done.set()      # first rung provably warm
        # overflow rung, same REAL signatures: ratchet the twin's
        # ladder floor to the last rung and run another GOP group (the
        # I-frame blob routinely overflows the first rung on busy
        # content, ratcheting the floor for the whole stream — so the
        # 408-rung cores are a hot path, and hand-written warm calls
        # for them kept missing the jit cache on kwarg-signature
        # details, costing ~40 s stalls in the first real mini-GOPs)
        tw._rung_floor = tw._ladder(p.qp)[-1]
        for _ in range(n):
            tw.encode(z)
        tw.flush()

    def _warm_compiles(self):
        """Warm-up (background thread at open): encode real frames
        through a twin Encoder at BOTH entropy-ladder rungs
        (_warm_twin) — exact-signature warm of every core, finalizer
        and deblock variant the real stream dispatches.  n_words/lv_cap
        is a STATIC jit parameter: without this, the first frame that
        steps the ladder pays a full XLA compile (~30-100 s at 1080p
        through the remote-compile tunnel) mid-stream.  Sets _warm_done
        once the first rung is covered — warm(full=True) joins the
        thread for both."""
        try:
            self._warm_twin()
        except Exception as e:
            # warm-up is best-effort (the real path compiles lazily), but
            # record the failure and release warm() waiters
            self._warm_error = e
        finally:
            self._warm_done.set()

    def warm(self, timeout=None, full: bool = False) -> bool:
        """Block until the background compile warm-up has compiled every
        ladder rung of every frame core (bench and latency-sensitive
        callers).  Returns True when the warm-up provably completed;
        False on timeout or when no warm-up thread was started.

        full=True joins the warm-up THREAD (not just the first-rung
        event): the overflow-rung compiles otherwise continue in the
        background and contend with measured frames through the
        remote-compile tunnel (observed: two ~50 s stalls in the first
        mini-GOPs on a cold compile cache)."""
        if self._warm_done is None:
            return False
        ok = self._warm_done.wait(timeout)
        if full and self._warm_thread is not None:
            self._warm_thread.join(timeout)
            return ok and not self._warm_thread.is_alive()
        return ok

    # -- x264_encoder_reconfig (encoder/encoder.c:1955) ----------------------
    RECONFIG_OK = frozenset((
        "qp", "crf", "bitrate", "qp_min", "qp_max", "me_range", "subpel",
        "scenecut_threshold", "deblock", "deblock_alpha", "deblock_beta",
        "weightp", "trellis", "aq_mode", "aq_strength", "keyint_max",
        "keyint_min", "vbv_maxrate", "vbv_bufsize", "rc_method",
        "log_level", "me_method"))

    def reconfig(self, **kw) -> None:
        """Change run-time parameters mid-stream.  Only the analysis/RC
        whitelist is reconfigurable — anything baked into SPS/PPS
        (geometry, entropy mode, bframes, refs, 8x8dct, fps/VUI) is
        rejected, matching the reference's reconfigurable subset."""
        bad = set(kw) - self.RECONFIG_OK
        if bad:
            raise ValueError(f"not reconfigurable: {sorted(bad)}")
        newp = self.p.clone(**kw).validate()
        self.p = newp
        self.rc.p = newp               # RC reads params dynamically

    def delayed_frames(self) -> int:
        """Frames buffered inside the encoder (B queue + lookahead +
        deferred mini-GOP finalize) — x264_encoder_delayed_frames."""
        n = len(self._bq or [])
        n += len(self._mbt_q or [])
        n += len(self._gop_q or [])
        n += 1 if getattr(self, "_pending", None) is not None else 0
        return n

    # ---- periodic intra refresh (PIR) sweep state ----
    _pir_col = None          # next column to refresh, or None (no sweep)
    _pir_restart = False

    def _pir_w(self) -> int:
        """Columns refreshed per P frame: a sweep spans ~keyint frames
        (encoder.c:3626 refresh-bar advance)."""
        k = max(2, self.p.keyint_max or 2)
        return max(1, -(-self.p.mb_width // (k - 1)))

    def _pir_args(self, idr: bool):
        """(pir_ncols static, pir_col traced, pir_bound traced) for this
        frame, advancing the sweep; recovery-point SEI bytes at sweep
        start."""
        if not self.p.intra_refresh or idr:
            return 0, None, None, b""
        sei = b""
        if self._pir_restart or (
                self.p.keyint_max > 1
                and self.frame_idx % self.p.keyint_max == 0):
            self._pir_col = 0
            self._pir_restart = False
            from x264_tpu.bitstream.sei import recovery_point_sei
            sei = recovery_point_sei(
                -(-self.p.mb_width // self._pir_w()))
        if self._pir_col is None or self._pir_col >= self.p.mb_width:
            return 0, None, None, sei
        col = self._pir_col
        self._pir_col = col + self._pir_w()
        return (self._pir_w(), np.int32(col), np.int32(16 * col), sei)

    def intra_refresh(self) -> None:
        """Request a refresh at the earliest opportunity
        (x264_encoder_intra_refresh).  With --intra-refresh this
        restarts the PIR sweep (no IDR, encoder.c:3280); otherwise it
        forces the next frame to IDR."""
        if self.p.intra_refresh:
            self._pir_restart = True
            return
        if self._force is None:
            self._force = {}
        self._force[self._in_disp] = ("IDR", None)

    def invalidate_reference(self, frame_num: int) -> int:
        """Stop predicting from pictures with frame_num >= the given
        coded frame number (x264_encoder_invalidate_reference: the
        downstream decoder lost them).  The decoder's DPB still CONTAINS
        the lost pictures, so list0 indices can't simply be re-packed;
        the reference re-points refs via list reordering — here the
        recovery is an immediate IDR (always conformant, costs one
        keyframe)."""
        invalid = sum(1 for r in self.dpb if r.frame_num >= frame_num)
        if invalid:
            self.intra_refresh()
        return invalid

    # -- x264_encoder_headers ------------------------------------------------
    def headers(self) -> bytes:
        out = self._sps_bytes + self._pps_bytes
        if self.p.sei_version:
            from x264_tpu.bitstream.sei import version_sei
            out += version_sei(self.p)
        return out

    # access-unit metadata log (container muxing: pts/dts/keyframe)
    _au_meta: list = None
    _cod_count = 0

    def _note_au(self, nbytes: int, ftype: str, poc_lsb: int):
        if self._au_meta is None:
            self._au_meta = []
        disp = (self._idr_disp + poc_lsb // 2 if self.p.bframes
                else self._cod_count)
        self._au_meta.append(dict(bytes=nbytes, pts=disp,
                                  dts=self._cod_count,
                                  key=ftype == "IDR"))
        self._cod_count += 1

    def drain_au_meta(self) -> list:
        """Access units (sizes within the bytes returned so far, pts/dts
        in frame units, keyframe flags) since the last drain — the
        x264_picture_t out-fields analog for muxers."""
        m = self._au_meta or []
        self._au_meta = []
        return m

    # NAL HRD timing SEI state (coded-order counters)
    _hrd_cod_since_bp = 0
    _hrd_cod_total = 0

    def _hrd_sei(self, idr: bool, poc_lsb: int) -> bytes:
        """Buffering-period SEI at each IDR + pic-timing SEI per frame
        when --nal-hrd (D.1.1/D.1.2; x264 encoder.c:3700 emission
        points).  Delays use the 24-bit lengths our VUI declares."""
        if not self.p.nal_hrd:
            return b""
        from x264_tpu.bitstream.sei import (buffering_period_sei,
                                            pic_timing_sei)
        out = b""
        if idr:
            d90k = int(90000 * self.p.vbv_bufsize * self.p.vbv_init
                       / max(1, self.p.vbv_maxrate))
            out += buffering_period_sei(d90k)
            self._hrd_cod_since_bp = 0
        reorder = 1 if self.p.bframes else 0
        disp = (self._idr_disp + poc_lsb // 2 if self.p.bframes
                else self._hrd_cod_total)
        out += pic_timing_sei(
            2 * self._hrd_cod_since_bp,
            max(0, 2 * (disp + reorder - self._hrd_cod_total)))
        self._hrd_cod_since_bp += 1
        self._hrd_cod_total += 1
        return out

    def _cab_rows(self, blob, n: int, is_b: bool = False,
                  parts: bool = False, i4: bool = False):
        """Per-MB field rows of a flat CABAC blob (entropy_pack layout)."""
        from x264_tpu.ops.device.entropy_pack import blob_stride
        st = blob_stride(is_b, parts, i4)
        return np.asarray(blob).reshape(-1)[:n * st].reshape(n, st)

    def _cabac_fast(self) -> bool:
        """CABAC via the device fast path (compact blob + native C
        entropy, incl. multi-ref ref_idx bins).  Multi-slice CABAC stays
        on the syntax path for now."""
        return self.p.cabac and self.p.slices <= 1

    def _syn_path(self) -> bool:
        """Frames go through the host FrameSyntax writers (instead of the
        device-packed fast path): reference backend, host-entropy debug
        backend, and I4x4 with CAVLC (the device CAVLC word packer has
        no I4 header support yet).  CABAC always takes the packed fast
        path now — incl. I4x4 (pred-mode nibble fields), multi-ref and
        multi-slice (the band loop codes each band's blob
        independently)."""
        return (self.p.backend in ("reference", "device_host_entropy")
                or (self.p.i4x4 and not self._cabac_fast()))

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
    # Split into submit (enqueue all device work, advance DPB) and finalize
    # (sync on the packed blob, assemble bytes) so a pipelined caller can
    # overlap frame t's device->host transfer with frame t+1's compute —
    # the analog of x264's frame-threads delay (encoder/encoder.c:1610).

    def _run_core(self, yd, ud, vd, ref, idr: bool, base_qp: int, qp_arr,
                  n_words: int, mbw: int, mbh: int, wts=None, pir=None):
        from x264_tpu.models.inter_frame import me_lambda, sad_lambda
        ent = "cabac" if self._cabac_fast() else "cavlc"
        ekw = (dict(entropy="cabac", lv_cap=n_words) if ent == "cabac"
               else dict(n_words=n_words))
        if idr or ref is None:
            if self.p.i4x4 and ent == "cabac":
                from x264_tpu.models.intra_device import i4_frame_core
                out = i4_frame_core(yd, ud, vd, qp_arr,
                                    np.int32(sad_lambda(base_qp)),
                                    mbw=mbw, mbh=mbh,
                                    cqp_off=self.p.chroma_qp_offset,
                                    entropy="cabac", lv_cap=n_words,
                                    t8_mode=self.p.transform_8x8,
                                    trellis_tbl=self._trellis_tbl(
                                        base_qp, "I"))
                return out, SLICE_I
            from x264_tpu.models.intra_device import i_frame_core
            out = i_frame_core(yd, ud, vd, qp_arr,
                               mbw=mbw, mbh=mbh,
                               cqp_off=self.p.chroma_qp_offset,
                               trellis_tbl=self._trellis_tbl(base_qp, "I")
                               if ent == "cabac" else None, **ekw)
            return out, SLICE_I
        import jax.numpy as jnp

        from x264_tpu.models.inter_device import p_frame_core
        refs = ref if isinstance(ref, list) else [ref]
        if len(refs) == 1:
            ry, ru, rv = refs[0].y, refs[0].u, refs[0].v
        else:
            ry = jnp.stack([r.y for r in refs])
            ru = jnp.stack([r.u for r in refs])
            rv = jnp.stack([r.v for r in refs])
        pkw = {}
        if pir is not None and pir[0]:
            pkw = dict(pir_ncols=pir[0], pir_col=pir[1], pir_bound=pir[2])
        out = p_frame_core(yd, ud, vd, ry, ru, rv,
                           qp_arr, np.int32(sad_lambda(base_qp)),
                           mbw=mbw, mbh=mbh, me_range=self.p.me_range,
                           cqp_off=self.p.chroma_qp_offset,
                           subpel=self.p.subpel,
                           t8=self.p.transform_8x8, wts=wts,
                           trellis_tbl=self._trellis_tbl(base_qp, "P"),
                           parts=self.p.p8x8,
                           decimate=self.p.dct_decimate,
                           **pkw, **ekw)
        return out, SLICE_P

    _cab_states: dict = None     # last final CABAC states per slice type

    def _trellis_tbl(self, qp: int, slice_type: str):
        """Per-frame trellis cost bundle, or None when trellis is off
        (the bundle rides the jit arg pytree — one compiled graph).
        Uses the previous same-type frame's final CABAC states as the
        bit-cost operating point when available (rdo.c's snapshot
        model, one frame stale) — the ctx-init estimate underprices
        bits on busy content and over-raises levels."""
        if not (self.p.trellis and self.p.cabac):
            return None
        from x264_tpu.models.inter_frame import me_lambda, sad_lambda
        from x264_tpu.ops.device.trellis import frame_trellis
        # round 5: the live-state feedback measured worse than the
        # static ctx-init tables at equal rate (see frame_trellis's
        # calibration note) — states stay None
        return frame_trellis(qp, slice_type, me_lambda(qp),  # λ2: RD slope
                             self.p.transform_8x8, states=None)

    def _note_recon(self, disp, rec) -> None:
        if self.recon_hook is not None and disp is not None:
            self.recon_hook(disp, rec)

    def _zone_qp(self, disp, qp: int) -> int:
        """Per-range RC override (x264 --zones, ratecontrol.c:1346
        zone_for_frame + rate_estimate_qscale's zone application):
        q= forces the QP, b= scales bits (qp -= 6*log2(factor))."""
        if not self._zones or disp is None:
            return qp
        for (s, e, (k, v)) in self._zones:
            if s <= disp <= e:
                if k == "q":
                    return int(np.clip(v, 0, 51))
                return int(np.clip(round(qp - 6.0 * np.log2(v)),
                                   self.p.qp_min, self.p.qp_max))
        return qp

    def _requantize_idr(self, qp: int) -> int:
        """Re-derive the frame QP when a P frame is promoted to IDR."""
        return max(self.p.qp_min, qp - self.rc.IP_OFFSET)

    # Entropy budget: a FIXED two-rung ladder.  n_words/lv_cap is a
    # static jit parameter (it sets the blob shape), so every distinct
    # rung is a separate XLA program — the round-2 content-adaptive
    # ladder caused mid-stream compiles (30-100 s through the remote
    # tunnel) whenever the start rung moved.  Two rungs bound the
    # compile set; after an overflow the floor ratchets up and STAYS up
    # (one re-encode per content change, like encoder.c:2893's ladder).
    _rung_floor = 0

    def _ladder(self, qp: int) -> list:
        full = [96, 408] if self._cabac_fast() else [64, 416]
        keep = [r for r in full if r >= self._rung_floor]
        return keep if keep else full[-1:]

    def _note_budget(self, cabac: bool, observed: int):
        """Record a frame's observed entropy size; ratchet the ladder
        floor so a rung that overflowed once is never retried."""
        full = [96, 408] if cabac else [64, 416]
        for r in full:
            if observed <= r:
                if r > self._rung_floor:
                    self._rung_floor = r
                return
        self._rung_floor = full[-1]

    def _submit_device_sliced(self, y, u, v, ftype: str, qp: int) -> dict:
        """Multi-slice frame: split MB rows into p.slices bands, run the
        band pipeline per band (the single-chip form of the sliced-band
        mesh path, parallel/sliced.py), emit one slice NAL per band.
        Slice-local entropy (nC availability, skip runs, qp chains, MVP)
        falls out of per-band computation — exactly like x264's sliced
        threads (encoder/encoder.c:3219)."""
        import jax
        import jax.numpy as jnp

        from x264_tpu.models.inter_device import p_band_core
        from x264_tpu.models.inter_frame import PAD, me_lambda, sad_lambda
        from x264_tpu.models.intra_device import i_frame_core

        h, w = y.shape
        mbw, mbh = w // 16, h // 16
        idr = ftype == "IDR" or not self.dpb
        if idr:
            ftype = "IDR"
        nsl = max(1, min(self.p.slices, mbh))
        base = mbh // nsl
        rem = mbh % nsl
        heights = [base + (1 if i < rem else 0) for i in range(nsl)]
        starts = np.concatenate(([0], np.cumsum(heights)))[:-1]
        ladder = [96, 408] if self.p.cabac else [64, 416]
        n_words = ladder[0]

        buf = np.empty((h + h // 2, w), np.uint8)
        buf[:h] = y
        buf[h:, :w // 2] = u
        buf[h:, w // 2:] = v
        d = jax.device_put(buf)
        yd, ud, vd = d[:h], d[h:, :w // 2], d[h:, w // 2:]

        if self.p.aq_mode:
            qp_arr = self._aq_qp(qp, y, u, v, mbw, mbh)
        else:
            qp_arr = np.full(mbw * mbh, qp, np.int32)

        ref = None if idr else self.dpb[0]
        if ref is not None:
            ry_pad = jnp.pad(ref.y, PAD, mode="edge")
            ru_pad = jnp.pad(ref.u, PAD // 2, mode="edge")
            rv_pad = jnp.pad(ref.v, PAD // 2, mode="edge")

        # ---- device-mesh band path (--threads N): one band per device
        # via shard_map (parallel/sliced.py), bit-equal to the serial
        # band loop below (asserted in tests/test_sliced_mesh.py and the
        # driver dryrun).  P frames with equal band heights only; IDR and
        # ragged splits use the loop. ----
        if (self.p.threads > 1 and ref is not None and rem == 0
                and nsl > 1 and not self.p.cabac
                and len(jax.devices()) >= nsl):
            from x264_tpu.models.inter_frame import me_lambda, sad_lambda
            step = self._sliced_mesh_step(nsl, mbw, base, n_words)
            out = step(yd, ud, vd, ry_pad, ru_pad, rv_pad,
                       np.broadcast_to(np.atleast_1d(qp_arr),
                                       (mbw * mbh,)).astype(np.int32),
                       sad_lambda(qp))
            nmb_b = base * mbw
            blob_h = np.asarray(out["host_blob"])
            outs = [dict(host_blob=blob_h[b * nmb_b:(b + 1) * nmb_b])
                    for b in range(nsl)]
            recon = self._deblock_device(out, qp, mbw, mbh)
            job = dict(sliced=True, outs=outs, starts=starts,
                       heights=heights, slice_type=SLICE_P, idr=False,
                       qp=qp, mbw=mbw, mbh=mbh, n_words=n_words,
                       qp_arr=np.broadcast_to(np.atleast_1d(qp_arr),
                                              (mbw * mbh,)),
                       ladder=ladder, planes=(yd, ud, vd), w=w,
                       refpads=(ry_pad, ru_pad, rv_pad),
                       frame_num=self.frame_num,
                       idr_pic_id=self.idr_pic_id, ftype=ftype)
            new = ReconFrame(*recon, frame_num=self.frame_num)
            self.dpb = [new]
            self.last_recon = new
            self.frame_num = (self.frame_num + 1) % (
                1 << self.sps.log2_max_frame_num)
            self.frame_idx += 1
            return job

        outs = []
        for b in range(nsl):
            y0, bh = int(starts[b]), heights[b]
            yb = yd[16 * y0:16 * (y0 + bh)]
            ub = ud[8 * y0:8 * (y0 + bh)]
            vb = vd[8 * y0:8 * (y0 + bh)]
            qpb = qp_arr[y0 * mbw:(y0 + bh) * mbw]
            ekw = (dict(entropy="cabac", lv_cap=n_words)
                   if self.p.cabac else dict(n_words=n_words))
            if ref is None:
                ob = i_frame_core(yb, ub, vb, qpb, mbw=mbw, mbh=bh,
                                  cqp_off=self.p.chroma_qp_offset, **ekw)
                st = SLICE_I
            else:
                ob = p_band_core(
                    yb, ub, vb,
                    jax.lax.dynamic_slice(
                        ry_pad, (16 * y0, 0), (16 * bh + 2 * PAD,
                                               w + 2 * PAD)),
                    jax.lax.dynamic_slice(
                        ru_pad, (8 * y0, 0), (8 * bh + PAD, w // 2 + PAD)),
                    jax.lax.dynamic_slice(
                        rv_pad, (8 * y0, 0), (8 * bh + PAD, w // 2 + PAD)),
                    qpb, np.int32(sad_lambda(qp)),
                    mbw=mbw, mbh=bh, me_range=self.p.me_range,
                    cqp_off=self.p.chroma_qp_offset,
                    subpel=self.p.subpel, **ekw)
                st = SLICE_P
            outs.append(ob)

        # full-frame recon + deblock from band outputs
        import jax.numpy as jnp
        full = dict(
            recon_y=jnp.concatenate([o["recon_y"] for o in outs]),
            recon_u=jnp.concatenate([o["recon_u"] for o in outs]),
            recon_v=jnp.concatenate([o["recon_v"] for o in outs]),
            mb_class=jnp.concatenate([o["mb_class"] for o in outs]),
            luma_nnz=jnp.concatenate([o["luma_nnz"] for o in outs]),
            cbp_luma=jnp.concatenate([o["cbp_luma"] for o in outs]),
            cbp_chroma=jnp.concatenate([o["cbp_chroma"] for o in outs]),
            qp_mb=jnp.concatenate([o["qp_mb"] for o in outs]),
        )
        full["mv"] = (jnp.concatenate([o["mv"] for o in outs])
                      if ref is not None else
                      jnp.zeros((mbw * mbh, 2), jnp.int32))
        recon = self._deblock_device(full, qp, mbw, mbh)

        job = dict(sliced=True, outs=outs, starts=starts, heights=heights,
                   slice_type=st, idr=idr, qp=qp, mbw=mbw, mbh=mbh,
                   n_words=n_words, qp_arr=qp_arr, ladder=ladder,
                   planes=(yd, ud, vd), w=w,
                   refpads=(None if ref is None
                            else (ry_pad, ru_pad, rv_pad)),
                   frame_num=self.frame_num, idr_pic_id=self.idr_pic_id,
                   ftype=ftype)
        new = ReconFrame(*recon, frame_num=self.frame_num)
        self.dpb = [new]
        self.last_recon = new
        if idr:
            self.idr_pic_id = (self.idr_pic_id + 1) % 65536
        self.frame_num = (self.frame_num + 1) % (
            1 << self.sps.log2_max_frame_num)
        self.frame_idx += 1
        return job

    _mesh_cache = None

    def _sliced_mesh_step(self, nsl: int, mbw: int, mbh_per_band: int,
                          n_words: int):
        """Cached shard_map band step over an nsl-device mesh."""
        if self._mesh_cache is None:
            self._mesh_cache = {}
        key = (nsl, mbw, mbh_per_band, n_words, self.p.subpel,
               self.p.me_range)
        if key not in self._mesh_cache:
            from x264_tpu.parallel.sliced import (build_sliced_p_step,
                                                  make_band_mesh)
            mesh = make_band_mesh(nsl)
            step, _ = build_sliced_p_step(
                mesh, mbw=mbw, mbh_per_band=mbh_per_band,
                me_range=self.p.me_range,
                cqp_off=self.p.chroma_qp_offset,
                n_words=n_words, subpel=self.p.subpel)
            self._mesh_cache[key] = step
        return self._mesh_cache[key]

    def _rerun_band(self, job: dict, b: int, n_words: int) -> dict:
        """Re-run one slice band at a larger entropy word budget (recon
        is budget-independent; only the packed blob changes)."""
        import jax
        from x264_tpu.models.inter_device import p_band_core
        from x264_tpu.models.inter_frame import PAD, me_lambda, sad_lambda
        from x264_tpu.models.intra_device import i_frame_core

        yd, ud, vd = job["planes"]
        y0, bh = int(job["starts"][b]), job["heights"][b]
        w, mbw = job["w"], job["mbw"]
        yb = yd[16 * y0:16 * (y0 + bh)]
        ub = ud[8 * y0:8 * (y0 + bh)]
        vb = vd[8 * y0:8 * (y0 + bh)]
        qpb = job["qp_arr"][y0 * mbw:(y0 + bh) * mbw]
        ekw = (dict(entropy="cabac", lv_cap=n_words)
               if self.p.cabac else dict(n_words=n_words))
        if job["refpads"] is None:
            return i_frame_core(yb, ub, vb, qpb, mbw=mbw, mbh=bh,
                                cqp_off=self.p.chroma_qp_offset, **ekw)
        ry_pad, ru_pad, rv_pad = job["refpads"]
        return p_band_core(
            yb, ub, vb,
            jax.lax.dynamic_slice(
                ry_pad, (16 * y0, 0), (16 * bh + 2 * PAD, w + 2 * PAD)),
            jax.lax.dynamic_slice(
                ru_pad, (8 * y0, 0), (8 * bh + PAD, w // 2 + PAD)),
            jax.lax.dynamic_slice(
                rv_pad, (8 * y0, 0), (8 * bh + PAD, w // 2 + PAD)),
            qpb, np.int32(sad_lambda(job["qp"])),
            mbw=mbw, mbh=bh, me_range=self.p.me_range,
            cqp_off=self.p.chroma_qp_offset,
            subpel=self.p.subpel, **ekw)

    def _finalize_device_sliced(self, job: dict) -> bytes:
        from x264_tpu.bitstream.slice_assemble import (
            append_payload,
            merge_mb_strings,
        )
        from x264_tpu.models.syntax import MB_PSKIP

        mbw = job["mbw"]
        out_bytes = b""
        if job["ftype"] == "IDR" and self.p.repeat_headers:
            out_bytes += self.headers()
        out_bytes += self._hrd_sei(job["idr"], job.get("poc_lsb", 0))
        cab = self.p.cabac
        total_cost = 0
        classes = []
        for b, ob in enumerate(job["outs"]):
            n_words = job["n_words"]
            nmb_band = job["heights"][b] * mbw
            blob = np.asarray(ob["host_blob"])

            def _over(blob, n_words):
                if cab:
                    rows = self._cab_rows(blob, nmb_band)
                    return int(rows[:, 14 + 8].astype(np.int64).sum()) \
                        > nmb_band * n_words
                return int(blob[:, n_words].max(initial=0)) > 32 * n_words

            if _over(blob, n_words):
                # per-band budget overflow: re-run this band's entropy
                # at the next ladder rungs (the sliced analog of
                # _finalize_device's re-encode, encoder.c:2893 pattern)
                for n_words in job["ladder"][1:]:
                    ob = self._rerun_band(job, b, n_words)
                    blob = np.asarray(ob["host_blob"])
                    if not _over(blob, n_words):
                        break
                else:
                    raise RuntimeError(
                        "sliced entropy overflow beyond the largest budget")
            first_mb = int(job["starts"][b]) * mbw
            nmb = job["heights"][b] * mbw
            bh = job["heights"][b]
            qpb = job["qp_arr"][first_mb:first_mb + nmb]
            slice_qp = int(np.atleast_1d(qpb)[0])
            if cab:
                rows = self._cab_rows(blob, nmb_band)
                mb_class = rows[:, 14]
                total_cost += int(rows[:, 14 + 9].astype(np.int64).sum())
            else:
                nbits = blob[:, n_words]
                words = np.ascontiguousarray(
                    blob[:, :n_words]).view(np.uint32)
                mb_class = blob[:, n_words + 1]
                total_cost += int(blob[:, n_words + 2]
                                  .astype(np.int64).sum())
            classes.append(mb_class)
            bs = BitWriter()
            write_slice_header(bs, self.p, self.sps,
                           init_qp=self._init_qp,
                               slice_type=job["slice_type"],
                               idr=job["idr"],
                               frame_num=job["frame_num"],
                               idr_pic_id=job["idr_pic_id"],
                               first_mb=first_mb, qp=slice_qp, num_ref=1)
            if cab:
                from x264_tpu.bitstream.cabac_host import \
                    write_slice_cabac_packed
                pad = (-bs.bit_length) % 8
                if pad:
                    bs.put(pad, (1 << pad) - 1)  # cabac_alignment_one_bit
                kind = 0 if job["slice_type"] == SLICE_I else 1
                payload = write_slice_cabac_packed(
                    blob, mbw, bh, kind, slice_qp, n_words,
                    t8_mode=self.p.transform_8x8)
                out_bytes += wrap_slice_nal(
                    bs.to_bytes_aligned() + payload, job["idr"])
            else:
                payload, total = merge_mb_strings(words, nbits)
                append_payload(bs, payload, total)
                if job["slice_type"] == SLICE_P:
                    coded = mb_class != MB_PSKIP
                    trailing = int(nmb - 1 - (np.nonzero(coded)[0][-1]
                                              if coded.any() else -1))
                    if trailing:
                        bs.ue(trailing)
                out_bytes += wrap_slice_nal(bs.to_rbsp(), job["idr"])
        self.stats.append(FrameStats(job["ftype"], len(out_bytes) * 8,
                                     job["qp"]))
        self.rc.update(job["ftype"], len(out_bytes) * 8, total_cost)
        self._record_stats(job["ftype"], job["qp"], len(out_bytes) * 8,
                           total_cost, np.concatenate(classes))
        self._note_au(len(out_bytes), job["ftype"], job.get("poc_lsb", 0))
        return out_bytes

    def _submit_device(self, y, u, v, ftype: str, qp: int) -> dict:
        import jax
        if self.p.slices > 1:
            return self._submit_device_sliced(y, u, v, ftype, qp)

        h, w = y.shape
        mbw, mbh = w // 16, h // 16
        idr = ftype == "IDR"
        ladder = self._ladder(qp)
        n_words = ladder[0]

        buf = np.empty((h + h // 2, w), np.uint8)
        buf[:h] = y
        buf[h:, :w // 2] = u
        buf[h:, w // 2:] = v
        d = jax.device_put(buf)
        yd, ud, vd = d[:h], d[h:, :w // 2], d[h:, w // 2:]

        if self.p.aq_mode:
            qp_arr = self._aq_qp(qp, y, u, v, mbw, mbh)
            slice_qp = int(qp_arr[0])
        else:
            qp_arr = np.int32(qp)
            slice_qp = qp
        if self._mbt_off is not None:
            base = np.broadcast_to(np.atleast_1d(qp_arr),
                                   (mbw * mbh,)).astype(np.float64)
            qp_arr = np.clip(np.round(base + self._mbt_off),
                             self.p.qp_min, self.p.qp_max).astype(np.int32)
            slice_qp = int(qp_arr[0])

        ref = None if (idr or not self.dpb) else self.dpb
        pir = None
        pir_sei = b""
        if self.p.intra_refresh:
            ncols, col, bound, pir_sei = self._pir_args(idr or ref is None)
            if ncols:
                pir = (ncols, col, bound)
        wts = weights = None
        if self.p.weightp and ref is not None:
            # weight analysis from SOURCE frames (models/weightp.py) —
            # host-only, so the decision costs no device round-trip
            from x264_tpu.models.weightp import analyse_weights
            weights = analyse_weights(y, self._src_hist[:len(ref)])
            wts = jax.numpy.asarray(np.asarray(weights, np.int32))
        out, slice_type = self._run_core(yd, ud, vd, ref, idr, qp, qp_arr,
                                         n_words, mbw, mbh, wts=wts,
                                         pir=pir)
        blob = None
        if (ref is not None and self.p.scenecut_threshold > 0
                and not self.p.intra_refresh
                and self.p.bframes == 0
                and self.frame_idx - self._last_idr_idx
                >= self.p.keyint_min
                and self._pending is None):
            # post-encode promote (bframes=0 only: it resets frame_num
            # without the B path's POC bookkeeping; B GOPs use the
            # lowres PRE-encode cut in _encode_bgop instead)
            # scenecut (x264 slicetype.c:1430 rule, no-lookahead variant):
            # the P cost is already computed; promote to IDR if inter
            # prediction is no cheaper than intra
            blob = np.asarray(out["host_blob"])
            if self._cabac_fast():
                rows = self._cab_rows(blob, mbw * mbh, parts=self.p.p8x8)
                p_cost = float(rows[:, 14 + 9].astype(np.int64).sum())
                i_cost = float(rows[:, 14 + 10].astype(np.int64).sum())
            else:
                p_cost = float(blob[:, n_words + 2].astype(np.int64).sum())
                i_cost = float(blob[:, n_words + 3].astype(np.int64).sum())
            bias = self.p.scenecut_threshold / 100.0
            if p_cost >= (1.0 - bias) * i_cost:
                idr = True
                ftype = "IDR"
                self.frame_num = 0
                self._last_idr_idx = self.frame_idx
                qp = self._requantize_idr(qp)
                if self.p.aq_mode:
                    qp_arr = self._aq_qp(qp, y, u, v, mbw, mbh)
                    slice_qp = int(qp_arr[0])
                else:
                    qp_arr = np.int32(qp)
                    slice_qp = qp
                out, slice_type = self._run_core(yd, ud, vd, None, True, qp,
                                                 qp_arr, n_words, mbw, mbh)
                blob = None
        recon = self._deblock_device(out, qp, mbw, mbh)
        try:
            out["host_blob"].copy_to_host_async()
        except Exception:
            pass
        job = dict(out=out, slice_type=slice_type, idr=idr, qp=qp,
                   blob=blob, num_ref=1 if ref is None else len(ref),
                   qp_arr=qp_arr, slice_qp=slice_qp,
                   mbw=mbw, mbh=mbh, n_words=n_words, ladder=ladder,
                   frame_num=self.frame_num, idr_pic_id=self.idr_pic_id,
                   ftype=ftype, planes=(yd, ud, vd), ref=ref,
                   wts=None if idr else wts, pir=pir, pir_sei=pir_sei,
                   weights=None if idr else weights)
        # advance encoder state now so the next submit can chain on device
        # (dpb is list0 order: most recent first; sliding window)
        new = ReconFrame(*recon, frame_num=self.frame_num)
        job["rec"] = new
        self.dpb = ([new] + ([] if idr else self.dpb))[:self.p.ref_frames]
        if self.p.weightp:
            self._src_hist = ([y] + ([] if idr else self._src_hist)
                              )[:self.p.ref_frames]
        self.last_recon = new
        if idr:
            self.idr_pic_id = (self.idr_pic_id + 1) % 65536
        self.frame_num = (self.frame_num + 1) % (
            1 << self.sps.log2_max_frame_num)
        self.frame_idx += 1
        return job

    def _vbv_retry_qp(self, job: dict, nbytes: int):
        """Frame-grain VBV hard guarantee: if the coded frame would
        underflow the decoder buffer, return a bumped QP to re-encode at
        (the batched analog of x264's row-VBV rollback + re-encode,
        ratecontrol.c:1590 x264_ratecontrol_mb + encoder.c:2770 bs_bak;
        our rollback unit is the frame, the mechanism is the same
        re-encode ladder the entropy overflow path uses)."""
        rc = self.rc
        if not rc.vbv_on or job.get("vbv_tries", 0) >= 8:
            return None
        # NOTE: the hard guarantee is wired into the single-slice anchor
        # finalizers only; sliced (_finalize_device_sliced) and B
        # (_finalize_b) frames rely on the soft clip_qscale bound —
        # x264's row-VBV covers those, ours is tracked in STATUS.md.
        budget = min(rc.vbv_fill + rc.vbv_max / rc.fps, rc.vbv_size)
        if nbytes * 8 <= max(budget, 1.0):
            return None
        d = max(1, int(np.ceil(6.0 * np.log2(
            nbytes * 8.0 / max(budget, 1.0)))))
        nq = int(np.clip(job["qp"] + d, self.p.qp_min, self.p.qp_max))
        return nq if nq > job["qp"] else None

    def _vbv_reencode(self, job: dict, nq: int) -> dict:
        """Re-run the frame core at the bumped QP and rewrite the DPB
        recon IN PLACE (the job's ReconFrame is the same object the DPB
        holds; no later frame has been submitted against it yet — the
        GOP queue drains before new submits when VBV is on)."""
        import jax.numpy as jnp
        dq = nq - job["qp"]
        qp_arr = np.clip(np.asarray(job["qp_arr"]) + dq,
                         self.p.qp_min, self.p.qp_max).astype(np.int32)
        if np.ndim(qp_arr) == 0:
            qp_arr = np.int32(qp_arr)
        yd, ud, vd = job["planes"]
        out, _ = self._run_core(yd, ud, vd, job["ref"], job["idr"], nq,
                                qp_arr, job["n_words"], job["mbw"],
                                job["mbh"], wts=job.get("wts"),
                                pir=job.get("pir"))
        job = dict(job, qp=nq, slice_qp=int(np.atleast_1d(qp_arr)[0]),
                   qp_arr=qp_arr, out=out, blob=None,
                   vbv_tries=job.get("vbv_tries", 0) + 1)
        recon = self._deblock_device(out, nq, job["mbw"], job["mbh"])
        rec = job.get("rec")
        if rec is not None:
            rec.y, rec.u, rec.v = recon
            n = job["mbw"] * job["mbh"]
            if "mv8" in out:
                rec.col_mv = out["mv8"]
                rec.col_intra = out["mb_class"] == 0
                rec.col_ref = out.get("ref8")
            elif "mv" in out:
                rec.col_mv = jnp.broadcast_to(
                    out["mv"][:, None], (out["mv"].shape[0], 4, 2))
                rec.col_intra = out["mb_class"] == 0
                r = out.get("ref_mb")
                rec.col_ref = (None if r is None else jnp.broadcast_to(
                    r[:, None], (n, 4)))
        self.last_recon = rec if rec is not None else self.last_recon
        return job

    def _finalize_device(self, job: dict) -> bytes:
        if job.get("sliced"):
            return self._finalize_device_sliced(job)
        from x264_tpu.bitstream.slice_assemble import (
            append_payload,
            merge_mb_strings,
        )
        from x264_tpu.models.syntax import MB_PSKIP

        n_words = job["n_words"]
        blob = job.get("blob")
        if blob is None:
            blob = np.asarray(job["out"]["host_blob"])
        if self._cabac_fast():
            return self._finalize_cabac(job, blob)
        nbits = blob[:, n_words]
        if int(nbits.max(initial=0)) > 32 * n_words:
            # CAVLC word-budget overflow: re-run entropy at a bigger budget
            # (reference encoder/encoder.c:2893 re-encode pattern)
            yd, ud, vd = job["planes"]
            for n_words in job["ladder"][1:]:
                out, _ = self._run_core(yd, ud, vd, job["ref"], job["idr"],
                                        job["qp"], job["qp_arr"], n_words,
                                        job["mbw"], job["mbh"],
                                        wts=job.get("wts"),
                                        pir=job.get("pir"))
                blob = np.asarray(out["host_blob"])
                nbits = blob[:, n_words]
                if int(nbits.max(initial=0)) <= 32 * n_words:
                    break

        n = job["mbw"] * job["mbh"]
        self._note_budget(False, -(-int(nbits.max(initial=0)) // 32))
        words = np.ascontiguousarray(blob[:, :n_words]).view(np.uint32)
        mb_class = blob[:, n_words + 1]

        out_bytes = b""
        if job["ftype"] == "IDR" and self.p.repeat_headers:
            out_bytes += self.headers()
        out_bytes += job.get("pir_sei", b"")
        out_bytes += self._hrd_sei(job["idr"], job.get("poc_lsb", 0))
        bs = BitWriter()
        write_slice_header(bs, self.p, self.sps,
                           init_qp=self._init_qp,
                           slice_type=job["slice_type"], idr=job["idr"],
                           frame_num=job["frame_num"],
                           idr_pic_id=job["idr_pic_id"], qp=job["slice_qp"],
                           num_ref=job.get("num_ref", 1),
                           poc_lsb=job.get("poc_lsb", 0),
                           weights=job.get("weights"))
        payload, total = merge_mb_strings(words, nbits)
        append_payload(bs, payload, total)
        if job["slice_type"] == SLICE_P:
            coded = mb_class != MB_PSKIP
            trailing = int(n - 1 - (np.nonzero(coded)[0][-1]
                                    if coded.any() else -1))
            if trailing:
                bs.ue(trailing)
        out_bytes += wrap_slice_nal(bs.to_rbsp(), job["idr"])
        nq = self._vbv_retry_qp(job, len(out_bytes))
        if nq is not None:
            return self._finalize_device(self._vbv_reencode(job, nq))
        self.stats.append(FrameStats(job["ftype"], len(out_bytes) * 8,
                                     job["qp"]))
        cost = int(blob[:, n_words + 2].astype(np.int64).sum())
        self.rc.update(job["ftype"], len(out_bytes) * 8, cost)
        self._record_stats(job["ftype"], job["qp"], len(out_bytes) * 8,
                           cost, mb_class)
        self._note_au(len(out_bytes), job["ftype"], job.get("poc_lsb", 0))
        return out_bytes

    def _finalize_cabac(self, job: dict, blob: np.ndarray) -> bytes:
        """Fast-path CABAC finalization: the compact device blob
        (ops/device/entropy_pack.py) goes straight to the native C coder
        (native/cabac.c encode_slice_cabac_packed)."""
        from x264_tpu.bitstream.cabac_host import write_slice_cabac_packed

        K = job["n_words"]
        n = job["mbw"] * job["mbh"]
        parts = self.p.p8x8 and job["slice_type"] == SLICE_P
        i4 = self.p.i4x4 and job["slice_type"] == SLICE_I
        rows = self._cab_rows(blob, n, parts=parts, i4=i4)
        total = int(rows[:, 14 + 8].astype(np.int64).sum())
        if total > n * K:
            # frame-level stream overflow: re-run at the next capacity
            yd, ud, vd = job["planes"]
            for K in job["ladder"][1:]:
                job["n_words"] = K
                out, _ = self._run_core(yd, ud, vd, job["ref"], job["idr"],
                                        job["qp"], job["qp_arr"], K,
                                        job["mbw"], job["mbh"],
                                        wts=job.get("wts"),
                                        pir=job.get("pir"))
                blob = np.asarray(out["host_blob"])
                rows = self._cab_rows(blob, n, parts=parts, i4=i4)
                total = int(rows[:, 14 + 8].astype(np.int64).sum())
                if total <= n * K:
                    break
        self._note_budget(True, -(-total // n))
        mb_class = rows[:, 14]

        out_bytes = b""
        if job["ftype"] == "IDR" and self.p.repeat_headers:
            out_bytes += self.headers()
        out_bytes += job.get("pir_sei", b"")
        out_bytes += self._hrd_sei(job["idr"], job.get("poc_lsb", 0))
        bs = BitWriter()
        write_slice_header(bs, self.p, self.sps,
                           init_qp=self._init_qp,
                           slice_type=job["slice_type"], idr=job["idr"],
                           frame_num=job["frame_num"],
                           idr_pic_id=job["idr_pic_id"], qp=job["slice_qp"],
                           num_ref=job.get("num_ref", 1),
                           poc_lsb=job.get("poc_lsb", 0),
                           weights=job.get("weights"))
        pad = (-bs.bit_length) % 8
        if pad:
            bs.put(pad, (1 << pad) - 1)    # cabac_alignment_one_bit
        kind = 0 if job["slice_type"] == SLICE_I else 1
        payload, states = write_slice_cabac_packed(
            blob, job["mbw"], job["mbh"], kind, job["slice_qp"], K,
            t8_mode=self.p.transform_8x8,
            num_ref=job.get("num_ref", 1) if kind == 1 else 1,
            parts=parts, i4=i4, want_states=True)
        if self._cab_states is None:
            self._cab_states = {}
        self._cab_states["I" if kind == 0 else "P"] = states
        out_bytes += wrap_slice_nal(bs.to_bytes_aligned() + payload,
                                    job["idr"])
        nq = self._vbv_retry_qp(job, len(out_bytes))
        if nq is not None:
            jb = self._vbv_reencode(job, nq)
            return self._finalize_cabac(
                jb, np.asarray(jb["out"]["host_blob"]))
        cost = int(rows[:, 14 + 9].astype(np.int64).sum())
        self.stats.append(FrameStats(job["ftype"], len(out_bytes) * 8,
                                     job["qp"]))
        self.rc.update(job["ftype"], len(out_bytes) * 8, cost)
        self._record_stats(job["ftype"], job["qp"], len(out_bytes) * 8,
                           cost, mb_class)
        self._note_au(len(out_bytes), job["ftype"], job.get("poc_lsb", 0))
        return out_bytes

    # ---- B-frame mini-GOP orchestration (IbbP, temporal direct) --------
    _bq: list = None          # pending (frame, display_idx)
    _disp_idx = 0
    _idr_disp = 0

    def _poc_lsb(self, disp: int) -> int:
        """UNWRAPPED POC 2*(disp - idr_disp).  The reference keeps full
        i_poc internally (encoder.c:3512) and masks only when writing
        pic_order_cnt_lsb (encoder.c:241) — write_slice_header masks.
        Temporal-direct tb/td must use the unwrapped values or the
        dist_scale_factor diverges from the decoder mid-GOP (8.4.1.2.3)."""
        return 2 * (disp - self._idr_disp)

    def _encode_bgop(self, fr: Frame420) -> bytes:
        if self._bq is None:
            self._bq = []
        d = self._disp_idx
        self._disp_idx += 1
        out = b""
        f_type = self._force.get(d, (None, None))[0] if self._force \
            else None
        if f_type is None and d > 0 and self._lowres_scenecut(fr, d):
            # pre-encode scenecut (slicetype.c:1430 lowres rule): cut
            # BEFORE encoding instead of the bframes=0 path's
            # encode-then-promote
            f_type = "IDR"
        if d == 0 or f_type == "IDR" or (self.p.keyint_max > 0
                      and d % self.p.keyint_max == 0):
            out += self._flush_rest()     # close the open mini-GOP
            # (NOT self.flush(): when fed from the MB-tree lookahead
            # queue, flush() would pull FUTURE display frames ahead)
            self._idr_disp = d
            out += self._encode_anchor(fr, d, "IDR")
            if self.p.b_adapt:
                self._lookahead().push_anchor(self._pad(fr)[0])
            return out
        self._bq.append((fr, d))
        if f_type == "P":
            out += self._flush_bq()
            return out
        if len(self._bq) == self.p.bframes + 1:
            if self.p.b_adapt:
                # adaptive mini-GOP cut (slicetype b_adapt=1 analog):
                # lowres costs pick how many queued frames stay B
                m = self._lookahead().plan(
                    [self._pad(f)[0] for (f, _) in self._bq])
                split = min(m + 1, len(self._bq))
                pend, self._bq = self._bq[:split], self._bq[split:]
                out += self._flush_bq(pend)
            else:
                out += self._flush_bq()
        return out

    _sc_prev_lr = None

    def _lowres_scenecut(self, fr, d: int) -> bool:
        """Lowres inter-vs-intra scene test on the SOURCE frames — one
        small jit call per input frame (x264 lookahead scenecut,
        slicetype.c:1430).  Only used for the bframes>0 path; bframes=0
        reuses the full-res costs its core already computes."""
        if not self.p.scenecut_threshold:
            return False
        import jax.numpy as jnp
        from x264_tpu.models.inter_frame import intra_cost_estimate, \
            sad_lambda
        from x264_tpu.models.lookahead import lowres_plane
        from x264_tpu.ops.device.me import full_search_16x16
        y, _, _ = self._pad(fr)
        lr = lowres_plane(jnp.asarray(y))
        prev = self._sc_prev_lr
        self._sc_prev_lr = lr
        if prev is None:
            return False
        lrn = np.asarray(lr)
        mbw_lr, mbh_lr = lrn.shape[1] // 16, lrn.shape[0] // 16
        if mbw_lr < 1 or mbh_lr < 1:
            return False
        if d - self._idr_disp < max(1, self.p.keyint_min):
            return False
        _, pc = full_search_16x16(lr, jnp.pad(prev, 32, mode="edge"),
                                  np.int32(sad_lambda(24)), me_range=8,
                                  mbw=mbw_lr, mbh=mbh_lr)
        p_cost = float(np.asarray(pc).astype(np.int64).sum())
        i_cost = float(intra_cost_estimate(lrn, mbw_lr, mbh_lr)
                       .astype(np.int64).sum())
        bias = self.p.scenecut_threshold / 100.0
        return p_cost >= (1.0 - bias) * i_cost

    _la = None

    def _lookahead(self):
        if self._la is None:
            from x264_tpu.models.lookahead import Lookahead
            self._la = Lookahead(self.p)
        return self._la

    # deferred mini-GOP finalize queue: [("a"|"b", job), ...] — the
    # cross-GOP analog of x264's frame threads (encoder/encoder.c:3337
    # thread-context rotation): GOP k's device compute runs while the
    # host finalizes GOP k-1's entropy/transfers.  Bytes come out one
    # mini-GOP late; flush()/IDR boundaries drain.
    _gop_q: list = None

    def _drain_gop_q(self) -> bytes:
        out = b""
        for kind, job in (self._gop_q or []):
            out += (self._finalize_device(job) if kind == "a"
                    else self._finalize_b(job))
        self._gop_q = []
        return out

    def _flush_bq(self, pend=None) -> bytes:
        if pend is None:
            pend, self._bq = self._bq, []
        if not pend:
            return b""
        anchor, ad = pend[-1]
        prev = self.dpb[0]
        if self._syn_path():
            out = self._encode_anchor(anchor, ad, "P")
            if self.p.b_adapt:
                self._lookahead().push_anchor(self._pad(anchor)[0])
            nxt = self.dpb[0]
            jobs = [self._submit_b(bf, bd, prev, nxt)
                    for (bf, bd) in pend[:-1]]
            for j in jobs:
                out += self._finalize_b(j)
            return out
        # device fast path: submit the WHOLE mini-GOP (anchor + every B),
        # then finalize only the PREVIOUS mini-GOP — the new GOP's device
        # compute overlaps this GOP's host entropy + transfers (x264's
        # frame-threads overlap, encoder/encoder.c:3337, as async
        # dispatch + a one-GOP finalize delay)
        out = b""
        if self.rc.vbv_on:
            # VBV re-encode may rewrite a finalized frame's recon in
            # place, so nothing may be submitted against a frame that
            # hasn't cleared its VBV check yet: drain the queue, then
            # finalize the NEW anchor (incl. any retry) before the GOP's
            # B frames capture its arrays, and finalize the Bs eagerly
            # (overlap yields to buffer correctness, like x264's
            # threads+VBV sync)
            out += self._drain_gop_q()
            prev = self.dpb[0]
            ajob = self._submit_anchor(anchor, ad, "P")
            if self.p.b_adapt:
                self._lookahead().push_anchor(self._pad(anchor)[0])
            out += self._finalize_device(ajob)
            nxt = self.dpb[0]
            for (bf, bd) in pend[:-1]:
                out += self._finalize_b(self._submit_b(bf, bd, prev, nxt))
            return out
        ajob = self._submit_anchor(anchor, ad, "P")
        if self.p.b_adapt:
            self._lookahead().push_anchor(self._pad(anchor)[0])
        nxt = self.dpb[0]
        bs = pend[:-1]
        if len(bs) == 2 and self._cabac_fast():
            # both Bs of the mini-GOP in one program (b_pair_core)
            jobs = self._submit_b_pair(bs[0], bs[1], prev, nxt)
        else:
            jobs = [self._submit_b(bf, bd, prev, nxt) for (bf, bd) in bs]
        out += self._drain_gop_q()
        self._gop_q = [("a", ajob)] + [("b", j) for j in jobs]
        return out

    def _encode_bframe(self, fr, disp, prev, nxt) -> bytes:
        return self._finalize_b(self._submit_b(fr, disp, prev, nxt))

    def _encode_anchor(self, fr: Frame420, disp: int, ftype: str) -> bytes:
        import jax.numpy as jnp

        if self._syn_path():
            y, u, v = self._pad(fr)
            if ftype == "IDR":
                self.frame_num = 0
            qp = self._qp_for_frame(ftype)
            out_bytes = b""
            if ftype == "IDR" and self.p.repeat_headers:
                out_bytes += self.headers()
            out_bytes += self._hrd_sei(ftype == "IDR",
                                       self._poc_lsb(disp))
            out_bytes += self._encode_frame_syn(
                y, u, v, ftype, qp, poc_lsb=self._poc_lsb(disp))
            rec = self.dpb[0]
            rec.poc = self._poc_lsb(disp)
            self._note_recon(disp, rec)
            syn = self._last_syn
            rec.col_mv = jnp.broadcast_to(
                jnp.asarray(syn.mv.astype(np.int32))[:, None],
                (syn.mv.shape[0], 4, 2))
            rec.col_intra = jnp.asarray(syn.mb_class == 0)
            rec.col_ref = (None if syn.ref is None else jnp.broadcast_to(
                jnp.asarray(syn.ref.astype(np.int32))[:, None],
                (syn.mv.shape[0], 4)))
            self._note_au(len(out_bytes), ftype, self._poc_lsb(disp))
            return out_bytes
        return self._finalize_device(self._submit_anchor(fr, disp, ftype))

    def _submit_anchor(self, fr: Frame420, disp: int, ftype: str) -> dict:
        """Device fast path: enqueue an anchor frame's device work and
        advance the DPB (incl. the colocated motion field for temporal
        direct); the caller finalizes with _finalize_device."""
        import jax.numpy as jnp

        y, u, v = self._pad(fr)
        if ftype == "IDR":
            self.frame_num = 0
        qp = self._zone_qp(disp, self._qp_for_frame(ftype))
        f_qp = self._forced_for(disp)[1]
        if f_qp is not None:
            qp = int(np.clip(f_qp, self.p.qp_min, self.p.qp_max))
        self._mbt_off = (self._mbt_off_by_disp or {}).pop(disp, None)
        try:
            job = self._submit_device(y, u, v, ftype, qp)
        finally:
            self._mbt_off = None
        job["poc_lsb"] = self._poc_lsb(disp)
        out = job["out"]
        rec = self.dpb[0]
        self._note_recon(disp, rec)
        rec.poc = self._poc_lsb(disp)
        n = job["mbw"] * job["mbh"]
        if "mv8" in out:
            # quadrant-grain anchor motion (partitions): temporal direct
            # derives per-quad (direct_8x8_inference corner rule)
            rec.col_mv = out["mv8"]
            rec.col_intra = out["mb_class"] == 0
            rec.col_ref = out.get("ref8")
        elif "mv" in out:
            rec.col_mv = jnp.broadcast_to(
                out["mv"][:, None], (out["mv"].shape[0], 4, 2))
            rec.col_intra = out["mb_class"] == 0
            r = out.get("ref_mb")
            rec.col_ref = (None if r is None else
                           jnp.broadcast_to(r[:, None], (n, 4)))
        else:
            rec.col_mv = jnp.zeros((n, 4, 2), jnp.int32)
            rec.col_intra = jnp.ones(n, bool)
            rec.col_ref = None
        return job

    def _submit_b(self, fr: Frame420, disp: int,
                  prev: "ReconFrame", nxt: "ReconFrame") -> dict:
        import jax

        from x264_tpu.models.b_frame_device import b_frame_core
        from x264_tpu.models.inter_frame import me_lambda, sad_lambda

        y, u, v = self._pad(fr)
        h, w = y.shape
        mbw, mbh = w // 16, h // 16
        n = mbw * mbh
        qp = self._zone_qp(disp, self._qp_for_frame("B"))
        f_qp = self._forced_for(disp)[1]
        if f_qp is not None:
            qp = int(np.clip(f_qp, self.p.qp_min, self.p.qp_max))
        # MB-tree offsets apply to anchors only (policy: non-ref B MBs
        # are never propagated into; their window gain rides PB_OFFSET).
        # Pop the stale entry so the per-disp map can't grow unbounded.
        if self._mbt_off_by_disp:
            self._mbt_off_by_disp.pop(disp, None)
        ladder = self._ladder(qp)

        poc_cur = self._poc_lsb(disp)
        tb = int(np.clip(poc_cur - prev.poc, -128, 127))
        td = int(np.clip(nxt.poc - prev.poc, -128, 127))
        if td == 0:
            td = 1
        tx = (16384 + abs(td) // 2) // td
        dsf = int(np.clip((tb * tx + 32) >> 6, -1024, 1023))

        buf = np.empty((h + h // 2, w), np.uint8)
        buf[:h] = y
        buf[h:, :w // 2] = u
        buf[h:, w // 2:] = v
        dsrc = jax.device_put(buf)
        yd, ud, vd = dsrc[:h], dsrc[h:, :w // 2], dsrc[h:, w // 2:]

        n_words = ladder[0]
        ekw = (dict(entropy="cabac", lv_cap=n_words) if self._cabac_fast()
               else dict(n_words=n_words))
        out = b_frame_core(
            yd, ud, vd, prev.y, prev.u, prev.v, nxt.y, nxt.u, nxt.v,
            nxt.col_mv, nxt.col_intra, np.int32(dsf),
            np.int32(qp), np.int32(sad_lambda(qp)),
            mbw=mbw, mbh=mbh, me_range=self.p.me_range,
            cqp_off=self.p.chroma_qp_offset,
            subpel=self.p.subpel, t8_mode=self.p.transform_8x8,
            trellis_tbl=self._trellis_tbl(qp, "B"),
            decimate=self.p.dct_decimate,
            col_ref=nxt.col_ref if self.p.ref_frames > 1 else None,
            **ekw)
        try:
            out["host_blob"].copy_to_host_async()
        except Exception:
            pass
        return dict(out=out, mbw=mbw, mbh=mbh, n=n, qp=qp, ladder=ladder,
                    n_words=n_words, poc_cur=poc_cur, disp=disp,
                    frame_num=self.frame_num,
                    args=(yd, ud, vd, prev, nxt, dsf))

    def _submit_b_pair(self, b1, b2, prev: "ReconFrame",
                       nxt: "ReconFrame") -> list:
        """Submit BOTH B frames of a mini-GOP as ONE device program
        (models/b_frame_device.b_pair_core): anchors, hpel planes and
        colocated motion are shared; the per-frame body is vmapped.
        Returns two finalize jobs (same contract as _submit_b)."""
        import jax

        from x264_tpu.models.b_frame_device import b_pair_core
        from x264_tpu.models.inter_frame import sad_lambda

        (f1, d1), (f2, d2) = b1, b2
        y1, u1, v1 = self._pad(f1)
        y2, u2, v2 = self._pad(f2)
        h, w = y1.shape
        mbw, mbh = w // 16, h // 16
        n = mbw * mbh
        qps, dsfs, pocs = [], [], []
        for d in (d1, d2):
            q = self._zone_qp(d, self._qp_for_frame("B"))
            f_qp = self._forced_for(d)[1]
            if f_qp is not None:
                q = int(np.clip(f_qp, self.p.qp_min, self.p.qp_max))
            if self._mbt_off_by_disp:
                self._mbt_off_by_disp.pop(d, None)
            poc_cur = self._poc_lsb(d)
            tb = int(np.clip(poc_cur - prev.poc, -128, 127))
            td = int(np.clip(nxt.poc - prev.poc, -128, 127))
            td = td or 1
            tx = (16384 + abs(td) // 2) // td
            dsfs.append(int(np.clip((tb * tx + 32) >> 6, -1024, 1023)))
            qps.append(q)
            pocs.append(poc_cur)
        qp = qps[0]
        ladder = self._ladder(qp)
        n_words = ladder[0]

        buf = np.empty((2, h + h // 2, w), np.uint8)
        for i, (yy, uu, vv) in enumerate(((y1, u1, v1), (y2, u2, v2))):
            buf[i, :h] = yy
            buf[i, h:, :w // 2] = uu
            buf[i, h:, w // 2:] = vv
        d2d = jax.device_put(buf)
        y2d, u2d, v2d = d2d[:, :h], d2d[:, h:, :w // 2], d2d[:, h:, w // 2:]

        pair = b_pair_core(
            y2d, u2d, v2d, prev.y, prev.u, prev.v, nxt.y, nxt.u, nxt.v,
            nxt.col_mv, nxt.col_intra,
            np.asarray(dsfs, np.int32), np.asarray(qps, np.int32),
            np.int32(sad_lambda(qp)),
            mbw=mbw, mbh=mbh, me_range=self.p.me_range,
            cqp_off=self.p.chroma_qp_offset,
            subpel=self.p.subpel, t8_mode=self.p.transform_8x8,
            trellis_tbl=self._trellis_tbl(qp, "B"),
            decimate=self.p.dct_decimate,
            col_ref=nxt.col_ref if self.p.ref_frames > 1 else None,
            entropy="cabac", lv_cap=n_words)
        try:
            pair["host_blob"].copy_to_host_async()
        except Exception:
            pass
        jobs = []
        for i, (d, q, dsf) in enumerate(zip((d1, d2), qps, dsfs)):
            jobs.append(dict(pair=pair, pidx=i, out=None, mbw=mbw,
                             mbh=mbh, n=n, qp=q, ladder=ladder,
                             n_words=n_words, poc_cur=pocs[i], disp=d,
                             frame_num=self.frame_num,
                             args=((y2d, u2d, v2d, i), None, None,
                                   prev, nxt, dsf)))
        return jobs

    def _finalize_b(self, job: dict) -> bytes:
        import jax.numpy as jnp

        from x264_tpu.bitstream.slice_assemble import (
            append_payload,
            merge_mb_strings,
        )
        from x264_tpu.bitstream.tables import CHROMA_QP_TABLE
        from x264_tpu.models.b_frame_device import b_frame_core
        from x264_tpu.models.inter_frame import me_lambda, sad_lambda

        from x264_tpu.ops.device.deblock import deblock_core_b

        out = job["out"]
        mbw, mbh, n, qp = job["mbw"], job["mbh"], job["n"], job["qp"]
        poc_cur = job["poc_cur"]
        n_words = job["n_words"]
        cab = self._cabac_fast()
        if job.get("pair") is not None:
            # pair-core job: ONE (2, L) blob serves both finalizes (the
            # device->host pull is cached on the jax Array by the first)
            blob = np.asarray(job["pair"]["host_blob"])[job["pidx"]]
            if out is None:
                # per-frame view of the stacked outputs — ONLY the
                # fields this finalize will touch (each slice is an
                # eagerly dispatched device op, so keep the set minimal:
                # recon planes for last_recon, plus the deblock inputs
                # when full_recon B deblocking is on)
                i = job["pidx"]
                pair = job["pair"]
                keys = ["recon_y", "recon_u", "recon_v"]
                if self.p.deblock and self.p.full_recon:
                    keys += ["mb_class", "mv0", "mv1", "any0", "any1",
                             "luma_nnz", "nnz_deblock", "t8"]
                out = {k: pair[k][i] for k in keys if k in pair}
                job["out"] = out
        else:
            blob = np.asarray(out["host_blob"])

        def _over(blob, n_words):
            if cab:
                rows = self._cab_rows(blob, n, is_b=True)
                return int(rows[:, 14 + 8].astype(np.int64).sum()) \
                    > n * n_words
            return int(blob[:, n_words].max(initial=0)) > 32 * n_words

        if _over(blob, n_words):
            yd, ud, vd, prev, nxt, dsf = job["args"]
            if isinstance(yd, tuple):      # pair job: slice this frame
                (y2d, u2d, v2d, i) = yd
                yd, ud, vd = y2d[i], u2d[i], v2d[i]
            for n_words in job["ladder"][1:]:
                ekw = (dict(entropy="cabac", lv_cap=n_words) if cab
                       else dict(n_words=n_words))
                out = b_frame_core(
                    yd, ud, vd, prev.y, prev.u, prev.v,
                    nxt.y, nxt.u, nxt.v,
                    nxt.col_mv, nxt.col_intra, np.int32(dsf),
                    np.int32(qp), np.int32(sad_lambda(qp)),
                    mbw=mbw, mbh=mbh, me_range=self.p.me_range,
                    cqp_off=self.p.chroma_qp_offset,
                    subpel=self.p.subpel,
                    t8_mode=self.p.transform_8x8,
                    trellis_tbl=self._trellis_tbl(qp, "B"),
                    decimate=self.p.dct_decimate,
                    col_ref=nxt.col_ref if self.p.ref_frames > 1
                    else None, **ekw)
                blob = np.asarray(out["host_blob"])
                if not _over(blob, n_words):
                    break
        if cab:
            rows = self._cab_rows(blob, n, is_b=True)
            total = int(rows[:, 14 + 8].astype(np.int64).sum())
            self._note_budget(True, -(-total // n))
            mb_class = rows[:, 14]
            cost_total = int(rows[:, 14 + 9].astype(np.int64).sum())
        else:
            nbits = blob[:, n_words]
            self._note_budget(
                False, -(-int(nbits.max(initial=0)) // 32))
            words = np.ascontiguousarray(blob[:, :n_words]).view(np.uint32)
            mb_class = blob[:, n_words + 1]
            cost_total = int(blob[:, n_words + 2].astype(np.int64).sum())

        hrd = self._hrd_sei(False, job["poc_cur"])
        bs = BitWriter()
        write_slice_header(bs, self.p, self.sps,
                           init_qp=self._init_qp, slice_type=SLICE_B,
                           idr=False,
                           frame_num=job.get("frame_num", self.frame_num),
                           qp=qp, num_ref=1, num_ref_l1=1,
                           poc_lsb=poc_cur, is_ref=False)
        if cab:
            from x264_tpu.bitstream.cabac_host import write_slice_cabac_packed
            pad = (-bs.bit_length) % 8
            if pad:
                bs.put(pad, (1 << pad) - 1)
            payload, bst = write_slice_cabac_packed(
                blob, mbw, mbh, 2, qp, n_words,
                t8_mode=self.p.transform_8x8, want_states=True)
            if self._cab_states is None:
                self._cab_states = {}
            self._cab_states["B"] = bst
            data = hrd + wrap_slice_nal(
                bs.to_bytes_aligned() + payload, False, is_ref=False)
        else:
            payload, total = merge_mb_strings(words, nbits)
            append_payload(bs, payload, total)
            coded = mb_class != 3
            trailing = int(n - 1 - (np.nonzero(coded)[0][-1]
                                    if coded.any() else -1))
            if trailing:
                bs.ue(trailing)
            data = hrd + wrap_slice_nal(bs.to_rbsp(), False,
                                        is_ref=False)

        # deblocked recon for output/verification (B is not a reference;
        # skipped when full_recon is off — the x264 b_full_recon analog)
        ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
        if self.p.deblock and self.p.full_recon:
            from x264_tpu.ops.device.deblock import (deblock_frame_b,
                                                     deblock_impl)
            if self._qpc_tab_dev is None:
                import jax
                self._qpc_tab_dev = jax.device_put(
                    CHROMA_QP_TABLE.astype(np.int32))
            has_t8 = self.p.transform_8x8 and "t8" in out
            ry, ru, rv = deblock_frame_b(
                ry, ru, rv,
                out.get("nnz_deblock", out["luma_nnz"]),
                out["mv0"], out["mv1"],
                out["any0"], out["any1"],
                np.int32(qp),
                np.int32(self.p.deblock_alpha * 2),
                np.int32(self.p.deblock_beta * 2), mbw=mbw, mbh=mbh,
                impl=deblock_impl(), cqp_off=self.p.chroma_qp_offset,
                has_t8=has_t8, intra=out["mb_class"] == 0,
                t8=out.get("t8") if has_t8 else None,
                chroma_qp_table=self._qpc_tab_dev)
        self.last_recon = ReconFrame(ry, ru, rv)
        self._note_recon(job.get("disp"), self.last_recon)
        self.stats.append(FrameStats("B", len(data) * 8, qp))
        self.rc.update("B", len(data) * 8, cost_total)
        self._record_stats("B", qp, len(data) * 8, cost_total,
                           np.where(mb_class == 3, 3,
                                    np.where(mb_class == 0, 0, 2)))
        self._note_au(len(data), "B", poc_cur)
        return data

    def encode_pipelined(self, fr: Frame420) -> bytes:
        """Submit this frame, return the PREVIOUS frame's bytes (b"" for
        the first call).  Overlaps device compute with host finalization —
        call flush() for the last frame.  Device backend only."""
        out = b""
        if self.rc.vbv_on and self._pending is not None:
            # VBV re-encode rewrites the pending frame's DPB recon in
            # place; finalize it (incl. any retry) BEFORE this frame's
            # submit captures its reference arrays (overlap yields to
            # buffer correctness)
            out += self._finalize_device(self._pending)
            self._pending = None
        y, u, v = self._pad(fr)
        ftype = self._decide_type()
        if ftype == "IDR":
            self.frame_num = 0
        job = self._submit_device(y, u, v, ftype, self._qp_for_frame(ftype))
        prev = self._pending
        self._pending = job
        if prev is not None:
            out += self._finalize_device(prev)
        return out

    def flush(self) -> bytes:
        out = b""
        while self._mbt_q:
            out += self._pop_mbtree()
        return out + self._flush_rest()

    def _flush_rest(self) -> bytes:
        out = b""
        if self.p.bframes > 0 and self._bq:
            out += self._flush_bq()
        out += self._drain_gop_q()
        if getattr(self, "_pending", None) is not None:
            job = self._pending
            self._pending = None
            out += self._finalize_device(job)
        return out

    _pending = None

    _qpc_tab_dev = None

    def _deblock_device(self, out, qp, mbw, mbh):
        """Enqueue device deblock on the core's outputs (device-resident).
        The QP-chain/chroma-QP/bS prep is fused INTO the deblock jit
        (deblock_frame): every eager jnp op here used to be its own
        dispatched module, costing host tunnel latency per frame."""
        ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
        if not self.p.deblock:
            return ry, ru, rv
        import jax.numpy as jnp

        from x264_tpu.bitstream.tables import CHROMA_QP_TABLE
        from x264_tpu.ops.device.deblock import deblock_frame, deblock_impl
        n = mbw * mbh
        if self._qpc_tab_dev is None:
            import jax
            self._qpc_tab_dev = jax.device_put(
                CHROMA_QP_TABLE.astype(np.int32))
        has_t8 = "t8" in out and self.p.transform_8x8
        return deblock_frame(
            ry, ru, rv, out["mb_class"], out["cbp_luma"],
            out["cbp_chroma"],
            out["nnz_deblock"] if "nnz_deblock" in out else out["luma_nnz"],
            # quadrant-granular mvs/refs when partitions are active (the
            # internal-edge mv-discontinuity bS rule needs them)
            out["mv8"] if "mv8" in out
            else out["mv"] if "mv" in out else jnp.zeros((n, 2), jnp.int32),
            out["ref8"] if "mv8" in out
            else out["ref_mb"] if "ref_mb" in out
            else jnp.zeros(n, jnp.int32),
            out["qp_mb"],
            np.int32(self.p.deblock_alpha * 2),
            np.int32(self.p.deblock_beta * 2), mbw=mbw, mbh=mbh,
            impl=deblock_impl(), cqp_off=self.p.chroma_qp_offset,
            has_t8=has_t8, t8=out["t8"] if has_t8 else None,
            chroma_qp_table=self._qpc_tab_dev)

    def _pad(self, fr: Frame420):
        y = pad_to_mb(fr.y, 16)
        u = pad_to_mb(fr.u, 8)
        v = pad_to_mb(fr.v, 8)
        return y, u, v

    _enc_idx = 0       # encode-order frame counter (anchors AND B)

    def _qp_for_frame(self, ftype: str) -> int:
        """One call per encoded frame, in encode order — the pass-2 plan
        is indexed per encoded frame (incl. B), matching the stats file."""
        i = self._enc_idx
        self._enc_idx += 1
        if self._pass2_qps is not None:
            return self._pass2_qps[min(i, len(self._pass2_qps) - 1)]
        if ftype == "B":
            return self.rc.b_qp()
        return self.rc.frame_qp(ftype)

    # per-type aggregates for the close() summary
    # (x264 encoder_close stat block, encoder/encoder.c:4196)
    _agg = None

    def _record_stats(self, ftype, qp, bits, cost, mb_class):
        from x264_tpu.models.syntax import MB_I4, MB_I16, MB_PSKIP
        from x264_tpu.rc.twopass import FrameStat
        imb = int(np.isin(mb_class, (MB_I16, MB_I4)).sum())
        smb = int((mb_class == MB_PSKIP).sum())
        pmb = len(mb_class) - imb - smb
        if self._agg is None:
            self._agg = {}
        t = "I" if ftype == "IDR" else ftype
        a = self._agg.setdefault(
            t, dict(n=0, bits=0, qp=0.0, imb=0, pmb=0, smb=0))
        a["n"] += 1
        a["bits"] += bits
        a["qp"] += qp
        a["imb"] += imb
        a["pmb"] += pmb
        a["smb"] += smb
        if self.p.stats_write:
            self._twopass_stats.append(FrameStat(
                idx=len(self._twopass_stats),
                ftype="I" if ftype == "IDR" else ftype,
                qp=qp, bits=bits, cost=cost,
                imb=imb, pmb=pmb, smb=smb))

    def _frame_qp(self, ftype: str):
        """(base_qp, qp_mb array-or-scalar) for this frame: RC decision
        plus AQ offsets (x264_adaptive_quant_frame analog)."""
        base = self.rc.frame_qp(ftype)
        if not self.p.aq_mode:
            return base, base
        return base, None  # offsets need planes; filled in encode paths

    def _aq_qp(self, base: int, y, u, v, mbw: int, mbh: int):
        from x264_tpu.rc import aq_offsets
        off = aq_offsets(y, u, v, mbw, mbh, self.p.aq_strength,
                         mode=self.p.aq_mode)
        qp_mb = np.clip(base + np.round(off).astype(np.int64),
                        self.p.qp_min, self.p.qp_max).astype(np.int32)
        return qp_mb

    # scenecut may not promote within keyint_min of the last keyframe
    # (x264's min-keyint rule, slicetype.c:1438)
    _last_idr_idx = 0

    def _decide_type(self) -> str:
        if self.p.intra_refresh:
            # PIR: one IDR at stream start, then refresh bars forever
            # (encoder.c:3626; keyint boundaries restart the sweep)
            if self.frame_idx == 0:
                self._last_idr_idx = 0
                return "IDR"
            return "P"
        if self.frame_idx == 0 or (self.p.keyint_max > 0
                                   and self.frame_idx % self.p.keyint_max == 0):
            self._last_idr_idx = self.frame_idx
            return "IDR"
        return "P"

    # per-frame overrides (x264_picture_t.i_type / i_qplus1 analog):
    # display idx -> (forced ftype or None, forced qp or None)
    _force: dict = None
    _in_disp = 0

    def _forced_for(self, d: int):
        if not self._force:
            return (None, None)
        return self._force.pop(d, (None, None))

    def encode(self, fr: Frame420, frame_type: int = 0,
               qp: int | None = None) -> bytes:
        """frame_type: TYPE_AUTO/IDR/I/P/B (params enums) to force this
        frame's type; qp: force this frame's QP — the --qpfile hooks
        (reference x264.c:1801 parse_qpfile -> pic.i_type/i_qpplus1)."""
        if frame_type or qp is not None:
            from x264_tpu.params import (TYPE_B, TYPE_BREF, TYPE_I,
                                         TYPE_IDR, TYPE_P)
            tmap = {TYPE_IDR: "IDR", TYPE_I: "IDR", TYPE_P: "P",
                    TYPE_B: "B", TYPE_BREF: "B"}
            if self._force is None:
                self._force = {}
            self._force[self._in_disp] = (tmap.get(frame_type), qp)
        self._in_disp += 1
        if self._mbtree_on():
            return self._encode_mbtree(fr)
        if self.p.bframes > 0:
            return self._encode_bgop(fr)
        return self._encode_now(fr, disp=self._in_disp - 1)

    # ---- MB-tree lookahead window (unified: bframes >= 0) --------------
    _mbt_q = None
    _mbt_off_by_disp = None

    def _mbtree_on(self) -> bool:
        from x264_tpu.params import RC_CQP
        return (self.p.mbtree
                and self.p.rc_method != RC_CQP and self.p.slices <= 1
                and self._use_device())

    def _encode_mbtree(self, fr: Frame420) -> bytes:
        """Queue rc_lookahead frames; pop the head with QP offsets from
        backward cost propagation (models/mbtree.py) at 8x8 lowres grain
        (= one offset per source MB, x264's slicetype.c grain), then
        route it into the normal B-GOP / P machinery."""
        import jax.numpy as jnp

        from x264_tpu.models.lookahead import lowres_plane, lowres_stats8

        if self._mbt_q is None:
            self._mbt_q = []
        y, _, _ = self._pad(fr)
        lr = lowres_plane(jnp.asarray(y))
        mbw_lr, mbh_lr = lr.shape[1] // 16, lr.shape[0] // 16
        prev = self._mbt_q[-1]["lr"] if self._mbt_q else None
        ic, pc, mv = lowres_stats8(lr, prev, mbw_lr, mbh_lr)
        self._mbt_q.append(dict(fr=fr, lr=lr, ic=ic, pc=pc, mv=mv,
                                disp=self._in_disp - 1))
        if len(self._mbt_q) <= max(1, self.p.rc_lookahead):
            return b""
        return self._pop_mbtree()

    def _pop_mbtree(self) -> bytes:
        """Propagate over the remaining window (display-order chain:
        each frame predicted from its display predecessor — with B
        frames this is the transitive approximation of the anchor
        reference graph; amounts passing through a B flow on to the
        frames that actually get referenced) and stash the head's
        offsets keyed by display index so the deferred B-GOP submit
        picks them up when the anchor is actually encoded."""
        from x264_tpu.models import mbtree as MT

        q = self._mbt_q
        head = q.pop(0)
        lrn = np.asarray(head["lr"])
        nbw, nbh = 2 * (lrn.shape[1] // 16), 2 * (lrn.shape[0] // 16)
        if q:
            ics = [np.asarray(head["ic"])] + [np.asarray(e["ic"])
                                              for e in q]
            pcs = [None] + [np.asarray(e["pc"]) for e in q]
            mvs = [None] + [np.asarray(e["mv"]) for e in q]
            prop = MT.propagate(ics, pcs, mvs, nbw, nbh, bs=8)
            off = MT.finish(np.asarray(head["ic"]), prop)
            if self._mbt_off_by_disp is None:
                self._mbt_off_by_disp = {}
            self._mbt_off_by_disp[head["disp"]] = MT.expand_offsets8(
                off, nbw, nbh, self.p.mb_width, self.p.mb_height)
        # vbv_lookahead: post the window's per-frame lowres costs
        # (min(inter, intra), head first) to the rate controller
        win = []
        for e in [head] + q:
            icn = np.asarray(e["ic"], np.float64)
            c = icn if e["pc"] is None else np.minimum(
                np.asarray(e["pc"], np.float64), icn)
            win.append(float(c.sum()))
        self.rc.lookahead_costs = win
        if self.p.bframes > 0:
            return self._encode_bgop(head["fr"])
        self._mbt_off = (self._mbt_off_by_disp or {}).pop(
            head["disp"], None)
        try:
            return self._encode_now(head["fr"], disp=head.get("disp"))
        finally:
            self._mbt_off = None

    _mbt_off = None

    def _encode_now(self, fr: Frame420, disp: int | None = None) -> bytes:
        y, u, v = self._pad(fr)
        f_type, f_qp = (self._forced_for(disp) if disp is not None
                        else (None, None))
        if f_type in ("IDR", "P"):
            ftype = f_type
            if f_type == "IDR":
                self._last_idr_idx = self.frame_idx
        else:
            ftype = self._decide_type()
        qp = self._zone_qp(disp, self._qp_for_frame(ftype))
        if f_qp is not None:
            qp = int(np.clip(f_qp, self.p.qp_min, self.p.qp_max))

        out = b""
        if ftype == "IDR":
            self.frame_num = 0
            if self.p.repeat_headers:
                out += self.headers()

        use_device = self._use_device()
        if (use_device and self.p.backend != "device_host_entropy"
                and not self._syn_path()):
            assert self._pending is None, \
                "mixing encode() and encode_pipelined(); flush() first"
            job = self._submit_device(y, u, v, ftype, qp)
            self._note_recon(disp, self.dpb[0])
            return self._finalize_device(job)
        data = out + self._encode_frame_syn(y, u, v, ftype, qp)
        self._note_recon(disp, self.dpb[0])
        self._note_au(len(data), ftype, 0)
        return data

    def _encode_frame_syn(self, y, u, v, ftype, qp, poc_lsb=0):
        """Syntax-tensor encode path (reference backend / CABAC /
        device_host_entropy): full FrameSyntax on host, host slice
        writers.  Returns the frame's slice bytes (no SPS/PPS)."""
        out = b""
        use_device = self._use_device()
        mbw, mbh = (y.shape[1] // 16, y.shape[0] // 16)
        if self.p.aq_mode:
            qp_arr = self._aq_qp(qp, y, u, v, mbw, mbh)
            slice_qp = int(qp_arr[0])
        else:
            qp_arr = qp
            slice_qp = qp
        from x264_tpu.models.inter_frame import me_lambda, sad_lambda
        syn = None
        if not (ftype == "IDR" or not self.dpb):
            # encode as P, then possibly promote to IDR on scenecut
            # (syntax-tensor paths are single-ref this round)
            ref = self.dpb[0]
            if use_device:
                from x264_tpu.models import inter_device
                ry, ru, rv, syn = inter_device.encode_pframe_device(
                    y, u, v, ref, qp_arr, self.p, lam=sad_lambda(qp))
            else:
                from x264_tpu.models import inter_frame
                ry, ru, rv, syn = inter_frame.encode_pframe(
                    y, u, v, ref, qp_arr, self.p, lam=sad_lambda(qp))
            if (self.p.scenecut_threshold > 0 and syn.icost is not None
                    and self.frame_idx - self._last_idr_idx
                    >= self.p.keyint_min):
                bias = self.p.scenecut_threshold / 100.0
                if float(syn.mb_cost.sum()) >= (1.0 - bias) * float(
                        syn.icost.sum()):
                    ftype = "IDR"
                    self.frame_num = 0
                    self._last_idr_idx = self.frame_idx
                    if self.p.repeat_headers:
                        out += self.headers()
                    qp = self._requantize_idr(qp)
                    if self.p.aq_mode:
                        qp_arr = self._aq_qp(qp, y, u, v, mbw, mbh)
                        slice_qp = int(qp_arr[0])
                    else:
                        qp_arr = qp
                        slice_qp = qp
                    syn = None
        if syn is not None:
            slice_type = SLICE_P
            idr = False
        elif ftype == "IDR" or not self.dpb:
            if use_device:
                from x264_tpu.models import intra_device
                ry, ru, rv, syn = intra_device.encode_iframe_device(
                    y, u, v, qp_arr, self.p.chroma_qp_offset,
                    i4x4=self.p.i4x4, lam=sad_lambda(qp))
            else:
                ry, ru, rv, syn = intra_frame.encode_iframe(
                    y, u, v, qp_arr, self.p.chroma_qp_offset,
                    i4x4=self.p.i4x4, lam=sad_lambda(qp))
            slice_type = SLICE_I
            idr = True

        bs = BitWriter()
        write_slice_header(bs, self.p, self.sps,
                           init_qp=self._init_qp, slice_type=slice_type,
                           idr=idr, frame_num=self.frame_num,
                           idr_pic_id=self.idr_pic_id, qp=slice_qp,
                           num_ref=1, poc_lsb=poc_lsb)
        if self.p.cabac:
            from x264_tpu.bitstream.cabac_host import write_slice_cabac
            pad = (-bs.bit_length) % 8
            if pad:
                bs.put(pad, (1 << pad) - 1)    # cabac_alignment_one_bit
            payload = write_slice_cabac(syn, slice_type, slice_qp)
            out += wrap_slice_nal(bs.to_bytes_aligned() + payload, idr)
        else:
            write_slice_data(bs, syn, slice_type)
            out += wrap_slice_nal(bs.to_rbsp(), idr)

        if self.p.deblock:
            from x264_tpu.models.syntax import effective_qp
            eff_qp = effective_qp(syn.qp.astype(np.int32), syn.mb_class,
                                  syn.cbp_luma, syn.cbp_chroma, slice_qp)
            if use_device:
                from x264_tpu.bitstream.tables import CHROMA_QP_TABLE
                from x264_tpu.models.syntax import MB_I4, MB_I16
                from x264_tpu.ops.device.deblock import deblock_core
                intra_mb = np.isin(syn.mb_class, (MB_I16, MB_I4))
                qpc = CHROMA_QP_TABLE[np.clip(
                    eff_qp + self.p.chroma_qp_offset, 0, 51)].astype(np.int32)
                from x264_tpu.ops.device.deblock import deblock_impl
                ry, ru, rv = deblock_core(
                    ry, ru, rv, intra_mb, syn.luma_nnz.astype(np.int32),
                    syn.mv.astype(np.int32), syn.ref.astype(np.int32),
                    eff_qp, qpc,
                    np.int32(self.p.deblock_alpha * 2),
                    np.int32(self.p.deblock_beta * 2),
                    mbw=syn.mb_width, mbh=syn.mb_height,
                    impl=deblock_impl())
                ry, ru, rv = (np.asarray(ry), np.asarray(ru), np.asarray(rv))
            else:
                import dataclasses as _dc
                from x264_tpu.ops.reference.deblock import deblock_frame
                syn_eff = _dc.replace(syn, qp=eff_qp.astype(np.int64))
                ry, ru, rv = deblock_frame(
                    ry, ru, rv, syn_eff, self.p.deblock_alpha,
                    self.p.deblock_beta, self.p.chroma_qp_offset)

        recon = ReconFrame(ry, ru, rv, frame_num=self.frame_num)
        self.last_recon = recon
        self.dpb = ([recon] + ([] if idr else self.dpb))[:1]
        if idr:
            self.idr_pic_id = (self.idr_pic_id + 1) % 65536
        self.frame_num = (self.frame_num + 1) % (1 << self.sps.log2_max_frame_num)
        self.frame_idx += 1
        self.stats.append(FrameStats(ftype, len(out) * 8, qp))
        cost = int(syn.mb_cost.sum()) if syn.mb_cost is not None else 0
        self.rc.update(ftype, len(out) * 8, cost)
        self._record_stats(ftype, qp, len(out) * 8, cost, syn.mb_class)
        self._last_syn = syn
        return out

    def close(self) -> dict:
        """Summary stats (analog of encoder_close's log summary); writes
        the 2-pass stats file if requested."""
        if self.p.stats_write and self._twopass_stats:
            from x264_tpu.rc.twopass import write_stats
            write_stats(self.p.stats_write, self._twopass_stats,
                        f"qp={self.p.qp} rc={self.p.rc_method}")
        if not self.stats:
            return {}
        bits = sum(s.bits for s in self.stats)
        fps = self.p.fps_num / max(1, self.p.fps_den)
        out = {
            "frames": len(self.stats),
            "kbps": bits * fps / max(1, len(self.stats)) / 1000.0,
            "avg_qp": float(np.mean([s.qp for s in self.stats])),
            "frame_types": {},
            "mb_mix": {},
        }
        nmb_tot = 0
        for t, a in (self._agg or {}).items():
            out["frame_types"][t] = dict(
                count=a["n"], avg_qp=a["qp"] / a["n"],
                avg_bytes=a["bits"] / 8.0 / a["n"])
            nmb = a["imb"] + a["pmb"] + a["smb"]
            nmb_tot += nmb
            out["mb_mix"][t] = dict(
                intra=a["imb"] / max(1, nmb), inter=a["pmb"] / max(1, nmb),
                skip=a["smb"] / max(1, nmb))
        return out

    def summary_lines(self) -> list:
        """x264 encoder_close-style log lines (frame type counts, avg QP,
        avg size, MB type mix) — the CLI prints these at log_level>=2."""
        out = []
        for t in ("I", "P", "B"):
            a = (self._agg or {}).get(t)
            if not a:
                continue
            nmb = max(1, a["imb"] + a["pmb"] + a["smb"])
            out.append(
                f"frame {t}:{a['n']:<5d} Avg QP:{a['qp'] / a['n']:6.2f}"
                f"  size:{a['bits'] / 8.0 / a['n']:9.1f}"
                f"  mb I:{100.0 * a['imb'] / nmb:5.1f}%"
                f" P:{100.0 * a['pmb'] / nmb:5.1f}%"
                f" skip:{100.0 * a['smb'] / nmb:5.1f}%")
        return out


def encode_sequence(frames, params: EncoderParams) -> bytes:
    enc = Encoder(params)
    out = b""
    for fr in frames:
        out += enc.encode(fr)
    return out
