"""Sliced-band frame encoding over a device mesh — the TPU-native analog of
x264's sliced threads (reference encoder/encoder.c threaded_slices_write
:3219, doc/threads.txt).

Design: the frame is split into horizontal MB-row bands, one per device on a
1-D `band` mesh axis.  Source planes are sharded by band; reconstructed
reference planes are replicated (every band's motion search may read any ref
row — replication is the ICI-cheap choice at 1 ref; halo-banded refs with
ppermute exchange is the planned optimization for deep DPBs).  Each device
runs the identical batched pipeline on its band, exactly like an x264 slice:
no cross-band prediction, so per-band syntax is independently entropy-coded
on host as one H.264 slice per band (first_mb_in_slice = band * MBs/band).
The quality cost of slicing is the same one x264 documents
(doc/threads.txt:27-37) and is reported by the bench harness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from x264_tpu.models.inter_device import p_frame_pipeline
from x264_tpu.models.inter_frame import PAD


def make_band_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(devs)} "
                "(for CPU testing set XLA_FLAGS="
                "--xla_force_host_platform_device_count=N)")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("band",))


def build_sliced_p_step(mesh: Mesh, mbw: int, mbh_per_band: int,
                        me_range: int, cqp_off: int, n_words: int = 24,
                        subpel: int = 0, entropy: str = "cavlc",
                        lv_cap: int = 64):
    """Returns a jitted function
        step(y, u, v, ref_y_pad, ref_u_pad, ref_v_pad, qp_mb, lam) -> dict
    where planes are full-frame (mbh = bands * mbh_per_band), the ref
    planes are already edge-padded (PAD / PAD//2) and qp_mb is per-MB
    (n_mbs,) (AQ offsets shard along with their band).  Outputs are
    sharded by band: per-MB tensors in raster order band-major (which *is*
    frame MB raster order for horizontal bands).  Each band runs the
    IDENTICAL program as the single-device per-band loop
    (models/inter_device.p_band_core), so sharded output is bit-equal to
    the serial slice loop — asserted by dryrun_multichip and
    tests/test_sliced_mesh.py."""
    n_band = mesh.shape["band"]
    mbh = mbh_per_band * n_band
    band_h, band_hc = mbh_per_band * 16, mbh_per_band * 8
    w, wc = mbw * 16, mbw * 8

    def band_fn(y, u, v, ref_y_pad, ref_u_pad, ref_v_pad, qp, lam):
        b = jax.lax.axis_index("band")
        # band-local view of the replicated padded refs, with full halo:
        # rows [band_y0, band_y0 + band_h + 2*PAD) of the padded plane are
        # exactly the band's rows padded by PAD on each side.
        ry = jax.lax.dynamic_slice(
            ref_y_pad, (b * band_h, 0), (band_h + 2 * PAD, w + 2 * PAD))
        ru = jax.lax.dynamic_slice(
            ref_u_pad, (b * band_hc, 0), (band_hc + PAD, wc + PAD))
        rv = jax.lax.dynamic_slice(
            ref_v_pad, (b * band_hc, 0), (band_hc + PAD, wc + PAD))
        return p_frame_pipeline(y, u, v, ry, ru, rv, qp, lam[0],
                                mbw=mbw, mbh=mbh_per_band,
                                me_range=me_range, cqp_off=cqp_off,
                                n_words=n_words, subpel=subpel,
                                entropy=entropy, lv_cap=lv_cap)

    out_specs = dict(
        host_blob=PS("band", None),
        mb_cost=PS("band"), qp_mb=PS("band"), icost=PS("band"),
        ref_mb=PS("band"),
        mb_class=PS("band"), mvd=PS("band", None),
        mv=PS("band", None),
        i16_mode=PS("band"), chroma_mode=PS("band"),
        luma_dc=PS("band", None),
        luma_ac=PS("band", None, None), luma_nnz=PS("band", None),
        nnz_deblock=PS("band", None), t8=PS("band"),
        cbp_luma=PS("band"),
        chroma_dc=PS("band", None, None),
        chroma_ac=PS("band", None, None, None),
        chroma_nnz=PS("band", None, None), cbp_chroma=PS("band"),
        recon_y=PS("band", None), recon_u=PS("band", None),
        recon_v=PS("band", None),
    )
    if entropy == "cavlc":
        out_specs.update(
            res_vals=PS("band", None), res_lens=PS("band", None),
            words=PS("band", None), nbits=PS("band"))
    shmapped = jax.shard_map(
        band_fn, mesh=mesh,
        in_specs=(PS("band", None), PS("band", None), PS("band", None),
                  PS(None, None), PS(None, None), PS(None, None),
                  PS("band"), PS(None)),
        out_specs=out_specs,
        check_vma=False,
    )

    def step(y, u, v, ref_y_pad, ref_u_pad, ref_v_pad, qp_mb, lam):
        qp_mb = jnp.broadcast_to(
            jnp.asarray(qp_mb, jnp.int32).reshape(-1), (mbw * mbh,))
        return shmapped(y, u, v, ref_y_pad, ref_u_pad, ref_v_pad,
                        qp_mb, jnp.asarray([lam], jnp.int32))

    return jax.jit(step), dict(mbh=mbh, mbw=mbw, n_band=n_band)
