"""Device (JAX) intra prediction — all modes generated batched, bit-exact
counterpart of ops/reference/predict.py (parity: reference common/predict.c).

Inputs are edge vectors gathered from the reconstruction state by the
wavefront driver (models/intra_device.py); each function emits every mode at
once so mode decision is a vectorized cost argmin.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _clip8(x):
    return jnp.clip(x, 0, 255)


def predict_16x16_all(top, left, topleft, avail_top, avail_left):
    """top (N,16), left (N,16), topleft (N,), avail_* (N,) bool
    -> (N, 4, 16, 16) int32 [V, H, DC, Plane]."""
    n = top.shape[0]
    t = top.astype(jnp.int32)
    l = left.astype(jnp.int32)
    tl = topleft.astype(jnp.int32)
    at = avail_top.astype(bool)
    al = avail_left.astype(bool)

    v = jnp.broadcast_to(t[:, None, :], (n, 16, 16))
    h = jnp.broadcast_to(l[:, :, None], (n, 16, 16))

    st, sl = t.sum(1), l.sum(1)
    dc_val = jnp.where(at & al, (st + sl + 16) >> 5,
             jnp.where(at, (st + 8) >> 4,
             jnp.where(al, (sl + 8) >> 4, 128)))
    dc = jnp.broadcast_to(dc_val[:, None, None], (n, 16, 16))

    xp = jnp.arange(1, 9, dtype=jnp.int32)
    tt = jnp.concatenate([tl[:, None], t], axis=1)
    ll = jnp.concatenate([tl[:, None], l], axis=1)
    idx = np.arange(8)
    hgrad = (xp[None, :] * (tt[:, 9 + idx] - tt[:, 7 - idx])).sum(1)
    vgrad = (xp[None, :] * (ll[:, 9 + idx] - ll[:, 7 - idx])).sum(1)
    b = (5 * hgrad + 32) >> 6
    c = (5 * vgrad + 32) >> 6
    a = 16 * (l[:, 15] + t[:, 15])
    xg = jnp.arange(16, dtype=jnp.int32)
    plane = _clip8((a[:, None, None]
                    + b[:, None, None] * (xg[None, None, :] - 7)
                    + c[:, None, None] * (xg[None, :, None] - 7) + 16) >> 5)

    return jnp.stack([v, h, dc, plane], axis=1).astype(jnp.int32)


def predict_chroma_all(top, left, topleft, avail_top, avail_left):
    """top (N,8), left (N,8) -> (N, 4, 8, 8) [DC, H, V, Plane]."""
    n = top.shape[0]
    t = top.astype(jnp.int32)
    l = left.astype(jnp.int32)
    tl = topleft.astype(jnp.int32)
    at = avail_top.astype(bool)
    al = avail_left.astype(bool)

    st0, st1 = t[:, :4].sum(1), t[:, 4:].sum(1)
    sl0, sl1 = l[:, :4].sum(1), l[:, 4:].sum(1)

    q00 = jnp.where(at & al, (st0 + sl0 + 4) >> 3,
          jnp.where(at, (st0 + 2) >> 2,
          jnp.where(al, (sl0 + 2) >> 2, 128)))
    q11 = jnp.where(at & al, (st1 + sl1 + 4) >> 3,
          jnp.where(at, (st1 + 2) >> 2,
          jnp.where(al, (sl1 + 2) >> 2, 128)))
    q10 = jnp.where(at, (st1 + 2) >> 2, jnp.where(al, (sl0 + 2) >> 2, 128))
    q01 = jnp.where(al, (sl1 + 2) >> 2, jnp.where(at, (st0 + 2) >> 2, 128))

    yy = jnp.arange(8)[None, :, None]
    xx = jnp.arange(8)[None, None, :]
    dc = jnp.where((yy < 4) & (xx < 4), q00[:, None, None],
         jnp.where((yy < 4) & (xx >= 4), q10[:, None, None],
         jnp.where((yy >= 4) & (xx < 4), q01[:, None, None],
                   q11[:, None, None])))

    h = jnp.broadcast_to(l[:, :, None], (n, 8, 8))
    v = jnp.broadcast_to(t[:, None, :], (n, 8, 8))

    xp = jnp.arange(1, 5, dtype=jnp.int32)
    tt = jnp.concatenate([tl[:, None], t], axis=1)
    ll = jnp.concatenate([tl[:, None], l], axis=1)
    idx = np.arange(4)
    hgrad = (xp[None, :] * (tt[:, 5 + idx] - tt[:, 3 - idx])).sum(1)
    vgrad = (xp[None, :] * (ll[:, 5 + idx] - ll[:, 3 - idx])).sum(1)
    a = 16 * (l[:, 7] + t[:, 7])
    b = (17 * hgrad + 16) >> 5
    c = (17 * vgrad + 16) >> 5
    xg = jnp.arange(8, dtype=jnp.int32)
    plane = _clip8((a[:, None, None]
                    + b[:, None, None] * (xg[None, None, :] - 3)
                    + c[:, None, None] * (xg[None, :, None] - 3) + 16) >> 5)

    return jnp.stack([dc, h, v, plane], axis=1).astype(jnp.int32)


def predict_4x4_all(top8, left, topleft, avail_top, avail_left, avail_tr):
    """I4x4, all 9 modes (8.3.1.2): top8 (N,8) = p[0..7,-1] (top-right
    half substituted with p[3,-1] when !avail_tr, 8.3.1.2.1), left (N,4),
    topleft (N,) -> (N, 9, 4, 4) int32.  Bit-exact counterpart of
    ops/reference/predict.predict_4x4_all; all index grids are static so
    every T()/L() lookup compiles to a static-slice select."""
    n = top8.shape[0]
    t = top8.astype(jnp.int32)
    t = jnp.concatenate(
        [t[:, :4],
         jnp.where(avail_tr[:, None].astype(bool), t[:, 4:], t[:, 3:4])],
        axis=1)
    l = left.astype(jnp.int32)
    tl = topleft.astype(jnp.int32)
    at = avail_top.astype(bool)
    al = avail_left.astype(bool)

    y, x = np.mgrid[0:4, 0:4]

    tt = jnp.concatenate([tl[:, None], t], axis=1)          # (N, 9)
    ll = jnp.concatenate([tl[:, None], l], axis=1)          # (N, 5)

    def T(idx):  # static idx (4,4) with values in -1..7
        return tt[:, (idx + 1).reshape(16)].reshape(n, 4, 4)

    def L(idx):  # values in -1..3
        return ll[:, (idx + 1).reshape(16)].reshape(n, 4, 4)

    xb = x[None]
    yb = y[None]

    m0 = jnp.broadcast_to(t[:, None, :4], (n, 4, 4))
    m1 = jnp.broadcast_to(l[:, :, None], (n, 4, 4))

    st, sl = t[:, :4].sum(1), l.sum(1)
    dc = jnp.where(at & al, (st + sl + 4) >> 3,
         jnp.where(at, (st + 2) >> 2,
         jnp.where(al, (sl + 2) >> 2, 128)))
    m2 = jnp.broadcast_to(dc[:, None, None], (n, 4, 4))

    s = x + y
    ddl = (T(s.clip(max=5)) + 2 * T((s + 1).clip(max=6))
           + T((s + 2).clip(max=7)) + 2) >> 2
    corner = (t[:, 6] + 3 * t[:, 7] + 2) >> 2
    m3 = jnp.where(jnp.asarray((x == 3) & (y == 3))[None],
                   corner[:, None, None], ddl)

    z = x - y
    ddr_t = (T((z - 2).clip(-1)) + 2 * T((z - 1).clip(-1))
             + T(z.clip(-1)) + 2) >> 2
    w = y - x
    ddr_l = (L((w - 2).clip(-1)) + 2 * L((w - 1).clip(-1))
             + L(w.clip(-1)) + 2) >> 2
    diag = (t[:, 0] + 2 * tl + l[:, 0] + 2) >> 2
    m4 = jnp.where(jnp.asarray(z > 0)[None], ddr_t,
         jnp.where(jnp.asarray(z < 0)[None], ddr_l,
                   diag[:, None, None]))

    zvr = 2 * x - y
    i = x - (y >> 1)
    vr_even = (T((i - 1).clip(-1)) + T(i.clip(-1)) + 1) >> 1
    vr_odd = (T((i - 2).clip(-1)) + 2 * T((i - 1).clip(-1))
              + T(i.clip(-1)) + 2) >> 2
    vr_m1 = ((l[:, 0] + 2 * tl + t[:, 0] + 2) >> 2)[:, None, None]
    vr_lo = (L((y - 1).clip(-1)) + 2 * L((y - 2).clip(-1))
             + L((y - 3).clip(-1)) + 2) >> 2
    m5 = jnp.where(jnp.asarray(zvr >= 0)[None],
                   jnp.where(jnp.asarray(zvr % 2 == 0)[None], vr_even,
                             vr_odd),
                   jnp.where(jnp.asarray(zvr == -1)[None], vr_m1, vr_lo))

    zhd = 2 * y - x
    j = y - (x >> 1)
    hd_even = (L((j - 1).clip(-1)) + L(j.clip(-1)) + 1) >> 1
    hd_odd = (L((j - 2).clip(-1)) + 2 * L((j - 1).clip(-1))
              + L(j.clip(-1)) + 2) >> 2
    hd_lo = (T((x - 1).clip(-1)) + 2 * T((x - 2).clip(-1))
             + T((x - 3).clip(-1)) + 2) >> 2
    m6 = jnp.where(jnp.asarray(zhd >= 0)[None],
                   jnp.where(jnp.asarray(zhd % 2 == 0)[None], hd_even,
                             hd_odd),
                   jnp.where(jnp.asarray(zhd == -1)[None], vr_m1, hd_lo))

    k = x + (y >> 1)
    vl_even = (T(k) + T((k + 1).clip(max=7)) + 1) >> 1
    vl_odd = (T(k) + 2 * T((k + 1).clip(max=7))
              + T((k + 2).clip(max=7)) + 2) >> 2
    m7 = jnp.where(jnp.asarray(y % 2 == 0)[None], vl_even, vl_odd)

    zhu = x + 2 * y
    m = y + (x >> 1)
    hu_even = (L(m.clip(max=3)) + L((m + 1).clip(max=3)) + 1) >> 1
    hu_odd = (L(m.clip(max=3)) + 2 * L((m + 1).clip(max=3))
              + L((m + 2).clip(max=3)) + 2) >> 2
    hu_5 = ((l[:, 2] + 3 * l[:, 3] + 2) >> 2)[:, None, None]
    hu_hi = jnp.broadcast_to(l[:, 3][:, None, None], (n, 4, 4))
    m8 = jnp.where(jnp.asarray(zhu > 5)[None], hu_hi,
         jnp.where(jnp.asarray(zhu == 5)[None], hu_5,
         jnp.where(jnp.asarray(zhu % 2 == 0)[None], hu_even, hu_odd)))

    return jnp.stack([m0, m1, m2, m3, m4, m5, m6, m7, m8],
                     axis=1).astype(jnp.int32)


def i4x4_mode_avail(at, al, atl):
    """(N,) bools -> (N,9) [V, H, DC, DDL, DDR, VR, HD, VL, HU]."""
    always = jnp.ones_like(at, dtype=bool)
    full = at & al & atl
    return jnp.stack([at, al, always, at, full, full, full, at, al],
                     axis=-1)


def i16x16_mode_avail(at, al, atl):
    """(N,) bools -> (N,4) mode mask [V, H, DC, Plane]."""
    always = jnp.ones_like(at, dtype=bool)
    return jnp.stack([at, al, always, at & al & atl], axis=-1)


def chroma_mode_avail(at, al, atl):
    always = jnp.ones_like(at, dtype=bool)
    return jnp.stack([always, al, at, at & al & atl], axis=-1)


# -----------------------------------------------------------------------------
# I8x8 (8.3.2) — reference-sample filtering + all 9 modes (device twin of
# ops/reference/predict.py; static index matrices -> plain XLA gathers)
# -----------------------------------------------------------------------------

def predict_8x8_all(top16, left8, topleft, avail_top, avail_left,
                    avail_tl, avail_tr):
    """All 9 Intra_8x8 modes from RAW edges; the 8.3.2.2.1 low-pass
    filter is applied internally.  top16 (N,16) p[0..15,-1] (top-right
    half garbage when !avail_tr — substituted here), left8 (N,8),
    topleft (N,).  -> (N, 9, 8, 8) int32, order [V,H,DC,DDL,DDR,VR,HD,
    VL,HU]."""
    import numpy as _np
    n = top16.shape[0]
    t = top16.astype(jnp.int32)
    l8 = left8.astype(jnp.int32)
    tl = topleft.astype(jnp.int32)
    at = avail_top
    al = avail_left
    atl = avail_tl
    atr = avail_tr

    t = jnp.where(atr[:, None], t,
                  jnp.concatenate([t[:, :8],
                                   jnp.broadcast_to(t[:, 7:8], (n, 8))], 1))

    ft0 = jnp.where(atl, (tl + 2 * t[:, 0] + t[:, 1] + 2) >> 2,
                    (3 * t[:, 0] + t[:, 1] + 2) >> 2)
    ftm = (t[:, 0:14] + 2 * t[:, 1:15] + t[:, 2:16] + 2) >> 2
    ft15 = (t[:, 14] + 3 * t[:, 15] + 2) >> 2
    fl0 = jnp.where(atl, (tl + 2 * l8[:, 0] + l8[:, 1] + 2) >> 2,
                    (3 * l8[:, 0] + l8[:, 1] + 2) >> 2)
    flm = (l8[:, 0:6] + 2 * l8[:, 1:7] + l8[:, 2:8] + 2) >> 2
    fl7 = (l8[:, 6] + 3 * l8[:, 7] + 2) >> 2
    ftl = jnp.where(at & al, (t[:, 0] + 2 * tl + l8[:, 0] + 2) >> 2,
          jnp.where(at, (3 * tl + t[:, 0] + 2) >> 2,
          jnp.where(al, (3 * tl + l8[:, 0] + 2) >> 2, tl)))
    t = jnp.concatenate([ft0[:, None], ftm, ft15[:, None]], axis=1)
    l8 = jnp.concatenate([fl0[:, None], flm, fl7[:, None]], axis=1)
    tl = ftl

    yg, xg = _np.mgrid[0:8, 0:8]
    tt = jnp.concatenate([tl[:, None], t], axis=1)      # (N,17)
    ll = jnp.concatenate([tl[:, None], l8], axis=1)     # (N,9)

    def T(idx):
        return tt[:, _np.asarray(idx) + 1]

    def L(idx):
        return ll[:, _np.asarray(idx) + 1]

    v = jnp.broadcast_to(t[:, None, :8], (n, 8, 8))
    hm = jnp.broadcast_to(l8[:, :, None], (n, 8, 8))

    st, sl = t[:, :8].sum(1), l8.sum(1)
    dc = jnp.where(at & al, (st + sl + 8) >> 4,
         jnp.where(at, (st + 4) >> 3,
         jnp.where(al, (sl + 4) >> 3, 128)))
    dc = jnp.broadcast_to(dc[:, None, None], (n, 8, 8))

    s = xg + yg
    ddl = (T(s) + 2 * T((s + 1).clip(max=15)) + T((s + 2).clip(max=15)) + 2) >> 2
    corner = (t[:, 14] + 3 * t[:, 15] + 2) >> 2
    ddl = jnp.where(jnp.asarray((xg == 7) & (yg == 7)),
                    corner[:, None, None], ddl)

    z = xg - yg
    ddr_t = (T((z - 2).clip(-1)) + 2 * T((z - 1).clip(-1)) + T(z.clip(-1)) + 2) >> 2
    w = yg - xg
    ddr_l = (L((w - 2).clip(-1)) + 2 * L((w - 1).clip(-1)) + L(w.clip(-1)) + 2) >> 2
    diag = (t[:, 0] + 2 * tl + l8[:, 0] + 2) >> 2
    ddr = jnp.where(jnp.asarray(z > 0), ddr_t,
          jnp.where(jnp.asarray(z < 0), ddr_l, diag[:, None, None]))

    zvr = 2 * xg - yg
    i = xg - (yg >> 1)
    vr_even = (T((i - 1).clip(-1)) + T(i.clip(-1)) + 1) >> 1
    vr_odd = (T((i - 2).clip(-1)) + 2 * T((i - 1).clip(-1)) + T(i.clip(-1)) + 2) >> 2
    vr_m1 = ((l8[:, 0] + 2 * tl + t[:, 0] + 2) >> 2)[:, None, None]
    q = yg - 2 * xg
    vr_lo = (L((q - 1).clip(-1)) + 2 * L((q - 2).clip(-1)) + L((q - 3).clip(-1)) + 2) >> 2
    vr = jnp.where(jnp.asarray(zvr >= 0),
                   jnp.where(jnp.asarray(zvr % 2 == 0), vr_even, vr_odd),
                   jnp.where(jnp.asarray(zvr == -1), vr_m1, vr_lo))

    zhd = 2 * yg - xg
    j = yg - (xg >> 1)
    hd_even = (L((j - 1).clip(-1)) + L(j.clip(-1)) + 1) >> 1
    hd_odd = (L((j - 2).clip(-1)) + 2 * L((j - 1).clip(-1)) + L(j.clip(-1)) + 2) >> 2
    r = xg - 2 * yg
    hd_lo = (T((r - 1).clip(-1)) + 2 * T((r - 2).clip(-1)) + T((r - 3).clip(-1)) + 2) >> 2
    hd = jnp.where(jnp.asarray(zhd >= 0),
                   jnp.where(jnp.asarray(zhd % 2 == 0), hd_even, hd_odd),
                   jnp.where(jnp.asarray(zhd == -1), vr_m1, hd_lo))

    k = xg + (yg >> 1)
    vl_even = (T(k) + T((k + 1).clip(max=15)) + 1) >> 1
    vl_odd = (T(k) + 2 * T((k + 1).clip(max=15)) + T((k + 2).clip(max=15)) + 2) >> 2
    vl = jnp.where(jnp.asarray(yg % 2 == 0), vl_even, vl_odd)

    zhu = xg + 2 * yg
    m = yg + (xg >> 1)
    hu_even = (L(m.clip(max=7)) + L((m + 1).clip(max=7)) + 1) >> 1
    hu_odd = (L(m.clip(max=7)) + 2 * L((m + 1).clip(max=7)) + L((m + 2).clip(max=7)) + 2) >> 2
    hu_13 = ((l8[:, 6] + 3 * l8[:, 7] + 2) >> 2)[:, None, None]
    hu_hi = jnp.broadcast_to(l8[:, 7][:, None, None], (n, 8, 8))
    hu = jnp.where(jnp.asarray(zhu > 13), hu_hi,
         jnp.where(jnp.asarray(zhu == 13), hu_13,
         jnp.where(jnp.asarray(zhu % 2 == 0), hu_even, hu_odd)))

    return jnp.stack([v, hm, dc, ddl, ddr, vr, hd, vl, hu], axis=1)


def i8x8_mode_avail(at, al, atl):
    """Same lattice as I4x4 (edge filtering covers substitution)."""
    return i4x4_mode_avail(at, al, atl)
