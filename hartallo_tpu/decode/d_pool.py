"""Host-side compact packing for the Pallas fast decode path.

The axon/TPU tunnel moves host->device data at ~15-40 MB/s, so the dense
per-MB packed buffer (~0.4 MB per CIF frame, mostly zero coefficients)
costs more wall time than the device program itself.  The fast path
uploads a compact representation instead:

- ``ctrl``: 12 int16 words per MB (quadrant MVs, nnz bitmap, qp, deblock
  offsets/flags) — everything the device derives windows and boundary
  strengths from;
- a **residual pool**: only the nonzero 4x4 residual blocks, as final
  spatial-domain int16 values.  The inherently sparse dequant + inverse
  DCT runs on host (vectorized numpy, bit-identical to
  ``ops/transform.py``; oracle-tested) — it is entropy-adjacent prep on
  a few hundred blocks, while every per-pixel stage (MC, deblocking,
  half-pel filters) stays on device.

Reference parity: the pooled residual mirrors the reference's sparse
block scan (``hl_codec_264_residual.c:47-280`` reads only coded blocks);
window derivation mirrors ``hl_codec_264_pred_inter.c:300-887`` clamped
index maps; boundary-strength inputs per 8.7.2.1.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from hartallo_tpu.core import tables as T
from hartallo_tpu.core.tables import LUMA_4x4_BLK_XY, QP_SCALE_CHROMA

PAD = 32
CTRL_WORDS = 12          # per-MB int16 words
MAX_RES = 16000          # |residual| bound for int16 work planes

_BLK_X = LUMA_4x4_BLK_XY[:, 0].astype(np.int64)      # pixel offsets in MB
_BLK_Y = LUMA_4x4_BLK_XY[:, 1].astype(np.int64)


# ---------------------------------------------------------------------------
# numpy mirrors of ops/transform.py (int32-exact)
# ---------------------------------------------------------------------------

def _dequant_np(c: np.ndarray, qp: np.ndarray) -> np.ndarray:
    """8.5.12.1 flat dequant; c (...,4,4) int32, qp (...,)."""
    c = c.astype(np.int32)
    qp = qp.astype(np.int32)
    ls = 16 * T.QUANT_V[qp % 6]
    qdiv = (qp // 6)[..., None, None]
    hi = (c * ls) << np.maximum(qdiv - 4, 0)
    lo = (c * ls + (1 << np.maximum(3 - qdiv, 0))) >> np.maximum(4 - qdiv, 0)
    return np.where(qp[..., None, None] >= 24, hi, lo)


def _idct_np(d: np.ndarray) -> np.ndarray:
    """8.5.12.2 inverse core transform; d (...,4,4) int32."""
    d = d.astype(np.int32)
    d0, d1, d2, d3 = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    e0, e1 = d0 + d2, d0 - d2
    e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
    f = np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    f0, f1, f2, f3 = f[..., 0, :], f[..., 1, :], f[..., 2, :], f[..., 3, :]
    g0, g1 = f0 + f2, f0 - f2
    g2, g3 = (f1 >> 1) - f3, f1 + (f3 >> 1)
    h = np.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=-2)
    return (h + 32) >> 6


def _chroma_dc_descale_np(c: np.ndarray, qp: np.ndarray) -> np.ndarray:
    """8.5.11 (4:2:0); c (...,2,2) int32, qp (...,)."""
    c = c.astype(np.int32)
    qp = qp.astype(np.int32)
    t00 = c[..., 0, 0] + c[..., 1, 0]
    t01 = c[..., 0, 1] + c[..., 1, 1]
    t10 = c[..., 0, 0] - c[..., 1, 0]
    t11 = c[..., 0, 1] - c[..., 1, 1]
    f = np.stack([np.stack([t00 + t01, t00 - t01], axis=-1),
                  np.stack([t10 + t11, t10 - t11], axis=-1)], axis=-2)
    scale = (16 * T.QUANT_V[qp % 6, 0, 0])[..., None, None]
    return ((f * scale) << (qp // 6)[..., None, None]) >> 5


# ---------------------------------------------------------------------------
# Fast-path frame payload
# ---------------------------------------------------------------------------

@dataclass
class FastFrame:
    ctrl: np.ndarray          # (nMB, CTRL_WORDS) int16
    tags: np.ndarray          # (NR,) int32 packed skewed targets
    vals: np.ndarray          # (NR, 16) int16 transposed residual blocks
    counts: np.ndarray        # (3,) int32 [n_luma, n_u, n_v] prefix counts
    wslot: int
    ref_slot: int


def nrmax(gw: int, gh: int) -> int:
    """Static residual-pool capacity per frame (compile-stable)."""
    return 2048 if gw * gh <= 1600 else 4096


def eligible(sd, wp_l) -> Optional[str]:
    """Why this picture can NOT take the fast path (None = it can).

    Fast path scope: all-inter P pictures, per-8x8-quadrant-uniform MVs
    (including after the MC window edge clamp), one reference slot for
    the whole frame, no weighted prediction, residual magnitudes within
    the int16 work-plane budget.
    """
    kind = sd.mb_kind
    if not ((kind >= 3) & (kind != 8)).all():
        return "intra/IBL macroblocks"
    if wp_l is not None:
        return "weighted prediction"
    if sd.gw * 16 > 1280 or sd.gh * 16 > 768:
        return "frame too large for VMEM-resident fast path"
    v = sd.mv.reshape(sd.gh, sd.gw, 2, 2, 2, 2, 2)
    if not (v == v[:, :, :, :1, :, :1, :]).all():
        return "sub-8x8 motion partitions"
    slots = np.unique(sd.ref_idx)
    if slots.size != 1:
        return "multiple reference slots in one frame"
    # window clamp must hit all four 4x4 blocks of a quadrant equally
    # (the kernel derives ONE window per quadrant; the XLA/reference
    # semantics clamp per 4x4 block)
    gh, gw = sd.gh, sd.gw
    W, H, Wc, Hc = gw * 16, gh * 16, gw * 8, gh * 8
    mvx = sd.mv[..., 0]
    mvy = sd.mv[..., 1]
    b4 = np.arange(4)
    bx = (np.arange(gw)[None, :, None] * 16 + b4 * 4)[:, :, None, :]
    by = (np.arange(gh)[:, None, None] * 16 + b4 * 4)[:, :, :, None]
    xi = np.clip(bx + (mvx >> 2), -(PAD - 2), W + PAD - 7)
    yi = np.clip(by + (mvy >> 2), -(PAD - 2), H + PAD - 7)
    cxi = np.clip(bx // 2 + (mvx >> 3), -(PAD - 1), Wc + PAD - 4)
    cyi = np.clip(by // 2 + (mvy >> 3), -(PAD - 1), Hc + PAD - 4)
    off = np.array([0, 4])
    # xi axes are (gh, gw, by4, bx4) -> (gh, gw, qy, iy, qx, ix)
    ok = True
    ok &= bool((xi.reshape(gh, gw, 2, 2, 2, 2) ==
                xi.reshape(gh, gw, 2, 2, 2, 2)[:, :, :, :1, :, :1] +
                off[None, None, None, None, None, :]).all())
    ok &= bool((yi.reshape(gh, gw, 2, 2, 2, 2) ==
                yi.reshape(gh, gw, 2, 2, 2, 2)[:, :, :, :1, :, :1] +
                off[None, None, None, :, None, None]).all())
    co = np.array([0, 2])
    ok &= bool((cxi.reshape(gh, gw, 2, 2, 2, 2) ==
                cxi.reshape(gh, gw, 2, 2, 2, 2)[:, :, :, :1, :, :1] +
                co[None, None, None, None, None, :]).all())
    ok &= bool((cyi.reshape(gh, gw, 2, 2, 2, 2) ==
                cyi.reshape(gh, gw, 2, 2, 2, 2)[:, :, :, :1, :, :1] +
                co[None, None, None, :, None, None]).all())
    if not ok:
        return "edge-clamped quadrant windows diverge"
    return None


def pack_fast(sd, fmb_v, fmb_h, fint, wslot: int,
              chroma_qp_off: int) -> FastFrame:
    """Build the compact fast-path payload for one picture.

    Precondition: ``eligible`` returned None (sd.ref_idx is slot-mapped,
    derive_mvs has run).
    """
    gh, gw = sd.gh, sd.gw
    n = gh * gw
    K_geo = gh                                      # slope-1 diagonal slot

    # ---- ctrl ----------------------------------------------------------
    ctrl = np.zeros((n, CTRL_WORDS), np.int16)
    # quadrant MVs: quad q=(qy,qx) at word 2*(2*qy+qx) (x then y)
    mvq = sd.mv[:, :, ::2, ::2, :].reshape(n, 4, 2)
    ctrl[:, 0:8:2] = mvq[:, :, 0].astype(np.int16)
    ctrl[:, 1:8:2] = mvq[:, :, 1].astype(np.int16)
    nnz_mb = (sd.nnz_luma.reshape(gh, 4, gw, 4).transpose(0, 2, 1, 3)
              .reshape(n, 16) > 0)
    ctrl[:, 8] = (nnz_mb << np.arange(16)).sum(1).astype(np.uint16) \
        .astype(np.int16)
    ctrl[:, 9] = sd.qp.reshape(n)
    ctrl[:, 10] = (((sd.alpha_off.astype(np.int16) + 6) << 4) |
                   (sd.beta_off.astype(np.int16) + 6)).reshape(n)
    ctrl[:, 11] = (fmb_v.reshape(n) * 1 + fmb_h.reshape(n) * 2 +
                   fint.reshape(n) * 4).astype(np.int16)

    # ---- residual pool -------------------------------------------------
    qp = sd.qp.reshape(n).astype(np.int32)
    qpc = QP_SCALE_CHROMA[np.clip(qp + chroma_qp_off, 0, 51)]

    # luma: blocks with any nonzero coeff
    lac = sd.luma_ac.reshape(n, 16, 4, 4)
    lnz = lac.any(axis=(2, 3))                       # (n, 16)
    lm, lb = np.nonzero(lnz)
    r_l = _idct_np(_dequant_np(lac[lm, lb], qp[lm])) if lm.size else \
        np.zeros((0, 4, 4), np.int32)

    # chroma: DC always descales into position 0; block nonzero if AC or
    # its DC is nonzero
    cac = sd.chroma_ac.reshape(n, 2, 4, 4, 4)
    dcc = _chroma_dc_descale_np(
        sd.chroma_dc.reshape(n, 2, 2, 2),
        np.broadcast_to(qpc[:, None], (n, 2)))       # (n,2,2,2)
    dcc_blk = dcc.reshape(n, 2, 4)                   # raster == blk order
    cnz = cac.any(axis=(3, 4)) | (dcc_blk != 0)      # (n,2,4)
    cm, cp, cb = np.nonzero(cnz)
    if cm.size:
        d_c = _dequant_np(cac[cm, cp, cb], qpc[cm])
        d_c[:, 0, 0] = dcc_blk[cm, cp, cb]
        r_c = _idct_np(d_c)
    else:
        r_c = np.zeros((0, 4, 4), np.int32)

    # magnitude guard for int16 work planes
    mx = 0
    if r_l.size:
        mx = max(mx, int(np.abs(r_l).max()))
    if r_c.size:
        mx = max(mx, int(np.abs(r_c).max()))
    if mx > MAX_RES:
        raise OverflowError("residual exceeds fast-path int16 budget")

    # skewed-buffer targets: d = mx+my (+1 buffer row), k = my
    def l_tags(ms, bs):
        my, mx_ = ms // gw, ms % gw
        d = my + mx_ + 1
        rx = _BLK_X[bs]
        lane = my * 16 + _BLK_Y[bs]
        return ((d << 24) | (rx << 18) | lane).astype(np.int32)

    def c_tags(ms, bs):
        my, mx_ = ms // gw, ms % gw
        d = my + mx_ + 1
        rx = (bs % 2) * 4
        lane = my * 8 + (bs // 2) * 4
        return ((d << 24) | (rx << 18) | lane).astype(np.int32)

    u_sel = cp == 0
    tags = np.concatenate([
        l_tags(lm, lb),
        c_tags(cm[u_sel], cb[u_sel]),
        c_tags(cm[~u_sel], cb[~u_sel])]) if (lm.size + cm.size) else \
        np.zeros((0,), np.int32)
    vals = np.concatenate([
        r_l.transpose(0, 2, 1).reshape(-1, 16),
        r_c[u_sel].transpose(0, 2, 1).reshape(-1, 16),
        r_c[~u_sel].transpose(0, 2, 1).reshape(-1, 16)]) \
        .astype(np.int16) if (lm.size + cm.size) else \
        np.zeros((0, 16), np.int16)
    counts = np.array([lm.size, lm.size + int(u_sel.sum()),
                       lm.size + cm.size], np.int32)
    return FastFrame(ctrl=ctrl, tags=tags, vals=vals, counts=counts,
                     wslot=int(wslot), ref_slot=int(sd.ref_idx.flat[0]))
