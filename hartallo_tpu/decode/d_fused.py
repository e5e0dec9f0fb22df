"""Whole-frame fused decode program: residual decode + inter prediction +
intra wavefront + in-loop deblock in ONE jitted XLA program, consuming a
single packed int32 per-MB buffer (one host->device transfer) and
producing the display frame as one uint8 array (one device->host
transfer) plus device-resident DPB planes.

Reference counterpart: the per-picture pixel decode driver
``hl_codec_264_decode_avc.c:55-263`` (serial MV pass -> threaded inter
pred -> serial intra -> deblock).  Measured tunnel economics (~20-30 ms
per blocking transfer) make transfer count, not FLOPs, the decode budget.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hartallo_tpu.core.tables import QP_SCALE_CHROMA
from hartallo_tpu.decode.inter_recon import inter_predict_frame, mbs_to_plane
from hartallo_tpu.decode.intra_recon import (PAD, compute_residuals,
                                             intra_reconstruct)
from hartallo_tpu.ops.deblock import compute_bs, deblock_frame

_J_QPC = jnp.asarray(QP_SCALE_CHROMA)

# packed layout: (name, trailing shape) — per-MB int32 words
DEC_FIELDS = [
    ("luma_ac", (16, 4, 4)), ("luma_dc", (4, 4)),
    ("chroma_ac", (2, 4, 4, 4)), ("chroma_dc", (2, 2, 2)),
    ("qp", ()), ("kind", ()), ("i16_mode", ()), ("i4_modes", (16,)),
    ("chroma_mode", ()), ("mv", (4, 4, 2)), ("ref_idx", (4,)),
    ("nnz", (4, 4)), ("alpha_off", ()), ("beta_off", ()),
    ("avail_l", ()), ("avail_t", ()), ("avail_tr", ()),
    ("fmb_v", ()), ("fmb_h", ()), ("fint", ()),
    # explicit weighted prediction (8.4.2.3.2): per 8x8 partition
    # [w, o, logWD] for luma and per plane for chroma; identity when the
    # slice has no pred_weight_table (w=1, o=0, logWD=0)
    ("wp_l", (4, 3)), ("wp_c", (4, 2, 3)),
]
_DEC_WORDS = sum(int(np.prod(s, dtype=int)) if s else 1
                 for _, s in DEC_FIELDS)


def pack_slice_arrays(sd, al, at, fmb_v, fmb_h, fint,
                      wp_l=None, wp_c=None, atr=None) -> np.ndarray:
    """Host: SliceData + availability/filter masks -> (gh*gw, W) int16."""
    gh, gw = sd.gh, sd.gw
    n = gh * gw
    if wp_l is None:
        wp_l = np.zeros((gh, gw, 4, 3), np.int32)
        wp_l[..., 0] = 1
    if wp_c is None:
        wp_c = np.zeros((gh, gw, 4, 2, 3), np.int32)
        wp_c[..., 0] = 1
    nnz_mb = sd.nnz_luma.reshape(gh, 4, gw, 4).transpose(0, 2, 1, 3)
    vals = {
        "luma_ac": sd.luma_ac, "luma_dc": sd.luma_dc,
        "chroma_ac": sd.chroma_ac, "chroma_dc": sd.chroma_dc,
        "qp": sd.qp, "kind": sd.mb_kind, "i16_mode": sd.i16_mode,
        "i4_modes": sd.i4_modes, "chroma_mode": sd.chroma_mode,
        "mv": sd.mv, "ref_idx": sd.ref_idx, "nnz": nnz_mb,
        "alpha_off": sd.alpha_off, "beta_off": sd.beta_off,
        "avail_l": al, "avail_t": at,
        "avail_tr": (np.ones((gh, gw), bool) if atr is None else atr),
        "fmb_v": fmb_v, "fmb_h": fmb_h, "fint": fint,
        "wp_l": wp_l, "wp_c": wp_c,
    }
    # int16 transfer buffer: every field fits (spec A.2.1 bounds
    # coefficient values to [-2^15, 2^15-1]; quarter-pel MVs to +-8192)
    # and the host->device copy halves
    parts = []
    for name, shape in DEC_FIELDS:
        w = int(np.prod(shape, dtype=int)) if shape else 1
        parts.append(np.ascontiguousarray(
            vals[name], dtype=np.int16).reshape(n, w))
    return np.concatenate(parts, axis=1)


def _unpack(buf, gh, gw):
    out = {}
    off = 0
    for name, shape in DEC_FIELDS:
        n = int(np.prod(shape, dtype=int)) if shape else 1
        out[name] = buf[:, off:off + n].reshape((gh, gw) + shape)
        off += n
    return out


@partial(jax.jit, static_argnames=("gw", "gh", "has_inter",
                                   "chroma_qp_off", "deblock"))
def decode_frame_fused(packed, ref_y, ref_u, ref_v, *, gw: int, gh: int,
                       has_inter: bool, chroma_qp_off: int, deblock: bool):
    """packed: (gh*gw, W) int32 from pack_slice_arrays.  ref_*: (N, Hp, Wp)
    stacked PAD-padded reference planes (ignored when not has_inter).

    Returns (out_u8 (H*3//2, W) uint8, padY, padU, padV edge-padded int32
    planes for the DPB)."""
    H, W = gh * 16, gw * 16
    f = _unpack(packed, gh, gw)
    kind = f["kind"]
    qp = f["qp"]

    res_y, res_c = compute_residuals(
        f["luma_ac"], f["luma_dc"], f["chroma_ac"], f["chroma_dc"],
        qp, kind == 1, chroma_qp_off)

    if has_inter:
        pred_y, pred_c = inter_predict_frame(
            ref_y, ref_u, ref_v, f["mv"], f["ref_idx"], gw, gh)
        rec_y = jnp.clip(pred_y + res_y, 0, 255)
        rec_c = jnp.clip(pred_c + res_c, 0, 255)
        inter_mask = (kind >= 3) & (kind != 8)
        my_ = jnp.repeat(jnp.repeat(inter_mask, 16, 0), 16, 1)
        mc_ = jnp.repeat(jnp.repeat(inter_mask, 8, 0), 8, 1)
        y0 = jnp.where(my_, mbs_to_plane(rec_y), 0)
        u0 = jnp.where(mc_, mbs_to_plane(rec_c[:, :, 0]), 0)
        v0 = jnp.where(mc_, mbs_to_plane(rec_c[:, :, 1]), 0)
    else:
        y0 = jnp.zeros((H, W), jnp.int32)
        u0 = jnp.zeros((H // 2, W // 2), jnp.int32)
        v0 = jnp.zeros((H // 2, W // 2), jnp.int32)

    kind_intra = jnp.where(kind == 0, 0, jnp.where(kind == 1, 1, 2))
    pY, pU, pV = intra_reconstruct(
        (jnp.pad(y0, PAD), jnp.pad(u0, PAD), jnp.pad(v0, PAD)),
        res_y, res_c, kind_intra, f["i16_mode"], f["i4_modes"],
        f["chroma_mode"], f["avail_l"] != 0, f["avail_t"] != 0,
        f["avail_tr"] != 0, gw=gw, gh=gh)

    if deblock:
        mb_is_intra = (kind <= 2) | (kind == 8)
        nnz = f["nnz"].transpose(0, 2, 1, 3).reshape(4 * gh, 4 * gw)
        mvg = f["mv"].transpose(0, 2, 1, 3, 4).reshape(4 * gh, 4 * gw, 2)
        refg = jnp.repeat(jnp.repeat(
            f["ref_idx"].reshape(gh, gw, 2, 2), 2, axis=2), 2, axis=3) \
            .transpose(0, 2, 1, 3).reshape(4 * gh, 4 * gw)
        bs_v, bs_h = compute_bs(
            mb_is_intra, nnz, mvg, refg,
            f["fmb_v"] != 0, f["fmb_h"] != 0, f["fint"] != 0)
        qp_l = jnp.concatenate([qp[:, :1], qp[:, :-1]], axis=1)
        qp_t = jnp.concatenate([qp[:1, :], qp[:-1, :]], axis=0)
        qpc = _J_QPC[jnp.clip(qp + chroma_qp_off, 0, 51)]
        qpc_l = jnp.concatenate([qpc[:, :1], qpc[:, :-1]], axis=1)
        qpc_t = jnp.concatenate([qpc[:1, :], qpc[:-1, :]], axis=0)
        pY, pU, pV = deblock_frame(
            (pY, pU, pV), bs_v, bs_h, qp, qp_l, qp_t, qpc, qpc_l, qpc_t,
            f["alpha_off"], f["beta_off"], gw=gw, gh=gh)

    y = jax.lax.dynamic_slice(pY, (PAD, PAD), (H, W))
    u = jax.lax.dynamic_slice(pU, (PAD, PAD), (H // 2, W // 2))
    v = jax.lax.dynamic_slice(pV, (PAD, PAD), (H // 2, W // 2))
    uv = jnp.stack([u, v], axis=1).reshape(H // 2, W)
    out_u8 = jnp.concatenate([y, uv], axis=0).astype(jnp.uint8)

    padY = jnp.pad(y, PAD, mode="edge")
    padU = jnp.pad(u, PAD, mode="edge")
    padV = jnp.pad(v, PAD, mode="edge")
    return out_u8, padY, padU, padV


def split_out_u8(a: np.ndarray, gw: int, gh: int):
    """Host: (H*3//2, W) uint8 -> packed planar I420 1-D uint8 array."""
    H, W = gh * 16, gw * 16
    y = a[:H]
    uv = a[H:].reshape(H // 2, 2, W // 2)
    return np.concatenate([y.ravel(), uv[:, 0].ravel(), uv[:, 1].ravel()])
