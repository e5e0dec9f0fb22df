"""Fused device pre-pass for frame reconstruction: residual decode +
inter/I_BL prediction + initial plane composition in one jitted program
(the wavefront intra pass and the deblocker consume its outputs without
touching the host)."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hartallo_tpu.decode.inter_recon import (inter_predict_frame,
                                             mbs_to_plane)
from hartallo_tpu.decode.intra_recon import PAD, compute_residuals


@partial(jax.jit, static_argnames=("gw", "gh", "has_inter", "has_ibl",
                                   "chroma_qp_off", "use_weights",
                                   "has_respred"))
def decode_frame_pre(luma_ac, luma_dc, chroma_ac, chroma_dc, qp, is_i16,
                     mv, ref_idx, ref_y, ref_u, ref_v,
                     up_y_mb, up_c_mb, kind,
                     pcm_y, pcm_u, pcm_v, weight4x4,
                     res_add_y, res_add_c, rp_mask,
                     *, gw: int, gh: int, has_inter: bool, has_ibl: bool,
                     chroma_qp_off: int, use_weights: bool = False,
                     has_respred: bool = False):
    """kind: (gh,gw) int32 raw mb_kind (0..8); pcm_*: full planes holding
    I_PCM samples (zeros elsewhere); weight4x4: (2,3,4,4) scaling-list
    weightScale (used when use_weights); res_add_y/res_add_c + rp_mask:
    SVC inter-layer residual prediction (G.8.5.3 accumulation: residuals
    sum under clip3(+-255) before reconstruction).  Returns (padY, padU,
    padV, res_y, res_c)."""
    H, W = gh * 16, gw * 16
    res_y, res_c = compute_residuals(
        luma_ac, luma_dc, chroma_ac, chroma_dc, qp, is_i16, chroma_qp_off,
        weight4x4=weight4x4 if use_weights else None,
        mb_is_inter=(kind >= 3) & (kind != 8))
    if has_respred:
        # per-MB residual accumulation with the reference-layer rS
        m16 = jnp.repeat(jnp.repeat(rp_mask, 16, 0), 16, 1)
        m8 = jnp.repeat(jnp.repeat(rp_mask, 8, 0), 8, 1)
        ay = res_add_y.reshape(gh, 16, gw, 16).transpose(0, 2, 1, 3)
        acb = res_add_c[0].reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)
        acr = res_add_c[1].reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)
        ac = jnp.stack([acb, acr], axis=2)
        m16t = m16.reshape(gh, 16, gw, 16).transpose(0, 2, 1, 3)
        m8t = m8.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)[:, :, None]
        res_y = jnp.where(m16t, jnp.clip(res_y + ay, -255, 255), res_y)
        res_c = jnp.where(m8t, jnp.clip(res_c + ac, -255, 255), res_c)

    y0 = pcm_y
    u0 = pcm_u
    v0 = pcm_v

    def overlay(y0, u0, v0, mask, rec_y_mb, rec_c_mb):
        my = jnp.repeat(jnp.repeat(mask, 16, 0), 16, 1)
        mc = jnp.repeat(jnp.repeat(mask, 8, 0), 8, 1)
        y0 = jnp.where(my, mbs_to_plane(rec_y_mb), y0)
        u0 = jnp.where(mc, mbs_to_plane(rec_c_mb[:, :, 0]), u0)
        v0 = jnp.where(mc, mbs_to_plane(rec_c_mb[:, :, 1]), v0)
        return y0, u0, v0

    if has_inter:
        pred_y, pred_c = inter_predict_frame(ref_y, ref_u, ref_v, mv,
                                             ref_idx, gw, gh)
        rec_y = jnp.clip(pred_y + res_y, 0, 255)
        rec_c = jnp.clip(pred_c + res_c, 0, 255)
        inter_mask = (kind >= 3) & (kind != 8)
        y0, u0, v0 = overlay(y0, u0, v0, inter_mask, rec_y, rec_c)
    if has_ibl:
        ibl_y = jnp.clip(up_y_mb + res_y, 0, 255)
        ibl_c = jnp.clip(up_c_mb + res_c, 0, 255)
        y0, u0, v0 = overlay(y0, u0, v0, kind == 8, ibl_y, ibl_c)

    return (jnp.pad(y0, PAD), jnp.pad(u0, PAD), jnp.pad(v0, PAD),
            res_y, res_c)


@jax.jit
def edge_pad_device(plane_pad: jnp.ndarray) -> jnp.ndarray:
    """Replace the zero border of a PAD-padded plane with edge replication
    (MC-ready reference plane) — stays on device."""
    interior = plane_pad[PAD:-PAD, PAD:-PAD]
    return jnp.pad(interior, PAD, mode="edge")


@jax.jit
def crop_to_host(plane_pad: jnp.ndarray) -> jnp.ndarray:
    return plane_pad[PAD:-PAD, PAD:-PAD].astype(jnp.uint8)
