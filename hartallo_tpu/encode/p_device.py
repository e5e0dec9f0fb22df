"""Fused device pipeline for P-frame encoding: one jitted XLA program per
frame (full-search ME -> partition decision -> sub-pel refine -> MC ->
residual transform/quant -> reconstruction), eliminating per-stage host
round trips (the recon planes never leave the device; only the coefficient
arrays and MVs are fetched for host packing)."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hartallo_tpu.core.tables import QP_SCALE_CHROMA, ZIGZAG_4x4_INV
from hartallo_tpu.decode.inter_recon import (inter_predict_frame,
                                             mbs_to_plane, plane_to_mbs)
from hartallo_tpu.decode.intra_recon import PAD
from hartallo_tpu.encode.intra_encode import _blocks_of_mb, _BLK_X, _BLK_Y
from hartallo_tpu.encode.me import _PART_OF_BLK, full_search_int, \
    refine_subpel
from hartallo_tpu.ops.wide import halfpel_planes
from hartallo_tpu.ops.transform import (
    chroma_dc_descale, dequant_4x4, forward_dct_4x4,
    forward_hadamard_quant_dc_chroma, forward_quant_4x4,
    inverse_transform_4x4)

_J_QPC = jnp.asarray(QP_SCALE_CHROMA)
_J_SCANPOS = jnp.asarray(ZIGZAG_4x4_INV.reshape(4, 4))   # raster -> scan
# JVT-O079 2.3 significance of a lone |level|==1 coefficient by its
# zigzag run (reference hl_codec_264_residual.c:889); run >= 6 -> 0
_J_T079 = jnp.asarray([3, 2, 2, 1, 1, 1] + [0] * 11, jnp.int32)


def eliminate_single_coeffs_luma(wq):
    """JVT-O079 2.3 'elimination of single coefficients in inter
    macroblocks' — the JM coefficient-thresholding rule the reference
    applies to every inter MB (hl_codec_264_residual.c:881-897 per-4x4
    Single_ctr; hl_codec_264_rdo.c:2419 drops the whole MB's luma
    residual when the summed significance is < 6).  Costs a handful of
    reductions per block, saves the many bits a near-empty residual
    would spend.  wq (gh, gw, 16, 4, 4) luma levels."""
    az = jnp.abs(wq)
    nz = (az > 0).sum((-2, -1))                        # (gh, gw, 16)
    run = jnp.min(jnp.where(az > 0, _J_SCANPOS[None, None, None], 16),
                  axis=(-2, -1))
    lone1 = (nz == 1) & (az.max((-2, -1)) == 1)
    ctr = jnp.where(nz == 0, 0,
                    jnp.where(lone1, _J_T079[jnp.minimum(run, 16)], 9))
    drop_y = ctr.sum(-1) < 6                           # (gh, gw)
    return jnp.where(drop_y[..., None, None, None], 0, wq)


def eliminate_single_coeffs_chroma(acq):
    """JVT-O079 chroma arm (hl_codec_264_rdo.c:2641-2647): a component
    whose whole AC set is one lone |level|==1 coefficient drops it
    (its significance T[run] <= 3 is always under the chroma threshold
    7).  acq (gh, gw, 2, 4, 4, 4), DC slot already zero."""
    caz = jnp.abs(acq)
    cnz = (caz > 0).sum((-3, -2, -1))                  # (gh, gw, 2)
    lone = (cnz == 1) & (caz.max((-3, -2, -1)) == 1)
    return jnp.where(lone[..., None, None, None], 0, acq)


@partial(jax.jit, static_argnames=("gw", "gh", "rng", "refine",
                                   "chroma_qp_off"))
def p_frame_device(srcY, srcU, srcV, refY, refU, refV, qp, lam,
                   *, gw: int, gh: int, rng: int, refine: bool,
                   chroma_qp_off: int):
    """Returns (wq, dcq, acq, mv_blk, choice, recY, recU, recV,
    best_cost) — rec planes PAD-padded, device-resident; best_cost is
    the winning partition's ME cost per MB (intra-in-P decision
    input)."""
    H, W = gh * 16, gw * 16
    lamf = jnp.float32(lam)

    (b16c, b16v, b168c, b168v, b816c, b816v, b88c, b88v) = \
        full_search_int(srcY, refY, lamf, gw=gw, gh=gh, rng=rng)

    lam_s = lamf
    c16 = b16c + lam_s * 1.0
    c168 = b168c.sum(-1) + lam_s * 3.0
    c816 = b816c.sum(-1) + lam_s * 3.0
    c88 = b88c.sum(-1) + lam_s * 9.0
    cost_stack = jnp.stack([c16, c168, c816, c88])
    choice = jnp.argmin(cost_stack, axis=0)
    best_cost = jnp.min(cost_stack, axis=0)                 # (gh, gw)

    def blk_of(vmap_part, part_map):
        pm = jnp.asarray(part_map.reshape(16))
        return jnp.take_along_axis(
            vmap_part,
            jnp.broadcast_to(pm[None, None, :, None], (gh, gw, 16, 1)),
            axis=2)

    mv16b = jnp.broadcast_to(b16v[:, :, None, :], (gh, gw, 16, 2))
    mv168b = blk_of(b168v, _PART_OF_BLK["16x8"])
    mv816b = blk_of(b816v, _PART_OF_BLK["8x16"])
    mv88b = blk_of(b88v, _PART_OF_BLK["8x8"])
    ch = choice[:, :, None, None]
    mv_blk = jnp.where(ch == 0, mv16b,
                       jnp.where(ch == 1, mv168b,
                                 jnp.where(ch == 2, mv816b, mv88b))) * 4
    pmaps = jnp.stack([jnp.asarray(_PART_OF_BLK[k].reshape(16))
                       for k in ("16x16", "16x8", "8x16", "8x8")])
    part_of_blk = pmaps[choice]

    if refine:
        hp = halfpel_planes(refY)           # shared by both rounds
        mv_blk, _ = refine_subpel(srcY, refY, mv_blk, part_of_blk, lamf, 2,
                                  gw=gw, gh=gh, nparts=4, hp=hp)
        mv_blk, _ = refine_subpel(srcY, refY, mv_blk, part_of_blk, lamf, 1,
                                  gw=gw, gh=gh, nparts=4, hp=hp)

    mv44 = mv_blk.reshape(gh, gw, 4, 4, 2)
    zeros_ref = jnp.zeros((gh, gw, 4), jnp.int32)
    pred_y, pred_c = inter_predict_frame(
        refY[None], refU[None], refV[None], mv44, zeros_ref, gw, gh)

    src_mb = plane_to_mbs(jax.lax.dynamic_slice(srcY, (PAD, PAD), (H, W)),
                          16)
    res = src_mb - pred_y
    blocks = _blocks_of_mb(res)
    wq = forward_quant_4x4(forward_dct_4x4(blocks), qp[..., None], False)
    wq = eliminate_single_coeffs_luma(wq)
    d = dequant_4x4(wq, jnp.broadcast_to(qp[..., None], (gh, gw, 16)))
    r = inverse_transform_4x4(d)
    rec = jnp.zeros((gh, gw, 16, 16), jnp.int32)
    for b in range(16):
        rec = rec.at[:, :, _BLK_Y[b]:_BLK_Y[b] + 4,
                     _BLK_X[b]:_BLK_X[b] + 4].set(r[:, :, b])
    rec_y = jnp.clip(pred_y + rec, 0, 255)

    qpc = _J_QPC[jnp.clip(qp + chroma_qp_off, 0, 51)]
    srcu_mb = plane_to_mbs(jax.lax.dynamic_slice(
        srcU, (PAD, PAD), (H // 2, W // 2)), 8)
    srcv_mb = plane_to_mbs(jax.lax.dynamic_slice(
        srcV, (PAD, PAD), (H // 2, W // 2)), 8)
    src_c = jnp.stack([srcu_mb, srcv_mb], axis=2)
    resc = src_c - pred_c
    cblocks = jnp.stack(
        [resc[..., (b >> 1) * 4:(b >> 1) * 4 + 4,
              (b & 1) * 4:(b & 1) * 4 + 4] for b in range(4)], axis=3)
    wc = forward_dct_4x4(cblocks)
    dc2 = jnp.stack(
        [jnp.stack([wc[..., 0, 0, 0], wc[..., 1, 0, 0]], -1),
         jnp.stack([wc[..., 2, 0, 0], wc[..., 3, 0, 0]], -1)], -2)
    dcq = forward_hadamard_quant_dc_chroma(dc2, qpc[..., None], False)
    acq = forward_quant_4x4(wc, qpc[..., None, None], False, skip_dc=True)
    acq = eliminate_single_coeffs_chroma(acq)
    dcd = chroma_dc_descale(dcq, qpc[..., None])
    dd = dequant_4x4(acq, jnp.broadcast_to(qpc[..., None, None],
                                           (gh, gw, 2, 4)))
    blk_r = jnp.arange(4) // 2
    blk_c = jnp.arange(4) % 2
    dd = dd.at[..., 0, 0].set(dcd[..., blk_r, blk_c])
    rr = inverse_transform_4x4(dd)
    recc = jnp.zeros((gh, gw, 2, 8, 8), jnp.int32)
    for b in range(4):
        recc = recc.at[..., (b >> 1) * 4:(b >> 1) * 4 + 4,
                       (b & 1) * 4:(b & 1) * 4 + 4].set(rr[..., b, :, :])
    rec_c = jnp.clip(pred_c + recc, 0, 255)

    # edge pad (not zeros): the decoder's reference ring edge-pads, and
    # MC windows clamped into the pad must read identical samples
    recY = jnp.pad(mbs_to_plane(rec_y), PAD, mode="edge")
    recU = jnp.pad(mbs_to_plane(rec_c[:, :, 0]), PAD, mode="edge")
    recV = jnp.pad(mbs_to_plane(rec_c[:, :, 1]), PAD, mode="edge")
    return wq, dcq, acq, mv44, choice, recY, recU, recV, best_cost
