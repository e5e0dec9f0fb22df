"""Batched inter prediction + reconstruction for a whole P frame.

Reference parity: ``hl_codec_264_pred_inter.c:62-299`` (partition loop,
ref-pic select, per-part predict) — re-expressed as one batched MC pass over
every 4x4 block of the frame (given the derived MV field, inter prediction
has no spatial dependencies; the reference itself parallelises it across MB
ranges, ``hl_codec_264_decode_avc.c:149-187``).

Trace-friendly: all index arithmetic uses static numpy constants, so the
function can be called inside jit with traced mv/ref arrays.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from hartallo_tpu.ops.interpol import chroma_mc_blocks, luma_mc_blocks


def _grids(gw: int, gh: int):
    myg, mxg, byg, bxg = np.meshgrid(np.arange(gh), np.arange(gw),
                                     np.arange(4), np.arange(4),
                                     indexing="ij")
    n = gh * gw * 16
    return (jnp.asarray((mxg * 16 + bxg * 4).reshape(n).astype(np.int32)),
            jnp.asarray((myg * 16 + byg * 4).reshape(n).astype(np.int32)),
            jnp.asarray((mxg * 8 + bxg * 2).reshape(n).astype(np.int32)),
            jnp.asarray((myg * 8 + byg * 2).reshape(n).astype(np.int32)))


def inter_predict_frame(ref_y_stack, ref_u_stack, ref_v_stack,
                        mv, ref_idx, gw: int, gh: int):
    """mv (gh,gw,4,4,2) final quarter-pel MVs ([by][bx] raster);
    ref_idx (gh,gw,4) per-8x8 L0 reference indices.

    ref_*_stack: (R, Hp, Wp) padded reference planes.  Returns
    pred_y (gh,gw,16,16), pred_c (gh,gw,2,8,8) int32.  jit-safe.
    """
    n = gh * gw * 16
    mv = jnp.asarray(mv, jnp.int32)
    mvf = mv.reshape(n, 2)
    ref44 = jnp.repeat(jnp.repeat(
        jnp.asarray(ref_idx, jnp.int32).reshape(gh, gw, 2, 2), 2, axis=2),
        2, axis=3)
    reff = ref44.reshape(n)

    bx, by, cbx, cby = _grids(gw, gh)

    pred = luma_mc_blocks(ref_y_stack, bx, by, mvf[:, 0], mvf[:, 1], reff)
    pred_y = pred.reshape(gh, gw, 4, 4, 4, 4).transpose(0, 1, 2, 4, 3, 5) \
        .reshape(gh, gw, 16, 16)

    preds_c = []
    for stack in (ref_u_stack, ref_v_stack):
        pc = chroma_mc_blocks(stack, cbx, cby, mvf[:, 0], mvf[:, 1], reff)
        preds_c.append(
            pc.reshape(gh, gw, 4, 4, 2, 2).transpose(0, 1, 2, 4, 3, 5)
            .reshape(gh, gw, 8, 8))
    pred_c = jnp.stack(preds_c, axis=2)
    return pred_y, pred_c


def mbs_to_plane(mbs: jnp.ndarray) -> jnp.ndarray:
    """(gh,gw,S,S) MB tiles -> (gh*S, gw*S) plane (device-side)."""
    gh, gw, S, _ = mbs.shape
    return mbs.transpose(0, 2, 1, 3).reshape(gh * S, gw * S)


def plane_to_mbs(plane: jnp.ndarray, S: int) -> jnp.ndarray:
    H, W = plane.shape
    return plane.reshape(H // S, S, W // S, S).transpose(0, 2, 1, 3)
