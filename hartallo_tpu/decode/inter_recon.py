"""Batched inter prediction + reconstruction for a whole P frame.

Reference parity: ``hl_codec_264_pred_inter.c:62-299`` (partition loop,
ref-pic select, per-part predict) — re-expressed as one batched MC pass over
every 4x4 block of the frame (given the derived MV field, inter prediction
has no spatial dependencies; the reference itself parallelises it across MB
ranges, ``hl_codec_264_decode_avc.c:149-187``).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from hartallo_tpu.ops.interpol import chroma_mc_blocks, luma_mc_blocks


def inter_predict_frame(ref_y_stack, ref_u_stack, ref_v_stack,
                        mv: np.ndarray, ref_idx: np.ndarray,
                        gw: int, gh: int):
    """mv (gh,gw,4,4,2) final quarter-pel MVs; ref_idx (gh,gw,4) per-8x8.

    ref_*_stack: (R, Hp, Wp) padded reference planes (list index = RefPicList0
    position).  Returns pred_y (gh,gw,16,16), pred_c (gh,gw,2,8,8) int32.
    """
    n = gh * gw * 16
    # block order: (my, mx, by, bx)
    mvf = mv.reshape(gh, gw, 16, 2).reshape(n, 2)
    # expand per-8x8 refs to per-4x4 blocks
    ref44 = np.repeat(np.repeat(ref_idx.reshape(gh, gw, 2, 2), 2, axis=2),
                      2, axis=3)       # (gh,gw,4,4) in (by,bx) raster
    reff = ref44.reshape(n).astype(np.int32)

    myg, mxg, byg, bxg = np.meshgrid(np.arange(gh), np.arange(gw),
                                     np.arange(4), np.arange(4),
                                     indexing="ij")
    bx = (mxg * 16 + bxg * 4).reshape(n).astype(np.int32)
    by = (myg * 16 + byg * 4).reshape(n).astype(np.int32)

    pred = luma_mc_blocks(ref_y_stack, jnp.asarray(bx), jnp.asarray(by),
                          jnp.asarray(mvf[:, 0].astype(np.int32)),
                          jnp.asarray(mvf[:, 1].astype(np.int32)),
                          jnp.asarray(reff))
    pred_y = pred.reshape(gh, gw, 4, 4, 4, 4).transpose(0, 1, 2, 4, 3, 5) \
        .reshape(gh, gw, 16, 16)

    cbx = jnp.asarray((mxg * 8 + bxg * 2).reshape(n).astype(np.int32))
    cby = jnp.asarray((myg * 8 + byg * 2).reshape(n).astype(np.int32))
    preds_c = []
    for stack in (ref_u_stack, ref_v_stack):
        pc = chroma_mc_blocks(stack, cbx, cby,
                              jnp.asarray(mvf[:, 0].astype(np.int32)),
                              jnp.asarray(mvf[:, 1].astype(np.int32)),
                              jnp.asarray(reff))
        preds_c.append(
            pc.reshape(gh, gw, 4, 4, 2, 2).transpose(0, 1, 2, 4, 3, 5)
            .reshape(gh, gw, 8, 8))
    pred_c = jnp.stack(preds_c, axis=2)           # (gh,gw,2,8,8)
    return pred_y, pred_c
