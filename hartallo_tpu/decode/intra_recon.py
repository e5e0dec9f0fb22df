"""Device-side intra reconstruction: batched wavefront over MB anti-diagonals.

The reference decodes intra MBs serially in raster order
(``hl_codec_264_decode_avc.c:190-211``); the TPU re-expression runs a
``lax.scan`` over anti-diagonals d = mx + 2*my (the top-right dependency of
Intra4x4 forces slope 2), processing every MB on a diagonal in parallel and
the 16 4x4 sub-blocks of each MB as 16 statically-unrolled batched steps.

Residual decode (dequant + IDCT) is fully batched over the whole frame
first — it has no spatial dependencies.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hartallo_tpu.core.tables import (LUMA_4x4_BLK_IDX, LUMA_4x4_BLK_XY,
                                      QP_SCALE_CHROMA)
from hartallo_tpu.ops.intra import pred16x16_all, pred4x4_all, pred_chroma_all
from hartallo_tpu.ops.transform import (chroma_dc_descale, dequant_4x4,
                                        inverse_transform_4x4,
                                        luma_dc_descale_intra16)

PAD = 32  # plane padding (also the dead-zone target for masked-out writes)

_BLK_X = (LUMA_4x4_BLK_XY[:, 0]).astype(int)   # pixel offsets in MB
_BLK_Y = (LUMA_4x4_BLK_XY[:, 1]).astype(int)
# 4x4 blocks whose top-right neighbour is never available (decode order)
_TR_NEVER = {3, 7, 11, 13, 15}
# blkIdx 5 needs the above-right MB (unavailable at the right frame edge)
_TR_EDGE_BLK = 5

_J_QP_CHROMA = jnp.asarray(QP_SCALE_CHROMA)


# ---------------------------------------------------------------------------
# Residual assembly (frame-batched)
# ---------------------------------------------------------------------------

def compute_residuals(luma_ac, luma_dc, chroma_ac, chroma_dc, qp,
                      is_i16, chroma_qp_index_offset: int):
    """Returns (res_y (gh,gw,16,16), res_c (gh,gw,2,8,8)) int32.

    luma_ac (gh,gw,16,4,4) raster coeffs per blkIdx; luma_dc (gh,gw,4,4);
    chroma_ac (gh,gw,2,4,4,4); chroma_dc (gh,gw,2,2,2); qp (gh,gw);
    is_i16 (gh,gw) bool.
    """
    gh, gw = qp.shape
    qp = qp.astype(jnp.int32)
    qpb = qp[..., None]                                   # (gh,gw,1)

    d = dequant_4x4(luma_ac, jnp.broadcast_to(qpb, (gh, gw, 16)))
    # Intra16x16: replace DC with descaled Hadamard DC
    dc = luma_dc_descale_intra16(luma_dc, qp)             # (gh,gw,4,4)
    # dc[i][j] belongs to the block at spatial block-row i, block-col j
    blk_row = jnp.asarray(_BLK_Y) // 4                    # (16,)
    blk_col = jnp.asarray(_BLK_X) // 4
    dc_per_blk = dc[:, :, blk_row, blk_col]               # (gh,gw,16)
    use_dc = is_i16[..., None]
    d = d.at[..., 0, 0].set(jnp.where(use_dc, dc_per_blk, d[..., 0, 0]))
    r = inverse_transform_4x4(d)                          # (gh,gw,16,4,4)
    res_y = jnp.zeros((gh, gw, 16, 16), jnp.int32)
    for blk in range(16):
        res_y = res_y.at[:, :, _BLK_Y[blk]:_BLK_Y[blk] + 4,
                         _BLK_X[blk]:_BLK_X[blk] + 4].set(r[:, :, blk])

    # chroma
    qpc_idx = jnp.clip(qp + chroma_qp_index_offset, 0, 51)
    qpc = _J_QP_CHROMA[qpc_idx]                           # (gh,gw)
    dcc = chroma_dc_descale(chroma_dc, qpc[..., None])    # (gh,gw,2,2,2)
    dac = dequant_4x4(chroma_ac,
                      jnp.broadcast_to(qpc[..., None, None], (gh, gw, 2, 4)))
    blk_r = jnp.arange(4) // 2
    blk_c = jnp.arange(4) % 2
    dcc_per_blk = dcc[:, :, :, blk_r, blk_c]              # (gh,gw,2,4)
    dac = dac.at[..., 0, 0].set(dcc_per_blk)
    rc = inverse_transform_4x4(dac)                       # (gh,gw,2,4,4,4)
    res_c = jnp.zeros((gh, gw, 2, 8, 8), jnp.int32)
    for blk in range(4):
        by, bx = (blk >> 1) * 4, (blk & 1) * 4
        res_c = res_c.at[:, :, :, by:by + 4, bx:bx + 4].set(rc[:, :, :, blk])
    return res_y, res_c


# ---------------------------------------------------------------------------
# Wavefront scheduling (host precompute)
# ---------------------------------------------------------------------------

def wavefront_schedule(gw: int, gh: int):
    """Anti-diagonals d = mx + 2*my; returns (D, M, 2) int32 (my, mx) with
    (-1,-1) padding and the per-step count."""
    D = gw + 2 * gh - 1
    rows = []
    mmax = 0
    for d in range(D):
        mbs = [(my, d - 2 * my) for my in range(gh)
               if 0 <= d - 2 * my < gw]
        mmax = max(mmax, len(mbs))
        rows.append(mbs)
    out = np.full((D, mmax, 2), -1, np.int32)
    for d, mbs in enumerate(rows):
        for k, (my, mx) in enumerate(mbs):
            out[d, k] = (my, mx)
    return out


# ---------------------------------------------------------------------------
# The wavefront scan
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("gw", "gh"))
def intra_reconstruct(planes, res_y, res_c, mb_kind, i16_mode, i4_modes,
                      chroma_mode, avail_left, avail_top, schedule,
                      *, gw: int, gh: int):
    """Run the intra wavefront; returns updated padded planes.

    planes: (padY (H+2P, W+2P), padU, padV (halved dims + 2P)) int32,
      pre-filled with inter/PCM pixels and boundary padding.
    mb_kind: (gh,gw) int32 — 0=I4x4, 1=I16, others untouched.
    avail_*: (gh,gw) bool (same-slice neighbor availability).
    schedule: (D, M, 2) int32 from wavefront_schedule.
    """
    padY, padU, padV = planes
    D, M, _ = schedule.shape

    def step(carry, sched_d):
        pY, pU, pV = carry
        my = sched_d[:, 0]
        mx = sched_d[:, 1]
        valid = my >= 0
        myc = jnp.maximum(my, 0)
        mxc = jnp.maximum(mx, 0)
        flat = myc * gw + mxc

        kind = mb_kind.reshape(-1)[flat]
        is_i4 = (kind == 0) & valid
        is_i16 = (kind == 1) & valid
        is_intra = is_i4 | is_i16
        al = avail_left.reshape(-1)[flat]
        at = avail_top.reshape(-1)[flat]
        i16m = i16_mode.reshape(-1)[flat]
        i4m = i4_modes.reshape(-1, 16)[flat]
        cm = chroma_mode.reshape(-1)[flat]
        resy = res_y.reshape(-1, 16, 16)[flat]
        resc = res_c.reshape(-1, 2, 8, 8)[flat]

        # write offsets: padded coords; invalid slots target the dead zone
        oy = jnp.where(valid, PAD + myc * 16, 0)
        ox = jnp.where(valid, PAD + mxc * 16, 0)

        tile = jax.vmap(
            lambda y, x: jax.lax.dynamic_slice(pY, (y - 1, x - 1), (17, 25))
        )(oy, ox)                                          # (M,17,25)

        interior0 = tile[:, 1:17, 1:17]

        # ---- Intra4x4: 16 sequential sub-blocks --------------------------
        t4 = tile
        at_edge = (mx == gw - 1)
        for blk in range(16):
            x0, y0 = _BLK_X[blk] + 1, _BLK_Y[blk] + 1   # tile coords
            top = t4[:, y0 - 1, x0:x0 + 8]               # (M,8)
            left = t4[:, y0:y0 + 4, x0 - 1]              # (M,4)
            tl = t4[:, y0 - 1, x0 - 1]
            # top-right substitution
            if blk in _TR_NEVER:
                sub = jnp.ones((M,), bool)
            elif blk == _TR_EDGE_BLK:
                sub = at_edge
            else:
                sub = jnp.zeros((M,), bool)
            t3 = top[:, 3:4]
            top = jnp.where(sub[:, None] & (jnp.arange(8) >= 4), t3, top)
            b_at = at if _BLK_Y[blk] == 0 else jnp.ones((M,), bool)
            b_al = al if _BLK_X[blk] == 0 else jnp.ones((M,), bool)
            bank = pred4x4_all(top, left, tl, b_at, b_al)  # (M,9,4,4)
            mode = jnp.clip(i4m[:, blk].astype(jnp.int32), 0, 8)
            pred = jnp.take_along_axis(
                bank, mode[:, None, None, None], axis=1)[:, 0]
            rb = resy[:, _BLK_Y[blk]:_BLK_Y[blk] + 4,
                      _BLK_X[blk]:_BLK_X[blk] + 4]
            rec = jnp.clip(pred + rb, 0, 255)
            t4 = t4.at[:, y0:y0 + 4, x0:x0 + 4].set(rec)
        interior_i4 = t4[:, 1:17, 1:17]

        # ---- Intra16x16 --------------------------------------------------
        top16 = tile[:, 0, 1:17]
        left16 = tile[:, 1:17, 0]
        tl16 = tile[:, 0, 0]
        bank16 = pred16x16_all(top16, left16, tl16, at, al)
        p16 = jnp.take_along_axis(
            bank16, jnp.clip(i16m, 0, 3).astype(jnp.int32)
            [:, None, None, None], axis=1)[:, 0]
        interior_i16 = jnp.clip(p16 + resy, 0, 255)

        interior = jnp.where(is_i4[:, None, None], interior_i4,
                             jnp.where(is_i16[:, None, None], interior_i16,
                                       interior0))
        pY = _scatter_tiles(pY, interior, oy, ox, 16)

        # ---- chroma (both intra kinds share the chroma mode) -------------
        oyc = jnp.where(valid, PAD + myc * 8, 0)
        oxc = jnp.where(valid, PAD + mxc * 8, 0)
        for plane_idx, p in ((0, pU), (1, pV)):
            ctile = jax.vmap(
                lambda y, x, pp=p: jax.lax.dynamic_slice(
                    pp, (y - 1, x - 1), (9, 9))
            )(oyc, oxc)
            topc = ctile[:, 0, 1:9]
            leftc = ctile[:, 1:9, 0]
            tlc = ctile[:, 0, 0]
            bankc = pred_chroma_all(topc, leftc, tlc, at, al)
            pc = jnp.take_along_axis(
                bankc, jnp.clip(cm, 0, 3).astype(jnp.int32)
                [:, None, None, None], axis=1)[:, 0]
            recc = jnp.clip(pc + resc[:, plane_idx], 0, 255)
            intc = jnp.where(is_intra[:, None, None], recc,
                             ctile[:, 1:9, 1:9])
            newp = _scatter_tiles(p, intc, oyc, oxc, 8)
            if plane_idx == 0:
                pU = newp
            else:
                pV = newp
        return (pY, pU, pV), None

    (padY, padU, padV), _ = jax.lax.scan(step, (padY, padU, padV), schedule)
    return padY, padU, padV


def _scatter_tiles(plane, tiles, oy, ox, size):
    def write(p, t, y, x):
        return jax.lax.dynamic_update_slice(p, t, (y, x))

    def body(p, args):
        t, y, x = args
        return write(p, t, y, x), None

    plane, _ = jax.lax.scan(body, plane, (tiles, oy, ox))
    return plane


# ---------------------------------------------------------------------------
# Availability masks (host)
# ---------------------------------------------------------------------------

def availability_masks(slice_id: np.ndarray, constrained: bool,
                       mb_is_inter: np.ndarray):
    """Returns (avail_left, avail_top) bool (gh,gw) for intra prediction.

    A neighbor is available if it exists, lies in the same slice, and — with
    constrained_intra_pred — is not inter-coded (spec 6.4.9 + 8.3.1)."""
    gh, gw = slice_id.shape
    same_l = np.zeros((gh, gw), bool)
    same_t = np.zeros((gh, gw), bool)
    same_l[:, 1:] = (slice_id[:, 1:] == slice_id[:, :-1]) & \
        (slice_id[:, 1:] >= 0)
    same_t[1:, :] = (slice_id[1:, :] == slice_id[:-1, :]) & \
        (slice_id[1:, :] >= 0)
    if constrained:
        inter_l = np.zeros((gh, gw), bool)
        inter_t = np.zeros((gh, gw), bool)
        inter_l[:, 1:] = mb_is_inter[:, :-1]
        inter_t[1:, :] = mb_is_inter[:-1, :]
        same_l &= ~inter_l
        same_t &= ~inter_t
    return same_l, same_t
