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
from hartallo_tpu.ops.wavefront import (plane_to_tiles, shift_k, skew,
                                        skew_geometry, tiles_to_plane,
                                        unskew)
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

def _dequant_w(c, qp, ls):
    """8.5.12.1 with an explicit LevelScale tensor (weightScale applied);
    c (...,4,4), qp (...,), ls (...,4,4).  Reference
    hl_codec_264_quant.c:68-110."""
    c = c.astype(jnp.int32)
    qp = jnp.asarray(qp, jnp.int32)
    qdiv = (qp // 6)[..., None, None]
    hi = (c * ls) << jnp.maximum(qdiv - 4, 0)
    lo = (c * ls + (1 << jnp.maximum(3 - qdiv, 0))) >> \
        jnp.maximum(4 - qdiv, 0)
    return jnp.where(qp[..., None, None] >= 24, hi, lo)


def _dc_descale_luma_w(c, qp, scale00):
    """8.5.10 with explicit LevelScale[0][0] (...,) per MB."""
    from hartallo_tpu.ops.transform import _hadamard_4x4
    f = _hadamard_4x4(c.astype(jnp.int32))
    qp = jnp.asarray(qp, jnp.int32)
    scale = scale00[..., None, None]
    qdiv = (qp // 6)[..., None, None]
    hi = (f * scale) << jnp.maximum(qdiv - 6, 0)
    lo = (f * scale + (1 << jnp.maximum(5 - qdiv, 0))) >> \
        jnp.maximum(6 - qdiv, 0)
    return jnp.where(qp[..., None, None] >= 36, hi, lo)


def _dc_descale_chroma_w(c, qp, scale00):
    """8.5.11 (4:2:0) with explicit LevelScale[0][0] (...,) per MB."""
    from hartallo_tpu.ops.transform import _hadamard_2x2
    f = _hadamard_2x2(c.astype(jnp.int32))
    qp = jnp.asarray(qp, jnp.int32)
    return ((f * scale00[..., None, None]) <<
            (qp // 6)[..., None, None]) >> 5


def compute_residuals(luma_ac, luma_dc, chroma_ac, chroma_dc, qp,
                      is_i16, chroma_qp_index_offset: int,
                      weight4x4=None, mb_is_inter=None):
    """Returns (res_y (gh,gw,16,16), res_c (gh,gw,2,8,8)) int32.

    luma_ac (gh,gw,16,4,4) raster coeffs per blkIdx; luma_dc (gh,gw,4,4);
    chroma_ac (gh,gw,2,4,4,4); chroma_dc (gh,gw,2,2,2); qp (gh,gw);
    is_i16 (gh,gw) bool.

    weight4x4: optional (2, 3, 4, 4) int32 weightScale (non-flat scaling
    lists, 8.5.9); mb_is_inter (gh, gw) bool then selects the list class.
    The chroma DC descale indexes the INTRA lists regardless, matching
    the reference (hl_codec_264_transf.c:684-702).
    """
    gh, gw = qp.shape
    qp = qp.astype(jnp.int32)
    qpb = qp[..., None]                                   # (gh,gw,1)

    if weight4x4 is not None:
        from hartallo_tpu.core import tables as _T
        LS = weight4x4[:, :, None] * jnp.asarray(_T.QUANT_V)[None, None]
        inter = jnp.asarray(mb_is_inter, jnp.int32)       # (gh,gw)
        m6 = qp % 6
        ls_y = LS[inter, 0, m6]                           # (gh,gw,4,4)
        d = _dequant_w(luma_ac, jnp.broadcast_to(qpb, (gh, gw, 16)),
                       ls_y[:, :, None])
        dc = _dc_descale_luma_w(luma_dc, qp, LS[0, 0, m6, 0, 0])
        blk_row = jnp.asarray(_BLK_Y) // 4
        blk_col = jnp.asarray(_BLK_X) // 4
        dc_per_blk = dc[:, :, blk_row, blk_col]
        use_dc = is_i16[..., None]
        d = d.at[..., 0, 0].set(jnp.where(use_dc, dc_per_blk,
                                          d[..., 0, 0]))
        r = inverse_transform_4x4(d)
        res_y = jnp.zeros((gh, gw, 16, 16), jnp.int32)
        for blk in range(16):
            res_y = res_y.at[:, :, _BLK_Y[blk]:_BLK_Y[blk] + 4,
                             _BLK_X[blk]:_BLK_X[blk] + 4].set(r[:, :, blk])
        qpc_idx = jnp.clip(qp + chroma_qp_index_offset, 0, 51)
        qpc = _J_QP_CHROMA[qpc_idx]
        mc6 = qpc % 6
        cidx = jnp.asarray([1, 2])                        # Cb, Cr classes
        dcc = jnp.stack(
            [_dc_descale_chroma_w(chroma_dc[:, :, c], qpc,
                                  LS[0, c + 1, mc6, 0, 0])
             for c in range(2)], axis=2)                  # (gh,gw,2,2,2)
        ls_c = jnp.stack([LS[inter, c + 1, mc6] for c in range(2)],
                         axis=2)                          # (gh,gw,2,4,4)
        dac = _dequant_w(
            chroma_ac,
            jnp.broadcast_to(qpc[..., None, None], (gh, gw, 2, 4)),
            ls_c[:, :, :, None])
        blk_r = jnp.arange(4) // 2
        blk_c = jnp.arange(4) % 2
        dac = dac.at[..., 0, 0].set(dcc[:, :, :, blk_r, blk_c])
        rc = inverse_transform_4x4(dac)                   # (gh,gw,2,4,4,4)
        res_c = jnp.zeros((gh, gw, 2, 8, 8), jnp.int32)
        for b in range(4):
            r0, c0 = (b // 2) * 4, (b % 2) * 4
            res_c = res_c.at[:, :, :, r0:r0 + 4, c0:c0 + 4] \
                .set(rc[:, :, :, b])
        return res_y, res_c

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
# The wavefront scan (skewed-diagonal layout, see ops/wavefront.py)
# ---------------------------------------------------------------------------

def _neighbor_tile17x25(cur, r1, r2, r3):
    """Build the (K,17,25) bordered tile from the skewed carry rows.

    cur (K,16,16) current base tile; r1/r2/r3 = recon rows d-1/d-2/d-3.
    Border row -1 = [top-left corner, top bottom row, top-right bottom row
    first 8]; border col -1 = left MB's right column."""
    K = cur.shape[0]
    top = shift_k(r2)                       # (d-2, k-1)
    tr = shift_k(r1)                        # (d-1, k-1)
    tl = shift_k(r3)                        # (d-3, k-1)
    row_m1 = jnp.concatenate(
        [tl[:, 15, 15:16], top[:, 15, :], tr[:, 15, 0:8]], axis=1)  # (K,25)
    left_col = r1[:, :, 15]                 # (K,16)
    body = jnp.concatenate([left_col[:, :, None], cur,
                            jnp.zeros((K, 16, 8), cur.dtype)], axis=2)
    return jnp.concatenate([row_m1[:, None, :], body], axis=1)  # (K,17,25)


def _neighbor_tile9x9(cur, r1, r2, r3):
    """Chroma analog: (K,9,9) bordered tile from 8x8 carry rows."""
    K = cur.shape[0]
    top = shift_k(r2)
    tl = shift_k(r3)
    row_m1 = jnp.concatenate([tl[:, 7, 7:8], top[:, 7, :]], axis=1)  # (K,9)
    left_col = r1[:, :, 7]
    body = jnp.concatenate([left_col[:, :, None], cur], axis=2)
    return jnp.concatenate([row_m1[:, None, :], body], axis=1)


@partial(jax.jit, static_argnames=("gw", "gh"))
def intra_reconstruct(planes, res_y, res_c, mb_kind, i16_mode, i4_modes,
                      chroma_mode, avail_left, avail_top, avail_tr=None,
                      *, gw: int, gh: int):
    """Run the intra wavefront; returns updated padded planes.

    planes: (padY (H+2P, W+2P), padU, padV (halved dims + 2P)) int32,
      pre-filled with inter/PCM pixels and boundary padding.
    mb_kind: (gh,gw) int32 — 0=I4x4, 1=I16, others untouched.
    avail_*: (gh,gw) bool (same-slice neighbor availability).
    """
    padY, padU, padV = planes
    H, W = gh * 16, gw * 16
    geo = skew_geometry(gw, gh)
    D, K = geo["D"], geo["K"]
    valid = jnp.asarray(geo["valid"])
    sk = lambda a: skew(a, geo)                              # noqa: E731

    ty = sk(plane_to_tiles(
        jax.lax.dynamic_slice(padY, (PAD, PAD), (H, W)), 16))
    tu = sk(plane_to_tiles(
        jax.lax.dynamic_slice(padU, (PAD, PAD), (H // 2, W // 2)), 8))
    tv = sk(plane_to_tiles(
        jax.lax.dynamic_slice(padV, (PAD, PAD), (H // 2, W // 2)), 8))

    if avail_tr is None:
        avail_tr = jnp.ones((gh, gw), bool)
    xs = (ty, tu, tv, sk(res_y), sk(res_c),
          jnp.where(valid, sk(mb_kind), -1),
          sk(i16_mode), sk(i4_modes), sk(chroma_mode),
          jnp.where(valid, sk(avail_left), False),
          jnp.where(valid, sk(avail_top), False),
          jnp.where(valid, sk(avail_tr), False),
          jnp.where(valid, jnp.asarray(geo["mx_of"]), -1))

    def step(carry, x):
        r1y, r2y, r3y, r1u, r2u, r3u, r1v, r2v, r3v = carry
        (cy, cu, cv, resy, resc, kind, i16m, i4m, cm, al, at, atr,
         mxs) = x

        is_i4 = kind == 0
        is_i16 = kind == 1
        is_intra = is_i4 | is_i16

        tile = _neighbor_tile17x25(cy, r1y, r2y, r3y)
        interior0 = cy

        # ---- Intra4x4: 16 sequential sub-blocks --------------------------
        t4 = tile
        at_edge = mxs == gw - 1
        for blk in range(16):
            x0, y0 = _BLK_X[blk] + 1, _BLK_Y[blk] + 1   # tile coords
            top = t4[:, y0 - 1, x0:x0 + 8]               # (K,8)
            left = t4[:, y0:y0 + 4, x0 - 1]              # (K,4)
            tl = t4[:, y0 - 1, x0 - 1]
            # top-right substitution (frame edge OR unavailable
            # above-right MB, e.g. across an FMO slice-group boundary)
            if blk in _TR_NEVER:
                sub = jnp.ones_like(at_edge)
            elif blk == _TR_EDGE_BLK:
                sub = at_edge | ~atr
            else:
                sub = jnp.zeros_like(at_edge)
            t3 = top[:, 3:4]
            top = jnp.where(sub[:, None] & (jnp.arange(8) >= 4), t3, top)
            b_at = at if _BLK_Y[blk] == 0 else jnp.ones_like(at)
            b_al = al if _BLK_X[blk] == 0 else jnp.ones_like(al)
            bank = pred4x4_all(top, left, tl, b_at, b_al)  # (K,9,4,4)
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

        new_y = jnp.where(is_i4[:, None, None], interior_i4,
                          jnp.where(is_i16[:, None, None], interior_i16,
                                    interior0))

        # ---- chroma (both intra kinds share the chroma mode) -------------
        new_c = []
        for plane_idx, (cc, r1, r2, r3) in (
                (0, (cu, r1u, r2u, r3u)), (1, (cv, r1v, r2v, r3v))):
            ctile = _neighbor_tile9x9(cc, r1, r2, r3)
            topc = ctile[:, 0, 1:9]
            leftc = ctile[:, 1:9, 0]
            tlc = ctile[:, 0, 0]
            bankc = pred_chroma_all(topc, leftc, tlc, at, al)
            pc = jnp.take_along_axis(
                bankc, jnp.clip(cm, 0, 3).astype(jnp.int32)
                [:, None, None, None], axis=1)[:, 0]
            recc = jnp.clip(pc + resc[:, plane_idx], 0, 255)
            new_c.append(jnp.where(is_intra[:, None, None], recc, cc))
        new_u, new_v = new_c

        new_carry = (new_y, r1y, r2y, new_u, r1u, r2u, new_v, r1v, r2v)
        return new_carry, (new_y, new_u, new_v)

    zy = jnp.zeros((K, 16, 16), jnp.int32)
    zc = jnp.zeros((K, 8, 8), jnp.int32)
    init = (zy, zy, zy, zc, zc, zc, zc, zc, zc)
    _, (oy, ou, ov) = jax.lax.scan(step, init, xs)

    newY = tiles_to_plane(unskew(oy, geo))
    newU = tiles_to_plane(unskew(ou, geo))
    newV = tiles_to_plane(unskew(ov, geo))
    padY = jax.lax.dynamic_update_slice(padY, newY, (PAD, PAD))
    padU = jax.lax.dynamic_update_slice(padU, newU, (PAD, PAD))
    padV = jax.lax.dynamic_update_slice(padV, newV, (PAD, PAD))
    return padY, padU, padV


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


def availability_tl(slice_id: np.ndarray, constrained: bool,
                    mb_is_inter: np.ndarray) -> np.ndarray:
    """Top-left MB availability (gh,gw) — intra modes that read the
    corner sample (I16/chroma plane; I4x4 DDR/VR/HD on block 0) need it
    (6.4.9)."""
    gh, gw = slice_id.shape
    tl = np.zeros((gh, gw), bool)
    tl[1:, 1:] = (slice_id[:-1, :-1] == slice_id[1:, 1:]) & \
        (slice_id[1:, 1:] >= 0)
    if constrained:
        tl[1:, 1:] &= ~mb_is_inter[:-1, :-1]
    return tl


def availability_tr(slice_id: np.ndarray, constrained: bool,
                    mb_is_inter: np.ndarray) -> np.ndarray:
    """Above-right MB availability (gh,gw) — intra 4x4 blk 5 reads the
    above-right macroblock's bottom row, which is unavailable across a
    slice boundary (6.4.9), e.g. at FMO slice-group edges."""
    gh, gw = slice_id.shape
    tr = np.zeros((gh, gw), bool)
    tr[1:, :-1] = (slice_id[:-1, 1:] == slice_id[1:, :-1]) & \
        (slice_id[1:, :-1] >= 0)
    if constrained:
        tr[1:, :-1] &= ~mb_is_inter[:-1, 1:]
    return tr
