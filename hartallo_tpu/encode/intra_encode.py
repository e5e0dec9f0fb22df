"""Intra mode decision + coefficient generation + reconstruction, as one
batched wavefront scan (the encoder's analog of decode/intra_recon.py).

Reference parity: ``hl_codec_264_rdo.c:99-300`` (guess_best_intra_pred:
Intra16x16 all 4 modes vs Intra4x4 9 modes/block, chroma from winner) —
re-expressed with SAD + lambda*bits mode costs (the reference's
distortion_mesure_type=SAD operating point) computed for *all* modes at
once and selected with argmin; the chosen mode is then transform/quantized
and reconstructed in-scan so neighbor blocks predict from true recon.

Outputs the dense per-MB arrays that the host CAVLC packer consumes
(mirror of decode SliceData).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hartallo_tpu.core.tables import LUMA_4x4_BLK_XY, QP_SCALE_CHROMA
from hartallo_tpu.decode.intra_recon import (PAD, _neighbor_tile17x25,
                                             _neighbor_tile9x9)
from hartallo_tpu.ops.wavefront import (plane_to_tiles, skew, skew_geometry,
                                        tiles_to_plane, unskew)
from hartallo_tpu.ops.intra import pred16x16_all, pred4x4_all, pred_chroma_all
from hartallo_tpu.ops.transform import (
    chroma_dc_descale, dequant_4x4, forward_dct_4x4,
    forward_hadamard_quant_dc_chroma, forward_hadamard_quant_dc_luma,
    forward_quant_4x4, inverse_transform_4x4, luma_dc_descale_intra16)

_BLK_X = (LUMA_4x4_BLK_XY[:, 0]).astype(int)
_BLK_Y = (LUMA_4x4_BLK_XY[:, 1]).astype(int)
_TR_NEVER = {3, 7, 11, 13, 15}
_TR_EDGE_BLK = 5
_J_QPC = jnp.asarray(QP_SCALE_CHROMA)


def _blocks_of_mb(mb16: jnp.ndarray) -> jnp.ndarray:
    """(..., 16, 16) -> (..., 16, 4, 4) in blkIdx order."""
    outs = [mb16[..., _BLK_Y[b]:_BLK_Y[b] + 4, _BLK_X[b]:_BLK_X[b] + 4]
            for b in range(16)]
    return jnp.stack(outs, axis=-3)


@partial(jax.jit, static_argnames=("gw", "gh"))
def intra_encode_frame(src_y, src_u, src_v, qp, chroma_qp_off,
                       avail_left, avail_top, lam, avail_tr=None,
                       avail_tl=None, base_planes=None, mb_mask=None,
                       *, gw: int, gh: int):
    """Encode intra macroblocks of a frame (every MB on the I-frame
    path; a masked subset for intra-in-P).

    src_*: PAD-padded int32 source planes.  qp (gh,gw) int32.
    lam: scalar float32 lambda for the SAD+lambda*bits mode cost.
    base_planes: optional PAD-padded (recY, recU, recV) holding the
    already-reconstructed inter pixels; mb_mask (gh,gw) bool selects the
    MBs to intra-code — masked-out MBs pass their base content through,
    so intra prediction of later MBs reads the mixed inter/intra recon
    exactly as the decoder's wavefront does.
    Returns dict of per-MB arrays + recon padded planes.

    Skewed-diagonal wavefront (ops/wavefront.py): one scan step processes
    a whole anti-diagonal of MBs; the carry holds the last three recon
    diagonal rows (the neighbours intra prediction needs)."""
    H, W = gh * 16, gw * 16
    geo = skew_geometry(gw, gh)
    D, K = geo["D"], geo["K"]
    valid = jnp.asarray(geo["valid"])
    sk = lambda a: skew(a, geo)                              # noqa: E731
    qpc = _J_QPC[jnp.clip(qp + chroma_qp_off, 0, 51)]

    sy = sk(plane_to_tiles(
        jax.lax.dynamic_slice(src_y, (PAD, PAD), (H, W)), 16))
    su = sk(plane_to_tiles(
        jax.lax.dynamic_slice(src_u, (PAD, PAD), (H // 2, W // 2)), 8))
    sv = sk(plane_to_tiles(
        jax.lax.dynamic_slice(src_v, (PAD, PAD), (H // 2, W // 2)), 8))
    if base_planes is None:
        by_t = jnp.zeros_like(sy)
        bu_t = jnp.zeros_like(su)
        bv_t = jnp.zeros_like(sv)
    else:
        bY, bU, bV = base_planes
        by_t = sk(plane_to_tiles(
            jax.lax.dynamic_slice(bY, (PAD, PAD), (H, W)), 16))
        bu_t = sk(plane_to_tiles(
            jax.lax.dynamic_slice(bU, (PAD, PAD), (H // 2, W // 2)), 8))
        bv_t = sk(plane_to_tiles(
            jax.lax.dynamic_slice(bV, (PAD, PAD), (H // 2, W // 2)), 8))
    if mb_mask is None:
        mb_mask = jnp.ones((gh, gw), bool)

    xs = (sy, su, sv, by_t, bu_t, bv_t,
          jnp.where(valid, sk(mb_mask), False),
          sk(qp), sk(qpc),
          jnp.where(valid, sk(avail_left), False),
          jnp.where(valid, sk(avail_top), False),
          jnp.where(valid, sk(jnp.ones((gh, gw), bool) if avail_tr is None
                              else avail_tr), False),
          jnp.where(valid, sk(jnp.ones((gh, gw), bool) if avail_tl is None
                              else avail_tl), False),
          jnp.where(valid, jnp.asarray(geo["mx_of"]), -1),
          valid)

    big = jnp.float32(1e18)

    def step(carry, x):
        r1y, r2y, r3y, r1u, r2u, r3u, r1v, r2v, r3v = carry
        (src_tile, csrc_u, csrc_v, base_y, base_u, base_v, imask,
         qp_mb, qpc_mb, al, at, atr, atl, mxs, vld) = x
        K = src_tile.shape[0]

        rec_tile = _neighbor_tile17x25(jnp.zeros_like(src_tile),
                                       r1y, r2y, r3y)

        # ---- Intra16x16 path --------------------------------------------
        top16 = rec_tile[:, 0, 1:17]
        left16 = rec_tile[:, 1:17, 0]
        tl16 = rec_tile[:, 0, 0]
        bank16 = pred16x16_all(top16, left16, tl16, at, al)  # (K,4,16,16)
        sad16 = jnp.sum(jnp.abs(bank16 - src_tile[:, None]), axis=(-1, -2))
        m16cost = sad16.astype(jnp.float32)
        m16cost = m16cost.at[:, 0].add(jnp.where(at, 0.0, big))
        m16cost = m16cost.at[:, 1].add(jnp.where(al, 0.0, big))
        m16cost = m16cost.at[:, 3].add(jnp.where(at & al & atl, 0.0,
                                                 big))
        i16_mode = jnp.argmin(m16cost, axis=1)
        i16_cost = jnp.min(m16cost, axis=1)
        p16 = jnp.take_along_axis(bank16,
                                  i16_mode[:, None, None, None], 1)[:, 0]
        res16 = src_tile - p16
        blocks16 = _blocks_of_mb(res16)                     # (K,16,4,4)
        w16 = forward_dct_4x4(blocks16)
        blk_row = jnp.asarray(_BLK_Y) // 4
        blk_col = jnp.asarray(_BLK_X) // 4
        dc_sp = jnp.zeros((K, 4, 4), jnp.int32)
        dc_sp = dc_sp.at[:, blk_row, blk_col].set(w16[..., 0, 0])
        luma_dc_q = forward_hadamard_quant_dc_luma(dc_sp, qp_mb)
        ac16_q = forward_quant_4x4(w16, qp_mb[:, None], True, skip_dc=True)
        d16 = dequant_4x4(ac16_q, jnp.broadcast_to(qp_mb[:, None], (K, 16)))
        dc_rec = luma_dc_descale_intra16(luma_dc_q, qp_mb)
        d16 = d16.at[..., 0, 0].set(dc_rec[:, blk_row, blk_col])
        r16 = inverse_transform_4x4(d16)                    # (K,16,4,4)
        rec16 = jnp.zeros((K, 16, 16), jnp.int32)
        for b in range(16):
            rec16 = rec16.at[:, _BLK_Y[b]:_BLK_Y[b] + 4,
                             _BLK_X[b]:_BLK_X[b] + 4].set(r16[:, b])
        rec16 = jnp.clip(p16 + rec16, 0, 255)

        # ---- Intra4x4 path (16 sequential blocks) -----------------------
        t4 = rec_tile
        i4_modes = jnp.zeros((K, 16), jnp.int32)
        i4_coef = jnp.zeros((K, 16, 4, 4), jnp.int32)
        i4_cost = jnp.zeros((K,), jnp.float32)
        at_edge = mxs == gw - 1
        for blk in range(16):
            x0, y0 = _BLK_X[blk] + 1, _BLK_Y[blk] + 1
            top = t4[:, y0 - 1, x0:x0 + 8]
            left = t4[:, y0:y0 + 4, x0 - 1]
            tl = t4[:, y0 - 1, x0 - 1]
            if blk in _TR_NEVER:
                sub = jnp.ones_like(at_edge)
            elif blk == _TR_EDGE_BLK:
                sub = at_edge | ~atr
            else:
                sub = jnp.zeros_like(at_edge)
            t3 = top[:, 3:4]
            top = jnp.where(sub[:, None] & (jnp.arange(8) >= 4), t3, top)
            b_at = at if _BLK_Y[blk] == 0 else vld
            b_al = al if _BLK_X[blk] == 0 else vld
            bank = pred4x4_all(top, left, tl, b_at, b_al)    # (K,9,4,4)
            sblk = src_tile[:, _BLK_Y[blk]:_BLK_Y[blk] + 4,
                            _BLK_X[blk]:_BLK_X[blk] + 4]
            sad = jnp.sum(jnp.abs(bank - sblk[:, None]), axis=(-1, -2)) \
                .astype(jnp.float32)
            need_top = jnp.asarray([1, 0, 0, 1, 1, 1, 1, 1, 0], bool)
            need_left = jnp.asarray([0, 1, 0, 0, 1, 1, 1, 0, 1], bool)
            # modes reading the corner sample p[-1,-1] (8.3.1.2.4-.6)
            need_tl = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 0, 0], bool)
            if _BLK_X[blk] == 0 and _BLK_Y[blk] == 0:
                b_atl = atl
            elif _BLK_Y[blk] == 0:
                b_atl = at
            elif _BLK_X[blk] == 0:
                b_atl = al
            else:
                b_atl = vld
            pen = jnp.where(need_top[None, :] & ~b_at[:, None], big, 0.0) + \
                jnp.where(need_left[None, :] & ~b_al[:, None], big, 0.0) + \
                jnp.where(need_tl[None, :] & ~b_atl[:, None], big, 0.0)
            cost = sad + pen + lam * 4.0
            cost = cost.at[:, 2].add(-lam * 3.0)  # DC usually cheapest bits
            mode = jnp.argmin(cost, axis=1)
            i4_cost = i4_cost + jnp.min(cost, axis=1)
            pred = jnp.take_along_axis(bank, mode[:, None, None, None],
                                       1)[:, 0]
            w = forward_dct_4x4(sblk - pred)
            z = forward_quant_4x4(w, qp_mb, True)
            d = dequant_4x4(z, qp_mb)
            r = inverse_transform_4x4(d)
            rec = jnp.clip(pred + r, 0, 255)
            t4 = t4.at[:, y0:y0 + 4, x0:x0 + 4].set(rec)
            i4_modes = i4_modes.at[:, blk].set(mode)
            i4_coef = i4_coef.at[:, blk].set(z)
        rec4 = t4[:, 1:17, 1:17]

        # ---- choose I16 vs I4 -------------------------------------------
        use16 = (i16_cost + lam * 6.0) < i4_cost
        recon = jnp.where(use16[:, None, None], rec16, rec4)
        recon = jnp.where(imask[:, None, None], recon, base_y)

        # ---- chroma ------------------------------------------------------
        banks = []
        for cc, r1, r2, r3 in ((csrc_u, r1u, r2u, r3u),
                               (csrc_v, r1v, r2v, r3v)):
            ct = _neighbor_tile9x9(jnp.zeros_like(cc), r1, r2, r3)
            banks.append(pred_chroma_all(ct[:, 0, 1:9], ct[:, 1:9, 0],
                                         ct[:, 0, 0], at, al))
        csrc = (csrc_u, csrc_v)
        sadc = sum(jnp.sum(jnp.abs(b - s[:, None]), axis=(-1, -2))
                   for b, s in zip(banks, csrc)).astype(jnp.float32)
        sadc = sadc.at[:, 2].add(jnp.where(at, 0.0, big))
        sadc = sadc.at[:, 1].add(jnp.where(al, 0.0, big))
        sadc = sadc.at[:, 3].add(jnp.where(at & al & atl, 0.0, big))
        cmode = jnp.argmin(sadc, axis=1)

        ch_dc = []
        ch_ac = []
        crecs = []
        for pi, (bankc, cs) in enumerate(zip(banks, csrc)):
            pc = jnp.take_along_axis(bankc, cmode[:, None, None, None],
                                     1)[:, 0]
            resc = cs - pc
            cblocks = jnp.stack(
                [resc[:, (b >> 1) * 4:(b >> 1) * 4 + 4,
                      (b & 1) * 4:(b & 1) * 4 + 4] for b in range(4)],
                axis=1)                                     # (K,4,4,4)
            wc = forward_dct_4x4(cblocks)
            dc2 = jnp.stack(
                [jnp.stack([wc[:, 0, 0, 0], wc[:, 1, 0, 0]], -1),
                 jnp.stack([wc[:, 2, 0, 0], wc[:, 3, 0, 0]], -1)], -2)
            dcq = forward_hadamard_quant_dc_chroma(dc2, qpc_mb, True)
            acq = forward_quant_4x4(wc, qpc_mb[:, None], True, skip_dc=True)
            dcd = chroma_dc_descale(dcq, qpc_mb)
            dd = dequant_4x4(acq, jnp.broadcast_to(qpc_mb[:, None], (K, 4)))
            blk_r = jnp.arange(4) // 2
            blk_c = jnp.arange(4) % 2
            dd = dd.at[:, :, 0, 0].set(dcd[:, blk_r, blk_c])
            rr = inverse_transform_4x4(dd)
            recc = jnp.zeros((K, 8, 8), jnp.int32)
            for b in range(4):
                recc = recc.at[:, (b >> 1) * 4:(b >> 1) * 4 + 4,
                               (b & 1) * 4:(b & 1) * 4 + 4].set(rr[:, b])
            base_c = base_u if pi == 0 else base_v
            crecs.append(jnp.where(imask[:, None, None],
                                   jnp.clip(pc + recc, 0, 255), base_c))
            ch_dc.append(dcq)
            ch_ac.append(acq)

        outs = (use16.astype(jnp.int32), i16_mode, i4_modes, cmode,
                jnp.where(use16[:, None, None], luma_dc_q, 0),
                jnp.where(use16[:, None, None, None], ac16_q, i4_coef),
                jnp.stack(ch_dc, axis=1), jnp.stack(ch_ac, axis=1),
                recon, crecs[0], crecs[1])
        new_carry = (recon, r1y, r2y, crecs[0], r1u, r2u,
                     crecs[1], r1v, r2v)
        return new_carry, outs

    zy = jnp.zeros((K, 16, 16), jnp.int32)
    zc = jnp.zeros((K, 8, 8), jnp.int32)
    init = (zy, zy, zy, zc, zc, zc, zc, zc, zc)
    _, ys = jax.lax.scan(step, init, xs)
    (use16, i16_mode, i4_modes, cmode, luma_dc, luma_ac, chroma_dc,
     chroma_ac, rec_y, rec_u, rec_v) = ys

    out = {
        "use_i16": unskew(use16, geo),
        "i16_mode": unskew(i16_mode, geo),
        "i4_modes": unskew(i4_modes, geo),
        "chroma_mode": unskew(cmode, geo),
        "luma_dc": unskew(luma_dc, geo),
        "luma_ac": unskew(luma_ac, geo),
        "chroma_dc": unskew(chroma_dc, geo),
        "chroma_ac": unskew(chroma_ac, geo),
    }
    recY = jnp.pad(tiles_to_plane(unskew(rec_y, geo)), PAD)
    recU = jnp.pad(tiles_to_plane(unskew(rec_u, geo)), PAD)
    recV = jnp.pad(tiles_to_plane(unskew(rec_v, geo)), PAD)
    return recY, recU, recV, out
