"""Deblocking filter (spec 8.7) as batched jnp kernels.

Reference parity: ``hl_codec_264_deblock.c`` — bS derivation 8.7.2.1
(``:1017-1110``), threshold tables (``:52-71``), bS<4 filter 8.7.2.3 and
bS=4 filter 8.7.2.4 (luma ``:288-412``, chroma ``:413-572``).

TPU re-expression: boundary strengths for the whole frame are a batched
precompute (no spatial deps); pixel filtering runs as a wavefront over MB
anti-diagonals d = mx + 2*my — the per-MB V-then-H edge order of the spec
induces left/top/above-right MB dependencies, exactly like intra
prediction, and MBs on one anti-diagonal touch disjoint pixels.  The
wavefront uses the skewed layout of ``ops/wavefront.py``: one scan step =
one static diagonal row, the carry holds the last two rows (a step's
V-edge-0 writes into the left tile, row d-1, and its H-edge-0 into the
top tile, row d-2), and a diagonal is final two steps after its own.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hartallo_tpu.core.tables import (DEBLOCK_ALPHA, DEBLOCK_BETA,
                                      DEBLOCK_TC0, QP_SCALE_CHROMA)
from hartallo_tpu.ops.wavefront import (plane_to_tiles, shift_k, skew,
                                        skew1_geometry, skew_geometry,
                                        tiles_to_plane, unskew)

_ALPHA = jnp.asarray(DEBLOCK_ALPHA)
_BETA = jnp.asarray(DEBLOCK_BETA)
_TC0 = jnp.asarray(np.concatenate([np.zeros((52, 1), np.int32),
                                   DEBLOCK_TC0], axis=1))  # [idxA][bS0..3]
_QPC = jnp.asarray(QP_SCALE_CHROMA)

PAD = 32


# ---------------------------------------------------------------------------
# Boundary strengths (batched, frame-level)
# ---------------------------------------------------------------------------

def compute_bs(mb_is_intra, nnz, mv, ref, filter_mb_edge_v, filter_mb_edge_h,
               filter_internal):
    """bS per 4x4-block edge.

    mb_is_intra (gh,gw) bool; nnz (4gh,4gw) int; mv (4gh,4gw,2) int
    (quarter-pel L0); ref (4gh,4gw) int (-1 uniform for intra frames);
    filter_mb_edge_v/h (gh,gw) bool — whether the MB's left/top MB edge is
    filtered; filter_internal (gh,gw) bool — internal edges filtered.

    Returns bs_v, bs_h (gh,gw,4,4): [edge e at x=4e (resp. y=4e)][segment].
    """
    gh, gw = mb_is_intra.shape
    bi = jnp.repeat(jnp.repeat(mb_is_intra, 4, 0), 4, 1)       # (4gh,4gw)
    nz = nnz > 0

    def edge_bs(shift_axis):
        # p = block before the edge along axis, q = block at the edge
        if shift_axis == 1:
            intra_pq = bi | jnp.roll(bi, 1, axis=1)
            nz_pq = nz | jnp.roll(nz, 1, axis=1)
            mv_p = jnp.roll(mv, 1, axis=1)
            ref_p = jnp.roll(ref, 1, axis=1)
        else:
            intra_pq = bi | jnp.roll(bi, 1, axis=0)
            nz_pq = nz | jnp.roll(nz, 1, axis=0)
            mv_p = jnp.roll(mv, 1, axis=0)
            ref_p = jnp.roll(ref, 1, axis=0)
        mv_far = (jnp.abs(mv - mv_p) >= 4).any(axis=-1)
        ref_diff = ref != ref_p
        return jnp.where(intra_pq, 4,
                         jnp.where(nz_pq, 2,
                                   jnp.where(mv_far | ref_diff, 1, 0)))

    bs_vg = edge_bs(1)      # (4gh,4gw): edge left of each block col
    bs_hg = edge_bs(0)

    # MB-edge bS upgrades: intra -> 4 at MB edges (already 4 via rule),
    # internal intra edges are 3 not 4
    blk_col = jnp.arange(4 * gw) % 4
    blk_row = jnp.arange(4 * gh) % 4
    internal_v = (blk_col != 0)[None, :]
    internal_h = (blk_row != 0)[:, None]
    bs_vg = jnp.where(internal_v & (bs_vg == 4), 3, bs_vg)
    bs_hg = jnp.where(internal_h & (bs_hg == 4), 3, bs_hg)

    # gate by filter flags
    fmb_v = jnp.repeat(jnp.repeat(filter_mb_edge_v, 4, 0), 4, 1)
    fmb_h = jnp.repeat(jnp.repeat(filter_mb_edge_h, 4, 0), 4, 1)
    fint = jnp.repeat(jnp.repeat(filter_internal, 4, 0), 4, 1)
    bs_vg = jnp.where(jnp.where(internal_v, fint, fmb_v), bs_vg, 0)
    bs_hg = jnp.where(jnp.where(internal_h, fint, fmb_h), bs_hg, 0)

    # bs_vg[row, col]: row = 4*my+seg, col = 4*mx+e  -> want (gh,gw,e,seg)
    bs_v = bs_vg.reshape(gh, 4, gw, 4).transpose(0, 2, 3, 1)
    bs_h = bs_hg.reshape(gh, 4, gw, 4).transpose(0, 2, 1, 3)
    # bs_hg[row, col]: row = 4*my+e, col = 4*mx+seg -> (gh,gw,e,seg)
    return bs_v, bs_h


# ---------------------------------------------------------------------------
# Edge filters (vectorized over lines)
# ---------------------------------------------------------------------------

def _filter_luma_line(p3, p2, p1, p0, q0, q1, q2, q3, bs, alpha, beta, tc0):
    """One luma edge: arrays over lines. Returns new p2,p1,p0,q0,q1,q2."""
    fs = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta

    # --- bS < 4 (8.7.2.3) ---
    tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0_w = jnp.clip(p0 + delta, 0, 255)
    q0_w = jnp.clip(q0 - delta, 0, 255)
    p1_w = p1 + jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1,
                         -tc0, tc0)
    q1_w = q1 + jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1,
                         -tc0, tc0)
    p1_w = jnp.where(ap, p1_w, p1)
    q1_w = jnp.where(aq, q1_w, q1)

    # --- bS == 4 (8.7.2.4) ---
    gap = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    strong_p = ap & gap
    strong_q = aq & gap
    p0_s = jnp.where(strong_p,
                     (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                     (2 * p1 + p0 + q1 + 2) >> 2)
    p1_s = jnp.where(strong_p, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    p2_s = jnp.where(strong_p,
                     (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    q0_s = jnp.where(strong_q,
                     (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                     (2 * q1 + q0 + p1 + 2) >> 2)
    q1_s = jnp.where(strong_q, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    q2_s = jnp.where(strong_q,
                     (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)

    is4 = bs == 4
    p0_n = jnp.where(is4, p0_s, p0_w)
    p1_n = jnp.where(is4, p1_s, p1_w)
    p2_n = jnp.where(is4, p2_s, p2)
    q0_n = jnp.where(is4, q0_s, q0_w)
    q1_n = jnp.where(is4, q1_s, q1_w)
    q2_n = jnp.where(is4, q2_s, q2)

    return (jnp.where(fs, p2_n, p2), jnp.where(fs, p1_n, p1),
            jnp.where(fs, p0_n, p0), jnp.where(fs, q0_n, q0),
            jnp.where(fs, q1_n, q1), jnp.where(fs, q2_n, q2))


def _filter_chroma_line(p1, p0, q0, q1, bs, alpha, beta, tc0):
    fs = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    tc = tc0 + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0_w = jnp.clip(p0 + delta, 0, 255)
    q0_w = jnp.clip(q0 - delta, 0, 255)
    p0_s = (2 * p1 + p0 + q1 + 2) >> 2
    q0_s = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    p0_n = jnp.where(is4, p0_s, p0_w)
    q0_n = jnp.where(is4, q0_s, q0_w)
    return jnp.where(fs, p0_n, p0), jnp.where(fs, q0_n, q0)


# ---------------------------------------------------------------------------
# Wavefront deblock (skewed-diagonal scan)
# ---------------------------------------------------------------------------

def _pad_rows(x, n: int, fill=0):
    """Append n dummy diagonal rows (scan flush)."""
    tail = jnp.full((n,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, tail], axis=0)


_SEG16 = np.arange(16) // 4          # line -> 4x4 segment (luma)
_SEG8 = (np.arange(8) * 2) // 4      # chroma line -> luma segment


@partial(jax.jit, static_argnames=("gw", "gh"))
def deblock_frame(planes, bs_v, bs_h, qp_y, qp_left, qp_top,
                  qpc_cur, qpc_left, qpc_top,
                  alpha_off, beta_off, *, gw: int, gh: int):
    """Apply the in-loop filter; planes are PAD-padded int32 (Y, U, V).

    qp_y (gh,gw): MB luma QP; qp_left/qp_top: neighbor-MB QP (same value as
    qp_y at frame edges); qpc_*: chroma QP equivalents.
    alpha_off/beta_off (gh,gw): per-MB slice offsets (2*div2 values).
    """
    pY, pU, pV = planes
    H, W = gh * 16, gw * 16
    geo = skew_geometry(gw, gh)
    D, K = geo["D"], geo["K"]

    ty = skew(plane_to_tiles(
        jax.lax.dynamic_slice(pY, (PAD, PAD), (H, W)), 16), geo)
    tu = skew(plane_to_tiles(
        jax.lax.dynamic_slice(pU, (PAD, PAD), (H // 2, W // 2)), 8), geo)
    tv = skew(plane_to_tiles(
        jax.lax.dynamic_slice(pV, (PAD, PAD), (H // 2, W // 2)), 8), geo)

    valid = jnp.asarray(geo["valid"])
    sk = lambda a: skew(a, geo)                                # noqa: E731
    sbv = jnp.where(valid[..., None, None], sk(bs_v), 0)
    sbh = jnp.where(valid[..., None, None], sk(bs_h), 0)
    xs = (_pad_rows(ty, 2), _pad_rows(tu, 2), _pad_rows(tv, 2),
          _pad_rows(sbv, 2), _pad_rows(sbh, 2),
          _pad_rows(sk(qp_y), 2), _pad_rows(sk(qp_left), 2),
          _pad_rows(sk(qp_top), 2),
          _pad_rows(sk(qpc_cur), 2), _pad_rows(sk(qpc_left), 2),
          _pad_rows(sk(qpc_top), 2),
          _pad_rows(sk(alpha_off), 2), _pad_rows(sk(beta_off), 2))

    seg16 = jnp.asarray(_SEG16)
    seg8 = jnp.asarray(_SEG8)

    def idxAB(qp_avg, offa, offb):
        return (jnp.clip(qp_avg + offa, 0, 51),
                jnp.clip(qp_avg + offb, 0, 51))

    def step(carry, x):
        p1y, p2y, p1u, p2u, p1v, p2v = carry
        (cy, cu, cv, bsv, bsh, qpc_c, qpl, qpt, cqc, cql, cqt,
         offa, offb) = x

        top_y = shift_k(p2y)         # row d-2 seen from slot k (at k-1)
        top_u = shift_k(p2u)
        top_v = shift_k(p2v)

        # ---- luma vertical edges (left->right) -------------------------
        for e in range(4):
            qp_avg = ((qpl + qpc_c + 1) >> 1) if e == 0 else qpc_c
            ia, ib = idxAB(qp_avg, offa, offb)
            alpha = _ALPHA[ia][:, None]
            beta = _BETA[ib][:, None]
            bs_line = bsv[:, e, :][:, seg16]                   # (K,16)
            tc0 = _TC0[ia[:, None], jnp.clip(bs_line, 0, 3)]
            if e == 0:
                cols = [p1y[:, :, 12 + k] for k in range(4)] + \
                       [cy[:, :, k] for k in range(4)]
            else:
                c0 = 4 * e - 4
                cols = [cy[:, :, c0 + k] for k in range(8)]
            np2, np1, np0, nq0, nq1, nq2 = _filter_luma_line(
                cols[0], cols[1], cols[2], cols[3], cols[4], cols[5],
                cols[6], cols[7], bs_line, alpha, beta, tc0)
            if e == 0:
                p1y = p1y.at[:, :, 13].set(np2)
                p1y = p1y.at[:, :, 14].set(np1)
                p1y = p1y.at[:, :, 15].set(np0)
                cy = cy.at[:, :, 0].set(nq0)
                cy = cy.at[:, :, 1].set(nq1)
                cy = cy.at[:, :, 2].set(nq2)
            else:
                c0 = 4 * e - 4
                cy = cy.at[:, :, c0 + 1].set(np2)
                cy = cy.at[:, :, c0 + 2].set(np1)
                cy = cy.at[:, :, c0 + 3].set(np0)
                cy = cy.at[:, :, c0 + 4].set(nq0)
                cy = cy.at[:, :, c0 + 5].set(nq1)
                cy = cy.at[:, :, c0 + 6].set(nq2)

        # ---- luma horizontal edges (top->bottom) ------------------------
        for e in range(4):
            qp_avg = ((qpt + qpc_c + 1) >> 1) if e == 0 else qpc_c
            ia, ib = idxAB(qp_avg, offa, offb)
            alpha = _ALPHA[ia][:, None]
            beta = _BETA[ib][:, None]
            bs_line = bsh[:, e, :][:, seg16]
            tc0 = _TC0[ia[:, None], jnp.clip(bs_line, 0, 3)]
            if e == 0:
                rows = [top_y[:, 12 + k, :] for k in range(4)] + \
                       [cy[:, k, :] for k in range(4)]
            else:
                r0 = 4 * e - 4
                rows = [cy[:, r0 + k, :] for k in range(8)]
            np2, np1, np0, nq0, nq1, nq2 = _filter_luma_line(
                rows[0], rows[1], rows[2], rows[3], rows[4], rows[5],
                rows[6], rows[7], bs_line, alpha, beta, tc0)
            if e == 0:
                top_y = top_y.at[:, 13, :].set(np2)
                top_y = top_y.at[:, 14, :].set(np1)
                top_y = top_y.at[:, 15, :].set(np0)
                cy = cy.at[:, 0, :].set(nq0)
                cy = cy.at[:, 1, :].set(nq1)
                cy = cy.at[:, 2, :].set(nq2)
            else:
                r0 = 4 * e - 4
                cy = cy.at[:, r0 + 1, :].set(np2)
                cy = cy.at[:, r0 + 2, :].set(np1)
                cy = cy.at[:, r0 + 3, :].set(np0)
                cy = cy.at[:, r0 + 4, :].set(nq0)
                cy = cy.at[:, r0 + 5, :].set(nq1)
                cy = cy.at[:, r0 + 6, :].set(nq2)

        # ---- chroma ------------------------------------------------------
        def chroma(ct, left_t, top_t):
            # vertical edges at tile cols 0, 4 <- luma edges 0, 2
            for e, le in ((0, 0), (1, 2)):
                qp_avg = ((cql + cqc + 1) >> 1) if e == 0 else cqc
                ia, ib = idxAB(qp_avg, offa, offb)
                alpha = _ALPHA[ia][:, None]
                beta = _BETA[ib][:, None]
                bs_line = bsv[:, le, :][:, seg8]               # (K,8)
                tc0 = _TC0[ia[:, None], jnp.clip(bs_line, 0, 3)]
                if e == 0:
                    cols = [left_t[:, :, 6], left_t[:, :, 7],
                            ct[:, :, 0], ct[:, :, 1]]
                else:
                    cols = [ct[:, :, 2], ct[:, :, 3],
                            ct[:, :, 4], ct[:, :, 5]]
                np0, nq0 = _filter_chroma_line(
                    cols[0], cols[1], cols[2], cols[3], bs_line, alpha,
                    beta, tc0)
                if e == 0:
                    left_t = left_t.at[:, :, 7].set(np0)
                    ct = ct.at[:, :, 0].set(nq0)
                else:
                    ct = ct.at[:, :, 3].set(np0)
                    ct = ct.at[:, :, 4].set(nq0)
            for e, le in ((0, 0), (1, 2)):
                qp_avg = ((cqt + cqc + 1) >> 1) if e == 0 else cqc
                ia, ib = idxAB(qp_avg, offa, offb)
                alpha = _ALPHA[ia][:, None]
                beta = _BETA[ib][:, None]
                bs_line = bsh[:, le, :][:, seg8]
                tc0 = _TC0[ia[:, None], jnp.clip(bs_line, 0, 3)]
                if e == 0:
                    rows = [top_t[:, 6, :], top_t[:, 7, :],
                            ct[:, 0, :], ct[:, 1, :]]
                else:
                    rows = [ct[:, 2, :], ct[:, 3, :],
                            ct[:, 4, :], ct[:, 5, :]]
                np0, nq0 = _filter_chroma_line(
                    rows[0], rows[1], rows[2], rows[3], bs_line, alpha,
                    beta, tc0)
                if e == 0:
                    top_t = top_t.at[:, 7, :].set(np0)
                    ct = ct.at[:, 0, :].set(nq0)
                else:
                    ct = ct.at[:, 3, :].set(np0)
                    ct = ct.at[:, 4, :].set(nq0)
            return ct, left_t, top_t

        cu, p1u, top_u = chroma(cu, p1u, top_u)
        cv, p1v, top_v = chroma(cv, p1v, top_v)

        # scatter the top-row writes back (slot k wrote into k-1); the last
        # slot of row d-2 has no below-MB in this diagonal — keep its value
        p2y_new = jnp.concatenate([top_y[1:], p2y[-1:]], axis=0)
        p2u_new = jnp.concatenate([top_u[1:], p2u[-1:]], axis=0)
        p2v_new = jnp.concatenate([top_v[1:], p2v[-1:]], axis=0)

        # next step's d-1 is this row (cy, with left-writes applied by the
        # NEXT step), next step's d-2 is our d-1 (p1*, V-edge-0 writes done)
        new_carry = (cy, p1y, cu, p1u, cv, p1v)
        return new_carry, (p2y_new, p2u_new, p2v_new)

    zy = jnp.zeros((K, 16, 16), jnp.int32)
    zc = jnp.zeros((K, 8, 8), jnp.int32)
    init = (zy, zy, zc, zc, zc, zc)
    _, (oy, ou, ov) = jax.lax.scan(step, init, xs)
    # step s emits finalized diagonal s-2: rows 0..D-1 live at ys[2:D+2]
    y_tiles = oy[2:D + 2]
    u_tiles = ou[2:D + 2]
    v_tiles = ov[2:D + 2]

    newY = tiles_to_plane(unskew(y_tiles, geo))
    newU = tiles_to_plane(unskew(u_tiles, geo))
    newV = tiles_to_plane(unskew(v_tiles, geo))
    pY = jax.lax.dynamic_update_slice(pY, newY, (PAD, PAD))
    pU = jax.lax.dynamic_update_slice(pU, newU, (PAD, PAD))
    pV = jax.lax.dynamic_update_slice(pV, newV, (PAD, PAD))
    return pY, pU, pV


# ---------------------------------------------------------------------------
# Slope-1 wavefront deblock (fewer steps, single-row carry)
# ---------------------------------------------------------------------------
#
# Deblocking has only left/top MB dependencies, so d = mx + my suffices
# (gw + gh - 1 steps vs the intra wavefront's gw + 2gh - 1).  Within one
# step, running ALL vertical-edge filters before ALL horizontal-edge
# filters reproduces the spec's per-MB raster order exactly: the only
# same-step interactions are (a) slot k-1's V-edge-0 writing the tile our
# H-edge-0 reads (raster: that MB precedes us) and (b) slot k+1's
# H-edge-0 writing the tile our V edges read (raster: that MB follows
# us) — both honored by the V-then-H phase split.

@partial(jax.jit, static_argnames=("gw", "gh"))
def deblock_frame_s1(planes, bs_v, bs_h, qp_y, qp_left, qp_top,
                     qpc_cur, qpc_left, qpc_top,
                     alpha_off, beta_off, *, gw: int, gh: int):
    """Same contract as deblock_frame (bit-exact), slope-1 schedule."""
    pY, pU, pV = planes
    H, W = gh * 16, gw * 16
    geo = skew1_geometry(gw, gh)
    D, K = geo["D"], geo["K"]

    sk = lambda a: skew(a, geo)                                # noqa: E731
    ty = sk(plane_to_tiles(
        jax.lax.dynamic_slice(pY, (PAD, PAD), (H, W)), 16))
    tu = sk(plane_to_tiles(
        jax.lax.dynamic_slice(pU, (PAD, PAD), (H // 2, W // 2)), 8))
    tv = sk(plane_to_tiles(
        jax.lax.dynamic_slice(pV, (PAD, PAD), (H // 2, W // 2)), 8))

    valid = jnp.asarray(geo["valid"])
    sbv = jnp.where(valid[..., None, None], sk(bs_v), 0)
    sbh = jnp.where(valid[..., None, None], sk(bs_h), 0)
    xs = (_pad_rows(ty, 1), _pad_rows(tu, 1), _pad_rows(tv, 1),
          _pad_rows(sbv, 1), _pad_rows(sbh, 1),
          _pad_rows(sk(qp_y), 1), _pad_rows(sk(qp_left), 1),
          _pad_rows(sk(qp_top), 1),
          _pad_rows(sk(qpc_cur), 1), _pad_rows(sk(qpc_left), 1),
          _pad_rows(sk(qpc_top), 1),
          _pad_rows(sk(alpha_off), 1), _pad_rows(sk(beta_off), 1))

    seg16 = jnp.asarray(_SEG16)
    seg8 = jnp.asarray(_SEG8)

    def idxAB(qp_avg, offa, offb):
        return (jnp.clip(qp_avg + offa, 0, 51),
                jnp.clip(qp_avg + offb, 0, 51))

    def step(carry, x):
        p1y, p1u, p1v = carry
        (cy, cu, cv, bsv, bsh, qpc_c, qpl, qpt, cqc, cql, cqt,
         offa, offb) = x

        # ---- V phase: luma vertical edges (left->right) ----------------
        for e in range(4):
            qp_avg = ((qpl + qpc_c + 1) >> 1) if e == 0 else qpc_c
            ia, ib = idxAB(qp_avg, offa, offb)
            alpha = _ALPHA[ia][:, None]
            beta = _BETA[ib][:, None]
            bs_line = bsv[:, e, :][:, seg16]                   # (K,16)
            tc0 = _TC0[ia[:, None], jnp.clip(bs_line, 0, 3)]
            if e == 0:
                cols = [p1y[:, :, 12 + k] for k in range(4)] + \
                       [cy[:, :, k] for k in range(4)]
            else:
                c0 = 4 * e - 4
                cols = [cy[:, :, c0 + k] for k in range(8)]
            np2, np1, np0, nq0, nq1, nq2 = _filter_luma_line(
                cols[0], cols[1], cols[2], cols[3], cols[4], cols[5],
                cols[6], cols[7], bs_line, alpha, beta, tc0)
            if e == 0:
                p1y = p1y.at[:, :, 13].set(np2)
                p1y = p1y.at[:, :, 14].set(np1)
                p1y = p1y.at[:, :, 15].set(np0)
                cy = cy.at[:, :, 0].set(nq0)
                cy = cy.at[:, :, 1].set(nq1)
                cy = cy.at[:, :, 2].set(nq2)
            else:
                c0 = 4 * e - 4
                cy = cy.at[:, :, c0 + 1].set(np2)
                cy = cy.at[:, :, c0 + 2].set(np1)
                cy = cy.at[:, :, c0 + 3].set(np0)
                cy = cy.at[:, :, c0 + 4].set(nq0)
                cy = cy.at[:, :, c0 + 5].set(nq1)
                cy = cy.at[:, :, c0 + 6].set(nq2)

        # ---- V phase: chroma -------------------------------------------
        def chroma_v(ct, left_t):
            for e, le in ((0, 0), (1, 2)):
                qp_avg = ((cql + cqc + 1) >> 1) if e == 0 else cqc
                ia, ib = idxAB(qp_avg, offa, offb)
                alpha = _ALPHA[ia][:, None]
                beta = _BETA[ib][:, None]
                bs_line = bsv[:, le, :][:, seg8]               # (K,8)
                tc0 = _TC0[ia[:, None], jnp.clip(bs_line, 0, 3)]
                if e == 0:
                    cols = [left_t[:, :, 6], left_t[:, :, 7],
                            ct[:, :, 0], ct[:, :, 1]]
                else:
                    cols = [ct[:, :, 2], ct[:, :, 3],
                            ct[:, :, 4], ct[:, :, 5]]
                np0, nq0 = _filter_chroma_line(
                    cols[0], cols[1], cols[2], cols[3], bs_line, alpha,
                    beta, tc0)
                if e == 0:
                    left_t = left_t.at[:, :, 7].set(np0)
                    ct = ct.at[:, :, 0].set(nq0)
                else:
                    ct = ct.at[:, :, 3].set(np0)
                    ct = ct.at[:, :, 4].set(nq0)
            return ct, left_t

        cu, p1u = chroma_v(cu, p1u)
        cv, p1v = chroma_v(cv, p1v)

        # top tiles AFTER the V phase (slot k-1's V-edge-0 writes land
        # before our H-edge-0 reads, matching raster order)
        top_y = shift_k(p1y)
        top_u = shift_k(p1u)
        top_v = shift_k(p1v)

        # ---- H phase: luma horizontal edges (top->bottom) ---------------
        for e in range(4):
            qp_avg = ((qpt + qpc_c + 1) >> 1) if e == 0 else qpc_c
            ia, ib = idxAB(qp_avg, offa, offb)
            alpha = _ALPHA[ia][:, None]
            beta = _BETA[ib][:, None]
            bs_line = bsh[:, e, :][:, seg16]
            tc0 = _TC0[ia[:, None], jnp.clip(bs_line, 0, 3)]
            if e == 0:
                rows = [top_y[:, 12 + k, :] for k in range(4)] + \
                       [cy[:, k, :] for k in range(4)]
            else:
                r0 = 4 * e - 4
                rows = [cy[:, r0 + k, :] for k in range(8)]
            np2, np1, np0, nq0, nq1, nq2 = _filter_luma_line(
                rows[0], rows[1], rows[2], rows[3], rows[4], rows[5],
                rows[6], rows[7], bs_line, alpha, beta, tc0)
            if e == 0:
                top_y = top_y.at[:, 13, :].set(np2)
                top_y = top_y.at[:, 14, :].set(np1)
                top_y = top_y.at[:, 15, :].set(np0)
                cy = cy.at[:, 0, :].set(nq0)
                cy = cy.at[:, 1, :].set(nq1)
                cy = cy.at[:, 2, :].set(nq2)
            else:
                r0 = 4 * e - 4
                cy = cy.at[:, r0 + 1, :].set(np2)
                cy = cy.at[:, r0 + 2, :].set(np1)
                cy = cy.at[:, r0 + 3, :].set(np0)
                cy = cy.at[:, r0 + 4, :].set(nq0)
                cy = cy.at[:, r0 + 5, :].set(nq1)
                cy = cy.at[:, r0 + 6, :].set(nq2)

        # ---- H phase: chroma --------------------------------------------
        def chroma_h(ct, top_t):
            for e, le in ((0, 0), (1, 2)):
                qp_avg = ((cqt + cqc + 1) >> 1) if e == 0 else cqc
                ia, ib = idxAB(qp_avg, offa, offb)
                alpha = _ALPHA[ia][:, None]
                beta = _BETA[ib][:, None]
                bs_line = bsh[:, le, :][:, seg8]
                tc0 = _TC0[ia[:, None], jnp.clip(bs_line, 0, 3)]
                if e == 0:
                    rows = [top_t[:, 6, :], top_t[:, 7, :],
                            ct[:, 0, :], ct[:, 1, :]]
                else:
                    rows = [ct[:, 2, :], ct[:, 3, :],
                            ct[:, 4, :], ct[:, 5, :]]
                np0, nq0 = _filter_chroma_line(
                    rows[0], rows[1], rows[2], rows[3], bs_line, alpha,
                    beta, tc0)
                if e == 0:
                    top_t = top_t.at[:, 7, :].set(np0)
                    ct = ct.at[:, 0, :].set(nq0)
                else:
                    ct = ct.at[:, 3, :].set(np0)
                    ct = ct.at[:, 4, :].set(nq0)
            return ct, top_t

        cu, top_u = chroma_h(cu, top_u)
        cv, top_v = chroma_h(cv, top_v)

        # diag d-1 is now final: merge the H-edge top-writes (slot k wrote
        # into k-1) back; the last slot had no below-MB this step
        p1y_fin = jnp.concatenate([top_y[1:], p1y[-1:]], axis=0)
        p1u_fin = jnp.concatenate([top_u[1:], p1u[-1:]], axis=0)
        p1v_fin = jnp.concatenate([top_v[1:], p1v[-1:]], axis=0)
        return (cy, cu, cv), (p1y_fin, p1u_fin, p1v_fin)

    zy = jnp.zeros((K, 16, 16), jnp.int32)
    zc = jnp.zeros((K, 8, 8), jnp.int32)
    _, (oy, ou, ov) = jax.lax.scan(step, (zy, zc, zc), xs)
    # step d emits finalized diagonal d-1: rows 0..D-1 live at [1:D+1]
    newY = tiles_to_plane(unskew(oy[1:D + 1], geo))
    newU = tiles_to_plane(unskew(ou[1:D + 1], geo))
    newV = tiles_to_plane(unskew(ov[1:D + 1], geo))
    pY = jax.lax.dynamic_update_slice(pY, newY, (PAD, PAD))
    pU = jax.lax.dynamic_update_slice(pU, newU, (PAD, PAD))
    pV = jax.lax.dynamic_update_slice(pV, newV, (PAD, PAD))
    return pY, pU, pV
