"""Deblocking filter (spec 8.7) as batched jnp kernels.

Reference parity: ``hl_codec_264_deblock.c`` — bS derivation 8.7.2.1
(``:1017-1110``), threshold tables (``:52-71``), bS<4 filter 8.7.2.3 and
bS=4 filter 8.7.2.4 (luma ``:288-412``, chroma ``:413-572``).

TPU re-expression: boundary strengths for the whole frame are a batched
precompute (no spatial deps); pixel filtering runs as a wavefront over MB
anti-diagonals d = mx + 2*my — the per-MB V-then-H edge order of the spec
induces left/top/above-right MB dependencies, exactly like intra
prediction, and MBs on one anti-diagonal touch disjoint pixels.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hartallo_tpu.core.tables import (DEBLOCK_ALPHA, DEBLOCK_BETA,
                                      DEBLOCK_TC0, QP_SCALE_CHROMA)

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
# Wavefront deblock
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("gw", "gh"))
def deblock_frame(planes, bs_v, bs_h, qp_y, qp_left, qp_top,
                  qpc_cur, qpc_left, qpc_top,
                  alpha_off, beta_off, schedule, *, gw: int, gh: int):
    """Apply the in-loop filter; planes are PAD-padded int32 (Y, U, V).

    qp_y (gh,gw): MB luma QP; qp_left/qp_top: neighbor-MB QP (same value as
    qp_y at frame edges); qpc_*: chroma QP equivalents.
    alpha_off/beta_off (gh,gw): per-MB slice offsets (2*div2 values).
    """
    pY, pU, pV = planes
    D, M, _ = schedule.shape

    def idxAB(qp_avg, off_a, off_b):
        ia = jnp.clip(qp_avg + off_a, 0, 51)
        ib = jnp.clip(qp_avg + off_b, 0, 51)
        return ia, ib

    def step(carry, sched_d):
        pY, pU, pV = carry
        my = sched_d[:, 0]
        mx = sched_d[:, 1]
        valid = my >= 0
        myc = jnp.maximum(my, 0)
        mxc = jnp.maximum(mx, 0)
        flat = myc * gw + mxc

        bsv = bs_v.reshape(-1, 4, 4)[flat]
        bsh = bs_h.reshape(-1, 4, 4)[flat]
        qpc = qp_y.reshape(-1)[flat]
        qpl = qp_left.reshape(-1)[flat]
        qpt = qp_top.reshape(-1)[flat]
        cqc = qpc_cur.reshape(-1)[flat]
        cql = qpc_left.reshape(-1)[flat]
        cqt = qpc_top.reshape(-1)[flat]
        offa = alpha_off.reshape(-1)[flat]
        offb = beta_off.reshape(-1)[flat]

        oy = jnp.where(valid, PAD + myc * 16, 0)
        ox = jnp.where(valid, PAD + mxc * 16, 0)

        tile = jax.vmap(
            lambda y, x: jax.lax.dynamic_slice(pY, (y - 4, x - 4), (20, 20))
        )(oy, ox)

        # ---- vertical edges (x = 0,4,8,12 in MB coords -> tile col 4+4e)
        for e in range(4):
            tc_col = 4 + 4 * e
            qp_avg = ((qpl + qpc + 1) >> 1) if e == 0 else qpc
            ia, ib = idxAB(qp_avg, offa, offb)
            alpha = _ALPHA[ia][:, None]
            beta = _BETA[ib][:, None]
            seg = jnp.arange(16) // 4
            bs_line = bsv[:, e, :][:, seg]                    # (M,16)
            tc0 = _TC0[ia[:, None], jnp.clip(bs_line, 0, 3)]  # (M,16)
            cols = [tile[:, 4:20, tc_col + k] for k in range(-4, 4)]
            np2, np1, np0, nq0, nq1, nq2 = _filter_luma_line(
                cols[0], cols[1], cols[2], cols[3], cols[4], cols[5],
                cols[6], cols[7], bs_line, alpha, beta, tc0)
            tile = tile.at[:, 4:20, tc_col - 3].set(np2)
            tile = tile.at[:, 4:20, tc_col - 2].set(np1)
            tile = tile.at[:, 4:20, tc_col - 1].set(np0)
            tile = tile.at[:, 4:20, tc_col + 0].set(nq0)
            tile = tile.at[:, 4:20, tc_col + 1].set(nq1)
            tile = tile.at[:, 4:20, tc_col + 2].set(nq2)

        # ---- horizontal edges (y = 0,4,8,12 -> tile row 4+4e)
        for e in range(4):
            tr = 4 + 4 * e
            qp_avg = ((qpt + qpc + 1) >> 1) if e == 0 else qpc
            ia, ib = idxAB(qp_avg, offa, offb)
            alpha = _ALPHA[ia][:, None]
            beta = _BETA[ib][:, None]
            seg = jnp.arange(16) // 4
            bs_line = bsh[:, e, :][:, seg]
            tc0 = _TC0[ia[:, None], jnp.clip(bs_line, 0, 3)]
            rows = [tile[:, tr + k, 4:20] for k in range(-4, 4)]
            np2, np1, np0, nq0, nq1, nq2 = _filter_luma_line(
                rows[0], rows[1], rows[2], rows[3], rows[4], rows[5],
                rows[6], rows[7], bs_line, alpha, beta, tc0)
            tile = tile.at[:, tr - 3, 4:20].set(np2)
            tile = tile.at[:, tr - 2, 4:20].set(np1)
            tile = tile.at[:, tr - 1, 4:20].set(np0)
            tile = tile.at[:, tr + 0, 4:20].set(nq0)
            tile = tile.at[:, tr + 1, 4:20].set(nq1)
            tile = tile.at[:, tr + 2, 4:20].set(nq2)

        pY = _scatter_region(pY, tile[:, 1:20, 1:20], oy - 3, ox - 3)

        # ---- chroma ------------------------------------------------------
        oyc = jnp.where(valid, PAD + myc * 8, 0)
        oxc = jnp.where(valid, PAD + mxc * 8, 0)
        new_uv = []
        for p in (pU, pV):
            ct = jax.vmap(
                lambda y, x, pp=p: jax.lax.dynamic_slice(
                    pp, (y - 4, x - 4), (12, 12))
            )(oyc, oxc)
            # vertical chroma edges at x=0,4 -> luma edges 0,2
            for e, le in ((0, 0), (1, 2)):
                tc_col = 4 + 4 * e
                qp_avg = ((cql + cqc + 1) >> 1) if e == 0 else cqc
                ia, ib = idxAB(qp_avg, offa, offb)
                alpha = _ALPHA[ia][:, None]
                beta = _BETA[ib][:, None]
                seg = (jnp.arange(8) * 2) // 4
                bs_line = bsv[:, le, :][:, seg]               # (M,8)
                tc0 = _TC0[ia[:, None], jnp.clip(bs_line, 0, 3)]
                cols = [ct[:, 4:12, tc_col + k] for k in range(-2, 2)]
                np0, nq0 = _filter_chroma_line(
                    cols[0], cols[1], cols[2], cols[3], bs_line, alpha,
                    beta, tc0)
                ct = ct.at[:, 4:12, tc_col - 1].set(np0)
                ct = ct.at[:, 4:12, tc_col + 0].set(nq0)
            for e, le in ((0, 0), (1, 2)):
                tr = 4 + 4 * e
                qp_avg = ((cqt + cqc + 1) >> 1) if e == 0 else cqc
                ia, ib = idxAB(qp_avg, offa, offb)
                alpha = _ALPHA[ia][:, None]
                beta = _BETA[ib][:, None]
                seg = (jnp.arange(8) * 2) // 4
                bs_line = bsh[:, le, :][:, seg]
                tc0 = _TC0[ia[:, None], jnp.clip(bs_line, 0, 3)]
                rows = [ct[:, tr + k, 4:12] for k in range(-2, 2)]
                np0, nq0 = _filter_chroma_line(
                    rows[0], rows[1], rows[2], rows[3], bs_line, alpha,
                    beta, tc0)
                ct = ct.at[:, tr - 1, 4:12].set(np0)
                ct = ct.at[:, tr + 0, 4:12].set(nq0)
            new_uv.append(_scatter_region(p, ct[:, 3:12, 3:12],
                                          oyc - 1, oxc - 1))
        pU, pV = new_uv
        return (pY, pU, pV), None

    (pY, pU, pV), _ = jax.lax.scan(step, (pY, pU, pV), schedule)
    return pY, pU, pV


def _scatter_region(plane, tiles, oy, ox):
    def body(p, args):
        t, y, x = args
        return jax.lax.dynamic_update_slice(p, t, (y, x)), None

    plane, _ = jax.lax.scan(body, plane, (tiles, oy, ox))
    return plane
