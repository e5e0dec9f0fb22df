"""Pallas TPU kernel for the slope-1 wavefront deblocking filter.

``ops/deblock.py:deblock_frame_s1`` runs the wavefront as a ``lax.scan``
whose every step pays ~0.5 us of XLA per-op overhead across ~100 small
slice/update ops — ~56 us per diagonal, ~2.2 ms per CIF frame.  This
module runs the SAME schedule (same V-then-H phase split, bit-exact) as
ONE Pallas kernel with a layout chosen so the hot loop never relayouts:

- a diagonal row of MB tiles is stored **edge-major**: luma
  ``(16 cols, K*16)`` — the V phase reads/writes column c as a *static*
  sublane slice (the edge loop is unrolled in Python), with all K
  diagonal slots and their 16 pixel rows vectorized across lanes;
- the H phase transposes the tile once (cols <-> rows) and then enjoys
  the same static-sublane access pattern;
- all data-dependent table lookups (alpha/beta, tc0) are pre-gathered
  per diagonal by batched XLA outside the kernel, so the kernel body is
  pure elementwise integer math.

Reference parity: ``hl_codec_264_deblock.c`` 8.7.2.3/8.7.2.4 filters;
the V-then-H schedule equivalence argument lives in ``ops/deblock.py``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hartallo_tpu.core.tables import (DEBLOCK_ALPHA, DEBLOCK_BETA,
                                      DEBLOCK_TC0)
from hartallo_tpu.ops.wavefront import (plane_to_tiles, skew,
                                        skew1_geometry, tiles_to_plane,
                                        unskew)

_ALPHA = jnp.asarray(DEBLOCK_ALPHA)
_BETA = jnp.asarray(DEBLOCK_BETA)
_TC0 = jnp.asarray(np.concatenate([np.zeros((52, 1), np.int32),
                                   DEBLOCK_TC0], axis=1))  # [idxA][bS0..3]

PAD = 32

_SEG16 = np.arange(16) // 4
_SEG8 = (np.arange(8) * 2) // 4


def _filter_luma(p3, p2, p1, p0, q0, q1, q2, q3, bs, alpha, beta, tc0):
    """8.7.2.3 / 8.7.2.4 for one edge; same math as
    ops/deblock.py:_filter_luma_line (int32 lines)."""
    fs = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta

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


def _filter_chroma(p1, p0, q0, q1, bs, alpha, beta, tc0):
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


def _edge_filter_8(cols, bs, alpha, beta, tc0):
    """Filter one luma edge given the 8 crossing lines; returns the 6
    modified lines."""
    return _filter_luma(cols[0], cols[1], cols[2], cols[3], cols[4],
                        cols[5], cols[6], cols[7], bs, alpha, beta, tc0)


def _vphase_luma(p1, cy, bs, t0, ab, K):
    """V phase on edge-major tiles: line c = tile column c, each (K, 16).
    Static line reads/writes only."""
    rows = list(cy)          # 16 static lines, each (K, 16)
    left = list(p1)
    for e in range(4):
        w = 0 if e == 0 else 1
        alpha = ab[:, w, 0][:, None]
        beta = ab[:, w, 1][:, None]
        bs_line = bs[:, e, :]
        tc0 = t0[:, e, :]
        if e == 0:
            cols = [left[12], left[13], left[14], left[15],
                    rows[0], rows[1], rows[2], rows[3]]
        else:
            c0 = 4 * e - 4
            cols = [rows[c0 + k] for k in range(8)]
        np2, np1, np0, nq0, nq1, nq2 = _edge_filter_8(
            cols, bs_line, alpha, beta, tc0)
        if e == 0:
            left[13], left[14], left[15] = np2, np1, np0
            rows[0], rows[1], rows[2] = nq0, nq1, nq2
        else:
            c0 = 4 * e - 4
            (rows[c0 + 1], rows[c0 + 2], rows[c0 + 3], rows[c0 + 4],
             rows[c0 + 5], rows[c0 + 6]) = np2, np1, np0, nq0, nq1, nq2
    return left, rows


def _vphase_chroma(p1, cu, bs, t0, ab, K):
    rows = list(cu)          # 8 static lines, each (K, 8)
    left = list(p1)
    for e in range(2):
        alpha = ab[:, e, 0][:, None]
        beta = ab[:, e, 1][:, None]
        bs_line = bs[:, e, :]
        tc0 = t0[:, e, :]
        if e == 0:
            cols = [left[6], left[7], rows[0], rows[1]]
        else:
            cols = [rows[2], rows[3], rows[4], rows[5]]
        np0, nq0 = _filter_chroma(cols[0], cols[1], cols[2], cols[3],
                                  bs_line, alpha, beta, tc0)
        if e == 0:
            left[7] = np0
            rows[0] = nq0
        else:
            rows[3] = np0
            rows[4] = nq0
    return left, rows


def _t_luma(rows, K):
    """Transpose orientations: rows is a list of 16 lines, each
    (K slots, 16 perpendicular px).  Returns the 16 lines of the other
    orientation."""
    t = jnp.stack(rows).transpose(2, 1, 0)          # (16, K, 16)
    return [t[i] for i in range(16)]


def _t_chroma(rows, K):
    t = jnp.stack(rows).transpose(2, 1, 0)
    return [t[i] for i in range(8)]


def _shift_lanes(line, K, n):
    """slot k sees slot k-1's value along the K axis (zeros at slot 0)."""
    return jnp.concatenate([jnp.zeros_like(line[:1]), line[:-1]], axis=0)


def _unshift_merge(top, orig, K, n):
    """Inverse of _shift_lanes for write-back: values written via the
    shifted view land at slot k-1; the last slot keeps its value."""
    return jnp.concatenate([top[1:], orig[-1:]], axis=0)


def _kernel(bsv_ref, bsh_ref, t0v_ref, t0h_ref, abv_ref, abh_ref,
            cbsv_ref, cbsh_ref, ct0v_ref, ct0h_ref, cabv_ref, cabh_ref,
            _wy_in, _wu_in, _wv_in,
            wy_ref, wu_ref, wv_ref):
    """Wavefront over edge-major work buffers.

    wy (D+2, 16, K, 16) int32 — row d, tile column c, slot k, pixel r.
    Rows 0 and D+1 are dummies; iteration s reads rows s-1 (left/top
    neighbor diagonal) and s, writes both back; after the loop row i
    holds the final diagonal i-1.
    """
    D2 = wy_ref.shape[0]
    K = wy_ref.shape[2]

    def body(s, _):
        cy = [wy_ref[s, c] for c in range(16)]
        p1y = [wy_ref[s - 1, c] for c in range(16)]
        cu = [wu_ref[s, c] for c in range(8)]
        p1u = [wu_ref[s - 1, c] for c in range(8)]
        cv = [wv_ref[s, c] for c in range(8)]
        p1v = [wv_ref[s - 1, c] for c in range(8)]
        bsv = bsv_ref[s]
        bsh = bsh_ref[s]
        t0v = t0v_ref[s]
        t0h = t0h_ref[s]
        abv = abv_ref[s]
        abh = abh_ref[s]
        cbsv = cbsv_ref[s]
        cbsh = cbsh_ref[s]
        ct0v = ct0v_ref[s]
        ct0h = ct0h_ref[s]
        cabv = cabv_ref[s]
        cabh = cabh_ref[s]

        # ---- V phase (edge-major: column slices are static rows) -----
        p1y, cy = _vphase_luma(p1y, cy, bsv, t0v, abv, K)
        p1u, cu = _vphase_chroma(p1u, cu, cbsv, ct0v, cabv, K)
        p1v, cv = _vphase_chroma(p1v, cv, cbsv, ct0v, cabv, K)

        # ---- transpose to row-major for the H phase ------------------
        cyr = _t_luma(cy, K)
        p1yr = _t_luma(p1y, K)
        cur = _t_chroma(cu, K)
        p1ur = _t_chroma(p1u, K)
        cvr = _t_chroma(cv, K)
        p1vr = _t_chroma(p1v, K)

        # top neighbor: slot k's top MB sits at slot k-1 of diagonal s-1
        top_y = [_shift_lanes(r, K, 16) for r in p1yr]
        top_u = [_shift_lanes(r, K, 8) for r in p1ur]
        top_v = [_shift_lanes(r, K, 8) for r in p1vr]

        # ---- H phase (row-major: row slices are static rows) ---------
        top_y, cyr = _vphase_luma(top_y, cyr, bsh, t0h, abh, K)
        top_u, cur = _vphase_chroma(top_u, cur, cbsh, ct0h, cabh, K)
        top_v, cvr = _vphase_chroma(top_v, cvr, cbsh, ct0h, cabh, K)

        p1yr = [_unshift_merge(t, o, K, 16) for t, o in zip(top_y, p1yr)]
        p1ur = [_unshift_merge(t, o, K, 8) for t, o in zip(top_u, p1ur)]
        p1vr = [_unshift_merge(t, o, K, 8) for t, o in zip(top_v, p1vr)]

        # row s-1 is final: store in row-major->edge-major transposed
        for c, v in enumerate(_t_luma(p1yr, K)):
            wy_ref[s - 1, c] = v
        for c, v in enumerate(_t_chroma(p1ur, K)):
            wu_ref[s - 1, c] = v
        for c, v in enumerate(_t_chroma(p1vr, K)):
            wv_ref[s - 1, c] = v
        for c, v in enumerate(_t_luma(cyr, K)):
            wy_ref[s, c] = v
        for c, v in enumerate(_t_chroma(cur, K)):
            wu_ref[s, c] = v
        for c, v in enumerate(_t_chroma(cvr, K)):
            wv_ref[s, c] = v
        return 0

    jax.lax.fori_loop(1, D2, body, 0)


def _edge_params(qp_edge, qp_int, offa, offb, bs, seg):
    """Pre-gather alpha/beta (rows, K, 2, 2) and per-line bs/tc0 for one
    direction.  qp_edge/qp_int (rows, K); bs (rows, K, E, 4)."""
    ia_e = jnp.clip(qp_edge + offa, 0, 51)
    ib_e = jnp.clip(qp_edge + offb, 0, 51)
    ia_i = jnp.clip(qp_int + offa, 0, 51)
    ib_i = jnp.clip(qp_int + offb, 0, 51)
    ab = jnp.stack([
        jnp.stack([_ALPHA[ia_e], _BETA[ib_e]], axis=-1),
        jnp.stack([_ALPHA[ia_i], _BETA[ib_i]], axis=-1),
    ], axis=-2).astype(jnp.int32)                    # (rows,K,2,2)
    bs_l = bs[..., seg]                              # (rows,K,E,L)
    E = bs_l.shape[2]
    ia = jnp.stack([ia_e] + [ia_i] * (E - 1), axis=-1)  # (rows,K,E)
    tc0 = _TC0[ia[..., None], jnp.clip(bs_l, 0, 3)]
    return ab, bs_l.astype(jnp.int32), tc0.astype(jnp.int32)


@partial(jax.jit, static_argnames=("gw", "gh", "interpret"))
def deblock_frame_pl(planes, bs_v, bs_h, qp_y, qp_left, qp_top,
                     qpc_cur, qpc_left, qpc_top,
                     alpha_off, beta_off, *, gw: int, gh: int,
                     interpret: bool = False):
    """Drop-in replacement for ops.deblock.deblock_frame_s1 (bit-exact)."""
    pY, pU, pV = planes
    H, W = gh * 16, gw * 16
    geo = skew1_geometry(gw, gh)
    D, K = geo["D"], geo["K"]

    sk = lambda a: skew(a, geo)                              # noqa: E731
    valid = jnp.asarray(geo["valid"])

    def padrows(x, lead=1, tail=1):
        z = jnp.zeros((1,) + x.shape[1:], x.dtype)
        return jnp.concatenate([z] * lead + [x] + [z] * tail, axis=0)

    # tiles -> edge-major (D, 16cols, K*16) int32
    ty = sk(plane_to_tiles(
        jax.lax.dynamic_slice(pY, (PAD, PAD), (H, W)), 16))
    tu = sk(plane_to_tiles(
        jax.lax.dynamic_slice(pU, (PAD, PAD), (H // 2, W // 2)), 8))
    tv = sk(plane_to_tiles(
        jax.lax.dynamic_slice(pV, (PAD, PAD), (H // 2, W // 2)), 8))
    wy = padrows(ty.transpose(0, 3, 1, 2))     # (D, 16c, K, 16r)
    wu = padrows(tu.transpose(0, 3, 1, 2))
    wv = padrows(tv.transpose(0, 3, 1, 2))

    sbv = jnp.where(valid[..., None, None], sk(bs_v), 0)
    sbh = jnp.where(valid[..., None, None], sk(bs_h), 0)
    offa = sk(alpha_off)
    offb = sk(beta_off)
    qpc_c = sk(qp_y)
    cqc = sk(qpc_cur)
    seg16 = jnp.asarray(_SEG16)
    seg8 = jnp.asarray(_SEG8)

    abv, bsv8, t0v = _edge_params((sk(qp_left) + qpc_c + 1) >> 1, qpc_c,
                                  offa, offb, sbv, seg16)
    abh, bsh8, t0h = _edge_params((sk(qp_top) + qpc_c + 1) >> 1, qpc_c,
                                  offa, offb, sbh, seg16)
    cabv, cbsv8, ct0v = _edge_params((sk(qpc_left) + cqc + 1) >> 1, cqc,
                                     offa, offb, sbv[:, :, ::2], seg8)
    cabh, cbsh8, ct0h = _edge_params((sk(qpc_top) + cqc + 1) >> 1, cqc,
                                     offa, offb, sbh[:, :, ::2], seg8)

    aux = [padrows(a) for a in (bsv8, bsh8, t0v, t0h, abv, abh,
                                cbsv8, cbsh8, ct0v, ct0h, cabv, cabh)]

    n_aux = len(aux)
    out_shapes = (
        jax.ShapeDtypeStruct(wy.shape, jnp.int32),
        jax.ShapeDtypeStruct(wu.shape, jnp.int32),
        jax.ShapeDtypeStruct(wv.shape, jnp.int32),
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    oy, ou, ov = pl.pallas_call(
        _kernel,
        out_shape=out_shapes,
        in_specs=[vspec] * (n_aux + 3),
        out_specs=(vspec,) * 3,
        input_output_aliases={n_aux: 0, n_aux + 1: 1, n_aux + 2: 2},
        interpret=interpret,
    )(*aux, wy, wu, wv)

    # work row i holds final diagonal i-1 -> rows 1..D
    y_t = oy[1:D + 1].transpose(0, 2, 3, 1)
    u_t = ou[1:D + 1].transpose(0, 2, 3, 1)
    v_t = ov[1:D + 1].transpose(0, 2, 3, 1)
    newY = tiles_to_plane(unskew(y_t, geo))
    newU = tiles_to_plane(unskew(u_t, geo))
    newV = tiles_to_plane(unskew(v_t, geo))
    pY = jax.lax.dynamic_update_slice(pY, newY, (PAD, PAD))
    pU = jax.lax.dynamic_update_slice(pU, newU, (PAD, PAD))
    pV = jax.lax.dynamic_update_slice(pV, newV, (PAD, PAD))
    return pY, pU, pV
