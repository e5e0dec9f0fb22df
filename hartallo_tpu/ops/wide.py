"""Wide-layout (lane-friendly) decode kernels.

TPU VREGs are (8, 128) tiles: any tensor whose minor dims are (4, 4) or
(9, 9) wastes 8-32x of every op and every byte of HBM traffic.  These
kernels re-express the decode hot path with the flattened block index as
the MINOR axis — ``(small, N)`` layouts — and replace the 16-case
quarter-pel interpolation bank (``ops/interpol.py``) with **half-pel
planes carried alongside each reference frame**: the three H.264 half-pel
grids (b = horizontal, h = vertical, j = diagonal; spec 8.4.2.2.1) are
computed ONCE per decoded frame as separable full-plane 6-tap filters,
and per-block quarter-pel MC becomes two 4x4 gathers + one average.

Reference parity: ``hl_codec_264_interpol.c`` (16 per-case kernels — the
half-pel planes compute the same b/h/j values), ``hl_codec_264_transf.c``
(inverse transform), ``hl_codec_264_deblock.c`` (boundary strengths,
8.7.2.1).  Note: H.264 deblocking is NOT separable into picture-level
V-then-H passes (the left MB's horizontal filtering feeds the current
MB's vertical filter), so pixel filtering stays on the wavefront in
``ops/deblock.py``; only the bS/threshold precompute lives here.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hartallo_tpu.core import tables as T
from hartallo_tpu.core.tables import (DEBLOCK_ALPHA, DEBLOCK_BETA,
                                      DEBLOCK_TC0, LUMA_4x4_BLK_XY)

PAD = 32

# ---------------------------------------------------------------------------
# Half-pel planes
# ---------------------------------------------------------------------------

_TAPS = (1, -5, 20, 20, -5, 1)


def _conv6_axis1(x: jnp.ndarray) -> jnp.ndarray:
    """Unrounded 6-tap along the last axis; x (..., W+5) -> (..., W)."""
    W = x.shape[-1] - 5
    return sum(t * jax.lax.slice_in_dim(x, k, k + W, axis=-1)
               for k, t in enumerate(_TAPS))


def halfpel_planes(pad_plane: jnp.ndarray) -> jnp.ndarray:
    """(Hp, Wp) int32 edge-padded luma plane -> (4, Hp, Wp) stack
    [G, b, h, j] of integer + half-pel grids (values match
    ops/interpol.luma_mc_blocks' b/h/j for every legal MC read)."""
    G = pad_plane
    gx = jnp.pad(G, ((0, 0), (2, 3)), mode="edge")
    H1 = _conv6_axis1(gx)                                 # unrounded horiz
    b = jnp.clip((H1 + 16) >> 5, 0, 255)
    gy = jnp.pad(G, ((2, 3), (0, 0)), mode="edge")
    V1 = _conv6_axis1(gy.T).T                             # unrounded vert
    h = jnp.clip((V1 + 16) >> 5, 0, 255)
    hy = jnp.pad(H1, ((2, 3), (0, 0)), mode="edge")
    J1 = _conv6_axis1(hy.T).T                             # 6-tap over H1
    j = jnp.clip((J1 + 512) >> 10, 0, 255)
    return jnp.stack([G, b, h, j])


# quarter-pel case tables: case = 4*fy + fx -> (plane, dx, dy) x 2, averaged
# as (A + B + 1) >> 1 (single-plane cases set B = A).  Planes: 0=G 1=b 2=h 3=j
_QP_CASES = [
    # (p0, dx0, dy0, p1, dx1, dy1)
    (0, 0, 0, 0, 0, 0),   # (0,0) G
    (0, 0, 0, 1, 0, 0),   # (1,0) a = (G+b)/2
    (1, 0, 0, 1, 0, 0),   # (2,0) b
    (1, 0, 0, 0, 1, 0),   # (3,0) c = (b+G(+x))/2
    (0, 0, 0, 2, 0, 0),   # (0,1) d = (G+h)/2
    (1, 0, 0, 2, 0, 0),   # (1,1) e = (b+h)/2
    (1, 0, 0, 3, 0, 0),   # (2,1) f = (b+j)/2
    (1, 0, 0, 2, 1, 0),   # (3,1) g = (b+h(+x))/2
    (2, 0, 0, 2, 0, 0),   # (0,2) h
    (2, 0, 0, 3, 0, 0),   # (1,2) i = (h+j)/2
    (3, 0, 0, 3, 0, 0),   # (2,2) j
    (3, 0, 0, 2, 1, 0),   # (3,2) k = (j+h(+x))/2
    (2, 0, 0, 0, 0, 1),   # (0,3) n = (h+G(+y))/2
    (2, 0, 0, 1, 0, 1),   # (1,3) p = (h+b(+y))/2
    (3, 0, 0, 1, 0, 1),   # (2,3) q = (j+b(+y))/2
    (2, 1, 0, 1, 0, 1),   # (3,3) r = (h(+x)+b(+y))/2
]
_QPT = np.asarray(_QP_CASES, np.int32)          # (16, 6)


# block index n ordered (my, mx, by, bx); static grids
def mc_grids(gw: int, gh: int):
    myg, mxg, byg, bxg = np.meshgrid(np.arange(gh), np.arange(gw),
                                     np.arange(4), np.arange(4),
                                     indexing="ij")
    n = gh * gw * 16
    return (jnp.asarray((mxg * 16 + bxg * 4).reshape(n).astype(np.int32)),
            jnp.asarray((myg * 16 + byg * 4).reshape(n).astype(np.int32)),
            jnp.asarray((mxg * 8 + bxg * 2).reshape(n).astype(np.int32)),
            jnp.asarray((myg * 8 + byg * 2).reshape(n).astype(np.int32)))


def _to_grid(v: jnp.ndarray, gw: int, gh: int) -> jnp.ndarray:
    """(N,) block-ordered (my, mx, by, bx) -> (4gh, 4gw) block grid."""
    return v.reshape(gh, gw, 4, 4).transpose(0, 2, 1, 3) \
        .reshape(4 * gh, 4 * gw)


def _expand(g: jnp.ndarray, s: int) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(g, s, 0), s, 1)


def _weigh(pred, w, o, lwd):
    """8.4.2.3.2 explicit uni-pred weighting (identity at (1, 0, 0))."""
    return jnp.clip(((pred * w + ((1 << lwd) >> 1)) >> lwd) + o, 0, 255)


def mc_luma_plane(stack: jnp.ndarray, slot: jnp.ndarray,
                  bx: jnp.ndarray, by: jnp.ndarray,
                  mvx: jnp.ndarray, mvy: jnp.ndarray,
                  wp3: jnp.ndarray, gw: int, gh: int) -> jnp.ndarray:
    """Quarter-pel MC producing the (H, W) luma prediction PLANE.

    stack: (S, 4, Hp, Wp) int32 ring of [G,b,h,j] per reference slot.
    slot/bx/by/mvx/mvy: (N,) per 4x4 block, N ordered (my, mx, by, bx).
    wp3: (N, 3) weighted-prediction [w, o, logWD] per block.

    Per-pixel linear indices are built with wide repeats and the two
    taps fetched with flat ``jnp.take`` — the only gather orientation
    the TPU executes at full speed.
    """
    S, _, Hp, Wp = stack.shape        # may be over-allocated (ring pad)
    H, W = gh * 16, gw * 16
    flat = stack.reshape(-1)
    xi = bx + (mvx >> 2)
    yi = by + (mvy >> 2)
    fx = (mvx & 3).astype(jnp.int32)
    fy = (mvy & 3).astype(jnp.int32)
    xi = jnp.clip(xi, -(PAD - 2), W + PAD - 7)
    yi = jnp.clip(yi, -(PAD - 2), H + PAD - 7)
    case = 4 * fy + fx                                    # (N,)
    qpt = jnp.asarray(_QPT)
    cs = qpt[case]                                        # (N, 6)
    yy = (jnp.arange(H) % 4)[:, None] * Wp
    xx = (jnp.arange(W) % 4)[None, :]

    def tap(p, dx, dy):
        base = ((slot * 4 + p) * Hp + (yi + dy + PAD)) * Wp + \
            (xi + dx + PAD)                               # (N,)
        px = _expand(_to_grid(base, gw, gh), 4)           # (H, W)
        return jnp.take(flat, px + yy + xx).astype(jnp.int32)

    A = tap(cs[:, 0], cs[:, 1], cs[:, 2])
    B = tap(cs[:, 3], cs[:, 4], cs[:, 5])
    pred = (A + B + 1) >> 1
    w = _expand(_to_grid(wp3[:, 0], gw, gh), 4)
    o = _expand(_to_grid(wp3[:, 1], gw, gh), 4)
    lwd = _expand(_to_grid(wp3[:, 2], gw, gh), 4)
    return _weigh(pred, w, o, lwd)


def mc_chroma_plane(ring: jnp.ndarray, slot: jnp.ndarray,
                    bx: jnp.ndarray, by: jnp.ndarray,
                    mvx: jnp.ndarray, mvy: jnp.ndarray,
                    wp3: jnp.ndarray, gw: int, gh: int) -> jnp.ndarray:
    """Eighth-pel bilinear MC producing the (H/2, W/2) chroma plane.
    Inputs as mc_luma_plane (chroma block coords); ring (S, Hp, Wp)."""
    S, Hp, Wp = ring.shape            # may be over-allocated (ring pad)
    H, W = gh * 8, gw * 8
    flat = ring.reshape(-1)
    xi = bx + (mvx >> 3)
    yi = by + (mvy >> 3)
    fx = (mvx & 7).astype(jnp.int32)
    fy = (mvy & 7).astype(jnp.int32)
    xi = jnp.clip(xi, -(PAD - 1), W + PAD - 4)
    yi = jnp.clip(yi, -(PAD - 1), H + PAD - 4)
    base = (slot * Hp + yi + PAD) * Wp + (xi + PAD)
    px = _expand(_to_grid(base, gw, gh), 2) + \
        (jnp.arange(2 * 4 * gh) % 2)[:, None] * Wp + \
        (jnp.arange(2 * 4 * gw) % 2)[None, :]
    A = jnp.take(flat, px).astype(jnp.int32)
    Bt = jnp.take(flat, px + 1).astype(jnp.int32)
    C = jnp.take(flat, px + Wp).astype(jnp.int32)
    D = jnp.take(flat, px + Wp + 1).astype(jnp.int32)
    dx = _expand(_to_grid(fx, gw, gh), 2)
    dy = _expand(_to_grid(fy, gw, gh), 2)
    pred = ((8 - dx) * (8 - dy) * A + dx * (8 - dy) * Bt +
            (8 - dx) * dy * C + dx * dy * D + 32) >> 6
    w = _expand(_to_grid(wp3[:, 0], gw, gh), 2)
    o = _expand(_to_grid(wp3[:, 1], gw, gh), 2)
    lwd = _expand(_to_grid(wp3[:, 2], gw, gh), 2)
    return _weigh(pred, w, o, lwd)


# ---------------------------------------------------------------------------
# Wide residual decode (dequant + IDCT + plane assembly)
# ---------------------------------------------------------------------------

_QUANT_V00 = jnp.asarray(T.QUANT_V[:, 0, 0])            # (6,)
_LS16 = jnp.asarray((16 * T.QUANT_V).reshape(6, 16).T)  # (16, 6)

# spec blkIdx -> raster 4x4-block position inside the MB
_BLK_RASTER = ((LUMA_4x4_BLK_XY[:, 1] // 4) * 4 +
               (LUMA_4x4_BLK_XY[:, 0] // 4)).astype(int)
_RASTER_TO_BLK = np.argsort(_BLK_RASTER)                # raster -> blkIdx


def _ict_stage(d: jnp.ndarray, axis: int) -> jnp.ndarray:
    d0, d1, d2, d3 = [jnp.take(d, i, axis=axis) for i in range(4)]
    e0, e1 = d0 + d2, d0 - d2
    e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
    return jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=axis)


def idct_wide(X: jnp.ndarray) -> jnp.ndarray:
    """8.5.12.2 inverse core transform; X (..., 4, 4, N) [row, col, N]."""
    h = _ict_stage(_ict_stage(X, -2), -3)
    return (h + 32) >> 6


def _had_stage(d: jnp.ndarray, axis: int) -> jnp.ndarray:
    d0, d1, d2, d3 = [jnp.take(d, i, axis=axis) for i in range(4)]
    a0, a1 = d0 + d1, d0 - d1
    b0, b1 = d2 + d3, d2 - d3
    return jnp.stack([a0 + b0, a0 - b0, a1 - b1, a1 + b1], axis=axis)


def dequant_wide(c: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """8.5.12.1 flat dequant; c (16, N) raster coeffs, qp (N,) int32."""
    ls = _LS16[:, qp % 6]                                # (16, N)
    qdiv = qp // 6
    hi = (c * ls) << jnp.maximum(qdiv - 4, 0)
    lo = (c * ls + (1 << jnp.maximum(3 - qdiv, 0))) >> \
        jnp.maximum(4 - qdiv, 0)
    return jnp.where(qp >= 24, hi, lo)


def luma_dc_descale_wide(dc: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """8.5.10; dc (16, M) raster Hadamard input per MB, qp (M,)."""
    f = _had_stage(_had_stage(dc.reshape(4, 4, -1), 0), 1).reshape(16, -1)
    scale = 16 * _QUANT_V00[qp % 6]
    qdiv = qp // 6
    hi = (f * scale) << jnp.maximum(qdiv - 6, 0)
    lo = (f * scale + (1 << jnp.maximum(5 - qdiv, 0))) >> \
        jnp.maximum(6 - qdiv, 0)
    return jnp.where(qp >= 36, hi, lo)


def chroma_dc_descale_wide(dc: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """8.5.11 (4:2:0); dc (4, M) [c00 c01 c10 c11] per MB, qp (M,)."""
    t0 = dc[0] + dc[2]
    t1 = dc[1] + dc[3]
    t2 = dc[0] - dc[2]
    t3 = dc[1] - dc[3]
    f = jnp.stack([t0 + t1, t0 - t1, t2 + t3, t2 - t3])
    scale = 16 * _QUANT_V00[qp % 6]
    return ((f * scale) << (qp // 6)) >> 5


def residual_planes_wide(luma_ac, luma_dc, chroma_ac, chroma_dc, qp,
                         is_i16, chroma_qp_off: int, qpc_table,
                         gw: int, gh: int):
    """All-wide residual decode for (possibly frame-batched) MB buffers.

    luma_ac (M, 16, 16): per-MB, per-blkIdx raster coeffs (flattened 4x4);
    luma_dc (M, 16); chroma_ac (M, 2, 4, 16); chroma_dc (M, 2, 4);
    qp (M,) int32; is_i16 (M,) bool; qpc_table (52,) chroma QP map.
    M = B * gh * gw.  Returns res_y (B, H, W), res_c (B, 2, H/2, W/2).
    """
    M = qp.shape[0]
    B = M // (gh * gw)
    NB = M * 16

    X = luma_ac.transpose(2, 0, 1).reshape(16, NB)       # [coef, mb*blk]
    qp_nb = jnp.repeat(qp, 16, total_repeat_length=NB)
    d = dequant_wide(X, qp_nb)
    dcd = luma_dc_descale_wide(luma_dc.T, qp)            # (16, M) raster DC
    # dc[r] belongs to the block at raster position r -> blkIdx order
    dc_blk = dcd[jnp.asarray(_BLK_RASTER)]               # (16blk, M)
    d0 = jnp.where(is_i16[None, :], dc_blk, d[0].reshape(M, 16).T)
    d = d.at[0].set(d0.T.reshape(NB))
    r = idct_wide(d.reshape(4, 4, NB))                   # (4,4,NB)
    # NB ordered (M, blk) = (B, gh, gw, blk); reorder blk -> raster
    r = r.reshape(4, 4, M, 16)[:, :, :, jnp.asarray(_RASTER_TO_BLK)]
    r = r.transpose(2, 3, 0, 1).reshape(B, gh, gw, 4, 4, 4, 4)
    res_y = r.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B, gh * 16, gw * 16)

    qpc = qpc_table[jnp.clip(qp + chroma_qp_off, 0, 51)]
    NC = M * 2 * 4
    Xc = chroma_ac.transpose(3, 0, 1, 2).reshape(16, NC)
    qpc_nc = jnp.repeat(qpc, 8, total_repeat_length=NC)
    dc_ = dequant_wide(Xc, qpc_nc)
    dcc = chroma_dc_descale_wide(
        chroma_dc.transpose(2, 0, 1).reshape(4, M * 2),
        jnp.broadcast_to(qpc[None, :], (2, M)).T.reshape(M * 2))
    # dcc (4, M*2) [2x2 raster] == chroma blk order (raster); scatter
    dcc_nc = dcc.reshape(4, M, 2).transpose(1, 2, 0).reshape(NC)
    dc_ = dc_.at[0].set(dcc_nc)
    rc = idct_wide(dc_.reshape(4, 4, NC))                # (4,4,NC)
    rc = rc.reshape(4, 4, M, 2, 4).transpose(2, 3, 4, 0, 1) \
        .reshape(B, gh, gw, 2, 2, 2, 4, 4)
    res_c = rc.transpose(0, 3, 1, 4, 6, 2, 5, 7) \
        .reshape(B, 2, gh * 8, gw * 8)
    return res_y, res_c


# ---------------------------------------------------------------------------
# Boundary strengths (batched, grid form)
# ---------------------------------------------------------------------------

def compute_bs_grids(mb_is_intra, nnz, mv, ref, fmb_v, fmb_h, fint):
    """Boundary-strength grids, flag-gated.  Same rules as
    ops/deblock.compute_bs but returned as (4gh, 4gw) grids where
    bs_vg[r, c] is the edge LEFT of 4x4 block (r, c) and bs_hg[r, c] the
    edge ABOVE it.  Leading batch dims allowed on every input."""
    gh, gw = mb_is_intra.shape[-2:]
    rep = lambda a: jnp.repeat(jnp.repeat(a, 4, -2), 4, -1)  # noqa: E731
    bi = rep(mb_is_intra)
    nz = nnz > 0

    def edge_bs(axis):
        intra_pq = bi | jnp.roll(bi, 1, axis=axis)
        nz_pq = nz | jnp.roll(nz, 1, axis=axis)
        mv_p = jnp.roll(mv, 1, axis=axis - 1 if axis < 0 else axis)
        ref_p = jnp.roll(ref, 1, axis=axis)
        mv_far = (jnp.abs(mv - mv_p) >= 4).any(axis=-1)
        ref_diff = ref != ref_p
        return jnp.where(intra_pq, 4,
                         jnp.where(nz_pq, 2,
                                   jnp.where(mv_far | ref_diff, 1, 0)))

    bs_vg = edge_bs(-1)
    bs_hg = edge_bs(-2)
    blk_col = jnp.arange(4 * gw) % 4
    blk_row = jnp.arange(4 * gh) % 4
    internal_v = (blk_col != 0)[None, :]
    internal_h = (blk_row != 0)[:, None]
    bs_vg = jnp.where(internal_v & (bs_vg == 4), 3, bs_vg)
    bs_hg = jnp.where(internal_h & (bs_hg == 4), 3, bs_hg)
    fv = rep(fmb_v)
    fh = rep(fmb_h)
    fi = rep(fint)
    bs_vg = jnp.where(jnp.where(internal_v, fi, fv), bs_vg, 0)
    bs_hg = jnp.where(jnp.where(internal_h, fi, fh), bs_hg, 0)
    return bs_vg, bs_hg
