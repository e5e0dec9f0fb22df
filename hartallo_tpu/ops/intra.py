"""Batched intra prediction (jnp): all modes computed at once over MB
batches, then selected — the TPU-native re-expression of
``hl_codec_264_pred_intra.c`` (per-block scalar mode functions).

Representation trick: every *directional* 4x4 mode is a per-pixel weighted
sum of at most 3 samples from the 13-sample edge vector
``s = [l3,l2,l1,l0,tl,t0,...,t7]``; the (index, weight, round, shift)
tables are generated once at import from the spec formulas (8.3.1.2.x) and
the whole mode bank becomes one batched gather + multiply-add.  DC and
Plane modes (masked sums / affine ramps) are computed directly.

Inputs (all int32):
  top4  (..., 8)  p[x,-1] x=0..7, with top-right already substituted
  left4 (..., 4), tl4 (...,)         for 4x4 prediction
  top16 (..., 16), left16 (..., 16), tl16 (...,)
  topc  (..., 8), leftc (..., 8), tlc (...,)
  avail_* (...,) bool
Outputs: (..., n_modes, H, W) int32 prediction banks.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Static (index, weight, round, shift) tables for directional 4x4 modes.
# Edge vector layout: s[0..3] = l[3],l[2],l[1],l[0]; s[4] = tl;
# s[5..12] = t[0..7].
# ---------------------------------------------------------------------------

_L = [3, 2, 1, 0]        # s index of l[i] = _L[i]


def _si_l(i):  # s-index of left[i]
    return 3 - i


def _si_t(i):  # s-index of top[i]
    return 5 + i


_SI_TL = 4

# modes handled by the gather bank, in output order
GATHER_MODES = (0, 1, 3, 4, 5, 6, 7, 8)


def _mode_tables():
    idx = np.zeros((8, 4, 4, 3), dtype=np.int32)
    wgt = np.zeros((8, 4, 4, 3), dtype=np.int32)
    rnd = np.zeros((8, 4, 4), dtype=np.int32)
    sht = np.zeros((8, 4, 4), dtype=np.int32)

    def put(m, y, x, terms, r, s):
        for k, (i, w) in enumerate(terms):
            idx[m, y, x, k] = i
            wgt[m, y, x, k] = w
        rnd[m, y, x] = r
        sht[m, y, x] = s

    for y in range(4):
        for x in range(4):
            # mode 0 vertical / mode 1 horizontal
            put(0, y, x, [(_si_t(x), 1)], 0, 0)
            put(1, y, x, [(_si_l(y), 1)], 0, 0)
            # mode 3 (bank row 2): diagonal down-left
            if x == 3 and y == 3:
                put(2, y, x, [(_si_t(6), 1), (_si_t(7), 3)], 2, 2)
            else:
                put(2, y, x, [(_si_t(x + y), 1), (_si_t(x + y + 1), 2),
                              (_si_t(x + y + 2), 1)], 2, 2)
            # mode 4 (row 3): diagonal down-right
            if x > y:
                put(3, y, x, [(_si_t(x - y - 2), 1), (_si_t(x - y - 1), 2),
                              (_si_t(x - y), 1)], 2, 2)
            elif x < y:
                put(3, y, x, [(_si_l(y - x - 2), 1), (_si_l(y - x - 1), 2),
                              (_si_l(y - x), 1)], 2, 2)
            else:
                put(3, y, x, [(_si_t(0), 1), (_SI_TL, 2), (_si_l(0), 1)],
                    2, 2)
            # mode 5 (row 4): vertical right
            z = 2 * x - y
            if z >= 0 and z % 2 == 0:
                put(4, y, x, [(_si_t(x - (y >> 1) - 1), 1),
                              (_si_t(x - (y >> 1)), 1)], 1, 1)
            elif z >= 0:
                put(4, y, x, [(_si_t(x - (y >> 1) - 2), 1),
                              (_si_t(x - (y >> 1) - 1), 2),
                              (_si_t(x - (y >> 1)), 1)], 2, 2)
            elif z == -1:
                put(4, y, x, [(_si_l(0), 1), (_SI_TL, 2), (_si_t(0), 1)],
                    2, 2)
            else:
                put(4, y, x, [(_si_l(y - 1), 1), (_si_l(y - 2), 2),
                              (_si_l(y - 3), 1)], 2, 2)
            # mode 6 (row 5): horizontal down
            z = 2 * y - x
            if z >= 0 and z % 2 == 0:
                put(5, y, x, [(_si_l(y - (x >> 1) - 1), 1),
                              (_si_l(y - (x >> 1)), 1)], 1, 1)
            elif z >= 0:
                put(5, y, x, [(_si_l(y - (x >> 1) - 2), 1),
                              (_si_l(y - (x >> 1) - 1), 2),
                              (_si_l(y - (x >> 1)), 1)], 2, 2)
            elif z == -1:
                put(5, y, x, [(_si_t(0), 1), (_SI_TL, 2), (_si_l(0), 1)],
                    2, 2)
            else:
                put(5, y, x, [(_si_t(x - 1), 1), (_si_t(x - 2), 2),
                              (_si_t(x - 3), 1)], 2, 2)
            # mode 7 (row 6): vertical left
            if y % 2 == 0:
                put(6, y, x, [(_si_t(x + (y >> 1)), 1),
                              (_si_t(x + (y >> 1) + 1), 1)], 1, 1)
            else:
                put(6, y, x, [(_si_t(x + (y >> 1)), 1),
                              (_si_t(x + (y >> 1) + 1), 2),
                              (_si_t(x + (y >> 1) + 2), 1)], 2, 2)
            # mode 8 (row 7): horizontal up
            z = x + 2 * y
            if z < 5 and z % 2 == 0:
                put(7, y, x, [(_si_l(y + (x >> 1)), 1),
                              (_si_l(y + (x >> 1) + 1), 1)], 1, 1)
            elif z < 5:
                put(7, y, x, [(_si_l(y + (x >> 1)), 1),
                              (_si_l(y + (x >> 1) + 1), 2),
                              (_si_l(y + (x >> 1) + 2), 1)], 2, 2)
            elif z == 5:
                put(7, y, x, [(_si_l(2), 1), (_si_l(3), 3)], 2, 2)
            else:
                put(7, y, x, [(_si_l(3), 1)], 0, 0)
    return idx, wgt, rnd, sht


_IDX, _WGT, _RND, _SHT = _mode_tables()
_J_IDX = jnp.asarray(_IDX)
_J_WGT = jnp.asarray(_WGT)
_J_RND = jnp.asarray(_RND)
_J_SHT = jnp.asarray(_SHT)


def pred4x4_all(top: jnp.ndarray, left: jnp.ndarray, tl: jnp.ndarray,
                avail_top, avail_left) -> jnp.ndarray:
    """All 9 Intra4x4 modes; returns (..., 9, 4, 4) (mode index = spec)."""
    s = jnp.concatenate([left[..., ::-1], tl[..., None], top], axis=-1)
    g = s[..., _J_IDX]                       # (..., 8, 4, 4, 3)
    bank = (jnp.sum(g * _J_WGT, axis=-1) + _J_RND) >> _J_SHT
    # DC
    tsum = jnp.sum(top[..., :4], axis=-1)
    lsum = jnp.sum(left, axis=-1)
    at = jnp.asarray(avail_top, jnp.bool_)
    al = jnp.asarray(avail_left, jnp.bool_)
    dc = jnp.where(at & al, (tsum + lsum + 4) >> 3,
                   jnp.where(al, (lsum + 2) >> 2,
                             jnp.where(at, (tsum + 2) >> 2, 128)))
    dc = jnp.broadcast_to(dc[..., None, None, None],
                          (*dc.shape, 1, 4, 4))
    # interleave: spec order 0,1,2(DC),3..8 — bank rows are 0,1,3..8
    return jnp.concatenate([bank[..., 0:2, :, :], dc, bank[..., 2:, :, :]],
                           axis=-3)


def pred16x16_all(top: jnp.ndarray, left: jnp.ndarray, tl: jnp.ndarray,
                  avail_top, avail_left) -> jnp.ndarray:
    """All 4 Intra16x16 modes; returns (..., 4, 16, 16)."""
    t = top.astype(jnp.int32)
    l = left.astype(jnp.int32)
    batch = t.shape[:-1]
    v = jnp.broadcast_to(t[..., None, :], (*batch, 16, 16))
    h = jnp.broadcast_to(l[..., :, None], (*batch, 16, 16))
    tsum = jnp.sum(t, axis=-1)
    lsum = jnp.sum(l, axis=-1)
    at = jnp.asarray(avail_top, jnp.bool_)
    al = jnp.asarray(avail_left, jnp.bool_)
    dcv = jnp.where(at & al, (tsum + lsum + 16) >> 5,
                    jnp.where(al, (lsum + 8) >> 4,
                              jnp.where(at, (tsum + 8) >> 4, 128)))
    dc = jnp.broadcast_to(dcv[..., None, None], (*batch, 16, 16))
    # plane
    text = jnp.concatenate([tl[..., None], t], axis=-1)   # ext[i]=p[i-1,-1]
    lext = jnp.concatenate([tl[..., None], l], axis=-1)
    xs = jnp.arange(8)
    H = jnp.sum((xs + 1) * (t[..., 8:16] - text[..., 7 - xs]), axis=-1)
    V = jnp.sum((xs + 1) * (l[..., 8:16] - lext[..., 7 - xs]), axis=-1)
    a = 16 * (l[..., 15] + t[..., 15])
    b = (5 * H + 32) >> 6
    c = (5 * V + 32) >> 6
    gx = jnp.arange(16) - 7
    gy = (jnp.arange(16) - 7)[:, None]
    plane = jnp.clip((a[..., None, None] + b[..., None, None] * gx +
                      c[..., None, None] * gy + 16) >> 5, 0, 255)
    return jnp.stack([v, h, dc, plane], axis=-3)


def pred_chroma_all(top: jnp.ndarray, left: jnp.ndarray, tl: jnp.ndarray,
                    avail_top, avail_left) -> jnp.ndarray:
    """All 4 chroma modes (DC,H,V,Plane); returns (..., 4, 8, 8)."""
    t = top.astype(jnp.int32)
    l = left.astype(jnp.int32)
    batch = t.shape[:-1]
    at = jnp.asarray(avail_top, jnp.bool_)
    al = jnp.asarray(avail_left, jnp.bool_)
    # DC per 4x4 sub-block
    ts0 = jnp.sum(t[..., 0:4], axis=-1)
    ts1 = jnp.sum(t[..., 4:8], axis=-1)
    ls0 = jnp.sum(l[..., 0:4], axis=-1)
    ls1 = jnp.sum(l[..., 4:8], axis=-1)

    def corner(ts, ls):
        return jnp.where(at & al, (ts + ls + 4) >> 3,
                         jnp.where(al, (ls + 2) >> 2,
                                   jnp.where(at, (ts + 2) >> 2, 128)))

    v00 = corner(ts0, ls0)
    v11 = corner(ts1, ls1)
    v10 = jnp.where(at, (ts1 + 2) >> 2,
                    jnp.where(al, (ls0 + 2) >> 2, 128))    # (x=4..7, y=0..3)
    v01 = jnp.where(al, (ls1 + 2) >> 2,
                    jnp.where(at, (ts0 + 2) >> 2, 128))    # (x=0..3, y=4..7)
    q = jnp.stack([jnp.stack([v00, v10], axis=-1),
                   jnp.stack([v01, v11], axis=-1)], axis=-2)  # (...,2,2)
    dc = jnp.repeat(jnp.repeat(q, 4, axis=-2), 4, axis=-1)
    h = jnp.broadcast_to(l[..., :, None], (*batch, 8, 8))
    v = jnp.broadcast_to(t[..., None, :], (*batch, 8, 8))
    # plane
    text = jnp.concatenate([tl[..., None], t], axis=-1)
    lext = jnp.concatenate([tl[..., None], l], axis=-1)
    xs = jnp.arange(4)
    H = jnp.sum((xs + 1) * (t[..., 4:8] - text[..., 3 - xs]), axis=-1)
    V = jnp.sum((xs + 1) * (l[..., 4:8] - lext[..., 3 - xs]), axis=-1)
    a = 16 * (l[..., 7] + t[..., 7])
    b = (17 * H + 16) >> 5
    c = (17 * V + 16) >> 5
    gx = jnp.arange(8) - 3
    gy = (jnp.arange(8) - 3)[:, None]
    plane = jnp.clip((a[..., None, None] + b[..., None, None] * gx +
                      c[..., None, None] * gy + 16) >> 5, 0, 255)
    return jnp.stack([dc, h, v, plane], axis=-3)
