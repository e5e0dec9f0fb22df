"""Motion estimation as batched SAD reductions over the candidate grid.

Reference parity: the active diamond search ``hl_codec_264_me_ds.c:104-688``
(int -> half -> quarter phases, cost = SAD + lambda_motion * mvd-bits) and
the partition preselection of ``hl_codec_264_rdo.c:890-933``.  TPU
re-expression (BASELINE.json north star): *full-search* integer ME — one
scan over all (2R+1)^2 offsets, each step a whole-frame |src-ref| + box
reduction producing per-8x8 SADs, from which 16x16/16x8/8x16/8x8 partition
costs fall out as sums; then two batched 9-point sub-pel refinement rounds
(half, quarter) at 4x4-block granularity with per-partition aggregation.
Full search beats the reference's diamond search in RD while mapping
perfectly onto the VPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hartallo_tpu.ops.interpol import PAD, luma_mc_blocks
from hartallo_tpu.ops.math import satd4x4
from hartallo_tpu.ops.wide import (halfpel_planes, mc_grids,
                                   mc_luma_plane)


def _se_bits(v):
    """Exp-Golomb signed code length for v (jnp)."""
    k = 2 * jnp.abs(v)
    # codeNum k (or k-1); length = 2*floor(log2(codeNum+1)) + 1
    return 2 * jnp.floor(jnp.log2(k.astype(jnp.float32) + 1.0)) + 1.0


@partial(jax.jit, static_argnames=("gw", "gh", "rng"))
def full_search_int(src_pad, ref_pad, lam_motion, *, gw: int, gh: int,
                    rng: int):
    """Integer full search.  Returns per-partition best integer MVs
    (in pel units) and SADs:
      mv16 (gh,gw,2), sad16 (gh,gw)
      mv168 (gh,gw,2,2), sad168 (gh,gw,2)      [16x8 parts]
      mv816 (gh,gw,2,2), sad816 (gh,gw,2)      [8x16 parts]
      mv88 (gh,gw,4,2), sad88 (gh,gw,4)        [8x8 parts]
    Costs include lambda_motion * mvd-bits with a zero MV predictor
    (approximation; exact MVD rate is applied at pack time).
    """
    H, W = gh * 16, gw * 16
    side = 2 * rng + 1
    C = side * side
    # candidates batched in chunks: one scan step evaluates CH whole-frame
    # displacements at once (round-1 ran one per step — C sequential steps)
    CH = 32
    n_chunks = (C + CH - 1) // CH
    Cpad = n_chunks * CH

    src = jax.lax.dynamic_slice(src_pad, (PAD, PAD), (H, W))
    cands = jnp.arange(Cpad)
    chunks = cands.reshape(n_chunks, CH)

    def chunk_sads(cs):
        """cs (CH,) candidate ids -> per-8x8 costs (CH,gh,gw,4) f32 + MVs."""
        dy = jnp.minimum(cs, C - 1) // side - rng
        dx = jnp.minimum(cs, C - 1) % side - rng

        def one(dyi, dxi):
            shifted = jax.lax.dynamic_slice(
                ref_pad, (PAD + dyi, PAD + dxi), (H, W))
            diff = jnp.abs(src - shifted)
            return diff.reshape(2 * gh, 8, 2 * gw, 8).sum(axis=(1, 3))

        s8 = jax.vmap(one)(dy, dx)                          # (CH,2gh,2gw)
        pen = lam_motion * (_se_bits(dx * 4) + _se_bits(dy * 4))
        pen = jnp.where(cs < C, pen, jnp.float32(1e18))     # mask padding
        q = s8.reshape(CH, gh, 2, gw, 2).transpose(0, 1, 3, 2, 4)
        s88 = q.reshape(CH, gh, gw, 4).astype(jnp.float32) + \
            pen[:, None, None, None]
        return s88, dx, dy

    def step(carry, cs):
        (b16c, b16v, b168c, b168v, b816c, b816v, b88c, b88v) = carry
        s88, dx, dy = chunk_sads(cs)                        # (CH,gh,gw,4)
        s16 = s88.sum(-1)                                   # (CH,gh,gw)
        s168 = jnp.stack([s88[..., 0] + s88[..., 1],
                          s88[..., 2] + s88[..., 3]], -1)
        s816 = jnp.stack([s88[..., 0] + s88[..., 2],
                          s88[..., 1] + s88[..., 3]], -1)
        mv = jnp.stack([dx, dy], -1).astype(jnp.int32)      # (CH,2)

        def upd(best_c, best_v, cost):
            # best over the chunk, then against the carry
            k = jnp.argmin(cost, axis=0)                    # (gh,gw[,p])
            cmin = jnp.take_along_axis(cost, k[None], 0)[0]
            vmin = mv[k]                                    # (gh,gw[,p],2)
            better = cmin < best_c
            return (jnp.where(better, cmin, best_c),
                    jnp.where(better[..., None], vmin, best_v))

        b16c, b16v = upd(b16c, b16v, s16)
        b168c, b168v = upd(b168c, b168v, s168)
        b816c, b816v = upd(b816c, b816v, s816)
        b88c, b88v = upd(b88c, b88v, s88)
        return (b16c, b16v, b168c, b168v, b816c, b816v, b88c, b88v), None

    big = jnp.float32(1e18)
    init = (jnp.full((gh, gw), big), jnp.zeros((gh, gw, 2), jnp.int32),
            jnp.full((gh, gw, 2), big), jnp.zeros((gh, gw, 2, 2), jnp.int32),
            jnp.full((gh, gw, 2), big), jnp.zeros((gh, gw, 2, 2), jnp.int32),
            jnp.full((gh, gw, 4), big), jnp.zeros((gh, gw, 4, 2), jnp.int32))
    out, _ = jax.lax.scan(step, init, chunks)
    return out


# 4x4 blocks (by,bx raster) -> partition index per partition scheme
_PART_OF_BLK = {
    "16x16": np.zeros((4, 4), np.int32),
    "16x8": np.repeat(np.arange(2), 2)[:, None] * np.ones((1, 4), np.int32),
    "8x16": np.ones((4, 1), np.int32) * np.repeat(np.arange(2), 2)[None, :],
    "8x8": (np.repeat(np.arange(2), 2)[:, None] * 2 +
            np.repeat(np.arange(2), 2)[None, :]),
}


@partial(jax.jit, static_argnames=("gw", "gh", "nparts"))
def refine_subpel(src_pad, ref_pad, mv_blk, part_of_blk, lam_motion,
                  step_qpel, *, gw: int, gh: int, nparts: int,
                  use_satd: bool = True, hp=None):
    """One 9-point refinement round at +-step_qpel quarter-pel units.

    mv_blk (gh,gw,16,2) quarter-pel MVs per 4x4 block (same within each
    partition); part_of_blk (gh,gw,16) partition id in [0,nparts).
    Candidate predictions come from the decoder's half-pel plane stack +
    flat-take MC (two gathered taps per pixel) instead of a per-block
    9x9 window gather — at 1080p that is ~9x less gather traffic, the
    round's dominant cost.  ``hp``: optional precomputed
    ``halfpel_planes(ref_pad)`` shared across rounds.  Distortion is
    Hadamard SATD (hl_math.c:283) unless ``use_satd`` is False.
    Returns updated mv_blk and per-partition cost (gh,gw,nparts).
    """
    H, W = gh * 16, gw * 16
    n = gh * gw * 16
    if hp is None:
        hp = halfpel_planes(ref_pad)
    hp = hp[None] if hp.ndim == 3 else hp                  # (1,4,Hp,Wp)
    bx, by, _, _ = mc_grids(gw, gh)
    slot = jnp.zeros((n,), jnp.int32)
    wp_id = jnp.zeros((n, 3), jnp.int32).at[:, 0].set(1)
    src = jax.lax.dynamic_slice(src_pad, (PAD, PAD), (H, W))

    def per_block(plane):
        """(H, W) -> (gh, gw, 16) in (my, mx, by, bx) block order."""
        b = plane.reshape(gh, 4, 4, gw, 4, 4).transpose(0, 3, 1, 4, 2, 5)
        return b.reshape(gh, gw, 16, 4, 4)

    src_blocks = per_block(src)

    deltas = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1),
              (-1, -1), (1, -1), (-1, 1), (1, 1)]
    mvf = mv_blk.reshape(n, 2)
    onehot = jax.nn.one_hot(part_of_blk, nparts, dtype=jnp.float32)
    costs = []
    for (ddx, ddy) in deltas:
        mvx = mvf[:, 0] + ddx * step_qpel
        mvy = mvf[:, 1] + ddy * step_qpel
        pred = mc_luma_plane(hp, slot, bx, by, mvx, mvy, wp_id, gw, gh)
        pb = per_block(pred)
        if use_satd:
            sad = satd4x4(pb, src_blocks).astype(jnp.float32)
        else:
            sad = jnp.abs(pb - src_blocks).sum(axis=(-1, -2)) \
                .astype(jnp.float32)
        psad = jnp.einsum("ghbn,ghb->ghn", onehot, sad)
        # rate term: bits of the refined MV (zero-pred approximation)
        mvxp = mv_blk[..., 0] + ddx * step_qpel
        mvyp = mv_blk[..., 1] + ddy * step_qpel
        pbits = jnp.einsum(
            "ghbn,ghb->ghn", onehot,
            (_se_bits(mvxp) + _se_bits(mvyp))) / \
            jnp.maximum(jnp.einsum("ghbn->ghn", onehot), 1.0)
        costs.append(psad + lam_motion * pbits)
    cost_stack = jnp.stack(costs)                           # (9,gh,gw,np)
    best = jnp.argmin(cost_stack, axis=0)                   # (gh,gw,np)
    best_cost = jnp.min(cost_stack, axis=0)
    dxs = jnp.asarray([d[0] for d in deltas], jnp.int32)
    dys = jnp.asarray([d[1] for d in deltas], jnp.int32)
    dd = jnp.stack([dxs[best], dys[best]], axis=-1)         # (gh,gw,np,2)
    # scatter partition delta back to blocks
    dd_blk = jnp.stack([
        jnp.take_along_axis(dd[..., 0], part_of_blk, axis=2),
        jnp.take_along_axis(dd[..., 1], part_of_blk, axis=2)], axis=-1)
    return mv_blk + dd_blk * step_qpel, best_cost
