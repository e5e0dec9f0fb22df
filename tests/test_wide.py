"""Differential tests: wide-layout kernels (ops/wide.py) vs the original
batched implementations (the reference-validated oracles)."""
import jax.numpy as jnp
import numpy as np
import pytest

from hartallo_tpu.core.tables import LUMA_4x4_BLK_XY, QP_SCALE_CHROMA
from hartallo_tpu.ops import wide as W

RNG = np.random.default_rng(7)
PAD = W.PAD


def test_residual_planes_wide_matches_compute_residuals():
    from hartallo_tpu.decode.intra_recon import compute_residuals
    gw, gh, B = 5, 4, 2
    M = B * gh * gw
    luma_ac = RNG.integers(-64, 64, (M, 16, 4, 4)).astype(np.int32)
    luma_dc = RNG.integers(-64, 64, (M, 4, 4)).astype(np.int32)
    chroma_ac = RNG.integers(-64, 64, (M, 2, 4, 4, 4)).astype(np.int32)
    chroma_dc = RNG.integers(-64, 64, (M, 2, 2, 2)).astype(np.int32)
    qp = RNG.integers(0, 52, M).astype(np.int32)
    is_i16 = RNG.random(M) < 0.5
    cqoff = 3

    res_y, res_c = W.residual_planes_wide(
        jnp.asarray(luma_ac.reshape(M, 16, 16)),
        jnp.asarray(luma_dc.reshape(M, 16)),
        jnp.asarray(chroma_ac.reshape(M, 2, 4, 16)),
        jnp.asarray(chroma_dc.reshape(M, 2, 4)),
        jnp.asarray(qp), jnp.asarray(is_i16), cqoff,
        jnp.asarray(QP_SCALE_CHROMA), gw, gh)

    bx = (LUMA_4x4_BLK_XY[:, 0]).astype(int)
    by = (LUMA_4x4_BLK_XY[:, 1]).astype(int)
    for b in range(B):
        s = slice(b * gh * gw, (b + 1) * gh * gw)
        ry, rc = compute_residuals(
            jnp.asarray(luma_ac[s].reshape(gh, gw, 16, 4, 4)),
            jnp.asarray(luma_dc[s].reshape(gh, gw, 4, 4)),
            jnp.asarray(chroma_ac[s].reshape(gh, gw, 2, 4, 4, 4)),
            jnp.asarray(chroma_dc[s].reshape(gh, gw, 2, 2, 2)),
            jnp.asarray(qp[s].reshape(gh, gw)),
            jnp.asarray(is_i16[s].reshape(gh, gw)), cqoff)
        ry = np.asarray(ry)                   # (gh,gw,16,16)
        plane = ry.transpose(0, 2, 1, 3).reshape(gh * 16, gw * 16)
        assert (np.asarray(res_y)[b] == plane).all()
        rc = np.asarray(rc)                   # (gh,gw,2,8,8)
        cpl = rc.transpose(2, 0, 3, 1, 4).reshape(2, gh * 8, gw * 8)
        assert (np.asarray(res_c)[b] == cpl).all()


def test_mc_luma_plane_matches_luma_mc_blocks():
    from hartallo_tpu.ops.interpol import luma_mc_blocks
    gw, gh = 5, 4
    H, Wd = gh * 16, gw * 16
    S = 3
    refs = RNG.integers(0, 256, (S, H, Wd)).astype(np.int32)
    pads = np.stack([np.pad(r, PAD, mode="edge") for r in refs])
    N = gh * gw * 16
    bx, by, cbx, cby = [np.asarray(a) for a in W.mc_grids(gw, gh)]
    mvx = RNG.integers(-40, 40, N).astype(np.int32)
    mvy = RNG.integers(-40, 40, N).astype(np.int32)
    slot = RNG.integers(0, S, N).astype(np.int32)
    wp_id = np.zeros((N, 3), np.int32)
    wp_id[:, 0] = 1

    ref = np.asarray(luma_mc_blocks(jnp.asarray(pads), jnp.asarray(bx),
                                    jnp.asarray(by), jnp.asarray(mvx),
                                    jnp.asarray(mvy), jnp.asarray(slot)))
    # assemble (N,4,4) -> (H,W) plane
    exp = np.zeros((H, Wd), np.int32)
    for n in range(N):
        exp[by[n]:by[n] + 4, bx[n]:bx[n] + 4] = ref[n]
    stack = jnp.stack([W.halfpel_planes(jnp.asarray(p)) for p in pads])
    got = np.asarray(W.mc_luma_plane(stack, jnp.asarray(slot),
                                     jnp.asarray(bx), jnp.asarray(by),
                                     jnp.asarray(mvx), jnp.asarray(mvy),
                                     jnp.asarray(wp_id), gw, gh))
    assert (got == exp).all()

    # non-identity weights: per-block [w,o,logWD] vs the scalar formula
    wp = np.stack([RNG.integers(-20, 40, N), RNG.integers(-30, 30, N),
                   RNG.integers(0, 7, N)], axis=1).astype(np.int32)
    got_w = np.asarray(W.mc_luma_plane(stack, jnp.asarray(slot),
                                       jnp.asarray(bx), jnp.asarray(by),
                                       jnp.asarray(mvx), jnp.asarray(mvy),
                                       jnp.asarray(wp), gw, gh))
    for n in RNG.choice(N, 50, replace=False):
        w_, o_, d_ = [int(v) for v in wp[n]]
        blk = ref[n].astype(np.int64)
        expw = np.clip(((blk * w_ + ((1 << d_) >> 1)) >> d_) + o_, 0, 255)
        assert (got_w[by[n]:by[n] + 4, bx[n]:bx[n] + 4] == expw).all()


def test_mc_chroma_plane_matches_chroma_mc_blocks():
    from hartallo_tpu.ops.interpol import chroma_mc_blocks
    gw, gh = 4, 3
    H, Wd = gh * 8, gw * 8
    S = 2
    refs = RNG.integers(0, 256, (S, H, Wd)).astype(np.int32)
    pads = np.stack([np.pad(r, PAD, mode="edge") for r in refs])
    N = gh * gw * 16
    _, _, cbx, cby = [np.asarray(a) for a in W.mc_grids(gw, gh)]
    mvx = RNG.integers(-60, 60, N).astype(np.int32)
    mvy = RNG.integers(-60, 60, N).astype(np.int32)
    slot = RNG.integers(0, S, N).astype(np.int32)
    wp_id = np.zeros((N, 3), np.int32)
    wp_id[:, 0] = 1
    ref = np.asarray(chroma_mc_blocks(jnp.asarray(pads), jnp.asarray(cbx),
                                      jnp.asarray(cby), jnp.asarray(mvx),
                                      jnp.asarray(mvy), jnp.asarray(slot)))
    exp = np.zeros((H, Wd), np.int32)
    for n in range(N):
        exp[cby[n]:cby[n] + 2, cbx[n]:cbx[n] + 2] = ref[n]
    got = np.asarray(W.mc_chroma_plane(jnp.asarray(pads),
                                       jnp.asarray(slot),
                                       jnp.asarray(cbx), jnp.asarray(cby),
                                       jnp.asarray(mvx), jnp.asarray(mvy),
                                       jnp.asarray(wp_id), gw, gh))
    assert (got == exp).all()
