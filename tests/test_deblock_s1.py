"""Slope-1 deblock wavefront vs the slope-2 original (bit-exact).

Test data is gradient-rich (smoothed noise + block offsets) so the
bS=4 STRONG filters fire with non-trivial gradients — flat or highly
random data leaves the deep (p2/q2) writes invisible and can hide
order-of-filtering bugs."""
import jax.numpy as jnp
import numpy as np
import pytest

from hartallo_tpu.core.tables import QP_SCALE_CHROMA
from hartallo_tpu.ops.deblock import (PAD, compute_bs, deblock_frame,
                                      deblock_frame_s1)


def _smooth(rng, H, W):
    x = rng.integers(0, 256, (H, W)).astype(np.float64)
    k = np.ones((5, 5)) / 25.0
    from numpy.lib.stride_tricks import sliding_window_view
    p = np.pad(x, 2, mode="edge")
    sm = (sliding_window_view(p, (5, 5)) * k).sum(axis=(2, 3))
    # block offsets to create MB-edge discontinuities
    off = np.repeat(np.repeat(rng.integers(-12, 13, (H // 8, W // 8)),
                              8, 0), 8, 1)
    return np.clip(sm + off, 0, 255).astype(np.int32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_slope1_matches_slope2(seed):
    rng = np.random.default_rng(seed)
    gw, gh = 7, 5
    H, W = gh * 16, gw * 16
    Y = _smooth(rng, H, W)
    U = _smooth(rng, H // 2, W // 2)
    V = _smooth(rng, H // 2, W // 2)
    qp = rng.integers(24, 46, (gh, gw)).astype(np.int32)
    offa = (rng.integers(-2, 3, (gh, gw)) * 2).astype(np.int32)
    offb = (rng.integers(-2, 3, (gh, gw)) * 2).astype(np.int32)
    mb_is_intra = rng.random((gh, gw)) < 0.5
    nnz = rng.integers(0, 3, (4 * gh, 4 * gw)).astype(np.int32)
    mv = rng.integers(-8, 8, (4 * gh, 4 * gw, 2)).astype(np.int32)
    ref = np.zeros((4 * gh, 4 * gw), np.int32)
    fint = np.ones((gh, gw), bool)
    fmb_v = np.zeros((gh, gw), bool)
    fmb_v[:, 1:] = True
    fmb_h = np.zeros((gh, gw), bool)
    fmb_h[1:, :] = True

    bs_v, bs_h = compute_bs(
        jnp.asarray(mb_is_intra), jnp.asarray(nnz), jnp.asarray(mv),
        jnp.asarray(ref), jnp.asarray(fmb_v), jnp.asarray(fmb_h),
        jnp.asarray(fint))
    qpc = QP_SCALE_CHROMA[np.clip(qp, 0, 51)]
    qp_l = np.concatenate([qp[:, :1], qp[:, :-1]], axis=1)
    qp_t = np.concatenate([qp[:1, :], qp[:-1, :]], axis=0)
    qpc_l = np.concatenate([qpc[:, :1], qpc[:, :-1]], axis=1)
    qpc_t = np.concatenate([qpc[:1, :], qpc[:-1, :]], axis=0)
    planes = (jnp.asarray(np.pad(Y, PAD)), jnp.asarray(np.pad(U, PAD)),
              jnp.asarray(np.pad(V, PAD)))
    args = (planes, bs_v, bs_h, jnp.asarray(qp), jnp.asarray(qp_l),
            jnp.asarray(qp_t), jnp.asarray(qpc), jnp.asarray(qpc_l),
            jnp.asarray(qpc_t), jnp.asarray(offa), jnp.asarray(offb))
    aY, aU, aV = deblock_frame(*args, gw=gw, gh=gh)
    bY, bU, bV = deblock_frame_s1(*args, gw=gw, gh=gh)
    # sanity: the filters actually changed pixels (data is not trivial)
    assert np.count_nonzero(np.asarray(aY) != np.pad(Y, PAD)) > 500
    assert np.array_equal(np.asarray(aY), np.asarray(bY))
    assert np.array_equal(np.asarray(aU), np.asarray(bU))
    assert np.array_equal(np.asarray(aV), np.asarray(bV))
