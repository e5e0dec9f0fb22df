"""Differential tests: batched MC kernels vs the scalar spec oracle
(reference analog: test_codec_h264_interpol.c, all 16 positions)."""
import numpy as np
import jax.numpy as jnp

from hartallo_tpu.oracle import interpol_ref as R
from hartallo_tpu.ops import interpol as K

RNG = np.random.default_rng(77)


def test_luma_all_fracs_and_oob():
    H, W = 48, 64
    ref = RNG.integers(0, 256, size=(H, W)).astype(np.int32)
    ref_pad = jnp.asarray(K.pad_plane(ref))
    cases = []
    for fy in range(4):
        for fx in range(4):
            for trial in range(6):
                bx = int(RNG.integers(0, W - 4))
                by = int(RNG.integers(0, H - 4))
                mvx = int(RNG.integers(-40, 40)) * 4 + fx
                mvy = int(RNG.integers(-40, 40)) * 4 + fy
                cases.append((bx, by, mvx, mvy))
    bx = np.array([c[0] for c in cases], np.int32)
    by = np.array([c[1] for c in cases], np.int32)
    mvx = np.array([c[2] for c in cases], np.int32)
    mvy = np.array([c[3] for c in cases], np.int32)
    got = np.asarray(K.luma_mc_blocks(ref_pad, jnp.asarray(bx),
                                      jnp.asarray(by), jnp.asarray(mvx),
                                      jnp.asarray(mvy)))
    for n, (x0, y0, vx, vy) in enumerate(cases):
        exp = R.luma_pred_4x4(ref, x0, y0, vx, vy)
        assert np.array_equal(got[n], exp), (n, x0, y0, vx, vy)


def test_chroma_all_fracs_and_oob():
    H, W = 24, 32
    ref = RNG.integers(0, 256, size=(H, W)).astype(np.int32)
    ref_pad = jnp.asarray(K.pad_plane(ref))
    cases = []
    for dy in range(8):
        for dx in range(8):
            for trial in range(3):
                bx = int(RNG.integers(0, W - 2))
                by = int(RNG.integers(0, H - 2))
                mvx = int(RNG.integers(-30, 30)) * 8 + dx
                mvy = int(RNG.integers(-30, 30)) * 8 + dy
                cases.append((bx, by, mvx, mvy))
    bx = np.array([c[0] for c in cases], np.int32)
    by = np.array([c[1] for c in cases], np.int32)
    mvx = np.array([c[2] for c in cases], np.int32)
    mvy = np.array([c[3] for c in cases], np.int32)
    got = np.asarray(K.chroma_mc_blocks(ref_pad, jnp.asarray(bx),
                                        jnp.asarray(by), jnp.asarray(mvx),
                                        jnp.asarray(mvy)))
    for n, (x0, y0, vx, vy) in enumerate(cases):
        exp = R.chroma_pred(ref, x0, y0, vx, vy)
        assert np.array_equal(got[n], exp), (n, x0, y0, vx, vy)
