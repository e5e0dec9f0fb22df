"""Distortion/activity kernels (hl_math.c family) vs scalar oracles."""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def test_satd4x4_differential():
    import jax.numpy as jnp
    from hartallo_tpu.ops.math import satd4x4, satd4x4_np
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (64, 4, 4))
    b = rng.integers(0, 256, (64, 4, 4))
    got = np.asarray(satd4x4(jnp.asarray(a), jnp.asarray(b)))
    exp = np.array([satd4x4_np(a[i], b[i]) for i in range(64)])
    assert (got == exp).all()
    assert (np.asarray(satd4x4(jnp.asarray(a), jnp.asarray(a))) == 0).all()


def test_mae_mse_homogeneousity():
    import jax.numpy as jnp
    from hartallo_tpu.ops.math import homogeneousity8x8, mae4x4, mse4x4
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (32, 4, 4))
    b = rng.integers(0, 256, (32, 4, 4))
    d = a.astype(np.int64) - b
    assert (np.asarray(mae4x4(jnp.asarray(a), jnp.asarray(b))) ==
            (np.abs(d).sum(axis=(1, 2)) >> 4)).all()
    assert (np.asarray(mse4x4(jnp.asarray(a), jnp.asarray(b))) ==
            ((d * d).sum(axis=(1, 2)) >> 4)).all()
    blk = rng.integers(0, 256, (8, 8, 8))
    h = np.asarray(homogeneousity8x8(jnp.asarray(blk)))
    exp = (np.abs(np.diff(blk, axis=2)).sum(axis=(1, 2)) +
           np.abs(np.diff(blk, axis=1)).sum(axis=(1, 2)))
    assert (h == exp).all()
    flat = np.full((1, 8, 8), 7)
    assert np.asarray(homogeneousity8x8(jnp.asarray(flat)))[0] == 0
