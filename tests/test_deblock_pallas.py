"""Pallas wavefront deblock kernel vs the XLA scan — bit-exact parity.

The GOP decoder picks the Pallas kernel on real TPU backends
(``decode/d_gop.py:_pick_deblock``); these tests pin its equivalence to
the XLA reference implementation.  Skipped on CPU backends (Mosaic
kernels need TPU hardware; the interpreter is too slow for CI).
"""
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _tpu_available():
    import jax
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:                                    # noqa: BLE001
        return False


def _cases():
    # On TPU: run the real Mosaic kernel at several sizes.  On CPU: run
    # one small case through the Pallas interpreter (slow but exact).
    if _tpu_available():
        return [(22, 18, 1, False), (6, 5, 2, False), (11, 9, 3, False)]
    return [(4, 3, 2, True)]


@pytest.mark.parametrize("gw,gh,seed,interp", _cases())
def test_deblock_pallas_matches_xla_scan(gw, gh, seed, interp):
    import jax.numpy as jnp
    from hartallo_tpu.ops.deblock import deblock_frame_s1
    from hartallo_tpu.ops.deblock_pallas import PAD, deblock_frame_pl

    H, W = gh * 16, gw * 16
    rng = np.random.default_rng(seed)
    planes = (
        jnp.asarray(rng.integers(0, 256, (H + 2 * PAD, W + 2 * PAD)),
                    jnp.int32),
        jnp.asarray(rng.integers(0, 256,
                                 (H // 2 + 2 * PAD, W // 2 + 2 * PAD)),
                    jnp.int32),
        jnp.asarray(rng.integers(0, 256,
                                 (H // 2 + 2 * PAD, W // 2 + 2 * PAD)),
                    jnp.int32),
    )
    args = (
        planes,
        jnp.asarray(rng.integers(0, 5, (gh, gw, 4, 4)), jnp.int32),
        jnp.asarray(rng.integers(0, 5, (gh, gw, 4, 4)), jnp.int32),
        *[jnp.asarray(rng.integers(10, 50, (gh, gw)), jnp.int32)
          for _ in range(3)],
        *[jnp.asarray(rng.integers(10, 40, (gh, gw)), jnp.int32)
          for _ in range(3)],
        jnp.asarray(rng.integers(-4, 5, (gh, gw)) * 2, jnp.int32),
        jnp.asarray(rng.integers(-4, 5, (gh, gw)) * 2, jnp.int32),
    )
    a = deblock_frame_s1(*args, gw=gw, gh=gh)
    b = deblock_frame_pl(*args, gw=gw, gh=gh, interpret=interp)
    for x, y in zip(a, b):
        assert (np.asarray(x) == np.asarray(y)).all()
