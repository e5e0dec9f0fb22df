"""Batched distortion / activity kernels (reference ``hl_math.c`` family).

The reference exposes SIMD-dispatched scalar kernels per 4x4 block
(``hl_math.c:9-32``): SAD, SATD (Hadamard, ``:283``), MAE/MSE, and the
``homogeneousity8x8`` edge-activity metric (``:470``) used by its fast
mode preselection.  Here each is one batched jnp op over (..., 4, 4)
block tensors — SAD lives inline in the ME code; this module adds the
remaining family members.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _hadamard4(d: jnp.ndarray) -> jnp.ndarray:
    """H @ d @ H for (..., 4, 4) int32 (H = 4x4 Hadamard, un-normalized)."""
    def stage(a, axis):
        a0, a1, a2, a3 = (jnp.take(a, i, axis=axis) for i in range(4))
        return jnp.stack([a0 + a1 + a2 + a3,
                          a0 + a1 - a2 - a3,
                          a0 - a1 - a2 + a3,
                          a0 - a1 + a2 - a3], axis=axis)
    return stage(stage(d, -2), -1)


def satd4x4(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """SATD per block: sum(|H (a-b) H|) >> 1 (the /2 after the abs-sum,
    exactly as ``hl_math_satd4x4_u8_cpp``).  a, b (..., 4, 4) int32;
    returns (...,) int32."""
    t = _hadamard4(a.astype(jnp.int32) - b.astype(jnp.int32))
    return jnp.abs(t).sum(axis=(-1, -2)) >> 1


def satd4x4_np(a: np.ndarray, b: np.ndarray) -> int:
    """Scalar oracle."""
    H = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                  [1, -1, -1, 1], [1, -1, 1, -1]], np.int64)
    d = a.astype(np.int64) - b.astype(np.int64)
    return int(np.abs(H @ d @ H).sum()) >> 1


def mae4x4(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error per block ((sum|a-b|) >> 4,
    ``hl_math_mae4x4_u8_cpp``)."""
    return jnp.abs(a.astype(jnp.int32) -
                   b.astype(jnp.int32)).sum(axis=(-1, -2)) >> 4


def mse4x4(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error per block ((sum (a-b)^2) >> 4,
    ``hl_math_mse4x4_u8_cpp``)."""
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return (d * d).sum(axis=(-1, -2)) >> 4


def homogeneousity8x8(blocks: jnp.ndarray) -> jnp.ndarray:
    """Edge-activity metric per 8x8 block (``hl_math.c:470``): sum of
    |horizontal gradient| + |vertical gradient| over the interior —
    the reference's fast-mode-preselect signal (rdo.c:890-933).
    blocks (..., 8, 8); returns (...,) int32."""
    b = blocks.astype(jnp.int32)
    gh_ = jnp.abs(b[..., :, 1:] - b[..., :, :-1]).sum(axis=(-1, -2))
    gv_ = jnp.abs(b[..., 1:, :] - b[..., :-1, :]).sum(axis=(-1, -2))
    return gh_ + gv_
