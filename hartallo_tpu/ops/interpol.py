"""Batched sub-pel motion compensation (jnp, TPU-ready).

Re-expression of the reference's 16 per-case interpolation kernels
(``hl_codec_264_interpol.c``, SURVEY.md §2.3 "Interpolation") as one batched
pass: every 4x4 block gathers its 9x9 integer-pel window from the padded
reference plane, all half-pel planes (b, h, j + shifted variants) are
computed with integer 6-tap butterflies, and the 16 fractional cases are
assembled then selected per block — shapes stay static, no data-dependent
control flow.

Conventions: reference planes are edge-replicate padded by ``PAD``; block
base coordinates are pre-clamped so every window stays inside the pad
(equivalent to the spec's per-sample clamp, since fully-outside windows
read fully-replicated samples).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PAD = 32

_TAP = jnp.asarray(np.array([1, -5, 20, 20, -5, 1], np.int32))


def _conv6_last(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """6-tap filter along the last axis: x (..., L) -> (..., out) with
    out entries starting at offset 0 (window [k, k+6))."""
    return sum(int(np.array([1, -5, 20, 20, -5, 1])[k]) *
               x[..., k:k + out] for k in range(6))


def luma_mc_blocks(ref_pad: jnp.ndarray, bx: jnp.ndarray, by: jnp.ndarray,
                   mvx: jnp.ndarray, mvy: jnp.ndarray,
                   ref_sel: jnp.ndarray = None) -> jnp.ndarray:
    """Quarter-pel MC for N 4x4 luma blocks.

    ref_pad: (Hp, Wp) int32 edge-padded by PAD, or (R, Hp, Wp) when
    ``ref_sel`` (N,) selects a reference plane per block.
    bx, by: (N,) block top-left pixel coords (unpadded frame coords).
    mvx, mvy: (N,) quarter-pel MVs.  Returns (N, 4, 4) int32.
    """
    if ref_pad.ndim == 3:
        nref, Hp, Wp = ref_pad.shape
        ref_flat = ref_pad.reshape(nref * Hp, Wp)
        row_base = jnp.clip(ref_sel, 0, nref - 1) * Hp
    else:
        Hp, Wp = ref_pad.shape
        ref_flat = ref_pad
        row_base = jnp.zeros_like(bx)
    H, W = Hp - 2 * PAD, Wp - 2 * PAD
    xi = bx + (mvx >> 2)
    yi = by + (mvy >> 2)
    fx = (mvx & 3).astype(jnp.int32)
    fy = (mvy & 3).astype(jnp.int32)
    # clamp so the 9x9 window [base-2, base+6] stays inside the pad
    xi = jnp.clip(xi, -(PAD - 2), W + PAD - 7)
    yi = jnp.clip(yi, -(PAD - 2), H + PAD - 7)

    # gather windows (N, 9, 9)
    rows = (yi[:, None] + PAD - 2 + row_base[:, None]) + \
        jnp.arange(9)[None, :]                                   # (N,9)
    cols = (xi[:, None] + PAD - 2) + jnp.arange(9)[None, :]
    R = ref_flat[rows[:, :, None], cols[:, None, :]]             # (N,9,9)

    # half-pel intermediates
    H1 = _conv6_last(R, 4)                     # (N,9,4) horiz sums, cols 2..5
    V1 = _conv6_last(R.transpose(0, 2, 1), 4)  # (N,9,4): [n, col, row2..5]
    b = jnp.clip((H1[:, 2:6, :] + 16) >> 5, 0, 255)              # (N,4,4)
    s = jnp.clip((H1[:, 3:7, :] + 16) >> 5, 0, 255)              # b shifted +y
    h = jnp.clip((V1[:, 2:6, :] + 16) >> 5, 0, 255).transpose(0, 2, 1)
    m = jnp.clip((V1[:, 3:7, :] + 16) >> 5, 0, 255).transpose(0, 2, 1)
    # j: 6-tap across the unrounded vertical sums for all 9 columns
    Vfull = sum(int(np.array([1, -5, 20, 20, -5, 1])[k]) *
                R[:, k:k + 4, :] for k in range(6))               # (N,4,9)
    j = jnp.clip((_conv6_last(Vfull, 4) + 512) >> 10, 0, 255)    # (N,4,4)

    G = R[:, 2:6, 2:6]
    Gx = R[:, 2:6, 3:7]
    Gy = R[:, 3:7, 2:6]

    half = [None] * 16
    half[0] = G                                   # (0,0)
    half[1] = (G + b + 1) >> 1                    # (1,0) a
    half[2] = b                                   # (2,0)
    half[3] = (b + Gx + 1) >> 1                   # (3,0) c
    half[4] = (G + h + 1) >> 1                    # (0,1) d
    half[5] = (b + h + 1) >> 1                    # (1,1) e
    half[6] = (b + j + 1) >> 1                    # (2,1) f
    half[7] = (b + m + 1) >> 1                    # (3,1) g
    half[8] = h                                   # (0,2)
    half[9] = (h + j + 1) >> 1                    # (1,2) i
    half[10] = j                                  # (2,2)
    half[11] = (j + m + 1) >> 1                   # (3,2) k
    half[12] = (h + Gy + 1) >> 1                  # (0,3) n
    half[13] = (h + s + 1) >> 1                   # (1,3) p
    half[14] = (j + s + 1) >> 1                   # (2,3) q
    half[15] = (m + s + 1) >> 1                   # (3,3) r
    bank = jnp.stack(half, axis=1)                # (N,16,4,4)
    case = (fy * 4 + fx)[:, None, None, None]
    return jnp.take_along_axis(bank, case, axis=1)[:, 0]


def chroma_mc_blocks(ref_pad: jnp.ndarray, bx: jnp.ndarray, by: jnp.ndarray,
                     mvx: jnp.ndarray, mvy: jnp.ndarray,
                     ref_sel: jnp.ndarray = None) -> jnp.ndarray:
    """Eighth-pel bilinear MC for N 2x2 chroma blocks; returns (N,2,2)."""
    if ref_pad.ndim == 3:
        nref, Hp, Wp = ref_pad.shape
        ref_flat = ref_pad.reshape(nref * Hp, Wp)
        row_base = jnp.clip(ref_sel, 0, nref - 1) * Hp
    else:
        Hp, Wp = ref_pad.shape
        ref_flat = ref_pad
        row_base = jnp.zeros_like(bx)
    H, W = Hp - 2 * PAD, Wp - 2 * PAD
    xi = bx + (mvx >> 3)
    yi = by + (mvy >> 3)
    dx = (mvx & 7).astype(jnp.int32)[:, None, None]
    dy = (mvy & 7).astype(jnp.int32)[:, None, None]
    xi = jnp.clip(xi, -(PAD - 1), W + PAD - 4)
    yi = jnp.clip(yi, -(PAD - 1), H + PAD - 4)
    rows = (yi[:, None] + PAD + row_base[:, None]) + jnp.arange(3)[None, :]
    cols = (xi[:, None] + PAD) + jnp.arange(3)[None, :]
    R = ref_flat[rows[:, :, None], cols[:, None, :]]             # (N,3,3)
    A = R[:, 0:2, 0:2]
    B = R[:, 0:2, 1:3]
    C = R[:, 1:3, 0:2]
    D = R[:, 1:3, 1:3]
    return ((8 - dx) * (8 - dy) * A + dx * (8 - dy) * B +
            (8 - dx) * dy * C + dx * dy * D + 32) >> 6


def pad_plane(plane: np.ndarray) -> np.ndarray:
    """Edge-replicate pad by PAD (host helper)."""
    return np.pad(plane, PAD, mode="edge")
