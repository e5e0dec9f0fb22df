"""Skewed-diagonal wavefront layout.

The codec's three serial passes (intra decode recon, intra encode mode
decision, deblocking) have the classic H.264 left/top/above-right MB
dependency, i.e. a slope-2 anti-diagonal wavefront d = mx + 2*my
(reference processes MBs serially: ``hl_codec_264_decode_avc.c:190-211``,
``hl_codec_264_deblock.c:192-288``).

Round-1 ran these as a ``lax.scan`` over diagonals with per-MB
``dynamic_slice`` gathers and an inner scan of ``dynamic_update_slice``
write-backs — M serialized full-plane copies per step.  This module
replaces that with the **skewed systolic layout**: MB tiles are stored as
``T[d, k]`` with ``d = mx + 2*my`` and ``k = my``, so one wavefront step
is a single static row of the tensor and every neighbour the step needs
lives in the previous two or three rows:

    left      (my, mx-1)   -> T[d-1, k]
    top       (my-1, mx)   -> T[d-2, k-1]
    top-right (my-1, mx+1) -> T[d-1, k-1]
    top-left  (my-1, mx-1) -> T[d-3, k-1]

A pass is then ``lax.scan`` over ``d`` whose carry is a sliding window of
the last few diagonal rows — no dynamic indexing anywhere, each step is
one batched tensor op over the K MBs of the diagonal.  Skew/unskew are
single constant-index gathers at the frame boundary.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def skew_geometry(gw: int, gh: int):
    """Static index maps for the (gw, gh) MB grid.

    Returns a dict of numpy arrays:
      D, K            : skewed dims (D = gw + 2*gh - 1 diagonals, K = gh)
      my_of, mx_of    : (D, K) MB coords per slot (clamped to 0 when invalid)
      valid           : (D, K) bool
      d_of, k_of      : (gh, gw) slot per MB (for unskewing)
    """
    D = gw + 2 * gh - 1
    K = gh
    my_of = np.zeros((D, K), np.int32)
    mx_of = np.zeros((D, K), np.int32)
    valid = np.zeros((D, K), bool)
    for d in range(D):
        for k in range(K):
            mx = d - 2 * k
            if 0 <= mx < gw:
                my_of[d, k] = k
                mx_of[d, k] = mx
                valid[d, k] = True
    my_g, mx_g = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    d_of = (mx_g + 2 * my_g).astype(np.int32)
    k_of = my_g.astype(np.int32)
    return {"D": D, "K": K, "my_of": my_of, "mx_of": mx_of,
            "valid": valid, "d_of": d_of, "k_of": k_of}


@lru_cache(maxsize=None)
def skew1_geometry(gw: int, gh: int):
    """Slope-1 variant: d = mx + my (left/top deps only — deblocking).
    D = gw + gh - 1 diagonals, K = gh slots (k = my)."""
    D = gw + gh - 1
    K = gh
    my_of = np.zeros((D, K), np.int32)
    mx_of = np.zeros((D, K), np.int32)
    valid = np.zeros((D, K), bool)
    for d in range(D):
        for k in range(K):
            mx = d - k
            if 0 <= mx < gw:
                my_of[d, k] = k
                mx_of[d, k] = mx
                valid[d, k] = True
    my_g, mx_g = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    d_of = (mx_g + my_g).astype(np.int32)
    k_of = my_g.astype(np.int32)
    return {"D": D, "K": K, "my_of": my_of, "mx_of": mx_of,
            "valid": valid, "d_of": d_of, "k_of": k_of}


def skew(arr, geo):
    """Per-MB array (gh, gw, ...) -> skewed (D, K, ...). Invalid slots get
    the (0, 0) MB's value; mask with geo['valid'] where it matters."""
    return arr[geo["my_of"], geo["mx_of"]]


def unskew(skewed, geo):
    """Skewed (D, K, ...) -> per-MB (gh, gw, ...)."""
    return skewed[geo["d_of"], geo["k_of"]]


def plane_to_tiles(plane, size: int):
    """(gh*size, gw*size) -> (gh, gw, size, size)."""
    H, W = plane.shape
    gh, gw = H // size, W // size
    return plane.reshape(gh, size, gw, size).transpose(0, 2, 1, 3)


def tiles_to_plane(tiles):
    """(gh, gw, size, size) -> (gh*size, gw*size)."""
    gh, gw, s, _ = tiles.shape
    return tiles.transpose(0, 2, 1, 3).reshape(gh * s, gw * s)


def shift_k(row, fill=0):
    """row[k] -> row[k-1] along axis 0 (slot k reads what was at k-1)."""
    pad = jnp.full_like(row[:1], fill)
    return jnp.concatenate([pad, row[:-1]], axis=0)


def unshift_k(row, fill=0):
    """Inverse scatter of shift_k: values destined for slot k-1 move back."""
    pad = jnp.full_like(row[:1], fill)
    return jnp.concatenate([row[1:], pad], axis=0)
