"""SVC inter-layer intra resampling (spec G.8.6.2): 16-phase polyphase
upsampling of the reference-layer reconstruction.

Reference parity: ``hl_codec_264_decode_svc.c:2817-2926`` (_resample_intra
-> _interpol_intra_base) with the Table G-9 filters
(``hl_codec_264_tables.h:626,647``).  Separable vertical-then-horizontal
pass with 1/16-pel reference-position mapping; intermediate sums kept
unrounded, final clip((acc + 512) >> 10).

Batched jnp implementation gathers per-output-pixel 4-tap windows from the
edge-padded base plane — one whole-plane pass, no per-MB work.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Table G-9: 16-phase 4-tap luma filter.
PHASE_LUMA = np.array(
    [[0, 32, 0, 0], [-1, 32, 2, -1], [-2, 31, 4, -1], [-3, 30, 6, -1],
     [-3, 28, 8, -1], [-4, 26, 11, -1], [-4, 24, 14, -2], [-3, 22, 16, -3],
     [-3, 19, 19, -3], [-3, 16, 22, -3], [-2, 14, 24, -4], [-1, 11, 26, -4],
     [-1, 8, 28, -3], [-1, 6, 30, -3], [-1, 4, 31, -2], [-1, 2, 32, -1]],
    dtype=np.int32)
# 16-phase 2-tap (bilinear) chroma filter.
PHASE_CHROMA = np.array([[32 - 2 * p, 2 * p] for p in range(16)],
                        dtype=np.int32)


def ref_positions(out_size: int, ref_size: int, chroma: bool = False,
                  phase: int = -1, ref_phase: int = -1):
    """1/16-pel reference positions per output sample — the exact G.6.3
    derivation (G-45..G-59) for progressive frames with zero scaled-ref
    offsets and level_idc <= 30 (shift 16).  ``phase``/``ref_phase`` are
    chroma_phase_*_plus1 - 1 (both default -1 when the flags are absent);
    for luma the (2 + 0) variant with delta 8 applies.

    Returns (base_idx, phase16): sample index of the filter tap x=1 (the
    "left" integer sample) and the 0..15 phase."""
    shift = 16
    scale = ((ref_size << shift) + (out_size >> 1)) // out_size   # G-45
    if chroma:
        add = (((ref_size * (2 + phase)) << (shift - 2)) +
               (out_size >> 1)) // out_size + (1 << (shift - 5))  # G-48
        delta = 4 * (2 + ref_phase)                               # G-49
    else:
        add = (((ref_size * 2) << (shift - 2)) +
               (out_size >> 1)) // out_size + (1 << (shift - 5))
        delta = 8
    x = np.arange(out_size, dtype=np.int64)
    pos16 = ((x * scale + add) >> (shift - 4)) - delta            # G-59
    base = pos16 >> 4
    phase16 = (pos16 & 15).astype(np.int64)
    return base.astype(np.int64), phase16


def upsample_plane_np(base: np.ndarray, out_h: int, out_w: int,
                      chroma: bool = False) -> np.ndarray:
    """NumPy oracle: separable 16-phase upsampling with edge clamping."""
    filt = PHASE_CHROMA if chroma else PHASE_LUMA
    taps = filt.shape[1]
    off = 1 if taps == 4 else 0          # tap index of the base sample
    h, w = base.shape
    bx, px = ref_positions(out_w, w, chroma)
    by, py = ref_positions(out_h, h, chroma)
    # vertical first: (h_out, w) intermediate, unrounded
    tmp = np.zeros((out_h, w), dtype=np.int64)
    for yo in range(out_h):
        acc = np.zeros(w, dtype=np.int64)
        for k in range(taps):
            yy = int(np.clip(by[yo] + k - off, 0, h - 1))
            acc += int(filt[py[yo], k]) * base[yy, :].astype(np.int64)
        tmp[yo] = acc
    out = np.zeros((out_h, out_w), dtype=np.int32)
    for xo in range(out_w):
        acc = np.zeros(out_h, dtype=np.int64)
        for k in range(taps):
            xx = int(np.clip(bx[xo] + k - off, 0, w - 1))
            acc += int(filt[px[xo], k]) * tmp[:, xx]
        out[:, xo] = np.clip((acc + 512) >> 10, 0, 255)
    return out


_J_LUMA = jnp.asarray(PHASE_LUMA)
_J_CHROMA = jnp.asarray(PHASE_CHROMA)


def upsample_plane(base: jnp.ndarray, out_h: int, out_w: int,
                   chroma: bool = False) -> jnp.ndarray:
    """Batched jnp upsampling (same semantics as the oracle)."""
    filt = _J_CHROMA if chroma else _J_LUMA
    taps = int(filt.shape[1])
    off = 1 if taps == 4 else 0
    h, w = base.shape
    bx, px = ref_positions(out_w, w, chroma)
    by, py = ref_positions(out_h, h, chroma)
    bxj = jnp.asarray(bx)
    byj = jnp.asarray(by)
    pxj = jnp.asarray(px)
    pyj = jnp.asarray(py)
    # int32 accumulators are exact here: 8-bit samples through two
    # 16-phase passes bound the accumulator by 255 * 32 * 32 < 2^19
    basei = base.astype(jnp.int32)

    # vertical: rows gathered per tap
    tmp = jnp.zeros((out_h, w), jnp.int32)
    for k in range(taps):
        rows = jnp.clip(byj + k - off, 0, h - 1)
        tmp = tmp + filt[pyj, k][:, None].astype(jnp.int32) * basei[rows, :]
    out = jnp.zeros((out_h, out_w), jnp.int32)
    for k in range(taps):
        cols = jnp.clip(bxj + k - off, 0, w - 1)
        out = out + filt[pxj, k][None, :].astype(jnp.int32) * tmp[:, cols]
    return jnp.clip((out + 512) >> 10, 0, 255).astype(jnp.int32)


def upsample_residual_plane_np(res: np.ndarray, out_h: int, out_w: int,
                               chroma: bool = False) -> np.ndarray:
    """G.8.6.3 residual resampling: block-edge-constrained bilinear
    interpolation of the reference layer's residual array (spec
    G-334..G-342; reference ``_hl_codec_264_decode_svc_residual_interpol``
    at ``hl_codec_264_decode_svc.c:3400-3460``).  Bilinear within one
    4x4 transform block, nearest-sample across block edges.  The
    transform-block map is the uniform 4x4 grid (this codec codes every
    residual with the 4x4 transform; intra reference MBs contribute
    zero residual via the rS re-initialisation in d_pool).
    """
    h, w = res.shape
    bx, px = ref_positions(out_w, w, chroma)
    by, py = ref_positions(out_h, h, chroma)
    x0 = np.clip(bx, 0, w - 1)
    x1 = np.clip(bx + 1, 0, w - 1)
    y0 = np.clip(by, 0, h - 1)
    y1 = np.clip(by + 1, 0, h - 1)
    same_x = ((x0 >> 2) == (x1 >> 2))[None, :]
    same_y = ((y0 >> 2) == (y1 >> 2))[:, None]
    r = res.astype(np.int64)

    def hpass(rows):
        s0 = r[rows][:, x0]
        s1 = r[rows][:, x1]
        lin = (16 - px)[None, :] * s0 + px[None, :] * s1     # G-339
        near = np.where(px[None, :] < 8, s0, s1) << 4        # G-340
        return np.where(same_x, lin, near)

    t0 = hpass(y0)
    t1 = hpass(y1)
    lin = ((16 - py)[:, None] * t0 + py[:, None] * t1 + 128) >> 8  # G-341
    near = (np.where(py[:, None] < 8, t0, t1) + 8) >> 4            # G-342
    return np.where(same_y, lin, near).astype(np.int32)


def downsample_dyadic_np(plane: np.ndarray) -> np.ndarray:
    """Simple 2x downsampler for the encoder's layer source generation
    (JSVM uses an 11-tap; a [1,2,1]x[1,2,1]/16 kernel is adequate for
    source preparation — this is an encoder-side choice, not normative)."""
    p = np.pad(plane.astype(np.int32), 1, mode="edge")
    core = (p[:-2, :] + 2 * p[1:-1, :] + p[2:, :])
    core = (core[:, :-2] + 2 * core[:, 1:-1] + core[:, 2:])
    full = (core + 8) >> 4
    return full[::2, ::2].astype(plane.dtype)
