"""Scalar NumPy oracle for sub-pel interpolation (spec 8.4.2.2).

Reference parity: ``hl_codec_264_pred_inter.c:339-887`` (16-case luma
quarter-pel dispatcher) + ``hl_codec_264_interpol.c`` kernels and
``interpol_chroma_cpp`` (``:888-1042``).  Out-of-frame samples are
edge-clamped (the reference bakes the clamp into its index maps,
``hl_codec_264_interpol.c:74-160``).
"""
from __future__ import annotations

import numpy as np

_TAP = np.array([1, -5, 20, 20, -5, 1], dtype=np.int64)


def _L(ref: np.ndarray, x: int, y: int) -> int:
    H, W = ref.shape
    return int(ref[min(max(y, 0), H - 1), min(max(x, 0), W - 1)])


def _clip255(v):
    return min(max(v, 0), 255)


def _half_h(ref, x, y):
    """b: half-pel between (x,y) and (x+1,y), clipped."""
    s = sum(int(_TAP[k]) * _L(ref, x - 2 + k, y) for k in range(6))
    return _clip255((s + 16) >> 5)


def _half_v(ref, x, y):
    s = sum(int(_TAP[k]) * _L(ref, x, y - 2 + k) for k in range(6))
    return _clip255((s + 16) >> 5)


def _half_hv(ref, x, y):
    """j: centre position, via unrounded vertical intermediates."""
    m = [sum(int(_TAP[k]) * _L(ref, x - 2 + i, y - 2 + k) for k in range(6))
         for i in range(6)]
    s = sum(int(_TAP[i]) * m[i] for i in range(6))
    return _clip255((s + 512) >> 10)


def luma_pred_4x4(ref: np.ndarray, x0: int, y0: int,
                  mvx: int, mvy: int) -> np.ndarray:
    """Predict a 4x4 luma block at (x0,y0) with quarter-pel MV."""
    xi, yi = x0 + (mvx >> 2), y0 + (mvy >> 2)
    fx, fy = mvx & 3, mvy & 3
    out = np.zeros((4, 4), np.int32)
    for i in range(4):
        for j in range(4):
            x, y = xi + j, yi + i
            G = _L(ref, x, y)
            if (fx, fy) == (0, 0):
                v = G
            elif fy == 0:
                b = _half_h(ref, x, y)
                if fx == 1:
                    v = (G + b + 1) >> 1
                elif fx == 2:
                    v = b
                else:
                    v = (b + _L(ref, x + 1, y) + 1) >> 1
            elif fx == 0:
                h = _half_v(ref, x, y)
                if fy == 1:
                    v = (G + h + 1) >> 1
                elif fy == 2:
                    v = h
                else:
                    v = (h + _L(ref, x, y + 1) + 1) >> 1
            elif (fx, fy) == (2, 2):
                v = _half_hv(ref, x, y)
            elif fx == 2:     # (2,1) f / (2,3) q
                j_ = _half_hv(ref, x, y)
                s = _half_h(ref, x, y) if fy == 1 else _half_h(ref, x, y + 1)
                v = (j_ + s + 1) >> 1
            elif fy == 2:     # (1,2) i / (3,2) k
                j_ = _half_hv(ref, x, y)
                m = _half_v(ref, x, y) if fx == 1 else _half_v(ref, x + 1, y)
                v = (j_ + m + 1) >> 1
            else:             # diagonal quarters e/g/p/r
                b = _half_h(ref, x, y) if fy == 1 else _half_h(ref, x, y + 1)
                h = _half_v(ref, x, y) if fx == 1 else _half_v(ref, x + 1, y)
                v = (b + h + 1) >> 1
            out[i, j] = v
    return out


def chroma_pred(ref: np.ndarray, x0: int, y0: int, mvx: int, mvy: int,
                w: int = 2, h: int = 2) -> np.ndarray:
    """Predict a chroma block (default 2x2) with eighth-pel MV (the luma
    quarter-pel MV applied to the half-resolution plane)."""
    xi, yi = x0 + (mvx >> 3), y0 + (mvy >> 3)
    dx, dy = mvx & 7, mvy & 7
    out = np.zeros((h, w), np.int32)
    for i in range(h):
        for j in range(w):
            x, y = xi + j, yi + i
            A = _L(ref, x, y)
            B = _L(ref, x + 1, y)
            C = _L(ref, x, y + 1)
            D = _L(ref, x + 1, y + 1)
            out[i, j] = ((8 - dx) * (8 - dy) * A + dx * (8 - dy) * B +
                         (8 - dx) * dy * C + dx * dy * D + 32) >> 6
    return out
