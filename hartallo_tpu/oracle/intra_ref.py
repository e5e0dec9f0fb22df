"""Scalar NumPy oracle for intra prediction (spec 8.3).

Reference parity: ``hl_codec_264_pred_intra.c:19-37`` (mode list) — 9 Intra4x4
modes (8.3.1.2.1-9), 4 Intra16x16 modes (8.3.3.1-4), 4 chroma modes
(8.3.4.1-4, ChromaArrayType 1).  Neighbor conventions:

- 4x4:   ``top[8]`` = p[x,-1] x=0..7 (cols incl. top-right, already
         substituted with p[3,-1] when top-right is unavailable),
         ``left[4]`` = p[-1,y], ``tl`` = p[-1,-1].
- 16x16: ``top[16]``, ``left[16]``, ``tl``.
- chroma:``top[8]``, ``left[8]``, ``tl`` for one 8x8 plane.

All samples are ints in [0,255]; unavailable neighbors may hold anything —
modes that depend on them must not be selected by a compliant stream (DC
handles partial availability explicitly via the avail flags).
"""
from __future__ import annotations

import numpy as np


def _clip255(x):
    return np.clip(x, 0, 255)


# ---------------------------------------------------------------------------
# Intra 4x4 (spec 8.3.1.2)
# ---------------------------------------------------------------------------

def pred4x4(mode: int, top: np.ndarray, left: np.ndarray, tl: int,
            avail_top: bool, avail_left: bool) -> np.ndarray:
    _t = top.astype(np.int32)
    _l = left.astype(np.int32)
    tl = int(tl)

    def t(i):
        # index -1 walks off the top row onto the corner sample p[-1,-1]
        return tl if i < 0 else int(_t[i])

    def l(i):
        return tl if i < 0 else int(_l[i])
    p = np.zeros((4, 4), dtype=np.int32)
    if mode == 0:      # Vertical
        p[:] = _t[:4][None, :]
    elif mode == 1:    # Horizontal
        p[:] = _l[:, None]
    elif mode == 2:    # DC
        if avail_top and avail_left:
            p[:] = (_t[:4].sum() + _l.sum() + 4) >> 3
        elif avail_left:
            p[:] = (_l.sum() + 2) >> 2
        elif avail_top:
            p[:] = (_t[:4].sum() + 2) >> 2
        else:
            p[:] = 128
    elif mode == 3:    # Diagonal down-left
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    p[y, x] = (t(6) + 3 * t(7) + 2) >> 2
                else:
                    p[y, x] = (t(x + y) + 2 * t(x + y + 1) +
                               t(x + y + 2) + 2) >> 2
    elif mode == 4:    # Diagonal down-right
        for y in range(4):
            for x in range(4):
                if x > y:
                    p[y, x] = (t(x - y - 2) + 2 * t(x - y - 1) +
                               t(x - y) + 2) >> 2
                elif x < y:
                    p[y, x] = (l(y - x - 2) + 2 * l(y - x - 1) +
                               l(y - x) + 2) >> 2
                else:
                    p[y, x] = (t(0) + 2 * tl + l(0) + 2) >> 2
    elif mode == 5:    # Vertical right
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    p[y, x] = (t(x - (y >> 1) - 1) + t(x - (y >> 1)) + 1) >> 1
                elif z >= 0:
                    p[y, x] = (t(x - (y >> 1) - 2) +
                               2 * t(x - (y >> 1) - 1) +
                               t(x - (y >> 1)) + 2) >> 2
                elif z == -1:
                    p[y, x] = (l(0) + 2 * tl + t(0) + 2) >> 2
                else:
                    p[y, x] = (l(y - 1) + 2 * l(y - 2) + l(y - 3) + 2) >> 2
    elif mode == 6:    # Horizontal down
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    p[y, x] = (l(y - (x >> 1) - 1) + l(y - (x >> 1)) + 1) >> 1
                elif z >= 0:
                    p[y, x] = (l(y - (x >> 1) - 2) +
                               2 * l(y - (x >> 1) - 1) +
                               l(y - (x >> 1)) + 2) >> 2
                elif z == -1:
                    p[y, x] = (t(0) + 2 * tl + l(0) + 2) >> 2
                else:
                    p[y, x] = (t(x - 1) + 2 * t(x - 2) + t(x - 3) + 2) >> 2
    elif mode == 7:    # Vertical left
        for y in range(4):
            for x in range(4):
                if y % 2 == 0:
                    p[y, x] = (t(x + (y >> 1)) + t(x + (y >> 1) + 1) + 1) >> 1
                else:
                    p[y, x] = (t(x + (y >> 1)) + 2 * t(x + (y >> 1) + 1) +
                               t(x + (y >> 1) + 2) + 2) >> 2
    elif mode == 8:    # Horizontal up
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z < 5 and z % 2 == 0:
                    p[y, x] = (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
                elif z < 5:
                    p[y, x] = (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) +
                               l(y + (x >> 1) + 2) + 2) >> 2
                elif z == 5:
                    p[y, x] = (l(2) + 3 * l(3) + 2) >> 2
                else:
                    p[y, x] = l(3)
    else:
        raise ValueError(f"bad 4x4 mode {mode}")
    return p


# ---------------------------------------------------------------------------
# Intra 16x16 (spec 8.3.3)
# ---------------------------------------------------------------------------

def pred16x16(mode: int, top: np.ndarray, left: np.ndarray, tl: int,
              avail_top: bool, avail_left: bool) -> np.ndarray:
    t = top.astype(np.int32)
    l = left.astype(np.int32)
    tl = int(tl)
    p = np.zeros((16, 16), dtype=np.int32)
    if mode == 0:      # Vertical
        p[:] = t[None, :]
    elif mode == 1:    # Horizontal
        p[:] = l[:, None]
    elif mode == 2:    # DC
        if avail_top and avail_left:
            p[:] = (t.sum() + l.sum() + 16) >> 5
        elif avail_left:
            p[:] = (l.sum() + 8) >> 4
        elif avail_top:
            p[:] = (t.sum() + 8) >> 4
        else:
            p[:] = 128
    elif mode == 3:    # Plane
        xs = np.arange(8)
        H = ((xs + 1) * (t[8 + xs] - np.concatenate(([tl], t))[7 - xs])).sum()
        V = ((xs + 1) * (l[8 + xs] - np.concatenate(([tl], l))[7 - xs])).sum()
        a = 16 * (l[15] + t[15])
        b = (5 * H + 32) >> 6
        c = (5 * V + 32) >> 6
        for y in range(16):
            for x in range(16):
                p[y, x] = np.clip((a + b * (x - 7) + c * (y - 7) + 16) >> 5,
                                  0, 255)
    else:
        raise ValueError(f"bad 16x16 mode {mode}")
    return p


# ---------------------------------------------------------------------------
# Intra chroma 8x8 (spec 8.3.4), ChromaArrayType 1
# ---------------------------------------------------------------------------

def pred_chroma(mode: int, top: np.ndarray, left: np.ndarray, tl: int,
                avail_top: bool, avail_left: bool) -> np.ndarray:
    t = top.astype(np.int32)
    l = left.astype(np.int32)
    tl = int(tl)
    p = np.zeros((8, 8), dtype=np.int32)
    if mode == 0:      # DC (per 4x4 sub-block)
        for sy in (0, 4):
            for sx in (0, 4):
                ts = t[sx:sx + 4].sum()
                ls = l[sy:sy + 4].sum()
                if (sx == 0 and sy == 0) or (sx == 4 and sy == 4):
                    if avail_top and avail_left:
                        v = (ts + ls + 4) >> 3
                    elif avail_left:
                        v = (ls + 2) >> 2
                    elif avail_top:
                        v = (ts + 2) >> 2
                    else:
                        v = 128
                elif sx == 4 and sy == 0:
                    if avail_top:
                        v = (ts + 2) >> 2
                    elif avail_left:
                        v = (ls + 2) >> 2
                    else:
                        v = 128
                else:  # sx == 0, sy == 4
                    if avail_left:
                        v = (ls + 2) >> 2
                    elif avail_top:
                        v = (ts + 2) >> 2
                    else:
                        v = 128
                p[sy:sy + 4, sx:sx + 4] = v
    elif mode == 1:    # Horizontal
        p[:] = l[:, None]
    elif mode == 2:    # Vertical
        p[:] = t[None, :]
    elif mode == 3:    # Plane
        xs = np.arange(4)
        # p[2-x,-1] = ext[3-x] with ext[i] = p[i-1,-1] (x'=3 -> p[-1,-1])
        H = ((xs + 1) * (t[4 + xs] - np.concatenate(([tl], t))[3 - xs])).sum()
        V = ((xs + 1) * (l[4 + xs] - np.concatenate(([tl], l))[3 - xs])).sum()
        a = 16 * (l[7] + t[7])
        b = (17 * H + 16) >> 5
        c = (17 * V + 16) >> 5
        for y in range(8):
            for x in range(8):
                p[y, x] = np.clip((a + b * (x - 3) + c * (y - 3) + 16) >> 5,
                                  0, 255)
    else:
        raise ValueError(f"bad chroma mode {mode}")
    return p
