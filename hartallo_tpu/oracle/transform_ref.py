"""Scalar NumPy oracle for the transform/quant kernels (spec 8.5).

Semantics match the reference portable kernels exactly:
- inverse 4x4 core transform  : hl_codec_264_transf.c:420 (8.5.12.2)
- 4x4 residual dequant        : hl_codec_264_quant.c:68  (8.5.12.1)
- Intra16x16 luma DC descale  : hl_codec_264_transf.c:590 (8.5.10)
- chroma DC descale (4:2:0)   : hl_codec_264_transf.c:647 (8.5.11)
- forward 4x4 integer DCT     : hl_codec_264_transf.c:716
- forward quant (AC)          : hl_codec_264_quant.c:116
- forward/inverse 4x4 Hadamard: hl_codec_264_transf.c:774
- 2x2 chroma Hadamard         : hl_codec_264_transf.c:843

These are the differential-test ground truth for the batched jnp kernels in
``hartallo_tpu.ops.transform`` (the reference uses its portable C the same
way for its SSE kernels, test_codec_264_transf.c).
"""
from __future__ import annotations

import numpy as np

from hartallo_tpu.core.tables import QUANT_F, QUANT_MF, QUANT_QBITS, QUANT_V


def dequant_4x4(c: np.ndarray, qp: int, dc_bypass: bool = False) -> np.ndarray:
    """8.5.12.1 with flat scaling lists (LevelScale = 16 * V)."""
    c = c.astype(np.int64)
    ls = 16 * QUANT_V[qp % 6].astype(np.int64)
    if qp >= 24:
        d = (c * ls) << (qp // 6 - 4)
    else:
        d = (c * ls + (1 << (3 - qp // 6))) >> (4 - qp // 6)
    d = d.astype(np.int64)
    if dc_bypass:
        d[0, 0] = c[0, 0]
    return d.astype(np.int32)


def inverse_transform_4x4(d: np.ndarray) -> np.ndarray:
    """8.5.12.2 inverse core transform incl. the final (x+32)>>6."""
    d = d.astype(np.int64)
    e = np.empty_like(d)
    e[:, 0] = d[:, 0] + d[:, 2]
    e[:, 1] = d[:, 0] - d[:, 2]
    e[:, 2] = (d[:, 1] >> 1) - d[:, 3]
    e[:, 3] = d[:, 1] + (d[:, 3] >> 1)
    f = np.empty_like(d)
    f[:, 0] = e[:, 0] + e[:, 3]
    f[:, 1] = e[:, 1] + e[:, 2]
    f[:, 2] = e[:, 1] - e[:, 2]
    f[:, 3] = e[:, 0] - e[:, 3]
    g = np.empty_like(d)
    g[0, :] = f[0, :] + f[2, :]
    g[1, :] = f[0, :] - f[2, :]
    g[2, :] = (f[1, :] >> 1) - f[3, :]
    g[3, :] = f[1, :] + (f[3, :] >> 1)
    h = np.empty_like(d)
    h[0, :] = g[0, :] + g[3, :]
    h[1, :] = g[1, :] + g[2, :]
    h[2, :] = g[1, :] - g[2, :]
    h[3, :] = g[0, :] - g[3, :]
    return ((h + 32) >> 6).astype(np.int32)


def hadamard_4x4(x: np.ndarray) -> np.ndarray:
    """f = M x M with M = [[1,1,1,1],[1,1,-1,-1],[1,-1,-1,1],[1,-1,1,-1]]."""
    M = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                  [1, -1, -1, 1], [1, -1, 1, -1]], dtype=np.int64)
    return (M @ x.astype(np.int64) @ M).astype(np.int64)


def luma_dc_descale_intra16(c: np.ndarray, qp: int) -> np.ndarray:
    """8.5.10: inverse Hadamard + scaling of the 4x4 Intra16x16 luma DC."""
    f = hadamard_4x4(c)
    scale = 16 * int(QUANT_V[qp % 6, 0, 0])
    if qp >= 36:
        dc = (f * scale) << (qp // 6 - 6)
    else:
        dc = (f * scale + (1 << (5 - qp // 6))) >> (6 - qp // 6)
    return dc.astype(np.int32)


def chroma_dc_descale(c: np.ndarray, qp: int) -> np.ndarray:
    """8.5.11 for ChromaArrayType 1 (2x2 Hadamard + scale)."""
    c = c.astype(np.int64)
    t00 = c[0, 0] + c[1, 0]
    t01 = c[0, 1] + c[1, 1]
    t10 = c[0, 0] - c[1, 0]
    t11 = c[0, 1] - c[1, 1]
    f = np.array([[t00 + t01, t00 - t01], [t10 + t11, t10 - t11]],
                 dtype=np.int64)
    scale = 16 * int(QUANT_V[qp % 6, 0, 0])
    dc = ((f * scale) << (qp // 6)) >> 5
    return dc.astype(np.int32)


def forward_dct_4x4(x: np.ndarray) -> np.ndarray:
    """Forward 4x4 integer core transform W = C x C^T with
    C = [[1,1,1,1],[2,1,-1,-2],[1,-1,-1,1],[1,-2,2,-1]]."""
    C = np.array([[1, 1, 1, 1], [2, 1, -1, -2],
                  [1, -1, -1, 1], [1, -2, 2, -1]], dtype=np.int64)
    return (C @ x.astype(np.int64) @ C.T).astype(np.int64)


def forward_quant_4x4(w: np.ndarray, qp: int, intra: bool,
                      skip_dc: bool = False) -> np.ndarray:
    """Z = sign(W) * ((|W| * MF + f) >> qbits)."""
    w = w.astype(np.int64)
    mf = QUANT_MF[qp % 6].astype(np.int64)
    qbits = int(QUANT_QBITS[qp])
    f = int(QUANT_F[0 if intra else 1, qp])
    z = ((np.abs(w) * mf + f) >> qbits) * np.sign(w)
    if skip_dc:
        z[0, 0] = 0
    return z.astype(np.int32)


def forward_hadamard_quant_dc_luma(c: np.ndarray, qp: int) -> np.ndarray:
    """Intra16x16 DC: W = (M c M) / 2 then quant with doubled deadzone
    (JM semantics; reference hl_codec_264_transf.c:774 +
    hl_codec_264_quant.c:141)."""
    f4 = hadamard_4x4(c) >> 1
    mf = int(QUANT_MF[qp % 6, 0, 0])
    qbits = int(QUANT_QBITS[qp])
    off = 2 * int(QUANT_F[0, qp])
    z = ((np.abs(f4) * mf + off) >> (qbits + 1)) * np.sign(f4)
    return z.astype(np.int32)


def forward_hadamard_quant_dc_chroma(c: np.ndarray, qp: int,
                                     intra: bool) -> np.ndarray:
    """Chroma 2x2 DC: W = H2 c H2 then quant with doubled deadzone."""
    c = c.astype(np.int64)
    t00 = c[0, 0] + c[1, 0]
    t01 = c[0, 1] + c[1, 1]
    t10 = c[0, 0] - c[1, 0]
    t11 = c[0, 1] - c[1, 1]
    f = np.array([[t00 + t01, t00 - t01], [t10 + t11, t10 - t11]],
                 dtype=np.int64)
    mf = int(QUANT_MF[qp % 6, 0, 0])
    qbits = int(QUANT_QBITS[qp])
    off = 2 * int(QUANT_F[0 if intra else 1, qp])
    z = ((np.abs(f) * mf + off) >> (qbits + 1)) * np.sign(f)
    return z.astype(np.int32)
