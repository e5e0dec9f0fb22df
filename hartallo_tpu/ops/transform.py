"""Batched integer transform/quant kernels (jnp, TPU-ready).

Each function operates on arrays of 4x4 (or 2x2) blocks with arbitrary
leading batch dimensions and per-block QP vectors — the TPU-native
re-expression of the reference's per-block scalar kernels (SURVEY.md §2.3
"Transform"/"Quant" families).  Integer-exact in int32 (products stay below
2^31 for spec-legal inputs), validated against
``hartallo_tpu.oracle.transform_ref`` by tests/test_transform.py.

Shapes: blocks (..., 4, 4) / (..., 2, 2); qp (...,) matching the batch dims.
"""
from __future__ import annotations

import jax.numpy as jnp

from hartallo_tpu.core import tables as T

_QUANT_V = jnp.asarray(T.QUANT_V)           # (6,4,4)
_QUANT_MF = jnp.asarray(T.QUANT_MF)         # (6,4,4)
_QUANT_QBITS = jnp.asarray(T.QUANT_QBITS)   # (52,)
_F_INTRA = jnp.asarray(T.QUANT_F[0])        # (52,)
_F_INTER = jnp.asarray(T.QUANT_F[1])        # (52,)


def dequant_4x4(c: jnp.ndarray, qp: jnp.ndarray,
                dc_bypass: bool = False) -> jnp.ndarray:
    """8.5.12.1 flat-list dequant; c (...,4,4), qp (...,)."""
    c = c.astype(jnp.int32)
    qp = jnp.asarray(qp, jnp.int32)
    ls = 16 * _QUANT_V[qp % 6]                       # (...,4,4)
    qdiv = (qp // 6)[..., None, None]
    hi = (c * ls) << jnp.maximum(qdiv - 4, 0)
    lo = (c * ls + (1 << jnp.maximum(3 - qdiv, 0))) >> jnp.maximum(4 - qdiv, 0)
    d = jnp.where(qp[..., None, None] >= 24, hi, lo)
    if dc_bypass:
        d = d.at[..., 0, 0].set(c[..., 0, 0])
    return d


def inverse_transform_4x4(d: jnp.ndarray) -> jnp.ndarray:
    """8.5.12.2 inverse core transform, batched over (..., 4, 4)."""
    d = d.astype(jnp.int32)
    d0, d1, d2, d3 = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    e0 = d0 + d2
    e1 = d0 - d2
    e2 = (d1 >> 1) - d3
    e3 = d1 + (d3 >> 1)
    f = jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    f0, f1, f2, f3 = (f[..., 0, :], f[..., 1, :], f[..., 2, :], f[..., 3, :])
    g0 = f0 + f2
    g1 = f0 - f2
    g2 = (f1 >> 1) - f3
    g3 = f1 + (f3 >> 1)
    h = jnp.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=-2)
    return (h + 32) >> 6


def _hadamard_4x4(x: jnp.ndarray) -> jnp.ndarray:
    """M x M with M = [[1,1,1,1],[1,1,-1,-1],[1,-1,-1,1],[1,-1,1,-1]]
    as butterflies (integer exact)."""
    x0, x1, x2, x3 = x[..., 0, :], x[..., 1, :], x[..., 2, :], x[..., 3, :]
    a0, a1 = x0 + x1, x0 - x1
    b0, b1 = x2 + x3, x2 - x3
    t = jnp.stack([a0 + b0, a0 - b0, a1 - b1, a1 + b1], axis=-2)
    t0, t1, t2, t3 = t[..., 0], t[..., 1], t[..., 2], t[..., 3]
    c0, c1 = t0 + t1, t0 - t1
    d0, d1 = t2 + t3, t2 - t3
    return jnp.stack([c0 + d0, c0 - d0, c1 - d1, c1 + d1], axis=-1)


def _hadamard_2x2(c: jnp.ndarray) -> jnp.ndarray:
    """H2 c H2 for (..., 2, 2) blocks."""
    t00 = c[..., 0, 0] + c[..., 1, 0]
    t01 = c[..., 0, 1] + c[..., 1, 1]
    t10 = c[..., 0, 0] - c[..., 1, 0]
    t11 = c[..., 0, 1] - c[..., 1, 1]
    return jnp.stack([jnp.stack([t00 + t01, t00 - t01], axis=-1),
                      jnp.stack([t10 + t11, t10 - t11], axis=-1)], axis=-2)


def luma_dc_descale_intra16(c: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """8.5.10: c (..., 4, 4) DC coeffs, qp (...,)."""
    f = _hadamard_4x4(c.astype(jnp.int32))
    qp = jnp.asarray(qp, jnp.int32)
    scale = (16 * _QUANT_V[qp % 6, 0, 0])[..., None, None]
    qdiv = (qp // 6)[..., None, None]
    hi = (f * scale) << jnp.maximum(qdiv - 6, 0)
    lo = (f * scale + (1 << jnp.maximum(5 - qdiv, 0))) >> \
        jnp.maximum(6 - qdiv, 0)
    return jnp.where(qp[..., None, None] >= 36, hi, lo)


def chroma_dc_descale(c: jnp.ndarray, qp: jnp.ndarray) -> jnp.ndarray:
    """8.5.11 (4:2:0): c (..., 2, 2), qp (...,)."""
    f = _hadamard_2x2(c.astype(jnp.int32))
    qp = jnp.asarray(qp, jnp.int32)
    scale = (16 * _QUANT_V[qp % 6, 0, 0])[..., None, None]
    return ((f * scale) << (qp // 6)[..., None, None]) >> 5


def forward_dct_4x4(x: jnp.ndarray) -> jnp.ndarray:
    """Forward integer core transform W = C x C^T, batched (butterflies)."""
    x = x.astype(jnp.int32)
    x0, x1, x2, x3 = x[..., 0, :], x[..., 1, :], x[..., 2, :], x[..., 3, :]
    s0, s3 = x0 + x3, x0 - x3
    s1, s2 = x1 + x2, x1 - x2
    t = jnp.stack([s0 + s1, 2 * s3 + s2, s0 - s1, s3 - 2 * s2], axis=-2)
    t0, t1, t2, t3 = t[..., 0], t[..., 1], t[..., 2], t[..., 3]
    u0, u3 = t0 + t3, t0 - t3
    u1, u2 = t1 + t2, t1 - t2
    return jnp.stack([u0 + u1, 2 * u3 + u2, u0 - u1, u3 - 2 * u2], axis=-1)


def forward_quant_4x4(w: jnp.ndarray, qp: jnp.ndarray, intra,
                      skip_dc: bool = False) -> jnp.ndarray:
    """Z = sign(W) * ((|W| * MF + f) >> qbits); intra: bool/int (...,)."""
    w = w.astype(jnp.int32)
    qp = jnp.asarray(qp, jnp.int32)
    mf = _QUANT_MF[qp % 6]
    qbits = _QUANT_QBITS[qp][..., None, None]
    intra = jnp.broadcast_to(jnp.asarray(intra, jnp.bool_), qp.shape)
    f = jnp.where(intra, _F_INTRA[qp], _F_INTER[qp])[..., None, None]
    z = ((jnp.abs(w) * mf + f) >> qbits) * jnp.sign(w)
    if skip_dc:
        z = z.at[..., 0, 0].set(0)
    return z


def forward_hadamard_quant_dc_luma(c: jnp.ndarray,
                                   qp: jnp.ndarray) -> jnp.ndarray:
    """Intra16x16 luma DC: (McM)>>1 then quant with 2f deadzone, qbits+1."""
    f4 = _hadamard_4x4(c.astype(jnp.int32)) >> 1
    qp = jnp.asarray(qp, jnp.int32)
    mf = _QUANT_MF[qp % 6, 0, 0][..., None, None]
    qbits = _QUANT_QBITS[qp][..., None, None]
    off = (2 * _F_INTRA[qp])[..., None, None]
    return ((jnp.abs(f4) * mf + off) >> (qbits + 1)) * jnp.sign(f4)


def forward_hadamard_quant_dc_chroma(c: jnp.ndarray, qp: jnp.ndarray,
                                     intra) -> jnp.ndarray:
    """Chroma 2x2 DC Hadamard + quant (2f deadzone, qbits+1), batched."""
    f = _hadamard_2x2(c.astype(jnp.int32))
    qp = jnp.asarray(qp, jnp.int32)
    mf = _QUANT_MF[qp % 6, 0, 0][..., None, None]
    qbits = _QUANT_QBITS[qp][..., None, None]
    intra = jnp.broadcast_to(jnp.asarray(intra, jnp.bool_), qp.shape)
    off = (2 * jnp.where(intra, _F_INTRA[qp], _F_INTER[qp]))[..., None, None]
    return ((jnp.abs(f) * mf + off) >> (qbits + 1)) * jnp.sign(f)
