"""GOP-batched decode: K frames per device dispatch.

The round-2 decoder dispatched one fused program per frame; the ~20-30 ms
tunnel round trip per dispatch capped CIF decode near 36 fps regardless
of kernel speed.  This module batches K frames into ONE jitted program:

- everything frame-independent (residual dequant+IDCT in wide layouts,
  boundary strengths) is computed batched over all K frames up front
  (``ops/wide.py``);
- a ``lax.scan`` then walks the frames in decode order carrying the DPB
  as a device-resident ring of reference planes.  Each reference slot
  stores the four half-pel grids [G, b, h, j], computed once when a
  frame enters the ring, so quarter-pel MC is two 4x4 gathers + an
  average instead of the old 16-case bank over 9x9 windows;
- the intra wavefront only runs on frames that contain intra MBs
  (``lax.cond`` on a per-frame flag) — P frames skip it entirely;
- per-frame ``ref_idx`` values are pre-mapped by the host to ring slots,
  so reference selection inside the scan is a plain gather.

Reference counterpart: the per-picture decode driver
``hl_codec_264_decode_avc.c:55-263``; the ring replaces the DPB's frame
stores + per-resolution interpolation index objects
(``hl_codec_264_dpb.c:51-139``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hartallo_tpu.core.tables import QP_SCALE_CHROMA
from hartallo_tpu.decode.d_fused import DEC_FIELDS
from hartallo_tpu.decode.intra_recon import PAD, intra_reconstruct
from hartallo_tpu.ops.deblock import deblock_frame_s1


def _pick_deblock():
    """HARTALLO_PALLAS=1 opts the GOP scan into the Pallas wavefront
    kernel (ops/deblock_pallas.py) on TPU backends.  The kernel is
    bit-exact and ~2x faster than the XLA scan in isolation
    (tests/test_deblock_pallas.py), but as a custom-call inside the
    scanned GOP program it currently breaks XLA's loop fusion and loses
    end-to-end — the default stays the XLA scan until the whole
    per-frame pipeline moves into the kernel."""
    import os
    if not os.environ.get("HARTALLO_PALLAS"):
        return deblock_frame_s1
    try:
        platform = jax.devices()[0].platform
    except Exception:                                    # noqa: BLE001
        platform = "cpu"
    if platform in ("tpu", "axon"):
        from hartallo_tpu.ops.deblock_pallas import deblock_frame_pl
        return deblock_frame_pl
    return deblock_frame_s1


deblock_frame = None


def _deblock(*args, **kw):
    global deblock_frame
    if deblock_frame is None:
        deblock_frame = _pick_deblock()
    return deblock_frame(*args, **kw)
from hartallo_tpu.ops.wide import (compute_bs_grids, halfpel_planes,
                                   mc_chroma_plane, mc_grids,
                                   mc_luma_plane, residual_planes_wide)

_J_QPC = jnp.asarray(QP_SCALE_CHROMA)

_OFF = {}
_o = 0
for _name, _shape in DEC_FIELDS:
    _w = int(np.prod(_shape, dtype=int)) if _shape else 1
    _OFF[_name] = (_o, _o + _w, _shape)
    _o += _w
WORDS = _o


def _field(packed, name, gw, gh):
    """packed (K, Nmb, WORDS) -> (K, gh, gw) + field shape."""
    o0, o1, shape = _OFF[name]
    K = packed.shape[0]
    return packed[:, :, o0:o1].reshape((K, gh, gw) + shape)


def ring_shapes(gw: int, gh: int, S: int):
    """DPB ring shapes, over-allocated (+32 rows, width rounded to 128
    plus 128) so the Pallas fast path can DMA whole slots and keep its
    aligned (rows, 256) MC window loads in bounds; the XLA path indexes
    with explicit strides and ignores the tail."""
    Hp, Wp = gh * 16 + 2 * PAD, gw * 16 + 2 * PAD
    Hc, Wc = gh * 8 + 2 * PAD, gw * 8 + 2 * PAD
    rnd = lambda n: ((n + 127) // 128) * 128 + 128        # noqa: E731
    return ((S, 4, Hp + 32, rnd(Wp)), (S, Hc + 32, rnd(Wc)),
            (S, Hc + 32, rnd(Wc)))


@partial(jax.jit, static_argnames=("gw", "gh", "chroma_qp_off"))
def decode_gop(packed, write_slot, has_intra, ringY, ringU, ringV,
               *, gw: int, gh: int, chroma_qp_off: int):
    """packed (K, gh*gw, WORDS) int16; write_slot (K,) int32 (ring slot
    for the recon; the last slot is the non-reference trash slot);
    has_intra (K,) bool; ringY (S, 4, Hp, Wp) half-pel stacks;
    ringU/ringV (S, Hc, Wc).

    Returns (out_u8 (K, H*3//2, W) uint8, ringY, ringU, ringV)."""
    K = packed.shape[0]
    H, W = gh * 16, gw * 16
    M = K * gh * gw
    N = gh * gw * 16
    packed = packed.astype(jnp.int32)     # int16 on the wire (A.2.1)

    # ---- frame-independent precompute (batched over K) ----------------
    qp = _field(packed, "qp", gw, gh)                        # (K,gh,gw)
    kind = _field(packed, "kind", gw, gh)
    res_y, res_c = residual_planes_wide(
        packed[:, :, slice(*_OFF["luma_ac"][:2])].reshape(M, 16, 16),
        packed[:, :, slice(*_OFF["luma_dc"][:2])].reshape(M, 16),
        packed[:, :, slice(*_OFF["chroma_ac"][:2])].reshape(M, 2, 4, 16),
        packed[:, :, slice(*_OFF["chroma_dc"][:2])].reshape(M, 2, 4),
        qp.reshape(M), (kind == 1).reshape(M), chroma_qp_off,
        _J_QPC, gw, gh)

    mb_is_intra = (kind <= 2) | (kind == 8)
    nnz = _field(packed, "nnz", gw, gh) \
        .transpose(0, 1, 3, 2, 4).reshape(K, 4 * gh, 4 * gw)
    mv = _field(packed, "mv", gw, gh)                  # (K,gh,gw,4,4,2)
    mvg = mv.transpose(0, 1, 3, 2, 4, 5).reshape(K, 4 * gh, 4 * gw, 2)
    ref_slot = _field(packed, "ref_idx", gw, gh)       # (K,gh,gw,4)
    ref44 = jnp.repeat(jnp.repeat(
        ref_slot.reshape(K, gh, gw, 2, 2), 2, axis=3), 2, axis=4)
    refg = ref44.transpose(0, 1, 3, 2, 4).reshape(K, 4 * gh, 4 * gw)
    bs_vg, bs_hg = compute_bs_grids(
        mb_is_intra, nnz, mvg, refg,
        _field(packed, "fmb_v", gw, gh) != 0,
        _field(packed, "fmb_h", gw, gh) != 0,
        _field(packed, "fint", gw, gh) != 0)
    # grid -> (K, gh, gw, edge, seg) form expected by deblock_frame
    bs_v = bs_vg.reshape(K, gh, 4, gw, 4).transpose(0, 1, 3, 4, 2)
    bs_h = bs_hg.reshape(K, gh, 4, gw, 4).transpose(0, 1, 3, 2, 4)
    qpc = _J_QPC[jnp.clip(qp + chroma_qp_off, 0, 51)]
    qp_l = jnp.concatenate([qp[:, :, :1], qp[:, :, :-1]], axis=2)
    qp_t = jnp.concatenate([qp[:, :1, :], qp[:, :-1, :]], axis=1)
    qpc_l = jnp.concatenate([qpc[:, :, :1], qpc[:, :, :-1]], axis=2)
    qpc_t = jnp.concatenate([qpc[:, :1, :], qpc[:, :-1, :]], axis=1)

    bx, by, cbx, cby = mc_grids(gw, gh)
    inter_mask = (kind >= 3) & (kind != 8)
    my_ = jnp.repeat(jnp.repeat(inter_mask, 16, -2), 16, -1)
    mc_ = jnp.repeat(jnp.repeat(inter_mask, 8, -2), 8, -1)

    # weighted prediction: per-8x8 [w, o, logWD] -> per 4x4 block (K, N)
    wp_l = _field(packed, "wp_l", gw, gh).reshape(K, gh, gw, 2, 2, 3)
    wp_l = jnp.repeat(jnp.repeat(wp_l, 2, axis=3), 2, axis=4) \
        .reshape(K, N, 3)
    wp_c = _field(packed, "wp_c", gw, gh).reshape(K, gh, gw, 2, 2, 2, 3)
    wp_c = jnp.repeat(jnp.repeat(wp_c, 2, axis=3), 2, axis=4) \
        .reshape(K, N, 2, 3)

    xs = (res_y, res_c, write_slot, has_intra,
          mv.reshape(K, N, 2), ref44.reshape(K, N), wp_l, wp_c,
          kind, qp, qp_l, qp_t, qpc, qpc_l, qpc_t, bs_v, bs_h,
          _field(packed, "alpha_off", gw, gh),
          _field(packed, "beta_off", gw, gh),
          my_, mc_,
          _field(packed, "i16_mode", gw, gh),
          _field(packed, "i4_modes", gw, gh),
          _field(packed, "chroma_mode", gw, gh),
          _field(packed, "avail_l", gw, gh) != 0,
          _field(packed, "avail_t", gw, gh) != 0,
          _field(packed, "avail_tr", gw, gh) != 0)

    def step(carry, x):
        rY, rU, rV = carry
        (ry, rc, wslot, hintra, mvf, slot, wpl, wpc, knd, qpf, qplf,
         qptf, qpcf, qpclf, qpctf, bsv, bsh, offa, offb, mY, mC,
         i16m, i4m, cmode, al, at, atr) = x

        pY = mc_luma_plane(rY, slot, bx, by, mvf[:, 0], mvf[:, 1],
                           wpl, gw, gh)
        pU = mc_chroma_plane(rU, slot, cbx, cby, mvf[:, 0], mvf[:, 1],
                             wpc[:, 0], gw, gh)
        pV = mc_chroma_plane(rV, slot, cbx, cby, mvf[:, 0], mvf[:, 1],
                             wpc[:, 1], gw, gh)
        y0 = jnp.pad(jnp.where(mY, jnp.clip(pY + ry, 0, 255), 0), PAD)
        u0 = jnp.pad(jnp.where(mC, jnp.clip(pU + rc[0], 0, 255), 0), PAD)
        v0 = jnp.pad(jnp.where(mC, jnp.clip(pV + rc[1], 0, 255), 0), PAD)

        def intra_branch(ops):
            y, u, v = ops
            kint = jnp.where(knd == 0, 0, jnp.where(knd == 1, 1, 2))
            ry_mb = ry.reshape(gh, 16, gw, 16).transpose(0, 2, 1, 3)
            rc_mb = rc.reshape(2, gh, 8, gw, 8).transpose(1, 3, 0, 2, 4)
            return intra_reconstruct(
                (y, u, v), ry_mb, rc_mb, kint, i16m, i4m, cmode, al, at,
                atr, gw=gw, gh=gh)

        planes = jax.lax.cond(hintra, intra_branch, lambda o: o,
                              (y0, u0, v0))
        y2p, u2p, v2p = _deblock(
            planes, bsv, bsh, qpf, qplf, qptf, qpcf, qpclf, qpctf,
            offa, offb, gw=gw, gh=gh)

        y2 = jax.lax.dynamic_slice(y2p, (PAD, PAD), (H, W))
        u2 = jax.lax.dynamic_slice(u2p, (PAD, PAD), (H // 2, W // 2))
        v2 = jax.lax.dynamic_slice(v2p, (PAD, PAD), (H // 2, W // 2))
        uv = jnp.stack([u2, v2], axis=1).reshape(H // 2, W)
        out = jnp.concatenate([y2, uv], axis=0).astype(jnp.uint8)

        hp = halfpel_planes(jnp.pad(y2, PAD, mode="edge"))
        hp = jnp.pad(hp, ((0, 0), (0, rY.shape[2] - hp.shape[1]),
                          (0, rY.shape[3] - hp.shape[2])))
        up = jnp.pad(u2, PAD, mode="edge")
        up = jnp.pad(up, ((0, rU.shape[1] - up.shape[0]),
                          (0, rU.shape[2] - up.shape[1])))
        vp = jnp.pad(v2, PAD, mode="edge")
        vp = jnp.pad(vp, ((0, rV.shape[1] - vp.shape[0]),
                          (0, rV.shape[2] - vp.shape[1])))
        rY = jax.lax.dynamic_update_slice(
            rY, hp[None].astype(rY.dtype), (wslot, 0, 0, 0))
        rU = jax.lax.dynamic_update_slice(
            rU, up[None].astype(rU.dtype), (wslot, 0, 0))
        rV = jax.lax.dynamic_update_slice(
            rV, vp[None].astype(rV.dtype), (wslot, 0, 0))
        return (rY, rU, rV), out

    (ringY, ringU, ringV), outs = jax.lax.scan(
        step, (ringY, ringU, ringV), xs)
    return outs, ringY, ringU, ringV


def split_gop_out(a: np.ndarray, gw: int, gh: int) -> np.ndarray:
    """Host: one (H*3//2, W) uint8 row of the batch -> packed I420."""
    H, W = gh * 16, gw * 16
    y = a[:H]
    uv = a[H:].reshape(H // 2, 2, W // 2)
    return np.concatenate([y.ravel(), uv[:, 0].ravel(), uv[:, 1].ravel()])
