"""Whole-frame fused encode programs: ONE jitted XLA program per frame
type covering mode decision / ME, transform+quant, reconstruction and the
in-loop deblocking filter, with every host-bound per-MB array packed into
a single int32 buffer (one device->host transfer per frame).

Rationale (measured on the TPU tunnel): a blocking device round trip
costs ~20-30 ms regardless of size, an async dispatch ~2 ms, bandwidth
~300 MB/s.  Round-1 did 10+ transfers per frame; the CAVLC packer only
needs one compact buffer.  Reference counterpart: the per-slice encode
loop ``hl_codec_264_slice.c:1700-1930`` + deblock at completion
(``:1897-1903``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hartallo_tpu.core.tables import LUMA_4x4_BLK_XY, QP_SCALE_CHROMA
from hartallo_tpu.decode.intra_recon import PAD
from hartallo_tpu.encode.intra_encode import intra_encode_frame
from hartallo_tpu.encode.p_device import p_frame_device
from hartallo_tpu.ops.math import satd4x4
from hartallo_tpu.ops.deblock import compute_bs, \
    deblock_frame_s1 as deblock_frame

_J_QPC = jnp.asarray(QP_SCALE_CHROMA)

# packed-buffer layout: name -> (per-MB int32 count, trailing shape)
INTRA_FIELDS = [
    ("use_i16", ()), ("i16_mode", ()), ("i4_modes", (16,)),
    ("chroma_mode", ()), ("luma_dc", (4, 4)), ("luma_ac", (16, 4, 4)),
    ("chroma_dc", (2, 2, 2)), ("chroma_ac", (2, 4, 4, 4)),
]
P_FIELDS = [
    ("luma_ac", (16, 4, 4)), ("chroma_dc", (2, 2, 2)),
    ("chroma_ac", (2, 4, 4, 4)), ("mv44", (4, 4, 2)), ("choice", ()),
    # intra-in-P (hl_codec_264_slice.c:1797: the reference picks intra
    # vs inter per macroblock)
    ("is_intra", ()), ("use_i16", ()), ("i16_mode", ()),
    ("i4_modes", (16,)), ("chroma_mode", ()), ("luma_dc", (4, 4)),
]


def _pack(arrays, fields, gh, gw):
    """Stack per-MB arrays into one (gh*gw, n_words) int16 transfer
    buffer (lossless: spec A.2.1 bounds coefficients to +-2^15)."""
    parts = []
    for name, shape in fields:
        a = arrays[name].astype(jnp.int16).reshape(
            gh * gw, int(np.prod(shape, dtype=int)) if shape else 1)
        parts.append(a)
    return jnp.concatenate(parts, axis=1)


def unpack(buf, fields, gh, gw):
    """Inverse of _pack on the host (numpy)."""
    out = {}
    off = 0
    for name, shape in fields:
        n = int(np.prod(shape, dtype=int)) if shape else 1
        out[name] = buf[:, off:off + n].reshape((gh, gw) + shape)
        off += n
    return out


def deblock_recon_device(wq, mv44, ref44, mb_is_intra, qp, chroma_qp_off,
                         planes, gw: int, gh: int,
                         fmb_v=None, fmb_h=None):
    """In-loop deblock of the encoder recon, fully on device.

    wq (gh,gw,16,4,4) quantized luma AC (blkIdx order); mv44 (gh,gw,4,4,2)
    quarter-pel MVs; ref44 (gh,gw,4,4) int32 per-4x4 refIdx;
    mb_is_intra (gh,gw) bool; qp (gh,gw) int32.  planes PAD-padded int32.
    """
    counts = (wq != 0).sum(axis=(-1, -2))                    # (gh,gw,16)
    nnz = jnp.zeros((4 * gh, 4 * gw), jnp.int32)
    for blk in range(16):
        bx = int(LUMA_4x4_BLK_XY[blk, 0]) // 4
        by = int(LUMA_4x4_BLK_XY[blk, 1]) // 4
        nnz = nnz.at[by::4, bx::4].set(counts[:, :, blk])
    mvg = mv44.transpose(0, 2, 1, 3, 4).reshape(4 * gh, 4 * gw, 2)
    refg = ref44.transpose(0, 2, 1, 3).reshape(4 * gh, 4 * gw)
    fint = jnp.ones((gh, gw), bool)
    if fmb_v is None:
        fmb_v = jnp.zeros((gh, gw), bool).at[:, 1:].set(True)
    if fmb_h is None:
        fmb_h = jnp.zeros((gh, gw), bool).at[1:, :].set(True)
    bs_v, bs_h = compute_bs(mb_is_intra, nnz, mvg, refg, fmb_v, fmb_h,
                            fint)
    qp_left = jnp.concatenate([qp[:, :1], qp[:, :-1]], axis=1)
    qp_top = jnp.concatenate([qp[:1, :], qp[:-1, :]], axis=0)
    qpc = _J_QPC[jnp.clip(qp + chroma_qp_off, 0, 51)]
    qpc_left = jnp.concatenate([qpc[:, :1], qpc[:, :-1]], axis=1)
    qpc_top = jnp.concatenate([qpc[:1, :], qpc[:-1, :]], axis=0)
    zeros = jnp.zeros((gh, gw), jnp.int32)
    return deblock_frame(planes, bs_v, bs_h, qp, qp_left, qp_top,
                         qpc, qpc_left, qpc_top, zeros, zeros,
                         gw=gw, gh=gh)


def _split_src(src_u8, gw: int, gh: int):
    """(H*3//2, W) uint8 I420 -> PAD-padded int32 planes."""
    H, W = gh * 16, gw * 16
    y = src_u8[:H, :].astype(jnp.int32)
    uv = src_u8[H:, :].reshape(H // 2, 2, W // 2).astype(jnp.int32)
    u = uv[:, 0, :]
    v = uv[:, 1, :]
    return (jnp.pad(y, PAD, mode="edge"), jnp.pad(u, PAD, mode="edge"),
            jnp.pad(v, PAD, mode="edge"))


def pack_src(frame: np.ndarray, width: int, height: int,
             gw: int, gh: int) -> np.ndarray:
    """Host: raw I420 buffer -> the (H*3//2, W) uint8 layout _split_src
    expects (U rows and V rows interleaved per row pair), padded to the
    MB grid by edge replication."""
    H, W = gh * 16, gw * 16
    buf = np.frombuffer(bytes(frame), np.uint8) if not \
        isinstance(frame, np.ndarray) else frame.ravel()
    ysz = width * height
    y = buf[:ysz].reshape(height, width)
    u = buf[ysz:ysz + ysz // 4].reshape(height // 2, width // 2)
    v = buf[ysz + ysz // 4:ysz + ysz // 2].reshape(height // 2, width // 2)
    y = np.pad(y, ((0, H - height), (0, W - width)), mode="edge")
    u = np.pad(u, ((0, (H - height) // 2), (0, (W - width) // 2)),
               mode="edge")
    v = np.pad(v, ((0, (H - height) // 2), (0, (W - width) // 2)),
               mode="edge")
    uv = np.stack([u, v], axis=1).reshape(H // 2 * 2 // 2, W)
    return np.concatenate([y, uv.reshape(H // 2, W)], axis=0)


@partial(jax.jit, static_argnames=("gw", "gh", "chroma_qp_off", "deblock"))
def i_frame_fused(src_u8, qp, lam, avail_l, avail_t, avail_tr, avail_tl,
                  fmb_v, fmb_h,
                  *, gw: int, gh: int, chroma_qp_off: int, deblock: bool):
    """IDR frame: intra wavefront encode + in-loop deblock + packed output.

    Returns (packed (gh*gw, n) int32, mad_sum i64, recY, recU, recV)."""
    H, W = gh * 16, gw * 16
    srcY, srcU, srcV = _split_src(src_u8, gw, gh)
    recY, recU, recV, arrays = intra_encode_frame(
        srcY, srcU, srcV, qp, chroma_qp_off, avail_l, avail_t, lam,
        avail_tr, avail_tl, gw=gw, gh=gh)
    if deblock:
        mv44 = jnp.zeros((gh, gw, 4, 4, 2), jnp.int32)
        ref44 = jnp.zeros((gh, gw, 4, 4), jnp.int32)
        recY, recU, recV = deblock_recon_device(
            arrays["luma_ac"], mv44, ref44, jnp.ones((gh, gw), bool),
            qp, chroma_qp_off, (recY, recU, recV), gw, gh,
            fmb_v=fmb_v, fmb_h=fmb_h)
    packed = _pack(arrays, INTRA_FIELDS, gh, gw)
    mad = jnp.abs(
        jax.lax.dynamic_slice(srcY, (PAD, PAD), (H, W)) -
        jax.lax.dynamic_slice(recY, (PAD, PAD), (H, W))).sum(
        dtype=jnp.int32)
    return packed, mad, recY, recU, recV


def _p_frame_body(src_u8, refY, refU, refV, qp, lam, fmb_v, fmb_h,
                  avail_l=None, avail_t=None, avail_tr=None,
                  avail_tl=None,
                  *, gw: int, gh: int, rng: int, refine: bool,
                  chroma_qp_off: int, deblock: bool,
                  intra_in_p: bool = True):
    H, W = gh * 16, gw * 16
    srcY, srcU, srcV = _split_src(src_u8, gw, gh)
    (wq, dcq, acq, mv44, choice, recY, recU, recV,
     inter_cost) = p_frame_device(
        srcY, srcU, srcV, refY, refU, refV, qp, lam,
        gw=gw, gh=gh, rng=rng, refine=refine,
        chroma_qp_off=chroma_qp_off)

    # ---- intra-in-P: per-MB intra vs inter (hl_codec_264_slice.c:1797)
    if intra_in_p:
        src_mb = jax.lax.dynamic_slice(srcY, (PAD, PAD), (H, W)) \
            .reshape(gh, 16, gw, 16).transpose(0, 2, 1, 3)
        blk = src_mb.reshape(gh, gw, 4, 4, 4, 4).transpose(
            0, 1, 2, 4, 3, 5).reshape(gh, gw, 16, 4, 4)
        dc = blk.mean(axis=(-1, -2), keepdims=True).astype(jnp.int32)
        # conservative source-activity estimate: SATD against the block
        # DC (SATD vs the inter SAD cost biases against intra, which
        # picks intra only where inter clearly fails, e.g. uncovering)
        intra_est = satd4x4(blk, dc).sum(axis=-1).astype(jnp.float32) + \
            lam * 24.0
        imask = intra_est < inter_cost
        if avail_l is None:
            avail_l = jnp.zeros((gh, gw), bool).at[:, 1:].set(True)
            avail_t = jnp.zeros((gh, gw), bool).at[1:, :].set(True)
            avail_tr = jnp.zeros((gh, gw), bool).at[1:, :-1].set(True)
            avail_tl = jnp.zeros((gh, gw), bool).at[1:, 1:].set(True)

        def intra_branch(ops):
            rY, rU, rV = ops
            irY, irU, irV, ia = intra_encode_frame(
                srcY, srcU, srcV, qp, chroma_qp_off, avail_l, avail_t,
                lam, avail_tr, avail_tl, base_planes=(rY, rU, rV),
                mb_mask=imask, gw=gw, gh=gh)
            return (irY, irU, irV, ia["use_i16"], ia["i16_mode"],
                    ia["i4_modes"], ia["chroma_mode"], ia["luma_dc"],
                    ia["luma_ac"], ia["chroma_dc"], ia["chroma_ac"])

        def inter_only(ops):
            rY, rU, rV = ops
            z = jnp.zeros((gh, gw), jnp.int32)
            return (rY, rU, rV, z, z, jnp.zeros((gh, gw, 16), jnp.int32),
                    z, jnp.zeros((gh, gw, 4, 4), jnp.int32),
                    jnp.zeros_like(wq), jnp.zeros_like(dcq),
                    jnp.zeros_like(acq))

        (recY, recU, recV, use16, i16m, i4m, cmode, ldc, iwq, idcq,
         iacq) = jax.lax.cond(imask.any(), intra_branch, inter_only,
                              (recY, recU, recV))
        m1 = imask[:, :, None, None, None]
        wq = jnp.where(m1, iwq, wq)
        dcq = jnp.where(imask[:, :, None, None, None], idcq, dcq)
        acq = jnp.where(imask[:, :, None, None, None, None], iacq, acq)
        mv44 = jnp.where(imask[:, :, None, None, None], 0, mv44)
    else:
        imask = jnp.zeros((gh, gw), bool)
        z = jnp.zeros((gh, gw), jnp.int32)
        use16, i16m, cmode = z, z, z
        i4m = jnp.zeros((gh, gw, 16), jnp.int32)
        ldc = jnp.zeros((gh, gw, 4, 4), jnp.int32)

    if deblock:
        ref44 = jnp.zeros((gh, gw, 4, 4), jnp.int32)
        recY, recU, recV = deblock_recon_device(
            wq, mv44, ref44, imask,
            qp, chroma_qp_off, (recY, recU, recV), gw, gh,
            fmb_v=fmb_v, fmb_h=fmb_h)
    # re-replicate the pad from the deblocked interior — deblocking can
    # change frame-edge pixels (internal V/H edges), and the decoder's
    # reference ring edge-pads AFTER deblocking
    def _repad(p, h, w):
        inner = jax.lax.dynamic_slice(p, (PAD, PAD), (h, w))
        return jnp.pad(inner, PAD, mode="edge")
    recY = _repad(recY, H, W)
    recU = _repad(recU, H // 2, W // 2)
    recV = _repad(recV, H // 2, W // 2)
    arrays = {"luma_ac": wq, "chroma_dc": dcq, "chroma_ac": acq,
              "mv44": mv44,
              "choice": choice.reshape(gh, gw),
              "is_intra": imask.astype(jnp.int32), "use_i16": use16,
              "i16_mode": i16m, "i4_modes": i4m, "chroma_mode": cmode,
              "luma_dc": ldc}
    packed = _pack(arrays, P_FIELDS, gh, gw)
    mad = jnp.abs(
        jax.lax.dynamic_slice(srcY, (PAD, PAD), (H, W)) -
        jax.lax.dynamic_slice(recY, (PAD, PAD), (H, W))).sum(
        dtype=jnp.int32)
    return packed, mad, recY, recU, recV


@partial(jax.jit, static_argnames=("gw", "gh", "rng", "refine",
                                   "chroma_qp_off", "deblock",
                                   "intra_in_p"))
def p_frame_fused(src_u8, refY, refU, refV, qp, lam, fmb_v, fmb_h,
                  avail_l=None, avail_t=None, avail_tr=None,
                  avail_tl=None,
                  *, gw: int, gh: int, rng: int, refine: bool,
                  chroma_qp_off: int, deblock: bool,
                  intra_in_p: bool = True):
    """P frame: fused ME/MC/transform/recon + in-loop deblock + packed
    output.  Returns (packed, mad_sum, recY, recU, recV)."""
    return _p_frame_body(src_u8, refY, refU, refV, qp, lam, fmb_v, fmb_h,
                         avail_l, avail_t, avail_tr, avail_tl,
                         gw=gw, gh=gh, rng=rng, refine=refine,
                         chroma_qp_off=chroma_qp_off, deblock=deblock,
                         intra_in_p=intra_in_p)


@partial(jax.jit, static_argnames=("gw", "gh", "rng", "refine",
                                   "chroma_qp_off", "deblock",
                                   "intra_in_p"))
def p_gop_fused(src_k_u8, refY, refU, refV, qp_k, lam_k, fmb_v, fmb_h,
                is_ref_k, avail_l=None, avail_t=None, avail_tr=None,
                avail_tl=None,
                *, gw: int, gh: int, rng: int, refine: bool,
                chroma_qp_off: int, deblock: bool,
                intra_in_p: bool = True):
    """K consecutive P frames in ONE device program: a ``lax.scan`` over
    frames carrying the deblocked recon (the TPU analog of the per-frame
    DPB hand-off, without K host round trips).

    src_k_u8 (K, H*3//2, W) uint8; qp_k (K, gh, gw); lam_k (K,) f32;
    is_ref_k (K,) bool — False for droppable temporal_id>0 frames.
    Returns (packed (K, gh*gw, n) int32, mad (K,), recY, recU, recV)."""

    def body(carry, x):
        refY, refU, refV = carry
        src_u8, qp, lam, is_ref = x
        packed, mad, recY, recU, recV = _p_frame_body(
            src_u8, refY, refU, refV, qp, lam, fmb_v, fmb_h,
            avail_l, avail_t, avail_tr, avail_tl,
            gw=gw, gh=gh, rng=rng,
            refine=refine, chroma_qp_off=chroma_qp_off, deblock=deblock,
            intra_in_p=intra_in_p)
        # non-reference frames (temporal_id > 0) leave the carry alone:
        # later frames keep predicting from the last T0 recon
        keep = lambda new, old: jnp.where(is_ref, new, old)  # noqa: E731
        return ((keep(recY, refY), keep(recU, refU), keep(recV, refV)),
                (packed, mad))

    carry, (packed_k, mad_k) = jax.lax.scan(
        body, (refY, refU, refV), (src_k_u8, qp_k, lam_k, is_ref_k))
    recY, recU, recV = carry
    return packed_k, mad_k, recY, recU, recV
