"""Whole-GOP Pallas decode: MC + residual + intra + deblock + half-pel
ring update for a batch of P/I pictures in ONE Mosaic kernel (grid over
frames).

This is the round-5 answer to the decode-throughput gap: the XLA GOP scan
paid ~23 ns/element for gather-based MC, ~0.5 us/op scan overhead on the
wavefronts, and uploaded ~0.4 MB/frame of mostly-zero coefficients over a
~25 MB/s tunnel.  Here:

- the host uploads a compact payload (``d_pool``: quadrant MC window
  words, sparse spatial-domain residual blocks, an intra-MB list, and
  per-diagonal deblock parameters — all host-precomputed numpy);
- ONE ``pallas_call`` with ``grid=(K,)`` decodes the whole batch.  Grid
  steps run sequentially on TPU, so the DPB ring (HBM, uint8 [G,b,h,j]
  half-pel stacks) carries across frames inside the kernel.

Pipeline per frame (natural padded planes in VMEM):
  1. quarter-pel MC per 8x8 quadrant (two aligned uint8 window loads +
     dynamic rolls from the cached reference slot);
  2. sparse inter residual read-modify-write blends;
  3. intra macroblocks (raster order): Intra4x4 via an MXU mode bank
     (13-sample edge vector x constant weight matrices), Intra16x16 and
     chroma modes via direct formulas — reference 8.3.1-8.3.4 /
     ``hl_codec_264_pred_intra.c``;
  4. skew into edge-major diagonal tiles, slope-1 V-then-H deblock
     wavefront (bit-exact schedule of ``ops/deblock_pallas.py``),
     unskew back;
  5. in-kernel half-pel planes + edge padding, DMA'd to the ring.

Alignment rules this design is built around (probed on the real Mosaic
backend): dynamic vector loads/stores need sublane offsets that are
multiples of 8 and lane offsets that are multiples of 128; arbitrary
offsets are reached with aligned windows + ``pltpu.roll`` by a *positive*
dynamic amount; all control scalars live in SMEM (scalar prefetch);
DMAs move whole ring slots (memref slices need 128-aligned lane sizes).

Reference parity: per-picture decode driver ``hl_codec_264_decode_avc.c``
(MV pass -> inter pred -> intra -> deblock), interpolation
``hl_codec_264_interpol.c`` (the [G,b,h,j] stacks hold the same b/h/j
values), deblocking ``hl_codec_264_deblock.c`` 8.7.2.3/8.7.2.4.
Pictures the kernel cannot express (PCM/I_BL, weighted prediction,
sub-8x8 partitions, multi-ref frames) take the XLA paths (``d_gop.py``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hartallo_tpu.core.tables import LUMA_4x4_BLK_XY
from hartallo_tpu.ops.deblock_pallas import _filter_chroma, _filter_luma
from hartallo_tpu.ops import intra as _intra_tables

PAD = 32

# aux layout per (diagonal, slot): int16
# [a_e0v, b_e0v, a_e0h, b_e0h, a_i, b_i,
#  ca_e0v, cb_e0v, ca_e0h, cb_e0h, ca_i, cb_i]   (0..11)
# [t_e0v(3), t_e0h(3), t_i(3), ct_e0v(3), ct_e0h(3), ct_i(3)] (12..29)
# [bs_v(4e x 4seg), bs_h(4e x 4seg)]             (30..61)
_AUX_BS = 30
NAUX = 62

SW = 8               # sc_mb words per MB (4 luma + 4 chroma quads)
SF = 8               # sc_frame words per frame
SI = 4               # intra-list words per intra MB

_BLK_X = LUMA_4x4_BLK_XY[:, 0].astype(int)
_BLK_Y = LUMA_4x4_BLK_XY[:, 1].astype(int)
_TR_NEVER = (3, 7, 11, 13, 15)
_TR_EDGE_BLK = 5


def _i4_consts():
    """Intra4x4 directional mode bank as two weight matrices: the
    13-sample edge vector splits into left [l0..l3] (4) and [tl,t0..t7]
    (9); pred lane 16*bankrow + 4*y + x."""
    Wl = np.zeros((4, 128), np.float32)
    Wt = np.zeros((9, 128), np.float32)
    rnd = np.zeros((1, 128), np.int32)
    sht = np.zeros((1, 128), np.int32)
    for m in range(8):
        for y in range(4):
            for x in range(4):
                L = 16 * m + 4 * y + x
                for t in range(3):
                    si = int(_intra_tables._IDX[m, y, x, t])
                    w = int(_intra_tables._WGT[m, y, x, t])
                    if w == 0:
                        continue
                    if si <= 3:
                        Wl[3 - si, L] += w
                    else:
                        Wt[si - 4, L] += w
                rnd[0, L] = _intra_tables._RND[m, y, x]
                sht[0, L] = _intra_tables._SHT[m, y, x]
    return Wl, Wt, rnd, sht


_WL4, _WT4, _RND4, _SHT4 = _i4_consts()


def _i16_plane_w():
    """Weight vectors for the Intra16x16/chroma plane-mode H/V sums."""
    wH16 = np.zeros((17, 1), np.float32)     # over [tl, t0..t15]
    for x in range(8):
        wH16[9 + x, 0] += x + 1
        wH16[7 - x, 0] -= x + 1
    wVl16 = np.zeros((16, 1), np.float32)    # over [l0..l15]; tl coeff -8
    for x in range(8):
        wVl16[8 + x, 0] += x + 1
        if x < 7:
            wVl16[6 - x, 0] -= x + 1
    wH8 = np.zeros((9, 1), np.float32)       # over [tl, t0..t7]
    for x in range(4):
        wH8[5 + x, 0] += x + 1
        wH8[3 - x, 0] -= x + 1
    wVl8 = np.zeros((8, 1), np.float32)      # over [l0..l7]; tl coeff -4
    for x in range(4):
        wVl8[4 + x, 0] += x + 1
        if x < 3:
            wVl8[2 - x, 0] -= x + 1
    return wH16, wVl16, wH8, wVl8


_WH16, _WVL16, _WH8, _WVL8 = _i16_plane_w()


def _shear_dev(aux, gw: int, gh: int):
    """(K, gh, gw, NAUX) -> (K, D2, KD, NAUX) with out[d, k] = in[k, d-k]
    (invalid slots zeroed), gather-free: pad + reshape + transpose."""
    K = aux.shape[0]
    W2 = gw + gh
    p = jnp.pad(aux, ((0, 0), (0, 0), (0, W2 - gw), (0, 0)))
    flat = p.reshape(K, gh * W2, NAUX)
    sh = flat[:, :gh * (W2 - 1)].reshape(K, gh, W2 - 1, NAUX)
    sh = jnp.swapaxes(sh, 1, 2)              # (K, D, gh, NAUX)
    D = gw + gh - 1
    kk = jnp.arange(gh)[None, :]
    dd = jnp.arange(D)[:, None]
    valid = (dd - kk >= 0) & (dd - kk < gw)
    sh = jnp.where(valid[None, :, :, None], sh, 0)
    z = jnp.zeros((K, 1, gh, NAUX), jnp.int16)
    return jnp.concatenate([z, sh, z], axis=1)


def geom(gw: int, gh: int):
    D = gw + gh - 1
    KD = gh
    KDL = KD * 16
    KCL = KD * 8
    pad = lambda n: (max((n - 1) // 128, 0) * 128 + 256)  # noqa: E731
    Hp = gh * 16 + 2 * PAD
    Wp = gw * 16 + 2 * PAD
    Hcp = gh * 8 + 2 * PAD
    Wcp = gw * 8 + 2 * PAD
    rnd = lambda n: ((n + 127) // 128) * 128 + 128        # noqa: E731
    return dict(D=D, D2=D + 2, KD=KD, KDL=KDL, KCL=KCL,
                KDLp=pad(KDL), KCLp=pad(KCL),
                H=gh * 16, W=gw * 16, Hp=Hp, Wp=Wp,
                Hc=gh * 8, Wc=gw * 8, Hcp=Hcp, Wcp=Wcp,
                Hrp=Hp + 32, Wrp=rnd(Wp),
                Hcrp=Hcp + 32, Wcrp=rnd(Wcp),
                WpP=((Wp + 256 + 127) // 128) * 128,
                WcpP=((Wcp + 256 + 127) // 128) * 128)


# ---------------------------------------------------------------------------
# kernel helpers
# ---------------------------------------------------------------------------

def _win_roll(ref, y0, x0, rows):
    """Aligned (rows, 256) int32 window of ``ref`` with the (possibly
    unaligned) origin (y0, x0) rolled to (0, 0)."""
    dy = jax.lax.rem(y0, 8)
    dx = jax.lax.rem(x0, 128)
    ya = pl.multiple_of(y0 - dy, 8)
    xa = pl.multiple_of(x0 - dx, 128)
    w = ref[pl.ds(ya, rows), pl.ds(xa, 256)].astype(jnp.int32)
    w = pltpu.roll(w, rows - dy, 0)
    return pltpu.roll(w, 256 - dx, 1)


def _sel_shift(w, dy, dx, h, wd):
    """w[dy:dy+h, dx:dx+wd] for scalar dy, dx in {0, 1} (static slices)."""
    t = jax.lax.select(dy != 0, w[1:1 + h, :wd + 1], w[0:h, :wd + 1])
    return jax.lax.select(dx != 0, t[:, 1:1 + wd], t[:, 0:wd])


def _cell(v, j):
    """Canonical (1, 1) copy of v[0:1, j:j+1] (j static) via a one-hot
    matmul (small rolls/slices keep lazy layout offsets that broadcasts
    reject)."""
    n = v.shape[1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    return _doti(v, (ri == j).astype(jnp.float32))


def _bc11(v, rows, cols):
    """(1, 1) scalar value -> (rows, cols): Mosaic's vector.broadcast of
    1x1 sources is unimplemented, so widen to a row via a ones-matmul
    first."""
    li = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)
    row = _doti(v, (li >= 0).astype(jnp.float32))
    return jnp.broadcast_to(row, (rows, cols)) if rows > 1 else row


def _rows(w, r0, n):
    """Canonical (n, cols) copy of w[r0:r0+n] via a one-hot matmul."""
    R, C = w.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, R), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (n, R), 1)
    M = (li == ri + r0).astype(jnp.float32)
    r = jax.lax.dot_general(M, w.astype(jnp.float32),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    return r.astype(jnp.int32)


def _col0(w, r0, n):
    """Canonical (n, 1) copy of w[r0:r0+n, 0:1]."""
    rows = _rows(w, r0, n)
    C = rows.shape[1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    return _doti_m(rows, (ri == 0).astype(jnp.float32))


def _doti_m(a, b):
    r = jax.lax.dot_general(a.astype(jnp.float32), b,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    return r.astype(jnp.int32)


def _shift1(v, n):
    """Canonical (1, n) copy of v[0:1, 1:1+n] via a shifted one-hot."""
    m = v.shape[1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    return _doti(v, (ri == li + 1).astype(jnp.float32))


def _widen(val, vw):
    """(vh, vw) int32 -> (vh, 256) with the value at lanes [0, vw) and a
    CANONICAL layout: Mosaic pads/concats reject operands with lazy
    layout offsets (slices, roll outputs), so widen through an identity
    matmul built from iotas (exact in f32 for |val| < 2^24)."""
    vh = val.shape[0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (vw, 256), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (vw, 256), 1)
    M = (ri == li).astype(jnp.float32)
    r = jax.lax.dot_general(val.astype(jnp.float32), M,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    return r.astype(jnp.int32)


def _blend(dst_ref, row0, nrows, lane, val, vw):
    """Overwrite-blend ``val`` (nrows, vw int32, 0..255) into the uint8
    ref ``dst_ref`` at rows [row0, row0+nrows) and dynamic lanes
    [lane, lane+vw)."""
    dL = jax.lax.rem(lane, 128)
    La = pl.multiple_of(lane - dL, 128)
    win = dst_ref[pl.ds(row0, nrows), pl.ds(La, 256)].astype(jnp.int32)
    pv = pltpu.roll(_widen(val, vw), dL, 1)
    li = jax.lax.broadcasted_iota(jnp.int32, (nrows, 256), 1)
    out = jnp.where((li >= dL) & (li < dL + vw), pv, win)
    dst_ref[pl.ds(row0, nrows), pl.ds(La, 256)] = out.astype(jnp.uint8)


def _blend_r16(dst_ref, nrows, row0, lane, r16, add):
    """4x4 block RMW at (row0 scalar in {0,4}, dynamic lane) from a
    (1, 16) row-major record: dst = clip(dst + rec) (add) or clip(rec)
    (overwrite).  Rows are placed individually — Mosaic cannot concat
    lane-slices into a (4, 4)."""
    dL = jax.lax.rem(lane, 128)
    La = pl.multiple_of(lane - dL, 128)
    win = dst_ref[pl.ds(0, nrows), pl.ds(La, 256)].astype(jnp.int32)
    w = _widen(r16, 16)                                    # (1, 256)
    li = jax.lax.broadcasted_iota(jnp.int32, (nrows, 256), 1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (nrows, 256), 0)
    lane_m = (li >= dL) & (li < dL + 4)
    out = win
    for j in range(4):
        amt = jax.lax.rem(dL + (256 - 4 * j), 256)
        bj = jnp.broadcast_to(pltpu.roll(w, amt, 1), (nrows, 256))
        m = lane_m & (ri == row0 + j)
        nv = jnp.clip(win + bj, 0, 255) if add else \
            jnp.clip(bj, 0, 255)
        out = jnp.where(m, nv, out)
    dst_ref[pl.ds(0, nrows), pl.ds(La, 256)] = out.astype(jnp.uint8)


def _expand(block, rep):
    """(KD, F) int32 -> (F, KD*rep): per-slot params broadcast to lanes.

    Mosaic has no cheap sublane->lane broadcast reshape, but the MXU
    does it exactly in f32 (all values here are <= 255 << 2^24)."""
    KD, F = block.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (KD, KD * rep), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (KD, KD * rep), 1)
    M = (li // rep == ri).astype(jnp.float32)
    e = jax.lax.dot_general(block.astype(jnp.float32), M,
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    return e.astype(jnp.int32)


def _seg_select(E, row0, phase):
    """Per-line bs from 4 expanded seg rows: line[l] = E[row0+ph(l), l]."""
    return jnp.where(phase == 0, E[row0:row0 + 1],
                     jnp.where(phase == 1, E[row0 + 1:row0 + 2],
                               jnp.where(phase == 2, E[row0 + 2:row0 + 3],
                                         E[row0 + 3:row0 + 4])))


def _blocks_T(t, KD, n):
    """Per-k-block (n x n) transpose of (n, KD*n): edge-major <->
    row-major."""
    return jnp.concatenate(
        [t[:, k * n:(k + 1) * n].T for k in range(KD)], axis=1)


def _stack(lines):
    """Assemble n (1, L) lines into (n, L) via broadcasts + selects.

    Mosaic's concat requires uniform lazy layout offsets across inputs;
    lines that mix raw slices, roll outputs and filter outputs violate
    that, while elementwise selects accept any mix (relayouts are
    inserted automatically)."""
    n = len(lines)
    L = lines[0].shape[-1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, L), 0)
    acc = jnp.broadcast_to(lines[0], (n, L))
    for c in range(1, n):
        acc = jnp.where(ri == c, jnp.broadcast_to(lines[c], (n, L)), acc)
    return acc


def _t0_line(bs, t123):
    """Per-line tc0 from bs line and the 3 per-MB TC0 scalars-as-lanes."""
    return jnp.where(bs == 1, t123[0:1],
                     jnp.where(bs == 2, t123[1:2],
                               jnp.where(bs >= 3, t123[2:3], 0)))


def _sum11(x):
    """Full reduction of a small 2-D tile to a (1, 1) value."""
    return jnp.sum(x, axis=(0, 1), keepdims=True)


def _doti(vec, wmat):
    """Integer-exact f32 dot: (1, n) x (n, m) -> (1, m) int32."""
    r = jax.lax.dot_general(vec.astype(jnp.float32),
                            jnp.asarray(wmat, jnp.float32),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    return r.astype(jnp.int32)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _make_kernel(gw, gh, K, nMB, NR, NI, stages="mriwdsoh"):
    g = geom(gw, gh)
    D, KD = g["D"], g["KD"]
    KDL, KCL, KDLp, KCLp = g["KDL"], g["KCL"], g["KDLp"], g["KCLp"]
    H, W, Hp, Wp = g["H"], g["W"], g["Hp"], g["Wp"]
    Hc, Wc, Hcp, Wcp = g["Hc"], g["Wc"], g["Hcp"], g["Wcp"]
    WpP, WcpP = g["WpP"], g["WcpP"]

    def kernel(sf_ref, smb_ref, stag_ref, simb_ref,    # scalar prefetch
               rinY_ref, rinU_ref, rinV_ref, vals_ref, ivals_ref,
               aux_ref, iconf_ref, iconi_ref, iplw_ref,
               routY_ref, routU_ref, routV_ref, out_ref,
               wy_ref, wu_ref, wv_ref,                 # skewed work (u8)
               cy_ref, cu_ref, cv_ref,                 # ref cache (u8)
               py_ref, pu_ref, pv_ref,                 # natural planes
               sem_ref):
        k = pl.program_id(0)

        # ---- frame 0: ring passthrough copy --------------------------
        @pl.when(k == 0)
        def _():
            c0 = pltpu.make_async_copy(rinY_ref, routY_ref, sem_ref.at[0])
            c1 = pltpu.make_async_copy(rinU_ref, routU_ref, sem_ref.at[1])
            c2 = pltpu.make_async_copy(rinV_ref, routV_ref, sem_ref.at[2])
            c0.start(); c1.start(); c2.start()
            c0.wait(); c1.wait(); c2.wait()

        wslot = sf_ref[k * SF + 0]
        rslot = sf_ref[k * SF + 1]
        nl = sf_ref[k * SF + 2]
        nu = sf_ref[k * SF + 3]
        nr = sf_ref[k * SF + 4]
        n_imb = sf_ref[k * SF + 5]

        # ---- fetch reference slot into the VMEM cache ----------------
        cpy = pltpu.make_async_copy(routY_ref.at[rslot], cy_ref,
                                    sem_ref.at[0])
        cpu = pltpu.make_async_copy(routU_ref.at[rslot], cu_ref,
                                    sem_ref.at[1])
        cpv = pltpu.make_async_copy(routV_ref.at[rslot], cv_ref,
                                    sem_ref.at[2])
        cpy.start(); cpu.start(); cpv.start()
        cpy.wait(); cpu.wait(); cpv.wait()

        # ---- MC into the natural padded planes -----------------------
        def mc_mb(m, _):
            my = m // gw
            mx = jax.lax.rem(m, gw)
            wb = (k * nMB + m) * SW
            quads = []
            for q in range(4):
                w = smb_ref[wb + q]
                d1x = w & 1
                d1y = (w >> 1) & 1
                d0x = (w >> 2) & 1
                d0y = (w >> 3) & 1
                p1 = (w >> 4) & 3
                p0 = (w >> 6) & 3
                x0 = (w >> 8) & 4095
                y0 = w >> 20
                wA = _win_roll(cy_ref.at[p0], y0, x0, 16)
                wB = _win_roll(cy_ref.at[p1], y0, x0, 16)
                A = _sel_shift(wA, d0y, d0x, 8, 8)
                B = _sel_shift(wB, d1y, d1x, 8, 8)
                quads.append((A + B + 1) >> 1)
            pred = jnp.concatenate(
                [jnp.concatenate([quads[0], quads[1]], axis=1),
                 jnp.concatenate([quads[2], quads[3]], axis=1)], axis=0)
            _blend(py_ref.at[pl.ds(PAD + my * 16, 16)], 0, 16,
                   PAD + mx * 16, pred, 16)

            cq = []
            for q in range(4):
                w = smb_ref[wb + 4 + q]
                fx = w & 7
                fy = (w >> 3) & 7
                cx0 = (w >> 6) & 2047
                cy0 = w >> 17
                rU = _win_roll(cu_ref, cy0, cx0, 16)
                rV = _win_roll(cv_ref, cy0, cx0, 16)

                def bil(r):
                    A = r[0:4, 0:4]
                    B = r[0:4, 1:5]
                    C = r[1:5, 0:4]
                    Dd = r[1:5, 1:5]
                    return ((8 - fx) * (8 - fy) * A + fx * (8 - fy) * B +
                            (8 - fx) * fy * C + fx * fy * Dd + 32) >> 6
                cq.append((bil(rU), bil(rV)))
            for pi, pref in ((0, pu_ref), (1, pv_ref)):
                cp_ = jnp.concatenate(
                    [jnp.concatenate([cq[0][pi], cq[1][pi]], axis=1),
                     jnp.concatenate([cq[2][pi], cq[3][pi]], axis=1)],
                    axis=0)
                _blend(pref.at[pl.ds(PAD + my * 8, 8)], 0, 8,
                       PAD + mx * 8, cp_, 8)
            return 0

        jax.lax.fori_loop(0, nMB if "m" in stages else 0, mc_mb, 0)

        # ---- sparse inter residual ----------------------------------
        def res_loop(lo, hi, pref):
            def body(i, _):
                tag = stag_ref[k * NR + i]
                y = tag >> 12
                x = tag & 4095
                dy = jax.lax.rem(y, 8)
                ya = pl.multiple_of(y - dy, 8)
                gi = jax.lax.rem(i, 8)
                ga = pl.multiple_of(i - gi, 8)
                grp = vals_ref[0, pl.ds(ga, 8), :]
                r16 = pltpu.roll(grp, 8 - gi, 0)[0:1, :]
                _blend_r16(pref.at[pl.ds(ya, 8)], 8, dy, x, r16, True)
                return 0
            jax.lax.fori_loop(lo, hi, body, 0)

        if "r" not in stages:
            nl = nu = nr = 0
        res_loop(0, nl, py_ref)
        res_loop(nl, nu, pu_ref)
        res_loop(nu, nr, pv_ref)

        # ---- intra macroblocks (raster order) ------------------------
        @pl.when(("i" in stages) & (n_imb > 0))
        def _zero_pads():
            # frame-edge neighbours read as ZERO (matches the XLA
            # wavefront's zero carry rows at picture borders)
            for pref, Hx, Wxb in ((py_ref, Hp, WpP), (pu_ref, Hcp, WcpP),
                                  (pv_ref, Hcp, WcpP)):
                v = pref[pl.ds(0, Hx), pl.ds(0, Wxb)].astype(jnp.int32)
                ri = jax.lax.broadcasted_iota(jnp.int32, (Hx, Wxb), 0)
                li = jax.lax.broadcasted_iota(jnp.int32, (Hx, Wxb), 1)
                v = jnp.where((ri < PAD) | (li < PAD), 0, v)
                pref[pl.ds(0, Hx), pl.ds(0, Wxb)] = v.astype(jnp.uint8)

        def intra_mb(i, _):
            base = (k * NI + i) * SI
            m = simb_ref[base]
            w = simb_ref[base + 1]
            i4a = simb_ref[base + 2]
            i4b = simb_ref[base + 3]
            my = m // gw
            mx = jax.lax.rem(m, gw)
            is16 = (w & 1) != 0
            i16m = (w >> 1) & 3
            cmode = (w >> 3) & 3
            alf = ((w >> 5) & 1) != 0
            atf = ((w >> 6) & 1) != 0
            atrf = ((w >> 7) & 1) != 0
            at_edge = mx == gw - 1
            y0p = PAD + my * 16
            x0p = PAD + mx * 16
            rv = ivals_ref[0, i]                       # (24, 16) int32

            def rvrow(idx):
                # materialize row `idx` at canonical layout (offset 0);
                # a plain sublane slice keeps a lazy offset that pads
                # and concats reject
                return pltpu.roll(rv, (24 - idx) % 24, 0)[0:1, :]
            w13 = iconf_ref[...]                       # (13, 128) f32
            WL = w13[0:4, :]
            WT = w13[4:13, :]
            ci2 = iconi_ref[...]                       # (2, 128) int32
            RND = ci2[0:1, :]
            SHT = ci2[1:2, :]

            # ---------- Intra4x4 --------------------------------------
            @pl.when(~is16)
            def _i4():
                for b in range(16):
                    by, bx = _BLK_Y[b], _BLK_X[b]
                    yb = y0p + by - 1
                    xb = x0p + bx - 1
                    win = _win_roll(py_ref, yb, xb, 16)
                    tvec = _rows(win, 0, 1)[:, 0:9]    # [tl, t0..t7]
                    li9 = jax.lax.broadcasted_iota(jnp.int32, (1, 9), 1)
                    if b in _TR_NEVER:
                        sub = jnp.bool_(True)
                    elif b == _TR_EDGE_BLK:
                        sub = at_edge | ~atrf
                    else:
                        sub = jnp.bool_(False)
                    t3b = _bc11(_cell(tvec, 4), 1, 9)
                    tvec = jnp.where(sub & (li9 >= 5), t3b, tvec)
                    lts = _col0(win, 1, 4).T           # (1,4) l0..l3
                    p128 = _doti(lts, WL) + _doti(tvec, WT) + RND
                    p128 = jnp.where(SHT == 0, p128,
                                     jnp.where(SHT == 1, p128 >> 1,
                                               p128 >> 2))
                    tsum = _sum11(tvec[:, 1:5])
                    lsum = _sum11(lts)
                    b_at = atf if by == 0 else jnp.bool_(True)
                    b_al = alf if bx == 0 else jnp.bool_(True)
                    dc = jnp.where(b_at & b_al, (tsum + lsum + 4) >> 3,
                                   jnp.where(b_al, (lsum + 2) >> 2,
                                             jnp.where(b_at,
                                                       (tsum + 2) >> 2,
                                                       128)))
                    mode = (i4a if b < 8 else i4b) >> (4 * (b % 8)) & 15
                    pred = p128[:, 0:16]
                    for mm, row in ((1, 1), (3, 2), (4, 3), (5, 4),
                                    (6, 5), (7, 6), (8, 7)):
                        pred = jax.lax.select(
                            mode == mm, p128[:, 16 * row:16 * row + 16],
                            pred)
                    pred = jax.lax.select(
                        mode == 2, _bc11(dc, 1, 16), pred)
                    rec = jnp.clip(pred + rvrow(b), 0, 255)
                    yb2 = y0p + by
                    dy2 = jax.lax.rem(yb2, 8)
                    ya2 = pl.multiple_of(yb2 - dy2, 8)
                    _blend_r16(py_ref.at[pl.ds(ya2, 8)], 8, dy2,
                               x0p + bx, rec, False)

            # ---------- Intra16x16 ------------------------------------
            @pl.when(is16)
            def _i16():
                win = _win_roll(py_ref, y0p - 8, x0p - 1, 24)
                t17 = _rows(win, 7, 1)[:, 0:17]        # [tl, t0..t15]
                lcol = _col0(win, 8, 16)               # (16,1)
                t16v = _shift1(t17, 16)                # t0..t15
                vimg = jnp.broadcast_to(t16v, (16, 16))
                himg = jnp.broadcast_to(lcol, (16, 16))
                tsum = _sum11(t16v)
                lsum = _sum11(lcol)
                dc = jnp.where(atf & alf, (tsum + lsum + 16) >> 5,
                               jnp.where(alf, (lsum + 8) >> 4,
                                         jnp.where(atf, (tsum + 8) >> 4,
                                                   128)))
                dcimg = _bc11(dc, 16, 16)
                Hs = _doti(t17, iplw_ref[0:1, 0:17].T)     # (1,1)
                Vs = _doti(lcol.T, iplw_ref[1:2, 0:16].T) - \
                    8 * t17[:, 0:1]
                a = 16 * (_cell(lcol.T, 15) + _cell(t17, 16))
                bco = (5 * Hs + 32) >> 6
                cco = (5 * Vs + 32) >> 6
                gx = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1) - 7
                gy = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0) - 7
                plane = jnp.clip((_bc11(a, 16, 16) +
                                  _bc11(bco, 16, 16) * gx +
                                  _bc11(cco, 16, 16) * gy + 16) >> 5,
                                 0, 255)
                pred = vimg
                pred = jax.lax.select(i16m == 1, himg, pred)
                pred = jax.lax.select(i16m == 2, dcimg, pred)
                pred = jax.lax.select(i16m == 3, plane, pred)
                ri = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
                res = jnp.zeros((16, 16), jnp.int32)
                for b in range(16):
                    by, bx = _BLK_Y[b], _BLK_X[b]
                    row = rvrow(b)                     # (1,16)
                    for j in range(4):
                        piece = pltpu.roll(row, (bx - 4 * j) % 16, 1)
                        mmask = (ri == by + j) & (ci >= bx) & (ci < bx + 4)
                        res = jnp.where(mmask,
                                        jnp.broadcast_to(piece, (16, 16)),
                                        res)
                rec = jnp.clip(pred + res, 0, 255)
                _blend(py_ref.at[pl.ds(y0p, 16)], 0, 16, x0p, rec, 16)

            # ---------- chroma (both kinds) ---------------------------
            y0c = PAD + my * 8
            x0c = PAD + mx * 8
            for pref, ro in ((pu_ref, 16), (pv_ref, 20)):
                win = _win_roll(pref, y0c - 8, x0c - 1, 16)
                t9 = _rows(win, 7, 1)[:, 0:9]          # [tl, t0..t7]
                lcol = _col0(win, 8, 8)                # (8,1)
                ts0 = _sum11(t9[:, 1:5])
                ts1 = _sum11(t9[:, 5:9])
                ls0 = _sum11(lcol[0:4])
                ls1 = _sum11(lcol[4:8])

                def corner(ts, ls):
                    return jnp.where(atf & alf, (ts + ls + 4) >> 3,
                                     jnp.where(alf, (ls + 2) >> 2,
                                               jnp.where(atf,
                                                         (ts + 2) >> 2,
                                                         128)))
                v00 = corner(ts0, ls0)
                v11 = corner(ts1, ls1)
                v10 = jnp.where(atf, (ts1 + 2) >> 2,
                                jnp.where(alf, (ls0 + 2) >> 2, 128))
                v01 = jnp.where(alf, (ls1 + 2) >> 2,
                                jnp.where(atf, (ts0 + 2) >> 2, 128))
                ri8 = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
                ci8 = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
                dcimg = jnp.where(ri8 < 4,
                                  jnp.where(ci8 < 4, _bc11(v00, 8, 8),
                                            _bc11(v10, 8, 8)),
                                  jnp.where(ci8 < 4, _bc11(v01, 8, 8),
                                            _bc11(v11, 8, 8)))
                himg = jnp.broadcast_to(lcol, (8, 8))
                vimg = jnp.broadcast_to(_shift1(t9, 8), (8, 8))
                Hs = _doti(t9, iplw_ref[2:3, 0:9].T)
                Vs = _doti(lcol.T, iplw_ref[3:4, 0:8].T) - \
                    4 * t9[:, 0:1]
                a = 16 * (_cell(lcol.T, 7) + _cell(t9, 8))
                bco = (17 * Hs + 16) >> 5
                cco = (17 * Vs + 16) >> 5
                gx = ci8 - 3
                gy = ri8 - 3
                plane = jnp.clip((_bc11(a, 8, 8) + _bc11(bco, 8, 8) * gx +
                                  _bc11(cco, 8, 8) * gy + 16) >> 5,
                                 0, 255)
                pred = dcimg
                pred = jax.lax.select(cmode == 1, himg, pred)
                pred = jax.lax.select(cmode == 2, vimg, pred)
                pred = jax.lax.select(cmode == 3, plane, pred)
                res16c = jnp.zeros((8, 16), jnp.int32)
                ri16 = jax.lax.broadcasted_iota(jnp.int32, (8, 16), 0)
                ci16 = jax.lax.broadcasted_iota(jnp.int32, (8, 16), 1)
                for b2 in range(4):
                    brow = (b2 // 2) * 4
                    bcol = (b2 % 2) * 4
                    row = rvrow(ro + b2)
                    for j in range(4):
                        piece = pltpu.roll(row, (bcol - 4 * j) % 16, 1)
                        mmask = (ri16 == brow + j) & (ci16 >= bcol) & \
                            (ci16 < bcol + 4)
                        res16c = jnp.where(
                            mmask, jnp.broadcast_to(piece, (8, 16)),
                            res16c)
                rec = jnp.clip(pred + res16c[:, 0:8], 0, 255)
                _blend(pref.at[pl.ds(y0c, 8)], 0, 8, x0c, rec, 8)
            return 0

        jax.lax.fori_loop(0, n_imb if "i" in stages else 0, intra_mb, 0)

        # ---- skew into edge-major diagonal tiles ---------------------
        def skew_mb(m, _):
            my = m // gw
            mx = jax.lax.rem(m, gw)
            d = my + mx + 1
            row0 = PAD + my * 16
            x = PAD + mx * 16
            dx = jax.lax.rem(x, 128)
            xa = pl.multiple_of(x - dx, 128)
            win = py_ref[pl.ds(row0, 16), pl.ds(xa, 256)] \
                .astype(jnp.int32)
            tile = pltpu.roll(win, 256 - dx, 1)[:, :16]
            _blend(wy_ref.at[d], 0, 16, my * 16, tile.T, 16)
            rc0 = PAD + my * 8
            xc = PAD + mx * 8
            dxc = jax.lax.rem(xc, 128)
            xca = pl.multiple_of(xc - dxc, 128)
            for pref, wref in ((pu_ref, wu_ref), (pv_ref, wv_ref)):
                wi = pref[pl.ds(rc0, 8), pl.ds(xca, 256)] \
                    .astype(jnp.int32)
                t8_ = pltpu.roll(wi, 256 - dxc, 1)[:, :8]
                _blend(wref.at[d], 0, 8, my * 8, t8_.T, 8)
            return 0

        jax.lax.fori_loop(0, nMB if "w" in stages else 0, skew_mb, 0)

        # ---- deblock wavefront (slope-1, V then H per diagonal) ------
        def diag(s, _):
            aux = aux_ref[0, s].astype(jnp.int32)           # (KD, NAUX)
            E16 = _expand(aux[:, :_AUX_BS], 16)             # (30, KDL)
            E8 = _expand(aux[:, :_AUX_BS], 8)               # (30, KCL)
            Eb16 = _expand(aux[:, _AUX_BS:], 16)            # (32, KDL)
            Eb8 = _expand(aux[:, _AUX_BS:], 8)              # (32, KCL)
            li16 = jax.lax.broadcasted_iota(jnp.int32, (1, KDL), 1)
            li8c = jax.lax.broadcasted_iota(jnp.int32, (1, KCL), 1)
            ph16 = (li16 // 4) % 4
            ph8 = (li8c // 2) % 4

            # -------- luma ------------------------------------------
            tc = wy_ref[s].astype(jnp.int32)                # (16, KDLp)
            tp = wy_ref[s - 1].astype(jnp.int32)
            cur = [tc[c:c + 1, :KDL] for c in range(16)]
            prv = [tp[c:c + 1, :KDL] for c in range(16)]

            for e in range(4):                              # V phase
                if e == 0:
                    a, b, tt = E16[0:1], E16[1:2], E16[12:15]
                else:
                    a, b, tt = E16[4:5], E16[5:6], E16[18:21]
                bs_l = _seg_select(Eb16, 4 * e, ph16)
                tc0 = _t0_line(bs_l, tt)
                if e == 0:
                    cols = [prv[12], prv[13], prv[14], prv[15],
                            cur[0], cur[1], cur[2], cur[3]]
                else:
                    c0 = 4 * e - 4
                    cols = [cur[c0 + i] for i in range(8)]
                f = _filter_luma(*cols, bs_l, a, b, tc0)
                if e == 0:
                    prv[13], prv[14], prv[15] = f[0], f[1], f[2]
                    cur[0], cur[1], cur[2] = f[3], f[4], f[5]
                else:
                    c0 = 4 * e - 4
                    (cur[c0 + 1], cur[c0 + 2], cur[c0 + 3],
                     cur[c0 + 4], cur[c0 + 5], cur[c0 + 6]) = f

            def t16(lines):                 # edge-major <-> row-major
                return _blocks_T(_stack(lines), KD, 16)
            curr = t16(cur)
            prvr = t16(prv)
            topr = pltpu.roll(prvr, 16, 1)   # top MB: prev diag, k-1

            curl = [curr[c:c + 1] for c in range(16)]
            topl = [topr[c:c + 1] for c in range(16)]
            for e in range(4):                              # H phase
                if e == 0:
                    a, b, tt = E16[2:3], E16[3:4], E16[15:18]
                else:
                    a, b, tt = E16[4:5], E16[5:6], E16[18:21]
                bs_l = _seg_select(Eb16, 16 + 4 * e, ph16)
                tc0 = _t0_line(bs_l, tt)
                if e == 0:
                    cols = [topl[12], topl[13], topl[14], topl[15],
                            curl[0], curl[1], curl[2], curl[3]]
                else:
                    c0 = 4 * e - 4
                    cols = [curl[c0 + i] for i in range(8)]
                f = _filter_luma(*cols, bs_l, a, b, tc0)
                if e == 0:
                    topl[13], topl[14], topl[15] = f[0], f[1], f[2]
                    curl[0], curl[1], curl[2] = f[3], f[4], f[5]
                else:
                    c0 = 4 * e - 4
                    (curl[c0 + 1], curl[c0 + 2], curl[c0 + 3],
                     curl[c0 + 4], curl[c0 + 5], curl[c0 + 6]) = f

            li = jax.lax.broadcasted_iota(jnp.int32, (16, KDL), 1)
            topm = _stack(topl)
            prvr2 = jnp.where(li < KDL - 16,
                              pltpu.roll(topm, KDL - 16, 1), prvr)
            currm = _stack(curl)

            def store16(s_, rows):
                em = _blocks_T(rows, KD, 16)
                full = jnp.pad(em, ((0, 0), (0, KDLp - KDL)))
                wy_ref[s_] = full.astype(jnp.uint8)
            store16(s - 1, prvr2)
            store16(s, currm)

            # -------- chroma ----------------------------------------
            for wref in (wu_ref, wv_ref):
                tc8 = wref[s].astype(jnp.int32)             # (8, KCLp)
                tp8 = wref[s - 1].astype(jnp.int32)
                cur8 = [tc8[c:c + 1, :KCL] for c in range(8)]
                prv8 = [tp8[c:c + 1, :KCL] for c in range(8)]
                for e in range(2):                          # V phase
                    if e == 0:
                        a, b, tt = E8[6:7], E8[7:8], E8[21:24]
                    else:
                        a, b, tt = E8[10:11], E8[11:12], E8[27:30]
                    bs_l = _seg_select(Eb8, 8 * e, ph8)
                    tc0 = _t0_line(bs_l, tt)
                    if e == 0:
                        cols = [prv8[6], prv8[7], cur8[0], cur8[1]]
                    else:
                        cols = [cur8[2], cur8[3], cur8[4], cur8[5]]
                    p0n, q0n = _filter_chroma(*cols, bs_l, a, b, tc0)
                    if e == 0:
                        prv8[7], cur8[0] = p0n, q0n
                    else:
                        cur8[3], cur8[4] = p0n, q0n

                def t8(lines):
                    return _blocks_T(_stack(lines), KD, 8)
                cur8r = t8(cur8)
                prv8r = t8(prv8)
                top8r = pltpu.roll(prv8r, 8, 1)
                cur8l = [cur8r[c:c + 1] for c in range(8)]
                top8l = [top8r[c:c + 1] for c in range(8)]
                for e in range(2):                          # H phase
                    if e == 0:
                        a, b, tt = E8[8:9], E8[9:10], E8[24:27]
                    else:
                        a, b, tt = E8[10:11], E8[11:12], E8[27:30]
                    bs_l = _seg_select(Eb8, 16 + 8 * e, ph8)
                    tc0 = _t0_line(bs_l, tt)
                    if e == 0:
                        cols = [top8l[6], top8l[7], cur8l[0], cur8l[1]]
                    else:
                        cols = [cur8l[2], cur8l[3], cur8l[4], cur8l[5]]
                    p0n, q0n = _filter_chroma(*cols, bs_l, a, b, tc0)
                    if e == 0:
                        top8l[7], cur8l[0] = p0n, q0n
                    else:
                        cur8l[3], cur8l[4] = p0n, q0n
                li8 = jax.lax.broadcasted_iota(jnp.int32, (8, KCL), 1)
                top8m = _stack(top8l)
                prv8f = jnp.where(li8 < KCL - 8,
                                  pltpu.roll(top8m, KCL - 8, 1), prv8r)
                cur8f = _stack(cur8l)

                def store8(s_, rows, wref=wref):
                    em = _blocks_T(rows, KD, 8)
                    full = jnp.pad(em, ((0, 0), (0, KCLp - KCL)))
                    wref[s_] = full.astype(jnp.uint8)
                store8(s - 1, prv8f)
                store8(s, cur8f)
            return 0

        jax.lax.fori_loop(1, D + 1 if "d" in stages else 1, diag, 0)

        # ---- unskew into natural padded planes ----------------------
        def unskew_mb(m, _):
            my = m // gw
            mx = jax.lax.rem(m, gw)
            d = my + mx + 1
            lane = my * 16
            dL = jax.lax.rem(lane, 128)
            La = pl.multiple_of(lane - dL, 128)
            tile = wy_ref[d, pl.ds(0, 16), pl.ds(La, 256)] \
                .astype(jnp.int32)
            tile = pltpu.roll(tile, 256 - dL, 1)[:, :16].T   # (16r, 16c)
            row0 = PAD + my * 16
            _blend(py_ref.at[pl.ds(row0, 16)], 0, 16, PAD + mx * 16,
                   tile, 16)
            lane8 = my * 8
            dL8 = jax.lax.rem(lane8, 128)
            La8 = pl.multiple_of(lane8 - dL8, 128)
            rc0 = PAD + my * 8
            for wref, pref in ((wu_ref, pu_ref), (wv_ref, pv_ref)):
                t8_ = wref[d, pl.ds(0, 8), pl.ds(La8, 256)] \
                    .astype(jnp.int32)
                t8_ = pltpu.roll(t8_, 256 - dL8, 1)[:, :8].T
                _blend(pref.at[pl.ds(rc0, 8)], 0, 8, PAD + mx * 8,
                       t8_, 8)
            return 0

        jax.lax.fori_loop(0, nMB if "s" in stages else 0, unskew_mb, 0)

        # ---- edge pad + half-pel stack + ring write-back -------------
        def pad_plane(pref, Hx, Wx):
            v = pref[pl.ds(0, Hx + 2 * PAD), pl.ds(0, Wx + 2 * PAD)] \
                .astype(jnp.int32)
            c = v[PAD:PAD + Hx, PAD:PAD + Wx]
            lft = jnp.broadcast_to(c[:, 0:1], (Hx, PAD))
            rgt = jnp.broadcast_to(c[:, Wx - 1:Wx], (Hx, PAD))
            rowx = jnp.concatenate([lft, c, rgt], axis=1)
            top = jnp.broadcast_to(rowx[0:1, :], (PAD, Wx + 2 * PAD))
            bot = jnp.broadcast_to(rowx[Hx - 1:Hx, :], (PAD, Wx + 2 * PAD))
            return jnp.concatenate([top, rowx, bot], axis=0)

        G = pad_plane(py_ref, H, W)
        TAPS = (1, -5, 20, 20, -5, 1)

        def conv_h(x):
            xe = jnp.concatenate([x[:, 0:1], x[:, 0:1], x,
                                  x[:, -1:], x[:, -1:], x[:, -1:]], axis=1)
            return sum(t * xe[:, i:i + Wp] for i, t in enumerate(TAPS))

        def conv_v(x):
            xe = jnp.concatenate([x[0:1, :], x[0:1, :], x,
                                  x[-1:, :], x[-1:, :], x[-1:, :]], axis=0)
            return sum(t * xe[i:i + Hp, :] for i, t in enumerate(TAPS))

        if "h" in stages:
            H1 = conv_h(G)
            V1 = conv_v(G)
            J1 = conv_v(H1)
        else:
            H1 = V1 = J1 = G
        cy_ref[0, pl.ds(0, Hp), pl.ds(0, Wp)] = G.astype(jnp.uint8)
        cy_ref[1, pl.ds(0, Hp), pl.ds(0, Wp)] = \
            jnp.clip((H1 + 16) >> 5, 0, 255).astype(jnp.uint8)
        cy_ref[2, pl.ds(0, Hp), pl.ds(0, Wp)] = \
            jnp.clip((V1 + 16) >> 5, 0, 255).astype(jnp.uint8)
        cy_ref[3, pl.ds(0, Hp), pl.ds(0, Wp)] = \
            jnp.clip((J1 + 512) >> 10, 0, 255).astype(jnp.uint8)
        cu_ref[pl.ds(0, Hcp), pl.ds(0, Wcp)] = \
            pad_plane(pu_ref, Hc, Wc).astype(jnp.uint8)
        cv_ref[pl.ds(0, Hcp), pl.ds(0, Wcp)] = \
            pad_plane(pv_ref, Hc, Wc).astype(jnp.uint8)

        wb0 = pltpu.make_async_copy(cy_ref, routY_ref.at[wslot],
                                    sem_ref.at[0])
        wb1 = pltpu.make_async_copy(cu_ref, routU_ref.at[wslot],
                                    sem_ref.at[1])
        wb2 = pltpu.make_async_copy(cv_ref, routV_ref.at[wslot],
                                    sem_ref.at[2])
        wb0.start(); wb1.start(); wb2.start()

        # ---- output block -------------------------------------------
        yfull = py_ref[pl.ds(PAD, H), pl.ds(0, Wp)]
        out_ref[0, pl.ds(0, H), :] = yfull[:, PAD:PAD + W]
        uc = pu_ref[pl.ds(PAD, Hc), pl.ds(0, Wcp)][:, PAD:PAD + Wc]
        vc = pv_ref[pl.ds(PAD, Hc), pl.ds(0, Wcp)][:, PAD:PAD + Wc]
        out_ref[0, pl.ds(H, Hc), :] = jnp.concatenate([uc, vc], axis=1)
        wb0.wait(); wb1.wait(); wb2.wait()

    return kernel


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("gw", "gh", "chroma_qp_off",
                                   "interpret", "stages"))
def decode_gop_pl(smb, aux, sf, tags, vals, ilist, ivals,
                  ringY, ringU, ringV, *,
                  gw: int, gh: int, chroma_qp_off: int,
                  interpret: bool = False, stages: str = "mriwdsoh"):
    """Fast-path GOP decode.

    smb (K, nMB, 8) int32 MC window words; aux (K, D2, KD, NAUX) int16
    deblock params; sf (K, SF) int32; tags (K, NR) int32;
    vals (K, NR, 16) int16; ilist (K, NI, SI) int32 intra MB list;
    ivals (K, NI, 24, 16) int16 dense intra residual; rings uint8 per
    d_gop.ring_shapes (all control payloads host-precomputed, d_pool).

    Returns (out (K, H + Hc, W) uint8, ringY', ringU', ringV')."""
    K, nMB, _ = smb.shape
    NR = tags.shape[1]
    NI = ilist.shape[1]
    g = geom(gw, gh)
    aux = _shear_dev(aux, gw, gh)            # (K, D2, KD, NAUX)
    vals32 = vals.astype(jnp.int32)
    ivals32 = ivals.astype(jnp.int32)
    iconf = jnp.asarray(np.concatenate([_WL4, _WT4], axis=0))  # (13,128)
    iconi = jnp.asarray(np.concatenate([_RND4, _SHT4], axis=0))
    plw = np.zeros((4, 17), np.float32)
    plw[0, :17] = _WH16[:, 0]
    plw[1, :16] = _WVL16[:, 0]
    plw[2, :9] = _WH8[:, 0]
    plw[3, :8] = _WVL8[:, 0]
    iplw = jnp.asarray(plw)

    kernel = _make_kernel(gw, gh, K, nMB, NR, NI, stages=stages)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),          # ringY in
            pl.BlockSpec(memory_space=pltpu.HBM),          # ringU in
            pl.BlockSpec(memory_space=pltpu.HBM),          # ringV in
            pl.BlockSpec((1, NR, 16), lambda k, *s: (k, 0, 0),
                         memory_space=pltpu.VMEM),         # vals (int32)
            pl.BlockSpec((1, NI, 24, 16), lambda k, *s: (k, 0, 0, 0),
                         memory_space=pltpu.VMEM),         # ivals
            pl.BlockSpec((1, g["D2"], g["KD"], NAUX),
                         lambda k, *s: (k, 0, 0, 0),
                         memory_space=pltpu.VMEM),         # aux
            pl.BlockSpec((13, 128), lambda k, *s: (0, 0),
                         memory_space=pltpu.VMEM),         # intra weights
            pl.BlockSpec((2, 128), lambda k, *s: (0, 0),
                         memory_space=pltpu.VMEM),         # intra rnd/sht
            pl.BlockSpec((4, 17), lambda k, *s: (0, 0),
                         memory_space=pltpu.VMEM),         # plane weights
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),          # ringY out
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, g["H"] + g["Hc"], g["W"]),
                         lambda k, *s: (k, 0, 0),
                         memory_space=pltpu.VMEM),         # out frames
        ),
        scratch_shapes=[
            pltpu.VMEM((g["D2"], 16, g["KDLp"]), jnp.uint8),
            pltpu.VMEM((g["D2"], 8, g["KCLp"]), jnp.uint8),
            pltpu.VMEM((g["D2"], 8, g["KCLp"]), jnp.uint8),
            pltpu.VMEM((4, g["Hrp"], g["Wrp"]), jnp.uint8),
            pltpu.VMEM((g["Hcrp"], g["Wcrp"]), jnp.uint8),
            pltpu.VMEM((g["Hcrp"], g["Wcrp"]), jnp.uint8),
            pltpu.VMEM((g["Hp"], g["WpP"]), jnp.uint8),
            pltpu.VMEM((g["Hcp"], g["WcpP"]), jnp.uint8),
            pltpu.VMEM((g["Hcp"], g["WcpP"]), jnp.uint8),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out_shapes = (
        jax.ShapeDtypeStruct(ringY.shape, jnp.uint8),
        jax.ShapeDtypeStruct(ringU.shape, jnp.uint8),
        jax.ShapeDtypeStruct(ringV.shape, jnp.uint8),
        jax.ShapeDtypeStruct((K, g["H"] + g["Hc"], g["W"]), jnp.uint8),
    )
    rY, rU, rV, out = pl.pallas_call(
        kernel, out_shape=out_shapes, grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
    )(sf.reshape(-1), smb.reshape(-1), tags.reshape(-1),
      ilist.reshape(-1),
      ringY, ringU, ringV, vals32, ivals32, aux, iconf, iconi, iplw)
    return out, rY, rU, rV
