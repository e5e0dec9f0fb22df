"""Multi-chip sharding of the codec pixel pipeline (jax.sharding + shard_map).

Reference mapping (SURVEY.md §2.4): the reference splits a frame into
contiguous MB-range slices per thread with per-slice bitstreams
(hl_codec_264_encode.c:450-524) and exchanges recon via shared memory.
TPU-native design: shard **MB rows** of a frame across the ``rows`` mesh
axis — each shard encodes its row band as an independent slice
(disable_deblocking_filter_idc=2 semantics at the band edge, so per-shard
deblocking stays spec-conformant) while motion compensation reads up to
PAD rows into the neighbor band through a reference-plane **halo
exchanged with ``jax.lax.ppermute``** over ICI (the codec's analog of ring
attention's neighbor exchange).  GOPs shard across hosts (DCN) at the
pipeline driver level.

``p_encode_step_sharded`` is the full per-frame "training step": integer
full-search ME -> partition decision -> sub-pel refine -> quarter-pel MC ->
residual DCT/quant -> recon -> in-loop deblock, all inside one
``shard_map`` program (the same fused pipeline as
``encode.p_device.p_frame_device``, run per shard on its band).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hartallo_tpu.core.tables import LUMA_4x4_BLK_XY, QP_SCALE_CHROMA
from hartallo_tpu.decode.intra_recon import PAD
from hartallo_tpu.encode.p_device import p_frame_device
from hartallo_tpu.ops.deblock import compute_bs, deblock_frame


def make_mesh(n_devices: int | None = None, axis: str = "rows") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _halo_pad(x, n: int, axis_name: str):
    """(h, w) local plane -> (h+2*PAD, w+2*PAD): vertical pads are the
    neighbor shards' boundary rows (ppermute halo exchange over ICI);
    the global top/bottom shards and the horizontal pads edge-replicate,
    matching the single-chip ``jnp.pad(..., mode="edge")`` layout."""
    idx = jax.lax.axis_index(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]     # my bottom rows -> next
    up = [(i + 1, i) for i in range(n - 1)]       # my top rows -> prev
    h, w = x.shape
    k = min(PAD, h)                               # rows one neighbor holds
    from_above = jax.lax.ppermute(x[-k:, :], axis_name, down)
    from_below = jax.lax.ppermute(x[:k, :], axis_name, up)
    if k < PAD:
        # band shorter than the pad: extend with the farthest fetched row
        # (reads past one neighbor's band are outside the legal MV range)
        from_above = jnp.concatenate(
            [jnp.broadcast_to(from_above[:1, :], (PAD - k, w)),
             from_above], axis=0)
        from_below = jnp.concatenate(
            [from_below,
             jnp.broadcast_to(from_below[-1:, :], (PAD - k, w))], axis=0)
    top_edge = jnp.broadcast_to(x[:1, :], (PAD, w))
    bot_edge = jnp.broadcast_to(x[-1:, :], (PAD, w))
    top = jnp.where(idx == 0, top_edge, from_above)
    bot = jnp.where(idx == n - 1, bot_edge, from_below)
    tall = jnp.concatenate([top, x, bot], axis=0)
    return jnp.pad(tall, ((0, 0), (PAD, PAD)), mode="edge")


def _edge_pad(x):
    return jnp.pad(x, PAD, mode="edge")


def _shard_deblock(wq, mv44, qp_l, qpc_off, planes, gw, gh_l):
    """Traced per-shard in-loop deblock of a P band (inter-only MBs, ref 0)
    — mirrors encode.encoder.Encoder._deblock_recon."""
    counts = (wq != 0).sum(axis=(-1, -2))                    # (gh,gw,16)
    nnz = jnp.zeros((4 * gh_l, 4 * gw), jnp.int32)
    for blk in range(16):
        bx = int(LUMA_4x4_BLK_XY[blk, 0]) // 4
        by = int(LUMA_4x4_BLK_XY[blk, 1]) // 4
        nnz = nnz.at[by::4, bx::4].set(counts[:, :, blk])
    mb_is_intra = jnp.zeros((gh_l, gw), bool)
    mvg = mv44.transpose(0, 2, 1, 3, 4).reshape(4 * gh_l, 4 * gw, 2)
    refg = jnp.zeros((4 * gh_l, 4 * gw), jnp.int32)
    fint = jnp.ones((gh_l, gw), bool)
    fmb_v = jnp.zeros((gh_l, gw), bool).at[:, 1:].set(True)
    fmb_h = jnp.zeros((gh_l, gw), bool).at[1:, :].set(True)
    bs_v, bs_h = compute_bs(mb_is_intra, nnz, mvg, refg, fmb_v, fmb_h,
                            fint)
    qp_left = jnp.concatenate([qp_l[:, :1], qp_l[:, :-1]], axis=1)
    qp_top = jnp.concatenate([qp_l[:1, :], qp_l[:-1, :]], axis=0)
    qpc = jnp.asarray(QP_SCALE_CHROMA)[jnp.clip(qp_l + qpc_off, 0, 51)]
    qpc_left = jnp.concatenate([qpc[:, :1], qpc[:, :-1]], axis=1)
    qpc_top = jnp.concatenate([qpc[:1, :], qpc[:-1, :]], axis=0)
    zeros = jnp.zeros((gh_l, gw), jnp.int32)
    return deblock_frame(planes, bs_v, bs_h, qp_l, qp_left, qp_top,
                         qpc, qpc_left, qpc_top, zeros, zeros,
                         gw=gw, gh=gh_l)


def p_encode_step_sharded(mesh: Mesh, srcY, srcU, srcV, refY, refU, refV,
                          qp, lam: float, *, gw: int, gh: int, rng: int,
                          chroma_qp_off: int = 0, deblock: bool = True):
    """Full sharded P-frame encode step.

    srcY/refY: (gh*16, gw*16) int32 luma; srcU..refV: half-size chroma;
    qp: (gh, gw) int32.  gh must divide evenly by the mesh size.
    Returns (wq, dcq, acq, mv44, choice, recY, recU, recV) with the MB-row
    dims sharded over the mesh; rec planes are unpadded (gh*16, gw*16).
    """
    n = mesh.devices.size
    assert gh % n == 0, (gh, n)
    gh_l = gh // n
    assert rng <= PAD - 8
    axis = mesh.axis_names[0]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis),
                       P(axis), P(axis), P(axis), P(axis)),
             out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                        P(axis), P(axis), P(axis)),
             # the fused pipeline builds scan carries from literals, which
             # the varying-manual-axes check rejects under shard_map
             check_vma=False)
    def step(sY, sU, sV, rY, rU, rV, qp_l):
        rYp = _halo_pad(rY, n, axis)
        rUp = _halo_pad(rU, n, axis)
        rVp = _halo_pad(rV, n, axis)
        sYp, sUp, sVp = _edge_pad(sY), _edge_pad(sU), _edge_pad(sV)
        wq, dcq, acq, mv44, choice, recY, recU, recV, _ = p_frame_device(
            sYp, sUp, sVp, rYp, rUp, rVp, qp_l, jnp.float32(lam),
            gw=gw, gh=gh_l, rng=rng, refine=True,
            chroma_qp_off=chroma_qp_off)
        if deblock:
            recY, recU, recV = _shard_deblock(
                wq, mv44, qp_l, chroma_qp_off, (recY, recU, recV),
                gw, gh_l)
        H, W = gh_l * 16, gw * 16
        recY = jax.lax.dynamic_slice(recY, (PAD, PAD), (H, W))
        recU = jax.lax.dynamic_slice(recU, (PAD, PAD), (H // 2, W // 2))
        recV = jax.lax.dynamic_slice(recV, (PAD, PAD), (H // 2, W // 2))
        return wq, dcq, acq, mv44, choice, recY, recU, recV

    sh = NamedSharding(mesh, P(axis))
    args = [jax.device_put(jnp.asarray(a, jnp.int32), sh)
            for a in (srcY, srcU, srcV, refY, refU, refV, qp)]
    return step(*args)


# ---------------------------------------------------------------------------
# Sharded decode (SURVEY.md §2.4 row 3: decode MB parallelism across chips)
# ---------------------------------------------------------------------------

def decode_frame_step_sharded(mesh: Mesh, packed, ringY, ringU, ringV,
                              wslot, *, gw: int, gh: int,
                              chroma_qp_off: int, has_intra: bool,
                              S: int):
    """One frame of the decode pipeline row-sharded over the mesh.

    packed: (gh*gw, WORDS) int32 per-MB buffer (host parse, MB raster
    order) — sharded by MB-row bands; ringY/U/V: (S, H, W)/(S, H/2,
    W/2) int32 UNPADDED reference rings, row-sharded on the plane axis
    (per-4x4 packed ref indices address ring slots, so multi-reference /
    MMCO / temporal streams decode; the recon lands in ``wslot``).
    Streams must be band-independent (one slice per band with
    disable_deblocking_filter_idc=2 — the packed fmb flags already
    encode the slice-boundary gating, so the per-band deblock is
    spec-exact).  MC reads into neighbor bands through a ppermute'd ref
    halo, after which each band computes its own half-pel grids.

    Returns (y_u8 (H, W), uv_u8 (H/2, W) row-interleaved U/V, ringY',
    ringU', ringV') — all band-sharded.
    """
    from hartallo_tpu.decode.d_gop import _OFF, _field
    from hartallo_tpu.decode.intra_recon import intra_reconstruct
    from hartallo_tpu.ops.deblock import deblock_frame_s1
    from hartallo_tpu.ops.wide import (compute_bs_grids, halfpel_planes,
                                       mc_chroma_plane, mc_grids,
                                       mc_luma_plane, residual_planes_wide)
    n = mesh.devices.size
    assert gh % n == 0, (gh, n)
    gh_l = gh // n
    axis = mesh.axis_names[0]
    H_l, W = gh_l * 16, gw * 16
    _J_QPC = jnp.asarray(QP_SCALE_CHROMA)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(None, axis), P(None, axis),
                       P(None, axis), P()),
             out_specs=(P(axis), P(axis), P(None, axis), P(None, axis),
                        P(None, axis)),
             check_vma=False)
    def step(pk, rY, rU, rV, wsl):
        pk = pk.astype(jnp.int32)                    # int16 on the wire
        pk3 = pk[None]                               # (1, Nmb_l, WORDS)
        qp = _field(pk3, "qp", gw, gh_l)[0]
        kind = _field(pk3, "kind", gw, gh_l)[0]
        M = gh_l * gw
        res_y, res_c = residual_planes_wide(
            pk[:, slice(*_OFF["luma_ac"][:2])].reshape(M, 16, 16),
            pk[:, slice(*_OFF["luma_dc"][:2])].reshape(M, 16),
            pk[:, slice(*_OFF["chroma_ac"][:2])].reshape(M, 2, 4, 16),
            pk[:, slice(*_OFF["chroma_dc"][:2])].reshape(M, 2, 4),
            qp.reshape(M), (kind == 1).reshape(M), chroma_qp_off,
            _J_QPC, gw, gh_l)
        res_y, res_c = res_y[0], res_c[0]

        # reference halo + per-band half-pel grids, per ring slot
        stackY = jnp.stack([halfpel_planes(_halo_pad(rY[si], n, axis))
                            for si in range(S)])     # (S, 4, Hp, Wp)
        rUp = jnp.stack([_halo_pad(rU[si], n, axis) for si in range(S)])
        rVp = jnp.stack([_halo_pad(rV[si], n, axis) for si in range(S)])

        N = M * 16
        mv = _field(pk3, "mv", gw, gh_l)[0].reshape(N, 2)
        slot44 = jnp.repeat(jnp.repeat(
            _field(pk3, "ref_idx", gw, gh_l)[0].reshape(gh_l, gw, 2, 2),
            2, axis=2), 2, axis=3).reshape(N)
        slot = slot44.astype(jnp.int32)
        wp_l = _field(pk3, "wp_l", gw, gh_l)[0].reshape(gh_l, gw, 2, 2, 3)
        wp_l = jnp.repeat(jnp.repeat(wp_l, 2, 2), 2, 3).reshape(N, 3)
        wp_c = _field(pk3, "wp_c", gw, gh_l)[0] \
            .reshape(gh_l, gw, 2, 2, 2, 3)
        wp_c = jnp.repeat(jnp.repeat(wp_c, 2, 2), 2, 3).reshape(N, 2, 3)
        bx, by, cbx, cby = mc_grids(gw, gh_l)
        pY = mc_luma_plane(stackY, slot, bx, by, mv[:, 0], mv[:, 1],
                           wp_l, gw, gh_l)
        pU = mc_chroma_plane(rUp, slot, cbx, cby, mv[:, 0], mv[:, 1],
                             wp_c[:, 0], gw, gh_l)
        pV = mc_chroma_plane(rVp, slot, cbx, cby, mv[:, 0], mv[:, 1],
                             wp_c[:, 1], gw, gh_l)
        inter_mask = (kind >= 3) & (kind != 8)
        mY = jnp.repeat(jnp.repeat(inter_mask, 16, 0), 16, 1)
        mC = jnp.repeat(jnp.repeat(inter_mask, 8, 0), 8, 1)
        y0 = jnp.pad(jnp.where(mY, jnp.clip(pY + res_y, 0, 255), 0), PAD)
        u0 = jnp.pad(jnp.where(mC, jnp.clip(pU + res_c[0], 0, 255), 0),
                     PAD)
        v0 = jnp.pad(jnp.where(mC, jnp.clip(pV + res_c[1], 0, 255), 0),
                     PAD)
        if has_intra:
            kint = jnp.where(kind == 0, 0, jnp.where(kind == 1, 1, 2))
            ry_mb = res_y.reshape(gh_l, 16, gw, 16).transpose(0, 2, 1, 3)
            rc_mb = res_c.reshape(2, gh_l, 8, gw, 8) \
                .transpose(1, 3, 0, 2, 4)
            y0, u0, v0 = intra_reconstruct(
                (y0, u0, v0), ry_mb, rc_mb, kint,
                _field(pk3, "i16_mode", gw, gh_l)[0],
                _field(pk3, "i4_modes", gw, gh_l)[0],
                _field(pk3, "chroma_mode", gw, gh_l)[0],
                _field(pk3, "avail_l", gw, gh_l)[0] != 0,
                _field(pk3, "avail_t", gw, gh_l)[0] != 0,
                gw=gw, gh=gh_l)

        nnz = _field(pk3, "nnz", gw, gh_l)[0] \
            .transpose(0, 2, 1, 3).reshape(4 * gh_l, 4 * gw)
        mvg = _field(pk3, "mv", gw, gh_l)[0] \
            .transpose(0, 2, 1, 3, 4).reshape(4 * gh_l, 4 * gw, 2)
        ref_slot = _field(pk3, "ref_idx", gw, gh_l)[0]
        refg = jnp.repeat(jnp.repeat(
            ref_slot.reshape(gh_l, gw, 2, 2), 2, 2), 2, 3) \
            .transpose(0, 2, 1, 3).reshape(4 * gh_l, 4 * gw)
        mb_is_intra = (kind <= 2) | (kind == 8)
        bs_vg, bs_hg = compute_bs_grids(
            mb_is_intra, nnz, mvg, refg,
            _field(pk3, "fmb_v", gw, gh_l)[0] != 0,
            _field(pk3, "fmb_h", gw, gh_l)[0] != 0,
            _field(pk3, "fint", gw, gh_l)[0] != 0)
        bs_v = bs_vg.reshape(gh_l, 4, gw, 4).transpose(0, 2, 3, 1)
        bs_h = bs_hg.reshape(gh_l, 4, gw, 4).transpose(0, 2, 1, 3)
        qpc = _J_QPC[jnp.clip(qp + chroma_qp_off, 0, 51)]
        qp_l = jnp.concatenate([qp[:, :1], qp[:, :-1]], axis=1)
        qp_t = jnp.concatenate([qp[:1, :], qp[:-1, :]], axis=0)
        qpc_l = jnp.concatenate([qpc[:, :1], qpc[:, :-1]], axis=1)
        qpc_t = jnp.concatenate([qpc[:1, :], qpc[:-1, :]], axis=0)
        yp, up, vp = deblock_frame_s1(
            (y0, u0, v0), bs_v, bs_h, qp, qp_l, qp_t, qpc, qpc_l, qpc_t,
            _field(pk3, "alpha_off", gw, gh_l)[0],
            _field(pk3, "beta_off", gw, gh_l)[0], gw=gw, gh=gh_l)
        y = jax.lax.dynamic_slice(yp, (PAD, PAD), (H_l, W))
        u = jax.lax.dynamic_slice(up, (PAD, PAD), (H_l // 2, W // 2))
        v = jax.lax.dynamic_slice(vp, (PAD, PAD), (H_l // 2, W // 2))
        uv = jnp.stack([u, v], axis=1).reshape(H_l // 2, W)
        nY = jax.lax.dynamic_update_slice(rY, y[None], (wsl, 0, 0))
        nU = jax.lax.dynamic_update_slice(rU, u[None], (wsl, 0, 0))
        nV = jax.lax.dynamic_update_slice(rV, v[None], (wsl, 0, 0))
        # y and uv emitted separately: the band concatenation along the
        # sharded axis then yields globally-contiguous planes
        return y.astype(jnp.uint8), uv.astype(jnp.uint8), nY, nU, nV

    sh = NamedSharding(mesh, P(axis))
    shr = NamedSharding(mesh, P(None, axis))
    args = [jax.device_put(jnp.asarray(packed), sh)] + \
        [jax.device_put(jnp.asarray(a, jnp.int32), shr)
         for a in (ringY, ringU, ringV)] + \
        [jnp.asarray(wslot, jnp.int32)]
    return step(*args)


def _first_mb_is_zero(nal: bytes) -> bool:
    from hartallo_tpu.bitio import BitReader, strip_emulation_prevention
    r = BitReader(strip_emulation_prevention(nal))
    r.u(8)                                     # NAL header
    return r.ue() == 0                         # first_mb_in_slice


def split_gops(stream: bytes):
    """IDR-cut a stream into self-contained GOP byte ranges, each
    prefixed with the SPS/PPS NALs (the GOP-across-hosts unit —
    SURVEY.md §2.4 row 7 / BASELINE config 5)."""
    from hartallo_tpu.bitio import find_nal_units
    headers = b""
    gops = []
    cur = b""
    for s0, e0 in find_nal_units(stream):
        nal = stream[s0:e0]
        t = nal[0] & 0x1F
        chunk = b"\x00\x00\x00\x01" + nal
        if t in (7, 8, 15):                    # SPS/PPS/subset-SPS
            headers += chunk
        elif t == 5 and _first_mb_is_zero(nal):
            # IDR picture start (first slice only — multi-slice frames
            # carry one IDR NAL per slice): new GOP
            if cur:
                gops.append(cur)
            cur = headers + chunk
        else:
            cur += chunk
    if cur:
        gops.append(cur)
    return gops


def decode_gops_grouped(mesh: Mesh, stream: bytes, groups: int):
    """GOP-pipeline driver: IDR-cut the stream and decode GOP g on mesh
    device group g % groups, each group row-sharding its frames
    (decode_frame_step_sharded).  Groups run concurrently (dispatches
    interleave); outputs return in stream order.

    The "hosts" axis of BASELINE config 5 maps to device groups here —
    on a real multi-host mesh the same code runs with each group on one
    host and DCN between them (no inter-group communication exists:
    GOPs are independent by construction)."""
    devs = list(mesh.devices.flat)
    per = len(devs) // groups
    submeshes = [Mesh(np.array(devs[g * per:(g + 1) * per]),
                      (mesh.axis_names[0],)) for g in range(groups)]
    out = []
    for g, gop in enumerate(split_gops(stream)):
        out.append(_decode_gop_sharded(submeshes[g % groups], gop))
    return [f for gop_frames in out for f in gop_frames]


def _decode_gop_sharded(mesh: Mesh, gop_stream: bytes):
    """Decode one GOP with every frame row-sharded over ``mesh``; host
    parse feeds packed buffers, recon planes stay device-resident and
    sharded between frames."""
    from hartallo_tpu.decode.decoder import Decoder
    import numpy as _np

    results = []
    dec = Decoder(batch_k=1)
    dec.want_dense_packed = True       # sharded flush reads job.packed

    state = {"ring": None}

    def flush_sharded(layer):
        jobs, layer.jobs = layer.jobs, []
        for job in jobs:
            gw, gh = job.gw, job.gh
            H, W = gh * 16, gw * 16
            S = layer.ring_key[2] if layer.ring_key else 2
            if state["ring"] is None:
                state["ring"] = (
                    _np.zeros((S, H, W), _np.int32),
                    _np.zeros((S, H // 2, W // 2), _np.int32),
                    _np.zeros((S, H // 2, W // 2), _np.int32))
            rY, rU, rV = state["ring"]
            pps_off = layer.ring_key[3] if layer.ring_key else 0
            yo, uvo, rY, rU, rV = decode_frame_step_sharded(
                mesh, job.packed, rY, rU, rV, job.wslot, gw=gw, gh=gh,
                chroma_qp_off=pps_off, has_intra=bool(job.has_intra),
                S=S)
            state["ring"] = (rY, rU, rV)
            out = _np.concatenate([_np.asarray(yo), _np.asarray(uvo)])
            from hartallo_tpu.decode.decoder import _BatchOut
            job.out = (_BatchOut(out[None]), 0)

    # instance-level override (a class-level patch would leak into other
    # Decoder instances used concurrently)
    dec._flush = flush_sharded
    res = dec.decode_annexb(gop_stream, tolerant=False)
    results = [r.frame for r in res]
    return results
