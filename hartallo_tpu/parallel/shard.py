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
        wq, dcq, acq, mv44, choice, recY, recU, recV = p_frame_device(
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


def gop_pipeline_specs(mesh: Mesh):
    """Sharding specs for the GOP-across-hosts axis (frames dimension
    sharded over 'gop'); used once multi-host meshes are available."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))
