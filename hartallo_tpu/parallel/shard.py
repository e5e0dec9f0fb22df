"""Multi-chip sharding of the codec pixel pipeline (jax.sharding + shard_map).

Reference mapping (SURVEY.md §2.4): the reference splits a frame into
contiguous MB-range slices per thread with per-slice bitstreams
(hl_codec_264_encode.c:450-524) and exchanges recon via shared memory.
TPU-native design: shard **MB rows** of a frame across the ``rows`` mesh
axis; the batched stages (transforms, quant, MC, SAD reductions) are
embarrassingly row-parallel, while deblocking's top-edge filtering needs a
4-pixel halo from the previous shard — exchanged with ``jax.lax.ppermute``
over ICI (the codec's analog of ring attention's neighbor exchange).
GOPs shard across hosts (DCN) at the pipeline driver level.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hartallo_tpu.ops.transform import (dequant_4x4, forward_dct_4x4,
                                        forward_quant_4x4,
                                        inverse_transform_4x4)


def make_mesh(n_devices: int | None = None, axis: str = "rows") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def encode_step_sharded(mesh: Mesh, src: jnp.ndarray, ref: jnp.ndarray,
                        qp: int):
    """One sharded 'training-step' analog: per-shard transform coding of the
    inter residual + halo exchange for the cross-shard deblock edge.

    src/ref: (H, W) int32 luma planes, H divisible by 16 * n_shards.
    Returns (recon (H, W), coeffs (H//4, W//4, 4, 4)) with row sharding.
    """
    n = mesh.devices.size
    H, W = src.shape
    rows_per = H // n
    assert rows_per % 16 == 0

    @partial(jax.shard_map, mesh=mesh, in_specs=(P("rows"), P("rows")),
             out_specs=(P("rows"), P("rows")))
    def step(src_l, ref_l):
        # local residual transform/quant/recon (batched over 4x4 blocks)
        h, w = src_l.shape
        res = src_l - ref_l
        blocks = res.reshape(h // 4, 4, w // 4, 4).transpose(0, 2, 1, 3)
        wq = forward_quant_4x4(forward_dct_4x4(blocks),
                               jnp.full(blocks.shape[:2], qp), False)
        d = dequant_4x4(wq, jnp.full(blocks.shape[:2], qp))
        r = inverse_transform_4x4(d)
        rec = jnp.clip(ref_l + r.transpose(0, 2, 1, 3).reshape(h, w),
                       0, 255)
        # halo exchange: bottom 4 rows -> next shard (for its top-edge
        # deblock); previous shard's rows arrive as `halo`
        idx = jax.lax.axis_index("rows")
        halo = jax.lax.ppermute(rec[-4:, :], "rows",
                                [(i, (i + 1) % n) for i in range(n)])
        # cross-boundary smoothing at the shard's top edge (deblock-lite
        # stand-in for the full filter; validates the halo dataflow)
        top = rec[:4, :]
        p0 = halo[-1, :]
        q0 = top[0, :]
        q0f = jnp.where(idx > 0, (p0 + 2 * q0 + top[1, :] + 2) >> 2, q0)
        rec = rec.at[0, :].set(q0f)
        return rec, wq

    sharding = NamedSharding(mesh, P("rows"))
    src = jax.device_put(src, sharding)
    ref = jax.device_put(ref, sharding)
    return step(src, ref)


def gop_pipeline_specs(mesh: Mesh):
    """Sharding specs for the GOP-across-hosts axis (frames dimension
    sharded over 'gop'); used once multi-host meshes are available."""
    return NamedSharding(mesh, P("rows"))
