"""Stage ablation of the Pallas fast-decode kernel on the real backend.

Builds a synthetic but realistic K-frame CIF (or 720p) fast batch and
times decode_gop_pl with stages progressively enabled:
  m = MC quadrant loop, r = sparse residual, d = deblock wavefront,
  s = unskew, o/h = output + half-pel (always-on tail; h gates convs).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from hartallo_tpu.decode import d_pool
    from hartallo_tpu.decode.d_gop import ring_shapes
    from hartallo_tpu.decode.d_gop_pallas import SF, decode_gop_pl

    if "--720p" in sys.argv:
        gw, gh, K = 80, 45, 6
    else:
        gw, gh, K = 22, 18, 8
    n = gh * gw
    NR = d_pool.nrmax(gw, gh)
    rng = np.random.default_rng(0)

    from hartallo_tpu.decode.slice_decode import SliceData
    # build realistic FastFrames via pack_fast on synthetic SliceData
    ffs = []
    for k in range(K):
        sd = SliceData.create(gw, gh)
        sd.mb_kind[:] = 4
        sd.qp[:] = 30
        mv = rng.integers(-32, 32, (gh, gw, 2, 2, 2))
        sd.mv[:] = np.repeat(np.repeat(mv, 2, axis=2), 2, axis=3) \
            .reshape(gh, gw, 4, 4, 2)[..., :2][..., :]
        lmask = rng.random((gh, gw, 16)) < (0.1 if gw <= 40 else 0.04)
        sd.luma_ac[lmask] = rng.integers(-20, 20,
                                         (int(lmask.sum()), 4, 4))
        nnz_blk = (sd.luma_ac != 0).any(axis=(3, 4))
        raster = nnz_blk[:, :, np.argsort(d_pool._BLK_RASTER_OF)]
        sd.nnz_luma[:] = raster.reshape(gh, gw, 4, 4) \
            .transpose(0, 2, 1, 3).reshape(4 * gh, 4 * gw) \
            .astype(np.int16)
        fv = np.zeros((gh, gw), bool); fv[:, 1:] = True
        fh = np.zeros((gh, gw), bool); fh[1:, :] = True
        ones = np.ones((gh, gw), bool)
        ff = d_pool.pack_fast(sd, fv, fh, ones, (k + 1) % 2, 0)
        ff.ref_slot = k % 2
        ffs.append(ff)
    smb = np.stack([f.smb for f in ffs])
    aux = np.stack([f.aux for f in ffs])
    sf = np.zeros((K, SF), np.int32)
    tags = np.zeros((K, NR), np.int32)
    vals = np.zeros((K, NR, 16), np.int16)
    for k, f in enumerate(ffs):
        m = f.tags.shape[0]
        sf[k, 0] = f.wslot
        sf[k, 1] = f.ref_slot
        sf[k, 2:5] = f.counts
        tags[k, :m] = f.tags
        vals[k, :m] = f.vals

    shY, shU, shV = ring_shapes(gw, gh, 2)
    ringY = jnp.asarray(rng.integers(0, 255, shY), jnp.uint8)
    ringU = jnp.asarray(rng.integers(0, 255, shU), jnp.uint8)
    ringV = jnp.asarray(rng.integers(0, 255, shV), jnp.uint8)
    dsm, dax, dsf, dt, dv = map(jnp.asarray, (smb, aux, sf, tags, vals))

    for stages in ("", "m", "mr", "mrd", "mrds", "mrdsh", "mrdsoh"):
        try:
            out, a, b, c = decode_gop_pl(dsm, dax, dsf, dt, dv, ringY,
                                         ringU, ringV, gw=gw, gh=gh,
                                         chroma_qp_off=0, stages=stages)
            jax.block_until_ready(c)
            t0 = time.perf_counter()
            N = 5
            rA, rB, rC = ringY, ringU, ringV
            for _ in range(N):
                out, rA, rB, rC = decode_gop_pl(dsm, dax, dsf, dt, dv,
                                                rA, rB, rC,
                                                gw=gw, gh=gh,
                                                chroma_qp_off=0,
                                                stages=stages)
            jax.block_until_ready(rC)
            dt_ = (time.perf_counter() - t0) / N
            print(f"stages={stages!r:10}: {1e3*dt_:7.2f} ms/batch "
                  f"({1e3*dt_/K:.2f} ms/f)")
        except Exception as e:
            print(f"stages={stages!r}: FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()
