"""Micro-profile of individual device stages (TPU) for CIF P-frame encode
and decode: which stage inside the fused programs burns the time."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from functools import partial

    from hartallo_tpu.decode.intra_recon import PAD
    from hartallo_tpu.encode.me import full_search_int, refine_subpel, \
        _PART_OF_BLK
    from hartallo_tpu.decode.inter_recon import inter_predict_frame
    from hartallo_tpu.encode.e_device import (deblock_recon_device,
                                              i_frame_fused, p_frame_fused)
    from hartallo_tpu.encode.intra_encode import intra_encode_frame

    gw, gh = 22, 18
    H, W = gh * 16, gw * 16
    rng = np.random.default_rng(0)
    srcY = jnp.asarray(rng.integers(0, 255, (H + 2 * PAD, W + 2 * PAD)),
                       jnp.int32)
    srcU = jnp.asarray(rng.integers(0, 255,
                                    (H // 2 + 2 * PAD, W // 2 + 2 * PAD)),
                       jnp.int32)
    srcV = srcU + 0
    refY, refU, refV = srcY + 1, srcU + 1, srcV + 1
    qp = jnp.full((gh, gw), 30, jnp.int32)
    lam = jnp.float32(10.0)
    R = 12

    fs = partial(jax.jit, static_argnames=("gw", "gh", "rng"))(
        lambda s, r, l, gw, gh, rng: full_search_int(
            s, r, l, gw=gw, gh=gh, rng=rng))
    print(f"full_search_int R={R}: "
          f"{timeit(fs, srcY, refY, lam, gw=gw, gh=gh, rng=R):8.2f} ms")

    mv_blk = jnp.zeros((gh, gw, 16, 2), jnp.int32)
    part = jnp.zeros((gh, gw, 16), jnp.int32)
    rs = partial(jax.jit, static_argnames=("gw", "gh", "nparts"))(
        lambda s, r, m, p, l, step, gw, gh, nparts: refine_subpel(
            s, r, m, p, l, step, gw=gw, gh=gh, nparts=nparts))
    print(f"refine_subpel half:   "
          f"{timeit(rs, srcY, refY, mv_blk, part, lam, 2, gw=gw, gh=gh, nparts=4):8.2f} ms")

    mv44 = jnp.zeros((gh, gw, 4, 4, 2), jnp.int32)
    zr = jnp.zeros((gh, gw, 4), jnp.int32)
    ip = partial(jax.jit, static_argnames=("gw", "gh"))(
        lambda ry, ru, rv, m, z, gw, gh: inter_predict_frame(
            ry[None], ru[None], rv[None], m, z, gw, gh))
    print(f"inter_predict_frame:  "
          f"{timeit(ip, refY, refU, refV, mv44, zr, gw=gw, gh=gh):8.2f} ms")

    db = partial(jax.jit, static_argnames=("gw", "gh", "coff"))(
        lambda wq, m44, r44, intra, qp, py, pu, pv, gw, gh, coff:
        deblock_recon_device(wq, m44, r44, intra, qp, coff,
                             (py, pu, pv), gw, gh))
    wq = jnp.zeros((gh, gw, 16, 4, 4), jnp.int32)
    r44 = jnp.zeros((gh, gw, 4, 4), jnp.int32)
    print(f"deblock_recon_device: "
          f"{timeit(db, wq, mv44, r44, jnp.ones((gh, gw), bool), qp, srcY, srcU, srcV, gw=gw, gh=gh, coff=0):8.2f} ms")

    al = np.ones((gh, gw), bool)
    al[:, 0] = False
    at = np.ones((gh, gw), bool)
    at[0, :] = False
    ie = partial(jax.jit, static_argnames=("gw", "gh", "coff"))(
        lambda sy, su, sv, qp, al, at, l, gw, gh, coff:
        intra_encode_frame(sy, su, sv, qp, coff, al, at, l, gw=gw, gh=gh))
    print(f"intra_encode_frame:   "
          f"{timeit(ie, srcY, srcU, srcV, qp, jnp.asarray(al), jnp.asarray(at), lam, gw=gw, gh=gh, coff=0):8.2f} ms")

    # whole fused programs
    src_u8 = jnp.asarray(rng.integers(0, 255, (H * 3 // 2, W)), jnp.uint8)
    fmb_v = jnp.zeros((gh, gw), bool).at[:, 1:].set(True)
    fmb_h = jnp.zeros((gh, gw), bool).at[1:, :].set(True)
    print(f"p_frame_fused:        "
          f"{timeit(p_frame_fused, src_u8, refY, refU, refV, qp, lam, fmb_v, fmb_h, gw=gw, gh=gh, rng=R, refine=True, chroma_qp_off=0, deblock=True):8.2f} ms")
    print(f"i_frame_fused:        "
          f"{timeit(i_frame_fused, src_u8, qp, lam, jnp.asarray(al), jnp.asarray(at), fmb_v, fmb_h, gw=gw, gh=gh, chroma_qp_off=0, deblock=True):8.2f} ms")

    # decode-side fused program
    from hartallo_tpu.decode.d_fused import decode_frame_fused
    if True:
        from hartallo_tpu.decode.slice_decode import SliceData
        from hartallo_tpu.decode.d_fused import pack_slice_arrays
        sd = SliceData.create(gw, gh)
        sd.mb_kind[:] = 1
        sd.slice_id[:] = 0
        f = np.zeros((gh, gw), bool)
        packed = pack_slice_arrays(sd, f, f, f, f, np.ones((gh, gw), bool))
        packed = jnp.asarray(packed)
        ry = jnp.zeros((1,) + srcY.shape, jnp.int32)
        ru = jnp.zeros((1,) + srcU.shape, jnp.int32)
        rv = jnp.zeros((1,) + srcV.shape, jnp.int32)
        print(f"decode_frame_fused(P):"
              f"{timeit(decode_frame_fused, packed, ry, ru, rv, gw=gw, gh=gh, has_inter=True, chroma_qp_off=0, deblock=True):8.2f} ms")


if __name__ == "__main__":
    main()
