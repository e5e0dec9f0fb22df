"""Component timings for the fused decode stages at CIF/720p/1080p on the
current backend — steers the round-3 perf work."""
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


def run(gw, gh, label):
    from functools import partial
    from hartallo_tpu.decode.intra_recon import (PAD, compute_residuals,
                                                 intra_reconstruct)
    from hartallo_tpu.decode.inter_recon import inter_predict_frame
    from hartallo_tpu.ops.deblock import compute_bs, deblock_frame

    H, W = gh * 16, gw * 16
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.integers(0, 200, s), jnp.int32)

    luma_ac = f32(gh, gw, 16, 4, 4) % 5
    luma_dc = f32(gh, gw, 4, 4) % 5
    chroma_ac = f32(gh, gw, 2, 4, 4, 4) % 5
    chroma_dc = f32(gh, gw, 2, 2, 2) % 5
    qp = jnp.full((gh, gw), 30, jnp.int32)
    is_i16 = jnp.zeros((gh, gw), bool)

    cr = jax.jit(partial(compute_residuals, chroma_qp_index_offset=0))
    t_res = timeit(cr, luma_ac, luma_dc, chroma_ac, chroma_dc, qp, is_i16)

    refY = f32(2, H + 2 * PAD, W + 2 * PAD)
    refU = f32(2, H // 2 + 2 * PAD, W // 2 + 2 * PAD)
    refV = refU + 0
    mv = f32(gh, gw, 4, 4, 2) % 16 - 8
    ref_idx = jnp.zeros((gh, gw, 4), jnp.int32)
    ip = jax.jit(partial(inter_predict_frame, gw=gw, gh=gh))
    t_inter = timeit(ip, refY, refU, refV, mv, ref_idx)

    res_y = f32(gh, gw, 16, 16) % 9 - 4
    res_c = f32(gh, gw, 2, 8, 8) % 9 - 4
    kind = jnp.zeros((gh, gw), jnp.int32)   # all I4x4 (worst case)
    i16m = jnp.zeros((gh, gw), jnp.int32)
    i4m = jnp.zeros((gh, gw, 16), jnp.int32)
    cm = jnp.zeros((gh, gw), jnp.int32)
    av = jnp.ones((gh, gw), bool)
    planes = (f32(H + 2 * PAD, W + 2 * PAD),
              f32(H // 2 + 2 * PAD, W // 2 + 2 * PAD),
              f32(H // 2 + 2 * PAD, W // 2 + 2 * PAD))
    t_intra = timeit(intra_reconstruct, planes, res_y, res_c, kind,
                     i16m, i4m, cm, av, av, gw=gw, gh=gh, n=3)

    nnz = f32(4 * gh, 4 * gw) % 3
    mvg = f32(4 * gh, 4 * gw, 2) % 16 - 8
    refg = jnp.zeros((4 * gh, 4 * gw), jnp.int32)
    tmask = jnp.ones((gh, gw), bool)
    intra_m = jnp.zeros((gh, gw), bool)

    @jax.jit
    def db(planes, nnz, mvg, refg):
        bs_v, bs_h = compute_bs(intra_m, nnz, mvg, refg, tmask, tmask,
                                tmask)
        qp_l = qp
        qpc = qp
        return deblock_frame(planes, bs_v, bs_h, qp, qp_l, qp_l, qpc,
                             qpc, qpc, jnp.zeros((gh, gw), jnp.int32),
                             jnp.zeros((gh, gw), jnp.int32), gw=gw, gh=gh)
    t_db = timeit(db, planes, nnz, mvg, refg, n=3)

    print(f"{label}: residuals {t_res:.1f} ms, inter {t_inter:.1f} ms, "
          f"intra_wavefront {t_intra:.1f} ms, deblock {t_db:.1f} ms")


def main():
    print("backend:", jax.devices())
    run(22, 18, "CIF  ")
    run(80, 45, "720p ")
    pass


if __name__ == "__main__":
    main()
