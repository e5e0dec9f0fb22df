"""Microbench decode_gop: separate device-compute time from transfer time.

Encodes a CIF (or 720p with --720p) clip, captures the packed GOP inputs
by instrumenting Decoder._flush, then times:
  - upload:   host->device of the packed batch
  - compute:  decode_gop until ring ready (no output fetch)
  - fetch:    device->host of the batch output
Repeats the jitted call on the SAME inputs so tunnel dispatch latency is
amortized and visible separately.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("HARTALLO_FAST_DECODE", "0")   # capture XLA-path buffers


def make_clip(W, H, NF):
    rng = np.random.default_rng(2)
    frames = []
    x = np.arange(W)[None, :]
    y = np.arange(H)[:, None]
    for t in range(NF):
        Y = ((x * 2 + y * 3) % 256).astype(np.int32)
        Y[40 + 4 * t:100 + 4 * t, 60 + 6 * t:140 + 6 * t] = 210
        Y = np.clip(Y + rng.integers(0, 8, (H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 100) + rng.integers(
            0, 8, (H // 2, W // 2))
        V = np.full((H // 2, W // 2), 150) + rng.integers(
            0, 8, (H // 2, W // 2))
        frames.append(np.concatenate([Y.astype(np.uint8).ravel(),
                                      U.astype(np.uint8).ravel(),
                                      V.astype(np.uint8).ravel()]))
    return frames


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("backend:", jax.devices())

    from hartallo_tpu.api import Codec, CodecConfig
    import hartallo_tpu.decode.decoder as DM
    from hartallo_tpu.decode.d_gop import decode_gop, ring_shapes

    if "--720p" in sys.argv:
        W, H, NF = 1280, 720, 8
    else:
        W, H, NF = 352, 288, 16
    clip = make_clip(W, H, NF)
    enc = Codec(CodecConfig(width=W, height=H, qp=30, gop_size=NF,
                            deblock=True, me_range=12))
    stream = b"".join(r.headers + r.data
                      for r in enc.encode_frames(clip, W, H))

    # capture flush inputs
    captured = []
    orig_flush = DM.Decoder._flush

    def cap_flush(self, layer):
        if layer.jobs:
            captured.append((list(layer.jobs), layer.ring_key))
        return orig_flush(self, layer)
    DM.Decoder._flush = cap_flush
    try:
        dec = Codec(CodecConfig())
        out = dec.decode_annexb(stream)
    finally:
        DM.Decoder._flush = orig_flush
    assert len(out) == NF

    jobs, ring_key = captured[0]
    gw, gh, S, cqoff = ring_key
    K = len(jobs)
    print(f"batch K={K} gw={gw} gh={gh} S={S}")
    packed = np.stack([j.packed for j in jobs])
    wslot = np.array([j.wslot for j in jobs], np.int32)
    hintra = np.array([j.has_intra for j in jobs], bool)
    shY, shU, shV = ring_shapes(gw, gh, S)
    ring = (jnp.zeros(shY, jnp.int32), jnp.zeros(shU, jnp.int32),
            jnp.zeros(shV, jnp.int32))

    dp = jnp.asarray(packed)
    dw = jnp.asarray(wslot)
    dh = jnp.asarray(hintra)
    # warmup/compile
    outs, rY, rU, rV = decode_gop(dp, dw, dh, *ring, gw=gw, gh=gh,
                                  chroma_qp_off=cqoff)
    jax.block_until_ready((outs, rY, rU, rV))

    N = 10
    # upload time
    t0 = time.perf_counter()
    for _ in range(N):
        dp2 = jax.device_put(packed)
        dp2.block_until_ready()
    t_up = (time.perf_counter() - t0) / N
    # compute (ring ready, outs not fetched)
    t0 = time.perf_counter()
    for _ in range(N):
        outs, rY, rU, rV = decode_gop(dp, dw, dh, *ring, gw=gw, gh=gh,
                                      chroma_qp_off=cqoff)
        jax.block_until_ready(rY)
    t_comp = (time.perf_counter() - t0) / N
    # fetch
    t0 = time.perf_counter()
    for _ in range(N):
        _ = np.asarray(outs)
    t_fetch = (time.perf_counter() - t0) / N
    print(f"upload {1e3*t_up:.1f} ms/batch ({1e3*t_up/K:.2f}/f)  "
          f"compute {1e3*t_comp:.1f} ms/batch ({1e3*t_comp/K:.2f}/f)  "
          f"fetch {1e3*t_fetch:.1f} ms/batch ({1e3*t_fetch/K:.2f}/f)")
    print(f"packed {packed.nbytes/1e6:.2f} MB  out {np.asarray(outs).nbytes/1e6:.2f} MB")


if __name__ == "__main__":
    main()
