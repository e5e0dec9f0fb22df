"""Per-stage profile of the CIF decode/encode paths on the current backend.

Separates: host CAVLC parse, host array prep, device program time, and
transfer/fetch — the numbers that steer the perf work (VERDICT item 2).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_clip(W, H, NF):
    rng = np.random.default_rng(2)
    frames = []
    x = np.arange(W)[None, :]
    y = np.arange(H)[:, None]
    for t in range(NF):
        Y = ((x * 2 + y * 3) % 256).astype(np.int32)
        Y[40 + 4 * t:100 + 4 * t, 60 + 6 * t:140 + 6 * t] = 210
        Y = np.clip(Y + rng.integers(0, 8, (H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 100) + rng.integers(0, 8, (H // 2, W // 2))
        V = np.full((H // 2, W // 2), 150) + rng.integers(0, 8, (H // 2, W // 2))
        frames.append(np.concatenate([Y.astype(np.uint8).ravel(),
                                      U.astype(np.uint8).ravel(),
                                      V.astype(np.uint8).ravel()]))
    return frames


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("backend:", jax.devices())

    from hartallo_tpu.api import Codec, CodecConfig

    W, H, NF = 352, 288, 16
    clip = make_clip(W, H, NF)

    # ---- encode ----
    enc = Codec(CodecConfig(width=W, height=H, qp=30, gop_size=NF,
                            deblock=True, me_range=12))
    enc.encode_frames(clip[:2], W, H)     # warmup/compile
    enc2 = Codec(CodecConfig(width=W, height=H, qp=30, gop_size=NF,
                             deblock=True, me_range=12))
    t0 = time.perf_counter()
    results = enc2.encode_frames(clip, W, H)
    t_enc = time.perf_counter() - t0
    stream = b"".join(r.headers + r.data for r in results)
    print(f"encode: {NF / t_enc:.2f} fps  ({1e3 * t_enc / NF:.1f} ms/frame)"
          f"  stream {len(stream)} B")

    # encode: dispatch-only vs finish
    enc3 = Codec(CodecConfig(width=W, height=H, qp=30, gop_size=NF,
                             deblock=True, me_range=12))
    enc3.encode(clip[0], W, H)
    e = enc3._encoder
    t0 = time.perf_counter()
    pends = [e.encode_frame_async(f, W, H) for f in clip]
    t_disp = time.perf_counter() - t0
    import jax
    jax.block_until_ready([p["packed"] for p in pends])
    t_dev = time.perf_counter() - t0
    t1 = time.perf_counter()
    outs = [e.finish_frame(p) for p in pends]
    t_fin = time.perf_counter() - t1
    print(f"  dispatch all: {1e3 * t_disp:.1f} ms   device done: "
          f"{1e3 * t_dev:.1f} ms   finish(host pack): {1e3 * t_fin:.1f} ms")

    # ---- decode ----
    dec = Codec(CodecConfig())
    dec.decode_annexb(stream)             # warmup/compile

    dec2 = Codec(CodecConfig())
    t0 = time.perf_counter()
    out = dec2.decode_annexb(stream)
    t_dec = time.perf_counter() - t0
    assert len(out) == NF
    print(f"decode: {NF / t_dec:.2f} fps  ({1e3 * t_dec / NF:.1f} ms/frame)")

    # decode: split host parse vs device
    from hartallo_tpu.bitio import find_nal_units
    from hartallo_tpu.decode.decoder import Decoder

    d = Decoder()
    nals = [stream[s:e0] for s, e0 in find_nal_units(stream)]
    # parse-only timing: run the host slice parse without reconstruct
    import hartallo_tpu.decode.decoder as DM

    d2 = Decoder()
    orig = DM.Decoder._reconstruct
    times = {"parse": 0.0}

    def fake_reconstruct(self, sps, pps, sh, nh, sd, layer, dqid):
        # skip device work; return a fake frame
        return np.zeros(W * H * 3 // 2, np.uint8), 0
    DM.Decoder._reconstruct = fake_reconstruct
    t0 = time.perf_counter()
    for nb in nals:
        try:
            d2.decode_nal_deferred(nb)
        except Exception:
            pass
    t_parse = time.perf_counter() - t0
    DM.Decoder._reconstruct = orig
    print(f"  host parse only: {1e3 * t_parse / NF:.2f} ms/frame "
          f"({NF / t_parse:.1f} fps equivalent)")

    d3 = Decoder()
    t0 = time.perf_counter()
    rs = []
    for nb in nals:
        r = d3.decode_nal_deferred(nb)
        if r.frame is not None:
            rs.append(r)
    t_disp = time.perf_counter() - t0
    jax.block_until_ready([r.frame.out_u8 for r in rs
                           if hasattr(r.frame, "out_u8")])
    t_dev = time.perf_counter() - t0
    t1 = time.perf_counter()
    for r in rs:
        DM._materialize(r)
    t_mat = time.perf_counter() - t1
    print(f"  dispatch all: {1e3 * t_disp:.1f} ms   device done: "
          f"{1e3 * t_dev:.1f} ms   materialize: {1e3 * t_mat:.1f} ms")


if __name__ == "__main__":
    main()
