"""Quick decode-only bench on the current backend (CIF + 720p)."""
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
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("backend:", jax.devices())

    from hartallo_tpu.api import Codec, CodecConfig

    for name, W, H, NF in (("cif", 352, 288, 16), ("720p", 1280, 720, 8)):
        clip = make_clip(W, H, NF)
        enc = Codec(CodecConfig(width=W, height=H, qp=30, gop_size=NF,
                                deblock=True, me_range=12))
        results = enc.encode_frames(clip, W, H)
        stream = b"".join(r.headers + r.data for r in results)
        # warmup decode (compile)
        Codec(CodecConfig()).decode_annexb(stream)
        for trial in range(2):
            dec = Codec(CodecConfig())
            t0 = time.perf_counter()
            out = dec.decode_annexb(stream)
            dt = time.perf_counter() - t0
            assert len(out) == NF
            print(f"{name}: decode {NF/dt:.1f} fps ({1e3*dt/NF:.2f} "
                  f"ms/frame)")


if __name__ == "__main__":
    main()
