"""Benchmark: end-to-end encode+decode frames/s on the current chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (allweax/hartallo) measured on this container's x86
CPU, single thread, SIMD intrinsics build (BASELINE_MEASURED.md): CIF
encode 14.6 fps + decode 909 fps -> combined 1/(1/14.6 + 1/909) = 14.37
fps for the encode+decode loop benched here.
"""
import json
import os
import sys
import time

import numpy as np

W, H, NF = 352, 288, 8
QP = 30
BASELINE_COMBINED_FPS = 14.37


def make_clip():
    rng = np.random.default_rng(2)
    frames = []
    x = np.arange(W)[None, :]
    y = np.arange(H)[:, None]
    for t in range(NF):
        Y = ((x * 2 + y * 3) % 256).astype(np.int32)
        Y[40 + 4 * t:100 + 4 * t, 60 + 6 * t:140 + 6 * t] = 210
        Y = np.clip(Y + rng.integers(0, 8, (H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 100) + \
            rng.integers(0, 8, (H // 2, W // 2))
        V = np.full((H // 2, W // 2), 150) + \
            rng.integers(0, 8, (H // 2, W // 2))
        frames.append(np.concatenate([Y.astype(np.uint8).ravel(),
                                      U.astype(np.uint8).ravel(),
                                      V.astype(np.uint8).ravel()]))
    return frames


def main():
    from hartallo_tpu.api import Codec, CodecConfig

    clip = make_clip()

    def run(frames):
        enc = Codec(CodecConfig(width=W, height=H, qp=QP, gop_size=NF,
                                deblock=True, me_range=12))
        stream = b""
        t0 = time.perf_counter()
        for f in frames:
            r = enc.encode(f, W, H)
            stream += r.headers + r.data
        t_enc = time.perf_counter() - t0
        dec = Codec(CodecConfig())
        t0 = time.perf_counter()
        results = dec.decode_annexb(stream)
        t_dec = time.perf_counter() - t0
        assert len(results) == len(frames)
        return t_enc, t_dec

    run(clip[:2])                      # warmup (jit compiles)
    t_enc, t_dec = run(clip)
    fps = NF / (t_enc + t_dec)
    print(json.dumps({
        "metric": "cif_encode_decode_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_COMBINED_FPS, 4),
    }))


if __name__ == "__main__":
    main()
