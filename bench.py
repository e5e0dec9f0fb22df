"""Benchmark: encode/decode frames/s on the current chip, CIF headline +
resolution matrix.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "matrix"}.

Baselines: the reference (allweax/hartallo) measured on this container's
x86 CPU, single thread, SIMD intrinsics build (BASELINE_MEASURED.md):
  CIF   encode 14.6 fps   decode 909 fps   -> combined 14.37 fps
  720p  encode 2.86 fps   decode 56.2 fps
  1080p reference encoder/decoder cannot run this size (no baseline)
"""
import json
import os
import time

import numpy as np

QP = 30
BASELINES = {                        # (encode_fps, decode_fps) reference x86
    "cif": (14.6, 909.0),
    "720p": (2.86, 56.2),
    "1080p": (None, None),
}
SIZES = {"cif": (352, 288, 16), "720p": (1280, 720, 8),
         "1080p": (1920, 1080, 8)}
BASELINE_COMBINED_CIF = 14.37


def make_clip(W, H, NF):
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


def bench_one(W, H, NF):
    from hartallo_tpu.api import Codec, CodecConfig

    clip = make_clip(W, H, NF)

    def run(frames):
        enc = Codec(CodecConfig(width=W, height=H, qp=QP, gop_size=NF,
                                deblock=True, me_range=12))
        t0 = time.perf_counter()
        results = enc.encode_frames(frames, W, H)
        stream = b"".join(r.headers + r.data for r in results)
        t_enc = time.perf_counter() - t0
        dec = Codec(CodecConfig())
        t0 = time.perf_counter()
        out = dec.decode_annexb(stream)
        t_dec = time.perf_counter() - t0
        assert len(out) == len(frames)
        return t_enc, t_dec

    run(clip)        # warmup: full clip so every chunk/batch size compiles
    t_enc, t_dec = run(clip)
    return NF / t_enc, NF / t_dec


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    matrix = {}
    for name, (W, H, NF) in SIZES.items():
        try:
            enc_fps, dec_fps = bench_one(W, H, NF)
        except Exception as e:                      # record, don't die
            matrix[name] = {"error": str(e)[:200]}
            continue
        be, bd = BASELINES[name]
        matrix[name] = {
            "encode_fps": round(enc_fps, 2),
            "decode_fps": round(dec_fps, 2),
            "encode_vs_ref": round(enc_fps / be, 3) if be else None,
            "decode_vs_ref": round(dec_fps / bd, 3) if bd else None,
        }

    # decode a REFERENCE-encoded stream too (perf + conformance on the
    # same input the reference produces; VERDICT r2 weak item 10)
    ref_part = {}
    try:
        ref_part = bench_reference_stream()
    except Exception as e:                              # noqa: BLE001
        ref_part = {"error": str(e)[:160]}

    cif = matrix.get("cif", {})
    if "encode_fps" in cif:
        combined = 1.0 / (1.0 / cif["encode_fps"] + 1.0 / cif["decode_fps"])
    else:
        combined = 0.0
    print(json.dumps({
        "metric": "cif_encode_decode_fps",
        "value": round(combined, 3),
        "unit": "frames/s",
        "vs_baseline": round(combined / BASELINE_COMBINED_CIF, 4),
        "matrix": matrix,
        "ref_stream_decode": ref_part,
    }))


def bench_reference_stream():
    """Decode a reference-encoder CIF stream: fps + bit-exactness.
    (CIF, not 720p: the reference decoder segfaults on its own 720p
    output — both SIMD and portable paths.)"""
    import pathlib
    import subprocess
    import tempfile

    from hartallo_tpu.api import Codec, CodecConfig

    rd = pathlib.Path(__file__).parent / ".refbuild" / "ref_driver"
    if not rd.exists():
        return {"skipped": "reference oracle not built"}
    W, H, NF = 352, 288, 16
    clip = make_clip(W, H, NF)
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        raw = b"".join(bytes(f) for f in clip)
        (td / "in.yuv").write_bytes(raw)
        subprocess.run([str(rd), "encode", str(td / "in.yuv"), str(W),
                        str(H), str(td / "out.264"), str(QP), str(NF),
                        str(NF), "1", "16", "1"], check=True,
                       capture_output=True, timeout=600)
        stream = (td / "out.264").read_bytes()
        subprocess.run([str(rd), "decode", str(td / "out.264"),
                        str(td / "ref.yuv"), "1"], check=True,
                       capture_output=True, timeout=600,
                       env=dict(os.environ, REF_NO_SIMD="1"))
        ref = np.frombuffer((td / "ref.yuv").read_bytes(), np.uint8)
    Codec(CodecConfig()).decode_annexb(stream)      # warmup
    dec = Codec(CodecConfig())
    t0 = time.perf_counter()
    out = dec.decode_annexb(stream)
    dt = time.perf_counter() - t0
    got = np.concatenate([r.frame for r in out])
    return {"decode_fps": round(NF / dt, 2),
            "bit_exact_vs_reference": bool(np.array_equal(ref, got))}


if __name__ == "__main__":
    main()
