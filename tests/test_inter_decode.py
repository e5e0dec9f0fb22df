"""End-to-end IPPP decode: bit-exact vs the reference decoder on a
reference-encoded stream (P-skip, P partitions, quarter-pel MC, deblock,
DPB) — SURVEY.md §7 step 4."""
import os
import subprocess

REF_ENV = dict(os.environ, REF_NO_SIMD="1")

import numpy as np
import pytest

from hartallo_tpu.api import Codec, CodecConfig


def _make_clip(W, H, NF, seed):
    rng = np.random.default_rng(seed)
    frames = []
    base_x = np.arange(W)[None, :]
    base_y = np.arange(H)[:, None]
    for t in range(NF):
        Y = ((base_x * 2 + base_y * 3) % 256).astype(np.int32)
        cx, cy = 30 + 6 * t, 40 + 3 * t
        Y[cy:cy + 32, cx:cx + 32] = 220
        Y[80:, :] = (Y[80:, :] + 2 * t) % 256   # global motion region
        Y = np.clip(Y + rng.integers(0, 10, (H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 100) + \
            rng.integers(0, 10, (H // 2, W // 2))
        V = np.full((H // 2, W // 2), 150) + \
            rng.integers(0, 10, (H // 2, W // 2))
        frames += [Y.astype(np.uint8).tobytes(),
                   U.astype(np.uint8).tobytes(),
                   V.astype(np.uint8).tobytes()]
    return b"".join(frames)


@pytest.fixture(scope="module", params=[(30, 0), (30, 1), (36, 1)],
                ids=["qp30-nodb", "qp30-db", "qp36-db"])
def ref_ipp_stream(request, ref_driver, tmp_path_factory):
    qp, deblock = request.param
    tmp = tmp_path_factory.mktemp(f"ipp{qp}{deblock}")
    W, H, NF = 176, 144, 6
    (tmp / "in.yuv").write_bytes(_make_clip(W, H, NF, qp))
    out264 = tmp / "out.264"
    subprocess.run([ref_driver, "encode", str(tmp / 'in.yuv'), str(W),
                    str(H), str(out264), str(qp), "6", str(NF), "1", "16",
                    str(deblock)],
                   check=True, capture_output=True, timeout=300)
    refyuv = tmp / "ref.yuv"
    subprocess.run([ref_driver, "decode", str(out264), str(refyuv), "1"],
                   check=True, env=REF_ENV, capture_output=True, timeout=300)
    return out264.read_bytes(), refyuv.read_bytes(), W, H, NF


def test_inter_decode_bit_exact(ref_ipp_stream):
    stream, refyuv, W, H, NF = ref_ipp_stream
    codec = Codec(CodecConfig())
    results = codec.decode_annexb(stream)
    assert len(results) == NF
    fsz = W * H * 3 // 2
    ysz = W * H
    for i, res in enumerate(results):
        mine = res.frame
        ref = np.frombuffer(refyuv[i * fsz:(i + 1) * fsz], np.uint8)
        if not np.array_equal(mine, ref):
            dy = np.abs(mine[:ysz].astype(int) - ref[:ysz].astype(int))
            bad = np.nonzero(dy.reshape(H, W))
            raise AssertionError(
                f"frame {i}: {np.count_nonzero(dy)} luma diffs "
                f"max {dy.max()} first {bad[0][:6], bad[1][:6]}; chroma "
                f"{np.count_nonzero(mine[ysz:] != ref[ysz:])}")
