"""End-to-end I-frame decode WITH in-loop deblocking: bit-exact vs the
reference decoder (exercises bS 3/4, strong+weak filters, alpha/beta/tc0)."""
import os
import subprocess

REF_ENV = dict(os.environ, REF_NO_SIMD="1")

import numpy as np
import pytest

from hartallo_tpu.api import Codec, CodecConfig


@pytest.fixture(scope="module")
def ref_deblock_stream(ref_driver, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dbdec")
    W, H, NF = 176, 144, 2
    rng = np.random.default_rng(31)
    frames = []
    for t in range(NF):
        x = np.arange(W)[None, :]
        y = np.arange(H)[:, None]
        Y = ((x * 5 + y * 3 + 11 * t) % 256).astype(np.int32)
        Y[30:100, 40:140] = 60  # flat region -> deblock activates
        Y = np.clip(Y + rng.integers(0, 6, size=(H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 110) + \
            rng.integers(0, 8, size=(H // 2, W // 2))
        V = np.full((H // 2, W // 2), 140) + \
            rng.integers(0, 8, size=(H // 2, W // 2))
        frames += [Y.astype(np.uint8).tobytes(),
                   U.astype(np.uint8).tobytes(),
                   V.astype(np.uint8).tobytes()]
    yuv = tmp / "in.yuv"
    yuv.write_bytes(b"".join(frames))
    out264 = tmp / "out.264"
    subprocess.run([ref_driver, "encode", str(yuv), str(W), str(H),
                    str(out264), "36", "1", str(NF), "1", "16", "1"],
                   check=True, capture_output=True, timeout=300)
    refyuv = tmp / "ref.yuv"
    subprocess.run([ref_driver, "decode", str(out264), str(refyuv), "1"],
                   check=True, env=REF_ENV, capture_output=True, timeout=300)
    return out264.read_bytes(), refyuv.read_bytes(), W, H, NF


def test_deblock_decode_bit_exact(ref_deblock_stream):
    stream, refyuv, W, H, NF = ref_deblock_stream
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
