"""End-to-end I-frame decode: bit-exact against the reference decoder's
output on a reference-encoded stream (deblocking off).  This is the
"minimum end-to-end slice" milestone of SURVEY.md §7 step 3."""
import pathlib
import os
import subprocess

REF_ENV = dict(os.environ, REF_NO_SIMD="1")

import numpy as np
import pytest

from hartallo_tpu.api import Codec, CodecConfig


@pytest.fixture(scope="module")
def ref_intra_stream(ref_driver, tmp_path_factory):
    """Reference-encoded all-intra QCIF stream with deblocking disabled,
    plus the reference decoder's YUV output."""
    tmp = tmp_path_factory.mktemp("intradec")
    W, H, NF = 176, 144, 3
    rng = np.random.default_rng(9)
    frames = []
    for t in range(NF):
        x = np.arange(W)[None, :]
        y = np.arange(H)[:, None]
        Y = ((x * 3 + y * 2 + 7 * t) % 256).astype(np.int32)
        Y[40:80, 30 + 5 * t:90 + 5 * t] = 210
        Y = np.clip(Y + rng.integers(0, 16, size=(H, W)), 0, 255)
        U = ((x[:, ::2][: H // 2 * 0 + H // 2 or None] if False else
              np.full((H // 2, W // 2), 0)) + 90 +
             rng.integers(0, 30, size=(H // 2, W // 2)))
        V = np.full((H // 2, W // 2), 150) + \
            rng.integers(0, 20, size=(H // 2, W // 2))
        frames += [Y.astype(np.uint8).tobytes(),
                   U.astype(np.uint8).tobytes(),
                   V.astype(np.uint8).tobytes()]
    yuv = tmp / "in.yuv"
    yuv.write_bytes(b"".join(frames))
    out264 = tmp / "out.264"
    # gop_size=1 -> all-intra; deblock=0
    subprocess.run([ref_driver, "encode", str(yuv), str(W), str(H),
                    str(out264), "28", "1", str(NF), "1", "16", "0"],
                   check=True, capture_output=True, timeout=300)
    refyuv = tmp / "ref.yuv"
    subprocess.run([ref_driver, "decode", str(out264), str(refyuv), "1"],
                   check=True, env=REF_ENV, capture_output=True, timeout=300)
    return out264.read_bytes(), refyuv.read_bytes(), W, H, NF


def test_intra_decode_bit_exact(ref_intra_stream):
    stream, refyuv, W, H, NF = ref_intra_stream
    codec = Codec(CodecConfig())
    results = codec.decode_annexb(stream)
    assert len(results) == NF
    fsz = W * H * 3 // 2
    assert len(refyuv) == fsz * NF
    for i, res in enumerate(results):
        assert res.width == W and res.height == H
        mine = res.frame
        ref = np.frombuffer(refyuv[i * fsz:(i + 1) * fsz], np.uint8)
        ysz = W * H
        if not np.array_equal(mine, ref):
            dy = np.abs(mine[:ysz].astype(int) - ref[:ysz].astype(int))
            bad = np.nonzero(dy.reshape(H, W))
            raise AssertionError(
                f"frame {i}: {np.count_nonzero(dy)} luma mismatches, "
                f"max {dy.max()}, first at {bad[0][:5], bad[1][:5]}; "
                f"chroma diff "
                f"{np.count_nonzero(mine[ysz:] != ref[ysz:])}")
