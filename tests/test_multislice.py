"""Multi-slice encode: N contiguous MB-row slices per frame, each an
independent NAL with its own header/entropy state (the reference's
slice-parallel encode design, hl_codec_264_encode.c:479-524).

The stream must decode identically in our decoder and the reference
decoder, proving the per-slice prediction-reset rules (intra availability,
nC derivation, MV prediction, skip runs) are spec-correct."""
import math
import os
import subprocess

import numpy as np
import pytest

from hartallo_tpu.api import Codec, CodecConfig

REF_ENV = dict(os.environ, REF_NO_SIMD="1")

W, H, NF = 176, 144, 4


def _clip():
    rng = np.random.default_rng(7)
    frames = []
    for t in range(NF):
        x = np.arange(W)[None, :]
        y = np.arange(H)[:, None]
        Y = ((x * 3 + y * 2) % 256).astype(np.int32)
        cy, cx = 20 + 6 * t, 30 + 8 * t
        Y[cy:cy + 40, cx:cx + 40] = 35
        Y = np.clip(Y + rng.integers(0, 10, (H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 90) + \
            rng.integers(0, 10, (H // 2, W // 2))
        V = np.full((H // 2, W // 2), 160) + \
            rng.integers(0, 10, (H // 2, W // 2))
        frames.append((Y.astype(np.uint8), U.astype(np.uint8),
                       V.astype(np.uint8)))
    return frames


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * math.log10(255 * 255 / mse) if mse else 99.0


@pytest.fixture(scope="module", params=[(3, 1), (4, 4)],
                ids=["slices3", "slices4-mt"])
def ms_stream(request):
    nslices, threads = request.param
    cfg = CodecConfig(width=W, height=H, qp=30, gop_size=NF, deblock=True,
                      me_range=12, slices=nslices, threads=threads)
    codec = Codec(cfg)
    out = b""
    for (Y, U, V) in _clip():
        frame = np.concatenate([Y.ravel(), U.ravel(), V.ravel()])
        r = codec.encode(frame, W, H)
        out += r.headers + r.data
    return out, nslices


def test_slice_nal_count(ms_stream):
    stream, nslices = ms_stream
    from hartallo_tpu.api import Parser
    kinds = []
    for s, e in Parser.find_nal_units(stream):
        kinds.append(stream[s] & 0x1F)
    # NF frames x nslices slice NALs (+ SPS/PPS)
    assert kinds.count(5) == nslices            # IDR slices
    assert kinds.count(1) == (NF - 1) * nslices  # P slices


def test_self_decode_psnr(ms_stream):
    stream, _ = ms_stream
    dec = Codec(CodecConfig())
    results = dec.decode_annexb(stream)
    assert len(results) == NF
    for i, res in enumerate(results):
        Y, U, V = _clip()[i]
        src = np.concatenate([Y.ravel(), U.ravel(), V.ravel()])
        p = _psnr(src, res.frame)
        assert p > 32.0, f"frame {i}: PSNR {p:.2f}"


def test_reference_decodes_multislice(ms_stream, ref_driver, tmp_path):
    stream, _ = ms_stream
    inp = tmp_path / "ms.264"
    inp.write_bytes(stream)
    out = tmp_path / "out.yuv"
    subprocess.run([ref_driver, "decode", str(inp), str(out), "1"],
                   check=True, env=REF_ENV, capture_output=True,
                   timeout=300)
    refdec = out.read_bytes()
    fsz = W * H * 3 // 2
    assert len(refdec) == fsz * NF, \
        f"reference decoded {len(refdec) // fsz} frames"
    dec = Codec(CodecConfig())
    results = dec.decode_annexb(stream)
    for i, res in enumerate(results):
        ref = np.frombuffer(refdec[i * fsz:(i + 1) * fsz], np.uint8)
        assert np.array_equal(res.frame, ref), \
            f"frame {i}: our decode != reference decode"
