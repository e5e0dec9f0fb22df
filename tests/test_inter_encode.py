"""IPPP encoder end-to-end: full-search ME + sub-pel refinement +
partitions + skip.  Stream must decode bit-identically in our decoder and
the reference decoder, and reach reference-competitive PSNR/bits."""
import math
import os
import subprocess

import numpy as np
import pytest

from hartallo_tpu.api import Codec, CodecConfig

REF_ENV = dict(os.environ, REF_NO_SIMD="1")

W, H, NF = 176, 144, 5


def _clip():
    rng = np.random.default_rng(44)
    frames = []
    for t in range(NF):
        x = np.arange(W)[None, :]
        y = np.arange(H)[:, None]
        Y = ((x * 2 + y * 3) % 256).astype(np.int32)
        cx, cy = 30 + 7 * t, 40 + 4 * t
        Y[cy:cy + 30, cx:cx + 30] = 220
        Y = np.clip(Y + rng.integers(0, 8, (H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 100) + \
            rng.integers(0, 8, (H // 2, W // 2))
        V = np.full((H // 2, W // 2), 150) + \
            rng.integers(0, 8, (H // 2, W // 2))
        frames.append((Y.astype(np.uint8), U.astype(np.uint8),
                       V.astype(np.uint8)))
    return frames


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * math.log10(255 * 255 / mse) if mse else 99.0


@pytest.fixture(scope="module", params=[(30, True), (30, False)],
                ids=["qp30-db", "qp30-nodb"])
def my_stream(request):
    qp, deblock = request.param
    cfg = CodecConfig(width=W, height=H, qp=qp, gop_size=NF,
                      deblock=deblock, me_range=12)
    codec = Codec(cfg)
    out = b""
    for (Y, U, V) in _clip():
        frame = np.concatenate([Y.ravel(), U.ravel(), V.ravel()])
        r = codec.encode(frame, W, H)
        out += r.headers + r.data
    return out, qp


def test_self_decode_and_psnr(my_stream):
    stream, qp = my_stream
    dec = Codec(CodecConfig())
    results = dec.decode_annexb(stream)
    assert len(results) == NF
    clip = _clip()
    for i, res in enumerate(results):
        Y, U, V = clip[i]
        src = np.concatenate([Y.ravel(), U.ravel(), V.ravel()])
        p = _psnr(src, res.frame)
        assert p > 32.0, f"frame {i}: PSNR {p:.2f} too low"


def test_reference_decodes_our_p_stream(my_stream, ref_driver, tmp_path):
    stream, qp = my_stream
    inp = tmp_path / "mine.264"
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
            f"frame {i}: our decode != reference decode of our stream"


def test_rd_vs_reference_encoder(my_stream, ref_driver, tmp_path):
    stream, qp = my_stream
    clip = _clip()
    raw = b"".join(np.concatenate([Y.ravel(), U.ravel(), V.ravel()])
                   .tobytes() for (Y, U, V) in clip)
    (tmp_path / "in.yuv").write_bytes(raw)
    ref264 = tmp_path / "ref.264"
    subprocess.run([ref_driver, "encode", str(tmp_path / "in.yuv"),
                    str(W), str(H), str(ref264), str(qp), str(NF), str(NF),
                    "1", "12", "1"],
                   check=True, capture_output=True, timeout=300)
    refyuv = tmp_path / "refdec.yuv"
    subprocess.run([ref_driver, "decode", str(ref264), str(refyuv), "1"],
                   check=True, env=REF_ENV, capture_output=True, timeout=300)
    refdec = refyuv.read_bytes()
    fsz = W * H * 3 // 2
    dec = Codec(CodecConfig())
    results = dec.decode_annexb(stream)
    psnr_mine, psnr_ref = [], []
    for i, res in enumerate(results):
        Y, U, V = clip[i]
        src = np.concatenate([Y.ravel(), U.ravel(), V.ravel()])
        psnr_mine.append(_psnr(src, res.frame))
        psnr_ref.append(_psnr(
            src, np.frombuffer(refdec[i * fsz:(i + 1) * fsz], np.uint8)))
    my_bits = len(stream) * 8
    ref_bits = ref264.stat().st_size * 8
    pm, pr = np.mean(psnr_mine), np.mean(psnr_ref)
    print(f"\nIPPP PSNR mine {pm:.2f} dB ({my_bits} b) vs "
          f"ref {pr:.2f} dB ({ref_bits} b)")
    assert pm > pr - 1.2
    assert my_bits < ref_bits * 1.6


def test_single_coefficient_elimination():
    """JVT-O079 2.3 (reference hl_codec_264_residual.c:881-897 +
    rdo.c:2419,2641): an inter MB whose luma residual sums to
    significance < 6 drops it entirely; a chroma component holding one
    lone |level|==1 AC coefficient drops that too."""
    import jax.numpy as jnp
    import numpy as np
    from hartallo_tpu.encode.p_device import (
        eliminate_single_coeffs_chroma, eliminate_single_coeffs_luma)

    wq = np.zeros((1, 3, 16, 4, 4), np.int32)
    # MB 0: one lone +1 at scan pos 0 -> ctr 3 < 6 -> dropped
    wq[0, 0, 5, 0, 0] = 1
    # MB 1: two lone 1s at scan pos 0 (3+3=6) -> kept
    wq[0, 1, 2, 0, 0] = 1
    wq[0, 1, 9, 0, 0] = -1
    # MB 2: one block with a |level|==2 -> ctr 9 -> kept
    wq[0, 2, 7, 0, 1] = 2
    out = np.asarray(eliminate_single_coeffs_luma(jnp.asarray(wq)))
    assert not out[0, 0].any()
    assert np.array_equal(out[0, 1], wq[0, 1])
    assert np.array_equal(out[0, 2], wq[0, 2])

    acq = np.zeros((1, 2, 2, 4, 4, 4), np.int32)
    acq[0, 0, 0, 1, 0, 1] = 1          # lone |1| -> dropped
    acq[0, 0, 1, 0, 0, 1] = 2          # lone |2| -> kept
    acq[0, 1, 0, 0, 0, 1] = 1          # two coeffs -> kept
    acq[0, 1, 0, 2, 1, 0] = 1
    co = np.asarray(eliminate_single_coeffs_chroma(jnp.asarray(acq)))
    assert not co[0, 0, 0].any()
    assert np.array_equal(co[0, 0, 1], acq[0, 0, 1])
    assert np.array_equal(co[0, 1, 0], acq[0, 1, 0])
