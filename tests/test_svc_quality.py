"""SVC quality scalability (quality_id > 0): transform-coefficient
refinement (G.8.5.1 family).

The encoder emits, per picture, a quality_id=1 NAL whose P slices carry
refinement levels quantized at qp - quality_qp_delta; the decoder
accumulates them with the quality-base picture's levels BEFORE the
inverse transform (sTCoeff, G-127..G-130 with
tcoeff_level_prediction_flag = 0 — reference
hl_codec_264_decode_svc.c:92-146 refinement-process family).  IDR
pictures refine pixel-domain as same-res I_BL.

Oracle situation: the reference decoder drops quality_id>0 NAL units
and emits the base representation (verified: byte-exact base output on
our quality streams — which also pins that the refinement NALs do not
corrupt base decode).  The refinement math itself is pinned by decode
== encoder-recon bit-exactness, the SVC suite's established strategy.
"""
import pathlib
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

W, H, NF = 176, 144, 4


def _clip():
    import bench
    return bench.make_clip(W, H, NF)


def _encode(deblock=True, qp=32, delta=6):
    from hartallo_tpu.api import Codec, CodecConfig
    from hartallo_tpu.decode.intra_recon import PAD
    cfg = CodecConfig(width=W, height=H, qp=qp, gop_size=NF,
                      deblock=deblock, me_range=8,
                      quality_layers=2, quality_qp_delta=delta)
    enc = Codec(cfg)
    clip = _clip()
    stream = b""
    recs = []
    for i in range(NF):
        r = enc.encode(clip[i], W, H)
        stream += r.headers + r.data
        qe = enc._encoder.qenc
        planes = [np.asarray(p)[PAD:-PAD, PAD:-PAD]
                  for p in qe._ref_planes]
        recs.append(np.concatenate([p.ravel() for p in planes])
                    .astype(np.uint8))
    return stream, recs


def _psnr(a, b):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 10 * np.log10(255 * 255 / max(mse, 1e-9))


def test_quality_refinement_round_trip():
    from hartallo_tpu.api import Codec, CodecConfig
    stream, recs = _encode(deblock=True)
    out = Codec(CodecConfig()).decode_annexb(stream, tolerant=False)
    q0 = [f for f in out if f.dqid == 0]
    q1 = [f for f in out if f.dqid == 1]
    assert len(q0) == NF and len(q1) == NF
    clip = _clip()
    for i in range(NF):
        assert (np.asarray(q1[i].frame, np.uint8) == recs[i]).all(), i
        # the refinement must actually refine
        assert _psnr(q1[i].frame, clip[i]) > _psnr(q0[i].frame,
                                                   clip[i]) + 0.5


def test_quality_base_extraction():
    """dqid_max=0 decodes only the base representation."""
    from hartallo_tpu.api import Codec, CodecConfig
    stream, _ = _encode(deblock=True)
    out = Codec(CodecConfig(dqid_max=0)).decode_annexb(stream,
                                                       tolerant=False)
    assert len(out) == NF and all(f.dqid == 0 for f in out)


def test_quality_stream_base_layer_reference_compatible(ref_driver,
                                                        tmp_path):
    """The reference decoder must decode the base representation of a
    quality stream byte-exactly (it drops quality_id>0 NALs)."""
    from hartallo_tpu.api import Codec, CodecConfig
    stream, _ = _encode(deblock=False)
    (tmp_path / "q.264").write_bytes(stream)
    subprocess.run([ref_driver, "decode", str(tmp_path / "q.264"),
                    str(tmp_path / "r.yuv"), "1"], check=True,
                   capture_output=True, timeout=300,
                   env={"REF_NO_SIMD": "1", "PATH": "/usr/bin:/bin"})
    ref = (tmp_path / "r.yuv").read_bytes()
    out = Codec(CodecConfig()).decode_annexb(stream, tolerant=False)
    base = b"".join(bytes(np.asarray(f.frame, np.uint8))
                    for f in out if f.dqid == 0)
    assert ref == base


def test_accumulation_differs_from_pixel_sum():
    """The coefficient-domain accumulation is a real code path: one
    IDCT of summed coefficients differs from summed per-layer IDCTs on
    rounding, so verify the helper against a direct computation."""
    from hartallo_tpu.decode.d_pool import (_dequant_np, _idct_np,
                                            accumulated_residual_planes_np)
    rng = np.random.default_rng(3)
    gh, gw = 2, 3
    lac0 = rng.integers(-8, 9, (gh, gw, 16, 4, 4)).astype(np.int32)
    lac1 = rng.integers(-8, 9, (gh, gw, 16, 4, 4)).astype(np.int32)
    cac0 = np.zeros((gh, gw, 2, 4, 4, 4), np.int32)
    cac1 = np.zeros((gh, gw, 2, 4, 4, 4), np.int32)
    cdc0 = np.zeros((gh, gw, 2, 2, 2), np.int32)
    cdc1 = np.zeros((gh, gw, 2, 2, 2), np.int32)
    qp0 = np.full((gh, gw), 30, np.int32)
    qp1 = np.full((gh, gw), 24, np.int32)
    ry, _, _ = accumulated_residual_planes_np(
        (lac0, cac0, cdc0, qp0), (lac1, cac1, cdc1, qp1), 0)
    n = gh * gw
    d = _dequant_np(lac0.reshape(n, 16, 4, 4),
                    qp0.reshape(n)[:, None]) + \
        _dequant_np(lac1.reshape(n, 16, 4, 4), qp1.reshape(n)[:, None])
    r = _idct_np(d)
    # spot-check one block
    assert np.array_equal(ry[:4, :4], r[0, 0])
