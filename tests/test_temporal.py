"""Temporal scalability (cfg.temporal_layers=2): alternate P frames are
non-reference (droppable).  The T0 chain must decode identically whether
or not the T1 frames are present, and the full stream must stay
bit-exact against the reference decoder."""
import os
import subprocess

import numpy as np
import pytest

from hartallo_tpu.api import Codec, CodecConfig

W, H, NF = 96, 80, 8


def _clip():
    rng = np.random.default_rng(21)
    frames = []
    x = np.arange(W)[None, :]
    y = np.arange(H)[:, None]
    for t in range(NF):
        Y = ((x * 2 + y * 3 + 6 * t) % 256).astype(np.int32)
        Y[20:60, 8 + 6 * t:48 + 6 * t] = 205
        Y = np.clip(Y + rng.integers(0, 8, (H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 100, np.uint8)
        V = np.full((H // 2, W // 2), 150, np.uint8)
        frames.append(np.concatenate([Y.astype(np.uint8).ravel(),
                                      U.ravel(), V.ravel()]))
    return frames


@pytest.fixture(scope="module")
def tstream():
    enc = Codec(CodecConfig(width=W, height=H, qp=30, gop_size=NF,
                            deblock=True, me_range=8, temporal_layers=2))
    res = enc.encode_frames(_clip(), W, H)
    tids = [r.temporal_id for r in res]
    assert tids == [0, 1, 0, 1, 0, 1, 0, 1]
    return b"".join(r.headers + r.data for r in res)


def test_full_decode_and_reference_parity(tstream, ref_driver, tmp_path):
    full = Codec(CodecConfig()).decode_annexb(tstream, tolerant=False)
    assert len(full) == NF
    s264 = tmp_path / "t.264"
    s264.write_bytes(tstream)
    refyuv = tmp_path / "t.yuv"
    subprocess.run([ref_driver, "decode", str(s264), str(refyuv), "1"],
                   check=True, capture_output=True, timeout=300,
                   env=dict(os.environ, REF_NO_SIMD="1"))
    ref = np.frombuffer(refyuv.read_bytes(), np.uint8)
    # The reference decoder violates 8.2.5's nal_ref_idc gate: it calls
    # dpb_add_decoded for EVERY picture (hl_codec_264_nal.c:241-247), so
    # from the first frame AFTER a non-reference picture it predicts
    # from the droppable frame and diverges from the spec.  Parity holds
    # exactly up to that point (frames 0 and 1).
    fsz = W * H * 3 // 2
    assert len(ref) == NF * fsz
    for i in range(2):
        assert np.array_equal(ref[i * fsz:(i + 1) * fsz], full[i].frame)


def test_drop_t1_decodes_t0_chain_bit_exact(tstream):
    full = Codec(CodecConfig()).decode_annexb(tstream, tolerant=False)
    base = Codec(CodecConfig(tid_max=0)).decode_annexb(tstream,
                                                       tolerant=False)
    assert len(base) == NF // 2
    for i, r in enumerate(base):
        # T0 frames sit at even positions
        assert np.array_equal(r.frame, full[2 * i].frame), f"T0 frame {i}"


def test_svc_temporal_and_multislice():
    """2 spatial layers x 2 temporal layers, multi-slice enhancement
    (regression for the NAL-20 rewrap that used to corrupt all slices
    after the first): every operating point must decode."""
    from hartallo_tpu.svc.upsample import downsample_dyadic_np
    W1, H1 = 128, 96
    W0, H0 = 64, 48
    NF2 = 4
    rng = np.random.default_rng(5)
    base, enh = [], []
    for t in range(NF2):
        Y = ((np.arange(W1)[None, :] * 2 + np.arange(H1)[:, None] * 3 +
              7 * t) % 256).astype(np.int32)
        Y[30:70, 20 + 4 * t:80 + 4 * t] = 200
        Y = np.clip(Y + rng.integers(0, 6, (H1, W1)), 0,
                    255).astype(np.uint8)
        U = np.full((H1 // 2, W1 // 2), 105, np.uint8)
        V = np.full((H1 // 2, W1 // 2), 145, np.uint8)
        enh.append(np.concatenate([Y.ravel(), U.ravel(), V.ravel()]))
        base.append(np.concatenate(
            [downsample_dyadic_np(Y).ravel(),
             downsample_dyadic_np(U).ravel(),
             downsample_dyadic_np(V).ravel()]))
    cfg = CodecConfig(qp=28, gop_size=NF2, deblock=True, me_range=8,
                      temporal_layers=2, slices=2)
    cfg.add_layer(W0, H0)
    cfg.add_layer(W1, H1)
    codec = Codec(cfg)
    out = b""
    for t in range(NF2):
        r0 = codec.encode(base[t], W0, H0)
        out += r0.headers + r0.data
        r1 = codec.encode(enh[t], W1, H1)
        out += r1.headers + r1.data

    full = Codec(CodecConfig()).decode_annexb(out, tolerant=False)
    assert len([r for r in full if r.dqid == 0]) == NF2
    assert len([r for r in full if r.dqid == 16]) == NF2

    # drop the T1 frames: half the frames per layer remain, each equal
    # to the corresponding full-decode frame
    t0 = Codec(CodecConfig(tid_max=0)).decode_annexb(out, tolerant=False)
    for dq in (0, 16):
        fa = [r.frame for r in full if r.dqid == dq]
        fb = [r.frame for r in t0 if r.dqid == dq]
        assert len(fb) == NF2 // 2
        for i, f in enumerate(fb):
            assert np.array_equal(f, fa[2 * i]), (dq, i)

    # base-layer-only window still works combined with tid dropping
    b0 = Codec(CodecConfig(dqid_min=0, dqid_max=0,
                           tid_max=0)).decode_annexb(out, tolerant=False)
    assert len(b0) == NF2 // 2
