"""SVC spatial scalability: upsampling kernels (differential) + 2-layer
encode/decode round trip.

Note: the reference's own SVC round trip is broken (its decoder hits
"Not implemented yet" in deblock_intra_base_svc on its own SVC output and
its SVC encoder crashes after a few AUs — see BASELINE_MEASURED.md), so
correctness here is self-consistency + spec-shaped syntax, not reference
bit-exactness."""
import numpy as np
import pytest

from hartallo_tpu.api import Codec, CodecConfig

W0, H0 = 96, 80
W1, H1 = 192, 160
NF = 3


def test_upsample_differential():
    import jax.numpy as jnp
    from hartallo_tpu.svc.upsample import upsample_plane, upsample_plane_np
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, size=(40, 48)).astype(np.int32)
    for (oh, ow, chroma) in [(80, 96, False), (80, 96, True),
                             (60, 72, False), (120, 144, True)]:
        exp = upsample_plane_np(base, oh, ow, chroma)
        got = np.asarray(upsample_plane(jnp.asarray(base), oh, ow, chroma))
        assert np.array_equal(exp, got), (oh, ow, chroma)


def _clips():
    rng = np.random.default_rng(13)
    base, enh = [], []
    for t in range(NF):
        x = np.arange(W1)[None, :]
        y = np.arange(H1)[:, None]
        Y = ((x * 2 + y * 3 + 9 * t) % 256).astype(np.int32)
        Y[40:90, 50 + 4 * t:130 + 4 * t] = 205
        Y = np.clip(Y + rng.integers(0, 6, (H1, W1)), 0, 255).astype(np.uint8)
        U = np.full((H1 // 2, W1 // 2), 105, np.uint8)
        V = np.full((H1 // 2, W1 // 2), 145, np.uint8)
        enh.append(np.concatenate([Y.ravel(), U.ravel(), V.ravel()]))
        from hartallo_tpu.svc.upsample import downsample_dyadic_np
        Yb = downsample_dyadic_np(Y)
        Ub = downsample_dyadic_np(U)
        Vb = downsample_dyadic_np(V)
        base.append(np.concatenate([Yb.ravel(), Ub.ravel(), Vb.ravel()]))
    return base, enh


def _psnr(a, b):
    import math
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * math.log10(255 * 255 / mse) if mse else 99.0


@pytest.fixture(scope="module")
def svc_stream():
    cfg = CodecConfig(qp=28, gop_size=NF, deblock=True, me_range=8)
    cfg.add_layer(W0, H0)
    cfg.add_layer(W1, H1)
    codec = Codec(cfg)
    base, enh = _clips()
    out = b""
    for t in range(NF):
        r0 = codec.encode(base[t], W0, H0)
        out += r0.headers + r0.data
        r1 = codec.encode(enh[t], W1, H1)
        out += r1.headers + r1.data
    return out


def test_svc_round_trip(svc_stream):
    base, enh = _clips()
    dec = Codec(CodecConfig())
    results = dec.decode_annexb(svc_stream)
    base_out = [r for r in results if r.dqid == 0]
    enh_out = [r for r in results if r.dqid == 16]
    assert len(base_out) == NF and len(enh_out) == NF
    for t in range(NF):
        pb = _psnr(base[t], base_out[t].frame)
        pe = _psnr(enh[t], enh_out[t].frame)
        assert pb > 33, f"base frame {t}: {pb:.2f} dB"
        assert pe > 33, f"enh frame {t}: {pe:.2f} dB"


def test_svc_dqid_window(svc_stream):
    # decode only the base layer (dqid window 0..0)
    dec = Codec(CodecConfig(dqid_min=0, dqid_max=0))
    results = dec.decode_annexb(svc_stream)
    assert len(results) == NF
    assert all(r.width == W0 for r in results)


def test_svc_nal_structure(svc_stream):
    from hartallo_tpu.bitio import find_nal_units
    types = []
    for s, e in find_nal_units(svc_stream):
        types.append(svc_stream[s] & 0x1F)
    assert 15 in types, "subset SPS missing"
    assert 14 in types, "prefix NAL missing"
    assert 20 in types, "coded slice extension missing"
