"""Fast-path (Pallas GOP kernel) decode tests.

The Mosaic kernel runs in interpreter mode on the CPU test backend
(HARTALLO_FAST_DECODE=interpret); real-hardware validation happens in
bench.py's conformance check.  Oracle: the XLA GOP path, itself pinned
bit-exact against the reference decoder.
"""
import numpy as np
import pytest

from hartallo_tpu.decode import d_pool


def _rand_slice_data(gw, gh, rng, density=0.2, qp=30):
    from hartallo_tpu.decode.slice_decode import SliceData
    sd = SliceData.create(gw, gh)
    sd.mb_kind[:] = 4                     # P16x16
    sd.qp[:] = qp
    n = gh * gw
    lmask = rng.random((gh, gw, 16)) < density
    sd.luma_ac[lmask] = rng.integers(-30, 30, (int(lmask.sum()), 4, 4))
    cmask = rng.random((gh, gw, 2, 4)) < density
    sd.chroma_ac[cmask] = rng.integers(-20, 20, (int(cmask.sum()), 4, 4))
    dmask = rng.random((gh, gw, 2)) < density
    sd.chroma_dc[dmask] = rng.integers(-12, 12, (int(dmask.sum()), 2, 2))
    _fill_nnz(sd)
    return sd


def _fill_nnz(sd):
    """Derive nnz grids from the coefficients the way the parser does
    (nnz_luma/nnz_chroma are spatial 4x4-block grids)."""
    gh, gw = sd.gh, sd.gw
    nnz_blk = (sd.luma_ac != 0).any(axis=(3, 4))        # (gh,gw,16) blkIdx
    raster = nnz_blk[:, :, np.argsort(d_pool._BLK_RASTER_OF)]
    sd.nnz_luma[:] = raster.reshape(gh, gw, 4, 4) \
        .transpose(0, 2, 1, 3).reshape(4 * gh, 4 * gw).astype(np.int16)
    cnz = (sd.chroma_ac != 0).any(axis=(4, 5))          # (gh,gw,2,4)
    sd.nnz_chroma[:] = cnz.reshape(gh, gw, 2, 2, 2) \
        .transpose(0, 3, 1, 4, 2).reshape(2 * gh, 2 * gw, 2) \
        .astype(np.int16)


def test_host_residual_pool_matches_device():
    """d_pool's numpy dequant+IDCT pool == the device residual planes."""
    import jax.numpy as jnp

    from hartallo_tpu.decode.intra_recon import compute_residuals
    gw, gh = 4, 3
    rng = np.random.default_rng(7)
    sd = _rand_slice_data(gw, gh, rng, density=0.35)
    ff = d_pool.pack_fast(
        sd, np.ones((gh, gw), bool), np.ones((gh, gw), bool),
        np.ones((gh, gw), bool), wslot=0, chroma_qp_off=0)

    res_y, res_c = compute_residuals(
        jnp.asarray(sd.luma_ac), jnp.asarray(sd.luma_dc),
        jnp.asarray(sd.chroma_ac), jnp.asarray(sd.chroma_dc),
        jnp.asarray(sd.qp, jnp.int32), jnp.zeros((gh, gw), bool), 0)
    res_y = np.asarray(res_y)             # (gh, gw, 16, 16)
    res_c = np.asarray(res_c)             # (gh, gw, 2, 8, 8)

    # scatter the pool into planes (natural padded coords, row-major)
    P = d_pool.PAD
    got_y = np.zeros((gh * 16, gw * 16), np.int32)
    got_u = np.zeros((gh * 8, gw * 8), np.int32)
    got_v = np.zeros((gh * 8, gw * 8), np.int32)
    nl, nu2, nr = ff.counts
    for i, (tag, vals) in enumerate(zip(ff.tags, ff.vals)):
        y = (tag >> 12) - P
        x = (tag & 4095) - P
        blk = vals.reshape(4, 4)
        dst = got_y if i < nl else (got_u if i < nu2 else got_v)
        dst[y:y + 4, x:x + 4] = blk

    exp_y = res_y.transpose(0, 2, 1, 3).reshape(gh * 16, gw * 16)
    exp_u = res_c[:, :, 0].transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)
    exp_v = res_c[:, :, 1].transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)
    assert np.array_equal(got_y, exp_y)
    assert np.array_equal(got_u, exp_u)
    assert np.array_equal(got_v, exp_v)


def _encode_clip(W, H, NF, qp=30, gop=None, me_range=8):
    from hartallo_tpu.api import Codec, CodecConfig
    rng = np.random.default_rng(3)
    x = np.arange(W)[None, :]
    y = np.arange(H)[:, None]
    frames = []
    for t in range(NF):
        Y = ((x * 3 + y * 2) % 256).astype(np.int32)
        Y[8 + 2 * t:24 + 2 * t, 10 + 3 * t:30 + 3 * t] = 200
        Y = np.clip(Y + rng.integers(0, 6, (H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 96) + rng.integers(0, 6,
                                                         (H // 2, W // 2))
        V = np.full((H // 2, W // 2), 160) + rng.integers(0, 6,
                                                          (H // 2, W // 2))
        frames.append(np.concatenate([Y.astype(np.uint8).ravel(),
                                      U.astype(np.uint8).ravel(),
                                      V.astype(np.uint8).ravel()]))
    enc = Codec(CodecConfig(width=W, height=H, qp=qp,
                            gop_size=gop or NF, deblock=True,
                            me_range=me_range))
    return b"".join(r.headers + r.data
                    for r in enc.encode_frames(frames, W, H))


@pytest.mark.parametrize("deblock", [True])
def test_fast_path_bit_exact_vs_xla(monkeypatch, deblock):
    """End-to-end: interpret-mode Pallas fast path == XLA GOP path on a
    real encoded stream (P pictures with skips, MVs, residuals)."""
    from hartallo_tpu.api import Codec, CodecConfig
    import hartallo_tpu.decode.decoder as DM

    W, H, NF = 64, 48, 5
    stream = _encode_clip(W, H, NF)

    monkeypatch.setenv("HARTALLO_FAST_DECODE", "0")
    ref = Codec(CodecConfig()).decode_annexb(stream)
    assert len(ref) == NF

    fast_used = {"n": 0}
    orig = DM.Decoder._flush_fast

    def spy(self, run, *a, **k):
        fast_used["n"] += len(run)
        return orig(self, run, *a, **k)

    monkeypatch.setattr(DM.Decoder, "_flush_fast", spy)
    monkeypatch.setenv("HARTALLO_FAST_DECODE", "interpret")
    got = Codec(CodecConfig()).decode_annexb(stream)
    assert len(got) == NF
    # every picture takes the kernel (I pictures and intra-in-P included)
    assert fast_used["n"] == NF
    for i, (a, b) in enumerate(zip(ref, got)):
        assert np.array_equal(a.frame, b.frame), f"frame {i} differs"
