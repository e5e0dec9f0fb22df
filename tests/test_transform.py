"""Differential tests: batched jnp transform kernels vs the scalar NumPy
oracle (reference analog: test_codec_264_transf.c's intrin-vs-C checks)."""
import numpy as np
import pytest

from hartallo_tpu.oracle import transform_ref as R
from hartallo_tpu.ops import transform as K

RNG = np.random.default_rng(12)


def _rand_blocks(n, lo, hi, shape=(4, 4)):
    return RNG.integers(lo, hi, size=(n, *shape)).astype(np.int32)


def test_inverse_transform_matches_oracle():
    blocks = _rand_blocks(256, -2048, 2048)
    got = np.asarray(K.inverse_transform_4x4(blocks))
    for i in range(blocks.shape[0]):
        exp = R.inverse_transform_4x4(blocks[i])
        assert np.array_equal(got[i], exp), i


def test_dequant_matches_oracle():
    blocks = _rand_blocks(208, -512, 512)
    qps = np.repeat(np.arange(52), 4).astype(np.int32)
    got = np.asarray(K.dequant_4x4(blocks, qps))
    got_dc = np.asarray(K.dequant_4x4(blocks, qps, dc_bypass=True))
    for i in range(blocks.shape[0]):
        assert np.array_equal(got[i], R.dequant_4x4(blocks[i], int(qps[i])))
        assert np.array_equal(
            got_dc[i], R.dequant_4x4(blocks[i], int(qps[i]), dc_bypass=True))


def test_luma_dc_descale_matches_oracle():
    blocks = _rand_blocks(208, -5000, 5000)
    qps = np.repeat(np.arange(52), 4).astype(np.int32)
    got = np.asarray(K.luma_dc_descale_intra16(blocks, qps))
    for i in range(blocks.shape[0]):
        exp = R.luma_dc_descale_intra16(blocks[i], int(qps[i]))
        assert np.array_equal(got[i], exp), (i, qps[i])


def test_chroma_dc_descale_matches_oracle():
    blocks = _rand_blocks(160, -3000, 3000, shape=(2, 2))
    qps = np.repeat(np.arange(40), 4).astype(np.int32)  # QPc <= 39
    got = np.asarray(K.chroma_dc_descale(blocks, qps))
    for i in range(blocks.shape[0]):
        exp = R.chroma_dc_descale(blocks[i], int(qps[i]))
        assert np.array_equal(got[i], exp), (i, qps[i])


def test_forward_dct_matches_oracle():
    blocks = _rand_blocks(256, -255, 256)
    got = np.asarray(K.forward_dct_4x4(blocks))
    for i in range(blocks.shape[0]):
        assert np.array_equal(got[i], R.forward_dct_4x4(blocks[i]))


def test_forward_quant_matches_oracle():
    blocks = _rand_blocks(208, -4080, 4080)
    qps = np.repeat(np.arange(52), 4).astype(np.int32)
    intra = (np.arange(208) % 2 == 0)
    got = np.asarray(K.forward_quant_4x4(blocks, qps, intra))
    for i in range(blocks.shape[0]):
        exp = R.forward_quant_4x4(blocks[i], int(qps[i]), bool(intra[i]))
        assert np.array_equal(got[i], exp), (i, qps[i])


def test_forward_dc_luma_matches_oracle():
    blocks = _rand_blocks(208, -4080, 4080)
    qps = np.repeat(np.arange(52), 4).astype(np.int32)
    got = np.asarray(K.forward_hadamard_quant_dc_luma(blocks, qps))
    for i in range(blocks.shape[0]):
        exp = R.forward_hadamard_quant_dc_luma(blocks[i], int(qps[i]))
        assert np.array_equal(got[i], exp)


def test_forward_dc_chroma_matches_oracle():
    blocks = _rand_blocks(160, -4080, 4080, shape=(2, 2))
    qps = np.repeat(np.arange(40), 4).astype(np.int32)
    intra = (np.arange(160) % 2 == 0)
    got = np.asarray(K.forward_hadamard_quant_dc_chroma(blocks, qps, intra))
    for i in range(blocks.shape[0]):
        exp = R.forward_hadamard_quant_dc_chroma(blocks[i], int(qps[i]),
                                                 bool(intra[i]))
        assert np.array_equal(got[i], exp)


def test_transform_roundtrip_reconstruction():
    """encode->decode path distortion must be bounded by quant step."""
    x = _rand_blocks(64, 0, 256)
    res = x - 128
    for qp in (0, 10, 20, 30, 40, 51):
        w = R.forward_dct_4x4(res[0])
        z = R.forward_quant_4x4(w, qp, True)
        d = R.dequant_4x4(z, qp)
        r = R.inverse_transform_4x4(d)
        step = (1 << (qp // 6)) * 20  # loose bound on quant step
        assert np.max(np.abs(r - res[0])) <= max(step, 4)
