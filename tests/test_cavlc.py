"""CAVLC round-trip and known-vector tests (reference analog: the
differential kernel tests of test_math.c applied to the entropy layer)."""
import numpy as np
import pytest

from hartallo_tpu.bitio import BitReader, BitWriter
from hartallo_tpu.entropy.cavlc import (
    read_coeff_token, write_coeff_token,
    read_residual_block, write_residual_block,
)


@pytest.mark.parametrize("nC", [-1, 0, 1, 2, 3, 4, 7, 8, 16])
def test_coeff_token_roundtrip(nC):
    maxc = 4 if nC == -1 else 16
    cases = [(tc, t1) for tc in range(maxc + 1)
             for t1 in range(min(tc, 3) + 1)]
    w = BitWriter()
    for tc, t1 in cases:
        write_coeff_token(w, tc, t1, nC)
    w.write_rbsp_trailing_bits()
    r = BitReader(w.getvalue())
    for tc, t1 in cases:
        assert read_coeff_token(r, nC) == (tc, t1), (tc, t1, nC)


def _roundtrip(levels, nC, maxc):
    w = BitWriter()
    write_residual_block(w, levels, nC, maxc)
    w.write_rbsp_trailing_bits()
    r = BitReader(w.getvalue())
    out, tc = read_residual_block(r, nC, maxc)
    return out, tc


@pytest.mark.parametrize("nC", [-1, 0, 1, 2, 4, 8])
def test_block_roundtrip_random(nC):
    rng = np.random.default_rng(nC + 100)
    maxc = 4 if nC == -1 else 16
    for trial in range(500):
        levels = np.zeros(maxc, dtype=np.int32)
        n = int(rng.integers(0, maxc + 1))
        pos = rng.choice(maxc, size=n, replace=False)
        mag = rng.integers(1, 40, size=n)
        # occasionally huge levels to exercise escapes
        if trial % 17 == 0 and n:
            mag[0] = int(rng.integers(1000, 4000))
        sign = rng.choice([-1, 1], size=n)
        levels[pos] = mag * sign
        out, tc = _roundtrip(levels, nC, maxc)
        assert np.array_equal(out, levels), (trial, nC, levels, out)
        assert tc == n


def test_block_all_ones():
    levels = np.ones(16, dtype=np.int32)
    out, tc = _roundtrip(levels, 0, 16)
    assert np.array_equal(out, levels) and tc == 16


def test_block_sparse_high_freq():
    levels = np.zeros(16, dtype=np.int32)
    levels[15] = -1
    out, tc = _roundtrip(levels, 5, 16)
    assert np.array_equal(out, levels) and tc == 1


def test_block_empty():
    levels = np.zeros(16, dtype=np.int32)
    out, tc = _roundtrip(levels, 0, 16)
    assert tc == 0 and not out.any()


def test_known_coeff_token_codes():
    # spec Table 9-5, 0 <= nC < 2: TC=0 -> '1'; TC=1,T1=1 -> '01';
    # TC=1,T1=0 -> '000101'
    w = BitWriter()
    write_coeff_token(w, 0, 0, 0)
    assert w.bitpos == 1
    w2 = BitWriter()
    write_coeff_token(w2, 1, 1, 0)
    assert w2.bitpos == 2
    w3 = BitWriter()
    write_coeff_token(w3, 1, 0, 0)
    assert w3.bitpos == 6
