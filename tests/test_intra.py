"""Differential tests: batched intra mode banks vs the scalar spec oracle."""
import numpy as np

from hartallo_tpu.oracle import intra_ref as R
from hartallo_tpu.ops import intra as K

RNG = np.random.default_rng(21)
N = 64


def _neighbors(n, tlen, llen):
    return (RNG.integers(0, 256, size=(n, tlen)).astype(np.int32),
            RNG.integers(0, 256, size=(n, llen)).astype(np.int32),
            RNG.integers(0, 256, size=(n,)).astype(np.int32))


def test_pred4x4_all_modes():
    top, left, tl = _neighbors(N, 8, 4)
    avail = [(True, True), (True, False), (False, True), (False, False)]
    for at, al in avail:
        bank = np.asarray(K.pred4x4_all(
            top, left, tl, np.full(N, at), np.full(N, al)))
        for i in range(N):
            for mode in range(9):
                if mode != 2:  # directional modes need their neighbors
                    if (mode in (0, 3, 7) and not at) or \
                            (mode in (1, 8) and not al) or \
                            (mode in (4, 5, 6) and not (at and al)):
                        continue
                exp = R.pred4x4(mode, top[i], left[i], int(tl[i]), at, al)
                assert np.array_equal(bank[i, mode], exp), (i, mode, at, al)


def test_pred16x16_all_modes():
    top, left, tl = _neighbors(N, 16, 16)
    for at, al in [(True, True), (True, False), (False, True),
                   (False, False)]:
        bank = np.asarray(K.pred16x16_all(
            top, left, tl, np.full(N, at), np.full(N, al)))
        for i in range(0, N, 7):
            for mode in range(4):
                if mode == 0 and not at:
                    continue
                if mode == 1 and not al:
                    continue
                if mode == 3 and not (at and al):
                    continue
                exp = R.pred16x16(mode, top[i], left[i], int(tl[i]), at, al)
                assert np.array_equal(bank[i, mode], exp), (i, mode, at, al)


def test_pred_chroma_all_modes():
    top, left, tl = _neighbors(N, 8, 8)
    for at, al in [(True, True), (True, False), (False, True),
                   (False, False)]:
        bank = np.asarray(K.pred_chroma_all(
            top, left, tl, np.full(N, at), np.full(N, al)))
        for i in range(0, N, 5):
            for mode in range(4):
                if mode == 2 and not at:
                    continue
                if mode == 1 and not al:
                    continue
                if mode == 3 and not (at and al):
                    continue
                exp = R.pred_chroma(mode, top[i], left[i], int(tl[i]), at, al)
                assert np.array_equal(bank[i, mode], exp), (i, mode, at, al)
