"""Verify spec-constant tables against the reference's table definitions by
parsing numeric literals out of hl_codec_264_tables.c/h (the tables are
ITU-T standard constants; any H.264 codec must agree exactly)."""
import re

import numpy as np
import pytest

from hartallo_tpu.core import tables as T


def _extract_ints(text: str, name: str, count: int):
    """Extract `count` integers from the initializer of array `name`."""
    m = re.search(re.escape(name) + r"\s*\[[^=]*=\s*\{", text)
    if not m:
        pytest.skip(f"{name} not found in reference header")
    depth = 1
    i = m.end()
    start = i
    while depth > 0 and i < len(text):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
        i += 1
    body = text[start:i - 1]
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    body = re.sub(r"//[^\n]*", "", body)
    nums = re.findall(r"-?\d+", body)
    assert len(nums) >= count, f"{name}: found {len(nums)} ints"
    return np.array([int(x) for x in nums[:count]], dtype=np.int64)


def test_zigzag(ref_tables_header):
    yx = _extract_ints(ref_tables_header, "ZigZag4x4BlockScanYX", 32)
    ref = yx.reshape(16, 2)[:, 0] * 4 + yx.reshape(16, 2)[:, 1]
    assert np.array_equal(ref, T.ZIGZAG_4x4)


def test_quant_mf(ref_tables_header):
    # reference file keeps MF in tables.c
    import pathlib
    src = pathlib.Path("/root/reference/source/h264/hl_codec_264_tables.c")
    text = src.read_text(errors="replace")
    ref = _extract_ints(text, "HL_CODEC_264_QUANT_MF", 6 * 16)
    assert np.array_equal(ref.reshape(6, 4, 4), T.QUANT_MF)


def test_quant_scale_v(ref_tables_header):
    cols = _extract_ints(ref_tables_header,
                         "HL_CODEC_264_SCALING_MATRIX_V", 18).reshape(6, 3)
    # expand (even,even)/(odd,odd)/other position classes to 4x4
    for m in range(6):
        for y in range(4):
            for x in range(4):
                c = 0 if (x % 2 == 0 and y % 2 == 0) else \
                    1 if (x % 2 == 1 and y % 2 == 1) else 2
                assert T.QUANT_V[m, y, x] == cols[m, c]


def test_chroma_qp_table(ref_tables_header):
    ref = _extract_ints(ref_tables_header, "qPI2QPC", 52)
    assert np.array_equal(ref, T.QP_SCALE_CHROMA)


def test_deblock_tables():
    import pathlib
    src = pathlib.Path("/root/reference/source/h264/hl_codec_264_deblock.c")
    if not src.exists():
        pytest.skip("reference unavailable")
    text = src.read_text(errors="replace")
    # tc0 table indexed [indexA][bS]: col0 = bS0 (zeros), cols1..3 = tc0,
    # col4 duplicates col3 (bS=4 indexing convenience)
    ref = _extract_ints(text, "HL_CODEC_264_DEBLOCK_THRESHOLD_TABLE", 52 * 5)
    ref = ref.reshape(52, 5)
    assert np.array_equal(ref[:, 1:4], T.DEBLOCK_TC0)
    alpha = _extract_ints(text, "HL_CODEC_264_DEBLOCK_ALPHA_TABLE", 52)
    beta = _extract_ints(text, "HL_CODEC_264_DEBLOCK_BETA_TABLE", 52)
    assert np.array_equal(alpha, T.DEBLOCK_ALPHA)
    assert np.array_equal(beta, T.DEBLOCK_BETA)


def test_quant_f_and_qbits():
    # closed-form consistency checks
    assert T.QUANT_QBITS[0] == 15 and T.QUANT_QBITS[51] == 23
    assert T.QUANT_F[0, 0] == (1 << 15) // 3
    assert T.QUANT_F[1, 0] == (1 << 15) // 6


def test_cbp_mapping_is_permutation():
    for tab in (T.CBP_ME_INTRA, T.CBP_ME_INTER):
        assert sorted(tab.tolist()) == list(range(48))
