"""Native (C) 8.4.1 MV derivation vs the pure-Python oracle — both
directions, random MB fields, exact equality (the reference's
C-vs-SIMD differential-test pattern, SURVEY.md §4)."""
import numpy as np
import pytest

from hartallo_tpu import native
from hartallo_tpu.decode.mv import (compute_mvds_and_skip_py,
                                    derive_mvs_py)
from hartallo_tpu.decode.slice_decode import SliceData

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

GW, GH = 11, 9


def _random_field(seed):
    r = np.random.default_rng(seed)
    sd = SliceData.create(GW, GH)
    # mix of intra (0/1), skip (3), and all P kinds
    sd.mb_kind[:] = r.choice([0, 1, 3, 4, 4, 5, 6, 7],
                             size=(GH, GW)).astype(np.int8)
    sd.ref_idx[:] = 0
    sd.sub_types[:] = r.integers(0, 4, (GH, GW, 4)).astype(np.int8)
    sd.mvd[:] = r.integers(-32, 33, (GH, GW, 4, 4, 2)).astype(np.int32)
    # two horizontal slices
    sd.slice_id[:] = (np.arange(GH)[:, None] >= GH // 2) * np.ones(
        (GH, GW), np.int32)
    return sd


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_derive_mvs_native_matches_py(seed):
    sd_a = _random_field(seed)
    sd_b = _random_field(seed)
    derive_mvs_py(sd_a)
    mv_native = native.derive_mvs(GW, GH, sd_b.mb_kind, sd_b.mvd,
                                  sd_b.ref_idx, sd_b.sub_types,
                                  sd_b.slice_id)
    np.testing.assert_array_equal(sd_a.mv, mv_native)


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_compute_mvds_native_matches_py(seed):
    # build a consistent MV field by deriving from random mvds first
    sd = _random_field(seed)
    derive_mvs_py(sd)
    r = np.random.default_rng(seed + 100)
    coded = r.integers(0, 2, (GH, GW)).astype(bool)
    mvd_py, skip_py = compute_mvds_and_skip_py(
        sd.mb_kind, sd.mv, sd.ref_idx, sd.sub_types, coded, sd.slice_id)
    mvd_c, skip_c = native.compute_mvds_and_skip(
        GW, GH, sd.mb_kind, sd.mv, sd.ref_idx, sd.sub_types, coded,
        sd.slice_id)
    np.testing.assert_array_equal(skip_py, skip_c)
    # mvd is only meaningful where partitions exist; compare fully anyway
    # for P16x8/8x16/8x8 slots, and the broadcast 16x16 slots
    p_mask = (sd.mb_kind >= 4)
    np.testing.assert_array_equal(mvd_py[p_mask], mvd_c[p_mask])


def test_mvd_roundtrip_through_native():
    """native derive(mvd) -> native compute(mv) must reproduce mvd at
    every partition's anchor position."""
    sd = _random_field(9)
    mv = native.derive_mvs(GW, GH, sd.mb_kind, sd.mvd, sd.ref_idx,
                           sd.sub_types, sd.slice_id)
    coded = np.ones((GH, GW), bool)         # disable skip eligibility
    mvd_c, skip = native.compute_mvds_and_skip(
        GW, GH, sd.mb_kind, mv, sd.ref_idx, sd.sub_types, coded,
        sd.slice_id)
    assert not skip.any()
    from hartallo_tpu.decode.mv import _partition_geometry, _sub_geometry
    for my in range(GH):
        for mx in range(GW):
            kind = int(sd.mb_kind[my, mx])
            if kind < 4:
                continue
            if kind in (4, 5, 6):
                for *_xx, (iy, ix) in _partition_geometry(kind):
                    np.testing.assert_array_equal(
                        mvd_c[my, mx, iy, ix], sd.mvd[my, mx, iy, ix],
                        err_msg=f"mb ({my},{mx}) kind {kind}")
            else:
                for part in range(4):
                    py0, px0 = (part >> 1) * 2, (part & 1) * 2
                    st = int(sd.sub_types[my, mx, part])
                    for (ox, oy, _w, _h) in _sub_geometry(st):
                        np.testing.assert_array_equal(
                            mvd_c[my, mx, py0 + oy, px0 + ox],
                            sd.mvd[my, mx, py0 + oy, px0 + ox],
                            err_msg=f"mb ({my},{mx}) part {part}")
