"""FMO (flexible macroblock ordering): encode with slice groups, decode
both with our decoder and the reference decoder, require bit-exact parity.

Covers MbToSliceGroupMap types 0 (interleaved), 1 (dispersed),
2 (foreground rectangles), 6 (explicit) — reference
``hl_codec_264_fmo.c:16-208`` — plus the changing types 3/4/5 map
derivation against a direct spec oracle.
"""
import os
import subprocess

import numpy as np
import pytest

from hartallo_tpu.api import Codec, CodecConfig, Parser

REF_ENV = dict(os.environ, REF_NO_SIMD="1")

W, H, NF = 176, 144, 3


def _clip():
    rng = np.random.default_rng(11)
    frames = []
    for t in range(NF):
        x = np.arange(W)[None, :]
        y = np.arange(H)[:, None]
        Y = ((x * 2 + y * 5) % 256).astype(np.int32)
        Y[30 + 5 * t:80 + 5 * t, 40 + 7 * t:100 + 7 * t] = 200
        Y = np.clip(Y + rng.integers(0, 12, (H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 110) + \
            rng.integers(0, 8, (H // 2, W // 2))
        V = np.full((H // 2, W // 2), 140) + \
            rng.integers(0, 8, (H // 2, W // 2))
        frames.append(np.concatenate([Y.astype(np.uint8).ravel(),
                                      U.astype(np.uint8).ravel(),
                                      V.astype(np.uint8).ravel()]))
    return frames


def _encode(map_type, groups):
    cfg = CodecConfig(width=W, height=H, qp=30, gop_size=NF, deblock=True,
                      me_range=8, num_slice_groups=groups,
                      slice_group_map_type=map_type)
    codec = Codec(cfg)
    out = b""
    for f in _clip():
        r = codec.encode(f, W, H)
        out += r.headers + r.data
    return out


@pytest.mark.parametrize("map_type,groups",
                         [(0, 2), (1, 3), (2, 2), (3, 2), (4, 2),
                          (5, 2), (6, 2)])
def test_fmo_round_trip_vs_reference(map_type, groups, ref_driver,
                                     tmp_path):
    stream = _encode(map_type, groups)
    # the stream really carries one slice NAL per group per frame
    slice_nals = sum(1 for s, e in Parser.find_nal_units(stream)
                     if stream[s] & 0x1F in (1, 5))
    assert slice_nals == NF * groups

    dec = Codec(CodecConfig())
    results = dec.decode_annexb(stream)
    assert len(results) == NF

    inp = tmp_path / "fmo.264"
    inp.write_bytes(stream)
    out = tmp_path / "out.yuv"
    subprocess.run([ref_driver, "decode", str(inp), str(out), "1"],
                   check=True, env=REF_ENV, capture_output=True,
                   timeout=300)
    refdec = out.read_bytes()
    fsz = W * H * 3 // 2
    assert len(refdec) == fsz * NF, \
        f"reference decoded {len(refdec) // fsz} frames"
    for i, res in enumerate(results):
        ref = np.frombuffer(refdec[i * fsz:(i + 1) * fsz], np.uint8)
        assert np.array_equal(res.frame, ref), \
            f"map_type={map_type} frame {i}: decode mismatch"


def _spec_map_type4(n, size0, d):
    m = np.ones(n, np.int32)
    if d == 0:
        m[:size0] = 0
    elif size0:
        m[n - size0:] = 0
    return m


def test_fmo_changing_maps_cover_all():
    """Map types 3/4/5 produce a valid 2-group partition whose group-0
    size tracks slice_group_change_cycle * rate (8.2.2.4-7)."""
    from hartallo_tpu.decode.fmo import mb_to_slice_group_map
    from hartallo_tpu.decode.params import PPS, SPS
    sps = SPS(pic_width_in_mbs_minus1=10, pic_height_in_map_units_minus1=8)
    n = 11 * 9
    for t in (3, 4, 5):
        for d in (0, 1):
            for cycle in (0, 3, 7, 200):
                pps = PPS(num_slice_groups_minus1=1,
                          slice_group_map_type=t,
                          slice_group_change_direction_flag=d,
                          slice_group_change_rate_minus1=4)
                m = mb_to_slice_group_map(sps, pps, cycle)
                size0 = min(cycle * 5, n)
                assert (m == 0).sum() == size0, (t, d, cycle)
                assert set(np.unique(m)) <= {0, 1}
                if t == 4:
                    assert np.array_equal(m, _spec_map_type4(n, size0, d))


def test_fmo_dispersed_matches_spec():
    from hartallo_tpu.decode.fmo import mb_to_slice_group_map
    from hartallo_tpu.decode.params import PPS, SPS
    sps = SPS(pic_width_in_mbs_minus1=5, pic_height_in_map_units_minus1=3)
    pps = PPS(num_slice_groups_minus1=2, slice_group_map_type=1)
    m = mb_to_slice_group_map(sps, pps)
    gw, groups = 6, 3
    for i in range(len(m)):
        assert m[i] == ((i % gw) + (((i // gw) * groups) // 2)) % groups
