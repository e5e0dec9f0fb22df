"""SPS/PPS/slice-header parsing tests against a stream produced by the
reference encoder (oracle), plus write/parse round-trips."""
import pathlib
import os
import subprocess

REF_ENV = dict(os.environ, REF_NO_SIMD="1")

import numpy as np
import pytest

from hartallo_tpu.bitio import (BitReader, BitWriter, find_nal_units,
                                strip_emulation_prevention)
from hartallo_tpu.decode import nal as N
from hartallo_tpu.decode.params import PPS, SPS
from hartallo_tpu.decode.sliceheader import parse_slice_header

REFBUILD = pathlib.Path(__file__).resolve().parent.parent / ".refbuild"


@pytest.fixture(scope="module")
def ref_stream(ref_driver, tmp_path_factory):
    """Encode a tiny synthetic QCIF clip with the reference encoder."""
    tmp = tmp_path_factory.mktemp("refstream")
    yuv = tmp / "in.yuv"
    W, H, NF = 176, 144, 4
    rng = np.random.default_rng(3)
    frames = []
    for t in range(NF):
        x = np.arange(W)[None, :]
        y = np.arange(H)[:, None]
        Y = ((x + 2 * y + 5 * t) % 256).astype(np.uint8)
        U = np.full((H // 2, W // 2), 100, np.uint8)
        V = np.full((H // 2, W // 2), 160, np.uint8)
        frames += [Y.tobytes(), U.tobytes(), V.tobytes()]
    yuv.write_bytes(b"".join(frames))
    out = tmp / "out.264"
    subprocess.run([ref_driver, "encode", str(yuv), str(W), str(H),
                    str(out), "30", "4", str(NF), "1", "16", "1"],
                   check=True, capture_output=True, timeout=300)
    return out.read_bytes()


def test_parse_ref_sps_pps(ref_stream):
    units = find_nal_units(ref_stream)
    assert len(units) >= 3
    headers = {}
    for s, e in units:
        r = BitReader(strip_emulation_prevention(ref_stream[s:e]))
        hdr = N.parse_nal_header(r)
        headers.setdefault(hdr.type, []).append((hdr, r))
    assert N.NAL_SPS in headers and N.NAL_PPS in headers
    _, r = headers[N.NAL_SPS][0]
    sps = SPS.parse(r)
    assert sps.profile_idc in (66, 83)
    assert sps.width == 176 and sps.height == 144
    r.read_rbsp_trailing_bits()

    _, r = headers[N.NAL_PPS][0]
    pps = PPS.parse(r)
    assert pps.entropy_coding_mode_flag == 0  # CAVLC
    r.read_rbsp_trailing_bits()

    # slice headers parse without error and QP is sane
    slices = headers.get(N.NAL_SLICE_IDR, []) + headers.get(N.NAL_SLICE, [])
    assert slices
    for hdr, r in slices:
        h = parse_slice_header(r, sps, pps, nal_ref_idc=hdr.ref_idc,
                               is_idr=hdr.type == N.NAL_SLICE_IDR)
        assert 0 <= h.slice_qp(pps) <= 51
        assert h.first_mb_in_slice == 0


def test_sps_write_parse_roundtrip():
    sps = SPS(profile_idc=66, level_idc=30, log2_max_frame_num_minus4=4,
              pic_order_cnt_type=2, max_num_ref_frames=2,
              pic_width_in_mbs_minus1=21, pic_height_in_map_units_minus1=17)
    w = BitWriter()
    sps.write(w)
    r = BitReader(w.getvalue())
    s2 = SPS.parse(r)
    assert s2.width == 352 and s2.height == 288
    assert s2.pic_order_cnt_type == 2
    assert s2.max_num_ref_frames == 2
    r.read_rbsp_trailing_bits()


def test_pps_write_parse_roundtrip():
    pps = PPS(pic_parameter_set_id=0, seq_parameter_set_id=0,
              pic_init_qp_minus26=4, chroma_qp_index_offset=-2,
              deblocking_filter_control_present_flag=1)
    w = BitWriter()
    pps.write(w)
    r = BitReader(w.getvalue())
    p2 = PPS.parse(r)
    assert p2.pic_init_qp == 30
    assert p2.chroma_qp_index_offset == -2
    assert p2.deblocking_filter_control_present_flag == 1
