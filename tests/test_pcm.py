"""I_PCM macroblocks: hand-crafted all-PCM IDR stream decoded by our
decoder and the reference decoder; output must equal the raw samples
exactly (deblocking disabled in the slice header)."""
import numpy as np

from hartallo_tpu.api import Codec, CodecConfig
from hartallo_tpu.bitio import (BitReader, BitWriter, find_nal_units,
                                strip_emulation_prevention)
from hartallo_tpu.decode import nal as N
from hartallo_tpu.decode.params import PPS, SPS
from hartallo_tpu.decode.sliceheader import SliceHeader, write_slice_header

from _rewrite import annexb

W, H = 64, 48


def _headers():
    enc = Codec(CodecConfig(width=W, height=H, qp=30, gop_size=1))
    r0 = enc.encode(np.zeros(W * H * 3 // 2, np.uint8), W, H)
    full = r0.headers + r0.data
    nals = [full[s:e] for s, e in find_nal_units(full)]
    sps = pps = None
    hdr_bytes = b""
    for nal in nals:
        r = BitReader(strip_emulation_prevention(nal))
        h = N.parse_nal_header(r)
        if h.type == N.NAL_SPS:
            sps = SPS.parse(r)
            hdr_bytes += b"\x00\x00\x00\x01" + nal
        elif h.type == N.NAL_PPS:
            pps = PPS.parse(r)
            hdr_bytes += b"\x00\x00\x00\x01" + nal
    return sps, pps, hdr_bytes


def test_pcm_stream_bit_exact():
    sps, pps, headers = _headers()
    gw, gh = sps.pic_width_in_mbs, sps.pic_height_in_mbs
    rng = np.random.default_rng(9)
    Y = rng.integers(0, 256, (H, W)).astype(np.uint8)
    U = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    V = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)

    sh = SliceHeader(first_mb_in_slice=0, slice_type=7,
                     pic_parameter_set_id=pps.pic_parameter_set_id,
                     frame_num=0, idr_pic_id=1,
                     disable_deblocking_filter_idc=1)
    w = BitWriter()
    N.write_nal_header(w, 3, N.NAL_SLICE_IDR)
    write_slice_header(w, sh, sps, pps, nal_ref_idc=3, is_idr=True)
    for my in range(gh):
        for mx in range(gw):
            w.ue(25)                         # mb_type = I_PCM (I slices)
            w.align_zero()
            for r_ in range(16):
                for c_ in range(16):
                    w.u(int(Y[my * 16 + r_, mx * 16 + c_]), 8)
            for pl in (U, V):
                for r_ in range(8):
                    for c_ in range(8):
                        w.u(int(pl[my * 8 + r_, mx * 8 + c_]), 8)
    w.write_rbsp_trailing_bits()
    stream = headers + annexb(w.getvalue())

    exp = np.concatenate([Y.ravel(), U.ravel(), V.ravel()])
    ours = Codec(CodecConfig()).decode_annexb(stream, tolerant=False)
    assert len(ours) == 1
    # I_PCM semantics ARE the raw samples (spec 7.3.5/8.3.5) — the
    # expected output needs no decoder oracle.  (The reference decoder
    # errors out on legal all-PCM streams — frames:0 — despite having
    # the read path at hl_codec_264_slice.c:1241-1280; its conformance
    # list names CVPCMNL1_SVA_C but the path is broken in-tree.)
    assert np.array_equal(ours[0].frame, exp)
