"""Explicit weighted prediction (pred_weight_table, 8.4.2.3.2).

The reference parses the syntax (hl_codec_264_rbsp.c:289-358) but its
decoder bails with NOT_IMPLEMENTED on weighted_pred_flag
(hl_codec_264_pred_inter.c:118-124), so there is no external pixel
oracle; the test is semantic: an all-skip P frame under weights (w, o)
must decode to exactly Clip1(((ref*w + 2^(d-1)) >> d) + o) of the
reconstructed IDR, computed independently in numpy."""
import numpy as np

from hartallo_tpu.api import Codec, CodecConfig
from hartallo_tpu.bitio import (BitReader, BitWriter, find_nal_units,
                                insert_emulation_prevention,
                                strip_emulation_prevention)
from hartallo_tpu.decode import nal as N
from hartallo_tpu.decode.params import PPS, SPS
from hartallo_tpu.decode.sliceheader import (PredWeightTable, SliceHeader,
                                             write_slice_header)

W, H = 96, 80


def _clip():
    rng = np.random.default_rng(11)
    x = np.arange(W)[None, :]
    y = np.arange(H)[:, None]
    Y = ((x * 3 + y * 2) % 256).astype(np.int32)
    Y[20:60, 30:70] = 190
    Y = np.clip(Y + rng.integers(0, 6, (H, W)), 0, 255).astype(np.uint8)
    U = np.full((H // 2, W // 2), 90, np.uint8)
    V = np.full((H // 2, W // 2), 160, np.uint8)
    return np.concatenate([Y.ravel(), U.ravel(), V.ravel()])


def _annexb(payload: bytes) -> bytes:
    return b"\x00\x00\x00\x01" + insert_emulation_prevention(payload)


def test_weighted_skip_frame_semantics():
    # 1. one IDR from our encoder (SPS/PPS/IDR NALs)
    enc = Codec(CodecConfig(width=W, height=H, qp=28, gop_size=4,
                            deblock=True))
    r0 = enc.encode(_clip(), W, H)
    base_stream = r0.headers + r0.data

    # 2. split NALs; rewrite the PPS with weighted_pred_flag=1
    nals = [base_stream[s:e] for s, e in find_nal_units(base_stream)]
    out = b""
    sps = pps = None
    for nal in nals:
        r = BitReader(strip_emulation_prevention(nal))
        hdr = N.parse_nal_header(r)
        if hdr.type == N.NAL_SPS:
            sps = SPS.parse(r)
            out += b"\x00\x00\x00\x01" + nal
        elif hdr.type == N.NAL_PPS:
            pps = PPS.parse(r)
            pps.weighted_pred_flag = 1
            w = BitWriter()
            N.write_nal_header(w, 3, N.NAL_PPS)
            pps.write(w)
            out += _annexb(w.getvalue())
        else:
            out += b"\x00\x00\x00\x01" + nal

    # 3. hand-build an all-skip P slice with non-trivial weights
    wt = PredWeightTable(luma_log2_denom=5, chroma_log2_denom=2,
                         luma_w=[20], luma_o=[13],
                         chroma_w=[(3, 7)], chroma_o=[(-9, 4)])
    sh = SliceHeader(first_mb_in_slice=0, slice_type=5,
                     pic_parameter_set_id=0, frame_num=1,
                     pic_order_cnt_lsb=2, slice_qp_delta=0,
                     disable_deblocking_filter_idc=1, pred_weights=wt)
    w = BitWriter()
    N.write_nal_header(w, 0, N.NAL_SLICE)         # non-reference P
    write_slice_header(w, sh, sps, pps, nal_ref_idc=0, is_idr=False)
    gw, gh = sps.pic_width_in_mbs, sps.pic_height_in_mbs
    w.ue(gw * gh)                                  # mb_skip_run: all MBs
    w.write_rbsp_trailing_bits()
    out += _annexb(w.getvalue())

    # 4. decode and check 8.4.2.3.2 semantics vs an independent oracle
    dec = Codec(CodecConfig())
    frames = dec.decode_annexb(out)
    assert len(frames) == 2
    f0 = frames[0].frame.astype(np.int64)
    f1 = frames[1].frame.astype(np.int64)
    ysz = W * H

    def wp(x, wgt, off, d):
        return np.clip(((x * wgt + (1 << max(d - 1, 0)) // (1 if d else 2)
                         if False else
                         (x * wgt + ((1 << d) >> 1))) >> d) + off, 0, 255)

    exp_y = wp(f0[:ysz], 20, 13, 5)
    exp_u = wp(f0[ysz:ysz + ysz // 4], 3, -9, 2)
    exp_v = wp(f0[ysz + ysz // 4:], 7, 4, 2)
    assert np.array_equal(f1[:ysz], exp_y)
    assert np.array_equal(f1[ysz:ysz + ysz // 4], exp_u)
    assert np.array_equal(f1[ysz + ysz // 4:], exp_v)


def test_identity_weights_roundtrip_bit_exact():
    """Identity pred-weight tables through the full pipeline must not
    change a single pixel vs the unweighted decode of the same stream."""
    enc = Codec(CodecConfig(width=W, height=H, qp=30, gop_size=3,
                            deblock=True, me_range=8))
    clip = [_clip() for _ in range(3)]
    res = enc.encode_frames(clip, W, H)
    stream = b"".join(r.headers + r.data for r in res)
    plain = [r.frame for r in Codec(CodecConfig()).decode_annexb(stream)]

    # rewrite: PPS gets weighted_pred_flag=1; every P slice header gets an
    # identity table inserted
    nals = [stream[s:e] for s, e in find_nal_units(stream)]
    sps = pps = None
    out = b""
    for nal in nals:
        r = BitReader(strip_emulation_prevention(nal))
        hdr = N.parse_nal_header(r)
        if hdr.type == N.NAL_SPS:
            sps = SPS.parse(r)
            out += b"\x00\x00\x00\x01" + nal
        elif hdr.type == N.NAL_PPS:
            pps = PPS.parse(r)
            out += b"\x00\x00\x00\x01" + nal          # original pps (no wp)
            pps2 = PPS.parse(BitReader(
                strip_emulation_prevention(nal)[1:]))
            pps2.weighted_pred_flag = 1
            pps2.pic_parameter_set_id = 1
            w = BitWriter()
            N.write_nal_header(w, 3, N.NAL_PPS)
            pps2.write(w)
            out += _annexb(w.getvalue())
        elif hdr.type == N.NAL_SLICE:
            # P slice: reparse header, point at PPS 1, insert table
            from hartallo_tpu.decode.sliceheader import parse_slice_header
            sh = parse_slice_header(r, sps, pps, nal_ref_idc=hdr.ref_idc,
                                    is_idr=False)
            assert sh.type_base == 0
            sh.pic_parameter_set_id = 1
            sh.pred_weights = PredWeightTable(
                luma_log2_denom=6, chroma_log2_denom=6,
                luma_w=[64], luma_o=[0],
                chroma_w=[(64, 64)], chroma_o=[(0, 0)])
            data = strip_emulation_prevention(nal)
            # re-emit header + copy remaining slice_data bits verbatim
            w = BitWriter()
            N.write_nal_header(w, hdr.ref_idc, N.NAL_SLICE)
            pps2 = PPS.parse(BitReader(strip_emulation_prevention(
                [n for n in nals if BitReader(
                    strip_emulation_prevention(n)).data[0] & 0x1f == 8]
                [0])[1:]))
            pps2.weighted_pred_flag = 1
            write_slice_header(w, sh, sps, pps2, nal_ref_idc=hdr.ref_idc,
                               is_idr=False)
            # copy slice_data bits verbatim, minus the original rbsp
            # trailing bits (the new header length realigns them)
            total_bits = len(data) * 8
            while total_bits > 0 and not (
                    (data[(total_bits - 1) // 8] >>
                     (7 - ((total_bits - 1) % 8))) & 1):
                total_bits -= 1
            total_bits -= 1                    # drop the stop bit too
            for p in range(r.pos, total_bits):
                w.u1((data[p // 8] >> (7 - (p % 8))) & 1)
            w.write_rbsp_trailing_bits()
            out += _annexb(w.getvalue())
        else:
            out += b"\x00\x00\x00\x01" + nal

    wp_frames = [r.frame for r in Codec(CodecConfig()).decode_annexb(out)]
    assert len(wp_frames) == len(plain)
    for a, b in zip(plain, wp_frames):
        assert np.array_equal(a, b)
