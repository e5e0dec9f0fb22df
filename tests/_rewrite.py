"""Stream-rewrite helpers for stress tests: reparse NAL headers/slice
headers of a conforming stream and re-emit them with modifications
(MMCO ops, ref-list modifications, SPS tweaks), copying the slice_data
payload bits verbatim."""
import numpy as np

from hartallo_tpu.bitio import (BitReader, BitWriter, find_nal_units,
                                insert_emulation_prevention,
                                strip_emulation_prevention)
from hartallo_tpu.decode import nal as N
from hartallo_tpu.decode.params import PPS, SPS
from hartallo_tpu.decode.sliceheader import parse_slice_header, \
    write_slice_header


def annexb(payload: bytes) -> bytes:
    return b"\x00\x00\x00\x01" + insert_emulation_prevention(payload)


def copy_payload_bits(w: BitWriter, data: bytes, bitpos: int) -> None:
    """Copy data[bitpos:] minus the original rbsp trailing bits, then
    re-terminate (the new header length realigns the payload)."""
    total_bits = len(data) * 8
    while total_bits > 0 and not (
            (data[(total_bits - 1) // 8] >> (7 - ((total_bits - 1) % 8)))
            & 1):
        total_bits -= 1
    total_bits -= 1                    # drop the stop bit
    for p in range(bitpos, total_bits):
        w.u1((data[p // 8] >> (7 - (p % 8))) & 1)
    w.write_rbsp_trailing_bits()


def rewrite_stream(stream: bytes, *, edit_sps=None, edit_pps=None,
                   edit_slice=None) -> bytes:
    """Re-emit a (single-SPS/PPS AVC) stream with editing callbacks.

    edit_sps(sps) / edit_pps(pps): mutate in place (or None to keep).
    edit_slice(sh, nal_hdr, slice_index): mutate the SliceHeader in
    place; called for every non-IDR P slice in stream order.
    """
    nals = [stream[s:e] for s, e in find_nal_units(stream)]
    sps = pps = None
    out = b""
    p_index = 0
    for nal in nals:
        data = strip_emulation_prevention(nal)
        r = BitReader(data)
        hdr = N.parse_nal_header(r)
        if hdr.type == N.NAL_SPS:
            sps = SPS.parse(r)
            if edit_sps:
                edit_sps(sps)
            w = BitWriter()
            N.write_nal_header(w, 3, N.NAL_SPS)
            sps.write(w)
            out += annexb(w.getvalue())
        elif hdr.type == N.NAL_PPS:
            pps = PPS.parse(r)
            if edit_pps:
                edit_pps(pps)
            w = BitWriter()
            N.write_nal_header(w, 3, N.NAL_PPS)
            pps.write(w)
            out += annexb(w.getvalue())
        elif hdr.type == N.NAL_SLICE and edit_slice is not None:
            sh = parse_slice_header(r, sps, pps, nal_ref_idc=hdr.ref_idc,
                                    is_idr=False)
            edit_slice(sh, hdr, p_index)
            p_index += 1
            w = BitWriter()
            N.write_nal_header(w, hdr.ref_idc, N.NAL_SLICE)
            write_slice_header(w, sh, sps, pps, nal_ref_idc=hdr.ref_idc,
                               is_idr=False)
            copy_payload_bits(w, data, r.pos)
            out += annexb(w.getvalue())
        else:
            out += b"\x00\x00\x00\x01" + nal
    return out


def decode_ours(stream: bytes):
    from hartallo_tpu.api import Codec, CodecConfig
    return [r.frame for r in Codec(CodecConfig()).decode_annexb(
        stream, tolerant=False)]


def decode_reference(ref_driver: str, stream: bytes, tmpdir) -> bytes:
    import os
    import subprocess
    s264 = tmpdir / "s.264"
    syuv = tmpdir / "s.yuv"
    s264.write_bytes(stream)
    subprocess.run([ref_driver, "decode", str(s264), str(syuv), "1"],
                   check=True, capture_output=True, timeout=300,
                   env=dict(os.environ, REF_NO_SIMD="1"))
    return syuv.read_bytes()
