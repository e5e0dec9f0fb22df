"""Bit reader/writer + Annex-B utilities: round-trip and known-vector tests
(reference test analog: test_bits.c, test_parser.c)."""
import numpy as np
import pytest

from hartallo_tpu.bitio import (
    BitReader, BitWriter, find_nal_units,
    strip_emulation_prevention, insert_emulation_prevention,
)


def test_u_known_vectors():
    r = BitReader(bytes([0b10110011, 0b01010101]))
    assert r.u1() == 1
    assert r.u(3) == 0b011
    assert r.u(4) == 0b0011
    assert r.u(8) == 0b01010101
    assert r.bits_left() == 0


def test_ue_known_vectors():
    # ue codes: 0->'1', 1->'010', 2->'011', 3->'00100' ...
    w = BitWriter()
    for v in [0, 1, 2, 3, 4, 5, 6, 7, 14, 255, 65534]:
        w.ue(v)
    w.write_rbsp_trailing_bits()
    r = BitReader(w.getvalue())
    for v in [0, 1, 2, 3, 4, 5, 6, 7, 14, 255, 65534]:
        assert r.ue() == v


def test_se_roundtrip():
    vals = [0, 1, -1, 2, -2, 3, -3, 100, -100, 2047, -2048]
    w = BitWriter()
    for v in vals:
        w.se(v)
    w.write_rbsp_trailing_bits()
    r = BitReader(w.getvalue())
    for v in vals:
        assert r.se() == v


def test_se_mapping():
    # spec 9.1.1: codeNum k -> (-1)^(k+1)*ceil(k/2): 0,1,-1,2,-2,...
    w = BitWriter()
    w.ue(0); w.ue(1); w.ue(2); w.ue(3); w.ue(4)
    w.write_rbsp_trailing_bits()
    r = BitReader(w.getvalue())
    assert [r.se() for _ in range(5)] == [0, 1, -1, 2, -2]


def test_u_roundtrip_random():
    rng = np.random.default_rng(0)
    widths = rng.integers(1, 25, size=200)
    vals = [int(rng.integers(0, 1 << w)) for w in widths]
    w = BitWriter()
    for v, n in zip(vals, widths):
        w.u(v, int(n))
    w.write_rbsp_trailing_bits()
    r = BitReader(w.getvalue())
    for v, n in zip(vals, widths):
        assert r.u(int(n)) == v


def test_more_rbsp_data():
    w = BitWriter()
    w.u(5, 7)
    w.write_rbsp_trailing_bits()
    r = BitReader(w.getvalue())
    assert r.more_rbsp_data()
    r.u(7)
    assert not r.more_rbsp_data()
    r.read_rbsp_trailing_bits()


def test_epb_roundtrip():
    payloads = [
        b"\x00\x00\x00\x00\x01\x02\x03",
        b"\x00\x00\x03\x00\x00\x02",
        b"\x00\x00\x00\x03",
        bytes(range(256)) + b"\x00\x00\x01\x00\x00\x00\x00\x02",
        b"\x00" * 10,
    ]
    for p in payloads:
        esc = insert_emulation_prevention(p)
        # escaped stream must not contain 00 00 0x with x <= 3
        for i in range(len(esc) - 2):
            if esc[i] == 0 and esc[i + 1] == 0:
                assert esc[i + 2] > 3 or esc[i + 2] == 3
                if esc[i + 2] == 3:
                    continue
        assert strip_emulation_prevention(esc) == p


def test_find_nal_units():
    data = (b"\x00\x00\x01\x67\xAA" +
            b"\x00\x00\x00\x01\x68\xBB\xCC" +
            b"\x00\x00\x01\x65\x01\x02\x00\x00")
    units = find_nal_units(data)
    payloads = [data[s:e] for s, e in units]
    assert payloads[0] == b"\x67\xAA"
    assert payloads[1] == b"\x68\xBB\xCC"
    assert payloads[2] == b"\x65\x01\x02"  # trailing zeros stripped
