"""Host-side bitstream reader: fixed-width reads + Exp-Golomb (ue/se/te).

Semantics follow spec 9.1 (parsing of Exp-Golomb codes) and the reference's
inline cursor (``hl_codec_264_bits.h``: ``read_u1/u/ue/se/te``,
``more_rbsp_data``), re-expressed as a window-cached reader over an RBSP byte
buffer (emulation-prevention bytes already stripped; see
``hartallo_tpu.bitio.annexb``).
"""
from __future__ import annotations


class BitReader:
    __slots__ = ("data", "nbits", "pos")

    def __init__(self, data: bytes):
        self.data = bytes(data)
        self.nbits = len(self.data) * 8
        self.pos = 0  # absolute bit position

    # -- fixed-width ------------------------------------------------------
    def u(self, n: int) -> int:
        """Read n bits MSB-first as an unsigned integer."""
        if n == 0:
            return 0
        pos = self.pos
        end = pos + n
        if end > self.nbits:
            raise EOFError("bitstream overrun")
        first = pos >> 3
        last = (end + 7) >> 3
        chunk = int.from_bytes(self.data[first:last], "big")
        shift = (last << 3) - end
        self.pos = end
        return (chunk >> shift) & ((1 << n) - 1)

    def u1(self) -> int:
        return self.u(1)

    # -- Exp-Golomb -------------------------------------------------------
    def ue(self) -> int:
        """Unsigned Exp-Golomb (spec 9.1)."""
        # Peek up to 32 bits to locate the first 1 bit (leadingZeroBits).
        pos = self.pos
        zeros = 0
        while True:
            avail = min(32, self.nbits - pos)
            if avail <= 0:
                raise EOFError("ue(): bitstream overrun")
            w = self._peek(pos, avail)
            if w == 0:
                zeros += avail
                pos += avail
                continue
            lead = avail - w.bit_length()
            zeros += lead
            pos += lead
            break
        self.pos = pos + 1  # consume the terminating 1 bit
        if zeros == 0:
            return 0
        info = self.u(zeros)
        return (1 << zeros) - 1 + info

    def se(self) -> int:
        """Signed Exp-Golomb (spec 9.1.1): k -> (-1)^(k+1) * ceil(k/2)."""
        k = self.ue()
        return (k + 1) >> 1 if (k & 1) else -(k >> 1)

    def te(self, value_range: int) -> int:
        """Truncated Exp-Golomb (spec 9.1.1)."""
        if value_range == 1:
            return 1 - self.u1()
        return self.ue()

    # -- helpers ----------------------------------------------------------
    def _peek(self, pos: int, n: int) -> int:
        first = pos >> 3
        end = pos + n
        last = (end + 7) >> 3
        chunk = int.from_bytes(self.data[first:last], "big")
        shift = (last << 3) - end
        return (chunk >> shift) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        """Peek n bits without consuming (short reads padded with 0s)."""
        avail = self.nbits - self.pos
        if avail >= n:
            return self._peek(self.pos, n)
        if avail <= 0:
            return 0
        return self._peek(self.pos, avail) << (n - avail)

    def skip(self, n: int) -> None:
        self.pos += n
        if self.pos > self.nbits:
            raise EOFError("skip past end")

    def byte_aligned(self) -> bool:
        return (self.pos & 7) == 0

    def bits_left(self) -> int:
        return self.nbits - self.pos

    def more_rbsp_data(self) -> bool:
        """Spec 7.2: true iff bits remain beyond the rbsp_stop_one_bit
        (the last 1 bit in the stream, followed only by zero bits)."""
        idx = self.pos >> 3
        used = self.pos & 7
        width = (len(self.data) - idx) * 8 - used
        if width <= 0:
            return False
        tail = int.from_bytes(self.data[idx:], "big")
        if used:
            tail &= (1 << width) - 1
        if tail == 0:
            return False  # malformed (no stop bit), nothing left to parse
        # The stop bit is the last set bit. No data remains iff the very
        # next bit is that stop bit, i.e. the tail is exactly 1 followed by
        # zeros: tail == 1 << (width - 1).
        return tail != (1 << (width - 1))

    def read_rbsp_trailing_bits(self) -> None:
        one = self.u1()
        if one != 1:
            raise ValueError("rbsp_stop_one_bit != 1")
        while not self.byte_aligned():
            if self.u1() != 0:
                raise ValueError("rbsp_alignment_zero_bit != 0")
