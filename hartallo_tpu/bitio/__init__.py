from hartallo_tpu.bitio.reader import BitReader
from hartallo_tpu.bitio.writer import BitWriter
from hartallo_tpu.bitio.annexb import (
    find_nal_units,
    strip_emulation_prevention,
    insert_emulation_prevention,
)

__all__ = [
    "BitReader", "BitWriter", "find_nal_units",
    "strip_emulation_prevention", "insert_emulation_prevention",
]
