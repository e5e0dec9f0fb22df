"""Reference-encoded streams with dense high-frequency content.

KNOWN OPEN BUG (round-3 end): the reference encoder's output for content
with strong gradients + noise (large CAVLC levels with escape codes,
nC>=8 contexts, long run_before codes) desyncs our slice_data parse —
BOTH the C fast path (slicec.c, error -12) and the Python oracle parser
(EOF in coeff_token) fail at the same streams, while the reference
decoder decodes them fine.  The existing QCIF differential tests pass,
so the divergence is in a rarer symbol path the two parsers share.

Kept as xfail: the repro is the bench clip (bench.make_clip) through
``.refbuild/ref_driver encode``.  Top debugging lead: the level
escape machinery matches hl_codec_264_residual.c:484-542 line for line,
so the desync is most likely in the MB-layer syntax or the nC neighbor
derivation for a case our own encoder never emits.
"""
import pathlib
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


@pytest.mark.xfail(reason="known CAVLC parse desync on dense-content "
                   "reference streams (see module docstring)",
                   strict=False)
def test_dense_reference_stream_decodes(ref_driver, tmp_path):
    import bench
    from hartallo_tpu.api import Codec, CodecConfig
    W, H, NF = 176, 144, 2
    clip = bench.make_clip(W, H, NF)
    (tmp_path / "in.yuv").write_bytes(b"".join(bytes(f) for f in clip))
    subprocess.run([ref_driver, "encode", str(tmp_path / "in.yuv"),
                    str(W), str(H), str(tmp_path / "out.264"), "30",
                    str(NF), str(NF), "1", "16", "1"], check=True,
                   capture_output=True, timeout=300)
    stream = (tmp_path / "out.264").read_bytes()
    out = Codec(CodecConfig()).decode_annexb(stream, tolerant=False)
    assert len(out) == NF
