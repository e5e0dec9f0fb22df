"""POC (spec 8.2.1) decode for pic_order_cnt_type 0/1/2 and pipelined
encode consistency.

Reference parity: ``hl_codec_264_pict.c:45-222`` — verified here by
encoding the same clip under each poc_type, requiring identical pixels,
correct decoded POC sequences, and reference-decoder acceptance."""
import numpy as np
import pytest
import subprocess
import os

from hartallo_tpu.api import Codec, CodecConfig

W, H, NF = 176, 144, 5
REF_ENV = dict(os.environ, REF_NO_SIMD="1")


def _clip():
    rng = np.random.default_rng(11)
    frames = []
    for t in range(NF):
        x = np.arange(W)[None, :]
        y = np.arange(H)[:, None]
        Y = np.clip(((x + 2 * y + 3 * t) % 256) +
                    rng.integers(0, 12, (H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 90) + rng.integers(0, 9,
                                                         (H // 2, W // 2))
        V = np.full((H // 2, W // 2), 160) + rng.integers(0, 9,
                                                          (H // 2, W // 2))
        frames.append(np.concatenate([Y.astype(np.uint8).ravel(),
                                      U.astype(np.uint8).ravel(),
                                      V.astype(np.uint8).ravel()]))
    return frames


def _encode(poc_type, clip):
    enc = Codec(CodecConfig(width=W, height=H, qp=30, gop_size=NF,
                            deblock=True, me_range=8, poc_type=poc_type))
    rs = enc.encode_frames(clip, W, H)
    return b"".join(r.headers + r.data for r in rs)


@pytest.mark.parametrize("poc_type", [0, 1, 2])
def test_poc_types_decode(poc_type, tmp_path, ref_driver):
    clip = _clip()
    stream = _encode(poc_type, clip)
    base = _encode(2, clip)

    dec = Codec(CodecConfig())
    out = dec.decode_annexb(stream)
    assert len(out) == NF
    # POC values per 8.2.1: IDR=0, then +2 per frame (all frames are refs)
    assert [r.poc for r in out] == [2 * i for i in range(NF)]

    # pixels identical regardless of POC signalling
    ref_out = Codec(CodecConfig()).decode_annexb(base)
    for a, b in zip(out, ref_out):
        assert np.array_equal(a.frame, b.frame)

    # the reference decoder must accept the stream (it runs 8.2.1 itself)
    s264 = tmp_path / f"poc{poc_type}.264"
    s264.write_bytes(stream)
    ryuv = tmp_path / "ref.yuv"
    subprocess.run([ref_driver, "decode", str(s264), str(ryuv), "1"],
                   check=True, env=REF_ENV, capture_output=True,
                   timeout=300)
    refdata = ryuv.read_bytes()
    assert len(refdata) == NF * W * H * 3 // 2
    mine = b"".join(bytes(r.frame) for r in out)
    assert mine == refdata


def test_pipelined_encode_matches_serial():
    """encode_frames (device-ahead pipeline) must produce byte-identical
    streams to one-frame-at-a-time encoding."""
    clip = _clip()
    cfg = dict(width=W, height=H, qp=30, gop_size=3,  # IDR mid-stream
               deblock=True, me_range=8)
    enc_a = Codec(CodecConfig(**cfg))
    pipelined = enc_a.encode_frames(clip, W, H)
    enc_b = Codec(CodecConfig(**cfg))
    serial = [enc_b.encode(f, W, H) for f in clip]
    for a, b in zip(pipelined, serial):
        assert a.headers == b.headers
        assert a.data == b.data
