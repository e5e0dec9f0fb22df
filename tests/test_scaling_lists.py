"""Scaling-list dequant (VERDICT r4 item 7): a stream whose SPS carries
non-flat 4x4 scaling lists must decode with the per-PPS LevelScale
applied (8.5.9/8.5.12.1), byte-identical to the reference decoder
(hl_codec_264_quant.c:68-110); flat streams are untouched (covered by
the conformance suite)."""
import pathlib
import subprocess

import numpy as np
import pytest

from hartallo_tpu.bitio import (BitReader, BitWriter, find_nal_units,
                                insert_emulation_prevention,
                                strip_emulation_prevention)
from hartallo_tpu.decode import nal as N
from hartallo_tpu.decode.params import (DEFAULT_4X4_INTER,
                                        DEFAULT_4X4_INTRA, SPS,
                                        effective_weight4x4)

REF = pathlib.Path(__file__).resolve().parent.parent / ".refbuild" / \
    "ref_driver"


def _encode_clip(W, H, NF, qp=28):
    from hartallo_tpu.api import Codec, CodecConfig
    rng = np.random.default_rng(11)
    x = np.arange(W)[None, :]
    y = np.arange(H)[:, None]
    frames = []
    for t in range(NF):
        Y = ((x * 3 + y * 5) % 256).astype(np.int32)
        Y[8 + 2 * t:20 + 2 * t, 6 + 3 * t:26 + 3 * t] = 60
        Y = np.clip(Y + rng.integers(0, 10, (H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 90) + rng.integers(0, 10,
                                                         (H // 2, W // 2))
        V = np.full((H // 2, W // 2), 170) + rng.integers(0, 10,
                                                          (H // 2, W // 2))
        frames.append(np.concatenate([Y.astype(np.uint8).ravel(),
                                      U.astype(np.uint8).ravel(),
                                      V.astype(np.uint8).ravel()]))
    enc = Codec(CodecConfig(width=W, height=H, qp=qp, gop_size=NF,
                            deblock=True, me_range=8))
    return b"".join(r.headers + r.data
                    for r in enc.encode_frames(frames, W, H))


def _with_scaling_lists(stream: bytes, lists=None) -> bytes:
    """Rewrite the stream's SPS: High profile + 4x4 scaling lists
    (defaults for intra + a ramp for inter unless given) + flat 8x8."""
    out = []
    ramp = np.clip(np.arange(16) + 9, 8, 40).astype(np.int32)
    for s0, e0 in find_nal_units(stream):
        nb = stream[s0:e0]
        r = BitReader(strip_emulation_prevention(nb))
        hdr = N.parse_nal_header(r)
        if hdr.type == N.NAL_SPS:
            sps = SPS.parse(r)
            sps.profile_idc = 100
            sps.scaling_lists_4x4 = (
                lists if lists is not None
                else [DEFAULT_4X4_INTRA] * 3 + [ramp] * 3)
            sps.scaling_lists_8x8 = [np.full(64, 16, np.int32)] * 2
            w = BitWriter()
            N.write_nal_header(w, 3, N.NAL_SPS)
            sps.write(w)
            nb = insert_emulation_prevention(w.getvalue())
        out.append(b"\x00\x00\x00\x01" + nb)
    return b"".join(out)


def test_effective_weight_roundtrip():
    """Writer -> parser -> 8.5.9 derivation round-trips the lists."""
    from hartallo_tpu.core.tables import ZIGZAG_4x4
    ramp = np.clip(np.arange(16) + 9, 8, 40).astype(np.int32)
    sps = SPS()
    sps.profile_idc = 100
    sps.scaling_lists_4x4 = [DEFAULT_4X4_INTRA] * 3 + [ramp] * 3
    sps.scaling_lists_8x8 = [np.full(64, 16, np.int32)] * 2
    w = BitWriter()
    sps.write(w)
    sps2 = SPS.parse(BitReader(w.getvalue()))
    w4 = effective_weight4x4(sps2, type("P", (), {})())
    assert w4 is not None
    exp = np.zeros((4, 4), np.int32)
    exp.reshape(-1)[ZIGZAG_4x4.reshape(-1)] = DEFAULT_4X4_INTRA
    assert np.array_equal(w4[0, 0], exp)
    exp.reshape(-1)[ZIGZAG_4x4.reshape(-1)] = ramp
    assert np.array_equal(w4[1, 0], exp)


def test_dequant_weights_vs_reference_formula():
    """Device dequant/DC-descale with weightScale == a direct numpy port
    of the reference formulas (hl_codec_264_quant.c:68-110 scale_residual,
    hl_codec_264_transf.c:581-601 luma DC, :680-690 chroma DC — the
    chroma DC indexes the INTRA list, matching that code)."""
    import jax.numpy as jnp

    from hartallo_tpu.core.tables import QUANT_V
    from hartallo_tpu.decode.intra_recon import (_dc_descale_chroma_w,
                                                 _dc_descale_luma_w,
                                                 _dequant_w)
    rng = np.random.default_rng(3)
    w = rng.integers(4, 64, (2, 3, 4, 4)).astype(np.int32)
    LS = w[:, :, None] * QUANT_V[None, None]        # (2,3,6,4,4)
    for qp in (0, 5, 17, 23, 24, 30, 47, 51):
        c = rng.integers(-200, 200, (32, 4, 4)).astype(np.int32)
        inter = rng.integers(0, 2, 32)
        cls = rng.integers(0, 3, 32)
        ls = LS[inter, cls, qp % 6]                 # (32,4,4)
        got = np.asarray(_dequant_w(jnp.asarray(c),
                                    jnp.full((32,), qp, jnp.int32),
                                    jnp.asarray(ls)))
        for b in range(32):
            for i in range(4):
                for j in range(4):
                    if qp >= 24:
                        exp = (c[b, i, j] * ls[b, i, j]) << (qp // 6 - 4)
                    else:
                        exp = (c[b, i, j] * ls[b, i, j] +
                               (1 << (3 - qp // 6))) >> (4 - qp // 6)
                    assert got[b, i, j] == exp, (qp, b, i, j)
        # luma DC (8.5.10 with scale = LevelScale[0][0][m][0][0])
        dcc = rng.integers(-60, 60, (8, 4, 4)).astype(np.int32)
        s00 = LS[0, 0, qp % 6, 0, 0]
        gdc = np.asarray(_dc_descale_luma_w(
            jnp.asarray(dcc), jnp.full((8,), qp, jnp.int32),
            jnp.full((8,), s00, jnp.int32)))
        from hartallo_tpu.decode.d_pool import _hadamard4_np
        f = _hadamard4_np(dcc)
        if qp >= 36:
            exp = (f * s00) << (qp // 6 - 6)
        else:
            exp = (f * s00 + (1 << (5 - qp // 6))) >> (6 - qp // 6)
        assert np.array_equal(gdc, exp), qp
        # chroma DC (8.5.11, 4:2:0)
        dc2 = rng.integers(-60, 60, (8, 2, 2)).astype(np.int32)
        s00c = LS[0, 1, qp % 6, 0, 0]
        gc = np.asarray(_dc_descale_chroma_w(
            jnp.asarray(dc2), jnp.full((8,), qp, jnp.int32),
            jnp.full((8,), s00c, jnp.int32)))
        t00 = dc2[:, 0, 0] + dc2[:, 1, 0]
        t01 = dc2[:, 0, 1] + dc2[:, 1, 1]
        t10 = dc2[:, 0, 0] - dc2[:, 1, 0]
        t11 = dc2[:, 0, 1] - dc2[:, 1, 1]
        f2 = np.stack([np.stack([t00 + t01, t00 - t01], -1),
                       np.stack([t10 + t11, t10 - t11], -1)], -2)
        exp = ((f2 * s00c) << (qp // 6)) >> 5
        assert np.array_equal(gc, exp), qp


def test_nonflat_stream_decodes_and_flat_lists_are_identity():
    """End-to-end routing: a non-flat-list stream decodes through the
    general path and differs from the flat decode; present-but-all-16
    lists reproduce the flat decode bit-exactly.

    (The reference decoder cannot serve as the end-to-end oracle here:
    it segfaults on ANY profile-100 stream — lists or not — during its
    second PPS derive; verified by printf-bisect of
    _hl_codec_264_nal_pps_derive.  The formula-level differential above
    covers the semantics instead.)"""
    from hartallo_tpu.api import Codec, CodecConfig
    W, H, NF = 64, 48, 4
    base = _encode_clip(W, H, NF)
    flat_out = Codec(CodecConfig()).decode_annexb(base, tolerant=False)

    flat16 = np.full(16, 16, np.int32)
    ident = _with_scaling_lists(base, [flat16] * 6)
    got = Codec(CodecConfig()).decode_annexb(ident, tolerant=False)
    for a, b in zip(flat_out, got):
        assert np.array_equal(a.frame, b.frame)

    nonflat = _with_scaling_lists(base)
    got2 = Codec(CodecConfig()).decode_annexb(nonflat, tolerant=False)
    assert any(not np.array_equal(a.frame, b.frame)
               for a, b in zip(flat_out, got2))
