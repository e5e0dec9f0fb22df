"""DPB machinery stress: MMCO ops 1/2/3/4/5/6, long-term references and
ref-list modifications, differentially decoded against the reference
decoder (test_conformance.c intent: streams chosen to hit exactly these
paths).

Construction: take a conforming IPPP stream from our encoder and rewrite
slice headers to exercise the DPB branches in ways that PRESERVE the
reference-list ordering the payload bits assume (RefPicList0[0] must
stay the previous frame), so the pixel output of every variant must be
bit-identical to the original stream's decode — checked against both our
decoder and the reference decoder."""
import numpy as np
import pytest

from hartallo_tpu.api import Codec, CodecConfig
from hartallo_tpu.decode.sliceheader import MMCO, RefPicListMod

from _rewrite import (decode_ours, decode_reference, rewrite_stream)

W, H, NF = 96, 80, 6


def _clip():
    rng = np.random.default_rng(4)
    frames = []
    x = np.arange(W)[None, :]
    y = np.arange(H)[:, None]
    for t in range(NF):
        Y = ((x * 2 + y * 3 + 7 * t) % 256).astype(np.int32)
        Y[20:60, 10 + 5 * t:60 + 5 * t] = 200
        Y = np.clip(Y + rng.integers(0, 8, (H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 100, np.uint8)
        V = np.full((H // 2, W // 2), 150, np.uint8)
        frames.append(np.concatenate([Y.astype(np.uint8).ravel(),
                                      U.ravel(), V.ravel()]))
    return frames


@pytest.fixture(scope="module")
def base_stream():
    enc = Codec(CodecConfig(width=W, height=H, qp=30, gop_size=NF,
                            deblock=True, me_range=8))
    res = enc.encode_frames(_clip(), W, H)
    stream = b"".join(r.headers + r.data for r in res)
    plain = decode_ours(stream)
    assert len(plain) == NF
    return stream, plain


def _check(stream, plain, ref_driver, tmp_path):
    ours = decode_ours(stream)
    assert len(ours) == len(plain)
    for i, (a, b) in enumerate(zip(ours, plain)):
        assert np.array_equal(a, b), f"frame {i} changed by DPB rewrite"
    ref = decode_reference(ref_driver, stream, tmp_path)
    got = np.concatenate(ours)
    assert np.array_equal(np.frombuffer(ref, np.uint8), got), \
        "reference decoder disagrees"


def test_mmco6_longterm_chain(base_stream, ref_driver, tmp_path):
    """Every P frame predicts from a LONG-TERM reference: frame i-1 is
    long-term idx 0, selected at index 0 via a ref-list modification
    (idc 2), then freed (MMCO 2) while the current frame takes its place
    (MMCO 6).  Exercises ops 1/2/4/6 + the long-term reflist-mod path
    with a conforming DPB (max 2 refs, adaptive marking frees
    explicitly)."""
    stream, plain = base_stream

    def esps(sps):
        sps.max_num_ref_frames = 2

    def edit(sh, hdr, i):
        sh.adaptive_ref_pic_marking_mode_flag = 1
        if i == 0:
            # frame 1: DPB {IDR short}; become lt0 alongside it
            sh.mmcos.append(MMCO(op=4, value1=1))      # MaxLtIdx = 0
            sh.mmcos.append(MMCO(op=6, value1=0))      # current -> lt 0
            return
        # select the long-term prev frame as RefPicList0[0]
        sh.ref_pic_list_mods_l0 = [RefPicListMod(idc=2, value=0)]
        if i == 1:
            # frame 2: also unmark the IDR (picNum 0; frame_num is 2)
            sh.mmcos.append(MMCO(op=1, value1=1))
        sh.mmcos.append(MMCO(op=2, value1=0))          # free lt 0
        sh.mmcos.append(MMCO(op=6, value1=0))          # current -> lt 0

    # ours-only from frame 2 on: the reference decoder aborts at the
    # first long-term ref-list modification (idc 2) — it decodes exactly
    # 2 frames of this legal stream (both bit-exact) and gives up
    s2 = rewrite_stream(stream, edit_sps=esps, edit_slice=edit)
    ours = decode_ours(s2)
    assert len(ours) == len(plain)
    for i, (a, b) in enumerate(zip(ours, plain)):
        assert np.array_equal(a, b), f"frame {i} changed by DPB rewrite"
    ref = decode_reference(ref_driver, s2, tmp_path)
    fsz = W * H * 3 // 2
    assert len(ref) >= 2 * fsz
    assert np.array_equal(np.frombuffer(ref[:2 * fsz], np.uint8),
                          np.concatenate(ours[:2]))


def test_longterm_passenger_sliding_window(base_stream, ref_driver,
                                           tmp_path):
    """The IDR is promoted to long-term (MMCO 3) and rides in the DPB
    while the short-term sliding window keeps cycling; the final P frame
    unmarks it (MMCO 2).  RefPicList0[0] stays the previous short-term
    frame throughout (8.2.4.2.1 orders short-term first)."""
    stream, plain = base_stream

    def esps(sps):
        sps.max_num_ref_frames = 2

    def edit(sh, hdr, i):
        if i == 0:
            sh.adaptive_ref_pic_marking_mode_flag = 1
            sh.mmcos.append(MMCO(op=4, value1=1))           # MaxLtIdx 0
            sh.mmcos.append(MMCO(op=3, value1=0, value2=0))  # IDR -> lt0
        elif i == NF - 2:
            sh.adaptive_ref_pic_marking_mode_flag = 1
            sh.mmcos.append(MMCO(op=2, value1=0))           # unmark lt0
            # adaptive marking suspends the sliding window: free the
            # oldest short-term explicitly to keep the DPB conforming
            sh.mmcos.append(MMCO(op=1, value1=1))

    _check(rewrite_stream(stream, edit_sps=esps, edit_slice=edit), plain,
           ref_driver, tmp_path)


def test_mmco1_two_refs(base_stream, ref_driver, tmp_path):
    """SPS raised to 2 reference frames; each P slice unmarks the older
    short-term ref via MMCO 1, keeping RefPicList0[0] = previous."""
    stream, plain = base_stream

    def esps(sps):
        sps.max_num_ref_frames = 2

    def edit(sh, hdr, i):
        if i > 0:
            # difference_of_pic_nums_minus1 = 1 -> picNum currFrame-2
            sh.mmcos.append(MMCO(op=1, value1=1))
        sh.adaptive_ref_pic_marking_mode_flag = 1

    _check(rewrite_stream(stream, edit_sps=esps, edit_slice=edit), plain,
           ref_driver, tmp_path)


def test_mmco3_longterm_promote(base_stream, ref_driver, tmp_path):
    """Two-ref DPB; each slice promotes the older short-term to
    long-term (MMCO 3) then unmarks it (MMCO 2) — short-term list first
    per 8.2.4.2.1 keeps RefPicList0[0] = previous frame."""
    stream, plain = base_stream

    def esps(sps):
        sps.max_num_ref_frames = 2

    def edit(sh, hdr, i):
        if i > 0:
            sh.mmcos.append(MMCO(op=4, value1=1))            # MaxLtIdx 0
            sh.mmcos.append(MMCO(op=3, value1=1, value2=0))  # older -> lt0
            sh.mmcos.append(MMCO(op=2, value1=0))            # unmark lt0
        sh.adaptive_ref_pic_marking_mode_flag = 1

    _check(rewrite_stream(stream, edit_sps=esps, edit_slice=edit), plain,
           ref_driver, tmp_path)


def test_reflist_modification_identity(base_stream, ref_driver, tmp_path):
    """Explicit ref_pic_list_modification selecting the previous frame
    first (abs_diff_pic_num_minus1 = 0, subtract) — identical list,
    exercises 8.2.4.3."""
    stream, plain = base_stream

    def esps(sps):
        sps.max_num_ref_frames = 2

    def edit(sh, hdr, i):
        sh.ref_pic_list_mods_l0 = [RefPicListMod(idc=0, value=0)]

    _check(rewrite_stream(stream, edit_sps=esps, edit_slice=edit), plain,
           ref_driver, tmp_path)


def test_mmco5_reset_on_last(base_stream):
    """MMCO 5 (reset) on the final P frame — nothing references it, but
    the op must parse, clear the DPB and reset the POC state.  (Ours
    only: the reference decoder HANGS on this legal stream — its MMCO 5
    handling never terminates — so no external cross-check here.)"""
    stream, plain = base_stream

    def edit(sh, hdr, i):
        if i == NF - 2:                   # last P slice
            sh.mmcos.append(MMCO(op=5))
            sh.adaptive_ref_pic_marking_mode_flag = 1

    ours = decode_ours(rewrite_stream(stream, edit_slice=edit))
    assert len(ours) == len(plain)
    for a, b in zip(ours, plain):
        assert np.array_equal(a, b)
