"""SVC inter-layer motion inference (G.8.6.1): EP base_mode encode+decode.

The reference *encoder* cannot produce EP streams (its EL-P path crashes
on refIdx bookkeeping in hl_codec_264_pred_inter.c:262), so the oracle
direction is reversed: OUR encoder emits 2-layer dyadic streams whose
enhancement-layer P pictures use base_mode_flag=1 on every macroblock
(motion inferred from the base layer), and the REFERENCE DECODER's EP
path (hl_codec_264_decode_svc.c G.8.1.5.3 + utils.c G.8.6.1) must decode
them byte-identically to our decoder.

Deblocking caveat: the reference decoder never deblocks enhancement
pictures (hl_codec_264_deblock.c:186 G.8.7.2 is an empty stub), so
reference parity runs with deblock off; the deblock-on configuration is
pinned by decode == encoder-recon self-consistency instead.
"""
import pathlib
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

W0, H0, W1, H1, NF = 176, 144, 352, 288, 4


def _clips():
    import bench
    return (bench.make_clip(W0, H0, NF), bench.make_clip(W1, H1, NF))


def _encode(deblock, qp=30):
    from hartallo_tpu.api import Codec, CodecConfig
    b0, b1 = _clips()
    cfg = CodecConfig(qp=qp, gop_size=NF, deblock=deblock, me_range=8)
    cfg.add_layer(W0, H0)
    cfg.add_layer(W1, H1)
    enc = Codec(cfg)
    stream = b""
    recs = []
    from hartallo_tpu.decode.intra_recon import PAD
    for i in range(NF):
        r0 = enc.encode(b0[i], W0, H0)
        r1 = enc.encode(b1[i], W1, H1)
        stream += r0.headers + r0.data + r1.headers + r1.data
        el = enc._encoder.layers[1]
        planes = [np.asarray(p)[PAD:-PAD, PAD:-PAD]
                  for p in el._ref_planes]
        recs.append(np.concatenate([p.ravel() for p in planes])
                    .astype(np.uint8))
    return stream, recs


def _uses_pbl(stream):
    """The stream's EP slices must really exercise base_mode inference."""
    from hartallo_tpu.api import Codec, CodecConfig
    from hartallo_tpu.decode.slice_decode import MB_PBL
    import hartallo_tpu.decode.decoder as DM
    seen = []
    orig = DM.Decoder._infer_inter_layer_motion

    def spy(self, sd, sps, sh, dqid):
        seen.append(int((sd.mb_kind == MB_PBL).sum()))
        return orig(self, sd, sps, sh, dqid)
    DM.Decoder._infer_inter_layer_motion = spy
    try:
        Codec(CodecConfig()).decode_annexb(stream, tolerant=False)
    finally:
        DM.Decoder._infer_inter_layer_motion = orig
    return sum(seen)


@pytest.mark.parametrize("qp", [24, 30])
def test_ep_streams_match_reference_decoder(ref_driver, tmp_path, qp):
    from hartallo_tpu.api import Codec, CodecConfig
    stream, _ = _encode(deblock=False, qp=qp)
    (tmp_path / "s.264").write_bytes(stream)
    subprocess.run([ref_driver, "decode", str(tmp_path / "s.264"),
                    str(tmp_path / "r.yuv"), "1"], check=True,
                   capture_output=True, timeout=300,
                   env={"REF_NO_SIMD": "1", "PATH": "/usr/bin:/bin"})
    ref = (tmp_path / "r.yuv").read_bytes()
    out = Codec(CodecConfig()).decode_annexb(stream, tolerant=False)
    szB, szE = W0 * H0 * 3 // 2, W1 * H1 * 3 // 2
    oursB = [np.asarray(f.frame, np.uint8) for f in out if f.width == W0]
    oursE = [np.asarray(f.frame, np.uint8) for f in out if f.width == W1]
    assert len(oursB) == NF and len(oursE) == NF
    inter = b"".join(bytes(oursB[i]) + bytes(oursE[i]) for i in range(NF))
    assert len(ref) == NF * (szB + szE)
    assert inter == ref, "decode differs from reference decoder"
    assert _uses_pbl(stream) > 0


def test_ep_decode_matches_encoder_recon_with_deblock():
    from hartallo_tpu.api import Codec, CodecConfig
    stream, recs = _encode(deblock=True)
    out = Codec(CodecConfig()).decode_annexb(stream, tolerant=False)
    els = [np.asarray(f.frame, np.uint8) for f in out if f.width == W1]
    assert len(els) == NF
    for i in range(NF):
        assert (els[i] == recs[i]).all(), f"frame {i}"


def test_motion_inference_dyadic():
    from hartallo_tpu.svc.motion import infer_inter_layer_motion
    bgw, bgh = 2, 2
    bmv = np.zeros((bgh, bgw, 4, 4, 2), np.int32)
    bmv[0, 0, :, :] = [3, -5]
    bmv[0, 1, 2, 1] = [7, 9]
    bref = np.zeros((bgh, bgw, 4), np.int32)
    bref[0, 1, :] = 1
    bintra = np.zeros((bgh, bgw), bool)
    bintra[1, 0] = True
    mv, ref, ibl = infer_inter_layer_motion(bmv, bref, bintra, 4, 4, 2)
    # EL MB (0,0) maps to base MB (0,0) quadrant 0: all blocks 2*[3,-5]
    assert (mv[0, 0] == np.array([6, -10])).all()
    # EL 4x4 block covering base block (2,1) of base MB (0,1):
    # base global block (row 2, col 5) -> EL blocks rows 4-5, cols 10-11
    assert (mv[1, 2, 0:2, 2:4] == np.array([14, 18])).all()
    assert (ref[0, 2:4] == 1).all() and (ref[0, 0:2] == 0).all()
    # base MB (1,0) intra -> EL MBs (2..3, 0..1) are I_BL
    assert ibl[2:4, 0:2].all() and not ibl[0:2].any()
