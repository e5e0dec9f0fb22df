"""SVC extended spatial scalability (non-dyadic resolution ratios).

Covers the full G.8.6.1 ESS motion-inference derivation
(hartallo_tpu/svc/motion.py: position mapping G-9..G-14, mv scaling
G-232..G-235, refIdx merge G-244..G-248, sub-partition averaging
G-251..G-261) and the end-to-end 1.5x spatial-SVC round trip with EP
base_mode pictures.

Oracle note: the reference decoder (hl_codec_264_decode_svc.c) supports
ESS on paper (G.6.1 position derivation at hl_codec_264_utils.c:965)
but SEGFAULTS on any non-dyadic stream in practice — including plain
I_BL IDR + within-layer-P streams of the exact shape that round-trip
byte-identically through it at 2x (verified: rc=-11 for 96x64->144x96
with and without base_mode).  Non-dyadic correctness is therefore
pinned by (a) formula-level unit tests against the spec equations and
(b) decode == encoder-recon bit-exactness, the same strategy the SVC
suite already uses where the reference's own SVC is broken
(tests/test_svc.py docstring).
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

W0, H0 = 96, 64     # 6x4 MBs
W1, H1 = 144, 96    # 9x6 MBs -> ratio 1.5
NF = 4


def _resize_np(p, oh, ow):
    h, w = p.shape
    yi = np.arange(oh) * h // oh
    xi = np.arange(ow) * w // ow
    return p[yi[:, None], xi[None, :]]


def _clips():
    rng = np.random.default_rng(7)
    base, enh = [], []
    for t in range(NF):
        x = np.arange(W1)[None, :]
        y = np.arange(H1)[:, None]
        Y = ((x * 2 + y * 3 + 9 * t) % 256).astype(np.int32)
        Y[20:60, 30 + 4 * t:100 + 4 * t] = 205
        Y = np.clip(Y + rng.integers(0, 6, (H1, W1)), 0,
                    255).astype(np.uint8)
        U = np.full((H1 // 2, W1 // 2), 105, np.uint8)
        V = np.full((H1 // 2, W1 // 2), 145, np.uint8)
        enh.append(np.concatenate([Y.ravel(), U.ravel(), V.ravel()]))
        Yb = _resize_np(Y, H0, W0)
        Ub = _resize_np(U, H0 // 2, W0 // 2)
        Vb = _resize_np(V, H0 // 2, W0 // 2)
        base.append(np.concatenate([Yb.ravel(), Ub.ravel(), Vb.ravel()]))
    return base, enh


def test_ess_position_mapping_15x():
    """G-9..G-14 at 1.5x: EL 4x4 centres map to the expected base MBs."""
    from hartallo_tpu.svc.motion import infer_inter_layer_motion_ess
    bgw, bgh = 6, 4
    gw, gh = 9, 6
    bmv = np.zeros((bgh, bgw, 4, 4, 2), np.int32)
    bmv[...] = [6, -9]
    bref = np.zeros((bgh, bgw, 4), np.int32)
    bintra = np.zeros((bgh, bgw), bool)
    mv, ref, ibl = infer_inter_layer_motion_ess(bmv, bref, bintra, gw, gh)
    assert not ibl.any() and (ref == 0).all()
    # mv scaling G-232..G-235: scale = ((144<<16)+48)//96 = 98304 + 0
    # (exact 1.5 in 16.16) -> mv' = (mv*98304 + 32768) >> 16 = round(1.5mv)
    assert (mv[..., 0] == 9).all()      # 6 * 1.5
    assert (mv[..., 1] == -13).all()    # -9 * 1.5 = -13.5 -> >>16 floors

    # spot-check the position map: EL sample x = 4*X+1 maps to base
    # xRef = round(x * 2/3); EL block X=8 -> x=33 -> xRef=22 -> base MB 1
    scale = ((bgw * 16) << 16) // (gw * 16)  # exact: 2/3 in 16.16? no:
    scale = (((bgw * 16) << 16) + (gw * 16 >> 1)) // (gw * 16)
    x = 4 * 8 + 1
    xref = min((x * scale + (1 << 15)) >> 16, bgw * 16 - 1)
    assert xref == 22
    bintra2 = np.zeros((bgh, bgw), bool)
    bintra2[:, 1] = True                # base MB column 1 intra
    _, _, ibl2 = infer_inter_layer_motion_ess(bmv, bref, bintra2, gw, gh)
    # EL MB column 2 (samples 32..47, centres mapping to base 21..31 =
    # base MB 1) must be fully intra -> I_BL
    assert ibl2[:, 2].all()


def test_ess_reduces_to_rsrc_on_uniform_fields():
    """At same-res and dyadic ratios with per-base-MB-uniform motion the
    ESS derivation must agree with the RSRC index mapping (the merge and
    cleanup steps are no-ops on uniform fields; mv scaling is exact)."""
    from hartallo_tpu.svc.motion import (infer_inter_layer_motion,
                                         infer_inter_layer_motion_ess)
    rng = np.random.default_rng(5)
    bgw, bgh = 5, 3
    bmv = np.zeros((bgh, bgw, 4, 4, 2), np.int32)
    per_mb = rng.integers(-20, 21, (bgh, bgw, 2))
    bmv[...] = per_mb[:, :, None, None, :]
    bref = np.zeros((bgh, bgw, 4), np.int32)
    bintra = np.zeros((bgh, bgw), bool)
    bintra[2, 4] = True
    for ratio in (1, 2):
        gw, gh = bgw * ratio, bgh * ratio
        mv_r, ref_r, ibl_r = infer_inter_layer_motion(
            bmv, bref, bintra, gw, gh, ratio)
        mv_e, ref_e, ibl_e = infer_inter_layer_motion_ess(
            bmv, bref, bintra, gw, gh)
        assert np.array_equal(ibl_r, ibl_e), ratio
        ok = ~ibl_r
        assert np.array_equal(mv_r[ok], mv_e[ok]), ratio
        assert np.array_equal(ref_r[ok], ref_e[ok]), ratio


def test_ess_intra_hole_cleanup():
    """G-210..G-215: a mixed intra/inter base region fills intra holes
    from inter neighbours instead of flagging the whole EL MB I_BL."""
    from hartallo_tpu.svc.motion import infer_inter_layer_motion_ess
    bgw, bgh = 6, 4
    gw, gh = 9, 6
    bmv = np.zeros((bgh, bgw, 4, 4, 2), np.int32)
    bmv[...] = [4, 8]
    bref = np.zeros((bgh, bgw, 4), np.int32)
    bintra = np.zeros((bgh, bgw), bool)
    bintra[0, 0] = True                 # one intra base MB
    mv, ref, ibl = infer_inter_layer_motion_ess(bmv, bref, bintra, gw, gh)
    # EL MB (0,0) maps entirely inside base MB (0,0) -> I_BL; EL MB
    # (0,1) straddles base MBs 0 and 1 -> mixed -> holes filled, inter
    assert ibl[0, 0] and not ibl[0, 1]
    assert (mv[0, 1] == [6, 12]).all()  # filled from the inter part


def test_ess_subpartition_merge():
    """G-251..G-261: neighbouring blocks with mvDiff <= 1 are averaged
    into 8x8/8x4/4x8 shapes; blocks with larger differences are kept."""
    from hartallo_tpu.svc.motion import infer_inter_layer_motion_ess
    bgw, bgh = 2, 2
    gw, gh = 3, 3
    bmv = np.zeros((bgh, bgw, 4, 4, 2), np.int32)
    # base MB (0,0): per-4x4 mvs differing by 1 in x -> merge to average
    bmv[0, 0, :, :2] = [10, 0]
    bmv[0, 0, :, 2:] = [11, 0]
    bref = np.zeros((bgh, bgw, 4), np.int32)
    bintra = np.zeros((bgh, bgw), bool)
    mv, ref, ibl = infer_inter_layer_motion_ess(bmv, bref, bintra, gw, gh)
    # scale 1.5: 10->15, 11->17 (16.5 rounds via +32768>>16 = 17).
    # EL MB (0,0) 8x8 block 0 draws from base cols 0..1 (mv 15) ->
    # uniform -> stays 15; blocks straddling the 10/11 boundary merge
    assert not ibl.any()
    # EL MB (0,0) maps into base MB (0,0); its mvs must be the scaled
    # values or their G-255/G-256 averages (never anything else)
    vals = set(np.unique(mv[0, 0, :, :, 0]).tolist())
    assert vals <= {15, 16, 17}, vals
    assert {15, 17} <= vals


def _encode(deblock, ilp=True, qp=28):
    from hartallo_tpu.api import Codec, CodecConfig
    from hartallo_tpu.decode.intra_recon import PAD
    base, enh = _clips()
    cfg = CodecConfig(qp=qp, gop_size=NF, deblock=deblock, me_range=8)
    cfg.svc_inter_layer_p = ilp
    cfg.add_layer(W0, H0)
    cfg.add_layer(W1, H1)
    enc = Codec(cfg)
    stream = b""
    recs = []
    for i in range(NF):
        r0 = enc.encode(base[i], W0, H0)
        r1 = enc.encode(enh[i], W1, H1)
        stream += r0.headers + r0.data + r1.headers + r1.data
        el = enc._encoder.layers[1]
        planes = [np.asarray(p)[PAD:-PAD, PAD:-PAD]
                  for p in el._ref_planes]
        recs.append(np.concatenate([p.ravel() for p in planes])
                    .astype(np.uint8))
    return stream, recs


def test_ess_15x_ep_round_trip():
    """1.5x spatial SVC with EP base_mode P pictures: the decode must be
    byte-identical to the encoder's in-loop reconstruction, and the
    stream must actually exercise the ESS inference path."""
    from hartallo_tpu.api import Codec, CodecConfig
    from hartallo_tpu.decode.slice_decode import MB_PBL
    import hartallo_tpu.decode.decoder as DM
    stream, recs = _encode(deblock=True)
    seen = []
    orig = DM.Decoder._infer_inter_layer_motion

    def spy(self, sd, sps, sh, dqid):
        seen.append(int((sd.mb_kind == MB_PBL).sum()))
        return orig(self, sd, sps, sh, dqid)
    DM.Decoder._infer_inter_layer_motion = spy
    try:
        out = Codec(CodecConfig()).decode_annexb(stream, tolerant=False)
    finally:
        DM.Decoder._infer_inter_layer_motion = orig
    els = [np.asarray(f.frame, np.uint8) for f in out if f.width == W1]
    assert len(els) == NF
    for i in range(NF):
        assert (els[i] == recs[i]).all(), f"frame {i}"
    assert sum(seen) > 0, "stream never exercised base_mode inference"


def test_residual_resampling_differential():
    """upsample_residual_plane_np vs a scalar transcription of
    G-334..G-342 (bilinear within a 4x4 transform block, nearest across
    block edges, reference hl_codec_264_decode_svc.c:3400-3460)."""
    from hartallo_tpu.svc.upsample import (ref_positions,
                                           upsample_residual_plane_np)
    rng = np.random.default_rng(9)
    for (h, w, oh, ow, chroma) in [(32, 48, 64, 96, False),
                                   (32, 48, 48, 72, False),
                                   (16, 24, 24, 36, True)]:
        res = rng.integers(-255, 256, (h, w)).astype(np.int32)
        got = upsample_residual_plane_np(res, oh, ow, chroma)
        bx, px = ref_positions(ow, w, chroma)
        by, py = ref_positions(oh, h, chroma)
        exp = np.zeros((oh, ow), np.int64)
        for yo in range(oh):
            y0 = min(max(int(by[yo]), 0), h - 1)
            y1 = min(max(int(by[yo]) + 1, 0), h - 1)
            for xo in range(ow):
                x0 = min(max(int(bx[xo]), 0), w - 1)
                x1 = min(max(int(bx[xo]) + 1, 0), w - 1)
                t = []
                for yy in (y0, y1):
                    if x0 >> 2 == x1 >> 2:
                        t.append((16 - px[xo]) * res[yy, x0] +
                                 px[xo] * res[yy, x1])
                    else:
                        t.append(int(res[yy, x0] if px[xo] < 8
                                     else res[yy, x1]) << 4)
                if y0 >> 2 == y1 >> 2:
                    exp[yo, xo] = ((16 - py[yo]) * t[0] +
                                   py[yo] * t[1] + 128) >> 8
                else:
                    exp[yo, xo] = (t[0] if py[yo] < 8 else t[1]) + 8 >> 4
        assert np.array_equal(got, exp), (h, w, oh, ow, chroma)
