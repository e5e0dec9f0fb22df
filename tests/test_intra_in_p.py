"""Intra-in-P: per-MB intra/inter choice in P frames
(hl_codec_264_slice.c:1797 — the reference picks intra vs inter per MB).

A smooth scene change mid-GOP makes inter prediction useless while intra
prediction is cheap, so the device pipeline must flip those MBs to
I4x4/I16 inside the P frame; the streams must stay byte-identical
through the reference decoder."""
import pathlib
import subprocess
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

W, H, NF = 176, 144, 6


def _clip_with_scene_change():
    rng = np.random.default_rng(4)
    x = np.arange(W)[None, :]
    y = np.arange(H)[:, None]
    frames = []
    for t in range(NF):
        if t < 3:
            Y = ((x * 2 + y * 3 + 5 * t) % 256).astype(np.int32)
        else:
            # new scene: smooth orthogonal gradient (inter useless,
            # intra trivial)
            Y = ((255 - x + 2 * y) % 256).astype(np.int32)
        Y = np.clip(Y + rng.integers(0, 4, (H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 100, np.uint8)
        V = np.full((H // 2, W // 2), 150, np.uint8)
        frames.append(np.concatenate([Y.astype(np.uint8).ravel(),
                                      U.ravel(), V.ravel()]))
    return frames


def test_intra_in_p_round_trip(ref_driver, tmp_path):
    from hartallo_tpu.api import Codec, CodecConfig
    import hartallo_tpu.decode.decoder as DM
    from hartallo_tpu.decode.slice_decode import MB_I16, MB_I4X4

    clip = _clip_with_scene_change()
    enc = Codec(CodecConfig(width=W, height=H, qp=30, gop_size=NF,
                            deblock=True, me_range=8))
    stream = b"".join(r.headers + r.data
                      for r in enc.encode_frames(clip, W, H))
    (tmp_path / "s.264").write_bytes(stream)
    subprocess.run([ref_driver, "decode", str(tmp_path / "s.264"),
                    str(tmp_path / "r.yuv"), "1"], check=True,
                   capture_output=True, timeout=300,
                   env={"REF_NO_SIMD": "1"})
    ref = (tmp_path / "r.yuv").read_bytes()

    intra_in_p = [0]
    orig = DM.Decoder._reconstruct

    def spy(self, sps, pps, sh, nh, sd, layer, dqid):
        if sh.is_p:
            intra_in_p[0] += int(((sd.mb_kind == MB_I16) |
                                  (sd.mb_kind == MB_I4X4)).sum())
        return orig(self, sps, pps, sh, nh, sd, layer, dqid)

    DM.Decoder._reconstruct = spy
    try:
        out = Codec(CodecConfig()).decode_annexb(stream, tolerant=False)
    finally:
        DM.Decoder._reconstruct = orig
    assert len(out) == NF
    ours = b"".join(bytes(np.asarray(f.frame, np.uint8).ravel())
                    for f in out)
    assert ours == ref, "decode differs from reference decoder"
    assert intra_in_p[0] > 20, \
        f"scene change produced only {intra_in_p[0]} intra MBs in P frames"


def test_intra_in_p_off_still_round_trips(ref_driver, tmp_path):
    from hartallo_tpu.api import Codec, CodecConfig
    clip = _clip_with_scene_change()
    enc = Codec(CodecConfig(width=W, height=H, qp=30, gop_size=NF,
                            deblock=True, me_range=8, intra_in_p=False))
    stream = b"".join(r.headers + r.data
                      for r in enc.encode_frames(clip, W, H))
    (tmp_path / "s.264").write_bytes(stream)
    subprocess.run([ref_driver, "decode", str(tmp_path / "s.264"),
                    str(tmp_path / "r.yuv"), "1"], check=True,
                   capture_output=True, timeout=300,
                   env={"REF_NO_SIMD": "1"})
    ref = (tmp_path / "r.yuv").read_bytes()
    out = Codec(CodecConfig()).decode_annexb(stream, tolerant=False)
    ours = b"".join(bytes(np.asarray(f.frame, np.uint8).ravel())
                    for f in out)
    assert ours == ref
