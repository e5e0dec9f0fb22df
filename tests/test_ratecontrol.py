"""JVT-G012 rate control: achieved bitrate must track the target and the
stream must stay conformant (self-decodable)."""
import numpy as np
import pytest

from hartallo_tpu.api import Codec, CodecConfig
from hartallo_tpu.encode.ratecontrol import (RateControl, guess_best_bitrate,
                                             qp2qstep, qstep2qp)

W, H, NF = 176, 144, 12


def test_qstep_roundtrip():
    for qp in range(52):
        assert qstep2qp(qp2qstep(qp)) == qp


def test_guess_best_bitrate():
    b = guess_best_bitrate(2, 352, 288, 15.0)
    assert 100_000 < b < 400_000


def _clip():
    rng = np.random.default_rng(8)
    frames = []
    for t in range(NF):
        x = np.arange(W)[None, :]
        y = np.arange(H)[:, None]
        Y = ((x + 2 * y) % 256).astype(np.int32)
        Y[30 + 2 * t:70 + 2 * t, 40 + 5 * t:100 + 5 * t] = 200
        Y = np.clip(Y + rng.integers(0, 10, (H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 100, np.uint8)
        V = np.full((H // 2, W // 2), 150, np.uint8)
        frames.append(np.concatenate([Y.astype(np.uint8).ravel(),
                                      U.ravel(), V.ravel()]))
    return frames


@pytest.mark.parametrize("target_bps", [150_000, 400_000])
def test_rc_tracks_target(target_bps):
    fps = 30.0
    cfg = CodecConfig(width=W, height=H, gop_size=NF, deblock=True,
                      me_range=8, rc_bitrate=target_bps, fps=(1, 30))
    codec = Codec(cfg)
    total_bits = 0
    stream = b""
    for f in _clip():
        r = codec.encode(f, W, H)
        stream += r.headers + r.data
        total_bits += (len(r.headers) + len(r.data)) * 8
    achieved_bps = total_bits * fps / NF
    # frame-level RC on a short clip: within a factor ~[0.5, 1.6]
    assert 0.45 * target_bps < achieved_bps < 1.7 * target_bps, \
        f"target {target_bps}, achieved {achieved_bps:.0f}"
    # stream remains decodable
    dec = Codec(CodecConfig())
    results = dec.decode_annexb(stream)
    assert len(results) == NF


def test_rc_bitrate_tracking_three_rates(ref_driver, tmp_path):
    """<=5% tracking error at 3 rates (VERDICT r4 item 8), with
    basic-unit row QPs in the stream — and the streams stay decodable
    by us AND the reference decoder (per-MB qp_delta round trip)."""
    import subprocess

    import numpy as np

    from hartallo_tpu.api import Codec, CodecConfig
    W, H, NF, FPS = 176, 144, 24, 30.0
    rng = np.random.default_rng(5)
    frames = []
    x = np.arange(W)[None, :]
    y = np.arange(H)[:, None]
    for t in range(NF):
        Y = ((x * 2 + y + 5 * t) % 256).astype(np.int32)
        Y[30:90, 40 + 3 * t:120 + 3 * t] = 200
        Y = np.clip(Y + rng.integers(0, 10, (H, W)), 0, 255)
        U = np.full((H // 2, W // 2), 108, np.uint8)
        V = np.full((H // 2, W // 2), 136, np.uint8)
        frames.append(np.concatenate([Y.astype(np.uint8).ravel(),
                                      U.ravel(), V.ravel()]))
    for rate in (100_000, 300_000, 800_000):
        enc = Codec(CodecConfig(width=W, height=H, gop_size=NF // 2,
                                deblock=True, me_range=8,
                                rc_bitrate=rate, fps=(1, 30)))
        stream = b""
        for f in frames:
            r = enc.encode(f, W, H)
            stream += r.headers + r.data
        achieved = len(stream) * 8 * FPS / NF
        err = abs(achieved - rate) / rate
        assert err < 0.05, f"rate {rate}: achieved {achieved:.0f} " \
                           f"({err * 100:.1f}% off)"
        out = Codec(CodecConfig()).decode_annexb(stream, tolerant=False)
        assert len(out) == NF
        (tmp_path / "rc.264").write_bytes(stream)
        subprocess.run([ref_driver, "decode", str(tmp_path / "rc.264"),
                        str(tmp_path / "rc.yuv"), "1"], check=True,
                       capture_output=True, timeout=300,
                       env={"REF_NO_SIMD": "1"})
        ref = (tmp_path / "rc.yuv").read_bytes()
        ours = b"".join(bytes(np.asarray(f.frame, np.uint8).ravel())
                        for f in out)
        assert ours == ref, f"rate {rate}: ref decode mismatch"
