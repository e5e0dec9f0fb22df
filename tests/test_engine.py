"""Engine layer: plugin registry + runtime set_option surface
(reference hl_codec.c:95-235; the reference plugin's own set_option is
a NOT_IMPLEMENTED stub, hl_codec_264.c:70-77 — ours applies the safe
runtime rebinds and declines the rest with the same error name)."""
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def test_registry_semantics():
    from hartallo_tpu import engine as E
    # builtins present
    avc = E.plugin_find(E.CODEC_TYPE_H264_AVC)
    svc = E.plugin_find(E.CODEC_TYPE_H264_SVC)
    assert avc.create is not None and svc.type == "h264-svc"
    with pytest.raises(E.EngineError) as ei:
        E.plugin_find("vp9")
    assert ei.value.code == "HL_ERROR_NOT_FOUND"
    # add-or-replace + unregister-compacts
    p = E.CodecPlugin(type="test", description="t", create=lambda c: None)
    E.plugin_register(p)
    assert E.plugin_find("test") is p
    E.plugin_unregister(p)
    with pytest.raises(E.EngineError):
        E.plugin_find("test")
    with pytest.raises(E.EngineError) as ei:
        E.plugin_unregister(p)
    assert ei.value.code == "HL_ERROR_NOT_FOUND"


def test_add_layer_validation():
    from hartallo_tpu import engine as E
    c = E.codec_create(E.CODEC_TYPE_H264_SVC)
    c.add_layer(96, 64)
    with pytest.raises(E.EngineError):       # not increasing
        c.add_layer(96, 64)
    with pytest.raises(E.EngineError):       # ratio 3 under strict
        c.add_layer(288, 192, strict_dyadic=True)
    c.add_layer(144, 96)                     # ESS ratio allowed
    # note: 1.5x passes even under strict — the reference's gate uses
    # integer division (96*1.5//96 == 1, a power of two), hl_codec.c:116
    c.clear_layers()
    assert c.config.layers == []


def test_set_option_runtime_qp():
    """qp set between pictures takes effect on the next picture."""
    import bench
    from hartallo_tpu import engine as E
    from hartallo_tpu.api import Codec, CodecConfig
    W, H = 96, 64
    clip = bench.make_clip(W, H, 3)
    c = E.codec_create(E.CODEC_TYPE_H264_AVC,
                       CodecConfig(width=W, height=H, qp=40, gop_size=3,
                                   deblock=True, me_range=8))
    data = b""
    r = c.encode(clip[0], W, H)
    data += r.headers + r.data
    c.set_option("qp", 24)
    for i in (1, 2):
        r = c.encode(clip[i], W, H)
        data += r.headers + r.data
    with pytest.raises(E.EngineError) as ei:
        c.set_option("entropy", "cabac")
    assert ei.value.code == "HL_ERROR_NOT_IMPLEMENTED"
    out = Codec(CodecConfig()).decode_annexb(data, tolerant=False)
    assert len(out) == 3

    def psnr(a, b):
        mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
        return 10 * np.log10(255 * 255 / max(mse, 1e-9))
    # qp 24 frames must be clearly better than the qp 40 frame
    assert psnr(out[1].frame, clip[1]) > psnr(out[0].frame, clip[0]) + 3
