"""SVC spatial-layer encoder (2+ dyadic layers, Annex G subset).

Reference parity: ``hl_codec_264_encode.c:282-367`` (SVC NAL prefix/
extension writing) and the spatial-scalability encode path
(``hl_codec_264_encode.c:288-289`` — the reference supports spatial
scalability only; quality/temporal hardwired to 0).  This implementation
adds real temporal scalability on top (cfg.temporal_layers=2: alternate
P frames are non-reference with temporal_id = 1 in the prefix/extension
NAL header, droppable without affecting the T0 chain), which the
reference lacks (hl_codec_264_encode.c:288-289 hardwires temporal_id 0).

Layer scheme (round-1 scope):
- base layer: plain AVC (SPS/PPS id 0), each slice preceded by a prefix
  NAL (type 14) carrying the SVC extension header.
- enhancement layer(s): subset SPS (profile Scalable Baseline, id L) +
  PPS id L; IDR pictures are all-I_BL (inter-layer intra from the
  16-phase-upsampled base recon, spec G.8.6.2), P pictures are coded
  within the layer (no_inter_layer_pred = 1).
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from hartallo_tpu.api import CodecConfig, EncodeResult
from hartallo_tpu.bitio import BitWriter, insert_emulation_prevention
from hartallo_tpu.decode import nal as N
from hartallo_tpu.decode.intra_recon import PAD
from hartallo_tpu.decode.params import (PPS, SPS, SpsSvcExt,
                                        write_subset_sps)
from hartallo_tpu.decode.sliceheader import SliceHeader, write_slice_header
from hartallo_tpu.encode.encoder import Encoder, _annexb, _guess_level
from hartallo_tpu.encode.slice_encode import FramePacker
from hartallo_tpu.svc.upsample import upsample_plane


from functools import partial

import jax


from hartallo_tpu.ops.wide import (halfpel_planes, mc_chroma_plane,
                                   mc_grids, mc_luma_plane)


@partial(jax.jit, static_argnames=("gw", "gh"))
def _ilp_predict(refY, refU, refV, mvf, *, gw: int, gh: int):
    """Inter prediction planes from the layer's own (padded) reference
    with per-4x4 inferred MVs — the decoder's MC kernels, bit-exact."""
    hp = halfpel_planes(refY)[None]
    bx, by, cbx, cby = mc_grids(gw, gh)
    N = gh * gw * 16
    slot = jnp.zeros((N,), jnp.int32)
    wp = jnp.zeros((N, 3), jnp.int32).at[:, 0].set(1)
    pY = mc_luma_plane(hp, slot, bx, by, mvf[:, 0], mvf[:, 1], wp, gw, gh)
    pU = mc_chroma_plane(refU[None], slot, cbx, cby, mvf[:, 0],
                         mvf[:, 1], wp, gw, gh)
    pV = mc_chroma_plane(refV[None], slot, cbx, cby, mvf[:, 0],
                         mvf[:, 1], wp, gw, gh)
    return pY, pU, pV


def _edge_repad(plane, pad=PAD):
    """Re-replicate the pad zone from the (final, deblocked) interior —
    the decoder's reference ring edge-pads AFTER deblocking
    (d_gop.decode_gop), and MC windows read the pad, so the encoder's
    reference planes must match exactly."""
    inner = np.asarray(plane)[pad:-pad, pad:-pad]
    return jnp.asarray(np.pad(inner, pad, mode="edge").astype(np.int32))


def _prefix_nal(svc: N.NalSvcExt, ref_idc: int) -> bytes:
    w = BitWriter()
    N.write_nal_header(w, ref_idc, N.NAL_PREFIX, svc)
    if ref_idc != 0:
        w.u1(0)   # store_ref_base_pic_flag
        w.u1(0)   # additional_prefix_nal_unit_extension_flag
    w.write_rbsp_trailing_bits()
    return _annexb(insert_emulation_prevention(w.getvalue()))


def _residual_planes_from_coeffs(coeffs, chroma_qp_off):
    """rS planes of an encoded picture from its quantized coefficients
    (decoder-identical: d_pool numpy dequant + IDCT; inter MBs only)."""
    from types import SimpleNamespace

    from hartallo_tpu.decode.d_pool import residual_planes_np
    arrays, qp, mb_kind = coeffs
    gh, gw = mb_kind.shape
    sdl = SimpleNamespace(
        gh=gh, gw=gw, qp=np.asarray(qp, np.int32),
        mb_kind=np.asarray(mb_kind),
        luma_ac=np.asarray(arrays["luma_ac"], np.int32),
        chroma_ac=np.asarray(arrays["chroma_ac"], np.int32),
        chroma_dc=np.asarray(arrays["chroma_dc"], np.int32))
    return residual_planes_np(sdl, chroma_qp_off)


class SvcEncoder:
    """Drives one Encoder per spatial layer; frames are fed per layer in
    increasing order (reference hl_codec_add_layer call pattern)."""

    def __init__(self, config: CodecConfig):
        self.cfg = config
        self.layers: List[Encoder] = []
        self._call = 0
        self.qenc: Optional[Encoder] = None   # quality_id=1 chain state
        for li, (w, h) in enumerate(config.layers):
            sub = CodecConfig(**{**config.__dict__, "layers": []})
            sub.width, sub.height = w, h
            # intra-in-P stays off inside SVC layer stacks: a mixed
            # intra/inter base picture would make enhancement I_BL MBs
            # resample across intra/inter borders, where the spec (and
            # the reference decoder) constructs "not available" inter
            # samples before filtering (G.8.6.2.2.2) — a path neither
            # encoder implements.  All-inter / all-intra base pictures
            # sidestep it.
            sub.intra_in_p = False
            enc = Encoder(sub)
            enc._svc_layer = li
            enc._svc_nlayers = len(config.layers)
            self.layers.append(enc)

    # ------------------------------------------------------------------
    def encode_frame(self, frame, width, height) -> EncodeResult:
        li = self._call % len(self.layers)
        self._call += 1
        enc = self.layers[li]
        w, h = self.cfg.layers[li]
        if li == 0:
            r = self._encode_base(enc, frame, w, h)
        else:
            r = self._encode_enh(enc, li, frame, w, h)
        if (self.cfg.quality_layers >= 2 and len(self.layers) == 1
                and self.cfg.temporal_layers == 1):
            q = self._encode_quality_picture(enc, li, frame, w, h,
                                             r.keyframe)
            r = EncodeResult(data=r.data + q, headers=r.headers,
                             keyframe=r.keyframe,
                             temporal_id=r.temporal_id)
        return r

    # ------------------------------------------------------------------
    def _encode_base(self, enc: Encoder, frame, w, h) -> EncodeResult:
        r = enc.encode_frame(frame, w, h)
        svc = N.NalSvcExt(idr_flag=1 if r.keyframe else 0,
                          no_inter_layer_pred_flag=1,
                          dependency_id=0, quality_id=0,
                          temporal_id=r.temporal_id)
        ref_idc = 3 if r.keyframe else (0 if r.temporal_id else 2)
        prefix = _prefix_nal(svc, ref_idc)
        return EncodeResult(data=prefix + r.data, headers=r.headers,
                            keyframe=r.keyframe,
                            temporal_id=r.temporal_id)

    # ------------------------------------------------------------------
    def _setup_enh(self, enc: Encoder, li: int, width, height) -> None:
        gw, gh = (width + 15) // 16, (height + 15) // 16
        sps = SPS(profile_idc=83, constraint_set_flags=0,
                  level_idc=_guess_level(width, height),
                  seq_parameter_set_id=li,
                  log2_max_frame_num_minus4=4, pic_order_cnt_type=2,
                  max_num_ref_frames=1,
                  pic_width_in_mbs_minus1=gw - 1,
                  pic_height_in_map_units_minus1=gh - 1)
        sps.svc = SpsSvcExt(
            inter_layer_deblocking_filter_control_present_flag=1,
            slice_header_restriction_flag=1)
        pps = PPS(pic_parameter_set_id=li, seq_parameter_set_id=li,
                  deblocking_filter_control_present_flag=1,
                  pic_init_qp_minus26=max(-26, min(25, enc.cfg.qp - 26)))
        enc.sps, enc.pps = sps, pps
        w = BitWriter()
        N.write_nal_header(w, 3, N.NAL_SUBSET_SPS)
        write_subset_sps(w, sps)
        sps_nal = insert_emulation_prevention(w.getvalue())
        w = BitWriter()
        N.write_nal_header(w, 3, N.NAL_PPS)
        pps.write(w)
        pps_nal = insert_emulation_prevention(w.getvalue())
        enc._headers = _annexb(sps_nal) + _annexb(pps_nal)

    # ------------------------------------------------------------------
    def _encode_enh(self, enc: Encoder, li: int, frame, width,
                    height) -> EncodeResult:
        from hartallo_tpu.core.tables import QP_SCALE_CHROMA
        from hartallo_tpu.encode.intra_encode import _blocks_of_mb, \
            _BLK_X, _BLK_Y
        from hartallo_tpu.ops.transform import (
            chroma_dc_descale, dequant_4x4, forward_dct_4x4,
            forward_hadamard_quant_dc_chroma, forward_quant_4x4,
            inverse_transform_4x4)
        if enc.sps is None:
            self._setup_enh(enc, li, width, height)
        sps, pps = enc.sps, enc.pps
        gw, gh = sps.pic_width_in_mbs, sps.pic_height_in_mbs
        W, H = gw * 16, gh * 16

        is_idr = enc.gop_left <= 0 or enc._ref_planes is None
        if not is_idr:
            # within-layer P frame: reuse the AVC P path, rewrap as NAL 20
            r = self._encode_enh_p(enc, li, frame, width, height)
            return r
        enc.gop_left = max(enc.cfg.gop_size, 1)
        enc.gop_left -= 1
        enc.frame_num = 0
        enc._poc_cnt = 1     # IDR is frame 0 of the GOP (temporal phase)

        base = self.layers[li - 1]
        if base._ref_planes is None:
            raise ValueError("enhancement layer encoded before base")
        bY, bU, bV = base._ref_planes
        bH = bY.shape[0] - 2 * PAD
        bW = bY.shape[1] - 2 * PAD
        base_y = jnp.asarray(bY)[PAD:PAD + bH, PAD:PAD + bW]
        base_u = jnp.asarray(bU)[PAD:PAD + bH // 2, PAD:PAD + bW // 2]
        base_v = jnp.asarray(bV)[PAD:PAD + bH // 2, PAD:PAD + bW // 2]
        up_y = upsample_plane(base_y, H, W)
        up_u = upsample_plane(base_u, H // 2, W // 2, chroma=True)
        up_v = upsample_plane(base_v, H // 2, W // 2, chroma=True)

        buf = np.frombuffer(bytes(frame), np.uint8) if not \
            isinstance(frame, np.ndarray) else np.asarray(frame).ravel()
        ysz = width * height
        y = buf[:ysz].reshape(height, width).astype(np.int32)
        u = buf[ysz:ysz + ysz // 4].reshape(height // 2,
                                            width // 2).astype(np.int32)
        v = buf[ysz + ysz // 2 - ysz // 4:].reshape(
            height // 2, width // 2).astype(np.int32)

        qp_val = enc.cfg.qp
        qp = np.full((gh, gw), qp_val, np.int32)
        qpc = QP_SCALE_CHROMA[np.clip(qp + pps.chroma_qp_index_offset,
                                      0, 51)]

        # residual vs the upsampled base (I_BL for every MB)
        src_mb = jnp.asarray(y).reshape(gh, 16, gw, 16).transpose(0, 2, 1, 3)
        up_mb = up_y.reshape(gh, 16, gw, 16).transpose(0, 2, 1, 3)
        res = src_mb - up_mb
        blocks = _blocks_of_mb(res)
        qpj = jnp.asarray(qp)
        wq = forward_quant_4x4(forward_dct_4x4(blocks), qpj[..., None], True)
        d = dequant_4x4(wq, jnp.broadcast_to(qpj[..., None], (gh, gw, 16)))
        rr = inverse_transform_4x4(d)
        rec = jnp.zeros((gh, gw, 16, 16), jnp.int32)
        for b in range(16):
            rec = rec.at[:, :, _BLK_Y[b]:_BLK_Y[b] + 4,
                         _BLK_X[b]:_BLK_X[b] + 4].set(rr[:, :, b])
        rec_y = jnp.clip(up_mb + rec, 0, 255)

        src_c = jnp.stack(
            [jnp.asarray(u).reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3),
             jnp.asarray(v).reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)],
            axis=2)
        up_c = jnp.stack(
            [up_u.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3),
             up_v.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)], axis=2)
        resc = src_c - up_c
        cblocks = jnp.stack(
            [resc[..., (b >> 1) * 4:(b >> 1) * 4 + 4,
                  (b & 1) * 4:(b & 1) * 4 + 4] for b in range(4)], axis=3)
        qpcj = jnp.asarray(qpc)
        wc = forward_dct_4x4(cblocks)
        dc2 = jnp.stack(
            [jnp.stack([wc[..., 0, 0, 0], wc[..., 1, 0, 0]], -1),
             jnp.stack([wc[..., 2, 0, 0], wc[..., 3, 0, 0]], -1)], -2)
        dcq = forward_hadamard_quant_dc_chroma(dc2, qpcj[..., None], True)
        acq = forward_quant_4x4(wc, qpcj[..., None, None], True,
                                skip_dc=True)
        dcd = chroma_dc_descale(dcq, qpcj[..., None])
        dd = dequant_4x4(acq, jnp.broadcast_to(qpcj[..., None, None],
                                               (gh, gw, 2, 4)))
        blk_r = jnp.arange(4) // 2
        blk_c = jnp.arange(4) % 2
        dd = dd.at[..., 0, 0].set(dcd[..., blk_r, blk_c])
        rrc = inverse_transform_4x4(dd)
        recc = jnp.zeros((gh, gw, 2, 8, 8), jnp.int32)
        for b in range(4):
            recc = recc.at[..., (b >> 1) * 4:(b >> 1) * 4 + 4,
                           (b & 1) * 4:(b & 1) * 4 + 4] \
                .set(rrc[..., b, :, :])
        rec_c = jnp.clip(up_c + recc, 0, 255)

        arrays = {
            "use_i16": np.zeros((gh, gw), np.int32),
            "luma_ac": np.asarray(wq),
            "luma_dc": np.zeros((gh, gw, 4, 4), np.int32),
            "chroma_dc": np.asarray(dcq),
            "chroma_ac": np.asarray(acq),
            "i16_mode": np.zeros((gh, gw), np.int32),
            "i4_modes": np.zeros((gh, gw, 16), np.int32),
            "chroma_mode": np.zeros((gh, gw), np.int32),
        }
        from hartallo_tpu.decode.slice_decode import MB_IBL
        mb_kind = np.full((gh, gw), MB_IBL, np.int8)

        payload = self._pack_ibl_frame(enc, li, arrays, qp, mb_kind)

        # recon for the layer DPB (deblock: I_BL counts as intra)
        from hartallo_tpu.encode.encoder import _planes_from_mbs
        recY = np.pad(_planes_from_mbs(np.asarray(rec_y)), PAD)
        recU = np.pad(_planes_from_mbs(np.asarray(rec_c[:, :, 0])), PAD)
        recV = np.pad(_planes_from_mbs(np.asarray(rec_c[:, :, 1])), PAD)
        recY, recU, recV = (jnp.asarray(recY.astype(np.int32)),
                            jnp.asarray(recU.astype(np.int32)),
                            jnp.asarray(recV.astype(np.int32)))
        if enc.cfg.deblock:
            recY, recU, recV = enc._deblock_recon(
                arrays, qp, np.zeros((gh, gw), np.int8),  # treated intra
                (recY, recU, recV), gw, gh)
        enc._ref_planes = (_edge_repad(recY), _edge_repad(recU),
                           _edge_repad(recV))
        enc.frame_num = (enc.frame_num + 1) % sps.max_frame_num
        enc.frame_idx += 1

        return EncodeResult(data=_annexb(payload), headers=enc._headers,
                            keyframe=True)

    # ------------------------------------------------------------------
    def _pack_ibl_frame(self, enc: Encoder, li: int, arrays, qp,
                        mb_kind, quality: int = 0,
                        ref_dqid: int = -1) -> bytes:
        sps, pps = enc.sps, enc.pps
        gw, gh = sps.pic_width_in_mbs, sps.pic_height_in_mbs
        hdr = SliceHeader(
            first_mb_in_slice=0, slice_type=7,
            pic_parameter_set_id=pps.pic_parameter_set_id,
            frame_num=0, idr_pic_id=enc.idr_pic_id,
            slice_qp_delta=int(qp[0, 0]) - pps.pic_init_qp,
            disable_deblocking_filter_idc=0 if enc.cfg.deblock else 1,
            ref_layer_dq_id=ref_dqid if ref_dqid >= 0 else (li - 1) << 4,
            disable_inter_layer_deblocking_filter_idc=1,
            adaptive_base_mode_flag=0, default_base_mode_flag=1,
            adaptive_residual_prediction_flag=0,
            default_residual_prediction_flag=0)
        enc.idr_pic_id = (enc.idr_pic_id + 1) % 16
        svc = N.NalSvcExt(idr_flag=1, no_inter_layer_pred_flag=0,
                          dependency_id=li, quality_id=quality,
                          temporal_id=0)
        w = BitWriter()
        N.write_nal_header(w, 3, N.NAL_SLICE_EXT, svc)
        write_slice_header(w, hdr, sps, pps, nal_ref_idc=3, is_idr=True,
                           svc_ext=True, no_inter_layer_pred=False,
                           quality_id=quality)
        packer = FramePacker(gw, gh, arrays, qp, mb_kind)
        qp_state = [hdr.slice_qp(pps)]
        for my in range(gh):
            for mx in range(gw):
                packer.write_ibl_mb(w, mx, my, qp_state, 0)
        w.write_rbsp_trailing_bits()
        return insert_emulation_prevention(w.getvalue())

    # ------------------------------------------------------------------
    def _encode_enh_p(self, enc: Encoder, li: int, frame, width,
                      height) -> EncodeResult:
        base = self.layers[li - 1]
        if self.cfg.svc_inter_layer_p and base._last_motion is not None \
                and enc._ref_planes is not None and enc.sps is not None:
            return self._encode_enh_p_ilp(enc, li, frame, width, height)
        return self._encode_enh_p_rewrap(enc, li, frame, width, height)

    # ------------------------------------------------------------------
    def _encode_enh_p_ilp(self, enc: Encoder, li: int, frame, width,
                          height) -> EncodeResult:
        """EP picture with base_mode_flag=1 on every macroblock: motion
        is inferred from the base layer (G.8.6.1 — RSRC index mapping
        for dyadic/same-res, full ESS derivation for arbitrary ratios),
        prediction runs on the layer's own reference picture, and only
        CBP + residual are coded — no mb_type, no mvd.

        Mirrors the reference encoder's design intent
        (hl_codec_264_rdo.c:1325 base_mode_flag=1 on EP MBs; its
        implementation crashes on refIdx bookkeeping, so this path also
        serves as the working oracle source for EP decode tests)."""
        from hartallo_tpu.core.tables import QP_SCALE_CHROMA
        from hartallo_tpu.decode.slice_decode import MB_IBL, MB_PBL
        from hartallo_tpu.encode.intra_encode import _blocks_of_mb, \
            _BLK_X, _BLK_Y
        from hartallo_tpu.ops.transform import (
            chroma_dc_descale, dequant_4x4, forward_dct_4x4,
            forward_hadamard_quant_dc_chroma, forward_quant_4x4,
            inverse_transform_4x4)
        from hartallo_tpu.svc.motion import infer_motion

        base = self.layers[li - 1]
        sps, pps = enc.sps, enc.pps
        gw, gh = sps.pic_width_in_mbs, sps.pic_height_in_mbs
        W, H = gw * 16, gh * 16
        same_res = (gw, gh) == (base.sps.pic_width_in_mbs,
                                base.sps.pic_height_in_mbs)

        bmv, bref, bintra = base._last_motion
        mv_il, ref_il, ibl = infer_motion(
            bmv, bref.astype(np.int32), bintra, gw, gh)

        # ---- prediction: inter MC on own ref; I_BL on base-intra MBs --
        refY, refU, refV = enc._ref_planes
        mvf = jnp.asarray(mv_il.reshape(gh * gw * 16, 2))
        pY, pU, pV = _ilp_predict(jnp.asarray(refY), jnp.asarray(refU),
                                  jnp.asarray(refV), mvf, gw=gw, gh=gh)
        if ibl.any():
            bY, bU, bV = base._ref_planes       # current base recon
            bH = bY.shape[0] - 2 * PAD
            bW = bY.shape[1] - 2 * PAD
            up_y = upsample_plane(
                jnp.asarray(bY)[PAD:PAD + bH, PAD:PAD + bW], H, W)
            up_u = upsample_plane(
                jnp.asarray(bU)[PAD:PAD + bH // 2, PAD:PAD + bW // 2],
                H // 2, W // 2, chroma=True)
            up_v = upsample_plane(
                jnp.asarray(bV)[PAD:PAD + bH // 2, PAD:PAD + bW // 2],
                H // 2, W // 2, chroma=True)
            m16 = jnp.asarray(np.repeat(np.repeat(ibl, 16, 0), 16, 1))
            m8 = jnp.asarray(np.repeat(np.repeat(ibl, 8, 0), 8, 1))
            pY = jnp.where(m16, up_y, pY)
            pU = jnp.where(m8, up_u, pU)
            pV = jnp.where(m8, up_v, pV)

        # ---- residual transform/quant (intra rounding on I_BL MBs) ----
        buf = np.frombuffer(bytes(frame), np.uint8) if not \
            isinstance(frame, np.ndarray) else np.asarray(frame).ravel()
        ysz = width * height
        y = buf[:ysz].reshape(height, width).astype(np.int32)
        u = buf[ysz:ysz + ysz // 4].reshape(height // 2,
                                            width // 2).astype(np.int32)
        v = buf[ysz + ysz // 2 - ysz // 4:].reshape(
            height // 2, width // 2).astype(np.int32)

        qp_val = enc.cfg.qp
        qp = np.full((gh, gw), qp_val, np.int32)
        qpc = QP_SCALE_CHROMA[np.clip(qp + pps.chroma_qp_index_offset,
                                      0, 51)]
        intra_mb = jnp.asarray(ibl)

        src_mb = jnp.asarray(y).reshape(gh, 16, gw, 16).transpose(0, 2, 1, 3)
        pred_mb = pY.reshape(gh, 16, gw, 16).transpose(0, 2, 1, 3)
        res = src_mb - pred_mb

        # ---- inter-layer residual prediction (G.8.6.3) ---------------
        # flag=1 where subtracting the base layer's rS shrinks the luma
        # residual; the recon loop mirrors the decoder's clip3
        # accumulation exactly.  Spatial layer pairs resample the base
        # residual first (G-334..G-342 block-edge-constrained bilinear,
        # matching the decoder).
        res_pred = None
        bres_y_mb = bres_c_mb = None
        base_enc = self.layers[li - 1]
        if getattr(base_enc, "_last_coeffs", None) \
                is not None and self.cfg.svc_residual_pred:
            bry, brcb, brcr = _residual_planes_from_coeffs(
                base_enc._last_coeffs, pps.chroma_qp_index_offset)
            if not same_res:
                from hartallo_tpu.svc.upsample import \
                    upsample_residual_plane_np
                bry = upsample_residual_plane_np(bry, H, W)
                brcb = upsample_residual_plane_np(brcb, H // 2, W // 2,
                                                  chroma=True)
                brcr = upsample_residual_plane_np(brcr, H // 2, W // 2,
                                                  chroma=True)
            bres_y_mb = jnp.asarray(
                bry.reshape(gh, 16, gw, 16).transpose(0, 2, 1, 3))
            bres_c_mb = jnp.asarray(np.stack([
                brcb.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3),
                brcr.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)],
                axis=2))
            sad_plain = jnp.abs(res).sum(axis=(2, 3))
            sad_pred = jnp.abs(res - bres_y_mb).sum(axis=(2, 3))
            res_pred = np.asarray((sad_pred < sad_plain) &
                                  ~jnp.asarray(ibl))
            rp16 = jnp.asarray(res_pred)[:, :, None, None]
            res = jnp.where(rp16, res - bres_y_mb, res)
        blocks = _blocks_of_mb(res)
        qpj = jnp.asarray(qp)
        wq = forward_quant_4x4(forward_dct_4x4(blocks), qpj[..., None],
                               intra_mb[..., None])
        d = dequant_4x4(wq, jnp.broadcast_to(qpj[..., None], (gh, gw, 16)))
        rr = inverse_transform_4x4(d)
        rec = jnp.zeros((gh, gw, 16, 16), jnp.int32)
        for b in range(16):
            rec = rec.at[:, :, _BLK_Y[b]:_BLK_Y[b] + 4,
                         _BLK_X[b]:_BLK_X[b] + 4].set(rr[:, :, b])
        if res_pred is not None:
            rp16 = jnp.asarray(res_pred)[:, :, None, None]
            rec = jnp.where(rp16,
                            jnp.clip(rec + bres_y_mb, -255, 255), rec)
        rec_y = jnp.clip(pred_mb + rec, 0, 255)

        src_c = jnp.stack(
            [jnp.asarray(u).reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3),
             jnp.asarray(v).reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)],
            axis=2)
        pred_c = jnp.stack(
            [pU.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3),
             pV.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)], axis=2)
        resc = src_c - pred_c
        if res_pred is not None:
            rp8 = jnp.asarray(res_pred)[:, :, None, None, None]
            resc = jnp.where(rp8, resc - bres_c_mb, resc)
        cblocks = jnp.stack(
            [resc[..., (b >> 1) * 4:(b >> 1) * 4 + 4,
                  (b & 1) * 4:(b & 1) * 4 + 4] for b in range(4)], axis=3)
        qpcj = jnp.asarray(qpc)
        wc = forward_dct_4x4(cblocks)
        dc2 = jnp.stack(
            [jnp.stack([wc[..., 0, 0, 0], wc[..., 1, 0, 0]], -1),
             jnp.stack([wc[..., 2, 0, 0], wc[..., 3, 0, 0]], -1)], -2)
        dcq = forward_hadamard_quant_dc_chroma(dc2, qpcj[..., None],
                                               intra_mb[..., None])
        acq = forward_quant_4x4(wc, qpcj[..., None, None],
                                intra_mb[..., None, None], skip_dc=True)
        dcd = chroma_dc_descale(dcq, qpcj[..., None])
        dd = dequant_4x4(acq, jnp.broadcast_to(qpcj[..., None, None],
                                               (gh, gw, 2, 4)))
        blk_r = jnp.arange(4) // 2
        blk_c = jnp.arange(4) % 2
        dd = dd.at[..., 0, 0].set(dcd[..., blk_r, blk_c])
        rrc = inverse_transform_4x4(dd)
        recc = jnp.zeros((gh, gw, 2, 8, 8), jnp.int32)
        for b in range(4):
            recc = recc.at[..., (b >> 1) * 4:(b >> 1) * 4 + 4,
                           (b & 1) * 4:(b & 1) * 4 + 4] \
                .set(rrc[..., b, :, :])
        if res_pred is not None:
            rp8 = jnp.asarray(res_pred)[:, :, None, None, None]
            recc = jnp.where(rp8,
                             jnp.clip(recc + bres_c_mb, -255, 255), recc)
        rec_c = jnp.clip(pred_c + recc, 0, 255)

        arrays = {
            "use_i16": np.zeros((gh, gw), np.int32),
            "luma_ac": np.asarray(wq),
            "luma_dc": np.zeros((gh, gw, 4, 4), np.int32),
            "chroma_dc": np.asarray(dcq),
            "chroma_ac": np.asarray(acq),
            "i16_mode": np.zeros((gh, gw), np.int32),
            "i4_modes": np.zeros((gh, gw, 16), np.int32),
            "chroma_mode": np.zeros((gh, gw), np.int32),
            "mv44": mv_il,
        }
        mb_kind = np.where(ibl, MB_IBL, MB_PBL).astype(np.int8)

        two_t = enc.cfg.temporal_layers >= 2
        tid = int(enc._poc_cnt % 2) if two_t else 0
        enc._poc_cnt += 1
        payload = self._pack_ep_frame(enc, li, arrays, qp, mb_kind,
                                      tid=tid, res_pred=res_pred)

        from hartallo_tpu.encode.encoder import _planes_from_mbs
        recY = np.pad(_planes_from_mbs(np.asarray(rec_y)), PAD)
        recU = np.pad(_planes_from_mbs(np.asarray(rec_c[:, :, 0])), PAD)
        recV = np.pad(_planes_from_mbs(np.asarray(rec_c[:, :, 1])), PAD)
        recY, recU, recV = (jnp.asarray(recY.astype(np.int32)),
                            jnp.asarray(recU.astype(np.int32)),
                            jnp.asarray(recV.astype(np.int32)))
        if enc.cfg.deblock:
            # I_BL counts as intra, inferred MBs as inter (mv-based bS)
            kind_for_bs = np.where(ibl, 0, MB_PBL).astype(np.int8)
            recY, recU, recV = enc._deblock_recon(
                arrays, qp, kind_for_bs, (recY, recU, recV), gw, gh)
        if tid == 0:
            # T1 pictures are non-reference (droppable): only T0 recon
            # enters the reference/motion state
            enc._ref_planes = (_edge_repad(recY), _edge_repad(recU),
                               _edge_repad(recV))
            enc._last_motion = (mv_il, ref_il.astype(np.int8), ibl)
            enc.frame_num = (enc.frame_num + 1) % sps.max_frame_num
        enc.gop_left -= 1
        enc.frame_idx += 1
        return EncodeResult(data=_annexb(payload), headers=b"",
                            keyframe=False, temporal_id=tid)

    # ------------------------------------------------------------------
    def _encode_quality_picture(self, base_enc: Encoder, li: int, frame,
                                width, height, is_idr: bool) -> bytes:
        """quality_id=1 refinement NAL for the picture just encoded by
        ``base_enc`` (G.8.5.1 family): IDR pictures refine the base
        recon pixel-domain (same-res I_BL), P pictures refine the
        TRANSFORM COEFFICIENTS — levels quantized at qp-quality_qp_delta
        accumulate with the base picture's levels before one inverse
        transform (sTCoeff, G-127..G-130; reference
        hl_codec_264_decode_svc.c:92-146).  The refinement chain keeps
        its own reference recon (MGS semantics: the quality decode uses
        its own, finer reference pictures)."""
        from hartallo_tpu.core.tables import QP_SCALE_CHROMA
        from hartallo_tpu.decode.d_pool import \
            accumulated_residual_planes_np
        from hartallo_tpu.decode.slice_decode import MB_IBL, MB_PBL
        from hartallo_tpu.encode.encoder import _planes_from_mbs
        from hartallo_tpu.encode.intra_encode import _blocks_of_mb, \
            _BLK_X, _BLK_Y
        from hartallo_tpu.ops.transform import (
            chroma_dc_descale, dequant_4x4, forward_dct_4x4,
            forward_hadamard_quant_dc_chroma, forward_quant_4x4,
            inverse_transform_4x4)

        qe = self.qenc
        if qe is None:
            sub = CodecConfig(**{**self.cfg.__dict__, "layers": [],
                                 "quality_layers": 1})
            sub.width, sub.height = width, height
            sub.qp = max(0, min(51, self.cfg.qp -
                                self.cfg.quality_qp_delta))
            sub.intra_in_p = False
            qe = Encoder(sub)
            # quality layers need a subset SPS (the NAL-20 slice header
            # is parsed against the SPS's svc extension); ids offset by
            # 8 to stay clear of the spatial layers'
            self._setup_enh(qe, li + 8, width, height)
            self.qenc = qe
        sps, pps = qe.sps, qe.pps
        gw, gh = sps.pic_width_in_mbs, sps.pic_height_in_mbs
        W, H = gw * 16, gh * 16
        qp_val = qe.cfg.qp
        qp = np.full((gh, gw), qp_val, np.int32)
        qpc = QP_SCALE_CHROMA[np.clip(qp + pps.chroma_qp_index_offset,
                                      0, 51)]

        buf = np.frombuffer(bytes(frame), np.uint8) if not \
            isinstance(frame, np.ndarray) else np.asarray(frame).ravel()
        ysz = width * height
        y = buf[:ysz].reshape(height, width).astype(np.int32)
        u = buf[ysz:ysz + ysz // 4].reshape(height // 2,
                                            width // 2).astype(np.int32)
        v = buf[ysz + ysz // 2 - ysz // 4:].reshape(
            height // 2, width // 2).astype(np.int32)
        src_mb = jnp.asarray(y).reshape(gh, 16, gw, 16) \
            .transpose(0, 2, 1, 3)
        src_c = jnp.stack(
            [jnp.asarray(u).reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3),
             jnp.asarray(v).reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)],
            axis=2)
        qpj = jnp.asarray(qp)
        qpcj = jnp.asarray(qpc)

        bY, bU, bV = base_enc._ref_planes   # base recon of THIS picture
        if is_idr:
            # pixel-domain I_BL refinement of the (same-res) base recon
            up_y = jnp.asarray(bY)[PAD:PAD + H, PAD:PAD + W]
            up_u = jnp.asarray(bU)[PAD:PAD + H // 2, PAD:PAD + W // 2]
            up_v = jnp.asarray(bV)[PAD:PAD + H // 2, PAD:PAD + W // 2]
            pred_mb = up_y.reshape(gh, 16, gw, 16).transpose(0, 2, 1, 3)
            pred_c = jnp.stack(
                [up_u.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3),
                 up_v.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)],
                axis=2)
            intra_round = True
        else:
            mv_il = base_enc._last_motion[0]
            refY, refU, refV = qe._ref_planes
            mvf = jnp.asarray(
                np.asarray(mv_il, np.int32).reshape(gh * gw * 16, 2))
            pY, pU, pV = _ilp_predict(jnp.asarray(refY),
                                      jnp.asarray(refU),
                                      jnp.asarray(refV), mvf,
                                      gw=gw, gh=gh)
            pred_mb = pY.reshape(gh, 16, gw, 16).transpose(0, 2, 1, 3)
            pred_c = jnp.stack(
                [pU.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3),
                 pV.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)],
                axis=2)
            intra_round = False

        res = src_mb - pred_mb
        resc = src_c - pred_c
        if not is_idr:
            # refinement target: the residual the base coefficients do
            # not already represent (decision domain; the recon below is
            # exact coefficient accumulation)
            bry, brcb, brcr = _residual_planes_from_coeffs(
                base_enc._last_coeffs, pps.chroma_qp_index_offset)
            res = res - jnp.asarray(
                bry.reshape(gh, 16, gw, 16).transpose(0, 2, 1, 3))
            resc = resc - jnp.asarray(np.stack([
                brcb.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3),
                brcr.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)],
                axis=2))

        blocks = _blocks_of_mb(res)
        wq = forward_quant_4x4(forward_dct_4x4(blocks), qpj[..., None],
                               intra_round)
        cblocks = jnp.stack(
            [resc[..., (b >> 1) * 4:(b >> 1) * 4 + 4,
                  (b & 1) * 4:(b & 1) * 4 + 4] for b in range(4)], axis=3)
        wc = forward_dct_4x4(cblocks)
        dc2 = jnp.stack(
            [jnp.stack([wc[..., 0, 0, 0], wc[..., 1, 0, 0]], -1),
             jnp.stack([wc[..., 2, 0, 0], wc[..., 3, 0, 0]], -1)], -2)
        dcq = forward_hadamard_quant_dc_chroma(dc2, qpcj[..., None],
                                               intra_round)
        acq = forward_quant_4x4(wc, qpcj[..., None, None], intra_round,
                                skip_dc=True)

        if is_idr:
            # reconstruct exactly like the decoder's I_BL path
            d = dequant_4x4(wq, jnp.broadcast_to(qpj[..., None],
                                                 (gh, gw, 16)))
            rr = inverse_transform_4x4(d)
            rec = jnp.zeros((gh, gw, 16, 16), jnp.int32)
            for b in range(16):
                rec = rec.at[:, :, _BLK_Y[b]:_BLK_Y[b] + 4,
                             _BLK_X[b]:_BLK_X[b] + 4].set(rr[:, :, b])
            rec_y = jnp.clip(pred_mb + rec, 0, 255)
            dcd = chroma_dc_descale(dcq, qpcj[..., None])
            dd = dequant_4x4(acq, jnp.broadcast_to(
                qpcj[..., None, None], (gh, gw, 2, 4)))
            blk_r = jnp.arange(4) // 2
            blk_c = jnp.arange(4) % 2
            dd = dd.at[..., 0, 0].set(dcd[..., blk_r, blk_c])
            rrc = inverse_transform_4x4(dd)
            recc = jnp.zeros((gh, gw, 2, 8, 8), jnp.int32)
            for b in range(4):
                recc = recc.at[..., (b >> 1) * 4:(b >> 1) * 4 + 4,
                               (b & 1) * 4:(b & 1) * 4 + 4] \
                    .set(rrc[..., b, :, :])
            rec_c = jnp.clip(pred_c + recc, 0, 255)
        else:
            # exact decoder recon: sTCoeff accumulation then one IDCT,
            # clip3 per the respred accumulation the decoder rides
            barr, bqp, _ = base_enc._last_coeffs
            ry, rcb, rcr = accumulated_residual_planes_np(
                (barr["luma_ac"], barr["chroma_ac"], barr["chroma_dc"],
                 bqp),
                (np.asarray(wq), np.asarray(acq), np.asarray(dcq), qp),
                pps.chroma_qp_index_offset)
            ry = np.clip(ry, -255, 255)
            rc = np.clip(np.stack([rcb, rcr]), -255, 255)
            rec_y = jnp.clip(pred_mb + jnp.asarray(
                ry.reshape(gh, 16, gw, 16).transpose(0, 2, 1, 3)),
                0, 255)
            rec_c = jnp.clip(pred_c + jnp.asarray(np.stack([
                rc[0].reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3),
                rc[1].reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)],
                axis=2)), 0, 255)

        arrays = {
            "use_i16": np.zeros((gh, gw), np.int32),
            "luma_ac": np.asarray(wq),
            "luma_dc": np.zeros((gh, gw, 4, 4), np.int32),
            "chroma_dc": np.asarray(dcq),
            "chroma_ac": np.asarray(acq),
            "i16_mode": np.zeros((gh, gw), np.int32),
            "i4_modes": np.zeros((gh, gw, 16), np.int32),
            "chroma_mode": np.zeros((gh, gw), np.int32),
        }
        if is_idr:
            mb_kind = np.full((gh, gw), MB_IBL, np.int8)
            qe.frame_num = 0
            payload = self._pack_ibl_frame(qe, li, arrays, qp, mb_kind,
                                           quality=1, ref_dqid=li << 4)
        else:
            arrays["mv44"] = np.asarray(base_enc._last_motion[0],
                                        np.int32)
            mb_kind = np.full((gh, gw), MB_PBL, np.int8)
            payload = self._pack_ep_frame(qe, li, arrays, qp, mb_kind,
                                          tid=0, res_pred=None,
                                          quality=1, ref_dqid=li << 4)

        recY = np.pad(_planes_from_mbs(np.asarray(rec_y)), PAD)
        recU = np.pad(_planes_from_mbs(np.asarray(rec_c[:, :, 0])), PAD)
        recV = np.pad(_planes_from_mbs(np.asarray(rec_c[:, :, 1])), PAD)
        recY, recU, recV = (jnp.asarray(recY.astype(np.int32)),
                            jnp.asarray(recU.astype(np.int32)),
                            jnp.asarray(recV.astype(np.int32)))
        if qe.cfg.deblock:
            kind_for_bs = np.zeros((gh, gw), np.int8) if is_idr \
                else np.full((gh, gw), MB_PBL, np.int8)
            recY, recU, recV = qe._deblock_recon(
                arrays, qp, kind_for_bs, (recY, recU, recV), gw, gh)
        qe._ref_planes = (_edge_repad(recY), _edge_repad(recU),
                         _edge_repad(recV))
        qe.frame_num = (qe.frame_num + 1) % sps.max_frame_num
        if is_idr:
            return qe._headers + _annexb(payload)
        return _annexb(payload)

    # ------------------------------------------------------------------
    def _pack_ep_frame(self, enc: Encoder, li: int, arrays, qp,
                       mb_kind, tid: int = 0, res_pred=None,
                       quality: int = 0, ref_dqid: int = -1) -> bytes:
        """EP slice: every MB coded with inferred base_mode (skip-run 0 +
        the I_BL-shaped CBP/residual syntax, G.7.3.6.2)."""
        sps, pps = enc.sps, enc.pps
        gw, gh = sps.pic_width_in_mbs, sps.pic_height_in_mbs
        hdr = SliceHeader(
            first_mb_in_slice=0, slice_type=5,
            pic_parameter_set_id=pps.pic_parameter_set_id,
            frame_num=enc.frame_num,
            slice_qp_delta=int(qp[0, 0]) - pps.pic_init_qp,
            disable_deblocking_filter_idc=0 if enc.cfg.deblock else 1,
            ref_layer_dq_id=ref_dqid if ref_dqid >= 0 else (li - 1) << 4,
            disable_inter_layer_deblocking_filter_idc=1,
            adaptive_base_mode_flag=0, default_base_mode_flag=1,
            adaptive_residual_prediction_flag=(
                1 if res_pred is not None else 0),
            default_residual_prediction_flag=0)
        ref_idc = 0 if tid else 2
        svc = N.NalSvcExt(idr_flag=0, no_inter_layer_pred_flag=0,
                          dependency_id=li, quality_id=quality,
                          temporal_id=tid)
        w = BitWriter()
        N.write_nal_header(w, ref_idc, N.NAL_SLICE_EXT, svc)
        write_slice_header(w, hdr, sps, pps, nal_ref_idc=ref_idc,
                           is_idr=False, svc_ext=True,
                           no_inter_layer_pred=False,
                           quality_id=quality)
        packer = FramePacker(gw, gh, arrays, qp, mb_kind)
        qp_state = [hdr.slice_qp(pps)]
        for my in range(gh):
            for mx in range(gw):
                w.ue(0)                     # mb_skip_run
                if res_pred is not None:
                    w.u1(int(res_pred[my, mx]))
                packer.write_ibl_mb(w, mx, my, qp_state, 0)
        w.write_rbsp_trailing_bits()
        return insert_emulation_prevention(w.getvalue())

    # ------------------------------------------------------------------
    def _encode_enh_p_rewrap(self, enc: Encoder, li: int, frame, width,
                             height) -> EncodeResult:
        """P frame within the enhancement layer, wrapped as NAL 20 with
        no_inter_layer_pred = 1.  EVERY slice NAL of the frame is
        rewrapped (multi-slice and FMO layouts produce several)."""
        from hartallo_tpu.bitio import find_nal_units
        r = enc.encode_frame(frame, width, height)
        svc = N.NalSvcExt(idr_flag=0, no_inter_layer_pred_flag=1,
                          dependency_id=li, quality_id=0,
                          temporal_id=r.temporal_id)
        ref_idc = 0 if r.temporal_id else 2
        out = b""
        for s0, e0 in find_nal_units(r.data):
            nal = r.data[s0:e0]
            # replace the 1-byte AVC NAL header with the 4-byte SVC
            # extension header (type 20)
            w = BitWriter()
            N.write_nal_header(w, ref_idc, N.NAL_SLICE_EXT, svc)
            out += _annexb(w.getvalue() + nal[1:])
        return EncodeResult(data=out, headers=b"",
                            keyframe=False, temporal_id=r.temporal_id)
