"""Decoder front-end: NAL dispatch -> host slice parse -> device pixel
pipeline -> output frames.  Multi-layer (SVC) aware: per-DQId layer
contexts with their own DPBs, inter-layer intra (I_BL) via 16-phase
upsampling of the base reconstruction.

Reference parity: ``hl_codec_264.c:79-397`` (_decode), ``hl_codec_264_nal.c``
(slice pipeline), ``hl_codec_264_decode_avc.c`` (per-picture order),
``hl_codec_264_decode_svc.c`` (Annex-G layer decode; the reference's own
SVC decode path is partially stubbed — see BASELINE_MEASURED.md).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from hartallo_tpu.api import DecodeResult
from hartallo_tpu.bitio import BitReader, strip_emulation_prevention
from hartallo_tpu.decode import nal as N
from hartallo_tpu.decode.dpb import DPB, Frame
from hartallo_tpu.decode.intra_recon import (PAD, availability_masks,
                                             compute_residuals,
                                             intra_reconstruct,
                                             wavefront_schedule)
from hartallo_tpu.decode.params import (PPS, SPS, parse_subset_sps)
from hartallo_tpu.decode.poc import PocDecoder
from hartallo_tpu.decode.slice_decode import (MB_I16, MB_I4X4, MB_IBL,
                                              MB_PCM, SliceData,
                                              SliceDecoder)
from hartallo_tpu.decode.sliceheader import SliceHeader, parse_slice_header

assert PAD == 32  # intra_recon and interpol share the pad geometry


class _Layer:
    def __init__(self):
        self.cur: Optional[SliceData] = None
        self.hdr: Optional[SliceHeader] = None
        self.nal: Optional[N.NalHeader] = None
        self.dpb = DPB()
        self.poc = PocDecoder()
        self.last_recon: Optional[Tuple[np.ndarray, ...]] = None


class PendingFrame:
    """Deferred device->host fetch of a decoded frame (lets the device
    pipeline run ahead of the host across frames — the decode analog of
    the encoder's async GOP pipeline)."""

    def __init__(self, out_u8, gw: int, gh: int):
        self.out_u8 = out_u8
        self.gw, self.gh = gw, gh
        try:
            out_u8.copy_to_host_async()
        except Exception:
            pass

    def resolve(self) -> np.ndarray:
        from hartallo_tpu.decode.d_fused import split_out_u8
        return split_out_u8(np.asarray(self.out_u8), self.gw, self.gh)


def _materialize(result: DecodeResult) -> DecodeResult:
    if isinstance(result.frame, PendingFrame):
        result.frame = result.frame.resolve()
    return result


class Decoder:
    def __init__(self, dqid_min: int = -1, dqid_max: int = -1):
        self.sps_map: Dict[int, SPS] = {}
        self.pps_map: Dict[int, PPS] = {}
        self.dqid_min = dqid_min
        self.dqid_max = dqid_max
        self._sched_cache = {}
        self.layers: Dict[int, _Layer] = {}

    def _layer(self, dqid: int) -> _Layer:
        if dqid not in self.layers:
            self.layers[dqid] = _Layer()
        return self.layers[dqid]

    # ------------------------------------------------------------------
    def decode_nal(self, nal_bytes: bytes) -> DecodeResult:
        """Decode one NAL synchronously (frame fetched before return)."""
        return _materialize(self.decode_nal_deferred(nal_bytes))

    def decode_annexb(self, data: bytes):
        """Decode a whole Annex-B stream with the device pipeline running
        ahead of the host (frames fetched once at the end)."""
        from hartallo_tpu.bitio import find_nal_units
        results = []
        for s0, e0 in find_nal_units(data):
            r = self.decode_nal_deferred(data[s0:e0])
            if r.frame is not None:
                results.append(r)
        return [_materialize(r) for r in results]

    def decode_nal_deferred(self, nal_bytes: bytes) -> DecodeResult:
        r = BitReader(strip_emulation_prevention(nal_bytes))
        hdr = N.parse_nal_header(r)
        if hdr.type == N.NAL_SPS:
            sps = SPS.parse(r)
            self.sps_map[sps.seq_parameter_set_id] = sps
            return DecodeResult()
        if hdr.type == N.NAL_SUBSET_SPS:
            sps = parse_subset_sps(r)
            self.sps_map[sps.seq_parameter_set_id] = sps
            return DecodeResult()
        if hdr.type == N.NAL_PPS:
            pps = PPS.parse(r)
            self.pps_map[pps.pic_parameter_set_id] = pps
            return DecodeResult()
        if hdr.type == N.NAL_PREFIX:
            # prefix NAL for the following base-layer slice: the SVC ext
            # header was parsed; payload (store_ref_base_pic) not needed
            return DecodeResult()
        if hdr.type in (N.NAL_SLICE, N.NAL_SLICE_IDR, N.NAL_SLICE_EXT):
            return self._decode_slice(r, hdr)
        return DecodeResult()

    # ------------------------------------------------------------------
    def _decode_slice(self, r: BitReader, nh: N.NalHeader) -> DecodeResult:
        svc_ext = nh.type == N.NAL_SLICE_EXT
        dqid = nh.svc.dqid if (svc_ext and nh.svc) else 0
        no_ilp = nh.svc.no_inter_layer_pred_flag if (svc_ext and nh.svc) \
            else 1
        quality_id = nh.svc.quality_id if (svc_ext and nh.svc) else 0
        sh = None
        for pps in self.pps_map.values():
            sps = self.sps_map.get(pps.seq_parameter_set_id)
            if sps is None:
                continue
            probe = BitReader(r.data)
            probe.pos = r.pos
            try:
                cand = parse_slice_header(
                    probe, sps, pps, nal_ref_idc=nh.ref_idc,
                    is_idr=nh.is_idr, svc_ext=svc_ext,
                    no_inter_layer_pred=bool(no_ilp),
                    quality_id=quality_id)
            except Exception:
                continue
            if cand.pic_parameter_set_id == pps.pic_parameter_set_id:
                sh, r = cand, probe
                break
        if sh is None:
            raise ValueError("no matching PPS for slice")
        pps = self.pps_map[sh.pic_parameter_set_id]
        sps = self.sps_map[pps.seq_parameter_set_id]
        gw, gh = sps.pic_width_in_mbs, sps.pic_height_in_mbs

        layer = self._layer(dqid)
        if layer.cur is None or sh.first_mb_in_slice == 0:
            layer.cur = SliceData.create(gw, gh)
            layer.hdr = sh
            layer.nal = nh
        sd = layer.cur
        dec = SliceDecoder(sps, pps, sd)
        svc_il = svc_ext and not no_ilp
        scan_order = None
        if pps.num_slice_groups_minus1 > 0:
            # FMO: non-raster MB visit order per the slice-group map
            # (8.2.2, hl_codec_264_fmo.c:16-208)
            from hartallo_tpu.decode.fmo import (mb_to_slice_group_map,
                                                 slice_scan_order)
            sg_map = mb_to_slice_group_map(sps, pps,
                                           sh.slice_group_change_cycle)
            scan_order = slice_scan_order(sg_map, sh.first_mb_in_slice)
        dec.decode_slice_data(r, sh, svc_inter_layer=svc_il,
                              scan_order=scan_order)

        if (sd.mb_kind >= 0).all():
            frame, poc = self._reconstruct(sps, pps, layer.hdr, layer.nal,
                                           sd, layer, dqid)
            layer.cur = None
            if self.dqid_min >= 0 and dqid < self.dqid_min:
                return DecodeResult()
            if self.dqid_max >= 0 and dqid > self.dqid_max:
                return DecodeResult()
            return DecodeResult(frame=frame, width=sps.width,
                                height=sps.height, dqid=dqid, poc=poc)
        return DecodeResult()

    # ------------------------------------------------------------------
    def _reconstruct(self, sps: SPS, pps: PPS, sh: SliceHeader,
                     nh: N.NalHeader, sd: SliceData, layer: _Layer,
                     dqid: int):
        has_pcm = bool((sd.mb_kind == MB_PCM).any())
        has_ibl = bool((sd.mb_kind == MB_IBL).any())
        if not has_pcm and not has_ibl:
            return self._reconstruct_fused(sps, pps, sh, nh, sd, layer)
        return self._reconstruct_general(sps, pps, sh, nh, sd, layer, dqid)

    # ------------------------------------------------------------------
    def _reconstruct_fused(self, sps: SPS, pps: PPS, sh: SliceHeader,
                           nh: N.NalHeader, sd: SliceData,
                           layer: _Layer) -> "PendingFrame":
        """Fast path: whole-frame fused device program, one packed upload,
        one (deferred) fetch.  Covers AVC I/P frames without I_PCM/I_BL."""
        from hartallo_tpu.decode.d_fused import (decode_frame_fused,
                                                 pack_slice_arrays)
        gw, gh = sd.gw, sd.gh
        has_inter = bool(((sd.mb_kind >= 3) & (sd.mb_kind != MB_IBL)).any())
        dummy = jnp.zeros((1, 1, 1), jnp.int32)
        ry = ru = rv = dummy
        if has_inter:
            from hartallo_tpu.decode.mv import derive_mvs
            derive_mvs(sd)
            reflist = layer.dpb.ref_list_p(
                sh.frame_num, sps.max_frame_num,
                mods=sh.ref_pic_list_mods_l0,
                num_active=sh.num_ref_idx_l0_active_minus1 + 1)
            if not reflist:
                raise ValueError("P slice without reference frames")
            ry = jnp.stack([fr.planes_pad[0] for fr in reflist])
            ru = jnp.stack([fr.planes_pad[1] for fr in reflist])
            rv = jnp.stack([fr.planes_pad[2] for fr in reflist])

        mb_is_inter = (sd.mb_kind >= 3) & (sd.mb_kind != MB_IBL)
        al, at = availability_masks(sd.slice_id,
                                    bool(pps.constrained_intra_pred_flag),
                                    mb_is_inter)
        deblock = bool((sd.deblock_idc != 1).any())
        idc = sd.deblock_idc.astype(np.int32)
        filter_internal = idc != 1
        same_l = np.zeros((gh, gw), bool)
        same_t = np.zeros((gh, gw), bool)
        same_l[:, 1:] = sd.slice_id[:, 1:] == sd.slice_id[:, :-1]
        same_t[1:, :] = sd.slice_id[1:, :] == sd.slice_id[:-1, :]
        has_l = np.zeros((gh, gw), bool)
        has_l[:, 1:] = True
        has_t = np.zeros((gh, gw), bool)
        has_t[1:, :] = True
        fmb_v = filter_internal & has_l & ((idc != 2) | same_l)
        fmb_h = filter_internal & has_t & ((idc != 2) | same_t)

        packed = pack_slice_arrays(sd, al, at, fmb_v, fmb_h,
                                   filter_internal)
        out_u8, padY, padU, padV = decode_frame_fused(
            jnp.asarray(packed), ry, ru, rv, gw=gw, gh=gh,
            has_inter=has_inter,
            chroma_qp_off=pps.chroma_qp_index_offset, deblock=deblock)

        pending = PendingFrame(out_u8, gw, gh)
        layer.last_recon = pending          # IBL upsample resolves lazily
        layer.dpb.max_refs = sps.max_num_ref_frames
        mmco5 = any(m.op == 5 for m in (sh.mmcos or []))
        poc = layer.poc.compute(sps, sh, nh.ref_idc, nh.is_idr, mmco5)
        if nh.ref_idc != 0:
            layer.dpb.add(Frame(frame_num=sh.frame_num, poc=poc,
                                planes_pad=(padY, padU, padV)),
                          mmcos=sh.mmcos or None,
                          idr=nh.is_idr,
                          long_term_reference_flag=sh
                          .long_term_reference_flag)
        return pending, poc

    # ------------------------------------------------------------------
    def _reconstruct_general(self, sps: SPS, pps: PPS, sh: SliceHeader,
                             nh: N.NalHeader, sd: SliceData, layer: _Layer,
                             dqid: int) -> np.ndarray:
        from hartallo_tpu.decode.d_device import (crop_to_host,
                                                  decode_frame_pre,
                                                  edge_pad_device)
        gw, gh = sd.gw, sd.gh
        W, H = gw * 16, gh * 16

        has_inter = bool(((sd.mb_kind >= 3) & (sd.mb_kind != MB_IBL)).any())
        has_ibl = bool((sd.mb_kind == MB_IBL).any())

        dummy = jnp.zeros((1, 1, 1), jnp.int32)
        ry = ru = rv = dummy
        if has_inter:
            from hartallo_tpu.decode.mv import derive_mvs
            derive_mvs(sd)
            reflist = layer.dpb.ref_list_p(
                sh.frame_num, sps.max_frame_num,
                mods=sh.ref_pic_list_mods_l0,
                num_active=sh.num_ref_idx_l0_active_minus1 + 1)
            if not reflist:
                raise ValueError("P slice without reference frames")
            ry = jnp.stack([f.planes_pad[0] for f in reflist])
            ru = jnp.stack([f.planes_pad[1] for f in reflist])
            rv = jnp.stack([f.planes_pad[2] for f in reflist])

        up_y_mb = jnp.zeros((gh, gw, 16, 16), jnp.int32)
        up_c_mb = jnp.zeros((gh, gw, 2, 8, 8), jnp.int32)
        if has_ibl:
            from hartallo_tpu.svc.upsample import upsample_plane
            base_dqid = sh.ref_layer_dq_id if sh.ref_layer_dq_id >= 0 \
                else dqid - 16
            base = self.layers.get(base_dqid)
            if base is None or base.last_recon is None:
                raise ValueError("I_BL without decoded base layer")
            if isinstance(base.last_recon, PendingFrame):
                pf = base.last_recon
                flat = pf.resolve()
                bw, bh = pf.gw * 16, pf.gh * 16
                by = flat[:bw * bh].reshape(bh, bw)
                bu = flat[bw * bh:bw * bh * 5 // 4].reshape(bh // 2, bw // 2)
                bv = flat[bw * bh * 5 // 4:].reshape(bh // 2, bw // 2)
            else:
                by, bu, bv = base.last_recon
            up_y = upsample_plane(jnp.asarray(by.astype(np.int32)), H, W)
            up_u = upsample_plane(jnp.asarray(bu.astype(np.int32)),
                                  H // 2, W // 2, chroma=True)
            up_v = upsample_plane(jnp.asarray(bv.astype(np.int32)),
                                  H // 2, W // 2, chroma=True)
            up_y_mb = up_y.reshape(gh, 16, gw, 16).transpose(0, 2, 1, 3)
            up_c_mb = jnp.stack(
                [up_u.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3),
                 up_v.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)], axis=2)

        # I_PCM planes (rare): composed on host once
        pcm_y = np.zeros((H, W), np.int32)
        pcm_u = np.zeros((H // 2, W // 2), np.int32)
        pcm_v = np.zeros((H // 2, W // 2), np.int32)
        for my, mx in zip(*np.nonzero(sd.mb_kind == MB_PCM)):
            pcm_y[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = \
                sd.pcm_luma[my, mx]
            pcm_u[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = \
                sd.pcm_chroma[my, mx, 0]
            pcm_v[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = \
                sd.pcm_chroma[my, mx, 1]

        padY, padU, padV, res_y, res_c = decode_frame_pre(
            jnp.asarray(sd.luma_ac), jnp.asarray(sd.luma_dc),
            jnp.asarray(sd.chroma_ac), jnp.asarray(sd.chroma_dc),
            jnp.asarray(sd.qp, jnp.int32),
            jnp.asarray(sd.mb_kind == MB_I16),
            jnp.asarray(sd.mv, jnp.int32),
            jnp.asarray(sd.ref_idx, jnp.int32), ry, ru, rv,
            up_y_mb, up_c_mb, jnp.asarray(sd.mb_kind, jnp.int32),
            jnp.asarray(pcm_y), jnp.asarray(pcm_u), jnp.asarray(pcm_v),
            gw=gw, gh=gh, has_inter=has_inter, has_ibl=has_ibl,
            chroma_qp_off=pps.chroma_qp_index_offset)

        mb_is_inter = (sd.mb_kind >= 3) & (sd.mb_kind != MB_IBL)
        al, at = availability_masks(sd.slice_id,
                                    bool(pps.constrained_intra_pred_flag),
                                    mb_is_inter)

        kind_dev = jnp.asarray(np.where(sd.mb_kind == MB_I4X4, 0,
                                        np.where(sd.mb_kind == MB_I16, 1,
                                                 2)).astype(np.int32))
        pY, pU, pV = intra_reconstruct(
            (padY, padU, padV),
            res_y, res_c, kind_dev,
            jnp.asarray(sd.i16_mode, jnp.int32),
            jnp.asarray(sd.i4_modes, jnp.int32),
            jnp.asarray(sd.chroma_mode, jnp.int32),
            jnp.asarray(al), jnp.asarray(at), gw=gw, gh=gh)

        if (sd.deblock_idc != 1).any():
            pY, pU, pV = self._deblock(sps, pps, sd, (pY, pU, pV))

        y = np.asarray(crop_to_host(pY))
        u = np.asarray(crop_to_host(pU))
        v = np.asarray(crop_to_host(pV))
        layer.last_recon = (y, u, v)

        layer.dpb.max_refs = sps.max_num_ref_frames
        mmco5 = any(m.op == 5 for m in (sh.mmcos or []))
        poc = layer.poc.compute(sps, sh, nh.ref_idc, nh.is_idr, mmco5)
        if nh.ref_idc != 0:
            planes_pad = (edge_pad_device(pY), edge_pad_device(pU),
                          edge_pad_device(pV))
            layer.dpb.add(Frame(frame_num=sh.frame_num, poc=poc,
                                planes_pad=planes_pad),
                          mmcos=sh.mmcos or None,
                          idr=nh.is_idr,
                          long_term_reference_flag=sh.long_term_reference_flag)

        frame = np.concatenate([y.ravel(), u.ravel(), v.ravel()])
        return frame, poc

    # ------------------------------------------------------------------
    def _deblock(self, sps: SPS, pps: PPS, sd: SliceData, planes):
        from hartallo_tpu.core.tables import QP_SCALE_CHROMA
        from hartallo_tpu.ops.deblock import compute_bs, deblock_frame

        gw, gh = sd.gw, sd.gh
        idc = sd.deblock_idc.astype(np.int32)
        filter_internal = idc != 1
        same_slice_l = np.zeros((gh, gw), bool)
        same_slice_t = np.zeros((gh, gw), bool)
        same_slice_l[:, 1:] = sd.slice_id[:, 1:] == sd.slice_id[:, :-1]
        same_slice_t[1:, :] = sd.slice_id[1:, :] == sd.slice_id[:-1, :]
        has_l = np.zeros((gh, gw), bool)
        has_l[:, 1:] = True
        has_t = np.zeros((gh, gw), bool)
        has_t[1:, :] = True
        fmb_v = filter_internal & has_l & ((idc != 2) | same_slice_l)
        fmb_h = filter_internal & has_t & ((idc != 2) | same_slice_t)

        # I4x4/I16/PCM/I_BL count as intra for boundary strengths
        mb_is_intra = (sd.mb_kind <= 2) | (sd.mb_kind == MB_IBL)
        mvg = sd.mv.transpose(0, 2, 1, 3, 4).reshape(4 * gh, 4 * gw, 2)
        refg = np.repeat(np.repeat(
            sd.ref_idx.reshape(gh, gw, 2, 2), 2, axis=2), 2, axis=3) \
            .transpose(0, 2, 1, 3).reshape(4 * gh, 4 * gw)

        bs_v, bs_h = compute_bs(
            jnp.asarray(mb_is_intra), jnp.asarray(sd.nnz_luma, jnp.int32),
            jnp.asarray(mvg, jnp.int32), jnp.asarray(refg, jnp.int32),
            jnp.asarray(fmb_v), jnp.asarray(fmb_h),
            jnp.asarray(filter_internal))

        qp = sd.qp.astype(np.int32)
        qp_l = np.concatenate([qp[:, :1], qp[:, :-1]], axis=1)
        qp_t = np.concatenate([qp[:1, :], qp[:-1, :]], axis=0)
        qpc = QP_SCALE_CHROMA[np.clip(qp + pps.chroma_qp_index_offset,
                                      0, 51)]
        qpc_l = np.concatenate([qpc[:, :1], qpc[:, :-1]], axis=1)
        qpc_t = np.concatenate([qpc[:1, :], qpc[:-1, :]], axis=0)

        return deblock_frame(
            planes, bs_v, bs_h,
            jnp.asarray(qp), jnp.asarray(qp_l), jnp.asarray(qp_t),
            jnp.asarray(qpc), jnp.asarray(qpc_l), jnp.asarray(qpc_t),
            jnp.asarray(sd.alpha_off, jnp.int32),
            jnp.asarray(sd.beta_off, jnp.int32),
            gw=gw, gh=gh)
