"""Decoder front-end: NAL dispatch -> host slice parse -> GOP-batched
device pixel pipeline -> output frames.

The device pipeline is batched: completed pictures are queued and decoded
K at a time by ONE jitted program (``d_gop.decode_gop``) that scans the
frames with the DPB held as a device-resident ring of half-pel reference
stacks.  Pictures the batched program cannot express (I_PCM, SVC I_BL)
flush the queue and take the general per-frame path.

Multi-layer (SVC) aware: per-DQId layer contexts with their own DPBs,
inter-layer intra (I_BL) via 16-phase upsampling of the base recon.

Reference parity: ``hl_codec_264.c:79-397`` (_decode), ``hl_codec_264_nal.c``
(slice pipeline), ``hl_codec_264_decode_avc.c`` (per-picture order),
``hl_codec_264_decode_svc.c`` (Annex-G layer decode).  Error tolerance
mirrors the reference: an undecodable NAL is logged and skipped, the
stream keeps going (``hl_codec_264.c:250-397``,
``hl_codec_264_slice.c:1664-1668``).
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
                                             availability_tr,
                                             compute_residuals,
                                             intra_reconstruct)
from hartallo_tpu.decode.params import (PPS, SPS, parse_subset_sps)
from hartallo_tpu.decode.poc import PocDecoder
from hartallo_tpu.decode.slice_decode import (MB_I16, MB_I4X4, MB_IBL,
                                              MB_PCM, SliceData,
                                              SliceDecoder)
from hartallo_tpu.decode.sliceheader import SliceHeader, parse_slice_header
from hartallo_tpu.util import log

assert PAD == 32  # intra_recon and interpol share the pad geometry

BATCH_K = 16     # frames per device dispatch in the batched path


class _Layer:
    def __init__(self):
        self.cur: Optional[SliceData] = None
        self.hdr: Optional[SliceHeader] = None
        self.nal: Optional[N.NalHeader] = None
        self.dpb = DPB()
        self.poc = PocDecoder()
        self.last_recon = None
        self.last_motion = None          # (mv, ref_idx, intra, gw, gh)
        self.last_residual = None        # (rY, rCb, rCr) rS arrays
        self.last_coeffs = None          # quantized levels + qp (G.8.5.1)
        # batched-path state
        self.ring = None                 # (ringY, ringU, ringV)
        self.ring_key = None             # (gw, gh, S, chroma_qp_off)
        self.jobs = []                   # queued _Job records
        self.pending_sync = []           # Frames to upload into the ring


class _Job:
    __slots__ = ("packed", "wslot", "has_intra", "out", "gw", "gh",
                 "fast")

    def __init__(self, packed, wslot, has_intra, gw, gh, fast=None):
        self.packed = packed
        self.wslot = wslot
        self.has_intra = has_intra
        self.out = None                  # (_BatchOut, row index)
        self.gw, self.gh = gw, gh
        self.fast = fast                 # d_pool.FastFrame or None


def _fast_mode() -> str:
    """'' (off), 'on' (Mosaic on TPU), or 'interpret' (tests)."""
    import os
    env = os.environ.get("HARTALLO_FAST_DECODE")
    if env == "0":
        return ""
    if env == "interpret":
        return "interpret"
    try:
        import jax
        platform = jax.devices()[0].platform
    except Exception:                                    # noqa: BLE001
        platform = "cpu"
    if platform in ("tpu", "axon"):
        return "on"
    return ""


class _BatchOut:
    """One dispatched batch's output; fetched device->host once and
    shared by every frame of the batch (a per-frame np.asarray would
    re-transfer the whole batch each time)."""
    __slots__ = ("dev", "host")

    def __init__(self, dev):
        self.dev = dev
        self.host = None

    def fetch(self) -> np.ndarray:
        if self.host is None:
            self.host = np.asarray(self.dev)
            self.dev = None
        return self.host


class BatchSlot:
    """Lazy handle to one frame of a (possibly not yet dispatched) batch.
    Callers duck-type on .gw/.gh/.resolve()."""

    def __init__(self, decoder, layer, job):
        self._decoder = decoder
        self._layer = layer
        self._job = job
        self.gw, self.gh = job.gw, job.gh

    def resolve(self) -> np.ndarray:
        from hartallo_tpu.decode.d_gop import split_gop_out
        if self._job.out is None:
            self._decoder._flush(self._layer)
        batch, i = self._job.out
        return split_gop_out(batch.fetch()[i], self.gw, self.gh)


def _materialize(result: DecodeResult) -> DecodeResult:
    if hasattr(result.frame, "resolve"):
        result.frame = result.frame.resolve()
    return result


class Decoder:
    def __init__(self, dqid_min: int = -1, dqid_max: int = -1,
                 batch_k: int = BATCH_K, tid_max: int = -1):
        self.sps_map: Dict[int, SPS] = {}
        self.pps_map: Dict[int, PPS] = {}
        self.dqid_min = dqid_min
        self.dqid_max = dqid_max
        self.tid_max = tid_max
        self._prefix_svc = None          # SVC ext of the pending prefix NAL
        self.batch_k = max(1, batch_k)
        self._sched_cache = {}
        self._fmo_cache = {}
        self._svc_seen = False           # stream carries SVC ext NALs
        self.layers: Dict[int, _Layer] = {}

    def _layer(self, dqid: int) -> _Layer:
        if dqid not in self.layers:
            self.layers[dqid] = _Layer()
        return self.layers[dqid]

    # ------------------------------------------------------------------
    def decode_nal(self, nal_bytes: bytes) -> DecodeResult:
        """Decode one NAL synchronously (frame fetched before return)."""
        r = self.decode_nal_deferred(nal_bytes)
        self.flush_all()
        return _materialize(r)

    def decode_annexb(self, data: bytes, tolerant: bool = True):
        """Decode a whole Annex-B stream with the device pipeline batching
        GOP frames (one dispatch per K frames; fetched at the end).

        With ``tolerant`` (default, matching the reference's behavior), an
        undecodable NAL is logged and skipped instead of aborting."""
        from hartallo_tpu.bitio import find_nal_units
        results = []
        for s0, e0 in find_nal_units(data):
            try:
                r = self.decode_nal_deferred(data[s0:e0])
            except Exception as e:                      # noqa: BLE001
                if not tolerant:
                    raise
                log.warn("decoder", "skipping undecodable NAL "
                         "(%d bytes): %s", e0 - s0, e)
                continue
            if r.frame is not None:
                results.append(r)
        self.flush_all()
        return [_materialize(r) for r in results]

    def flush_all(self) -> None:
        for layer in self.layers.values():
            self._flush(layer)

    def decode_nal_deferred(self, nal_bytes: bytes) -> DecodeResult:
        r = BitReader(strip_emulation_prevention(nal_bytes))
        hdr = N.parse_nal_header(r)
        if hdr.type == N.NAL_SPS:
            sps = SPS.parse(r)
            if sps.seq_parameter_set_id in self.sps_map:
                self._fmo_cache.clear()
            self.sps_map[sps.seq_parameter_set_id] = sps
            return DecodeResult()
        if hdr.type == N.NAL_SUBSET_SPS:
            self._svc_seen = True
            sps = parse_subset_sps(r)
            self.sps_map[sps.seq_parameter_set_id] = sps
            return DecodeResult()
        if hdr.type == N.NAL_PPS:
            pps = PPS.parse(r)
            if pps.pic_parameter_set_id in self.pps_map:
                self._fmo_cache.clear()
            self.pps_map[pps.pic_parameter_set_id] = pps
            return DecodeResult()
        if hdr.type == N.NAL_PREFIX:
            # prefix NAL for the following base-layer slice: carries the
            # SVC ext header (incl. temporal_id); payload
            # (store_ref_base_pic) not needed
            self._prefix_svc = hdr.svc
            return DecodeResult()
        if hdr.type in (N.NAL_SLICE, N.NAL_SLICE_IDR, N.NAL_SLICE_EXT):
            svc = hdr.svc if hdr.type == N.NAL_SLICE_EXT else \
                self._prefix_svc
            self._prefix_svc = None
            if svc is not None:
                tid = svc.temporal_id
            else:
                # plain AVC: non-reference P slices are the disposable
                # (temporal_id > 0) set
                tid = 1 if (hdr.ref_idc == 0 and
                            hdr.type == N.NAL_SLICE) else 0
            if self.tid_max >= 0 and tid > self.tid_max:
                return DecodeResult()    # droppable temporal layer
            return self._decode_slice(r, hdr)
        return DecodeResult()

    # ------------------------------------------------------------------
    def _decode_slice(self, r: BitReader, nh: N.NalHeader) -> DecodeResult:
        svc_ext = nh.type == N.NAL_SLICE_EXT
        if svc_ext:
            self._svc_seen = True
        dqid = nh.svc.dqid if (svc_ext and nh.svc) else 0
        no_ilp = nh.svc.no_inter_layer_pred_flag if (svc_ext and nh.svc) \
            else 1
        quality_id = nh.svc.quality_id if (svc_ext and nh.svc) else 0
        # pic_parameter_set_id is the 3rd ue(v) of every slice header —
        # read it directly instead of trial-parsing under every PPS
        probe = BitReader(r.data)
        probe.pos = r.pos
        probe.ue()                       # first_mb_in_slice
        probe.ue()                       # slice_type
        pps_id = probe.ue()
        pps = self.pps_map.get(pps_id)
        sps = self.sps_map.get(pps.seq_parameter_set_id) if pps else None
        if pps is None or sps is None:
            raise ValueError(f"slice references unknown PPS {pps_id}")
        sh = parse_slice_header(
            r, sps, pps, nal_ref_idc=nh.ref_idc, is_idr=nh.is_idr,
            svc_ext=svc_ext, no_inter_layer_pred=bool(no_ilp),
            quality_id=quality_id)
        gw, gh = sps.pic_width_in_mbs, sps.pic_height_in_mbs

        layer = self._layer(dqid)
        # picture-boundary detection (7.4.1.2.4 subset): new picture on
        # frame_num change, or a slice whose first MB was already decoded
        # (FMO slice groups need not contain MB 0, so first_mb == 0 alone
        # is not a boundary)
        new_pic = layer.cur is None
        if not new_pic and layer.hdr is not None:
            if sh.frame_num != layer.hdr.frame_num:
                new_pic = True
            else:
                a = sh.first_mb_in_slice
                if layer.cur.slice_id[a // gw, a % gw] >= 0:
                    new_pic = True
        if new_pic:
            layer.cur = SliceData.create(gw, gh)
            layer.hdr = sh
            layer.nal = nh
        sd = layer.cur
        dec = SliceDecoder(sps, pps, sd)
        svc_il = svc_ext and not no_ilp
        scan_order = None
        if pps.num_slice_groups_minus1 > 0:
            # FMO: non-raster MB visit order per the slice-group map
            # (8.2.2, hl_codec_264_fmo.c:16-208); the map is identical for
            # every slice of the picture — computed once and cached
            from hartallo_tpu.decode.fmo import (mb_to_slice_group_map,
                                                 slice_scan_order)
            key = (pps.pic_parameter_set_id, sps.seq_parameter_set_id,
                   sh.slice_group_change_cycle)
            sg_map = self._fmo_cache.get(key)
            if sg_map is None:
                sg_map = mb_to_slice_group_map(sps, pps,
                                               sh.slice_group_change_cycle)
                self._fmo_cache[key] = sg_map
            scan_order = slice_scan_order(sg_map, sh.first_mb_in_slice)
        sid = sd._slice_count
        dec.decode_slice_data(r, sh, svc_inter_layer=svc_il,
                              scan_order=scan_order)
        sd.wp[sid] = sh.pred_weights

        if (sd.mb_kind >= 0).all():
            from hartallo_tpu.decode.slice_decode import MB_PBL
            if svc_il and (bool((sd.mb_kind == MB_PBL).any()) or
                           bool(sd.motion_pred_l0.any())):
                self._infer_inter_layer_motion(sd, sps, layer.hdr, dqid)
            frame, poc = self._reconstruct(sps, pps, layer.hdr, layer.nal,
                                           sd, layer, dqid)
            # per-picture motion state for a following enhancement
            # layer's G.8.6.1 inference (base_mode_flag)
            layer.last_motion = (
                sd.mv, getattr(sd, "ref_idx_list", sd.ref_idx),
                (sd.mb_kind <= 2) | (sd.mb_kind == MB_IBL),
                sd.gw, sd.gh)
            if self._svc_seen:
                # rS arrays for a following layer's G.8.6.3 residual
                # prediction (inter MBs only; intra re-initialised)
                from hartallo_tpu.decode.d_pool import residual_planes_np
                layer.last_residual = residual_planes_np(
                    sd, pps.chroma_qp_index_offset)
                # quantized levels for a following quality layer's
                # G.8.5.1 tcoeff refinement (sTCoeff accumulation)
                layer.last_coeffs = (sd.luma_ac.copy(),
                                     sd.chroma_ac.copy(),
                                     sd.chroma_dc.copy(), sd.qp.copy())
            layer.cur = None
            if self.dqid_min >= 0 and dqid < self.dqid_min:
                return DecodeResult()
            if self.dqid_max >= 0 and dqid > self.dqid_max:
                return DecodeResult()
            return DecodeResult(frame=frame, width=sps.width,
                                height=sps.height, dqid=dqid, poc=poc)
        return DecodeResult()

    # ------------------------------------------------------------------
    def _infer_inter_layer_motion(self, sd: SliceData, sps: SPS,
                                  sh: SliceHeader, dqid: int) -> None:
        """G.8.6.1 motion inference for base_mode_flag=1 EP macroblocks
        (and inter-layer MV predictors for motion_prediction_flag_l0):
        fills sd.mv/sd.ref_idx for MB_PBL macroblocks from the reference
        layer's decoded motion, and flips MBs whose co-located reference
        MB is intra to MB_IBL (intraILPredFlag branch).

        Reference: hl_codec_264_utils.c:1674-2006 (G.8.6.1.1/.2) +
        :1498-1671 (G.8.4.1 SVC); RSRC index-mapping for dyadic/same-res
        layer pairs, the full ESS derivation (G.6.1 position mapping +
        G-210..G-261) for arbitrary ratios."""
        from hartallo_tpu.decode.slice_decode import MB_IBL, MB_PBL
        from hartallo_tpu.svc.motion import infer_motion
        base_dqid = sh.ref_layer_dq_id if sh.ref_layer_dq_id >= 0 \
            else (dqid - 1 if (dqid & 15) else dqid - 16)
        base = self.layers.get(base_dqid)
        if base is None or base.last_motion is None:
            raise ValueError("base_mode_flag without decoded base layer")
        bmv, bref, bintra, bgw, bgh = base.last_motion
        mv_il, ref_il, ibl = infer_motion(bmv, bref, bintra, sd.gw, sd.gh)
        pbl = sd.mb_kind == MB_PBL
        sd.mb_kind[pbl & ibl] = MB_IBL
        take = pbl & ~ibl
        sd.mv[take] = mv_il[take]
        sd.ref_idx[take] = ref_il[take].astype(sd.ref_idx.dtype)
        # inter-layer predictors for motion_prediction_flag partitions
        sd._il_mv = mv_il
        sd._il_ref = ref_il

    # ------------------------------------------------------------------
    def _reconstruct(self, sps: SPS, pps: PPS, sh: SliceHeader,
                     nh: N.NalHeader, sd: SliceData, layer: _Layer,
                     dqid: int):
        from hartallo_tpu.decode.params import effective_weight4x4
        has_pcm = bool((sd.mb_kind == MB_PCM).any())
        has_ibl = bool((sd.mb_kind == MB_IBL).any())
        nonflat = effective_weight4x4(sps, pps) is not None
        has_respred = bool(sd.res_pred.any())
        qref = (dqid & 15) > 0 and \
            bool(((sd.mb_kind >= 3) & (sd.mb_kind != MB_IBL)).any())
        if not has_pcm and not has_ibl and not nonflat \
                and not has_respred and not qref:
            return self._enqueue_batched(sps, pps, sh, nh, sd, layer)
        return self._reconstruct_general(sps, pps, sh, nh, sd, layer, dqid)

    # ------------------------------------------------------------------
    # Batched path
    # ------------------------------------------------------------------
    def _ring_slots(self, sps: SPS) -> int:
        return max(1, sps.max_num_ref_frames) + 1     # last = trash

    def _enqueue_batched(self, sps: SPS, pps: PPS, sh: SliceHeader,
                        nh: N.NalHeader, sd: SliceData, layer: _Layer):
        """Queue one completed picture for the GOP-batched device program;
        flushes automatically at batch_k."""
        from hartallo_tpu.decode.d_fused import pack_slice_arrays
        gw, gh = sd.gw, sd.gh
        S = self._ring_slots(sps)
        key = (gw, gh, S, pps.chroma_qp_index_offset)
        if layer.ring_key != key:
            self._flush(layer)
            layer.ring_key = key
            layer.ring = None
        # frames decoded before the ring existed need slots
        for f in layer.dpb.frames:
            if f.slot < 0:
                used = {g.slot for g in layer.dpb.frames if g.slot >= 0}
                f.slot = next(s for s in range(S - 1) if s not in used)

        has_inter = bool(((sd.mb_kind >= 3) & (sd.mb_kind != MB_IBL)).any())
        if has_inter:
            from hartallo_tpu.decode.mv import derive_mvs
            derive_mvs(sd)
            layer.dpb.max_refs = sps.max_num_ref_frames
            reflist = layer.dpb.ref_list_p(
                sh.frame_num, sps.max_frame_num,
                mods=sh.ref_pic_list_mods_l0,
                num_active=sh.num_ref_idx_l0_active_minus1 + 1)
            if not reflist:
                raise ValueError("P slice without reference frames")
            for f in reflist:
                # frames decoded outside the batched path must be
                # uploaded into the ring before this batch runs (they may
                # be evicted from the DPB before the flush — record now)
                if not f.in_ring and f.planes_pad is not None:
                    layer.pending_sync.append(f)
                    f.in_ring = True
            wp_l, wp_c = self._weight_arrays(sd, len(reflist))
            slot_of = np.array([f.slot for f in reflist], np.int32)
            sd.ref_idx_list = sd.ref_idx.copy()   # list-index view (kept
            # for a following EL's G.8.6.1 inference; slots below are
            # ring-local)
            sd.ref_idx = slot_of[np.clip(sd.ref_idx.astype(np.int64), 0,
                                         len(reflist) - 1)]
        else:
            wp_l = wp_c = None
            sd.ref_idx = np.zeros_like(sd.ref_idx, dtype=np.int32)

        mb_is_inter = (sd.mb_kind >= 3) & (sd.mb_kind != MB_IBL)
        al, at = availability_masks(sd.slice_id,
                                    bool(pps.constrained_intra_pred_flag),
                                    mb_is_inter)
        atr = availability_tr(sd.slice_id,
                              bool(pps.constrained_intra_pred_flag),
                              mb_is_inter)
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

        layer.dpb.max_refs = sps.max_num_ref_frames
        mmco5 = any(m.op == 5 for m in (sh.mmcos or []))
        poc = layer.poc.compute(sps, sh, nh.ref_idc, nh.is_idr, mmco5)
        wslot = S - 1                                      # trash
        if nh.ref_idc != 0:
            fr = Frame(frame_num=sh.frame_num, poc=poc, planes_pad=None,
                       in_ring=True)
            layer.dpb.add(fr, mmcos=sh.mmcos or None, idr=nh.is_idr,
                          long_term_reference_flag=sh
                          .long_term_reference_flag)
            used = {f.slot for f in layer.dpb.frames
                    if f is not fr and f.slot >= 0}
            wslot = next(s for s in range(S - 1) if s not in used)
            fr.slot = wslot

        has_intra = bool((~mb_is_inter).any())
        fast = None
        if _fast_mode():
            from hartallo_tpu.decode import d_pool
            if d_pool.eligible(sd, wp_l) is None:
                try:
                    ff = d_pool.pack_fast(sd, fmb_v, fmb_h,
                                          filter_internal, wslot,
                                          pps.chroma_qp_index_offset,
                                          al=al, at=at, atr=atr)
                    if ff.tags.shape[0] <= d_pool.nrmax(gw, gh):
                        fast = ff
                except OverflowError:
                    fast = None
        # the dense packed buffer feeds the XLA batched path only — skip
        # building it for pictures the Pallas kernel will decode (the
        # sharded driver sets want_dense_packed: its flush consumes the
        # dense layout regardless of fast-path eligibility)
        if fast is not None and not getattr(self, "want_dense_packed",
                                            False):
            packed = None
        else:
            packed = pack_slice_arrays(
                sd, al, at, fmb_v, fmb_h, filter_internal, wp_l=wp_l,
                wp_c=wp_c, atr=atr)
        job = _Job(packed, wslot, has_intra, gw, gh, fast=fast)
        layer.jobs.append(job)
        slot = BatchSlot(self, layer, job)
        layer.last_recon = slot
        if len(layer.jobs) >= self.batch_k:
            self._flush(layer)
        return slot, poc

    @staticmethod
    def _weight_arrays(sd: SliceData, n_refs: int):
        """Per-8x8 [w, o, logWD] arrays (8.4.2.3.2) from the per-slice
        pred-weight tables; None when no slice uses explicit weights."""
        if not any(t is not None for t in sd.wp.values()):
            return None, None
        gh, gw = sd.gh, sd.gw
        wp_l = np.zeros((gh, gw, 4, 3), np.int32)
        wp_l[..., 0] = 1
        wp_c = np.zeros((gh, gw, 4, 2, 3), np.int32)
        wp_c[..., 0] = 1
        ref = np.clip(sd.ref_idx.astype(np.int64), 0, n_refs - 1)
        for sid, tab in sd.wp.items():
            if tab is None:
                continue
            mask = sd.slice_id == sid            # (gh, gw)
            nt = len(tab.luma_w)
            r = np.minimum(ref, nt - 1)          # (gh, gw, 4)
            lw = np.asarray(tab.luma_w)[r]
            lo = np.asarray(tab.luma_o)[r]
            cw = np.asarray(tab.chroma_w)[r]     # (gh, gw, 4, 2)
            co = np.asarray(tab.chroma_o)[r]
            m3 = mask[..., None]
            wp_l[..., 0] = np.where(m3, lw, wp_l[..., 0])
            wp_l[..., 1] = np.where(m3, lo, wp_l[..., 1])
            wp_l[..., 2] = np.where(m3, tab.luma_log2_denom,
                                    wp_l[..., 2])
            m4 = mask[..., None, None]
            wp_c[..., 0] = np.where(m4, cw, wp_c[..., 0])
            wp_c[..., 1] = np.where(m4, co, wp_c[..., 1])
            wp_c[..., 2] = np.where(m4, tab.chroma_log2_denom,
                                    wp_c[..., 2])
        return wp_l, wp_c

    def _flush(self, layer: _Layer) -> None:
        """Dispatch all queued pictures of this layer and record the
        (deferred) outputs.  Consecutive fast-eligible pictures go to the
        Pallas GOP kernel; the rest to the XLA GOP scan."""
        if not layer.jobs:
            return
        from hartallo_tpu.decode.d_gop import (decode_gop, ring_shapes)
        from hartallo_tpu.ops.wide import halfpel_planes
        jobs, layer.jobs = layer.jobs, []
        gw, gh, S, cqoff = layer.ring_key
        if layer.ring is None:
            shY, shU, shV = ring_shapes(gw, gh, S)
            layer.ring = (jnp.zeros(shY, jnp.uint8),
                          jnp.zeros(shU, jnp.uint8),
                          jnp.zeros(shV, jnp.uint8))
        ringY, ringU, ringV = layer.ring
        # sync reference frames decoded outside the batched path
        sync, layer.pending_sync = layer.pending_sync, []
        for f in sync:
            if f.slot >= 0 and f.planes_pad is not None:
                hp = halfpel_planes(f.planes_pad[0].astype(jnp.int32))
                hp = jnp.pad(hp, ((0, 0),
                                  (0, ringY.shape[2] - hp.shape[1]),
                                  (0, ringY.shape[3] - hp.shape[2])))
                up = f.planes_pad[1]
                vp = f.planes_pad[2]
                up = jnp.pad(up, ((0, ringU.shape[1] - up.shape[0]),
                                  (0, ringU.shape[2] - up.shape[1])))
                vp = jnp.pad(vp, ((0, ringV.shape[1] - vp.shape[0]),
                                  (0, ringV.shape[2] - vp.shape[1])))
                ringY = ringY.at[f.slot].set(hp.astype(ringY.dtype))
                ringU = ringU.at[f.slot].set(up.astype(ringU.dtype))
                ringV = ringV.at[f.slot].set(vp.astype(ringV.dtype))

        # consecutive same-kind runs preserve decode order on the ring
        runs = []
        for j in jobs:
            kind = j.fast is not None
            if runs and runs[-1][0] == kind:
                runs[-1][1].append(j)
            else:
                runs.append((kind, [j]))
        from hartallo_tpu.decode import d_pool
        km = d_pool.kmax(gw, gh)

        def split_fast(run):
            """Chunk to the SMEM frame cap and isolate intra-heavy
            pictures (e.g. I frames) so the dense intra pool of a batch
            stays small for the tunnel upload."""
            out, cur = [], []
            for j in run:
                big = j.fast.ilist.shape[0] > 32
                if big:
                    if cur:
                        out.append(cur)
                        cur = []
                    out.append([j])
                else:
                    cur.append(j)
                    if len(cur) == km:
                        out.append(cur)
                        cur = []
            if cur:
                out.append(cur)
            return out

        runs = [(kind, piece)
                for kind, run in runs
                for piece in (split_fast(run) if kind else [run])]
        for kind, run in runs:
            if kind:
                outs, ringY, ringU, ringV = self._flush_fast(
                    run, ringY, ringU, ringV, gw, gh, cqoff)
            else:
                packed = np.stack([j.packed for j in run])
                wslot = np.array([j.wslot for j in run], np.int32)
                hintra = np.array([j.has_intra for j in run], bool)
                outs, ringY, ringU, ringV = decode_gop(
                    jnp.asarray(packed), jnp.asarray(wslot),
                    jnp.asarray(hintra), ringY, ringU, ringV,
                    gw=gw, gh=gh, chroma_qp_off=cqoff)
            try:
                outs.copy_to_host_async()
            except Exception:                            # noqa: BLE001
                pass
            batch = _BatchOut(outs)
            for i, j in enumerate(run):
                j.out = (batch, i)
        layer.ring = (ringY, ringU, ringV)

    def _flush_fast(self, run, ringY, ringU, ringV, gw, gh, cqoff):
        from hartallo_tpu.decode import d_pool
        from hartallo_tpu.decode.d_gop_pallas import SF, decode_gop_pl
        K = len(run)
        mtags = max(j.fast.tags.shape[0] for j in run)
        mi = max(j.fast.ilist.shape[0] for j in run)
        NR = 256 if mtags <= 256 else d_pool.nrmax(gw, gh)
        NI = 32 if mi <= 32 else d_pool.nimax(gw, gh)
        smb = np.stack([j.fast.smb for j in run])
        aux = np.stack([j.fast.aux for j in run])
        sf = np.zeros((K, SF), np.int32)
        tags = np.zeros((K, NR), np.int32)
        vals = np.zeros((K, NR, 16), np.int16)
        ilist = np.zeros((K, NI, 4), np.int32)
        ivals = np.zeros((K, NI, 24, 16), np.int16)
        for i, j in enumerate(run):
            ff = j.fast
            m = ff.tags.shape[0]
            sf[i, 0] = ff.wslot
            sf[i, 1] = ff.ref_slot
            sf[i, 2:5] = ff.counts
            ni = ff.ilist.shape[0]
            sf[i, 5] = ni
            tags[i, :m] = ff.tags
            vals[i, :m] = ff.vals
            ilist[i, :ni] = ff.ilist
            ivals[i, :ni] = ff.ivals
        return decode_gop_pl(
            jnp.asarray(smb), jnp.asarray(aux), jnp.asarray(sf),
            jnp.asarray(tags), jnp.asarray(vals), jnp.asarray(ilist),
            jnp.asarray(ivals), ringY, ringU, ringV,
            gw=gw, gh=gh, chroma_qp_off=cqoff,
            interpret=_fast_mode() == "interpret")

    def _materialize_ring_frames(self, layer: _Layer) -> None:
        """Give every in-ring DPB frame concrete padded planes (for the
        general per-frame path)."""
        if layer.ring is None:
            return
        self._flush(layer)
        ringY, ringU, ringV = layer.ring
        gw, gh = layer.ring_key[0], layer.ring_key[1]
        Hp, Wp = gh * 16 + 2 * PAD, gw * 16 + 2 * PAD
        Hcp, Wcp = gh * 8 + 2 * PAD, gw * 8 + 2 * PAD
        for f in layer.dpb.frames:
            if f.in_ring and f.planes_pad is None and f.slot >= 0:
                f.planes_pad = (
                    ringY[f.slot, 0, :Hp, :Wp].astype(jnp.int32),
                    ringU[f.slot, :Hcp, :Wcp].astype(jnp.int32),
                    ringV[f.slot, :Hcp, :Wcp].astype(jnp.int32))

    # ------------------------------------------------------------------
    # General path (I_PCM / SVC I_BL)
    # ------------------------------------------------------------------
    def _reconstruct_general(self, sps: SPS, pps: PPS, sh: SliceHeader,
                             nh: N.NalHeader, sd: SliceData, layer: _Layer,
                             dqid: int) -> np.ndarray:
        from hartallo_tpu.decode.d_device import (crop_to_host,
                                                  decode_frame_pre,
                                                  edge_pad_device)
        self._flush(layer)
        self._materialize_ring_frames(layer)
        gw, gh = sd.gw, sd.gh
        W, H = gw * 16, gh * 16

        has_inter = bool(((sd.mb_kind >= 3) & (sd.mb_kind != MB_IBL)).any())
        has_ibl = bool((sd.mb_kind == MB_IBL).any())

        dummy = jnp.zeros((1, 1, 1), jnp.int32)
        ry = ru = rv = dummy
        if has_inter:
            from hartallo_tpu.decode.mv import derive_mvs
            derive_mvs(sd)
            layer.dpb.max_refs = sps.max_num_ref_frames
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
                else (dqid - 1 if (dqid & 15) else dqid - 16)
            base = self.layers.get(base_dqid)
            if base is None or base.last_recon is None:
                raise ValueError("I_BL without decoded base layer")
            if hasattr(base.last_recon, "resolve"):
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

        # SVC inter-layer residual prediction (G.8.6.3, same-res): rS
        # of the reference layer, added under clip3 before reconstruction
        has_respred = bool(sd.res_pred.any())
        res_add_y = np.zeros((H, W), np.int32)
        res_add_c = np.zeros((2, H // 2, W // 2), np.int32)
        rp_mask_np = sd.res_pred != 0
        luma_ac, luma_dc = sd.luma_ac, sd.luma_dc
        chroma_ac, chroma_dc = sd.chroma_ac, sd.chroma_dc
        qref = (dqid & 15) > 0 and \
            bool(((sd.mb_kind >= 3) & (sd.mb_kind != MB_IBL)).any())
        if qref:
            # quality refinement (G.8.5.1): accumulate this picture's
            # transform-coefficient levels with the quality-base
            # picture's BEFORE the inverse transform; the combined
            # residual rides the respred accumulation input (the
            # current-picture coefficient arrays are zeroed so the
            # device residual contribution is exactly the accumulation)
            from hartallo_tpu.decode.d_pool import \
                accumulated_residual_planes_np
            base_dqid = sh.ref_layer_dq_id if sh.ref_layer_dq_id >= 0 \
                else dqid - 1
            base = self.layers.get(base_dqid)
            if base is None or base.last_coeffs is None:
                raise ValueError("quality refinement without decoded "
                                 "quality-base coefficients")
            res_add_y, res_add_c0, res_add_c1 = \
                accumulated_residual_planes_np(
                    base.last_coeffs,
                    (sd.luma_ac, sd.chroma_ac, sd.chroma_dc, sd.qp),
                    pps.chroma_qp_index_offset)
            res_add_c = np.stack([res_add_c0, res_add_c1])
            rp_mask_np = (sd.mb_kind >= 3) & (sd.mb_kind != MB_IBL)
            luma_ac = np.zeros_like(sd.luma_ac)
            luma_dc = np.zeros_like(sd.luma_dc)
            chroma_ac = np.zeros_like(sd.chroma_ac)
            chroma_dc = np.zeros_like(sd.chroma_dc)
            has_respred = True
        elif has_respred:
            base_dqid = sh.ref_layer_dq_id if sh.ref_layer_dq_id >= 0 \
                else (dqid - 1 if (dqid & 15) else dqid - 16)
            base = self.layers.get(base_dqid)
            if base is None or base.last_residual is None:
                raise ValueError("residual_prediction without decoded "
                                 "base-layer residual")
            bry, brcb, brcr = base.last_residual
            if bry.shape != (H, W):
                # spatial layers: G.8.6.3 residual resampling
                from hartallo_tpu.svc.upsample import \
                    upsample_residual_plane_np
                bry = upsample_residual_plane_np(bry, H, W)
                brcb = upsample_residual_plane_np(brcb, H // 2, W // 2,
                                                  chroma=True)
                brcr = upsample_residual_plane_np(brcr, H // 2, W // 2,
                                                  chroma=True)
            res_add_y = bry
            res_add_c = np.stack([brcb, brcr])

        from hartallo_tpu.decode.params import effective_weight4x4
        w4 = effective_weight4x4(sps, pps)
        padY, padU, padV, res_y, res_c = decode_frame_pre(
            jnp.asarray(luma_ac), jnp.asarray(luma_dc),
            jnp.asarray(chroma_ac), jnp.asarray(chroma_dc),
            jnp.asarray(sd.qp, jnp.int32),
            jnp.asarray(sd.mb_kind == MB_I16),
            jnp.asarray(sd.mv, jnp.int32),
            jnp.asarray(sd.ref_idx, jnp.int32), ry, ru, rv,
            up_y_mb, up_c_mb, jnp.asarray(sd.mb_kind, jnp.int32),
            jnp.asarray(pcm_y), jnp.asarray(pcm_u), jnp.asarray(pcm_v),
            jnp.asarray(w4 if w4 is not None
                        else np.full((2, 3, 4, 4), 16, np.int32)),
            jnp.asarray(res_add_y), jnp.asarray(res_add_c),
            jnp.asarray(rp_mask_np),
            gw=gw, gh=gh, has_inter=has_inter, has_ibl=has_ibl,
            chroma_qp_off=pps.chroma_qp_index_offset,
            use_weights=w4 is not None, has_respred=has_respred)

        mb_is_inter = (sd.mb_kind >= 3) & (sd.mb_kind != MB_IBL)
        al, at = availability_masks(sd.slice_id,
                                    bool(pps.constrained_intra_pred_flag),
                                    mb_is_inter)
        atr = availability_tr(sd.slice_id,
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
            jnp.asarray(al), jnp.asarray(at), jnp.asarray(atr),
            gw=gw, gh=gh)

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
            fr = Frame(frame_num=sh.frame_num, poc=poc,
                       planes_pad=planes_pad)
            layer.dpb.add(fr, mmcos=sh.mmcos or None, idr=nh.is_idr,
                          long_term_reference_flag=sh
                          .long_term_reference_flag)
            if layer.ring_key is not None:
                S = layer.ring_key[2]
                used = {f.slot for f in layer.dpb.frames
                        if f is not fr and f.slot >= 0}
                free = [s for s in range(S - 1) if s not in used]
                fr.slot = free[0] if free else -1

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
