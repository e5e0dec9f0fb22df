"""G.8.6.1 inter-layer motion inference (decode + encode shared).

Scope: the RestrictedSpatialResolutionChange subset the codec emits and
consumes — progressive, zero scaled-ref-layer offsets, dyadic (2x) or
same-resolution layers.  Under RSRC the spec's mixed-partition cleanup
steps (G-210..G-215) and the 8x8 merge steps (G-244..G-261) are skipped,
and each enhancement 4x4 block maps to exactly one reference-layer 4x4
block, so the derivation collapses to an index mapping:

- EL 4x4 block (BX, BY) -> base 4x4 block (BX >> s, BY >> s), s = ratio
  log2 (0 or 1);
- mv scale (G-232..G-235) is exactly ``mv << s`` for dyadic with zero
  offsets; refIdx copies unchanged (G-222, progressive);
- an EL MB whose reference-layer blocks are intra becomes I_BL (the
  intraILPredFlag branch of G.8.6.1.1) — uniform per MB under RSRC.

Reference parity: ``hl_codec_264_utils.c:1674-2006`` (G.8.6.1.1/.2) and
``:1498-1671`` (G.8.4.1 SVC — base_mode MBs take mvILPred/refIdxILPred
verbatim, no mvd).
"""
from __future__ import annotations

import numpy as np


def infer_inter_layer_motion(base_mv: np.ndarray, base_ref: np.ndarray,
                             base_intra: np.ndarray,
                             gw: int, gh: int, ratio: int):
    """Derive EL motion for base_mode_flag=1 macroblocks.

    base_mv (bgh, bgw, 4, 4, 2) int32 quarter-pel; base_ref
    (bgh, bgw, 4) per-8x8 refIdx; base_intra (bgh, bgw) bool;
    ratio in (1, 2): EL/base luma size ratio.

    Returns (mv (gh, gw, 4, 4, 2), ref (gh, gw, 4), ibl (gh, gw) bool).
    """
    assert ratio in (1, 2)
    bgh, bgw = base_intra.shape
    s = ratio - 1                      # log2 for ratio 2; 0 for same-res

    # EL 4x4 block global coords -> base block coords
    BY = (np.arange(gh * 4)[:, None] >> s)        # (4gh, 1)
    BX = (np.arange(gw * 4)[None, :] >> s)        # (1, 4gw)
    BY = np.broadcast_to(BY, (gh * 4, gw * 4))
    BX = np.broadcast_to(BX, (gh * 4, gw * 4))
    bmy, by_in = BY >> 2, BY & 3
    bmx, bx_in = BX >> 2, BX & 3
    bmy = np.clip(bmy, 0, bgh - 1)
    bmx = np.clip(bmx, 0, bgw - 1)

    mv_g = base_mv[bmy, bmx, by_in, bx_in] << s   # (4gh, 4gw, 2), G-234/5
    mv = mv_g.reshape(gh, 4, gw, 4, 2).transpose(0, 2, 1, 3, 4).copy()

    part = (by_in >> 1) * 2 + (bx_in >> 1)        # base 8x8 partition
    ref_g = base_ref[bmy, bmx, part]              # (4gh, 4gw), G-222
    # per EL 8x8: the top-left block's value (G.8.6.1.2 under RSRC)
    ref = ref_g.reshape(gh, 4, gw, 4)[:, ::2, :, ::2] \
        .reshape(gh, 2, gw, 2).transpose(0, 2, 1, 3).reshape(gh, gw, 4)
    ref = ref.astype(base_ref.dtype).copy()

    # intraILPredFlag: uniform per EL MB under RSRC (one base MB covers
    # the whole EL MB for both ratios)
    my = np.clip(np.arange(gh) >> s, 0, bgh - 1)
    mx = np.clip(np.arange(gw) >> s, 0, bgw - 1)
    ibl = base_intra[my[:, None], mx[None, :]]
    return mv, ref, ibl
