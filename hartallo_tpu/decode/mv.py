"""Motion vector derivation for P slices (spec 8.4.1).

Reference parity: ``hl_codec_264_utils.c:620-965`` (8.4.1 MV + refIdx
derivation incl. median luma MV prediction and the P-Skip rule) and the
serial pre-pass ``hl_codec_264_decode_avc.c:120-147``.

Host-side serial pass (the left-neighbor dependency makes this a scan; the
arithmetic is trivial compared to the pixel work).  Produces the final
per-4x4-block MV field + ref indices consumed by the batched inter
prediction and by deblock bS.
"""
from __future__ import annotations

import numpy as np

from hartallo_tpu.decode.slice_decode import (MB_P16X16, MB_P16X8, MB_P8X16,
                                              MB_P8X8, MB_PSKIP, SliceData)


def _median(a, b, c):
    return max(min(a, b), min(max(a, b), c))


def derive_mvs(sd: SliceData) -> None:
    """Fill sd.mv (final quarter-pel MVs) and expand sd.ref_idx for all
    inter MBs, raster order."""
    gh, gw = sd.gh, sd.gw
    mv_g = np.zeros((4 * gh, 4 * gw, 2), np.int32)
    ref_g = np.full((4 * gh, 4 * gw), -1, np.int32)
    # "decoded" map at 4x4 granularity (progressively filled)
    done = np.zeros((4 * gh, 4 * gw), bool)
    mb_slice = sd.slice_id

    def neighbor(bx, by, mbx, mby):
        """Returns (avail, mv, ref) of global block (bx,by) for a partition
        in MB (mbx,mby)."""
        if bx < 0 or by < 0 or bx >= 4 * gw or by >= 4 * gh:
            return False, (0, 0), -1
        nmbx, nmby = bx >> 2, by >> 2
        if mb_slice[nmby, nmbx] != mb_slice[mby, mbx]:
            return False, (0, 0), -1
        if not done[by, bx]:
            return False, (0, 0), -1
        return True, (int(mv_g[by, bx, 0]), int(mv_g[by, bx, 1])), \
            int(ref_g[by, bx])

    def predict(gx4, gy4, w4, h4, ref, mbx, mby, shape):
        """Median/directional MV prediction (8.4.1.3)."""
        aA, mvA, rA = neighbor(gx4 - 1, gy4, mbx, mby)
        aB, mvB, rB = neighbor(gx4, gy4 - 1, mbx, mby)
        aC, mvC, rC = neighbor(gx4 + w4, gy4 - 1, mbx, mby)
        if not aC:
            aC, mvC, rC = neighbor(gx4 - 1, gy4 - 1, mbx, mby)
        # directional shortcuts for 16x8 / 8x16 partitions
        if shape == "16x8_top" and aB and rB == ref:
            return mvB
        if shape == "16x8_bot" and aA and rA == ref:
            return mvA
        if shape == "8x16_left" and aA and rA == ref:
            return mvA
        if shape == "8x16_right" and aC and rC == ref:
            return mvC
        # general rule
        matches = [(aA and rA == ref), (aB and rB == ref),
                   (aC and rC == ref)]
        if matches == [True, False, False]:
            return mvA
        if matches == [False, True, False]:
            return mvB
        if matches == [False, False, True]:
            return mvC
        if aA and not aB and not aC:
            return mvA
        mA = mvA if aA else (0, 0)
        mB = mvB if aB else (0, 0)
        mC = mvC if aC else (0, 0)
        return (_median(mA[0], mB[0], mC[0]), _median(mA[1], mB[1], mC[1]))

    def assign(gx4, gy4, w4, h4, mv, ref):
        mv_g[gy4:gy4 + h4, gx4:gx4 + w4] = mv
        ref_g[gy4:gy4 + h4, gx4:gx4 + w4] = ref
        done[gy4:gy4 + h4, gx4:gx4 + w4] = True

    for mby in range(gh):
        for mbx in range(gw):
            kind = int(sd.mb_kind[mby, mbx])
            x4, y4 = mbx * 4, mby * 4
            if kind < 3:   # intra kinds: mv 0, ref -1, mark decoded
                assign(x4, y4, 4, 4, (0, 0), -1)
                continue
            if kind == MB_PSKIP:
                aA, mvA, rA = neighbor(x4 - 1, y4, mbx, mby)
                aB, mvB, rB = neighbor(x4, y4 - 1, mbx, mby)
                if not aA or not aB or \
                        (rA == 0 and mvA == (0, 0)) or \
                        (rB == 0 and mvB == (0, 0)):
                    mv = (0, 0)
                else:
                    mv = predict(x4, y4, 4, 4, 0, mbx, mby, "16x16")
                assign(x4, y4, 4, 4, mv, 0)
                sd.mv[mby, mbx, :, :] = mv
                sd.ref_idx[mby, mbx, :] = 0
                continue
            if kind == MB_P16X16:
                ref = int(sd.ref_idx[mby, mbx, 0])
                mvp = predict(x4, y4, 4, 4, ref, mbx, mby, "16x16")
                mv = (mvp[0] + int(sd.mvd[mby, mbx, 0, 0, 0]),
                      mvp[1] + int(sd.mvd[mby, mbx, 0, 0, 1]))
                assign(x4, y4, 4, 4, mv, ref)
            elif kind == MB_P16X8:
                for p, shape in ((0, "16x8_top"), (1, "16x8_bot")):
                    ref = int(sd.ref_idx[mby, mbx, p * 2])
                    gy = y4 + p * 2
                    mvp = predict(x4, gy, 4, 2, ref, mbx, mby, shape)
                    mv = (mvp[0] + int(sd.mvd[mby, mbx, p * 2, 0, 0]),
                          mvp[1] + int(sd.mvd[mby, mbx, p * 2, 0, 1]))
                    assign(x4, gy, 4, 2, mv, ref)
            elif kind == MB_P8X16:
                for p, shape in ((0, "8x16_left"), (1, "8x16_right")):
                    ref = int(sd.ref_idx[mby, mbx, p])
                    gx = x4 + p * 2
                    mvp = predict(gx, y4, 2, 4, ref, mbx, mby, shape)
                    mv = (mvp[0] + int(sd.mvd[mby, mbx, 0, p * 2, 0]),
                          mvp[1] + int(sd.mvd[mby, mbx, 0, p * 2, 1]))
                    assign(gx, y4, 2, 4, mv, ref)
            else:  # P_8x8
                for part in range(4):
                    py, px = (part >> 1) * 2, (part & 1) * 2
                    ref = int(sd.ref_idx[mby, mbx, part])
                    st = int(sd.sub_types[mby, mbx, part])
                    if st == 0:
                        geom = [(0, 0, 2, 2)]
                    elif st == 1:      # 8x4
                        geom = [(0, 0, 2, 1), (0, 1, 2, 1)]
                    elif st == 2:      # 4x8
                        geom = [(0, 0, 1, 2), (1, 0, 1, 2)]
                    else:
                        geom = [(0, 0, 1, 1), (1, 0, 1, 1),
                                (0, 1, 1, 1), (1, 1, 1, 1)]
                    for (ox, oy_, w4, h4) in geom:
                        gx = x4 + px + ox
                        gy = y4 + py + oy_
                        mvp = predict(gx, gy, w4, h4, ref, mbx, mby, "sub")
                        mv = (mvp[0] + int(sd.mvd[mby, mbx, py + oy_,
                                                  px + ox, 0]),
                              mvp[1] + int(sd.mvd[mby, mbx, py + oy_,
                                                  px + ox, 1]))
                        assign(gx, gy, w4, h4, mv, ref)
            sd.mv[mby, mbx] = mv_g[y4:y4 + 4, x4:x4 + 4]

    sd.mv[:, :] = mv_g.reshape(gh, 4, gw, 4, 2).transpose(0, 2, 1, 3, 4)
