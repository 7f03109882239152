"""Pallas fused sweep-scan kernel vs a direct numpy model (interpret mode)."""

import numpy as np
import pytest

import jax

from coverm_tpu.ops.pallas_sweep import TILE, PAD_POS, pallas_sweep_scan


def build_sorted_events(lengths, tids, starts, ends, rng=None):
    """Sorted event arrays in the layout the kernel consumes."""
    n_seg = len(lengths)
    keep = ends < lengths[tids]
    seg = np.concatenate([np.arange(n_seg), tids, tids[keep]]).astype(np.int64)
    pos = np.concatenate([np.full(n_seg, -1), starts, ends[keep]]).astype(np.int64)
    sign = np.concatenate([np.zeros(n_seg), np.ones(len(tids)),
                           -np.ones(int(keep.sum()))]).astype(np.int32)
    paylen = np.concatenate([lengths, np.zeros(len(tids) + int(keep.sum()))
                             ]).astype(np.int32)
    order = np.lexsort((sign, pos, seg))
    seg, pos, sign, paylen = seg[order], pos[order], sign[order], paylen[order]
    E = ((seg.size + TILE - 1) // TILE) * TILE
    pad = E - seg.size
    seg = np.concatenate([seg, np.full(pad, n_seg)]).astype(np.int32)
    pos = np.concatenate([pos, np.full(pad, PAD_POS)]).astype(np.int32)
    sign = np.concatenate([sign, np.zeros(pad, np.int32)])
    paylen = np.concatenate([paylen, np.zeros(pad, np.int32)])
    next_seg = np.concatenate([seg[1:], [n_seg]]).astype(np.int32)
    next_pos = np.concatenate([pos[1:], [PAD_POS]]).astype(np.int32)
    return seg, pos, sign, paylen, next_seg, next_pos


def numpy_model(seg, pos, sign, paylen, next_seg, next_pos, ee):
    E = seg.size
    gsign = np.cumsum(sign)
    length = np.zeros(E, np.int64)
    carry = np.zeros(E, np.int64)
    cur_len = {}
    cur_carry = {}
    for i in range(E):
        if pos[i] == -1:
            cur_len[seg[i]] = paylen[i]
            cur_carry[seg[i]] = gsign[i]
        length[i] = cur_len.get(seg[i], 0)
        carry[i] = cur_carry.get(seg[i], 0)
    depth = gsign - carry
    gap_end = np.where(next_seg == seg, next_pos.astype(np.int64), length)
    full_len = np.clip(np.minimum(gap_end, length) - np.maximum(pos, 0), 0, None)
    w_len = np.clip(np.minimum(gap_end, length - ee) - np.maximum(pos, ee),
                    0, None)
    w_len = np.where(length > 2 * ee, w_len, 0)
    is_pad = pos >= PAD_POS
    full_len = np.where(is_pad, 0, full_len)
    w_len = np.where(is_pad, 0, w_len)
    covered = depth > 0
    cs_sum = np.cumsum(np.where(covered, depth.astype(np.int64) * w_len, 0))
    cs_cov = np.cumsum(np.where(covered, w_len, 0))
    cs_ful = np.cumsum(np.where(covered, full_len, 0))
    return cs_sum, cs_cov, cs_ful, depth, w_len


@pytest.mark.parametrize("seed,ee,n_blocks", [(0, 0, 700), (1, 75, 3000),
                                              (2, 10, 12000)])
def test_pallas_sweep_matches_numpy(seed, ee, n_blocks):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(100, 9000, 13)
    tids = np.sort(rng.integers(0, 13, n_blocks))
    starts = (rng.random(n_blocks) * (lengths[tids] - 1)).astype(np.int64)
    ends = np.minimum(starts + rng.integers(1, 400, n_blocks), lengths[tids])

    inputs = build_sorted_events(lengths, tids, starts, ends)
    want = numpy_model(*inputs, ee)
    got = pallas_sweep_scan(*inputs, ee, interpret=True)
    got = [np.asarray(jax.device_get(g)) for g in got]

    depth_w, wlen_w = want[3], want[4]
    covered = depth_w > 0
    np.testing.assert_array_equal(got[0], depth_w)
    np.testing.assert_array_equal(got[1], np.where(covered, wlen_w, 0))
    # cumulative sums recomputed from kernel outputs must match the model
    np.testing.assert_array_equal(
        np.cumsum(got[0].astype(np.int64) * got[1]), want[0])
    np.testing.assert_array_equal(np.cumsum(got[1].astype(np.int64)), want[1])
    np.testing.assert_array_equal(np.cumsum(got[2].astype(np.int64)), want[2])
    # running per-segment max at the last event of each segment
    n_seg = 13
    bounds = np.searchsorted(inputs[0], np.arange(n_seg + 1))
    for s in range(n_seg):
        hi = bounds[s + 1] - 1
        seg_mask = (inputs[0][: hi + 1] == s)
        contrib = np.where((depth_w[: hi + 1] > 0) & (wlen_w[: hi + 1] > 0),
                           depth_w[: hi + 1], 0)
        expected_max = contrib[seg_mask].max() if seg_mask.any() else 0
        assert got[4][hi] == expected_max
