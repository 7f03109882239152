"""Cross-check the device depth engines against the numpy oracle."""

import numpy as np
import pytest

from coverm_tpu.ops.depth import (ReferenceLayout, compute_depth_stats,
                                  compute_depth_stats_numpy)
from coverm_tpu.ops.sweep import compute_depth_stats_sweep


@pytest.mark.parametrize("engine", [compute_depth_stats,
                                    compute_depth_stats_sweep])
@pytest.mark.parametrize("seed,ee", [(0, 0), (1, 75), (2, 10), (3, 600)])
def test_engine_matches_oracle(engine, seed, ee):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(50, 5000, 12)
    layout = ReferenceLayout.build(lengths, ee)
    n = 800
    tids = rng.integers(0, 12, n)
    starts = (rng.random(n) * (lengths[tids] - 1)).astype(np.int64)
    ends = np.minimum(starts + rng.integers(1, 300, n), lengths[tids])

    got = engine(layout, tids, starts, ends, need_hist=True)
    want = compute_depth_stats_numpy(layout, tids, starts, ends, need_hist=True)

    np.testing.assert_array_equal(got.sum_depth_window, want.sum_depth_window)
    np.testing.assert_array_equal(got.covered_window, want.covered_window)
    np.testing.assert_array_equal(got.covered_full, want.covered_full)
    np.testing.assert_array_equal(got.max_depth_window, want.max_depth_window)
    np.testing.assert_array_equal(got.sumsq_window, want.sumsq_window)
    obs_min = np.unique(tids)
    np.testing.assert_array_equal(got.min_depth_window[obs_min],
                                  want.min_depth_window[obs_min])
    # histograms: compare padded to the same width, plus the implicit
    # zero-depth bin
    W = max(got.hist.shape[1], want.hist.shape[1])
    g = np.zeros((12, W), np.int64)
    w = np.zeros((12, W), np.int64)
    g[:, : got.hist.shape[1]] = got.hist
    w[:, : want.hist.shape[1]] = want.hist
    # oracle's hist includes depth-0 positions only for observed contigs
    obs = np.unique(tids)
    np.testing.assert_array_equal(g[obs], w[obs])


def test_empty_sample():
    layout = ReferenceLayout.build(np.array([500, 600]), 0)
    for engine in (compute_depth_stats, compute_depth_stats_sweep):
        st = engine(layout, np.array([], int), np.array([], int),
                    np.array([], int), need_hist=True)
        assert st.sum_depth_window.sum() == 0
        assert st.covered_full.sum() == 0


@pytest.mark.parametrize("engine", [compute_depth_stats,
                                    compute_depth_stats_sweep])
@pytest.mark.parametrize("seed,ee,trim", [
    (0, 0, (0.05, 0.95)), (1, 75, (0.05, 0.95)), (2, 10, (0.0, 1.0)),
    (3, 10, (0.25, 0.75)), (4, 0, (0.0, 0.05)), (5, 3, (0.5, 0.5)),
])
def test_trimmed_sum_matches_scalar_walk(engine, seed, ee, trim):
    """The device rank-query trimmed numerators must equal the scalar
    histogram CDF walk (estimators.rs:598-643) on every contig."""
    from coverm_tpu.estimators import EntityStats, TrimmedMeanEstimator, f32

    rng = np.random.default_rng(seed)
    C = 10
    lengths = rng.integers(30, 2000, C)
    layout = ReferenceLayout.build(lengths, ee)
    n = 600
    tids = np.sort(rng.integers(0, C, n))
    starts = (rng.random(n) * (lengths[tids] - 1)).astype(np.int64)
    ends = np.minimum(starts + rng.integers(1, 200, n), lengths[tids])

    got = engine(layout, tids, starts, ends, need_hist=True, trim=trim)
    est = TrimmedMeanEstimator(trim[0], trim[1], 0.0, ee)
    for c in range(C):
        ln = int(lengths[c])
        W = ln - 2 * ee if ln > 2 * ee else 0
        s = EntityStats()
        s.total_bases_window = W
        s.covered_window = int(got.covered_window[c])
        s.hist = got.hist[c]
        s.unobserved_lengths = [0]
        want = est.calculate(s)
        lo = int(np.floor(f32(trim[0]) * f32(W)))
        hi = int(np.ceil(f32(trim[1]) * f32(W)))
        if W == 0 or s.covered_window == 0 or hi == lo:
            continue  # gated: device value unused
        got_val = f32(int(got.trimmed_sum[c])) / f32(hi - lo)
        assert got_val == want or (np.isnan(got_val) and np.isnan(want)), (
            engine.__name__, c, got_val, want, int(got.trimmed_sum[c]))


def test_hist_overflow_stays_ragged():
    """One very deep contig must NOT widen every contig's histogram row
    (the old uniform re-dispatch materialised O(contigs x max_depth));
    overflow rows land in DepthStats.hist_wide, exact vs the oracle."""
    from coverm_tpu.ops.sweep import SPEC_HIST_BINS

    rng = np.random.default_rng(9)
    C = 40
    lengths = np.full(C, 3000, dtype=np.int64)
    layout = ReferenceLayout.build(lengths, 10)
    # contig 7: depth ~ 700 (> SPEC_HIST_BINS=512); others shallow
    deep_n = 700
    tids = np.concatenate([np.full(deep_n, 7), rng.integers(0, C, 500)])
    tids = np.sort(tids).astype(np.int64)
    starts = np.where(tids == 7, 100, (rng.random(tids.size) * 2800)).astype(
        np.int64)
    ends = np.minimum(starts + 150, lengths[tids])

    got = compute_depth_stats_sweep(layout, tids, starts, ends,
                                    need_hist=True)
    want = compute_depth_stats_numpy(layout, tids, starts, ends,
                                     need_hist=True)

    assert got.hist.shape[1] <= SPEC_HIST_BINS  # dense stays speculative
    assert got.hist_wide and 7 in got.hist_wide
    assert np.all(got.hist[7] == 0)
    for c in range(C):
        row = got.hist_wide.get(c, got.hist[c])
        wrow = want.hist[c]
        W = max(len(row), len(wrow))
        g = np.zeros(W, np.int64); g[:len(row)] = row
        w = np.zeros(W, np.int64); w[:len(wrow)] = wrow
        if c in np.unique(tids):
            np.testing.assert_array_equal(g, w, err_msg=f"contig {c}")


def test_hist_wide_folding_helpers():
    """modes._sum_hist_rows / _dense_hist / _genome_batch_stats must fold
    ragged overflow rows exactly as if the histogram were dense."""
    from coverm_tpu.modes import _dense_hist, _sum_hist_rows
    from coverm_tpu.ops.depth import DepthStats

    rng = np.random.default_rng(3)
    C, W = 6, 8
    dense = rng.integers(0, 50, (C, W)).astype(np.int64)
    wide_row = rng.integers(0, 50, 30).astype(np.int64)
    full = dense.copy()
    # contig 4 overflows: its true row is wide_row
    d = DepthStats(*(np.zeros(C, np.int64) for _ in range(4)),
                   hist=dense.copy())
    d.hist[4] = 0
    d.hist_wide = {4: wide_row}

    folded = _dense_hist(d)
    assert folded.shape == (C, 30)
    np.testing.assert_array_equal(folded[4], wide_row)
    np.testing.assert_array_equal(folded[1][:W], full[1])

    s = _sum_hist_rows(d, np.array([1, 4]))
    expect = np.zeros(30, np.int64)
    expect[:W] = full[1]
    expect[:30] += wide_row
    np.testing.assert_array_equal(s, expect)

    s2 = _sum_hist_rows(d, np.array([0, 2]))  # no wide rows involved
    np.testing.assert_array_equal(s2, full[0] + full[2])
