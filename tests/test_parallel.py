"""Sharded depth engine vs the single-device oracle, on a virtual mesh."""

import numpy as np
import pytest

import jax

from coverm_tpu.ops.depth import ReferenceLayout, compute_depth_stats_numpy
from coverm_tpu.parallel.mesh import (make_mesh, route_scatter_points,
                                      sharded_depth_step)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_depth_matches_oracle():
    rng = np.random.default_rng(0)
    n_contigs = 6
    lengths = np.array([1000, 2000, 700, 1500, 128, 999])
    layout = ReferenceLayout.build(lengths, contig_end_exclusion=10)

    # padded layout: contig c occupies [base[c], base[c]+padded[c])
    padded = (lengths + 127) // 128 * 128
    bases = np.concatenate(([0], np.cumsum(padded)))[:-1]
    P_total = int(padded.sum())  # 6784, divisible by 128
    # choose a mesh: dp=2 samples, pos=4 shards
    mesh = make_mesh(8, dp=2)
    n_pos = mesh.devices.shape[1]
    assert P_total % n_pos == 0

    pos_seg = np.repeat(np.arange(n_contigs, dtype=np.int32), padded)
    pos_in = np.arange(P_total) - bases[pos_seg]
    lens_of = lengths[pos_seg]
    valid = pos_in < lens_of
    ee = 10
    window = valid & (lens_of > 2 * ee) & (pos_in >= ee) & (pos_in <= lens_of - 1 - ee)

    all_idx, all_val, oracle = [], [], []
    for s in range(2):  # dp samples
        n_blocks = 500
        tids = rng.integers(0, n_contigs, n_blocks)
        starts = (rng.random(n_blocks) * (lengths[tids] - 1)).astype(np.int64)
        ends = np.minimum(starts + rng.integers(1, 150, n_blocks), lengths[tids])
        gidx = bases[tids] + starts
        gend = bases[tids] + ends
        keep = ends < lengths[tids]
        idx = np.concatenate([gidx, np.where(keep, gend, P_total)])
        val = np.concatenate([np.ones(n_blocks, np.int32),
                              -np.ones(n_blocks, np.int32)])
        ridx, rval = route_scatter_points(idx, val, P_total, n_pos,
                                          pad_to=2 * n_blocks)
        all_idx.append(ridx)
        all_val.append(rval)
        oracle.append(compute_depth_stats_numpy(layout, tids, starts, ends))

    idx_arr = np.stack(all_idx)
    val_arr = np.stack(all_val)
    sum_w, cov_w, cov_f, max_w = jax.device_get(sharded_depth_step(
        idx_arr, val_arr, pos_seg, window, valid, n_contigs, mesh))

    for s in range(2):
        np.testing.assert_array_equal(sum_w[s], oracle[s].sum_depth_window)
        np.testing.assert_array_equal(cov_w[s], oracle[s].covered_window)
        np.testing.assert_array_equal(cov_f[s], oracle[s].covered_full)
        np.testing.assert_array_equal(
            np.maximum(max_w[s], 0), oracle[s].max_depth_window)
