"""Within-contig position parallelism (VERDICT r3 #2).

Two halves:
  1. The mesh engine position-splits a contig whose block count defeats
     contig-level balancing — blocks are clipped at position boundaries,
     shards psum-merge, and min/trimmed ride the (exact) merged
     histogram.  Output must equal the single-device engine bit for bit.
  2. The fused streaming scanner carries the open contig's BLOCKS (12
     bytes each) instead of raw record bytes, so a one-contig BAM far
     above the segment size streams under a VmHWM cap with output
     byte-identical to the whole-file decode.

Reference anchor: the reference streams one contig at 4 bytes/bp
(contig.rs:144-145); SURVEY §5's sequence-parallel axis."""

import os
import subprocess
import sys

import numpy as np
import pytest

from coverm_tpu.ops.depth import ReferenceLayout
from coverm_tpu.ops.sweep import compute_depth_stats_sweep
from coverm_tpu.parallel.mesh_sweep import (_route_sample,
                                            compute_depth_stats_sweep_mesh,
                                            make_shard_mesh,
                                            split_heavy_contigs)

from test_streaming import make_bam


def heavy_blocks(seed=0):
    rng = np.random.default_rng(seed)
    lengths = np.array([50_000, 3000, 3000, 3000, 3000, 3000, 3000, 3000])
    n = [8000] + [286] * 7
    ts, ss, es = [], [], []
    for c, k in enumerate(n):
        s = np.sort(rng.integers(0, lengths[c] - 120, k))
        ts.append(np.full(k, c))
        ss.append(s)
        es.append(s + rng.integers(80, 120, k))
    return lengths, (np.concatenate(ts), np.concatenate(ss),
                     np.concatenate(es))


def test_split_clipping_preserves_depth():
    lengths, (t, s, e) = heavy_blocks()
    t2, s2, e2, piece, pcounts, split = split_heavy_contigs(t, s, e, 8)
    assert split.tolist() == [0]
    assert pcounts.size > 8 - 1  # contig 0 split into multiple pieces
    # per-position depth identical
    d0 = np.zeros(lengths[0] + 200, np.int64)
    np.add.at(d0, s[t == 0], 1)
    np.add.at(d0, e[t == 0], -1)
    d1 = np.zeros_like(d0)
    np.add.at(d1, s2[t2 == 0], 1)
    np.add.at(d1, e2[t2 == 0], -1)
    np.testing.assert_array_equal(np.cumsum(d0), np.cumsum(d1))
    # pieces are position-disjoint: for each piece, no other piece of
    # the same contig overlaps its [min_start, max_end) range interior
    for p in np.unique(piece[t2 == 0]):
        m = (piece == p) & (t2 == 0)
        o = (~m) & (t2 == 0)
        lo, hi = s2[m].min(), e2[m].max()
        assert not np.any((s2[o] < hi) & (e2[o] > lo) &
                          (np.minimum(e2[o], hi) - np.maximum(s2[o], lo) > 0))


def test_split_routing_balances_shards():
    lengths, (t, s, e) = heavy_blocks()
    layout = ReferenceLayout.build(lengths, 75)
    r = _route_sample(layout, t, s, e, 8, allow_split=True)
    per_shard, split = r[12], r[13]
    assert split.tolist() == [0]
    assert per_shard.max() < 2 * per_shard.mean()
    # without splitting, one shard owns the whole heavy contig
    r0 = _route_sample(layout, t, s, e, 8, allow_split=False)
    assert r0[12].max() >= 8000


@pytest.mark.parametrize("need_hist,trim", [
    (False, (0.1, 0.9)), (True, None), (False, None), (True, (0.05, 0.95)),
])
def test_mesh_split_matches_single_device(need_hist, trim):
    lengths, (t, s, e) = heavy_blocks()
    layout = ReferenceLayout.build(lengths, 75)
    mesh = make_shard_mesh(8)
    got = compute_depth_stats_sweep_mesh(layout, t, s, e,
                                         need_hist=need_hist, trim=trim,
                                         mesh=mesh)
    ref = compute_depth_stats_sweep(layout, t, s, e, need_hist=need_hist,
                                    trim=trim)
    for f in ("sum_depth_window", "covered_window", "covered_full",
              "sumsq_window", "min_depth_window", "max_depth_window",
              "trimmed_sum"):
        a, b = getattr(got, f), getattr(ref, f)
        if a is None or b is None:
            assert a is None and b is None, f
        else:
            np.testing.assert_array_equal(a, b, err_msg=f)
    if need_hist:
        ha, hb = got.hist, ref.hist
        W = max(ha.shape[1], hb.shape[1])
        pa = np.zeros((len(lengths), W), np.int64)
        pb = pa.copy()
        pa[:, : ha.shape[1]] = ha
        pb[:, : hb.shape[1]] = hb
        np.testing.assert_array_equal(pa, pb, err_msg="hist")
    else:
        assert got.hist is None  # not requested -> dropped after the fix


def test_huge_single_contig_streams_bounded(tmp_path):
    """One contig ≫ segment size: the fused scanner's block carry keeps
    VmHWM bounded and the TSV matches the whole-file decode path."""
    path = make_bam(str(tmp_path / "one.bam"), n_contigs=1,
                    contig_len=400_000, n_reads=120_000)
    sz = os.path.getsize(path)
    args = [sys.executable, "-m", "coverm_tpu", "contig", "-b", path,
            "-m", "mean", "trimmed_mean", "variance"]
    base_env = dict(os.environ, COVERM_TPU_PLATFORM="cpu",
                    COVERM_TPU_MESH="0", MALLOC_ARENA_MAX="2")
    # whole-file decode (threshold above file size)
    r_whole = subprocess.run(
        args, capture_output=True,
        env=dict(base_env, COVERM_TPU_STREAM_THRESHOLD=str(sz + 1)))
    assert r_whole.returncode == 0, r_whole.stderr.decode()

    # streamed with 2 MB segments; measure VmHWM in-process
    script = f"""
import os, sys
os.environ["COVERM_TPU_PLATFORM"] = "cpu"
os.environ["COVERM_TPU_MESH"] = "0"
os.environ["COVERM_TPU_STREAM_THRESHOLD"] = "1"
os.environ["COVERM_TPU_SEGMENT_BYTES"] = str(2 << 20)
sys.argv = ["coverm-tpu"] + {args[3:]!r}
from coverm_tpu.cli import main
rc = main()
hwm_kb = next(int(l.split()[1]) for l in open("/proc/self/status")
              if l.startswith("VmHWM:"))
print(f"PEAK_MB={{hwm_kb / 1024:.0f}}", file=sys.stderr)
sys.exit(rc)
"""
    r_stream = subprocess.run([sys.executable, "-c", script],
                              capture_output=True, env=base_env)
    assert r_stream.returncode == 0, r_stream.stderr.decode()
    assert r_stream.stdout == r_whole.stdout
    peak = float(next(l for l in r_stream.stderr.decode().splitlines()
                      if l.startswith("PEAK_MB=")).split("=")[1])
    # decoded size ~34 MB; jax+numpy baseline dominates the cap — the
    # regression guard is that raw record bytes (~283 B/read) never
    # accumulate: block carry is 12 B/block
    assert peak < 900, f"peak RSS {peak} MB"


def test_mesh_split_deep_contig_ragged_hist():
    """A split contig deep enough to overflow the speculative histogram
    keeps an exact ragged row (hist_wide) and min/max/trimmed derived
    from it still match the single-device engine."""
    rng = np.random.default_rng(9)
    lengths = np.array([1000, 2000, 700, 1500, 3000, 801])
    layout = ReferenceLayout.build(lengths, 10)
    t = np.concatenate([np.zeros(6000, np.int64), np.full(200, 4, np.int64)])
    s = np.concatenate([np.sort(rng.integers(0, 940, 6000)),
                        np.sort(rng.integers(0, 2940, 200))])
    e = s + rng.integers(30, 60, t.size)
    mesh = make_shard_mesh(8)
    got = compute_depth_stats_sweep_mesh(layout, t, s, e, need_hist=True,
                                         trim=(0.05, 0.95), mesh=mesh)
    ref = compute_depth_stats_sweep(layout, t, s, e, need_hist=True,
                                    trim=(0.05, 0.95))
    for f in ("sum_depth_window", "covered_window", "min_depth_window",
              "max_depth_window", "trimmed_sum", "sumsq_window"):
        np.testing.assert_array_equal(getattr(got, f), getattr(ref, f),
                                      err_msg=f)
    from coverm_tpu.modes import _dense_hist
    ha, hb = _dense_hist(got), _dense_hist(ref)
    W = max(ha.shape[1], hb.shape[1])
    pa = np.zeros((len(lengths), W), np.int64)
    pb = pa.copy()
    pa[:, : ha.shape[1]] = ha
    pb[:, : hb.shape[1]] = hb
    np.testing.assert_array_equal(pa, pb, err_msg="hist")
