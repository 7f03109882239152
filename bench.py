"""Benchmark: aligned reads/s for depth accumulation + estimator suite.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: a synthetic metagenomic sample — 32 contigs x 1 Mbp, 20x
coverage with 150 bp single-block reads (~4.3M aligned reads) — pushed
through the production streaming pipeline: contig-disjoint batches (the
BamStreamReader shape), each dispatched DEFERRED to the transfer-minimal
event-sweep engine (u16 start-delta upload, device sort + scans,
variance from moments, trimmed mean from device rank queries), so batch
i+1's host prep + h2d overlap batch i's device compute; per-contig
results are fetched and merged at the end, then the vectorised
estimator suite (mean, trimmed_mean, variance, covered_fraction) runs.

Reported value is the MEDIAN over reps (VERDICT r1: min-of-N hid ~10x
recompilation outliers; the per-rep times are printed to stderr).

vs_baseline is the speedup over a single-core CoverM-style streaming
scan (numpy ups-and-downs + prefix sum + bincount), the reference's
concurrency model (SURVEY.md §6: the reference publishes no numbers;
its scan is single-threaded per sample).
"""

import json
import sys
import time

import numpy as np

N_BATCHES = 8
REPS = 7


def make_workload(n_contigs=32, contig_len=1_000_000, coverage=20, read_len=150,
                  seed=0):
    rng = np.random.default_rng(seed)
    n_reads = n_contigs * contig_len * coverage // read_len
    lengths = np.full(n_contigs, contig_len, dtype=np.int64)
    tids = rng.integers(0, n_contigs, n_reads)
    starts = (rng.random(n_reads) * (contig_len - 1)).astype(np.int64)
    # coordinate-sorted, as any real BAM stream delivers blocks
    order = np.lexsort((starts, tids))
    tids, starts = tids[order], starts[order]
    ends = np.minimum(starts + read_len, contig_len)
    return lengths, tids, starts, ends, n_reads


def split_batches(lengths, tids, starts, ends, n_batches):
    """Contig-disjoint batches, the shape BamStreamReader delivers."""
    n_contigs = len(lengths)
    per = -(-n_contigs // n_batches)
    bounds = np.searchsorted(tids, np.arange(0, n_contigs + per, per))
    out = []
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        if hi > lo:
            out.append((tids[lo:hi], starts[lo:hi], ends[lo:hi]))
    return out


def merge_stats(parts):
    """Merge contig-disjoint DepthStats by addition (scan.merge_scans
    semantics: only one part is nonzero per contig)."""
    out = parts[0]
    for p in parts[1:]:
        out.sum_depth_window += p.sum_depth_window
        out.covered_window += p.covered_window
        out.covered_full += p.covered_full
        out.max_depth_window += p.max_depth_window
        out.sumsq_window += p.sumsq_window
        out.min_depth_window += p.min_depth_window
        if out.trimmed_sum is not None:
            out.trimmed_sum += p.trimmed_sum
    return out


def run_estimators(layout, stats, n_contigs):
    """Vectorised estimator evaluation (the engine's contig-mode path):
    variance from moments, trimmed mean from device rank sums — no
    histogram involved."""
    from coverm_tpu.estimators import (MeanEstimator, TrimmedMeanEstimator,
                                       VarianceEstimator,
                                       CoveredFractionEstimator, BatchStats)
    ests = [MeanEstimator(0.0, 75, False),
            TrimmedMeanEstimator(0.05, 0.95, 0.0, 75),
            VarianceEstimator(0.0, 75),
            CoveredFractionEstimator(0.0)]
    ee = 75
    lens = layout.lengths
    zeros = np.zeros(n_contigs, dtype=np.int64)
    b = BatchStats(
        total_count=stats.sum_depth_window,
        total_bases_window=np.where(lens > 2 * ee, lens - 2 * ee, 0),
        covered_window=stats.covered_window,
        total_bases_full=lens,
        covered_full=stats.covered_full,
        observed_length_full=lens,
        reads=zeros, mismatches=zeros, sum_identity=zeros.astype(float),
        hist=stats.hist,
        sumsq_window=stats.sumsq_window,
        min_depth_window=stats.min_depth_window,
        trimmed_sum=stats.trimmed_sum,
    )
    return np.stack([e.calculate_batch(b) for e in ests])


def baseline_numpy_scan(lengths, tids, starts, ends, ee=75):
    """Single-core CoverM-style scan: per-contig delta array, serial
    prefix sum, histogram walk."""
    order = np.argsort(tids, kind="stable")
    tids, starts, ends = tids[order], starts[order], ends[order]
    bounds = np.searchsorted(tids, np.arange(len(lengths) + 1))
    for c in range(len(lengths)):
        lo, hi = bounds[c], bounds[c + 1]
        ln = int(lengths[c])
        delta = np.zeros(ln + 1, dtype=np.int32)
        np.add.at(delta, starts[lo:hi], 1)
        e = ends[lo:hi]
        np.add.at(delta, e[e < ln], -1)
        depth = np.cumsum(delta[:ln])
        w = depth[ee: ln - ee]
        w.sum(), (w > 0).sum(), (depth > 0).sum()
        np.bincount(w)


def main():
    from coverm_tpu.ops.depth import ReferenceLayout, start_transfer_warmup
    from coverm_tpu.ops.sweep import (DepthAccumulator,
                                      compute_depth_stats_sweep)
    start_transfer_warmup()
    import jax
    print(f"devices: {jax.devices()}", file=sys.stderr)

    lengths, tids, starts, ends, n_reads = make_workload()
    layout = ReferenceLayout.build(lengths, 75)
    batches = split_batches(lengths, tids, starts, ends, N_BATCHES)
    print(f"{len(batches)} contig-disjoint batches, sizes "
          f"{[len(b[0]) for b in batches]}", file=sys.stderr)

    TRIM = (0.05, 0.95)

    def one_pass():
        # per-batch sweeps are folded into one device accumulator (the
        # batches are contig-disjoint, so the merge is exact addition);
        # the whole pass costs ONE u8 upload per batch + ONE d2h fetch
        acc = DepthAccumulator()
        for bt, bs, be in batches:
            compute_depth_stats_sweep(layout, bt, bs, be, need_hist=False,
                                      trim=TRIM, deferred=True, acc=acc)
        acc.start_fetch()
        stats = acc.result()
        run_estimators(layout, stats, len(lengths))
        return stats

    # warmup: compile + first d2h transfer
    t0 = time.time()
    one_pass()
    print(f"warmup (compile+transfer-setup): {time.time()-t0:.1f}s",
          file=sys.stderr)

    times = []
    for _ in range(REPS):
        t0 = time.time()
        one_pass()
        times.append(time.time() - t0)
    med = float(np.median(times))
    reads_per_s = n_reads / med
    print(f"times: {[round(t,3) for t in times]}  median={med:.3f}s "
          f"p90={np.quantile(times, 0.9):.3f}s", file=sys.stderr)

    # single-core reference-style baseline: best of 3 (the conservative
    # comparison — machine noise should never flatter vs_baseline)
    base_times = []
    for _ in range(3):
        t0 = time.time()
        baseline_numpy_scan(lengths, tids, starts, ends)
        base_times.append(time.time() - t0)
    base_time = min(base_times)
    base_reads_per_s = n_reads / base_time
    print(f"baseline single-core scan: best {base_time:.3f}s of "
          f"{[round(t,3) for t in base_times]} "
          f"({base_reads_per_s:,.0f} reads/s)", file=sys.stderr)

    print(json.dumps({
        "metric": "aligned reads/s/chip (depth accumulation + estimator suite)",
        "value": round(reads_per_s),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / base_reads_per_s, 3),
    }))


if __name__ == "__main__":
    main()
