"""Assembly-scale host routing (VERDICT r3 #8): prove the Python-side
routing and estimator passes stay sub-linear-visible at 100k+ contigs
and 10k+ genomes — the regime where the reference's per-contig loop
costs minutes and our vectorised paths must not regress into hidden
Python loops.

Budgets are generous (shared 2-vCPU host) but catch order-of-magnitude
regressions; measured times are printed for the log."""

import time

import numpy as np

from coverm_tpu.estimators import (BatchStats, CoveredFractionEstimator,
                                   MeanEstimator, VarianceEstimator)
from coverm_tpu.ops.depth import ReferenceLayout
from coverm_tpu.ops.sweep import prep_segments
from coverm_tpu.parallel.mesh_sweep import assign_contigs

N_CONTIGS = 120_000
N_GENOMES = 12_000
N_BLOCKS = 1_000_000


def _blocks(rng, lengths):
    tids = np.sort(rng.integers(0, len(lengths), N_BLOCKS)).astype(np.int64)
    starts = (rng.random(N_BLOCKS) * (lengths[tids] - 120)).astype(np.int64)
    return tids, starts, starts + 100


def test_routing_and_estimators_at_assembly_scale():
    rng = np.random.default_rng(0)
    lengths = rng.integers(1000, 20_000, N_CONTIGS)
    layout = ReferenceLayout.build(lengths, 75)
    tids, starts, ends = _blocks(rng, lengths)

    t0 = time.perf_counter()
    out = prep_segments(layout, tids, starts, ends)
    t_prep = time.perf_counter() - t0
    counts = np.bincount(tids, minlength=N_CONTIGS)

    t0 = time.perf_counter()
    shard_of = assign_contigs(counts, 8)
    t_assign = time.perf_counter() - t0
    assert shard_of.shape == (N_CONTIGS,)

    # vectorised estimator pass over every contig (modes._batch_stats
    # shape): one numpy pass per estimator, no per-contig Python loop
    ests = [MeanEstimator(0.0, 75, False), VarianceEstimator(0.0, 75),
            CoveredFractionEstimator(0.0)]
    z = lambda: rng.integers(0, 1000, N_CONTIGS).astype(np.int64)
    b = BatchStats(
        total_count=z(), total_bases_window=lengths - 150,
        covered_window=z(), total_bases_full=lengths, covered_full=z(),
        observed_length_full=lengths, reads=z(), mismatches=z(),
        sum_identity=rng.random(N_CONTIGS), hist=None,
        sumsq_window=z(), min_depth_window=z(), trimmed_sum=None)
    t0 = time.perf_counter()
    mat = np.stack([e.calculate_batch(b) for e in ests])
    t_est = time.perf_counter() - t0
    assert mat.shape == (3, N_CONTIGS)

    print(f"\nassembly-scale: prep_segments {t_prep:.2f}s, "
          f"assign_contigs {t_assign:.2f}s, "
          f"estimator batch x3 {t_est:.2f}s ({N_CONTIGS} contigs, "
          f"{N_BLOCKS} blocks)")
    assert t_prep < 10, t_prep
    assert t_assign < 15, t_assign
    assert t_est < 5, t_est
    del out


def test_genome_grouping_at_scale():
    """Separator-mode genome aggregation: segment reductions over a
    12k-genome map (modes._genome_batch_stats shape) stay vectorised."""
    rng = np.random.default_rng(1)
    lengths = rng.integers(1000, 20_000, N_CONTIGS).astype(np.int64)
    genome_of = rng.integers(0, N_GENOMES, N_CONTIGS)
    obs = rng.random(N_CONTIGS) < 0.4
    vals = rng.integers(0, 1000, N_CONTIGS).astype(np.int64)

    t0 = time.perf_counter()
    agg = np.zeros(N_GENOMES, np.int64)
    np.add.at(agg, genome_of[obs], vals[obs])
    lens_g = np.zeros(N_GENOMES, np.int64)
    np.add.at(lens_g, genome_of[~obs], lengths[~obs])
    t_seg = time.perf_counter() - t0
    print(f"\nassembly-scale: genome segment reduce {t_seg:.3f}s "
          f"({N_GENOMES} genomes)")
    assert t_seg < 2, t_seg
