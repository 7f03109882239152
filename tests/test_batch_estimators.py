"""Batch (vectorised) estimator evaluation must agree bit-for-bit with
the scalar reference-arithmetic path on per-contig stats."""

import numpy as np
import pytest

from coverm_tpu.estimators import (ANIrEstimator, BatchStats,
                                   CoveredBasesEstimator,
                                   CoveredFractionEstimator, EntityStats,
                                   LengthEstimator, MeanEstimator,
                                   RPKMEstimator, ReadCountEstimator,
                                   ReadsPerBaseEstimator, TPMEstimator,
                                   TrimmedMeanEstimator, VarianceEstimator)


def random_batch(rng, C=200, D=40, ee=10):
    lens = rng.integers(1, 5000, C).astype(np.int64)
    lens[rng.random(C) < 0.1] = rng.integers(1, 2 * ee + 1)  # short contigs
    tbw = np.where(lens > 2 * ee, lens - 2 * ee, 0)
    hist = rng.integers(0, 50, (C, D)).astype(np.int64)
    hist[rng.random(C) < 0.2] = 0  # unobserved-ish rows
    covered_w = hist[:, 1:].sum(axis=1)
    # keep the hist self-consistent: bin0 = window positions not covered
    keep = covered_w <= tbw
    hist[~keep, 1:] = 0
    covered_w = hist[:, 1:].sum(axis=1)
    hist[:, 0] = tbw - covered_w
    hist[tbw == 0] = 0
    covered_f = np.minimum(covered_w + rng.integers(0, 2 * ee + 1, C), lens)
    covered_f[covered_w == 0] = 0
    reads = rng.integers(0, 500, C).astype(np.int64)
    reads[covered_w == 0] = 0
    total_count = (hist * np.arange(D)).sum(axis=1)
    mism = rng.integers(0, 5, C).astype(np.int64)
    ident = rng.random(C) * reads
    sumsq = (hist * np.arange(D) ** 2).sum(axis=1)
    has_bin = hist > 0
    min_depth = np.where(has_bin.any(axis=1), np.argmax(has_bin, axis=1), 0)
    return BatchStats(
        total_count=total_count, total_bases_window=tbw,
        covered_window=covered_w, total_bases_full=lens,
        covered_full=covered_f, observed_length_full=lens,
        reads=reads, mismatches=mism, sum_identity=ident, hist=hist,
        sumsq_window=sumsq, min_depth_window=min_depth)


def entity_of(b, i):
    s = EntityStats()
    s.total_count = int(b.total_count[i])
    s.total_bases_window = int(b.total_bases_window[i])
    s.covered_window = int(b.covered_window[i])
    s.total_bases_full = int(b.total_bases_full[i])
    s.covered_full = int(b.covered_full[i])
    s.observed_length_full = int(b.observed_length_full[i])
    s.reads = int(b.reads[i])
    s.mismatches = int(b.mismatches[i])
    s.sum_identity = float(b.sum_identity[i])
    s.hist = b.hist[i]
    s.unobserved_lengths = [0]
    return s


ESTIMATORS = [
    MeanEstimator(0.0, 10, False),
    MeanEstimator(0.10, 10, False),
    MeanEstimator(0.0, 10, True),
    TrimmedMeanEstimator(0.05, 0.95, 0.0, 10),
    TrimmedMeanEstimator(0.0, 0.05, 0.0, 10),   # degenerate trim window
    TrimmedMeanEstimator(0.25, 0.75, 0.1, 10),
    CoveredFractionEstimator(0.0),
    CoveredFractionEstimator(0.5),
    CoveredBasesEstimator(0.0),
    RPKMEstimator(0.0),
    TPMEstimator(0.0),
    VarianceEstimator(0.0, 10),
    VarianceEstimator(0.3, 10),
    LengthEstimator(),
    ReadCountEstimator(),
    ReadsPerBaseEstimator(),
    ANIrEstimator(),
]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("est", ESTIMATORS,
                         ids=[f"{type(e).__name__}#{i}"
                              for i, e in enumerate(ESTIMATORS)])
def test_batch_matches_scalar(est, seed):
    rng = np.random.default_rng(seed)
    b = random_batch(rng)
    got = est.calculate_batch(b)
    want = np.array([est.calculate(entity_of(b, i))
                     for i in range(b.reads.size)], dtype=np.float32)
    np.testing.assert_array_equal(
        np.nan_to_num(got, nan=-1, posinf=np.float32(3.4e38)),
        np.nan_to_num(want, nan=-1, posinf=np.float32(3.4e38)))


def test_trimmed_mean_heavy_tail_batch():
    """Exercise the never-exceeds-hi and single-bin walk branches."""
    rng = np.random.default_rng(9)
    C, D = 50, 8
    hist = np.zeros((C, D), dtype=np.int64)
    hist[:, 3] = 100  # one depth everywhere -> single-bin branch
    tbw = np.full(C, 100, dtype=np.int64)
    b = BatchStats(
        total_count=hist[:, 3] * 3, total_bases_window=tbw,
        covered_window=np.full(C, 100, np.int64),
        total_bases_full=tbw + 20, covered_full=np.full(C, 100, np.int64),
        observed_length_full=tbw + 20, reads=np.full(C, 10, np.int64),
        mismatches=np.zeros(C, np.int64), sum_identity=np.zeros(C),
        hist=hist, sumsq_window=hist[:, 3] * 9,
        min_depth_window=np.full(C, 3, np.int64))
    for est in (TrimmedMeanEstimator(0.05, 0.95, 0.0, 10),
                TrimmedMeanEstimator(0.0, 1.0, 0.0, 10)):
        got = est.calculate_batch(b)
        want = np.array([est.calculate(entity_of(b, i)) for i in range(C)],
                        dtype=np.float32)
        np.testing.assert_array_equal(got, want)
