"""Per-sample scan: RecordBatch -> per-contig integer statistics.

The TPU-side analogue of the reference's streaming hot loop
(contig.rs:107-215, genome.rs:516-729): read filters are boolean masks
over the record arrays, coverage blocks are scattered into the device
depth engine, and the per-record bookkeeping (read counts, edit
distances, identity sums) becomes bincounts over the contig id axis.

The three scan modes of the reference count reads slightly differently;
all three counts are computed here so any mode can be served:
  - primary-only            (contig mode, contig.rs:157-159)
  - non-supplementary       (separator genome mode, genome.rs:677-682)
  - all passing records     (named-genome mode, genome.rs:170-174)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .flags import FlagFilter
from .io.bam import BamHeader, RecordBatch
from .ops.depth import DepthStats, ReferenceLayout
from .ops.sweep import compute_depth_stats_sweep


class BamSortingError(Exception):
    pass


class MissingNMTagError(Exception):
    pass


@dataclass
class SampleScan:
    """Per-contig statistics for one sample (stoit)."""

    header: BamHeader
    depth: DepthStats
    observed: np.ndarray          # bool[C]: >=1 passing mapped record
    reads_primary: np.ndarray     # int64[C]
    reads_nonsupp: np.ndarray     # int64[C]
    reads_all: np.ndarray         # int64[C]
    nm_sum: np.ndarray            # int64[C] Σ NM over passing mapped records
    indel_sum: np.ndarray         # int64[C] Σ (I+D)
    identity_sum_primary: np.ndarray   # f64[C] (contig + separator modes)
    identity_sum_nonsupp: np.ndarray   # f64[C] (named-genome mode)
    num_detected_primary_alignments: int

    @property
    def mismatches(self) -> np.ndarray:
        return self.nm_sum - self.indel_sum


def scan_sample(header: BamHeader, batch: RecordBatch, layout: ReferenceLayout,
                flag_filter: FlagFilter, need_hist: bool, trim=None,
                depth_fn=compute_depth_stats_sweep) -> SampleScan:
    C = header.n_ref
    passes = flag_filter.passes(batch)
    mapped = ~batch.is_unmapped()
    use = passes & mapped

    tids = batch.tid[use]
    if tids.size and np.any(np.diff(tids) < 0):
        raise BamSortingError(
            "BAM file appears to be unsorted. Input BAM files must be sorted "
            "by reference (i.e. by samtools sort)")
    if np.any(batch.nm[use] < 0):
        raise MissingNMTagError(
            "Mapping record encountered that does not have an 'NM' auxiliary "
            "tag in the SAM/BAM format. This is required to work out some "
            "coverage statistics.")

    # coverage blocks from every passing mapped record
    buse = use[batch.block_read]
    btids = batch.tid[batch.block_read[buse]]
    depth = depth_fn(layout, btids, batch.block_start[buse],
                     batch.block_end[buse], need_hist=need_hist, trim=trim)

    observed = np.zeros(C, dtype=bool)
    observed[np.unique(tids)] = True

    primary = batch.is_primary()
    nonsupp = ~batch.is_supplementary()

    def count(mask):
        return np.bincount(batch.tid[mask], minlength=C).astype(np.int64)

    def weighted(mask, w):
        return np.bincount(batch.tid[mask], weights=w[mask], minlength=C)

    reads_primary = count(use & primary)
    reads_nonsupp = count(use & nonsupp)
    reads_all = count(use)

    nm_sum = weighted(use, batch.nm.astype(np.float64)).astype(np.int64)
    indel_sum = weighted(use, batch.indels.astype(np.float64)).astype(np.int64)

    aligned = batch.aligned_cov.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        identity = np.where(aligned > 0, (aligned - batch.nm) / aligned, 0.0)
    identity_sum_primary = weighted(use & primary & (batch.aligned_cov > 0), identity)
    identity_sum_nonsupp = weighted(use & nonsupp & (batch.aligned_cov > 0), identity)

    num_primary = int(np.count_nonzero(batch.is_primary()))

    return SampleScan(
        header=header, depth=depth, observed=observed,
        reads_primary=reads_primary, reads_nonsupp=reads_nonsupp,
        reads_all=reads_all, nm_sum=nm_sum, indel_sum=indel_sum,
        identity_sum_primary=identity_sum_primary,
        identity_sum_nonsupp=identity_sum_nonsupp,
        num_detected_primary_alignments=num_primary,
    )
