"""Golden-output tests for contig mode.

Expected TSV strings are the reference's own unit-test oracles
(src/contig.rs:324-605) evaluated over the shared fixtures in
/root/reference/tests/data.
"""

import io

import numpy as np
import pytest

from coverm_tpu.estimators import (MeanEstimator, ReadsPerBaseEstimator,
                                   TrimmedMeanEstimator, VarianceEstimator)
from coverm_tpu.flags import FlagFilter
from coverm_tpu.modes import BamFileSource, contig_coverage
from coverm_tpu.takers import OutputWriter, StreamingCoverageTaker


def run_stream(bam_paths, estimators, print_zeros, proper_pairs_only=False):
    buf = io.StringIO()
    taker = StreamingCoverageTaker(OutputWriter(fileobj=buf))
    flags = FlagFilter(
        include_improper_pairs=not proper_pairs_only,
        include_secondary=False,
        include_supplementary=False,
    )
    reads_mapped = contig_coverage(
        [BamFileSource(p) for p in bam_paths], taker, estimators,
        print_zeros, flags)
    return buf.getvalue(), reads_mapped


def test_one_genome_two_contigs_first_covered_no_zeros(ref_data):
    out, _ = run_stream(
        [ref_data("7seqs.reads_for_seq1_and_seq2.bam")],
        [MeanEstimator(0.0, 0, False)], print_zeros=False)
    assert out == (
        "7seqs.reads_for_seq1_and_seq2\tgenome2~seq1\t1.2\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome5~seq2\t1.2\n")


def test_one_genome_two_contigs_first_covered_with_zeros(ref_data):
    out, _ = run_stream(
        [ref_data("7seqs.reads_for_seq1_and_seq2.bam")],
        [MeanEstimator(0.0, 0, False)], print_zeros=True)
    assert out == (
        "7seqs.reads_for_seq1_and_seq2\tgenome1~random_sequence_length_11000\t0\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome1~random_sequence_length_11010\t0\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome2~seq1\t1.2\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome3~random_sequence_length_11001\t0\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome4~random_sequence_length_11002\t0\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome5~seq2\t1.2\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome6~random_sequence_length_11003\t0\n")


def test_one_contig_variance(ref_data):
    out, _ = run_stream(
        [ref_data("2seqs.reads_for_seq1.bam")],
        [VarianceEstimator(0.0, 0)], print_zeros=True)
    assert out == (
        "2seqs.reads_for_seq1\tseq1\t0.9489489\n"
        "2seqs.reads_for_seq1\tseq2\t0\n")


def test_multiple_coverage_methods(ref_data):
    out, _ = run_stream(
        [ref_data("2seqs.reads_for_seq1.bam")],
        [MeanEstimator(0.0, 0, False), VarianceEstimator(0.0, 0)],
        print_zeros=True)
    assert out == (
        "2seqs.reads_for_seq1\tseq1\t1.2\t0.9489489\n"
        "2seqs.reads_for_seq1\tseq2\t0\t0\n")


def test_julian_error(ref_data):
    out, _ = run_stream(
        [ref_data("2seqs.reads_for_seq1.with_unmapped.bam")],
        [MeanEstimator(0.0, 0, True)], print_zeros=True)
    assert out == (
        "2seqs.reads_for_seq1.with_unmapped\tseq1\t1.497\n"
        "2seqs.reads_for_seq1.with_unmapped\tseq2\t1.5\n")


def test_trimmed_mean_bug(ref_data):
    out, _ = run_stream(
        [ref_data("2seqs.reads_for_seq1.bam")],
        [TrimmedMeanEstimator(0.0, 0.05, 0.0, 0)], print_zeros=True)
    assert out == (
        "2seqs.reads_for_seq1\tseq1\t0\n"
        "2seqs.reads_for_seq1\tseq2\t0\n")


def test_multiple_outputs_one_zero_no_print_zeroes(ref_data):
    out, _ = run_stream(
        [ref_data("2seqs.reads_for_seq1.bam")],
        [MeanEstimator(0.0, 0, False), TrimmedMeanEstimator(0.0, 0.05, 0.0, 0)],
        print_zeros=False)
    assert out == "2seqs.reads_for_seq1\tseq1\t1.2\t0\n"


def test_multiple_outputs_reverse_order(ref_data):
    out, _ = run_stream(
        [ref_data("2seqs.reads_for_seq1.bam")],
        [TrimmedMeanEstimator(0.0, 0.05, 0.0, 0), MeanEstimator(0.0, 0, False)],
        print_zeros=False)
    assert out == "2seqs.reads_for_seq1\tseq1\t0\t1.2\n"


def test_contig_end_exclusion(ref_data):
    out, _ = run_stream(
        [ref_data("7seqs.reads_for_seq1_and_seq2.bam")],
        [MeanEstimator(0.0, 75, False), VarianceEstimator(0.0, 75)],
        print_zeros=False)
    assert out == (
        "7seqs.reads_for_seq1_and_seq2\tgenome2~seq1\t1.4117647\t1.3049262\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome5~seq2\t1.2435294\t0.6862065\n")


def test_one_read_of_pair_mapped(ref_data):
    out, _ = run_stream(
        [ref_data("1read_of_pair_mapped.bam")],
        [MeanEstimator(0.0, 75, True)], print_zeros=False)
    assert out == "1read_of_pair_mapped\t73.20100900_E1D.16_contig_9606\t0.011293635\n"


def test_variance_estimator_all_bases_covered(ref_data):
    out, _ = run_stream(
        [ref_data("k141_2005182.bam")],
        [VarianceEstimator(0.0, 75)], print_zeros=False)
    assert out == "k141_2005182\tk141_2005182\t5.107387\n"


def test_reads_not_counting_when_sufficient_min_covered(ref_data):
    out, reads_mapped = run_stream(
        [ref_data("2seqs.reads_for_seq1_and_seq2.bam")],
        [VarianceEstimator(0.0, 75)], print_zeros=False)
    assert out == (
        "2seqs.reads_for_seq1_and_seq2\tseq1\t1.3049262\n"
        "2seqs.reads_for_seq1_and_seq2\tseq2\t0.6862065\n")
    assert reads_mapped[0].num_mapped_reads == 24
    assert reads_mapped[0].num_reads == 24


def test_reads_not_counting_when_insufficient_min_covered(ref_data):
    out, reads_mapped = run_stream(
        [ref_data("2seqs.reads_for_seq1_and_seq2.bam")],
        [VarianceEstimator(0.99, 75)], print_zeros=False)
    assert out == ""
    assert reads_mapped[0].num_mapped_reads == 0
    assert reads_mapped[0].num_reads == 24
