"""Genome-mode golden tests ported from genome.rs:940-1987."""

import io

import pytest

from coverm_tpu.estimators import (CoveredBasesEstimator, MeanEstimator,
                                   PileupCountsEstimator, TrimmedMeanEstimator)
from coverm_tpu.flags import FlagFilter
from coverm_tpu.genome_exclusion import SeparatorGenomeExclusionFilter
from coverm_tpu.genomes_and_contigs import GenomesAndContigs
from coverm_tpu.modes import (BamFileSource, genome_coverage_named,
                              genome_coverage_separator)
from coverm_tpu.shard import ShardedBamSource
from coverm_tpu.takers import (OutputWriter, PileupCoverageTaker,
                               StreamingCoverageTaker)

SEP_FLAGS = FlagFilter(include_improper_pairs=True, include_secondary=True,
                       include_supplementary=True)
NAMED_FLAGS = FlagFilter(include_improper_pairs=True, include_secondary=False,
                         include_supplementary=False)


def run_separator(bam_paths_or_sources, separator, estimators, print_zeros,
                  single_genome=False, pileup=False,
                  flags=SEP_FLAGS):
    buf = io.StringIO()
    taker = (PileupCoverageTaker if pileup else StreamingCoverageTaker)(
        OutputWriter(fileobj=buf))
    sources = [BamFileSource(p) if isinstance(p, str) else p
               for p in bam_paths_or_sources]
    rm = genome_coverage_separator(sources, separator, taker, estimators,
                                   print_zeros, flags,
                                   single_genome=single_genome)
    return buf.getvalue(), rm


def run_named(bam_paths, geco, estimators, print_zeros, pileup=False):
    buf = io.StringIO()
    taker = (PileupCoverageTaker if pileup else StreamingCoverageTaker)(
        OutputWriter(fileobj=buf))
    rm = genome_coverage_named([BamFileSource(p) for p in bam_paths], geco,
                               taker, estimators, print_zeros, NAMED_FLAGS)
    return buf.getvalue(), rm


def two_seq_geco(genome_name="s"):
    geco = GenomesAndContigs()
    gi = geco.establish_genome(genome_name)
    geco.insert("seq1", gi)
    geco.insert("seq2", gi)
    return geco


def test_one_genome_two_contigs_first_covered(ref_data):
    out, _ = run_separator([ref_data("2seqs.reads_for_seq1.bam")], "q",
                           [MeanEstimator(0.0, 0, False)], True)
    assert out == "2seqs.reads_for_seq1\tse\t0.6\n"


def test_one_genome_two_contigs_first_covered_contig_names(ref_data):
    out, _ = run_named([ref_data("2seqs.reads_for_seq1.bam")],
                       two_seq_geco("se"), [MeanEstimator(0.0, 0, False)], True)
    assert out == "2seqs.reads_for_seq1\tse\t0.6\n"


def test_one_genome_two_contigs_second_covered(ref_data):
    out, _ = run_separator([ref_data("2seqs.reads_for_seq2.bam")], "q",
                           [MeanEstimator(0.0, 0, False)], True)
    assert out == "2seqs.reads_for_seq2\tse\t0.6\n"


def test_one_genome_two_contigs_both_covered(ref_data):
    out, _ = run_separator([ref_data("2seqs.reads_for_seq1_and_seq2.bam")],
                           "e", [MeanEstimator(0.0, 0, False)], True)
    assert out == "2seqs.reads_for_seq1_and_seq2\ts\t1.2\n"


def test_one_genome_min_fraction_covered_under_min(ref_data):
    out, _ = run_separator([ref_data("2seqs.reads_for_seq1_and_seq2.bam")],
                           "e", [MeanEstimator(0.76, 0, False)], True)
    assert out == "2seqs.reads_for_seq1_and_seq2\ts\t0\n"


def test_one_genome_min_fraction_covered_under_min_contig_names(ref_data):
    out, _ = run_named([ref_data("2seqs.reads_for_seq1_and_seq2.bam")],
                       two_seq_geco(), [MeanEstimator(0.76, 0, False)], False)
    assert out == ""


def test_one_genome_min_fraction_covered_just_ok(ref_data):
    out, _ = run_separator([ref_data("2seqs.reads_for_seq1_and_seq2.bam")],
                           "e", [MeanEstimator(0.759, 0, False)], True)
    assert out == "2seqs.reads_for_seq1_and_seq2\ts\t1.2\n"


def test_two_contigs_trimmed_mean(ref_data):
    out, _ = run_separator([ref_data("2seqs.reads_for_seq1_and_seq2.bam")],
                           "e", [TrimmedMeanEstimator(0.1, 0.9, 0.759, 0)],
                           True)
    assert out == "2seqs.reads_for_seq1_and_seq2\ts\t1.08875\n"


def test_two_contigs_pileup_counts_estimator(ref_data):
    out, _ = run_separator([ref_data("2seqs.reads_for_seq1_and_seq2.bam")],
                           "e", [PileupCountsEstimator(0.0, 0)], True,
                           pileup=True,
                           flags=FlagFilter(include_improper_pairs=True,
                                            include_secondary=False,
                                            include_supplementary=False))
    assert out == (
        "2seqs.reads_for_seq1_and_seq2\ts\t0\t482\n"
        "2seqs.reads_for_seq1_and_seq2\ts\t1\t922\n"
        "2seqs.reads_for_seq1_and_seq2\ts\t2\t371\n"
        "2seqs.reads_for_seq1_and_seq2\ts\t3\t164\n"
        "2seqs.reads_for_seq1_and_seq2\ts\t4\t61\n")


def test_zero_coverage_genomes(ref_data):
    out, _ = run_separator([ref_data("7seqs.reads_for_seq1_and_seq2.bam")],
                           "~", [MeanEstimator(0.1, 0, False)], True)
    assert out == (
        "7seqs.reads_for_seq1_and_seq2\tgenome1\t0\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome2\t1.2\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome3\t0\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome4\t0\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome5\t1.2\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome6\t0\n")
    out, _ = run_separator([ref_data("7seqs.reads_for_seq1_and_seq2.bam")],
                           "~", [MeanEstimator(0.1, 0, False)], False)
    assert out == (
        "7seqs.reads_for_seq1_and_seq2\tgenome2\t1.2\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome5\t1.2\n")


def test_zero_coverage_genomes_after_min_fraction(ref_data):
    out, _ = run_separator([ref_data("7seqs.reads_for_seq1_and_seq2.bam")],
                           "~", [MeanEstimator(0.759, 0, False)], True)
    assert out == (
        "7seqs.reads_for_seq1_and_seq2\tgenome1\t0\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome2\t0\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome3\t0\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome4\t0\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome5\t1.2\n"
        "7seqs.reads_for_seq1_and_seq2\tgenome6\t0\n")


def test_single_genome(ref_data):
    out, _ = run_separator([ref_data("7seqs.reads_for_seq1_and_seq2.bam")],
                           "~", [MeanEstimator(0.0, 0, False)], True,
                           single_genome=True)
    assert out == "7seqs.reads_for_seq1_and_seq2\tgenome1\t0.04209345\n"


def test_covered_bases_estimator(ref_data):
    out, _ = run_separator([ref_data("7seqs.reads_for_seq1_and_seq2.bam")],
                           "~", [CoveredBasesEstimator(0.0)], False)
    assert out == ("7seqs.reads_for_seq1_and_seq2\tgenome2\t669\n"
                   "7seqs.reads_for_seq1_and_seq2\tgenome5\t849\n")


def test_sharded_bams_with_zero_coverage(ref_data):
    src = ShardedBamSource([ref_data("shard1.bam"), ref_data("shard2.bam")])
    out, _ = run_separator([src], "~", [MeanEstimator(0.1, 0, False)], True)
    assert out == (
        "shard1|shard2\tgenome3\t0.10908099\n"
        "shard1|shard2\tgenome4\t0.109071076\n"
        "shard1|shard2\tgenome5\t0\n"
        "shard1|shard2\tgenome6\t0.10906117\n"
        "shard1|shard2\tgenome1\t0.10904135\n"
        "shard1|shard2\tgenome2\t0\n")


def test_sharded_bams_with_genome_exclusion(ref_data):
    ex = SeparatorGenomeExclusionFilter(["genome3"], "~")
    src = ShardedBamSource([ref_data("shard1.bam"), ref_data("shard2.bam")],
                           genome_exclusion=ex)
    out, _ = run_separator([src], "~", [MeanEstimator(0.1, 0, False)], True)
    assert out == (
        "shard1|shard2\tgenome3\t0\n"
        "shard1|shard2\tgenome4\t0.109071076\n"
        "shard1|shard2\tgenome5\t0\n"
        "shard1|shard2\tgenome6\t0.10906117\n"
        "shard1|shard2\tgenome1\t0.10904135\n"
        "shard1|shard2\tgenome2\t0\n")
