"""Read/pair filter tests ported from filter.rs:338-845 — these pin the
pair-joining emission order and threshold arithmetic."""

import numpy as np

from coverm_tpu.flags import FlagFilter
from coverm_tpu.io.bam import BamReader
from coverm_tpu.readfilter import FilterParams, apply_read_filter

STRICT_FLAGS = FlagFilter(include_improper_pairs=False,
                          include_secondary=False,
                          include_supplementary=False)


def emitted_qnames(path, params, flags=STRICT_FLAGS, filter_out=True):
    r = BamReader(path)
    keep, order = apply_read_filter(r.batch, params, flags,
                                    filter_out=filter_out)
    names = r.batch.qnames()
    return [names[i] for i in order]


def test_hello_world(ref_data):
    q = emitted_qnames(
        ref_data("7seqs.reads_for_seq1_and_seq2.bam"),
        FilterParams(min_aligned_length_pair=90,
                     min_percent_identity_pair=0.99, min_mapq=0))
    assert q == ["9", "9", "12", "12", "7", "7", "11", "11", "10", "10",
                 "8", "8", "4", "4", "6", "6", "1", "1", "2", "2", "3", "3",
                 "5", "5"]


def test_hello_world_inverse(ref_data):
    q = emitted_qnames(
        ref_data("7seqs.reads_for_seq1_and_seq2.bam"),
        FilterParams(min_aligned_length_pair=90,
                     min_percent_identity_pair=0.99, min_mapq=0),
        filter_out=False)
    assert q == []


def test_one_bad_read_identity(ref_data):
    q = emitted_qnames(
        ref_data("2seqs.bad_read.1.bam"),
        FilterParams(min_aligned_length_pair=250,
                     min_percent_identity_pair=0.99))
    assert q[:4] == ["2", "2", "3", "3"]


def test_one_bad_read_aligned_length(ref_data):
    q = emitted_qnames(
        ref_data("2seqs.bad_read.1.bam"),
        FilterParams(min_aligned_length_pair=300,
                     min_percent_identity_pair=0.98))
    assert q[:4] == ["2", "2", "3", "3"]


def test_one_bad_read_aligned_length_ok(ref_data):
    q = emitted_qnames(
        ref_data("2seqs.bad_read.1.bam"),
        FilterParams(min_aligned_length_pair=299,
                     min_percent_identity_pair=0.98))
    assert q[:4] == ["1", "1", "2", "2"]


def test_one_bad_read_inverse(ref_data):
    q = emitted_qnames(
        ref_data("2seqs.bad_read.1.bam"),
        FilterParams(min_aligned_length_pair=250,
                     min_percent_identity_pair=0.99),
        filter_out=False)
    assert q == ["1", "1"]


def test_one_bad_read_aligned_length_inverse(ref_data):
    q = emitted_qnames(
        ref_data("2seqs.bad_read.1.bam"),
        FilterParams(min_aligned_length_pair=300,
                     min_percent_identity_pair=0.98),
        filter_out=False)
    assert q == ["1", "1"]
