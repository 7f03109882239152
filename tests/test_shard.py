"""Sharded (deshard) best-hit merge tests.

Golden from contig.rs:347-365 (test_sharded_bams_some_not_covered).  The
reference breaks score ties randomly; this engine picks the first tied
shard.  For the shard1/shard2 fixture the golden values are identical
under both policies (verified by the reference's own deterministic
expected string).
"""

import io

from coverm_tpu.estimators import MeanEstimator
from coverm_tpu.flags import FlagFilter
from coverm_tpu.modes import contig_coverage
from coverm_tpu.shard import ShardedBamSource
from coverm_tpu.takers import OutputWriter, StreamingCoverageTaker


def test_sharded_bams_some_not_covered(ref_data):
    buf = io.StringIO()
    taker = StreamingCoverageTaker(OutputWriter(fileobj=buf))
    src = ShardedBamSource(
        [ref_data("shard1.bam"), ref_data("shard2.bam")])
    contig_coverage(
        [src], taker, [MeanEstimator(0.0, 0, False)],
        print_zero_coverage_contigs=True,
        flag_filter=FlagFilter(include_secondary=False,
                               include_supplementary=False))
    assert buf.getvalue() == (
        "shard1|shard2\tgenome3~random_sequence_length_11001\t0.10908099\n"
        "shard1|shard2\tgenome4~random_sequence_length_11002\t0.109071076\n"
        "shard1|shard2\tgenome5~seq2\t0\n"
        "shard1|shard2\tgenome6~random_sequence_length_11003\t0.10906117\n"
        "shard1|shard2\tgenome1~random_sequence_length_11000\t0.10909091\n"
        "shard1|shard2\tgenome1~random_sequence_length_11010\t0.108991824\n"
        "shard1|shard2\tgenome2~seq1\t0\n")


def test_stream_merge_matches_in_memory(ref_data):
    """stream_merge_shards (bounded-memory deshard) must emit exactly
    the records the in-memory merge picks, in the same final order."""
    import numpy as np

    from coverm_tpu.io.bam import BamReader
    from coverm_tpu.shard import merge_shards, stream_merge_shards

    paths = [ref_data("shard1.bam"), ref_data("shard2.bam")]
    shards = [BamReader(p) for p in paths]
    hdr_m, batch_m = merge_shards([s.header for s in shards],
                                  [s.batch for s in shards])

    hdr_s, gen = stream_merge_shards(paths)
    batches = list(gen)
    assert hdr_s.target_names == hdr_m.target_names

    def cols(bs, f):
        return np.concatenate([getattr(b, f) for b in bs])

    assert sum(b.n_records for b in batches) == batch_m.n_records
    for f in ("tid", "pos", "flag", "mapq", "nm", "as_score",
              "qname_hash", "aligned_cov", "indels"):
        got = cols(batches, f)
        want = getattr(batch_m, f)
        assert np.array_equal(got, want), f


def test_stream_merge_through_cli_scan(ref_data, monkeypatch):
    """The golden sharded scan must hold when ShardedBamSource routes
    through the streaming merge (threshold forced to 1 byte)."""
    import io

    monkeypatch.setattr("coverm_tpu.modes.STREAM_THRESHOLD_BYTES", 1)
    buf = io.StringIO()
    taker = StreamingCoverageTaker(OutputWriter(fileobj=buf))
    src = ShardedBamSource(
        [ref_data("shard1.bam"), ref_data("shard2.bam")])
    contig_coverage(
        [src], taker, [MeanEstimator(0.0, 0, False)],
        print_zero_coverage_contigs=True,
        flag_filter=FlagFilter(include_secondary=False,
                               include_supplementary=False))
    assert buf.getvalue() == (
        "shard1|shard2\tgenome3~random_sequence_length_11001\t0.10908099\n"
        "shard1|shard2\tgenome4~random_sequence_length_11002\t0.109071076\n"
        "shard1|shard2\tgenome5~seq2\t0\n"
        "shard1|shard2\tgenome6~random_sequence_length_11003\t0.10906117\n"
        "shard1|shard2\tgenome1~random_sequence_length_11000\t0.10909091\n"
        "shard1|shard2\tgenome1~random_sequence_length_11010\t0.108991824\n"
        "shard1|shard2\tgenome2~seq1\t0\n")


def test_stream_merge_exclusion_matches_in_memory(ref_data):
    """The genome-exclusion veto must behave identically on the
    streaming and in-memory deshard paths."""
    import numpy as np

    from coverm_tpu.genome_exclusion import SeparatorGenomeExclusionFilter
    from coverm_tpu.io.bam import BamReader
    from coverm_tpu.shard import merge_shards, stream_merge_shards

    paths = [ref_data("shard1.bam"), ref_data("shard2.bam")]
    ex = SeparatorGenomeExclusionFilter(["genome1"], "~")
    shards = [BamReader(p) for p in paths]
    _h, batch_m = merge_shards([s.header for s in shards],
                               [s.batch for s in shards], ex)
    _h2, gen = stream_merge_shards(paths, ex)
    batches = list(gen)
    for f in ("tid", "pos", "flag", "as_score", "qname_hash"):
        got = np.concatenate([getattr(b, f) for b in batches])
        np.testing.assert_array_equal(got, getattr(batch_m, f), f)
