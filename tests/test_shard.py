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
