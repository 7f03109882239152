"""Parity: native C++ full-record parser vs the pure-python numpy parser.

The native path (io/native.parse_records_full / bamdecode.cpp
ct_parse_phase1/2) must produce bit-identical RecordBatch columns to the
python fallback for every CIGAR op and aux-tag type.  CIGAR semantics
under test follow contig.rs:168-202 (M/X/= are coverage blocks, D counts
as indel+aligned and advances, N advances only, I counts as
indel+aligned without advancing, S/H/P ignored).
"""

import numpy as np
import pytest

from coverm_tpu.io import native
from coverm_tpu.io.bam import parse_bam_data_raw
from coverm_tpu.io.sam import sam_text_to_bam_data

SAM = """\
@SQ\tSN:c1\tLN:10000
@SQ\tSN:c2\tLN:5000
r1\t0\tc1\t100\t60\t50M\t*\t0\t0\t{s50}\t*\tNM:i:2\tAS:i:48
r2\t16\tc1\t200\t40\t10M5I10M\t*\t0\t0\t{s25}\t*\tNM:i:5
r3\t0\tc1\t300\t30\t10M5D10M\t*\t0\t0\t{s20}\t*\tNM:i:5\tAS:i:11
r4\t0\tc1\t400\t20\t10M100N10M\t*\t0\t0\t{s20}\t*\tNM:i:0
r5\t0\tc1\t500\t10\t5S10M3H\t*\t0\t0\t{s15}\t*\tNM:i:1
r6longname_with_extras\t0\tc2\t1\t60\t8=2X10M\t*\t0\t0\t{s20}\t*\tNM:i:2\tXX:Z:hello\tAS:i:17\tXB:B:c,1,-2,3
r7\t4\t*\t0\t0\t*\t*\t0\t0\t{s10}\t*
r8\t0\tc2\t4995\t60\t10M\t*\t0\t0\t{s10}\t*\tNM:i:0\tXF:f:1.5\tXs:i:-300\tXC:A:z
""".format(s50="A" * 50, s25="A" * 25, s20="ACGTN" * 4, s15="A" * 15,
           s10="A" * 10)


@pytest.fixture(scope="module")
def bam_bytes():
    return sam_text_to_bam_data(iter(SAM.splitlines()))


def test_native_available():
    assert native.get_lib() is not None, "native lib must build on this host"
    assert hasattr(native.get_lib(), "ct_parse_phase1")


def test_full_parse_matches_python(bam_bytes, monkeypatch):
    header_n, batch_n = parse_bam_data_raw(bam_bytes)
    monkeypatch.setattr(native, "parse_records_full",
                        lambda *a, **k: None)  # force python fallback
    header_p, batch_p = parse_bam_data_raw(bam_bytes)

    assert header_n.target_names == header_p.target_names
    assert batch_n.n_records == batch_p.n_records == 8
    for col in ("tid", "pos", "flag", "mapq", "nm", "as_score", "seq_len",
                "aligned_cov", "aligned_single", "aligned_pair", "indels",
                "read_end", "qname_hash", "rec_start", "rec_end",
                "block_read", "block_start", "block_end"):
        np.testing.assert_array_equal(
            getattr(batch_n, col), getattr(batch_p, col), err_msg=col)
        assert getattr(batch_n, col).dtype == getattr(batch_p, col).dtype, col


def test_full_parse_semantics(bam_bytes):
    _, b = parse_bam_data_raw(bam_bytes)
    # r2: 10M5I10M -> two blocks, aligned_cov 25, indels 5, end 200-1+20
    r2 = 1
    blocks = np.flatnonzero(b.block_read == r2)
    assert blocks.size == 2
    assert b.aligned_cov[r2] == 25 and b.indels[r2] == 5
    assert b.read_end[r2] == 199 + 20
    # r3: D advances and counts aligned (cov) but pair excludes D
    r3 = 2
    assert b.aligned_cov[r3] == 25 and b.aligned_pair[r3] == 20
    assert b.read_end[r3] == 299 + 25
    # r4: N advances without aligning
    r4 = 3
    assert b.aligned_cov[r4] == 20 and b.read_end[r4] == 399 + 120
    # r5: S/H ignored; single block at pos 499
    r5 = 4
    blocks = np.flatnonzero(b.block_read == r5)
    assert blocks.size == 1 and b.block_start[blocks[0]] == 499
    # r6: = and X are blocks too
    r6 = 5
    assert np.count_nonzero(b.block_read == r6) == 3
    assert b.as_score[r6] == 17
    # r7: unmapped, no NM
    assert b.nm[6] == -1
    # r8: negative int aux must not confuse the scan
    assert b.nm[7] == 0


def test_streaming_reader_uses_native(tmp_path):
    """BamStreamReader end-to-end over the native parse (smoke)."""
    from coverm_tpu.io import bgzf
    from coverm_tpu.io.bam import BamStreamReader

    p = tmp_path / "t.bam"
    with open(p, "wb") as f:
        w = bgzf.BgzfWriter(f)
        w.write(sam_text_to_bam_data(iter(SAM.splitlines())))
        w.close()
    header, gen = BamStreamReader(str(p), target_bytes=64).read()
    batches = list(gen)
    assert sum(x.n_records for x in batches) == 8
    assert header.n_ref == 2
