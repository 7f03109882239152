"""Streaming `filter`: bounded memory, huge-header round-trip
(VERDICT r1 item 5; reference test_cmdline.rs:4212-4369, filter.rs:86-234).
"""

import struct

import numpy as np
import pytest

from coverm_tpu.filter_stream import stream_filter_bam
from coverm_tpu.io import bgzf
from coverm_tpu.io.bam import BamReader
from coverm_tpu.io.sam import sam_text_to_bam_data
from coverm_tpu.readfilter import FilterParams
from coverm_tpu.flags import FlagFilter


def _params(**kw):
    base = dict(min_aligned_length_single=0, min_percent_identity_single=0.0,
                min_aligned_percent_single=0.0, min_aligned_length_pair=0,
                min_percent_identity_pair=0.0, min_aligned_percent_pair=0.0)
    base.update(kw)
    return FilterParams(**base)


def _read_all(path):
    r = BamReader(path)
    return r.header, r.batch


@pytest.mark.parametrize("kw,flags", [
    ({}, {}),
    ({"min_percent_identity_single": 0.95}, {}),
    ({"min_percent_identity_pair": 0.99}, {"include_improper_pairs": False}),
])
def test_stream_filter_matches_whole_file(ref_data, tmp_path, kw, flags):
    """Tiny segments force every carry/cut path; output must equal the
    whole-file filter."""
    src = ref_data("2seqs.bad_read.1.bam")
    fp = _params(**kw)
    ff = FlagFilter(**flags) if flags else FlagFilter()

    big = str(tmp_path / "big.bam")
    small = str(tmp_path / "small.bam")
    stream_filter_bam(src, big, fp, ff, target_bytes=1 << 30)
    stream_filter_bam(src, small, fp, ff, target_bytes=64)

    with open(big, "rb") as a, open(small, "rb") as b:
        assert bgzf.decompress_all(a.read()) == bgzf.decompress_all(b.read())


def test_stream_filter_inverse(ref_data, tmp_path):
    src = ref_data("2seqs.bad_read.1.bam")
    out = str(tmp_path / "inv.bam")
    kept, total = stream_filter_bam(
        src, out, _params(min_percent_identity_single=0.95), FlagFilter(),
        inverse=True)
    assert total == 20
    h, b = _read_all(out)
    # inverse keeps the complement (+ unmapped): reference
    # test_filter_unmapped_inverse semantics
    normal = str(tmp_path / "n.bam")
    kept_n, _ = stream_filter_bam(
        src, normal, _params(min_percent_identity_single=0.95), FlagFilter())
    _, bn = _read_all(normal)
    assert b.n_records + bn.n_records >= 20  # unmapped may appear in both


def _huge_header_bam(path, header_mb=100, n_ref=3):
    """A BAM whose SAM-text header is ~header_mb MB of comments."""
    text = b"@HD\tVN:1.6\tSO:coordinate\n" + b"@CO\t" + b"X" * (
        header_mb << 20) + b"\n"
    names = [f"chr{i}".encode() for i in range(n_ref)]
    lens = [1000 + 7 * i for i in range(n_ref)]
    hdr = bytearray()
    hdr += b"BAM\x01" + struct.pack("<I", len(text)) + text
    hdr += struct.pack("<i", n_ref)
    for nm, ln in zip(names, lens):
        hdr += struct.pack("<i", len(nm) + 1) + nm + b"\x00"
        hdr += struct.pack("<I", ln)

    def rec(qname, tid, pos):
        qn = qname.encode() + b"\x00"
        cigar = struct.pack("<I", (40 << 4) | 0)  # 40M
        seq_len = 40
        seq = bytes((seq_len + 1) // 2)
        qual = b"\x1e" * seq_len
        aux = b"NMC\x00" + b"ASC\x28"
        body = struct.pack("<iiBBHHHiiii", tid, pos, len(qn), 60,
                           4680, 1, 0x0, seq_len, -1, -1, 0)
        body += qn + cigar + seq + qual + aux
        return struct.pack("<I", len(body)) + body

    recs = b"".join(rec(f"r{i}", i % n_ref, 10 + i) for i in range(9))
    with open(path, "wb") as f:
        w = bgzf.BgzfWriter(f)
        w.write(bytes(hdr))
        w.write(recs)
        w.close()


def test_huge_header_roundtrip(tmp_path):
    """~100MB SAM-text header streams through filter without loading it;
    records survive and the header is byte-identical (the 2.5/4.5 GB
    shape of test_cmdline.rs:4212-4369)."""
    src = str(tmp_path / "huge.bam")
    _huge_header_bam(src, header_mb=100)
    out = str(tmp_path / "out.bam")
    # single-read threshold => single path, which keeps every mapped
    # record (the synthetic records are unpaired, which the default
    # pair path would drop as improper, filter.rs:141-147)
    kept, total = stream_filter_bam(
        src, out, _params(min_aligned_length_single=1), FlagFilter(),
        target_bytes=1 << 22)  # 4MB segments
    assert (kept, total) == (9, 9)
    h, b = _read_all(out)
    assert h.target_names == ["chr0", "chr1", "chr2"]
    assert b.n_records == 9
    with open(src, "rb") as a, open(out, "rb") as o:
        assert bgzf.decompress_all(a.read()) == bgzf.decompress_all(o.read())


def test_huge_header_via_bam_reader(tmp_path):
    """The ordinary reader parses a big-text header quickly (native
    ref-walk; text capped)."""
    src = str(tmp_path / "huge2.bam")
    _huge_header_bam(src, header_mb=80)
    import time
    t0 = time.time()
    h, b = _read_all(src)
    assert time.time() - t0 < 30
    assert h.target_names == ["chr0", "chr1", "chr2"]
    assert list(h.target_lens) == [1000, 1007, 1014]
    assert b.n_records == 9
