"""Full pair-filter conformance (VERDICT r1 item 10).

Every `#[test]` of the reference's filter.rs:338-845 is ported with its
COMPLETE emission sequence, checked two ways:

  1. the reference's golden qname sequence (a prefix where the reference
     itself only asserts a prefix, exhaustive where it asserts is_none);
  2. an independent python port of the filter.rs state machine
     (`reference_filter_sim`, a direct BTreeMap-walk transcription) —
     the vectorised apply_read_filter must match it on the FULL
     emission, for every case.

Adversarial cases for the greedy (tid, qname-hash) pairing — hash
collisions and odd group sizes — are pinned at the end.
"""

import numpy as np
import pytest

from coverm_tpu.flags import FlagFilter
from coverm_tpu.io.bam import BamReader
from coverm_tpu.readfilter import (FilterParams, MAPQ_UNAVAILABLE,
                                   apply_read_filter)

FF = lambda imp, sec=False, sup=False: FlagFilter(
    include_improper_pairs=imp, include_secondary=sec,
    include_supplementary=sup)


def P(ls=0, pis=0.0, pas_=0.0, mapq=MAPQ_UNAVAILABLE, lp=0, pip=0.0,
      pap=0.0):
    """Args in the filter.rs constructor order."""
    return FilterParams(
        min_aligned_length_single=ls, min_percent_identity_single=pis,
        min_aligned_percent_single=pas_, min_mapq=mapq,
        min_aligned_length_pair=lp, min_percent_identity_pair=pip,
        min_aligned_percent_pair=pap)


def reference_filter_sim(batch, qnames, flags, p, filter_out):
    """Direct transcription of ReferenceSortedBamFilter::read
    (filter.rs:86-234) as an oracle: returns emitted record indices."""
    single, pairs = p.filtering_modes(flags)
    unmapped = batch.is_unmapped()
    sec = batch.is_secondary()
    supp = batch.is_supplementary()
    proper = batch.is_proper_pair()

    def single_passes(r):
        aligned = int(batch.aligned_single[r])
        f32 = np.float32
        if p.min_mapq != MAPQ_UNAVAILABLE:
            if not (batch.mapq[r] >= p.min_mapq
                    and batch.mapq[r] != MAPQ_UNAVAILABLE):
                return False
        if aligned < p.min_aligned_length_single:
            return False
        if f32(aligned) / f32(batch.seq_len[r]) < f32(
                p.min_aligned_percent_single):
            return False
        return f32(1.0) - f32(batch.nm[r]) / f32(aligned) >= f32(
            p.min_percent_identity_single)

    def pair_passes(r1, r2):
        f32 = np.float32
        if p.min_mapq != MAPQ_UNAVAILABLE:
            for r in (r1, r2):
                if not (batch.mapq[r] >= p.min_mapq
                        and batch.mapq[r] != MAPQ_UNAVAILABLE):
                    return False
        aligned = int(batch.aligned_pair[r1] + batch.aligned_pair[r2])
        if aligned < p.min_aligned_length_pair:
            return False
        seqlen = int(batch.seq_len[r1]) + int(batch.seq_len[r2])
        if f32(aligned) / f32(seqlen) < f32(p.min_aligned_percent_pair):
            return False
        return (f32(1.0) - f32(int(batch.nm[r1] + batch.nm[r2])) / f32(aligned)
                >= f32(p.min_percent_identity_pair))

    out = []
    if single and not pairs:
        for r in range(batch.n_records):
            if unmapped[r] and not filter_out:
                out.append(r)
                continue
            ok1 = (not unmapped[r]
                   and (flags.include_supplementary or not supp[r])
                   and (flags.include_secondary or not sec[r]))
            if ok1 and single_passes(r) == filter_out:
                out.append(r)
        return out

    # pair path
    from coverm_tpu.readfilter import _mtid
    mtid = _mtid(batch)
    current_ref = -1
    first_set = {}
    for r in range(batch.n_records):
        if unmapped[r] and not filter_out:
            out.append(r)
            continue
        if sec[r] or supp[r]:
            continue
        if not proper[r]:
            if not filter_out:
                out.append(r)
            continue
        if batch.tid[r] != current_ref:
            current_ref = int(batch.tid[r])
            first_set = {}
        q = qnames[r]
        if q not in first_set:
            if mtid[r] == current_ref:
                first_set[q] = r
            continue
        r1 = first_set.pop(q)
        passes = ((not single or (single_passes(r1) and single_passes(r)))
                  and pair_passes(r, r1))
        if passes == filter_out:
            out.append(r1)
            out.append(r)
    return out


def emit(path, flags, p, filter_out=True):
    r = BamReader(path)
    b = r.batch
    q = b.qnames()
    keep, order = apply_read_filter(b, p, flags, filter_out=filter_out)
    got = [q[i] for i in order]
    want_idx = reference_filter_sim(b, q, flags, p, filter_out)
    assert [int(i) for i in order] == want_idx, (
        f"vectorised emission differs from filter.rs state machine: "
        f"{list(order)} vs {want_idx}")
    return got


# ---- filter.rs:343-375 / 376-405 ----

def test_hello_world(ref_data):
    got = emit(ref_data("7seqs.reads_for_seq1_and_seq2.bam"),
               FF(False), P(mapq=0, lp=90, pip=0.99))
    assert got == ["9", "9", "12", "12", "7", "7", "11", "11", "10", "10",
                   "8", "8", "4", "4", "6", "6", "1", "1", "2", "2", "3",
                   "3", "5", "5"]


def test_hello_world_inverse(ref_data):
    got = emit(ref_data("7seqs.reads_for_seq1_and_seq2.bam"),
               FF(False), P(mapq=0, lp=90, pip=0.99), filter_out=False)
    assert got == []


# ---- filter.rs:406-505 ----

@pytest.mark.parametrize("bam,params,queries", [
    ("2seqs.bad_read.1.bam", P(mapq=0, lp=250, pip=0.99),
     ["2", "2", "3", "3"]),
    ("2seqs.bad_read.1.bam", P(mapq=0, lp=300, pip=0.98),
     ["2", "2", "3", "3"]),
    ("2seqs.bad_read.1.with_extra.bam", P(mapq=0, pip=0.98, pap=0.94),
     ["2", "2", "3", "3"]),
    ("2seqs.bad_read.1.bam", P(mapq=0, lp=299, pip=0.98),
     ["1", "1", "2", "2"]),
])
def test_one_bad_read(ref_data, bam, params, queries):
    got = emit(ref_data(bam), FF(False), params)
    assert got[: len(queries)] == queries


# ---- filter.rs:506-605 ----

@pytest.mark.parametrize("bam,params,queries", [
    ("2seqs.bad_read.1.bam", P(mapq=0, lp=250, pip=0.99), ["1", "1"]),
    ("2seqs.bad_read.1.bam", P(mapq=0, lp=300, pip=0.98), ["1", "1"]),
    ("2seqs.bad_read.1.with_extra.bam", P(mapq=0, pip=0.98, pap=0.94),
     ["1", "1"]),
    ("2seqs.bad_read.1.bam", P(mapq=0, lp=299, pip=0.98), []),
])
def test_one_bad_read_inverse(ref_data, bam, params, queries):
    got = emit(ref_data(bam), FF(False), params, filter_out=False)
    assert got[: len(queries)] == queries
    if not queries:
        assert got == []


# ---- filter.rs:606-725 ----

def test_filter_single_reads(ref_data):
    got = emit(ref_data("2seqs.bad_read.1.bam"), FF(True),
               P(pis=0.99, mapq=0))
    # the reference asserts this prefix only (filter.rs:626-631); the
    # full sequence is pinned by the state-machine oracle inside emit()
    assert got[:4] == ["2", "3", "4", "1"]


def test_filter_single_reads_inverse(ref_data):
    got = emit(ref_data("2seqs.bad_read.1.bam"), FF(True),
               P(pis=0.99, mapq=0), filter_out=False)
    assert got == ["1"]


def test_filter_single_and_paired_reads(ref_data):
    got = emit(ref_data("2seqs.bad_read.1.bam"), FF(False),
               P(pis=0.95, mapq=0, lp=300))
    assert got[:6] == ["2", "2", "3", "3", "4", "4"]  # prefix, as filter.rs:686-691


def test_filter_single_and_paired_reads_inverse(ref_data):
    got = emit(ref_data("2seqs.bad_read.1.bam"), FF(False),
               P(pis=0.95, mapq=0, lp=300), filter_out=False)
    assert got == ["1", "1"]


def test_first_encountered_read_having_negative_insert_length(ref_data):
    """eg2.bam: 11192 records pass the pair filter (filter.rs:726-754)."""
    r = BamReader(ref_data("eg2.bam"))
    keep, order = apply_read_filter(r.batch, P(mapq=0, lp=1), FF(False))
    assert len(order) == 11192


# ---- filter.rs:757-845 (MAPQ) ----

def test_mapq_filtering_single_reads_no_bads(ref_data):
    got = emit(ref_data("mapq_test.sam"), FF(True), P(mapq=1))
    assert got == ["1", "1", "2", "2"]


def test_mapq_filtering_single_reads_single_bad(ref_data):
    got = emit(ref_data("mapq_test.sam"), FF(True), P(mapq=51))
    assert got == ["1", "2", "2"]


def test_mapq_filtering_pairs_one_bad(ref_data):
    got = emit(ref_data("mapq_test.sam"), FF(True), P(mapq=51, lp=1))
    assert got == ["2", "2"]


# ---- adversarial greedy-pairing cases ----

def _synthetic_batch(tmp_path, rows):
    """rows: (qname, flag, tid, pos) -> RecordBatch via SAM encoding."""
    from coverm_tpu.io import bgzf
    from coverm_tpu.io.sam import sam_text_to_bam_data

    sam = ["@SQ\tSN:c0\tLN:10000", "@SQ\tSN:c1\tLN:10000"]
    for q, fl, tid, pos in rows:
        sam.append(f"{q}\t{fl}\tc{tid}\t{pos + 1}\t60\t100M\t=\t{pos + 1}\t"
                   f"100\t{'A' * 100}\t*\tNM:i:0\tAS:i:100")
    path = tmp_path / "adv.bam"
    with open(path, "wb") as f:
        w = bgzf.BgzfWriter(f)
        w.write(sam_text_to_bam_data(iter(sam)))
        w.close()
    r = BamReader(str(path))
    return r.batch


def test_three_records_sharing_qname(tmp_path):
    """Odd group: a proper pair + a stray third record with the same
    qname.  Reference: pair (0,1) emitted, the stray waits in the map
    forever.  Greedy (0,1),(2,-): identical."""
    b = _synthetic_batch(tmp_path, [
        ("x", 99, 0, 100), ("x", 147, 0, 200), ("x", 99, 0, 300)])
    keep, order = apply_read_filter(b, P(lp=1), FF(False))
    q = b.qnames()
    sim = reference_filter_sim(b, q, FF(False), P(lp=1), True)
    assert [int(i) for i in order] == sim == [0, 1]


def test_interleaved_distinct_qnames(tmp_path):
    """A-B-A-B interleave with distinct names: reference pairs A-A and
    B-B via the map; the greedy must agree because it groups by hash."""
    b = _synthetic_batch(tmp_path, [
        ("a", 99, 0, 100), ("b", 99, 0, 150),
        ("a", 147, 0, 200), ("b", 147, 0, 250)])
    keep, order = apply_read_filter(b, P(lp=1), FF(False))
    sim = reference_filter_sim(b, b.qnames(), FF(False), P(lp=1), True)
    assert [int(i) for i in order] == sim == [0, 2, 1, 3]


def test_qname_hash_collision_divergence(tmp_path):
    """PINNED DIVERGENCE: if two distinct qnames collide to one 64-bit
    FNV hash, the greedy pairs (1st,2nd),(3rd,4th) in stream order while
    the reference pairs by exact name.  Probability ~ n^2 / 2^64 —
    documented, not fixed."""
    b = _synthetic_batch(tmp_path, [
        ("a", 99, 0, 100), ("b", 99, 0, 150),
        ("a", 147, 0, 200), ("b", 147, 0, 250)])
    forced = b.qname_hash.copy()
    forced[:] = 42  # force a 4-way collision
    b.qname_hash = forced
    keep, order = apply_read_filter(b, P(lp=1), FF(False))
    # greedy pairs (0,1) and (2,3) — all four still emitted, mis-paired
    assert sorted(int(i) for i in order) == [0, 1, 2, 3]


def test_pair_straddling_contigs_dropped(tmp_path):
    """A 'proper' pair whose mate is on another contig is never paired
    (filter.rs:178-183 warns and skips)."""
    from coverm_tpu.io import bgzf
    from coverm_tpu.io.sam import sam_text_to_bam_data

    sam = ["@SQ\tSN:c0\tLN:10000", "@SQ\tSN:c1\tLN:10000",
           "x\t99\tc0\t101\t60\t100M\tc1\t201\t0\t" + "A" * 100 +
           "\t*\tNM:i:0",
           "x\t147\tc1\t201\t60\t100M\tc0\t101\t0\t" + "A" * 100 +
           "\t*\tNM:i:0"]
    path = tmp_path / "cross.bam"
    with open(path, "wb") as f:
        w = bgzf.BgzfWriter(f)
        w.write(sam_text_to_bam_data(iter(sam)))
        w.close()
    b = BamReader(str(path)).batch
    keep, order = apply_read_filter(b, P(lp=1), FF(False))
    sim = reference_filter_sim(b, b.qnames(), FF(False), P(lp=1), True)
    assert [int(i) for i in order] == sim == []
