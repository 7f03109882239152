"""CRAM 3.0 codec tests.

The reference consumes CRAM transparently through htslib
(lib.rs:138-180); the engine's native decoder (io/cram.py) must lower
CRAM containers to the same record stream as the BAM/SAM parsers.  No
htslib/pysam/samtools exists in this environment, so fixtures are
produced by the module's own spec-compliant writer and validated by
byte-exact equality with the SAM->BAM encoding of the same records
(which IS golden-tested against the reference elsewhere)."""

import numpy as np
import pytest

from coverm_tpu.cli import main
from coverm_tpu.io import cram
from coverm_tpu.io.bam import BamStreamReader, parse_bam_bytes
from coverm_tpu.io.sam import sam_text_to_bam_data


# ---------------------------------------------------------------------------
# primitives

@pytest.mark.parametrize("v", [0, 1, 0x7F, 0x80, 0x3FFF, 0x4000, 0x1FFFFF,
                               0x200000, 0xFFFFFFF, 0x10000000, 0x7FFFFFFF,
                               -1, -2, -(1 << 31)])
def test_itf8_roundtrip(v):
    enc = cram.write_itf8(v)
    dec, p = cram.read_itf8(enc, 0)
    assert dec == v and p == len(enc)


@pytest.mark.parametrize("v", [0, 0x7F, 0x80, 1 << 20, 1 << 35, 1 << 48,
                               (1 << 63) - 1, -1, -(1 << 40)])
def test_ltf8_roundtrip(v):
    enc = cram.write_ltf8(v)
    dec, p = cram.read_ltf8(enc, 0)
    assert dec == v and p == len(enc)


@pytest.mark.parametrize("order", [0, 1])
def test_rans_roundtrip(order):
    rng = np.random.default_rng(3)
    cases = [
        b"x",
        b"A" * 4097,
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
        bytes(rng.integers(60, 64, 20001, dtype=np.uint8)),
        bytes(rng.choice([0, 7, 255], 777)),
        bytes(np.repeat(np.arange(256, dtype=np.uint8), 17)),
    ]
    import struct as _struct
    for d in cases:
        enc = cram.rans_compress(d, order)
        assert cram.rans_decompress(enc) == d  # native path when built
        # pure-python decoder stays correct (the portable fallback)
        _clen, n_out = _struct.unpack_from("<II", enc, 1)
        py = (cram.rans_decode_o0 if enc[0] == 0   # tiny inputs encode O0
              else cram.rans_decode_o1)(enc, 9, _clen, n_out)
        assert py == d


def test_eof_container_is_canonical():
    assert len(cram.CRAM_EOF) == 38
    c, _ = cram.read_container_header(cram.CRAM_EOF, 0)
    assert (c.ref_id, c.start, c.n_records, c.n_blocks) == \
        (-1, 4542278, 0, 1)
    blk, p = cram.read_block(cram.CRAM_EOF, c.blocks_start)
    assert blk.content_type == cram.CT_COMP_HEADER
    assert blk.data == bytes.fromhex("010001000100")  # 3 empty maps
    assert p == len(cram.CRAM_EOF)


def test_huffman_multi_symbol():
    codec = cram.HuffmanCodec([5, 9, 17], [1, 2, 2])
    bw = cram.BitWriter()
    vals = [5, 17, 9, 9, 5, 17, 5]
    for v in vals:
        codec.encode(bw, v)
    br = cram.BitReader(bw.getvalue())
    assert [codec.decode_int(br, {}) for _ in vals] == vals


# ---------------------------------------------------------------------------
# record-model round-trips (byte-exact vs the SAM->BAM encoder)

def _corpus():
    rng = np.random.default_rng(11)
    lines = ["@HD\tVN:1.6\tSO:coordinate",
             "@SQ\tSN:c1\tLN:20000", "@SQ\tSN:c2\tLN:9000"]
    pos = 1
    for i in range(300):
        pos += int(rng.integers(0, 40))
        rl = int(rng.integers(20, 120))
        seq = "".join(rng.choice(list("ACGTN"), rl))
        qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 41, rl))
        roll = rng.random()
        if roll < 0.5:
            cig = f"{rl}M"
        elif roll < 0.65:
            s = int(rng.integers(1, rl // 2 + 1))
            cig = f"{s}S{rl - s}M"
        elif roll < 0.8:
            a = rl // 3
            cig = f"{a}M{int(rng.integers(1, 9))}D{rl - a}M"
        elif roll < 0.9:
            a = rl // 3
            b = max(1, rl // 4)
            cig = f"{a}M{b}I{rl - a - b}M"
        else:
            a = rl // 2
            cig = f"3H{a}M{int(rng.integers(10, 500))}N{rl - a}M2H"
        tags = f"\tNM:i:{int(rng.integers(0, 6))}\tAS:i:{int(rng.integers(10, 99))}"
        if roll < 0.2:
            tags += "\tXZ:Z:note-" + str(i) + "\tXF:f:1.25\tXA:A:c"
        if roll > 0.95:
            tags += "\tXB:B:i,1,-5,700000"
        tid = "c1" if roll < 0.85 else "c2"
        yield_line = (f"q{i}\t{16 if roll > 0.7 else 0}\t{tid}\t{pos}\t"
                      f"{int(rng.integers(0, 61))}\t{cig}\t*\t0\t0\t{seq}\t"
                      f"{qual}{tags}")
        lines.append(yield_line)
    # coordinate order (the scan requires sorted input, scan.py:73-76)
    hdr, recs = lines[:3], lines[3:]
    recs.sort(key=lambda l: ({"c1": 0, "c2": 1}[l.split("\t")[2]],
                             int(l.split("\t")[3])))
    lines = hdr + recs
    # a couple of unmapped records at the end
    lines.append("u1\t4\t*\t0\t0\t*\t*\t0\t0\tACGTACGT\tIIIIIIII")
    lines.append("u2\t4\t*\t0\t0\t*\t*\t0\t0\tGGGG\t*")
    return lines


@pytest.mark.parametrize("rps,ap_delta", [(64, True), (64, False),
                                          (100000, True)])
def test_cram_roundtrip_byte_exact(rps, ap_delta):
    lines = _corpus()
    ref = sam_text_to_bam_data(iter(lines))
    blob = cram.sam_to_cram_bytes(lines, records_per_slice=rps,
                                  ap_delta=ap_delta)
    assert cram.cram_to_bam_data(blob) == ref


def test_cram_nf_mate_reconstruction():
    """Attached (NF-linked) pairs: NS/NP/TLEN and the mate flag bits are
    NOT stored and must be reconstructed from the partner record (cram
    spec 10.2 / htslib cram_decode semantics)."""
    lines = [
        "@HD\tVN:1.6\tSO:coordinate",
        "@SQ\tSN:seq1\tLN:2000",
        "p1\t99\tseq1\t10\t60\t50M\t=\t100\t130\t" + "A" * 50 + "\t"
        + "I" * 50 + "\tNM:i:2",
        "s1\t16\tseq1\t40\t20\t30M\t*\t0\t0\t" + "G" * 30 + "\t" + "B" * 30,
        "p1\t147\tseq1\t100\t60\t40M\t=\t10\t-130\t" + "C" * 40 + "\t"
        + "J" * 40 + "\tNM:i:0",
        # reverse-strand-first pair: leftmost record gets positive TLEN
        "p2\t83\tseq1\t500\t60\t25M\t=\t450\t-75\t" + "T" * 25 + "\t"
        + "I" * 25,
        "p2\t163\tseq1\t450\t60\t25M\t=\t500\t75\t" + "A" * 25 + "\t"
        + "I" * 25,
    ]
    ref = sam_text_to_bam_data(iter(lines))
    blob = cram.sam_to_cram_bytes(lines, use_nf=True)
    assert cram.cram_to_bam_data(blob) == ref


def test_cram_no_seq_flag():
    """CF_NO_SEQ (0x8): bases unknown, decoded as N with length kept."""
    lines = [
        "@SQ\tSN:seq1\tLN:500",
        "n1\t0\tseq1\t5\t60\t10M\t*\t0\t0\tNNNNNNNNNN\t*",
    ]
    ref = sam_text_to_bam_data(iter(lines))
    blob = cram.sam_to_cram_bytes(lines)
    assert cram.cram_to_bam_data(blob) == ref


def test_cram_bad_magic():
    with pytest.raises(cram.CramFormatError):
        list(cram.iter_cram_containers(b"BAM\x01nope"))


# ---------------------------------------------------------------------------
# engine integration

def test_parse_bam_bytes_accepts_cram():
    lines = _corpus()
    blob = cram.sam_to_cram_bytes(lines, records_per_slice=128)
    h1, b1 = parse_bam_bytes(blob)
    h2, b2 = parse_bam_bytes(sam_text_to_bam_data(iter(lines)))
    assert h1.target_names == h2.target_names
    assert (b1.tid == b2.tid).all()
    assert (b1.pos == b2.pos).all()
    assert (b1.flag == b2.flag).all()
    assert (b1.nm == b2.nm).all()
    assert (b1.block_start == b2.block_start).all()
    assert (b1.block_end == b2.block_end).all()


def test_stream_reader_cram_containerwise(tmp_path):
    """BamStreamReader on CRAM: containers decode segment-by-segment and
    contig-boundary batch cutting applies unchanged."""
    lines = _corpus()
    path = tmp_path / "sample.cram"
    path.write_bytes(cram.sam_to_cram_bytes(lines, records_per_slice=50))
    header, gen = BamStreamReader(str(path), target_bytes=1).read()
    batches = list(gen)
    assert header.target_names == ["c1", "c2"]
    assert len(batches) >= 2  # cut at the c1/c2 boundary at least
    h2, whole = parse_bam_bytes(sam_text_to_bam_data(iter(lines)))
    got_tid = np.concatenate([b.tid for b in batches])
    got_pos = np.concatenate([b.pos for b in batches])
    assert (got_tid == whole.tid).all()
    assert (got_pos == whole.pos).all()


def _cli(argv, capsys):
    rc = main(argv)
    out = capsys.readouterr()
    assert rc == 0, out.err
    return out.out


def test_cli_contig_cram_matches_bam(tmp_path, capsys):
    lines = _corpus()
    crampath = tmp_path / "s.cram"
    crampath.write_bytes(cram.sam_to_cram_bytes(lines, records_per_slice=64))
    sampath = tmp_path / "s.sam"
    sampath.write_text("\n".join(lines) + "\n")
    out_cram = _cli(["contig", "-b", str(crampath), "-m", "mean",
                     "trimmed_mean", "variance", "covered_fraction",
                     "count"], capsys)
    out_sam = _cli(["contig", "-b", str(sampath), "-m", "mean",
                    "trimmed_mean", "variance", "covered_fraction",
                    "count"], capsys)
    # identical coverage; stoit column differs by extension stem only
    assert out_cram.replace("\ts ", "\ts ") == out_sam
    assert out_cram.count("\n") == out_sam.count("\n")
    body_c = [l.split("\t")[1:] for l in out_cram.splitlines()]
    body_s = [l.split("\t")[1:] for l in out_sam.splitlines()]
    assert body_c == body_s


def test_cli_filter_cram_in_bam_out(tmp_path, capsys):
    """`coverm filter` accepts CRAM input like htslib does, writing BAM
    out; results equal the same filter over the SAM-encoded records."""
    lines = _corpus()
    crampath = tmp_path / "f.cram"
    crampath.write_bytes(cram.sam_to_cram_bytes(lines))
    from coverm_tpu.io import bgzf
    bam_raw = sam_text_to_bam_data(iter(lines))
    bampath = tmp_path / "f.bam"
    with open(bampath, "wb") as f:
        for o in range(0, len(bam_raw), 0xFF00):
            f.write(bgzf.compress_block(bam_raw[o:o + 0xFF00], 1))
        f.write(bgzf.BGZF_EOF)
    out_c = tmp_path / "fc.bam"
    out_s = tmp_path / "fs.bam"
    for src, dst in ((crampath, out_c), (bampath, out_s)):
        rc = main(["filter", "-b", str(src), "-o", str(dst),
                   "--min-read-percent-identity", "95"])
        capsys.readouterr()
        assert rc == 0
    h1, b1 = parse_bam_bytes(out_c.read_bytes())
    h2, b2 = parse_bam_bytes(out_s.read_bytes())
    assert b1.n_records == b2.n_records > 0
    assert (b1.tid == b2.tid).all() and (b1.pos == b2.pos).all()


def test_cli_genome_cram(tmp_path, capsys):
    lines = [
        "@SQ\tSN:g1~c1\tLN:2000",
        "@SQ\tSN:g2~c9\tLN:1000",
        "a\t0\tg1~c1\t1\t60\t100M\t*\t0\t0\t" + "A" * 100 + "\t*\tNM:i:0",
        "b\t0\tg2~c9\t11\t60\t50M\t*\t0\t0\t" + "C" * 50 + "\t*\tNM:i:1",
    ]
    crampath = tmp_path / "two.cram"
    crampath.write_bytes(cram.sam_to_cram_bytes(lines))
    out = _cli(["genome", "-b", str(crampath), "-s", "~", "-m", "mean",
                "--min-covered-fraction", "0",
                "--contig-end-exclusion", "0"], capsys)
    rows = dict(l.split("\t") for l in out.splitlines()[1:])
    assert set(rows) == {"g1", "g2"}
    assert float(rows["g1"]) == pytest.approx(100 / 2000, rel=1e-5)
    assert float(rows["g2"]) == pytest.approx(50 / 1000, rel=1e-5)
