"""End-to-end mapping-pipeline tests with a hermetic fake mapper.

The reference's e2e suite (tests/test_cmdline.rs) drives real mappers;
this image ships none, so a substring-matching stand-in (fake_mapper.py)
is installed on PATH under the mapper binary names.  These tests cover
the full read->mapper->SAM->engine->TSV path: invocation construction,
SAM stdout consumption, in-engine coordinate sort, stoit naming
(bam_generator.rs:208-228), BAM caching, `make`, and inline filtering of
freshly-mapped reads.
"""

import os
import shutil
import stat
import subprocess
import sys

import numpy as np
import pytest

from coverm_tpu.cli import main
from coverm_tpu.io.bam import BamReader
from coverm_tpu.io.sam import sam_text_to_bam_data
from coverm_tpu.io import bgzf

HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.fixture
def fake_mappers(tmp_path, monkeypatch):
    """Install fake minimap2/strobealign/bwa binaries on PATH."""
    bindir = tmp_path / "fakebin"
    bindir.mkdir()
    src = os.path.join(HERE, "fake_mapper.py")
    for name in ("minimap2", "strobealign", "bwa", "bwa-mem2"):
        dst = bindir / name
        with open(src) as f:
            body = f.read()
        dst.write_text(f"#!{sys.executable}\n" + body.split("\n", 1)[1])
        dst.chmod(dst.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    return bindir


def _rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


@pytest.fixture
def simple_ref(tmp_path):
    """One contig c1 (len 200) with deterministic sequence, and reads at
    known positions: [0,100) + [100,200) + [50,150) -> mean depth 1.5."""
    rng = np.random.default_rng(42)
    c1 = _rand_seq(rng, 200)
    ref = tmp_path / "ref.fna"
    ref.write_text(f">c1\n{c1}\n")
    reads = tmp_path / "reads.fq"
    entries = []
    for i, start in enumerate((0, 100, 50)):
        seq = c1[start:start + 100]
        entries.append(f"@r{i}\n{seq}\n+\n{'I' * 100}")
    reads.write_text("\n".join(entries) + "\n")
    return ref, reads, c1


def run_cli(argv, capsys):
    rc = main(argv)
    assert rc == 0
    return capsys.readouterr().out


def test_contig_mean_from_reads(fake_mappers, simple_ref, capsys):
    ref, reads, _ = simple_ref
    out = run_cli([
        "contig", "-r", str(ref), "--single", str(reads),
        "-p", "minimap2-sr", "--contig-end-exclusion", "0",
        "--output-format", "sparse",
    ], capsys)
    assert out == ("Sample\tContig\tMean\n"
                   "ref.fna/reads.fq\tc1\t1.5\n")


def test_contig_mean_from_reads_default_strobealign(fake_mappers, simple_ref,
                                                    capsys):
    ref, reads, _ = simple_ref
    out = run_cli([
        "contig", "-r", str(ref), "--single", str(reads),
        "--contig-end-exclusion", "0", "--output-format", "sparse",
    ], capsys)
    assert out.endswith("ref.fna/reads.fq\tc1\t1.5\n")


def test_mapping_matches_direct_bam(fake_mappers, simple_ref, tmp_path,
                                    capsys):
    """Numeric parity between the live-mapping path and a pre-made BAM of
    the same alignments."""
    ref, reads, c1 = simple_ref
    out_map = run_cli([
        "contig", "-r", str(ref), "--single", str(reads),
        "-p", "minimap2-sr", "-m", "mean", "variance", "covered_fraction",
        "--output-format", "sparse",
    ], capsys)

    # same alignments as a coordinate-sorted BAM
    sam = ["@SQ\tSN:c1\tLN:200"]
    for i, start in enumerate(sorted((0, 100, 50))):
        seq = c1[start:start + 100]
        sam.append(f"r{i}\t0\tc1\t{start + 1}\t60\t100M\t*\t0\t0\t{seq}\t*"
                   f"\tNM:i:0\tAS:i:100")
    bam = tmp_path / "direct.bam"
    with open(bam, "wb") as f:
        w = bgzf.BgzfWriter(f)
        w.write(sam_text_to_bam_data(iter(sam)))
        w.close()
    out_bam = run_cli([
        "contig", "-b", str(bam),
        "-m", "mean", "variance", "covered_fraction",
        "--output-format", "sparse",
    ], capsys)

    rows_map = [l.split("\t")[1:] for l in out_map.strip().split("\n")[1:]]
    rows_bam = [l.split("\t")[1:] for l in out_bam.strip().split("\n")[1:]]
    assert rows_map == rows_bam


def test_bam_cache_directory_roundtrip(fake_mappers, simple_ref, tmp_path,
                                       capsys):
    ref, reads, _ = simple_ref
    cache = tmp_path / "bamcache"
    out1 = run_cli([
        "contig", "-r", str(ref), "--single", str(reads),
        "-p", "minimap2-sr", "--contig-end-exclusion", "0",
        "--bam-file-cache-directory", str(cache),
        "--output-format", "sparse",
    ], capsys)
    cached = sorted(os.listdir(cache))
    assert cached == ["ref.fna.reads.fq.bam"]
    out2 = run_cli([
        "contig", "-b", str(cache / cached[0]),
        "--contig-end-exclusion", "0", "--output-format", "sparse",
    ], capsys)
    # same numbers, different stoit naming
    v1 = [l.split("\t")[2] for l in out1.strip().split("\n")[1:]]
    v2 = [l.split("\t")[2] for l in out2.strip().split("\n")[1:]]
    assert v1 == v2 == ["1.5"]


def test_make_subcommand(fake_mappers, simple_ref, tmp_path, capsys):
    ref, reads, _ = simple_ref
    outdir = tmp_path / "bams"
    rc = main(["make", "-r", str(ref), "--single", str(reads),
               "-o", str(outdir)])
    assert rc == 0
    made = sorted(os.listdir(outdir))
    assert made == ["ref.fna.reads.fq.bam"]
    r = BamReader(str(outdir / made[0]))
    assert r.batch.n_records == 3
    assert list(r.header.target_names) == ["c1"]
    # records are coordinate-sorted
    assert list(r.batch.pos) == sorted(r.batch.pos)


def test_make_discard_unmapped(fake_mappers, simple_ref, tmp_path, capsys):
    ref, reads, c1 = simple_ref
    # append a read that does not match the reference
    with open(reads, "a") as f:
        f.write(f"@bad\n{'A' * 100}\n+\n{'I' * 100}\n")
    outdir = tmp_path / "bams"
    rc = main(["make", "-r", str(ref), "--single", str(reads),
               "-o", str(outdir), "--discard-unmapped"])
    assert rc == 0
    r = BamReader(str(outdir / "ref.fna.reads.fq.bam"))
    assert r.batch.n_records == 3
    assert not r.batch.is_unmapped().any()


def test_genome_mode_from_fasta_files(fake_mappers, tmp_path, capsys):
    """No -r: the engine builds the concatenated genome~contig reference
    (mapping_index_maintenance.rs:591-702) and recovers genomes by
    separator."""
    rng = np.random.default_rng(7)
    g1 = tmp_path / "gA.fna"
    g2 = tmp_path / "gB.fna"
    c1 = _rand_seq(rng, 400)
    c2 = _rand_seq(rng, 300)
    g1.write_text(f">c1\n{c1}\n")
    g2.write_text(f">c2\n{c2}\n")
    reads = tmp_path / "r.fq"
    entries = []
    for i, start in enumerate(range(0, 400 - 100 + 1, 20)):  # 16 reads on gA
        entries.append(f"@a{i}\n{c1[start:start + 100]}\n+\n{'I' * 100}")
    reads.write_text("\n".join(entries) + "\n")

    out = run_cli([
        "genome", "-f", str(g1), str(g2), "--single", str(reads),
        "-p", "minimap2-sr", "-m", "mean", "covered_fraction",
        "--contig-end-exclusion", "0", "--min-covered-fraction", "0",
        "--output-format", "sparse",
    ], capsys)
    lines = out.strip().split("\n")
    assert lines[0] == "Sample\tGenome\tMean\tCovered Fraction"
    rows = {l.split("\t")[1]: l.split("\t")[2:] for l in lines[1:]}
    # 16 reads x 100bp over 400bp contig -> mean 4.0, fully covered
    assert rows["gA"] == ["4", "1"]
    assert rows["gB"] == ["0", "0"]


def test_coupled_reads_proper_pairs(fake_mappers, tmp_path, capsys):
    rng = np.random.default_rng(3)
    c1 = _rand_seq(rng, 300)
    ref = tmp_path / "ref.fna"
    ref.write_text(f">c1\n{c1}\n")
    r1 = tmp_path / "r1.fq"
    r2 = tmp_path / "r2.fq"
    e1, e2 = [], []
    for i, start in enumerate((0, 100)):
        e1.append(f"@p{i}\n{c1[start:start + 100]}\n+\n{'I' * 100}")
        e2.append(f"@p{i}\n{c1[start + 100:start + 200]}\n+\n{'I' * 100}")
    r1.write_text("\n".join(e1) + "\n")
    r2.write_text("\n".join(e2) + "\n")
    out = run_cli([
        "contig", "-r", str(ref), "-1", str(r1), "-2", str(r2),
        "-p", "minimap2-sr", "--contig-end-exclusion", "0",
        "--proper-pairs-only", "--output-format", "sparse",
    ], capsys)
    # 4 reads x 100bp over 300bp: positions 0-99 x1, 100-199 x2, 200-299 x1
    assert out == ("Sample\tContig\tMean\n"
                   "ref.fna/r1.fq\tc1\t1.3333334\n")


def test_inline_filter_of_mapped_reads(fake_mappers, simple_ref, capsys):
    """FilteredMappedSource: identity threshold drops the _nm10 read."""
    ref, reads, c1 = simple_ref
    with open(reads, "a") as f:
        f.write(f"@x_nm10\n{c1[100:200]}\n+\n{'I' * 100}\n")
    out_all = run_cli([
        "contig", "-r", str(ref), "--single", str(reads),
        "-p", "minimap2-sr", "--contig-end-exclusion", "0",
        "--output-format", "sparse",
    ], capsys)
    assert out_all.endswith("c1\t2\n")  # 4 reads x 100 / 200
    out_filt = run_cli([
        "contig", "-r", str(ref), "--single", str(reads),
        "-p", "minimap2-sr", "--contig-end-exclusion", "0",
        "--min-read-percent-identity", "95", "--output-format", "sparse",
    ], capsys)
    assert out_filt.endswith("c1\t1.5\n")  # identity 0.9 read dropped


def test_coupled_uneven_counts_rejected(fake_mappers, tmp_path):
    ref = tmp_path / "ref.fna"
    ref.write_text(">c1\n" + "ACGT" * 50 + "\n")
    r1 = tmp_path / "r1.fq"
    r1.write_text("@a\nACGT\n+\nIIII\n")
    with pytest.raises(SystemExit):
        main(["contig", "-r", str(ref), "-1", str(r1), "-2"])


def test_sharded_mapping_from_reads(fake_mappers, tmp_path, capsys):
    """--sharded with raw reads: map against each reference, best-AS
    merge with deterministic (first-shard) tie-break."""
    rng = np.random.default_rng(11)
    sA = _rand_seq(rng, 400)
    sB = _rand_seq(rng, 400)
    shared = _rand_seq(rng, 200)
    refA = tmp_path / "refA.fna"
    refB = tmp_path / "refB.fna"
    # both references carry `shared`; only A has sA, only B has sB
    refA.write_text(f">cA\n{sA + shared}\n")
    refB.write_text(f">cB\n{sB + shared}\n")
    r1 = tmp_path / "r1.fq"
    r2 = tmp_path / "r2.fq"
    e1, e2 = [], []
    # pair 0: only in A; pair 1: only in B; pair 2: in both (tie -> A)
    e1.append(f"@pA\n{sA[0:100]}\n+\n{'I' * 100}")
    e2.append(f"@pA\n{sA[100:200]}\n+\n{'I' * 100}")
    e1.append(f"@pB\n{sB[0:100]}\n+\n{'I' * 100}")
    e2.append(f"@pB\n{sB[100:200]}\n+\n{'I' * 100}")
    e1.append(f"@pT\n{shared[0:100]}\n+\n{'I' * 100}")
    e2.append(f"@pT\n{shared[100:200]}\n+\n{'I' * 100}")
    r1.write_text("\n".join(e1) + "\n")
    r2.write_text("\n".join(e2) + "\n")

    out = run_cli([
        "contig", "--sharded", "-r", str(refA), str(refB),
        "-1", str(r1), "-2", str(r2), "-p", "minimap2-sr",
        "-m", "count", "--contig-end-exclusion", "0",
        "--output-format", "sparse",
    ], capsys)
    lines = out.strip().split("\n")
    rows = {l.split("\t")[1]: l.split("\t")[2] for l in lines[1:]}
    # pA (2 reads) + tied pT (2 reads, first shard wins) on cA; pB on cB
    assert rows == {"cA": "4", "cB": "2"}


def test_cache_unfiltered_bam_files_e2e(fake_mappers, simple_ref, tmp_path,
                                        capsys):
    ref, reads, _ = simple_ref
    cache = tmp_path / "explicit_cache.bam"
    out = run_cli([
        "contig", "-r", str(ref), "--single", str(reads),
        "-p", "minimap2-sr", "--contig-end-exclusion", "0",
        "--output-format", "sparse",
        "--cache-unfiltered-bam-files", str(cache),
    ], capsys)
    assert out.endswith("ref.fna/reads.fq\tc1\t1.5\n")
    r = BamReader(str(cache))
    assert r.batch.n_records == 3


def test_strobealign_aemb(fake_mappers, simple_ref, capsys):
    """-m strobealign-aemb: the mapper's 2-column abundance TSV streams
    straight through the taker/printer, bypassing the estimator suite
    (strobealign_aemb.rs:13-108). Driven end-to-end with the fake
    strobealign's --aemb emulation."""
    ref, reads, _ = simple_ref
    rc = main(["contig", "-r", str(ref), "--single", str(reads),
               "-m", "strobealign-aemb"])
    assert rc == 0
    out = capsys.readouterr().out
    rows = [l.split("\t") for l in out.strip().split("\n")]
    assert rows[0][0] == "Contig"
    # 3x100bp reads on the 200bp contig -> mean coverage 1.5
    assert rows[1][0] == "c1"
    assert abs(float(rows[1][1]) - 1.5) < 1e-6
