"""E2E golden matrix ported from the reference's test_cmdline.rs
(VERDICT r1 item 3): every case here uses pre-made BAM/SAM fixtures, so
no external mapper is required.  Goldens are the reference's exact
output strings (file:line cited per test)."""

import numpy as np
import pytest

from coverm_tpu.cli import main


def run_ok(argv, capsys):
    rc = main(argv)
    out = capsys.readouterr()
    assert rc == 0, out.err
    return out.out


def assert_equal_table(expected, observed):
    """Order-insensitive row compare (test_cmdline.rs:17-31)."""
    e = expected.strip("\n").split("\n")
    o = observed.strip("\n").split("\n")
    assert e[0] == o[0], f"headers differ: {e[0]!r} vs {o[0]!r}"
    assert sorted(e[1:]) == sorted(o[1:])


# ---- RPKM (test_cmdline.rs:2466-2566) ----

RPKM_ROWS = (
    "genome1~random_sequence_length_11000\t0\t0\t11000\t0\n"
    "genome1~random_sequence_length_11010\t0\t0\t11010\t0\n"
    "genome2~seq1\t500000\t0.01\t1000\t10\n"
    "genome3~random_sequence_length_11001\t0\t0\t11001\t0\n"
    "genome4~random_sequence_length_11002\t0\t0\t11002\t0\n"
    "genome5~seq2\t500000\t0.01\t1000\t10\n"
    "genome6~random_sequence_length_11003\t0\t0\t11003\t0\n")


def test_contig_sparse_rpkm(ref_data, capsys):
    out = run_ok(["contig", "-m", "rpkm", "reads_per_base", "length", "count",
                  "-b", ref_data("7seqs.fnaVbad_read.bam"),
                  "--output-format", "sparse"], capsys)
    want = ("Sample\tContig\tRPKM\tReads per base\tLength\tRead Count\n"
            + "".join(f"7seqs.fnaVbad_read\t{r}\n"
                      for r in RPKM_ROWS.strip().split("\n")))
    assert out == want.replace("\n\n", "\n")


def test_contig_dense_rpkm(ref_data, capsys):
    out = run_ok(["contig", "-m", "rpkm", "reads_per_base", "length", "count",
                  "-b", ref_data("7seqs.fnaVbad_read.bam")], capsys)
    assert out == (
        "Contig\t7seqs.fnaVbad_read RPKM\t7seqs.fnaVbad_read Reads per base\t"
        "7seqs.fnaVbad_read Length\t7seqs.fnaVbad_read Read Count\n"
        + RPKM_ROWS)


def test_single_genome_dense_rpkm(ref_data, capsys):
    out = run_ok(["genome", "--single-genome", "-m", "rpkm",
                  "reads_per_base", "length", "count",
                  "--min-covered-fraction", "0",
                  "-b", ref_data("7seqs.fnaVbad_read.bam")], capsys)
    assert out == (
        "Genome\t7seqs.fnaVbad_read RPKM\t7seqs.fnaVbad_read Reads per base\t"
        "7seqs.fnaVbad_read Length\t7seqs.fnaVbad_read Read Count\n"
        "genome1\t17538.936\t0.00035077872\t57016\t20\n")


def test_single_genome_rpkm_min_covered_fraction(ref_data, capsys):
    out = run_ok(["genome", "--single-genome", "-m", "rpkm",
                  "-b", ref_data("7seqs.fnaVbad_read.bam")], capsys)
    assert out == "Genome\t7seqs.fnaVbad_read RPKM\ngenome1\t0\n"


# ---- TPM (test_cmdline.rs:3457-3566) ----

def test_tpm_contig_sparse(ref_data, capsys):
    out = run_ok(["contig", "--output-format", "sparse", "-m", "mean", "tpm",
                  "-b", ref_data("tpm_test.bam")], capsys)
    assert out == (
        "Sample\tContig\tMean\tTPM\n"
        "tpm_test\tgenome1~random_sequence_length_11000\t0\t0\n"
        "tpm_test\tgenome1~random_sequence_length_11010\t0\t0\n"
        "tpm_test\tgenome2~seq1\t1.5882353\t900000.0357627869\n"
        "tpm_test\tgenome3~random_sequence_length_11001\t0\t0\n"
        "tpm_test\tgenome4~random_sequence_length_11002\t0\t0\n"
        "tpm_test\tgenome5~seq2\t0.14467005\t99999.99403953552\n"
        "tpm_test\tgenome6~random_sequence_length_11003\t0\t0\n")


def test_tpm_contig_dense(ref_data, capsys):
    out = run_ok(["contig", "-m", "mean", "tpm",
                  "-b", ref_data("tpm_test.bam")], capsys)
    assert out == (
        "Contig\ttpm_test Mean\ttpm_test TPM\n"
        "genome1~random_sequence_length_11000\t0\t0\n"
        "genome1~random_sequence_length_11010\t0\t0\n"
        "genome2~seq1\t1.5882353\t900000.06\n"
        "genome3~random_sequence_length_11001\t0\t0\n"
        "genome4~random_sequence_length_11002\t0\t0\n"
        "genome5~seq2\t0.14467005\t99999.99\n"
        "genome6~random_sequence_length_11003\t0\t0\n")


def test_tpm_genome_sparse(ref_data, capsys):
    out = run_ok(["genome", "--output-format", "sparse", "-m", "mean", "tpm",
                  "-b", ref_data("tpm_test.bam"), "-s", "~",
                  "--min-covered-fraction", "0"], capsys)
    assert out == (
        "Sample\tGenome\tMean\tTPM\n"
        "tpm_test\tgenome1\t0\t0\n"
        "tpm_test\tgenome2\t1.5882353\t900000.0357627869\n"
        "tpm_test\tgenome3\t0\t0\n"
        "tpm_test\tgenome4\t0\t0\n"
        "tpm_test\tgenome5\t0.14467005\t99999.99403953552\n"
        "tpm_test\tgenome6\t0\t0\n")


def test_tpm_genome_dense(ref_data, capsys):
    out = run_ok(["genome", "-m", "mean", "tpm",
                  "-b", ref_data("tpm_test.bam"), "-s", "~",
                  "--min-covered-fraction", "0"], capsys)
    assert out == (
        "Genome\ttpm_test Mean\ttpm_test TPM\n"
        "genome1\t0\t0\n"
        "genome2\t1.5882353\t900000.06\n"
        "genome3\t0\t0\n"
        "genome4\t0\t0\n"
        "genome5\t0.14467005\t99999.99\n"
        "genome6\t0\t0\n")


# ---- all methods at once, genomes from a FASTA directory
# (test_cmdline.rs test_genome_all_methods) ----

def test_genome_all_methods(ref_data, capsys):
    out = run_ok([
        "genome", "--output-format", "sparse",
        "-b", ref_data("7seqs.fnaVbad_read.bam"),
        "--genome-fasta-directory", ref_data("genomes_dir_7seqs"),
        "--genome-fasta-extension", "fasta", "-t", "5",
        "--methods", "covered_bases", "covered_fraction", "mean", "variance",
        "trimmed_mean", "rpkm", "relative_abundance", "length",
        "--min-covered-fraction", "0"], capsys)
    assert_equal_table(
        "Sample\tGenome\tCovered Bases\tCovered Fraction\tMean\tVariance\t"
        "Trimmed Mean\tRPKM\tRelative Abundance (%)\tLength\n"
        "7seqs.fnaVbad_read\tunmapped\tNA\tNA\tNA\tNA\tNA\tNA\t0\tNA\n"
        "7seqs.fnaVbad_read\tgenome2\t899\t0.899\t1.6764706\t0.51357985\t"
        "1.6788511\t500000\t50\t1000\n"
        "7seqs.fnaVbad_read\tgenome6\t0\t0\t0\t0\t0\t0\t0\t11003\n"
        "7seqs.fnaVbad_read\tgenome4\t0\t0\t0\t0\t0\t0\t0\t11002\n"
        "7seqs.fnaVbad_read\tgenome3\t0\t0\t0\t0\t0\t0\t0\t11001\n"
        "7seqs.fnaVbad_read\tgenome5\t900\t0.9\t1.6764706\t0.51357985\t"
        "1.6788511\t500000\t50\t1000\n"
        "7seqs.fnaVbad_read\tgenome1\t0\t0\t0\t0\t0\t0\t0\t22010\n",
        out)


# ---- sharded deshard with pre-made shard BAMs
# (test_cmdline.rs test_sharding_*) ----

def test_sharding_no_exclusion_genome_separator(ref_data, capsys):
    out = run_ok(["genome", "--sharded", "-b", ref_data("shard1.bam"),
                  ref_data("shard2.bam"), "-s", "~"], capsys)
    assert_equal_table(
        "Genome\tshard1|shard2 Relative Abundance (%)\n"
        "unmapped\t0\n"
        "genome3\t25.024881\n"
        "genome4\t25.022575\n"
        "genome5\t0\n"
        "genome6\t25.020271\n"
        "genome1\t24.932274\n"
        "genome2\t0\n", out)


def test_sharding_no_exclusion_contig(ref_data, capsys):
    out = run_ok(["contig", "--sharded", "-b", ref_data("shard1.bam"),
                  ref_data("shard2.bam")], capsys)
    assert_equal_table(
        "Contig\tshard1|shard2 Mean\n"
        "genome3~random_sequence_length_11001\t0.110588886\n"
        "genome4~random_sequence_length_11002\t0.11057869\n"
        "genome5~seq2\t0\n"
        "genome6~random_sequence_length_11003\t0.11056851\n"
        "genome1~random_sequence_length_11000\t0.109861754\n"
        "genome1~random_sequence_length_11010\t0.110497236\n"
        "genome2~seq1\t0\n", out)


def test_sharding_exclusion_genome_separator(ref_data, tmp_path, capsys):
    excl = tmp_path / "excl.txt"
    excl.write_text("genome3\n")
    out = run_ok(["genome", "--sharded", "-b", ref_data("shard1.bam"),
                  ref_data("shard2.bam"), "-s", "~",
                  "--exclude-genomes-from-deshard", str(excl)], capsys)
    assert_equal_table(
        "Genome\tshard1|shard2 Relative Abundance (%)\n"
        "unmapped\t19.999998\n"
        "genome3\t0\n"
        "genome4\t26.699606\n"
        "genome5\t0\n"
        "genome6\t26.697144\n"
        "genome1\t26.60325\n"
        "genome2\t0\n", out)


def test_sharding_exclusion_genomes_fasta_files_definition(ref_data, tmp_path,
                                                           capsys):
    excl = tmp_path / "excl.txt"
    excl.write_text("genome3\n")
    gd = ref_data("genomes_dir_7seqs")
    out = run_ok(["genome", "--sharded", "-b", ref_data("shard1.bam"),
                  ref_data("shard2.bam"), "--genome-fasta-files"]
                 + [f"{gd}/genome{i}.fasta" for i in range(1, 7)]
                 + ["--exclude-genomes-from-deshard", str(excl)], capsys)
    assert_equal_table(
        "Genome\tshard1|shard2 Relative Abundance (%)\n"
        "unmapped\t19.999998\n"
        "genome1\t26.60325\n"
        "genome2\t0\n"
        "genome3\t0\n"
        "genome4\t26.699606\n"
        "genome5\t0\n"
        "genome6\t26.697144\n", out)


# ---- genome definition with BAM (test_genome_definition_with_bam) ----

def test_genome_definition_with_bam(ref_data, capsys):
    out = run_ok(["genome", "--genome-definition", ref_data("7seqs.definition"),
                  "-b", ref_data("7seqs.reads_for_seq1_and_seq2.bam")], capsys)
    assert "Genome\t7seqs.reads_for_seq1_and_seq2 Relative Abundance (%)\n" in out
    assert "genome2\t53.167923\n" in out
    assert "genome5\t46.832077\n" in out


# ---- unsorted BAM failure via the CLI (test_cmdline.rs:3073-3114) ----

@pytest.mark.parametrize("argv", [
    ["contig", "-b", "{bam}"],
    ["genome", "-s", "e", "-b", "{bam}"],
    ["genome", "--genome-definition", "{definition}", "-b", "{bam}"],
])
def test_unsorted_bam_fails(ref_data, capsys, argv):
    bam = ref_data("2seqs.bad_read.1.unsorted.bam")
    definition = ref_data("2seqs.genome-definition")
    argv = [a.format(bam=bam, definition=definition) for a in argv]
    with pytest.raises(SystemExit) as e:
        main(argv)
    msg = str(e.value) + capsys.readouterr().err
    assert "BAM file appears to be unsorted" in msg


# ---- MAPQ filtering over a SAM input (test_cmdline.rs:4100-4189) ----

def test_mapq_filtering_all_out(ref_data, capsys):
    sam = ref_data("mapq_test.sam")
    out = run_ok(["genome", "-m", "mean", "covered_fraction", "-b", sam,
                  "--single-genome", "--min-covered-fraction", "0"], capsys)
    assert out == ("Genome\tmapq_test Mean\tmapq_test Covered Fraction\n"
                   "genome1\t0.009380695\t0.00875193\n")
    out = run_ok(["genome", "-m", "mean", "covered_fraction", "-b", sam,
                  "--single-genome", "--min-covered-fraction", "0",
                  "--min-mapq", "100"], capsys)
    assert out == ("Genome\tmapq_test Mean\tmapq_test Covered Fraction\n"
                   "genome1\t0\t0\n")


def test_mapq_filtering_single_read(ref_data, capsys):
    out = run_ok(["contig", "-m", "mean", "covered_fraction",
                  "-b", ref_data("mapq_test.sam"), "--min-mapq", "51"], capsys)
    assert out == (
        "Contig\tmapq_test Mean\tmapq_test Covered Fraction\n"
        "genome1~random_sequence_length_11000\t0\t0\n"
        "genome1~random_sequence_length_11010\t0\t0\n"
        "genome2~seq1\t0.5294118\t0.4\n"
        "genome3~random_sequence_length_11001\t0\t0\n"
        "genome4~random_sequence_length_11002\t0\t0\n"
        "genome5~seq2\t0\t0\n"
        "genome6~random_sequence_length_11003\t0\t0\n")


def test_mapq_filtering_single_read_fail_proper_pairs(ref_data, capsys):
    out = run_ok(["contig", "-m", "mean", "covered_fraction",
                  "-b", ref_data("mapq_test.sam"), "--min-mapq", "51",
                  "--proper-pairs-only"], capsys)
    assert out == (
        "Contig\tmapq_test Mean\tmapq_test Covered Fraction\n"
        "genome1~random_sequence_length_11000\t0\t0\n"
        "genome1~random_sequence_length_11010\t0\t0\n"
        "genome2~seq1\t0.3529412\t0.3\n"
        "genome3~random_sequence_length_11001\t0\t0\n"
        "genome4~random_sequence_length_11002\t0\t0\n"
        "genome5~seq2\t0\t0\n"
        "genome6~random_sequence_length_11003\t0\t0\n")


# ---- ANIr (test_single_genome_anir) ----

def test_single_genome_anir(ref_data, capsys):
    out = run_ok(["genome", "-m", "anir",
                  "-b", ref_data("2seqs.bad_read.1.with_supplementary.bam"),
                  "--single-genome", "--min-covered-fraction", "0"], capsys)
    assert out == ("Genome\t2seqs.bad_read.1.with_supplementary ANIr\n"
                   "genome1\t0.999\n")


# ---- MetaBAT corner cases ----

def test_metabat_include_supplementary(ref_data, capsys):
    out = run_ok(["contig", "-m", "metabat",
                  "-b", ref_data("k141_7.reheadered.bam")], capsys)
    assert ("contigName\tcontigLen\ttotalAvgDepth\tk141_7.reheadered.bam\t"
            "k141_7.reheadered.bam-var\nk141_7\t350\t0.69\t0.69\t2.0843"
            ) in out


def test_metabat_97_of_100_bases_should_fail(ref_data, capsys):
    # metabat identity gate is > 0.97, not >= (test_cmdline.rs)
    out = run_ok(["contig", "-m", "metabat",
                  "-b", ref_data("k141_2005182.head11.bam")], capsys)
    assert ("k141_2005182\t225\t1.9333\t1.9333\t0.0631") in out


def test_deletions_count_towards_perc_id(ref_data, capsys):
    out = run_ok(["contig", "-m", "metabat",
                  "-b", ref_data("k141_109815.stray_read.bam")], capsys)
    assert ("k141_109815\t362\t0.6274\t0.6274\t0.2349") in out


# ---- GFF gene modes (test_cmdline.rs:123-217) ----

def test_contig_per_gene_coverage_from_gff(ref_data, capsys):
    out = run_ok(["contig", "--bam-files", ref_data("2seqs.reads_for_seq1.bam"),
                  "--gff", ref_data("2seqs.gff"), "--methods", "mean",
                  "--contig-end-exclusion", "0",
                  "--output-format", "sparse"], capsys)
    assert "Sample\tGene\tContig\tMean" in out
    assert "2seqs.reads_for_seq1\tgene1\tseq1\t1.2" in out
    assert "2seqs.reads_for_seq1\tgene3\tseq2\t0" in out


def test_contig_per_gene_count_from_gff(ref_data, capsys):
    out = run_ok(["contig", "--bam-files", ref_data("2seqs.reads_for_seq1.bam"),
                  "--gff", ref_data("2seqs.gff"), "--methods", "count",
                  "--output-format", "sparse", "--no-zeros"], capsys)
    assert "2seqs.reads_for_seq1\tgene1\tseq1\t12" in out


def test_genome_per_gene_coverage_from_gff(ref_data, capsys):
    out = run_ok(["genome", "--bam-files", ref_data("2seqs.reads_for_seq1.bam"),
                  "--gff", ref_data("2seqs.gff"),
                  "--genome-definition", ref_data("2seqs.genome-definition"),
                  "--methods", "mean", "--contig-end-exclusion", "0",
                  "--min-covered-fraction", "0",
                  "--output-format", "sparse"], capsys)
    assert "Sample\tGene\tContig\tGenome\tMean" in out
    assert "2seqs.reads_for_seq1\tgene1\tseq1\tgenomeA\t1.2" in out
    assert "2seqs.reads_for_seq1\tgene3\tseq2\tgenomeB\t0" in out


# ---- filter: unmapped retention semantics
# (test_filter_unmapped_not_inverse / _inverse / improper_pairs) ----

def _read_bam(path):
    from coverm_tpu.io.bam import BamReader
    r = BamReader(path)
    return r.header, r.batch


def test_filter_unmapped_not_inverse(ref_data, tmp_path, capsys):
    """QNAME assertions mirror the reference's `samtools view` greps:
    read names carry the source-sequence name."""
    d = ref_data("dense_interleaved_single_genome_bug")
    t1 = str(tmp_path / "o1.bam")
    t2 = str(tmp_path / "o2.bam")
    rc = main(["filter", "--min-read-aligned-length", "1",
               "-b", f"{d}/ref.fna.reads_interleaved.fna.bam",
               f"{d}/ref.fna.reads_interleaved2.fna.bam",
               "-o", t1, t2])
    assert rc == 0
    for t in (t1, t2):
        h, b = _read_bam(t)
        rnames = {h.target_names[t_] for t_ in b.tid if t_ >= 0}
        assert any("random_sequence_length_1000" in n for n in rnames)
        # the unmapped pair (QNAME random_sequence_length_100) is dropped
        assert "random_sequence_length_100" not in b.qnames()


def test_filter_unmapped_inverse(ref_data, tmp_path, capsys):
    d = ref_data("dense_interleaved_single_genome_bug")
    t1 = str(tmp_path / "o1.bam")
    rc = main(["filter", "--inverse", "-b", f"{d}/ref.fna.r1.fna.bam",
               "-o", t1])
    assert rc == 0
    h, b = _read_bam(t1)
    qf = set(zip(b.qnames(), (int(f) for f in b.flag)))
    assert not any("random_sequence_length_1000" in n for n, _ in qf)
    assert ("seq4", 77) in qf
    assert ("seq4", 141) in qf


def test_filter_unmapped_inverse_improper_pairs(ref_data, tmp_path, capsys):
    d = ref_data("dense_interleaved_single_genome_bug")
    t1 = str(tmp_path / "o1.bam")
    t2 = str(tmp_path / "o2.bam")
    rc = main(["filter", "--inverse",
               "-b", f"{d}/ref.fna.reads_interleaved.fna.bam",
               f"{d}/ref.fna.reads_interleaved2.fna.bam",
               "-o", t1, t2])
    assert rc == 0
    for t in (t1, t2):
        h, b = _read_bam(t)
        rnames = {h.target_names[t_] for t_ in b.tid if t_ >= 0}
        assert any("random_sequence_length_1000" in n for n in rnames)
        qf = set(zip(b.qnames(), (int(f) for f in b.flag)))
        assert ("random_sequence_length_100", 77) in qf
        assert ("random_sequence_length_100", 141) in qf
