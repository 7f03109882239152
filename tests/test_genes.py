"""GFF gene-mode tests (goldens from test_cmdline.rs:135-248 and the
whole-contig-gene == contig-mean consistency test, genes.rs:650-680)."""

import pytest

from coverm_tpu.cli import main


def run_cli(argv, capsys):
    rc = main(argv)
    assert rc == 0
    return capsys.readouterr().out


def test_contig_per_gene_coverage_from_gff(ref_data, capsys):
    out = run_cli([
        "contig", "--bam-files", ref_data("2seqs.reads_for_seq1.bam"),
        "--gff", ref_data("2seqs.gff"), "--methods", "mean",
        "--contig-end-exclusion", "0", "--output-format", "sparse",
    ], capsys)
    assert "Sample\tGene\tContig\tMean" in out
    assert "2seqs.reads_for_seq1\tgene1\tseq1\t1.2" in out
    assert "2seqs.reads_for_seq1\tgene3\tseq2\t0" in out


def test_contig_per_gene_count_from_gff(ref_data, capsys):
    out = run_cli([
        "contig", "--bam-files", ref_data("2seqs.reads_for_seq1.bam"),
        "--gff", ref_data("2seqs.gff"), "--methods", "count",
        "--output-format", "sparse", "--no-zeros",
    ], capsys)
    assert "2seqs.reads_for_seq1\tgene1\tseq1\t12" in out


def test_genome_per_gene_coverage_from_gff(ref_data, capsys):
    out = run_cli([
        "genome", "--bam-files", ref_data("2seqs.reads_for_seq1.bam"),
        "--gff", ref_data("2seqs.gff"),
        "--genome-definition", ref_data("2seqs.genome-definition"),
        "--methods", "mean", "--contig-end-exclusion", "0",
        "--min-covered-fraction", "0", "--output-format", "sparse",
    ], capsys)
    assert "Sample\tGene\tContig\tGenome\tMean" in out
    assert "2seqs.reads_for_seq1\tgene1\tseq1\tgenomeA\t1.2" in out
    assert "2seqs.reads_for_seq1\tgene3\tseq2\tgenomeB\t0" in out


def test_whole_contig_gene_equals_contig_mean(ref_data, tmp_path, capsys):
    """A gene spanning a whole contig must equal contig-mode mean
    (genes.rs consistency test)."""
    gff = tmp_path / "whole.gff"
    gff.write_text("seq1\ttest\tgene\t1\t1000\t.\t+\t.\tID=whole1\n"
                   "seq2\ttest\tgene\t1\t1000\t.\t+\t.\tID=whole2\n")
    out_gene = run_cli([
        "contig", "-b", ref_data("2seqs.reads_for_seq1.bam"),
        "--gff", str(gff), "-m", "mean", "--contig-end-exclusion", "0",
        "--output-format", "sparse",
    ], capsys)
    out_contig = run_cli([
        "contig", "-b", ref_data("2seqs.reads_for_seq1.bam"),
        "-m", "mean", "--contig-end-exclusion", "0",
        "--output-format", "sparse",
    ], capsys)
    gene_vals = [l.split("\t")[-1] for l in out_gene.strip().split("\n")[1:]]
    contig_vals = [l.split("\t")[-1] for l in out_contig.strip().split("\n")[1:]]
    assert gene_vals == contig_vals


def test_gene_partial_interval(ref_data, capsys):
    """gene2 covers seq1[99:200); its mean differs from the whole contig."""
    out = run_cli([
        "contig", "-b", ref_data("2seqs.reads_for_seq1.bam"),
        "--gff", ref_data("2seqs.gff"), "-m", "mean", "length",
        "--contig-end-exclusion", "0", "--output-format", "sparse",
    ], capsys)
    lines = {tuple(l.split("\t")[1:3]): l.split("\t")[3:]
             for l in out.strip().split("\n")[1:]}
    assert lines[("gene2", "seq1")][1] == "101"  # length column
