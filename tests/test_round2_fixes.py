"""Regression tests for the round-1 VERDICT bug list:
gene/filter streaming payloads, per-mode method lists, deshard
exclusion-filter selection, shell-completion shells."""

import os

import numpy as np
import pytest

import coverm_tpu.modes as modes
from coverm_tpu.cli import main


def run_cli(argv, capsys):
    rc = main(argv)
    assert rc == 0
    return capsys.readouterr().out


def _stream(monkeypatch):
    monkeypatch.setattr(modes, "STREAM_THRESHOLD_BYTES", 1)


# ---- gene (--gff) mode over streaming payloads (VERDICT weak #3) ----

def test_gene_mode_streaming_matches_whole_file(ref_data, capsys, monkeypatch):
    argv = ["contig", "-b", ref_data("2seqs.reads_for_seq1.bam"),
            "--gff", ref_data("2seqs.gff"), "-m", "mean", "count",
            "--contig-end-exclusion", "0", "--output-format", "sparse"]
    whole = run_cli(argv, capsys)
    _stream(monkeypatch)
    assert run_cli(argv, capsys) == whole


def test_genome_gene_mode_streaming(ref_data, capsys, monkeypatch):
    argv = ["genome", "-b", ref_data("2seqs.reads_for_seq1.bam"),
            "--gff", ref_data("2seqs.gff"),
            "--genome-definition", ref_data("2seqs.genome-definition"),
            "-m", "mean", "--min-covered-fraction", "0",
            "--output-format", "sparse"]
    whole = run_cli(argv, capsys)
    _stream(monkeypatch)
    assert run_cli(argv, capsys) == whole


def test_gene_mode_streaming_histogram(ref_data, capsys, monkeypatch):
    argv = ["contig", "-b", ref_data("2seqs.reads_for_seq1.bam"),
            "--gff", ref_data("2seqs.gff"), "-m", "coverage_histogram",
            "--contig-end-exclusion", "0"]
    whole = run_cli(argv, capsys)
    _stream(monkeypatch)
    assert run_cli(argv, capsys) == whole


# ---- filtered sources over streaming payloads (VERDICT weak #3) ----

def test_filtered_source_streaming_matches_whole_file(ref_data, capsys,
                                                      monkeypatch):
    argv = ["contig", "-b", ref_data("2seqs.reads_for_seq1.bam"),
            "-m", "mean", "count", "--min-read-percent-identity", "95",
            "--output-format", "sparse", "--contig-end-exclusion", "0"]
    whole = run_cli(argv, capsys)
    _stream(monkeypatch)
    assert run_cli(argv, capsys) == whole


def test_filtered_pair_source_streaming(ref_data, capsys, monkeypatch):
    argv = ["contig", "-b", ref_data("2seqs.reads_for_seq1.bam"),
            "-m", "mean", "--min-read-percent-identity-pair", "95",
            "--proper-pairs-only", "--output-format", "sparse",
            "--contig-end-exclusion", "0"]
    whole = run_cli(argv, capsys)
    _stream(monkeypatch)
    assert run_cli(argv, capsys) == whole


# ---- per-mode method value lists (cli.rs:2033-2047, 2505-2519) ----

@pytest.mark.parametrize("argv", [
    ["genome", "-m", "strobealign-aemb", "-b", "x.bam", "-s", "~"],
    ["genome", "-m", "metabat", "-b", "x.bam", "-s", "~"],
    ["contig", "-m", "relative_abundance", "-b", "x.bam"],
])
def test_mode_restricted_methods_rejected_at_parse(argv):
    with pytest.raises(SystemExit) as e:
        main(argv)
    assert e.value.code == 2  # argparse usage error


def test_contig_aemb_still_accepted_at_parse(capsys):
    # parses fine, then fails later for a non-CLI reason (no reads given)
    with pytest.raises((SystemExit, Exception)) as e:
        main(["contig", "-m", "strobealign-aemb"])
    assert getattr(e.value, "code", None) != 2


# ---- deshard genome-exclusion selection (coverm.rs:96-156) ----

def _exclusion_args(tmp_path, **kw):
    import argparse
    ns = argparse.Namespace(
        exclude_genomes_from_deshard=kw.get("path"),
        separator=kw.get("separator"), single_genome=False,
        bam_files=kw.get("bam_files", ["x.bam"]), reference=None,
        genome_fasta_files=kw.get("genome_fasta_files"),
        genome_fasta_directory=None, genome_fasta_list=None,
        genome_fasta_extension="fna",
        genome_definition=kw.get("genome_definition"),
        use_full_contig_names=False)
    return ns


def test_exclusion_separator_filter(tmp_path):
    from coverm_tpu.commands import _genome_exclusion_of
    from coverm_tpu.genome_exclusion import SeparatorGenomeExclusionFilter
    f = tmp_path / "ex.txt"
    f.write_text("genomeA\n")
    ex = _genome_exclusion_of(_exclusion_args(tmp_path, path=str(f),
                                              separator="~"))
    assert isinstance(ex, SeparatorGenomeExclusionFilter)
    assert ex.is_excluded("genomeA~c1")
    assert not ex.is_excluded("genomeB~c1")
    with pytest.raises(ValueError):
        ex.is_excluded("nosep_contig")


def test_exclusion_genomes_and_contigs_filter(tmp_path):
    from coverm_tpu.commands import _genome_exclusion_of
    from coverm_tpu.genome_exclusion import GenomesAndContigsExclusionFilter
    ga = tmp_path / "gA.fna"
    ga.write_text(">contig1\nACGT\n>contig2\nACGT\n")
    gb = tmp_path / "gB.fna"
    gb.write_text(">contig3\nACGT\n")
    f = tmp_path / "ex.txt"
    f.write_text("gA\n")
    ex = _genome_exclusion_of(_exclusion_args(
        tmp_path, path=str(f), genome_fasta_files=[str(ga), str(gb)]))
    assert isinstance(ex, GenomesAndContigsExclusionFilter)
    assert ex.is_excluded("contig1")
    assert ex.is_excluded("contig2")
    assert not ex.is_excluded("contig3")   # gB is not excluded
    assert not ex.is_excluded("unknown")   # not in any genome


def test_exclusion_empty_file_warns_no_exclusion(tmp_path):
    from coverm_tpu.commands import _genome_exclusion_of
    from coverm_tpu.genome_exclusion import NoExclusionGenomeFilter
    f = tmp_path / "ex.txt"
    f.write_text("")
    ex = _genome_exclusion_of(_exclusion_args(tmp_path, path=str(f),
                                              separator="~"))
    assert isinstance(ex, NoExclusionGenomeFilter)


# ---- shell-completion: all five clap shells (coverm.rs:907-920) ----

@pytest.mark.parametrize("shell", ["bash", "zsh", "fish", "powershell",
                                   "elvish"])
def test_shell_completion_shells(shell, tmp_path):
    out = tmp_path / f"comp.{shell}"
    rc = main(["shell-completion", "--shell", shell, "-o", str(out)])
    assert rc == 0
    text = out.read_text()
    assert "genome" in text and "contig" in text
    if shell in ("bash", "zsh", "fish", "powershell"):
        assert "min-covered-fraction" in text


def test_shell_completion_bash_valid_syntax(tmp_path):
    import subprocess
    out = tmp_path / "comp.bash"
    main(["shell-completion", "--shell", "bash", "-o", str(out)])
    r = subprocess.run(["bash", "-n", str(out)], capture_output=True)
    assert r.returncode == 0, r.stderr


# ---- makedb --dereplicate flag parses ----

def test_makedb_dereplicate_flag_parses():
    from coverm_tpu.cli import build_parser
    args = build_parser().parse_args(
        ["makedb", "-f", "a.fna", "-o", "out", "--dereplicate",
         "--dereplication-ani", "97"])
    assert args.dereplicate and args.dereplication_ani == 97.0
