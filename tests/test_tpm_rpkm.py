"""TPM normalisation goldens (test_cmdline.rs:3457-3560) — these pin the
exact sparse (f32->f64*1e6) vs dense (f32*1e6) TPM arithmetic."""

from coverm_tpu.cli import main


def run_cli(argv, capsys):
    rc = main(argv)
    assert rc == 0
    return capsys.readouterr().out


def test_tpm_contig_sparse(ref_data, capsys):
    out = run_cli(["contig", "--output-format", "sparse", "-m", "mean", "tpm",
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
    out = run_cli(["contig", "-m", "mean", "tpm",
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
    out = run_cli(["genome", "--output-format", "sparse", "-m", "mean", "tpm",
                   "-b", ref_data("tpm_test.bam"), "-s", "~",
                   "--min-covered-fraction", "0"], capsys)
    assert "tpm_test\tgenome2\t1.5882353\t900000.0357627869" in out


def test_single_genome_anir(ref_data, capsys):
    out = run_cli(["genome", "-m", "anir",
                   "-b", ref_data("2seqs.bad_read.1.with_supplementary.bam"),
                   "--single-genome", "--min-covered-fraction", "0"], capsys)
    assert out == ("Genome\t2seqs.bad_read.1.with_supplementary ANIr\n"
                   "genome1\t0.999\n")
