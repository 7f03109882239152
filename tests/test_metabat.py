"""MetaBAT-adjusted mode goldens (test_cmdline.rs:1562-1614): pins the
metabat filter preset (0.97001 single identity, all flags included) and
4-decimal rounding."""

from coverm_tpu.cli import main


def run_cli(argv, capsys):
    rc = main(argv)
    assert rc == 0
    return capsys.readouterr().out


def test_metabat_include_supplementary(ref_data, capsys):
    out = run_cli(["contig", "-m", "metabat",
                   "-b", ref_data("k141_7.reheadered.bam")], capsys)
    assert ("contigName\tcontigLen\ttotalAvgDepth\tk141_7.reheadered.bam\t"
            "k141_7.reheadered.bam-var\n"
            "k141_7\t350\t0.69\t0.69\t2.0843") in out


def test_metabat_97_of_100_bases_should_fail(ref_data, capsys):
    out = run_cli(["contig", "-m", "metabat",
                   "-b", ref_data("k141_2005182.head11.bam")], capsys)
    assert "k141_2005182\t225\t1.9333\t1.9333\t0.0631" in out


def test_deletions_count_towards_perc_id(ref_data, capsys):
    out = run_cli(["contig", "-m", "metabat",
                   "-b", ref_data("k141_109815.stray_read.bam")], capsys)
    assert "k141_109815\t362\t0.6274\t0.6274\t0.2349" in out


def test_coverage_histogram_cli(ref_data, capsys):
    out = run_cli(["contig", "-m", "coverage_histogram",
                   "-b", ref_data("2seqs.reads_for_seq1_and_seq2.bam"),
                   "--contig-end-exclusion", "0", "--output-format", "sparse"],
                  capsys)
    lines = out.strip().split("\n")
    assert lines[0] == "Sample\tContig\tCoverage\tBases"
    # per-depth rows for both contigs; depth 1 bin of seq1 present
    assert any(l.startswith("2seqs.reads_for_seq1_and_seq2\tseq1\t1\t")
               for l in lines)
