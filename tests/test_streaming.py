"""BamStreamReader: bounded-memory streaming must reproduce the
whole-file scan exactly (contig-boundary batches merge by addition)."""

import io
import os

import numpy as np
import pytest

from coverm_tpu.flags import FlagFilter
from coverm_tpu.io import bgzf
from coverm_tpu.io.bam import BamReader, BamStreamReader
from coverm_tpu.io.sam import sam_text_to_bam_data
from coverm_tpu.ops.depth import ReferenceLayout
from coverm_tpu.scan import scan_sample, scan_sample_batches


def make_bam(path, n_contigs=12, contig_len=3000, n_reads=4000, seed=0,
             deep_contig=None):
    rng = np.random.default_rng(seed)
    lens = np.full(n_contigs, contig_len)
    sam = [f"@SQ\tSN:c{i}\tLN:{lens[i]}" for i in range(n_contigs)]
    tids = rng.integers(0, n_contigs, n_reads)
    if deep_contig is not None:  # pile most reads on one contig
        tids[: n_reads * 3 // 4] = deep_contig
    tids = np.sort(tids)
    starts = (rng.random(n_reads) * (lens[tids] - 120)).astype(int)
    order = np.lexsort((starts, tids))
    for j in order:
        sam.append(
            f"r{j}\t0\tc{tids[j]}\t{starts[j] + 1}\t60\t100M\t*\t0\t0\t"
            f"{'A' * 100}\t*\tNM:i:{int(rng.integers(0, 3))}\tAS:i:100")
    with open(path, "wb") as f:
        w = bgzf.BgzfWriter(f)
        w.write(sam_text_to_bam_data(iter(sam)))
        w.close()
    return path


def assert_scans_equal(a, b):
    np.testing.assert_array_equal(a.depth.sum_depth_window,
                                  b.depth.sum_depth_window)
    np.testing.assert_array_equal(a.depth.covered_window,
                                  b.depth.covered_window)
    np.testing.assert_array_equal(a.depth.covered_full, b.depth.covered_full)
    np.testing.assert_array_equal(a.depth.max_depth_window,
                                  b.depth.max_depth_window)
    np.testing.assert_array_equal(a.depth.sumsq_window, b.depth.sumsq_window)
    np.testing.assert_array_equal(a.depth.min_depth_window,
                                  b.depth.min_depth_window)
    np.testing.assert_array_equal(a.observed, b.observed)
    np.testing.assert_array_equal(a.reads_primary, b.reads_primary)
    np.testing.assert_array_equal(a.nm_sum, b.nm_sum)
    np.testing.assert_allclose(a.identity_sum_primary, b.identity_sum_primary)
    assert (a.num_detected_primary_alignments
            == b.num_detected_primary_alignments)
    if a.depth.trimmed_sum is not None:
        np.testing.assert_array_equal(a.depth.trimmed_sum,
                                      b.depth.trimmed_sum)


@pytest.mark.parametrize("target_bytes", [1 << 14, 1 << 16, 1 << 30])
@pytest.mark.parametrize("deep_contig", [None, 5])
def test_stream_matches_whole_file(tmp_path, target_bytes, deep_contig):
    path = make_bam(str(tmp_path / "s.bam"), deep_contig=deep_contig)
    whole = BamReader(path)
    layout = ReferenceLayout.build(whole.header.target_lens, 10)
    ff = FlagFilter()
    want = scan_sample(whole.header, whole.batch, layout, ff, False,
                       trim=(0.05, 0.95))

    sr = BamStreamReader(path, target_bytes=target_bytes)
    header, batches = sr.read()
    assert header.target_names == whole.header.target_names
    got = scan_sample_batches(header, batches, layout, ff, False,
                              trim=(0.05, 0.95))
    assert_scans_equal(got, want)


def test_stream_batches_are_contig_disjoint(tmp_path):
    path = make_bam(str(tmp_path / "s.bam"))
    sr = BamStreamReader(path, target_bytes=1 << 14)
    _, batches = sr.read()
    seen = set()
    for b in batches:
        tids = set(int(t) for t in np.unique(b.tid))
        assert not (tids & seen), "contig split across batches"
        seen |= tids


def test_cli_streaming_threshold_env(tmp_path, capsys, monkeypatch):
    """Same TSV through the CLI whether streaming or whole-file."""
    from coverm_tpu.cli import main

    path = make_bam(str(tmp_path / "s.bam"))

    def run():
        rc = main(["contig", "-b", path, "-m", "mean", "variance",
                   "trimmed_mean", "--output-format", "sparse"])
        assert rc == 0
        return capsys.readouterr().out

    whole_out = run()
    monkeypatch.setenv("COVERM_TPU_STREAM_THRESHOLD", "1")
    import coverm_tpu.modes as modes
    monkeypatch.setattr(modes, "STREAM_THRESHOLD_BYTES", 1)
    stream_out = run()
    assert stream_out == whole_out


def test_unsorted_across_batches_raises(tmp_path):
    """Disorder that is invisible within each batch must still error."""
    from coverm_tpu.io.bam import parse_bam_data_raw
    from coverm_tpu.scan import BamSortingError

    sam = ["@SQ\tSN:c0\tLN:1000", "@SQ\tSN:c1\tLN:1000"]
    for j, tid in enumerate([1, 0]):  # c1 then c0: unsorted
        sam.append(f"r{j}\t0\tc{tid}\t10\t60\t50M\t*\t0\t0\t{'A' * 50}\t*"
                   f"\tNM:i:0")
    header, batch = parse_bam_data_raw(sam_text_to_bam_data(iter(sam)))
    layout = ReferenceLayout.build(header.target_lens, 0)
    b0 = batch.select(np.arange(2) == 0)
    b1 = batch.select(np.arange(2) == 1)
    with pytest.raises(BamSortingError):
        scan_sample_batches(header, iter([b0, b1]), layout, FlagFilter(),
                            False)
