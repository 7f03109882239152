"""Fused native scan (io/fastscan.py) vs the classic batch path.

The fused engine computes every per-contig statistic inside the C++
decoder; these tests pin it to the classic scan_sample_batches path —
same SampleScan, same depth statistics, same errors — across segment
sizes (exercising the straddling-record carry and the open-contig block
carry), flag-filter variants, and CLI-level byte parity."""

import os
import subprocess
import sys

import numpy as np
import pytest

from coverm_tpu.flags import FlagFilter
from coverm_tpu.io import bgzf
from coverm_tpu.io.bam import BamStreamReader
from coverm_tpu.io.fastscan import (FusedScanStream, fused_available,
                                    scan_sample_fused)
from coverm_tpu.io.sam import sam_text_to_bam_data
from coverm_tpu.ops.depth import ReferenceLayout
from coverm_tpu.scan import (BamSortingError, MissingNMTagError,
                             scan_sample_batches)

from test_streaming import make_bam

pytestmark = pytest.mark.skipif(not fused_available(),
                                reason="native fused scan unavailable")


def scans_for(path, target_bytes, flag_filter=None, need_hist=False,
              trim=(0.1, 0.9), ee=75):
    ff = flag_filter or FlagFilter()
    s = FusedScanStream(path, target_bytes=target_bytes)
    h = s.open()
    layout = ReferenceLayout.build(h.target_lens, ee)
    fused = scan_sample_fused(h, s, layout, ff, need_hist, trim=trim)
    h2, gen = BamStreamReader(path, target_bytes=target_bytes).read()
    classic = scan_sample_batches(h2, gen, layout, ff, need_hist, trim=trim)
    return fused, classic


def assert_scan_equal(a, b):
    for f in ("reads_primary", "reads_nonsupp", "reads_all", "nm_sum",
              "indel_sum", "observed"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), err_msg=f)
    np.testing.assert_allclose(a.identity_sum_primary, b.identity_sum_primary,
                               rtol=1e-12)
    np.testing.assert_allclose(a.identity_sum_nonsupp, b.identity_sum_nonsupp,
                               rtol=1e-12)
    assert (a.num_detected_primary_alignments
            == b.num_detected_primary_alignments)
    for f in ("sum_depth_window", "covered_window", "covered_full",
              "trimmed_sum", "sumsq_window", "min_depth_window"):
        x, y = getattr(a.depth, f), getattr(b.depth, f)
        if x is None or y is None:
            assert x is None and y is None, f
        else:
            np.testing.assert_array_equal(x, y, err_msg=f)
    if a.depth.hist is not None or b.depth.hist is not None:
        from coverm_tpu.modes import _dense_hist
        ha, hb = _dense_hist(a.depth), _dense_hist(b.depth)
        W = max(ha.shape[1], hb.shape[1])
        pa = np.zeros((ha.shape[0], W), np.int64)
        pb = np.zeros((hb.shape[0], W), np.int64)
        pa[:, :ha.shape[1]] = ha
        pb[:, :hb.shape[1]] = hb
        np.testing.assert_array_equal(pa, pb, err_msg="hist")


@pytest.mark.parametrize("target_bytes", [1 << 12, 1 << 16, 1 << 28])
def test_fused_matches_classic(tmp_path, target_bytes):
    path = make_bam(str(tmp_path / "s.bam"))
    fused, classic = scans_for(path, target_bytes)
    assert_scan_equal(fused, classic)


def test_fused_single_huge_contig_carry(tmp_path):
    # every segment ends inside the one contig: the block carry spans
    # the whole stream and is dispatched once at EOF
    path = make_bam(str(tmp_path / "one.bam"), n_contigs=1, contig_len=20000,
                    n_reads=6000)
    fused, classic = scans_for(path, 1 << 12)
    assert_scan_equal(fused, classic)


def test_fused_need_hist(tmp_path):
    path = make_bam(str(tmp_path / "s.bam"))
    fused, classic = scans_for(path, 1 << 13, need_hist=True, trim=None)
    assert_scan_equal(fused, classic)


@pytest.mark.parametrize("ff", [
    FlagFilter(include_supplementary=False),
    FlagFilter(include_secondary=True),
    FlagFilter(include_improper_pairs=False),
])
def test_fused_flag_filters(tmp_path, ff):
    # flags cycle through secondary/supplementary/proper-pair variants
    rng = np.random.default_rng(3)
    sam = ["@SQ\tSN:c0\tLN:5000", "@SQ\tSN:c1\tLN:5000"]
    flags = [0, 0x100, 0x800, 0x1 | 0x2 | 0x40, 0x1 | 0x40]
    rows = []
    for j in range(400):
        tid = j % 2
        pos = int(rng.integers(0, 4800))
        rows.append((tid, pos, flags[j % len(flags)], j))
    rows.sort()
    for tid, pos, fl, j in rows:
        sam.append(f"r{j}\t{fl}\tc{tid}\t{pos + 1}\t60\t100M\t*\t0\t0\t"
                   f"{'A' * 100}\t*\tNM:i:1")
    path = str(tmp_path / "f.bam")
    with open(path, "wb") as f:
        w = bgzf.BgzfWriter(f)
        w.write(sam_text_to_bam_data(iter(sam)))
        w.close()
    fused, classic = scans_for(path, 1 << 12, flag_filter=ff)
    assert_scan_equal(fused, classic)


def test_fused_unsorted_raises(tmp_path):
    sam = ["@SQ\tSN:c0\tLN:5000", "@SQ\tSN:c1\tLN:5000",
           f"r0\t0\tc1\t100\t60\t100M\t*\t0\t0\t{'A' * 100}\t*\tNM:i:0",
           f"r1\t0\tc0\t100\t60\t100M\t*\t0\t0\t{'A' * 100}\t*\tNM:i:0"]
    path = str(tmp_path / "u.bam")
    with open(path, "wb") as f:
        w = bgzf.BgzfWriter(f)
        w.write(sam_text_to_bam_data(iter(sam)))
        w.close()
    s = FusedScanStream(path, target_bytes=1 << 12)
    h = s.open()
    layout = ReferenceLayout.build(h.target_lens, 75)
    with pytest.raises(BamSortingError):
        scan_sample_fused(h, s, layout, FlagFilter(), False)


def test_fused_missing_nm_raises(tmp_path):
    sam = ["@SQ\tSN:c0\tLN:5000",
           f"r0\t0\tc0\t100\t60\t100M\t*\t0\t0\t{'A' * 100}\t*"]
    path = str(tmp_path / "n.bam")
    with open(path, "wb") as f:
        w = bgzf.BgzfWriter(f)
        w.write(sam_text_to_bam_data(iter(sam)))
        w.close()
    s = FusedScanStream(path, target_bytes=1 << 12)
    h = s.open()
    layout = ReferenceLayout.build(h.target_lens, 75)
    with pytest.raises(MissingNMTagError):
        scan_sample_fused(h, s, layout, FlagFilter(), False)


def test_cli_byte_parity_fused_vs_classic(tmp_path):
    """The production CLI output must be byte-identical with the fused
    engine on and off (single-chunk inputs sum floats identically)."""
    path = make_bam(str(tmp_path / "s.bam"), n_reads=3000)
    outs = {}
    for fused in ("1", "0"):
        env = dict(os.environ, COVERM_TPU_FUSED=fused,
                   COVERM_TPU_PLATFORM="cpu", COVERM_TPU_MESH="0",
                   COVERM_TPU_STREAM_THRESHOLD="1")
        r = subprocess.run(
            [sys.executable, "-m", "coverm_tpu", "contig", "-b", path,
             "-m", "mean", "trimmed_mean", "variance", "covered_fraction",
             "count", "rpkm"],
            capture_output=True, env=env, cwd="/root/repo")
        assert r.returncode == 0, r.stderr.decode()
        outs[fused] = r.stdout
    assert outs["1"] == outs["0"]


def test_cli_genome_byte_parity(tmp_path):
    path = make_bam(str(tmp_path / "s.bam"), n_reads=3000)
    outs = {}
    for fused in ("1", "0"):
        env = dict(os.environ, COVERM_TPU_FUSED=fused,
                   COVERM_TPU_PLATFORM="cpu", COVERM_TPU_MESH="0",
                   COVERM_TPU_STREAM_THRESHOLD="1")
        r = subprocess.run(
            [sys.executable, "-m", "coverm_tpu", "genome", "-b", path,
             "-s", "~", "--single-genome", "-m", "mean", "relative_abundance"],
            capture_output=True, env=env, cwd="/root/repo")
        assert r.returncode == 0, r.stderr.decode()
        outs[fused] = r.stdout
    assert outs["1"] == outs["0"]


def test_cli_byte_parity_real_reference_bam():
    """Real htslib-produced BAM through the fused engine vs classic vs
    whole-file decode: all three byte-identical."""
    path = "/root/reference/tests/data/7seqs.reads_for_seq1_and_seq2.bam"
    if not os.path.exists(path):
        pytest.skip("reference fixture unavailable")
    outs = []
    for env_extra in (
        {"COVERM_TPU_FUSED": "1", "COVERM_TPU_STREAM_THRESHOLD": "1"},
        {"COVERM_TPU_FUSED": "0", "COVERM_TPU_STREAM_THRESHOLD": "1"},
        {},  # whole-file decode (file below the default threshold)
    ):
        env = dict(os.environ, COVERM_TPU_PLATFORM="cpu",
                   COVERM_TPU_MESH="0", **env_extra)
        r = subprocess.run(
            [sys.executable, "-m", "coverm_tpu", "contig", "-b", path,
             "-m", "mean", "trimmed_mean", "variance", "length", "count"],
            capture_output=True, env=env, cwd="/root/repo")
        assert r.returncode == 0, r.stderr.decode()
        outs.append(r.stdout)
    assert outs[0] == outs[1] == outs[2]
