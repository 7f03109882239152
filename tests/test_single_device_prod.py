"""Production single-chip regression tests.

The main pytest process forces an 8-virtual-device CPU mesh
(conftest.py), so every in-process CLI scan routes through the mesh
engine and the 1-device streaming path (the production single-chip
configuration: COVERM_TPU_MESH=0, BamStreamReader -> scan_sample_batches
-> DepthAccumulator) is never touched.  These tests pin it by running
the CLI in a SUBPROCESS with exactly one device, the mesh disabled, and
the streaming threshold forced to 1 byte — the round-2 `_EmptyPending`
regression (6 failing tests, crash on any BAM >= 512 MB with
-m mean/variance/...) is exactly the shape this reproduces.

Reference semantics: streaming scan of contig.rs:107-215.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_bam(path, n_contigs=7, contig_len=2500, n_reads=1500, seed=3):
    from coverm_tpu.io import bgzf
    from coverm_tpu.io.sam import sam_text_to_bam_data

    rng = np.random.default_rng(seed)
    lens = np.full(n_contigs, contig_len)
    sam = [f"@SQ\tSN:g{i % 3}~c{i}\tLN:{lens[i]}" for i in range(n_contigs)]
    tids = np.sort(rng.integers(0, n_contigs, n_reads))
    starts = (rng.random(n_reads) * (lens[tids] - 120)).astype(int)
    order = np.lexsort((starts, tids))
    for j in order:
        sam.append(
            f"r{j}\t0\tg{tids[j] % 3}~c{tids[j]}\t{starts[j] + 1}\t60\t100M"
            f"\t*\t0\t0\t{'A' * 100}\t*\tNM:i:{int(rng.integers(0, 3))}"
            f"\tAS:i:100")
    with open(path, "wb") as f:
        w = bgzf.BgzfWriter(f)
        w.write(sam_text_to_bam_data(iter(sam)))
        w.close()
    return path


def run_cli_subprocess(argv, extra_env):
    env = dict(os.environ)
    # one CPU device, no virtual mesh: the production single-chip shape
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    env["COVERM_TPU_PLATFORM"] = "cpu"
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, "-m", "coverm_tpu"] + argv,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


METHODS = ["mean", "variance", "trimmed_mean", "covered_fraction", "rpkm"]


@pytest.mark.parametrize("mode", ["contig", "genome"])
def test_single_device_streaming_matches_whole_file(tmp_path, mode):
    """contig/genome CLI, 1 device, mesh off: streaming == whole-file."""
    bam = make_bam(str(tmp_path / "s.bam"))
    argv = [mode, "-b", bam, "-m"] + METHODS + ["--output-format", "sparse"]
    if mode == "genome":
        argv += ["-s", "~", "--min-covered-fraction", "0"]

    whole = run_cli_subprocess(argv, {"COVERM_TPU_MESH": "0"})
    stream = run_cli_subprocess(argv, {"COVERM_TPU_MESH": "0",
                                       "COVERM_TPU_STREAM_THRESHOLD": "1"})
    assert stream == whole
    assert len(whole.splitlines()) > 1


def test_single_device_streaming_hist_methods(tmp_path):
    """Histogram-needing methods (coverage_histogram) down the 1-device
    streaming path, where the DepthAccumulator must stand aside."""
    bam = make_bam(str(tmp_path / "s.bam"))
    argv = ["contig", "-b", bam, "-m", "coverage_histogram"]
    whole = run_cli_subprocess(argv, {"COVERM_TPU_MESH": "0"})
    stream = run_cli_subprocess(argv, {"COVERM_TPU_MESH": "0",
                                       "COVERM_TPU_STREAM_THRESHOLD": "1"})
    assert stream == whole
