"""Multi-host execution: one mesh spanning 2 processes (VERDICT r2 #2b).

The reference is strictly single-host (SURVEY.md §2.3 "no multi-node
anything"); multi-host is NEW capability.  These tests launch the CLI as
a REAL 2-process jax.distributed job on the CPU backend (gloo
collectives — the DCN-style cross-process axis), with 2 virtual devices
per process, and require rank 0's TSV to be byte-identical to the
single-process run.  Rank 1 computes the same replicated statistics and
must stay silent (takers write to devnull off rank 0).
"""

import os
import socket
import subprocess
import sys

import pytest

from test_single_device_prod import make_bam

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_multiproc(argv, nproc=2, devices_per_proc=2, timeout=600):
    port = free_port()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={devices_per_proc}")
        env["JAX_PLATFORMS"] = "cpu"
        env["COVERM_TPU_PLATFORM"] = "cpu"
        env["COVERM_TPU_COORDINATOR"] = f"localhost:{port}"
        env["COVERM_TPU_NUM_PROCESSES"] = str(nproc)
        env["COVERM_TPU_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "coverm_tpu"] + argv, cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, err
        # the CPU gloo backend banners its connection state on stdout;
        # TSV output must be judged without it (TPU ICI/DCN collectives
        # print nothing)
        outs.append("".join(l for l in out.splitlines(keepends=True)
                            if not l.startswith("[Gloo]")))
    return outs


def run_single(argv, timeout=600):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    env["COVERM_TPU_PLATFORM"] = "cpu"
    env["COVERM_TPU_MESH"] = "0"
    proc = subprocess.run(
        [sys.executable, "-m", "coverm_tpu"] + argv, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


@pytest.mark.parametrize("mode", ["contig", "genome"])
def test_two_process_cli_matches_single_process(tmp_path, mode):
    bam = make_bam(str(tmp_path / "s.bam"))
    argv = [mode, "-b", bam, "-m", "mean", "trimmed_mean", "variance",
            "covered_fraction", "--output-format", "sparse"]
    if mode == "genome":
        argv += ["-s", "~", "--min-covered-fraction", "0"]

    golden = run_single(argv)
    r0, r1 = run_multiproc(argv)
    assert r0 == golden
    assert r1 == ""  # non-zero ranks must not write the TSV
    assert len(golden.splitlines()) > 1


def test_two_process_histogram_method(tmp_path):
    """coverage_histogram forces the hist + re-dispatch path; the
    overflow decision must be identical on every rank (it reads the
    replicated packed output)."""
    bam = make_bam(str(tmp_path / "s.bam"))
    argv = ["contig", "-b", bam, "-m", "coverage_histogram"]
    golden = run_single(argv)
    r0, r1 = run_multiproc(argv)
    assert r0 == golden
    assert r1 == ""


def test_two_process_fused_streaming_matches_single(tmp_path):
    """Force the streaming threshold down so the 2-process job ingests
    through the FUSED native scanner driving the multi-host mesh
    dispatch (SPMD: both ranks walk identical segments); TSV must still
    equal the single-process run byte for byte."""
    bam = make_bam(str(tmp_path / "s.bam"))
    argv = ["contig", "-b", bam, "-m", "mean", "trimmed_mean", "variance"]
    old = os.environ.get("COVERM_TPU_STREAM_THRESHOLD")
    os.environ["COVERM_TPU_STREAM_THRESHOLD"] = "1"
    try:
        golden = run_single(argv)
        r0, r1 = run_multiproc(argv)
    finally:
        if old is None:
            os.environ.pop("COVERM_TPU_STREAM_THRESHOLD", None)
        else:
            os.environ["COVERM_TPU_STREAM_THRESHOLD"] = old
    assert r0 == golden
    assert r1 == ""
