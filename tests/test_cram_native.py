"""Native CRAM slice decoder (native/cramdecode.cpp) vs the pure-python
record model: byte-identical BAM output on every fixture class,
including the adversarial corpus the writer cannot produce."""

import os
import subprocess
import sys

import numpy as np
import pytest

from coverm_tpu.io import native
from coverm_tpu.io.cram import (cram_to_bam_data, iter_bam_segments,
                                sam_to_cram_bytes, CramFormatError)

import test_cram_adversarial as adv

pytestmark = pytest.mark.skipif(
    native.get_lib() is None
    or not hasattr(native.get_lib(), "ct_cram_decode_slice"),
    reason="native CRAM decoder unavailable")


def both_ways(raw: bytes, require_seq=False) -> tuple:
    old = os.environ.get("COVERM_TPU_NATIVE_CRAM")
    try:
        os.environ["COVERM_TPU_NATIVE_CRAM"] = "0"
        py = cram_to_bam_data(raw, require_seq=require_seq)
        os.environ["COVERM_TPU_NATIVE_CRAM"] = "1"
        nat = cram_to_bam_data(raw, require_seq=require_seq)
    finally:
        if old is None:
            os.environ.pop("COVERM_TPU_NATIVE_CRAM", None)
        else:
            os.environ["COVERM_TPU_NATIVE_CRAM"] = old
    return py, nat


def writer_fixture(n=500, records_per_slice=64, use_nf=True, seed=0):
    rng = np.random.default_rng(seed)
    sam = ["@SQ\tSN:cA\tLN:100000", "@SQ\tSN:cB\tLN:50000",
           "@RG\tID:rg0\tSM:s"]
    pos = np.sort(rng.integers(1, 40000, n))
    cigs = ["50M", "10S30M10S", "20M5D25M", "25M2I23M", "10M100N40M",
            "5H45M"]
    for j, p in enumerate(pos):
        tid = "cA" if j % 3 else "cB"
        flag = [0, 16, 0x400, 0x100][j % 4]
        cig = cigs[j % len(cigs)]
        seq = ("ACGTN" * 10)
        sam.append(f"p{j}\t{flag}\t{tid}\t{p}\t{30 + j % 30}\t{cig}\t*\t0\t0"
                   f"\t{seq}\t{'I' * 50}\tNM:i:{j % 4}\tAS:i:{40 + j % 9}"
                   f"\tXZ:Z:tag{j}")
    return sam_to_cram_bytes(iter(sam), records_per_slice=records_per_slice,
                             use_nf=use_nf)


@pytest.mark.parametrize("rps,nf", [(64, True), (64, False), (4096, True),
                                    (7, False)])
def test_writer_fixtures_byte_identical(rps, nf):
    raw = writer_fixture(records_per_slice=rps, use_nf=nf)
    py, nat = both_ways(raw)
    assert py == nat


def test_paired_detached_byte_identical():
    sam = ["@SQ\tSN:cA\tLN:10000"]
    for j in range(40):
        p1, p2 = 100 + j * 37, 400 + j * 41
        sam.append(f"q{j}\t99\tcA\t{p1}\t60\t30M\t=\t{p2}\t{p2-p1+30}\t"
                   f"{'A'*30}\t{'I'*30}\tNM:i:0")
        sam.append(f"q{j}\t147\tcA\t{p2}\t60\t30M\t=\t{p1}\t{-(p2-p1+30)}\t"
                   f"{'A'*30}\t{'I'*30}\tNM:i:0")
    for nf in (True, False):
        raw = sam_to_cram_bytes(iter(sam), use_nf=nf)
        py, nat = both_ways(raw)
        assert py == nat, f"use_nf={nf}"


@pytest.mark.parametrize("style",
                         ["external", "beta", "gamma", "subexp", "huffman"])
def test_adversarial_codecs_byte_identical(style):
    raw = adv.build_two_read_cram(style)
    py, nat = both_ways(raw)
    assert py == nat


def test_adversarial_no_ref_and_rr0_byte_identical():
    for embed, rr in ((False, True), (False, False), (True, True)):
        raw = adv.build_two_read_cram("external", embed_ref=embed, rr=rr)
        py, nat = both_ways(raw)
        assert py == nat, (embed, rr)
        if not embed and rr:
            with pytest.raises(CramFormatError, match="embedded reference"):
                cram_to_bam_data(raw, require_seq=True)


def test_rg_writer_fixture_byte_identical():
    # RG reconstruction parity on a writer fixture with @RG present
    raw = writer_fixture(n=60)
    py, nat = both_ways(raw)
    assert py == nat


def test_per_slice_fallback_matches_python(monkeypatch):
    """When the native decoder rejects a slice mid-stream, the python
    per-slice fallback must produce byte-identical output (this exact
    path shipped a NameError once because nothing drove it)."""
    raw = writer_fixture(n=300, records_per_slice=48)
    os.environ["COVERM_TPU_NATIVE_CRAM"] = "0"
    try:
        py = cram_to_bam_data(raw)
    finally:
        os.environ.pop("COVERM_TPU_NATIVE_CRAM", None)

    calls = {"n": 0}
    real = native.cram_decode_slice

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] % 2 == 0:
            return None  # native reject -> python fallback for this slice
        return real(*a, **kw)

    monkeypatch.setattr(native, "cram_decode_slice", flaky)
    nat = cram_to_bam_data(raw)
    assert calls["n"] >= 4  # several slices, alternating engines
    assert nat == py


def test_unmapped_and_noseq_byte_identical():
    sam = ["@SQ\tSN:cA\tLN:10000",
           f"u0\t4\t*\t0\t0\t*\t*\t0\t0\t{'A'*20}\t{'I'*20}",
           "u1\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*",
           f"m0\t0\tcA\t5\t60\t20M\t*\t0\t0\t{'C'*20}\t{'I'*20}\tNM:i:0"]
    raw = sam_to_cram_bytes(iter(sam))
    py, nat = both_ways(raw)
    assert py == nat


def test_cli_cram_coverage_native_matches_python(tmp_path):
    sam = ["@SQ\tSN:cA\tLN:100000"]
    rng = np.random.default_rng(1)
    for j, p in enumerate(np.sort(rng.integers(1, 99000, 400))):
        sam.append(f"r{j}\t0\tcA\t{p}\t60\t100M\t*\t0\t0\t{'A'*100}\t*"
                   f"\tNM:i:1")
    path = tmp_path / "x.cram"
    path.write_bytes(sam_to_cram_bytes(iter(sam)))
    outs = {}
    for knob in ("1", "0"):
        env = dict(os.environ, COVERM_TPU_PLATFORM="cpu",
                   COVERM_TPU_NATIVE_CRAM=knob, COVERM_TPU_MESH="0")
        r = subprocess.run(
            [sys.executable, "-m", "coverm_tpu", "contig", "-b", str(path),
             "-m", "mean", "variance", "count"],
            capture_output=True, env=env, cwd="/root/repo")
        assert r.returncode == 0, r.stderr.decode()
        outs[knob] = r.stdout
    assert outs["1"] == outs["0"]
