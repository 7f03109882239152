"""CRAM direct-stats route (VERDICT r4 #2) vs the legacy route.

The direct route (fastscan._cram_slice_blocks -> ct_cram_stats_slice)
decodes slices straight into block/stat arrays — no BAM byte
materialisation, no re-scan, never-read streams (qualities, bases,
names) left compressed.  The legacy route (COVERM_TPU_CRAM_STATS=0)
materialises BAM bytes per container and re-scans them; the pure-python
record model underneath it is the from-spec oracle.  Every statistic
must agree bit for bit between the two routes.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from coverm_tpu.flags import FlagFilter
from coverm_tpu.io import native
from coverm_tpu.io.cram import sam_to_cram_bytes
from coverm_tpu.io.fastscan import FusedScanStream, scan_sample_fused
from coverm_tpu.ops.depth import ReferenceLayout

from test_fastscan import assert_scan_equal

pytestmark = pytest.mark.skipif(
    native.get_lib() is None
    or not hasattr(native.get_lib(), "ct_cram_stats_slice"),
    reason="native CRAM stats decoder unavailable")


def _sam_lines(n=400, n_contigs=3, paired=False, seed=0):
    rng = np.random.default_rng(seed)
    lens = [60000, 40000, 90000]
    sam = [f"@SQ\tSN:c{i}\tLN:{lens[i]}" for i in range(n_contigs)]
    recs = []
    for j in range(n):
        tid = int(rng.integers(0, n_contigs))
        pos = int(rng.integers(1, lens[tid] - 200))
        flag = 0
        if j % 11 == 3:
            flag |= 0x100      # secondary
        if j % 13 == 5:
            flag |= 0x800      # supplementary
        if j % 17 == 7:
            flag |= 0x4        # unmapped
        if j % 19 == 9:
            flag |= 0x400      # duplicate
        if paired:
            flag |= 0x1 | (0x2 if j % 3 else 0)
        cig = ["60M", "20M2D20M5I15M", "8S40M3N12M", "30M1I29M"][j % 4]
        import re
        L = sum(int(x) for x, op in re.findall(r"(\d+)([MIS=X])", cig))
        if flag & 0x4:
            cig = "*"
            L = 50
        seq = ("ACGT" * 40)[:L]
        recs.append((tid, pos, j, flag, cig, seq))
    recs.sort(key=lambda r: (r[0], r[1]))
    for tid, pos, j, flag, cig, seq in recs:
        nm = "" if j % 23 == 11 and (flag & 0x4) else f"\tNM:i:{j % 5}"
        # the fused path requires NM on mapped records; keep it there
        nm = f"\tNM:i:{j % 5}"
        extra = "\tAS:i:77\tXZ:Z:hello" if j % 6 == 0 else ""
        sam.append(f"r{j}\t{flag}\tc{tid}\t{pos}\t{30 + j % 30}\t{cig}"
                   f"\t*\t0\t0\t{seq}\t{'I' * len(seq)}{nm}{extra}")
    return sam


def _scan(path, ff=None, need_hist=False, trim=(0.1, 0.9), env=None):
    env = env or {}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        s = FusedScanStream(path)
        h = s.open()
        layout = ReferenceLayout.build(h.target_lens, 75)
        return (scan_sample_fused(h, s, layout, ff or FlagFilter(),
                                  need_hist, trim=trim),
                getattr(s, "_cram", None) is not None)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _assert_routes_agree(path, ff=None, need_hist=False, trim=(0.1, 0.9)):
    direct, used_direct = _scan(path, ff, need_hist, trim)
    assert used_direct, "direct-stats route did not engage"
    legacy, used2 = _scan(path, ff, need_hist, trim,
                          env={"COVERM_TPU_CRAM_STATS": "0"})
    assert not used2
    assert_scan_equal(direct, legacy)
    return direct


def _write(tmp_path, raw, name="x.cram"):
    p = str(tmp_path / name)
    with open(p, "wb") as f:
        f.write(raw)
    return p


def test_basic_mixed_flags(tmp_path):
    raw = sam_to_cram_bytes(iter(_sam_lines(400)), records_per_slice=64)
    d = _assert_routes_agree(_write(tmp_path, raw))
    assert d.reads_all.sum() > 0


@pytest.mark.parametrize("ff", [
    FlagFilter(),
    FlagFilter(include_secondary=True),
    FlagFilter(include_supplementary=False),
    FlagFilter(include_improper_pairs=False),
])
def test_flag_filters(tmp_path, ff):
    raw = sam_to_cram_bytes(iter(_sam_lines(300, paired=True)),
                            records_per_slice=50)
    _assert_routes_agree(_write(tmp_path, raw), ff=ff)


def test_multiref_slices(tmp_path):
    # slices mixing contigs -> RI per record, ap_delta off
    raw = sam_to_cram_bytes(iter(_sam_lines(300)), records_per_slice=299)
    _assert_routes_agree(_write(tmp_path, raw))


def test_nf_mate_links(tmp_path):
    # NF mate-downstream chains resolve mate flags AFTER decode; the
    # block-sink fast path must stay valid (FlagFilter reads no mate bit)
    sam = ["@SQ\tSN:cA\tLN:50000"]
    for j in range(120):
        p1, p2 = 100 + 7 * j, 160 + 7 * j
        sam.append(f"p{j}\t99\tcA\t{p1}\t60\t40M\t=\t{p2}\t100\t{'A' * 40}"
                   f"\t{'I' * 40}\tNM:i:1")
        sam.append(f"p{j}\t147\tcA\t{p2}\t60\t40M\t=\t{p1}\t-100\t{'C' * 40}"
                   f"\t{'I' * 40}\tNM:i:0")
    raw = sam_to_cram_bytes(iter(sam), records_per_slice=80, use_nf=True)
    _assert_routes_agree(_write(tmp_path, raw))


def test_ap_delta_off(tmp_path):
    raw = sam_to_cram_bytes(iter(_sam_lines(200)), records_per_slice=64,
                            ap_delta=False)
    _assert_routes_agree(_write(tmp_path, raw))


def test_need_hist(tmp_path):
    raw = sam_to_cram_bytes(iter(_sam_lines(300)), records_per_slice=64)
    _assert_routes_agree(_write(tmp_path, raw), need_hist=True, trim=None)


def test_per_slice_fallback_parity(tmp_path, monkeypatch):
    """Native rejection of every slice must fall back per slice to the
    python record model inside the SAME direct route and still agree."""
    raw = sam_to_cram_bytes(iter(_sam_lines(250)), records_per_slice=64)
    path = _write(tmp_path, raw)
    legacy, _ = _scan(path, env={"COVERM_TPU_CRAM_STATS": "0"})
    monkeypatch.setattr(native, "cram_stats_slice",
                        lambda *a, **k: None)
    direct, used = _scan(path)
    assert used
    assert_scan_equal(direct, legacy)


def test_unsorted_cram_raises_both(tmp_path):
    sam = ["@SQ\tSN:cA\tLN:50000", "@SQ\tSN:cB\tLN:50000"]
    sam.append(f"r0\t0\tcB\t100\t60\t40M\t*\t0\t0\t{'A' * 40}\t*\tNM:i:0")
    sam.append(f"r1\t0\tcA\t100\t60\t40M\t*\t0\t0\t{'A' * 40}\t*\tNM:i:0")
    # one record per slice so the tid regression crosses slices
    raw = sam_to_cram_bytes(iter(sam), records_per_slice=1)
    path = _write(tmp_path, raw)
    from coverm_tpu.scan import BamSortingError
    for env in ({}, {"COVERM_TPU_CRAM_STATS": "0"}):
        with pytest.raises(BamSortingError):
            _scan(path, env=env)


def test_missing_nm_raises_both(tmp_path):
    sam = ["@SQ\tSN:cA\tLN:50000",
           f"r0\t0\tcA\t100\t60\t40M\t*\t0\t0\t{'A' * 40}\t*"]
    raw = sam_to_cram_bytes(iter(sam))
    path = _write(tmp_path, raw)
    from coverm_tpu.scan import MissingNMTagError
    for env in ({}, {"COVERM_TPU_CRAM_STATS": "0"}):
        with pytest.raises(MissingNMTagError):
            _scan(path, env=env)


def test_adversarial_codec_styles(tmp_path):
    """Hand-built containers with BETA/GAMMA/SUBEXP core codecs and
    embedded references: the direct route decodes them through the same
    codec machinery and reaches the same outcome as legacy (these
    fixtures carry no NM tag, so both routes must raise MissingNM — a
    codec bug would surface as CramFormatError instead)."""
    from test_cram_adversarial import build_two_read_cram
    from coverm_tpu.scan import MissingNMTagError
    for style in ("external", "beta", "gamma", "subexp", "huffman"):
        path = _write(tmp_path, build_two_read_cram(style),
                      f"{style}.cram")
        for env in ({}, {"COVERM_TPU_CRAM_STATS": "0"}):
            with pytest.raises(MissingNMTagError):
                _scan(path, env=env)


def test_mesh_depth_fn_over_cram(tmp_path):
    """The direct-stats route drives the contig-sharded mesh engine too
    (scan_any passes depth_fn through): 8-virtual-device mesh result
    must equal the single-device scan bit for bit."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from coverm_tpu.parallel.mesh_sweep import make_shard_mesh, \
        mesh_depth_fn

    raw = sam_to_cram_bytes(iter(_sam_lines(400)), records_per_slice=64)
    path = _write(tmp_path, raw)
    single, used = _scan(path)
    assert used
    s = FusedScanStream(path)
    h = s.open()
    layout = ReferenceLayout.build(h.target_lens, 75)
    meshed = scan_sample_fused(h, s, layout, FlagFilter(), False,
                               trim=(0.1, 0.9),
                               depth_fn=mesh_depth_fn(make_shard_mesh()))
    assert_scan_equal(single, meshed)


def test_cli_genome_mode_byte_parity(tmp_path):
    """Genome mode over CRAM: direct vs legacy routes byte-identical."""
    raw = sam_to_cram_bytes(iter(_sam_lines(300)), records_per_slice=64)
    path = _write(tmp_path, raw)
    outs = []
    for env in ({}, {"COVERM_TPU_CRAM_STATS": "0"}):
        e = {**os.environ, "COVERM_TPU_PLATFORM": "cpu", **env}
        r = subprocess.run(
            [sys.executable, "-m", "coverm_tpu", "genome", "-b", path,
             "--genome-definition", _genome_def(tmp_path),
             "-m", "mean", "relative_abundance", "covered_fraction"],
            capture_output=True, env=e, timeout=600)
        assert r.returncode == 0, r.stderr.decode()
        outs.append(r.stdout)
    assert outs[0] == outs[1]


def _genome_def(tmp_path):
    p = str(tmp_path / "genomes.tsv")
    with open(p, "w") as f:
        f.write("gA\tc0\ngA\tc1\ngB\tc2\n")
    return p


def test_cli_byte_parity(tmp_path):
    raw = sam_to_cram_bytes(iter(_sam_lines(300)), records_per_slice=64)
    path = _write(tmp_path, raw)
    outs = []
    for env in ({"COVERM_TPU_STREAM_THRESHOLD": "0"},
                {"COVERM_TPU_STREAM_THRESHOLD": "0",
                 "COVERM_TPU_CRAM_STATS": "0"}):
        e = {**os.environ, "COVERM_TPU_PLATFORM": "cpu", **env}
        r = subprocess.run(
            [sys.executable, "-m", "coverm_tpu", "contig", "-b", path,
             "-m", "mean", "trimmed_mean", "variance", "count", "anir"],
            capture_output=True, env=e, timeout=600)
        assert r.returncode == 0, r.stderr.decode()
        outs.append(r.stdout)
    assert outs[0] == outs[1]


def test_truncated_tail_raises_both_routes(tmp_path):
    """A file cut inside the final slice's SKIPPABLE stream (e.g. the
    quality block) must still fail loudly on the direct route: lazy
    blocks are never decompressed, so the bounds check + CRC are their
    only integrity gate (code-review r5 finding — the pre-fix direct
    route silently returned full results here)."""
    from coverm_tpu.io.bam import BamFormatError

    raw = sam_to_cram_bytes(iter(_sam_lines(200)), records_per_slice=200)
    for cut_back in (10, 25, 40, 60):
        path = _write(tmp_path, raw[:len(raw) - len(b"") - 38 - cut_back],
                      f"t{cut_back}.cram")
        outcomes = []
        for env in ({}, {"COVERM_TPU_CRAM_STATS": "0"}):
            try:
                _scan(path, env=env)
                outcomes.append("ok")
            except BamFormatError:
                outcomes.append("error")
        assert outcomes[0] == outcomes[1], (cut_back, outcomes)
        assert outcomes[0] == "error", cut_back


def test_mutation_outcome_agreement(tmp_path):
    """Random byte damage: the direct route must NEVER be looser than
    the legacy route — it may be STRICTER (skipped blocks are CRC-
    validated instead of decompressed, so damage in a quality stream
    errors on the direct route while the legacy route may succeed with
    structurally-valid garbage qualities, or vice versa error on a
    deflate break the CRC also catches).  Forbidden: direct ok where
    legacy errors."""
    from coverm_tpu.io.bam import BamFormatError
    from coverm_tpu.scan import BamSortingError, MissingNMTagError

    raw0 = np.frombuffer(
        sam_to_cram_bytes(iter(_sam_lines(150)), records_per_slice=50),
        np.uint8).copy()
    rng = np.random.default_rng(21)

    def outcome(path, env):
        try:
            _scan(path, env=env)
            return "ok"
        except BamSortingError:
            return "unsorted"
        except MissingNMTagError:
            return "missing_nm"
        except BamFormatError:
            return "format_error"
        except ValueError:
            return "format_error"

    diverged = 0
    for it in range(30):
        arr = raw0.copy()
        idx = rng.integers(30, arr.size, int(rng.integers(1, 5)))
        arr[idx] = rng.integers(0, 256, idx.size).astype(np.uint8)
        path = _write(tmp_path, arr.tobytes(), f"m{it}.cram")
        a = outcome(path, {})
        b = outcome(path, {"COVERM_TPU_CRAM_STATS": "0"})
        assert not (a == "ok" and b != "ok"), (it, a, b)
        diverged += a != b
    # strictness divergence should be the exception, not the rule
    assert diverged <= 10, diverged
