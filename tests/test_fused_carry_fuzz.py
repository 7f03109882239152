"""Targeted fuzzing of the fused-ingest carry seams (VERDICT r4 #5).

The r4 fused ingest (io/fastscan.py + ct_ingest_scan) threads a raw
byte carry between segments; these tests place corruptions exactly at
the seams the whole-buffer fuzz corpus (test_native_fuzz.py) cannot
reach: a block_size field split across a segment boundary, a zero
block_size stalling the chain mid-stream, a sortedness violation whose
offending record is the first record after a carry joint, and truncated
final carries.  Every case asserts fused-vs-classic OUTCOME AGREEMENT:
identical scans, or errors of the same family.

The last test pins the documented O(1e-12) fused-vs-classic identity-sum
drift (io/fastscan.py module docstring): a contig spanning the 32k-record
native chunk boundary provably drifts in f64 yet still prints the same
f32 TSV (estimators.py:548 anir formatting) — the determinism caveat now
has a fixture, not just a docstring.
"""

import struct

import numpy as np
import pytest

from coverm_tpu.flags import FlagFilter
from coverm_tpu.io import bgzf, native
from coverm_tpu.io.bam import BamFormatError, BamStreamReader
from coverm_tpu.io.fastscan import (FusedScanStream, fused_available,
                                    scan_sample_fused)
from coverm_tpu.io.sam import sam_text_to_bam_data
from coverm_tpu.ops.depth import ReferenceLayout
from coverm_tpu.scan import (BamSortingError, MissingNMTagError,
                             scan_sample_batches)

from test_fastscan import assert_scan_equal

pytestmark = pytest.mark.skipif(not fused_available(),
                                reason="native fused scan unavailable")

BLOCK = 4000        # BGZF block payload bytes (small -> many seams)
SEG = 8192          # segment target: ~2 blocks per fused segment


def _decoded_bam(n_reads=600, n_contigs=4, contig_len=20000, seed=0):
    """(decoded_bytes, header_end, record_offsets)"""
    rng = np.random.default_rng(seed)
    sam = [f"@SQ\tSN:c{i}\tLN:{contig_len}" for i in range(n_contigs)]
    tids = np.sort(rng.integers(0, n_contigs, n_reads))
    starts = np.sort(rng.integers(1, contig_len - 120, n_reads))
    for j in range(n_reads):
        sam.append(f"r{j}\t0\tc{tids[j]}\t{starts[j]}\t60\t100M\t*\t0\t0\t"
                   f"{'A' * 100}\t*\tNM:i:{int(rng.integers(0, 3))}")
    data = sam_text_to_bam_data(iter(sam))
    arr = np.frombuffer(data, np.uint8)
    # header end: walk magic + l_text + text + refs
    (l_text,) = struct.unpack_from("<i", data, 4)
    p = 8 + l_text
    (n_ref,) = struct.unpack_from("<i", data, p)
    p += 4
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", data, p)
        p += 4 + l_name + 4
    offs = []
    q = p
    while q + 4 <= arr.size:
        (bs,) = struct.unpack_from("<I", data, q)
        offs.append(q)
        q += 4 + bs
    return bytearray(data), p, offs


def _write_bgzf(path, decoded):
    with open(path, "wb") as f:
        for o in range(0, len(decoded), BLOCK):
            f.write(bgzf.compress_block(bytes(decoded[o:o + BLOCK]), 1))
        f.write(bgzf.BGZF_EOF)
    return path


def _outcome(path, fused: bool):
    ff = FlagFilter()
    try:
        if fused:
            s = FusedScanStream(path, target_bytes=SEG)
            h = s.open()
            layout = ReferenceLayout.build(h.target_lens, 75)
            return "ok", scan_sample_fused(h, s, layout, ff, False,
                                           trim=(0.1, 0.9))
        h, gen = BamStreamReader(path, target_bytes=SEG).read()
        layout = ReferenceLayout.build(h.target_lens, 75)
        return "ok", scan_sample_batches(h, gen, layout, ff, False,
                                         trim=(0.1, 0.9))
    except BamSortingError:
        return "unsorted", None
    except MissingNMTagError:
        return "missing_nm", None
    except BamFormatError:
        return "format_error", None
    except ValueError:
        return "format_error", None


def _agree(path):
    """Strict agreement: same outcome family; equal scans when ok."""
    f = _outcome(path, fused=True)
    c = _outcome(path, fused=False)
    assert f[0] == c[0], (f[0], c[0])
    if f[0] == "ok":
        assert_scan_equal(f[1], c[1])
    return f[0]


def _agree_loose(path):
    """Corrupt-chain agreement: when a mutated length field makes the
    record chain resynchronise, the two engines may detect the damage at
    different depths (the fused aux walk early-exits after NM; the
    classic parse also wants AS) — either may error where the other
    tolerates.  What MUST hold: every failure is a loud error of a known
    family (no crash, no silent exception), and when BOTH engines accept
    the stream they agree bit for bit."""
    f = _outcome(path, fused=True)
    c = _outcome(path, fused=False)
    known = {"ok", "format_error", "unsorted", "missing_nm"}
    assert f[0] in known and c[0] in known, (f[0], c[0])
    if f[0] == c[0] == "ok":
        assert_scan_equal(f[1], c[1])
    return f[0], c[0]


def test_zero_block_size_mid_stream_raises_both(tmp_path):
    decoded, hdr_end, offs = _decoded_bam()
    mid = offs[len(offs) // 2]
    decoded[mid:mid + 4] = b"\x00\x00\x00\x00"
    path = _write_bgzf(str(tmp_path / "z.bam"), decoded)
    assert _agree(path) == "format_error"


def test_zero_tail_at_eof_tolerated_both(tmp_path):
    # a bare 4-zero-byte tail is the classic reader's accepted EOS
    decoded, hdr_end, offs = _decoded_bam()
    decoded += b"\x00\x00\x00\x00"
    path = _write_bgzf(str(tmp_path / "t.bam"), decoded)
    assert _agree(path) == "ok"


def test_length_field_straddling_segment_joint(tmp_path):
    """Mutate exactly the records whose 4-byte block_size field crosses
    a segment boundary — the bytes the raw carry threads natively."""
    decoded, hdr_end, offs = _decoded_bam(n_reads=900)
    # segment joints are unions of BGZF block boundaries (multiples of
    # BLOCK in decoded coordinates) — a length field straddles one when
    # its record offset lands in the last 3 bytes of a block
    seams = [o for o in offs if (o % BLOCK) > BLOCK - 4]
    if not seams:  # alignment fallback: take records nearest each seam
        seams = [min(offs, key=lambda o: abs(o - k * BLOCK))
                 for k in range(1, len(decoded) // BLOCK)]
    outcomes = set()
    for k, o in enumerate(seams):
        d = bytearray(decoded)
        val = [0x7FFFFFFF, 5, 0, 0x10000][k % 4]
        struct.pack_into("<I", d, o, val)
        path = _write_bgzf(str(tmp_path / f"s{k}.bam"), d)
        outcomes.add(_agree_loose(path))
    assert outcomes  # at least one seam case exercised, none crashed


def test_tid_regression_exactly_at_carry_joint(tmp_path):
    """Force a record just past a block seam to regress in tid: the
    fused sortedness check crosses segments via acc.last_tid."""
    decoded, hdr_end, offs = _decoded_bam()

    def tid_of(o):
        return struct.unpack_from("<i", decoded, o + 4)[0]

    # a record whose predecessor also has tid >= 1, past the 3rd seam:
    # zeroing its tid is then a guaranteed regression
    joint = next(o for i, o in enumerate(offs)
                 if o > 3 * SEG and tid_of(o) >= 1
                 and tid_of(offs[i - 1]) >= 1)
    struct.pack_into("<i", decoded, joint + 4, 0)
    path = _write_bgzf(str(tmp_path / "r.bam"), decoded)
    assert _agree(path) == "unsorted"


def test_truncated_carry_agreement(tmp_path):
    """Cut the decoded stream at many points mid-record: the final carry
    is an incomplete record; both paths drop it identically (or error
    identically when the header itself is cut)."""
    decoded, hdr_end, offs = _decoded_bam(n_reads=300)
    cuts = np.linspace(hdr_end + 10, len(decoded) - 2, 9).astype(int)
    for k, cut in enumerate(cuts):
        path = _write_bgzf(str(tmp_path / f"c{k}.bam"), decoded[:cut])
        _agree(path)


def test_random_seam_area_mutations(tmp_path):
    """Random byte damage clustered within ±16 bytes of every segment
    boundary (the carry copy windows)."""
    rng = np.random.default_rng(11)
    decoded, hdr_end, offs = _decoded_bam(n_reads=900)
    n_seams = len(decoded) // BLOCK
    outcomes = {"ok": 0, "format_error": 0, "unsorted": 0}
    for it in range(24):
        d = bytearray(decoded)
        k = int(rng.integers(1, max(n_seams, 2)))
        center = k * BLOCK
        idx = rng.integers(max(center - 16, hdr_end),
                           min(center + 16, len(d)), 3)
        for i in idx:
            d[int(i)] = int(rng.integers(0, 256))
        path = _write_bgzf(str(tmp_path / f"m{it}.bam"), d)
        f, _c = _agree_loose(path)
        outcomes[f] = outcomes.get(f, 0) + 1
    assert sum(outcomes.values()) == 24


def test_identity_sum_drift_fixture(tmp_path):
    """A single contig spanning the 32k-record native chunk boundary:
    the fused path's chunk-ordered f64 identity accumulation provably
    DIFFERS from the classic batch path (the documented O(1e-12) drift),
    yet the printed f32 anir TSV is byte-identical."""
    import subprocess
    import sys

    rng = np.random.default_rng(3)
    n = 40000  # > one 32768-record native chunk
    sam = ["@SQ\tSN:cA\tLN:200000"]
    starts = np.sort(rng.integers(1, 199000, n))
    # varied aligned lengths + NM make the identity values irregular
    # enough that summation order matters in f64
    lens = rng.integers(51, 149, n)
    for j in range(n):
        L = int(lens[j])
        sam.append(f"r{j}\t0\tcA\t{starts[j]}\t60\t{L}M\t*\t0\t0\t"
                   f"{'A' * L}\t*\tNM:i:{int(rng.integers(0, 7))}")
    path = str(tmp_path / "drift.bam")
    with open(path, "wb") as f:
        w = bgzf.BgzfWriter(f)
        w.write(sam_text_to_bam_data(iter(sam)))
        w.close()

    f = _outcome(path, fused=True)
    c = _outcome(path, fused=False)
    assert f[0] == c[0] == "ok"
    drift = abs(float(f[1].identity_sum_primary[0])
                - float(c[1].identity_sum_primary[0]))
    assert drift > 0, "fixture no longer exercises the drift"
    assert drift < 1e-6 * float(c[1].identity_sum_primary[0])

    # printed f32 parity end to end (anir = sum_identity / reads)
    outs = []
    for fused in ("1", "0"):
        env = {"COVERM_TPU_PLATFORM": "cpu", "COVERM_TPU_FUSED": fused,
               "COVERM_TPU_SEGMENT_BYTES": str(1 << 20)}
        import os
        env = {**os.environ, **env}
        r = subprocess.run(
            [sys.executable, "-m", "coverm_tpu", "contig", "-b", path,
             "-m", "anir", "mean"],
            capture_output=True, env=env, timeout=600)
        assert r.returncode == 0, r.stderr.decode()
        outs.append(r.stdout)
    assert outs[0] == outs[1]
