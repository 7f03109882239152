"""Bounded corruption fuzzing of the native decoders.

For each mutated input the native path must reach the same outcome as
the pure-python path — identical output bytes, or an error of the same
(exception) family — and must never crash the process.  The native CRAM
decoder is deliberately stricter than python: on any rejection it falls
back to the python model per slice, so outcomes converge by
construction; these tests pin that property under real byte-level
damage."""

import os

import numpy as np
import pytest

from coverm_tpu.flags import FlagFilter
from coverm_tpu.io import native
from coverm_tpu.io.bam import BamFormatError
from coverm_tpu.io.cram import (CramFormatError, cram_to_bam_data,
                                sam_to_cram_bytes)

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native lib unavailable")

N_MUTATIONS = 60


def _decoded_bam(n=300):
    import struct
    rng = np.random.default_rng(0)
    out = bytearray()
    text = b"@SQ\tSN:cA\tLN:100000\n"
    out += b"BAM\x01" + struct.pack("<i", len(text)) + text
    out += struct.pack("<i", 1)
    out += struct.pack("<i", 3) + b"cA\x00" + struct.pack("<I", 100000)
    start = len(out)
    for p in np.sort(rng.integers(0, 99000, n)):
        name = b"r%d\x00" % p
        body = struct.pack("<iiBBHHHiiii", 0, int(p), len(name), 60, 4680,
                           1, 0, 4, -1, -1, 0)
        body += name + struct.pack("<I", (4 << 4) | 0)
        body += b"\x12\x48" + b"IIII"
        body += b"NMC\x01"
        out += struct.pack("<I", len(body)) + body
    return bytes(out), start


def test_fuzz_stats_scan_never_crashes():
    data, start = _decoded_bam()
    rng = np.random.default_rng(42)
    arr0 = np.frombuffer(data, np.uint8).copy()
    ok = errs = 0
    for _ in range(N_MUTATIONS):
        arr = arr0.copy()
        k = int(rng.integers(1, 9))
        idx = rng.integers(start, arr.size, k)
        arr[idx] = rng.integers(0, 256, k).astype(np.uint8)
        acc = native.StatsAccum(1)
        try:
            res = native.stats_scan(arr, start, acc, 0x100, 0)
            assert res is not None
            bt, bs, be, cnt, eo = res
            assert bt.size == bs.size == be.size
            assert 0 <= eo <= arr.size
            ok += 1
        except ValueError:
            errs += 1
    assert ok + errs == N_MUTATIONS
    print(f"\nBAM fuzz: {ok} tolerated, {errs} clean errors")


def test_fuzz_truncated_stats_scan():
    data, start = _decoded_bam()
    arr0 = np.frombuffer(data, np.uint8)
    for cut in np.linspace(start + 1, len(data) - 1, 23).astype(int):
        acc = native.StatsAccum(1)
        res = native.stats_scan(np.ascontiguousarray(arr0[:cut]), start,
                                acc, 0x100, 0)
        assert res is not None  # complete-record prefix parses cleanly
        assert int(res[4]) <= cut


def _cram_fixture():
    rng = np.random.default_rng(1)
    sam = ["@SQ\tSN:cA\tLN:100000"]
    for j, p in enumerate(np.sort(rng.integers(1, 90000, 120))):
        sam.append(f"r{j}\t0\tcA\t{p}\t60\t40M\t*\t0\t0\t{'ACGT' * 10}\t"
                   f"{'I' * 40}\tNM:i:1")
    return sam_to_cram_bytes(iter(sam), records_per_slice=48)


def _outcome(raw):
    try:
        return ("ok", cram_to_bam_data(raw))
    except CramFormatError:
        return ("cram_error", None)
    except BamFormatError:
        return ("bam_error", None)


def test_fuzz_cram_native_matches_python():
    raw0 = np.frombuffer(_cram_fixture(), np.uint8).copy()
    rng = np.random.default_rng(7)
    same = 0
    outcomes = {"ok": 0, "cram_error": 0, "bam_error": 0}
    old = os.environ.get("COVERM_TPU_NATIVE_CRAM")
    try:
        for _ in range(N_MUTATIONS):
            arr = raw0.copy()
            k = int(rng.integers(1, 6))
            idx = rng.integers(30, arr.size, k)
            arr[idx] = rng.integers(0, 256, k).astype(np.uint8)
            raw = arr.tobytes()
            os.environ["COVERM_TPU_NATIVE_CRAM"] = "0"
            py = _outcome(raw)
            os.environ["COVERM_TPU_NATIVE_CRAM"] = "1"
            nat = _outcome(raw)
            assert nat[0] == py[0], (nat[0], py[0])
            if py[0] == "ok":
                assert nat[1] == py[1]
                same += 1
            outcomes[py[0]] += 1
    finally:
        if old is None:
            os.environ.pop("COVERM_TPU_NATIVE_CRAM", None)
        else:
            os.environ["COVERM_TPU_NATIVE_CRAM"] = old
    print(f"\nCRAM fuzz outcomes: {outcomes} ({same} byte-identical)")
