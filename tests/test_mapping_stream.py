"""Bounded-memory mapper pipeline (VERDICT r2 #4).

The reference keeps mapping memory bounded with its
`mapper | samtools sort -l0 | fifo` pipe (bam_generator.rs:445-468); the
engine equivalent is SamStreamConsumer's tid-bucketed external sort.
These tests pin (a) exact output parity between the spilled and
in-memory paths — record bytes AND order — (b) CLI-level equality with a
fake mapper including the cached BAM, and (c) the memory bound itself:
many× the spill threshold streams through a subprocess whose peak RSS is
far below the in-memory data size.
"""

import os
import subprocess
import sys

import numpy as np

from coverm_tpu.mapping.pipeline import SamStreamConsumer, sort_batch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_sam_lines(n_records, n_contigs=7, contig_len=5000, seed=0,
                   unmapped_every=50):
    rng = np.random.default_rng(seed)
    lines = [f"@SQ\tSN:c{i}\tLN:{contig_len}" for i in range(n_contigs)]
    tids = rng.integers(0, n_contigs, n_records)
    starts = rng.integers(0, contig_len - 100, n_records)
    for j in range(n_records):
        if unmapped_every and j % unmapped_every == 7:
            lines.append(f"u{j}\t4\t*\t0\t0\t*\t*\t0\t0\t{'A' * 50}\t*")
            continue
        lines.append(
            f"r{j}\t0\tc{tids[j]}\t{starts[j] + 1}\t60\t100M\t*\t0\t0"
            f"\t{'A' * 100}\t{'I' * 100}\tNM:i:{j % 3}\tAS:i:{100 - j % 3}")
    return lines


def batch_bytes(batch):
    """Concatenate record bytes in batch order."""
    data = batch.data
    return b"".join(
        bytes(data[int(s):int(e)])
        for s, e in zip(batch.rec_start, batch.rec_end))


def test_spilled_matches_in_memory_exactly():
    lines = make_sam_lines(3000)

    header_m, batch = SamStreamConsumer(iter(lines), spill_bytes=1 << 62).run()
    in_mem = sort_batch(batch)

    header_s, gen = SamStreamConsumer(iter(lines), spill_bytes=5000).run()
    batches = list(gen)
    assert len(batches) > 1  # actually spilled into multiple buckets

    assert header_s.target_names == header_m.target_names
    assert np.array_equal(header_s.target_lens, header_m.target_lens)
    # record identity AND order: concatenated raw record bytes equal
    assert b"".join(batch_bytes(b) for b in batches) == batch_bytes(in_mem)
    # batches are contig-disjoint and tid-ordered (unmapped last)
    seen = []
    for b in batches:
        t = np.unique(b.tid[~b.is_unmapped()])
        assert all(x > max(seen, default=-1) for x in t)
        seen.extend(t)
    total = sum(b.n_records for b in batches)
    assert total == in_mem.n_records


def test_cli_spilled_matches_in_memory(tmp_path, monkeypatch, capsys):
    """contig-from-reads through the fake mapper: tiny spill threshold
    vs in-memory must give identical TSV and byte-identical cached BAM."""
    import stat

    from coverm_tpu.cli import main
    from coverm_tpu.mapping import pipeline

    bindir = tmp_path / "fakebin"
    bindir.mkdir()
    src = os.path.join(REPO, "tests", "fake_mapper.py")
    with open(src) as f:
        body = f.read()
    dst = bindir / "minimap2"
    dst.write_text(f"#!{sys.executable}\n" + body.split("\n", 1)[1])
    dst.chmod(dst.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    rng = np.random.default_rng(5)
    ref = tmp_path / "ref.fna"
    contigs = {f"g{i}": "".join(rng.choice(list("ACGT"), 4000))
               for i in range(3)}
    ref.write_text("".join(f">{n}\n{s}\n" for n, s in contigs.items()))
    reads = tmp_path / "reads.fq"
    with open(reads, "w") as f:
        for j in range(400):
            name = f"g{j % 3}"
            start = int(rng.integers(0, 3900))
            seq = contigs[name][start:start + 100]
            f.write(f"@q{j}\n{seq}\n+\n{'I' * len(seq)}\n")

    def run(cache_dir, spill):
        monkeypatch.setattr(pipeline, "SPILL_THRESHOLD_BYTES", spill)
        rc = main(["contig", "-r", str(ref), "--single", str(reads),
                   "-p", "minimap2-sr", "-m", "mean", "covered_fraction",
                   "--min-covered-fraction", "0",
                   "--bam-file-cache-directory", str(cache_dir)])
        assert rc == 0
        return capsys.readouterr().out

    cache_a, cache_b = tmp_path / "ca", tmp_path / "cb"
    out_mem = run(cache_a, 1 << 62)
    out_spill = run(cache_b, 1000)
    assert out_spill == out_mem
    assert len(out_mem.splitlines()) == 4
    (a,), (b,) = os.listdir(cache_a), os.listdir(cache_b)
    assert (cache_a / a).read_bytes() == (cache_b / b).read_bytes()


def test_spill_memory_bound():
    """~20x the spill threshold streams through a subprocess whose peak
    RSS stays far below the in-memory path's (which holds all record
    bytes plus a copy plus the parsed columns)."""
    script = r"""
import sys
sys.path.insert(0, %(repo)r)
from coverm_tpu.mapping.pipeline import SamStreamConsumer

def lines():
    yield from (f"@SQ\tSN:c{i}\tLN:100000" for i in range(64))
    qual = "I" * 100
    seq = "A" * 100
    for j in range(800_000):
        c = j * 64 // 800_000   # sorted input, all buckets used
        yield (f"r{j}\t0\tc{c}\t{j %% 9973 + 1}\t60\t100M\t*\t0\t0"
               f"\t{seq}\t{qual}\tNM:i:0")

spill = (8 << 20) if sys.argv[1] == "spill" else (1 << 62)
header, payload = SamStreamConsumer(lines(), spill_bytes=spill).run()
n = 0
if hasattr(payload, "tid"):
    n = payload.n_records
else:
    for b in payload:
        n += b.n_records
assert n == 800_000, n
# VmHWM (not ru_maxrss: the latter is inherited across fork/exec on
# Linux, so a big pytest parent would mask the child's real peak)
hwm_kb = next(int(l.split()[1]) for l in open("/proc/self/status")
              if l.startswith("VmHWM:"))
print(f"peak_rss_mb={hwm_kb / 1024:.0f}")
""" % {"repo": REPO}

    def peak(mode):
        env = dict(os.environ, MALLOC_ARENA_MAX="2")
        proc = subprocess.run([sys.executable, "-c", script, mode], cwd=REPO,
                              env=env, capture_output=True, text=True,
                              timeout=600)
        assert proc.returncode == 0, proc.stderr + proc.stdout
        return float(proc.stdout.split("peak_rss_mb=")[1])

    spilled, in_mem = peak("spill"), peak("mem")
    # ~150 MB of encoded records: spilled must undercut in-memory by a
    # wide margin and stay near the O(bucket) floor
    assert spilled < in_mem - 80, (spilled, in_mem)
    assert spilled < 400, (spilled, in_mem)
