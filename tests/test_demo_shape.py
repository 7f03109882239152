"""Demo-shaped end-to-end run checked against an independent oracle.

TRUE demo parity (TSV equality with /root/reference/demo/output_coverm.tsv)
is environment-blocked in this image: demo genomes 1/3/6/8 are absent
from the snapshot (.MISSING_LARGE_BLOBS) and no real mapper or network
egress exists — scripts/demo_parity.py remains the gated harness for a
complete environment.  This test asserts the same COMMAND SHAPE end to
end on the four genomes that ARE present: reads -> mapper ->
concatenated `genome~contig` reference -> genome mode with the demo's
method set (relative_abundance mean covered_fraction) -> dense TSV with
the unmapped row.  The expected values come from an ORACLE that shares
no code with the engine: it decompresses the cached BAM with stdlib
gzip, parses records with struct, and recomputes every statistic from
the reference's formulas (genome.rs accumulation + estimators.rs window
semantics + coverage_printer.rs:246-288 normalisation).
"""

import gzip
import os
import stat
import struct
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = "/root/reference/demo"
GENOMES = ["genome_2", "genome_4", "genome_5", "genome_7"]
EE = 75  # --contig-end-exclusion default


@pytest.fixture(scope="module")
def demo_run(tmp_path_factory):
    if not all(os.path.exists(f"{DEMO}/{g}.fna") for g in GENOMES):
        pytest.skip("reference demo genomes unavailable")
    tmp = tmp_path_factory.mktemp("demo_shape")

    # fake strobealign on PATH (exact-substring stand-in, tests/fake_mapper.py)
    bindir = tmp / "bin"
    bindir.mkdir()
    with open(os.path.join(REPO, "tests", "fake_mapper.py")) as f:
        body = f.read()
    exe = bindir / "strobealign"
    exe.write_text(f"#!{sys.executable}\n" + body.split("\n", 1)[1])
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)

    # deterministic reads: 420 drawn from genome sequence, 80 unmappable
    rng = np.random.default_rng(20260820)
    contigs = []  # (genome, seq)
    for g in GENOMES:
        name, seq = None, []
        with open(f"{DEMO}/{g}.fna") as f:
            for line in f:
                line = line.strip()
                if line.startswith(">"):
                    if name and len("".join(seq)) >= 400:
                        contigs.append((g, "".join(seq)))
                    name, seq = line[1:].split()[0], []
                else:
                    seq.append(line)
        if name and len("".join(seq)) >= 400:
            contigs.append((g, "".join(seq)))
    reads = tmp / "reads.fq"
    with open(reads, "w") as f:
        for j in range(420):
            gi = int(rng.integers(0, len(contigs)))
            _, seq = contigs[gi]
            start = int(rng.integers(0, len(seq) - 150))
            piece = seq[start:start + 150]
            if "N" in piece or len(set(piece)) < 4:
                piece = "ACGT" * 37 + "AC"  # unmappable junk fallback
            f.write(f"@m{j}\n{piece}\n+\n{'I' * len(piece)}\n")
        for j in range(80):
            f.write(f"@u{j}\n{'ACGT' * 37}AC\n+\n{'I' * 150}\n")

    cache = tmp / "cache"
    out = tmp / "out.tsv"
    import subprocess
    env = dict(os.environ)
    env["PATH"] = f"{bindir}:{env['PATH']}"
    env["JAX_PLATFORMS"] = "cpu"
    env["COVERM_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    proc = subprocess.run(
        [sys.executable, "-m", "coverm_tpu", "genome",
         "--single", str(reads),
         "-f"] + [f"{DEMO}/{g}.fna" for g in GENOMES] +
        ["-m", "relative_abundance", "mean", "covered_fraction",
         "--min-covered-fraction", "0",
         "--bam-file-cache-directory", str(cache),
         "-o", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr
    bams = os.listdir(cache)
    assert len(bams) == 1
    return str(out), os.path.join(str(cache), bams[0])


def oracle_from_bam(bam_path):
    """Recompute genome-mode statistics with stdlib-only parsing and
    numpy prefix sums — no coverm_tpu imports anywhere."""
    raw = gzip.decompress(open(bam_path, "rb").read())
    assert raw[:4] == b"BAM\x01"
    (l_text,) = struct.unpack_from("<I", raw, 4)
    off = 8 + l_text
    (n_ref,) = struct.unpack_from("<i", raw, off)
    off += 4
    names, lens = [], []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", raw, off)
        off += 4
        names.append(raw[off:off + l_name - 1].decode())
        off += l_name
        (l_ref,) = struct.unpack_from("<I", raw, off)
        lens.append(l_ref)
        off += 4

    depth = [np.zeros(l + 1, dtype=np.int64) for l in lens]
    n_total = 0
    n_mapped = 0
    genome_reads = {}
    while off + 4 <= len(raw):
        (bs,) = struct.unpack_from("<I", raw, off)
        if bs == 0:
            break
        rec = raw[off + 4: off + 4 + bs]
        off += 4 + bs
        tid, pos = struct.unpack_from("<ii", rec, 0)
        l_read_name = rec[8]
        (n_cigar,) = struct.unpack_from("<H", rec, 12)
        (flag,) = struct.unpack_from("<H", rec, 14)
        if flag & 0x900:
            continue  # secondary/supplementary: not primary
        n_total += 1
        if flag & 0x4 or tid < 0:
            continue
        n_mapped += 1
        g = names[tid].split("~")[0]
        genome_reads[g] = genome_reads.get(g, 0) + 1
        cur = pos
        for k in range(n_cigar):
            (c,) = struct.unpack_from("<I", rec, 32 + l_read_name + 4 * k)
            op, ln = c & 0xF, c >> 4
            if op in (0, 7, 8):      # M,=,X add depth
                end = min(cur + ln, lens[tid])
                depth[tid][cur] += 1
                depth[tid][end] -= 1
                cur += ln
            elif op in (2, 3):       # D,N advance
                cur += ln
    # per-genome window sums (genome.rs accumulation + estimators.rs
    # window semantics incl. the unobserved-contig quirk :226-243)
    stats = {}
    for g in set(n.split("~")[0] for n in names):
        stats[g] = dict(depth_sum=0, covered=0, window=0)
    for tid, name in enumerate(names):
        g = name.split("~")[0]
        d = np.cumsum(depth[tid][:lens[tid]])
        observed = bool((d > 0).any())
        L = lens[tid]
        if observed:
            w = d[EE: L - EE] if L > 2 * EE else d[:0]
            stats[g]["depth_sum"] += int(w.sum())
            stats[g]["covered"] += int((w > 0).sum())
            stats[g]["window"] += (L - 2 * EE) if L > 2 * EE else 0
        else:
            stats[g]["window"] += L if L < 2 * EE else L - 2 * EE
    means = {g: (s["depth_sum"] / s["window"] if s["window"] else 0.0)
             for g, s in stats.items()}
    covfrac = {g: (s["covered"] / s["window"] if s["window"] else 0.0)
               for g, s in stats.items()}
    # coverage_printer.rs:246-288 normalisation
    total_cov = sum(means.values())
    mapped_frac = n_mapped / n_total
    rel = {g: (m * 100.0 * mapped_frac / total_cov if total_cov else 0.0)
           for g, m in means.items()}
    rel["unmapped"] = 100.0 * (1.0 - mapped_frac)
    return rel, means, covfrac, n_mapped, n_total


def test_demo_shape_matches_oracle(demo_run):
    out_path, bam_path = demo_run
    rel, means, covfrac, n_mapped, n_total = oracle_from_bam(bam_path)
    assert n_mapped > 200 and n_total == 500

    rows = open(out_path).read().strip().split("\n")
    header = rows[0].split("\t")
    assert header[0] == "Genome"
    assert "Relative Abundance (%)" in header[1]
    got = {}
    for r in rows[1:]:
        c = r.split("\t")
        # the unmapped row prints NA for non-normalised columns
        # (coverage_printer.rs:246-258)
        got[c[0]] = [float("nan") if x == "NA" else float(x) for x in c[1:]]
    assert set(got) == set(GENOMES) | {"unmapped"}

    for g in GENOMES:
        assert got[g][0] == pytest.approx(rel[g], abs=1e-3), g
        assert got[g][1] == pytest.approx(means[g], abs=1e-3), g
        assert got[g][2] == pytest.approx(covfrac[g], abs=1e-3), g
    assert got["unmapped"][0] == pytest.approx(rel["unmapped"], abs=1e-3)


# ---------------------------------------------------------------------------
# The REAL demo reads (VERDICT r3 #5): /root/reference/demo/sample_1.*.fq.gz
# ARE in the image even though genomes 1/3/6/8 are not.  Push the actual
# demo read pair through the whole reads->mapper->TSV pipeline against
# the four present genomes and oracle-check the cached BAM.  Full
# 8-genome TSV equality stays env-gated in scripts/demo_parity.py.

@pytest.fixture(scope="module")
def demo_real_run(tmp_path_factory):
    if not all(os.path.exists(f"{DEMO}/{g}.fna") for g in GENOMES):
        pytest.skip("reference demo genomes unavailable")
    if not os.path.exists(f"{DEMO}/sample_1.1.fq.gz"):
        pytest.skip("demo read files unavailable")
    tmp = tmp_path_factory.mktemp("demo_real")

    bindir = tmp / "bin"
    bindir.mkdir()
    with open(os.path.join(REPO, "tests", "fake_mapper.py")) as f:
        body = f.read()
    exe = bindir / "strobealign"
    exe.write_text(f"#!{sys.executable}\n" + body.split("\n", 1)[1])
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)

    # the fake mapper reads plain fastq; decompress the first 800 real
    # demo read pairs (enough for ~70 forward-exact mappings against
    # the 4 present genomes while keeping the substring search fast)
    n_pairs = 800
    pairs = []
    for end in (1, 2):
        src = f"{DEMO}/sample_1.{end}.fq.gz"
        dst = tmp / f"r{end}.fq"
        with gzip.open(src, "rt") as fi, open(dst, "w") as fo:
            for _ in range(n_pairs):
                for _ in range(4):
                    line = fi.readline()
                    assert line
                    fo.write(line)
        pairs.append(str(dst))

    cache = tmp / "cache"
    out = tmp / "out.tsv"
    import subprocess
    env = dict(os.environ)
    env["PATH"] = f"{bindir}:{env['PATH']}"
    env["JAX_PLATFORMS"] = "cpu"
    env["COVERM_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    proc = subprocess.run(
        [sys.executable, "-m", "coverm_tpu", "genome",
         "-1", pairs[0], "-2", pairs[1],
         "-f"] + [f"{DEMO}/{g}.fna" for g in GENOMES] +
        ["-m", "relative_abundance", "mean", "covered_fraction",
         "--min-covered-fraction", "0",
         "--bam-file-cache-directory", str(cache),
         "-o", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr
    bams = os.listdir(cache)
    assert len(bams) == 1
    return str(out), os.path.join(str(cache), bams[0])


def test_demo_real_reads_match_oracle(demo_real_run):
    """The true demo read set exercises reads->TSV end to end; every
    printed number must match the stdlib oracle on the cached BAM."""
    out_path, bam_path = demo_real_run
    rel, means, covfrac, n_mapped, n_total = oracle_from_bam(bam_path)
    assert n_total == 1600          # every demo read accounted for
    assert n_mapped >= 20           # real reads, forward-exact stand-in

    rows = open(out_path).read().strip().split("\n")
    got = {}
    for r in rows[1:]:
        c = r.split("\t")
        got[c[0]] = [float("nan") if x == "NA" else float(x) for x in c[1:]]
    assert set(got) == set(GENOMES) | {"unmapped"}
    for g in GENOMES:
        assert got[g][0] == pytest.approx(rel[g], abs=1e-3), g
        assert got[g][1] == pytest.approx(means[g], abs=1e-3), g
        assert got[g][2] == pytest.approx(covfrac[g], abs=1e-3), g
    assert got["unmapped"][0] == pytest.approx(rel["unmapped"], abs=1e-3)
