"""External-ANI engines driven through FAKE skani/fastANI executables
(VERDICT r3 #6: `_external_ani` parsing, threshold filtering, precluster
interaction, and the cluster e2e with a controlled ANI table).

The fake engines read an ANI lookup table from $FAKE_ANI_TABLE
(candidate-path<TAB>ani<TAB>aligned_fraction per line) and emit each
tool's real output format: skani's stdout TSV (header +
ref/query/ANI/af columns; skani itself applies the --min-af gate so
below-gate pairs are simply absent) and fastANI's -o file
(query ref ani matchedFrags totalFrags — OUR parser applies the
fraction gate).  Reference anchor: the galah bridge,
coverm.rs:1044-1133."""

import os
import stat
import subprocess
import sys

import numpy as np
import pytest

from coverm_tpu.derep import Clusterer, _external_ani

from test_derep import mutate, random_seq, write_genome

FAKE_SKANI = """#!{py}
import os, sys
args = sys.argv[1:]
if "--version" in args or "-V" in args:
    print("skani 0.2.2"); sys.exit(0)
q = args[args.index("-q") + 1]
rl = args[args.index("--rl") + 1]
min_af = float(args[args.index("--min-af") + 1]) if "--min-af" in args else 0.0
table = {{}}
for line in open(os.environ["FAKE_ANI_TABLE"]):
    c = line.strip().split("\\t")
    if len(c) == 3:
        table[c[0]] = (float(c[1]), float(c[2]))
print("Ref_file\\tQuery_file\\tANI\\tAlign_fraction_ref\\tAlign_fraction_query")
for cand in open(rl):
    cand = cand.strip()
    if not cand or cand not in table:
        continue
    ani, af = table[cand]
    if af * 100.0 < min_af:
        continue  # skani filters below-gate pairs itself
    print(f"{{cand}}\\t{{q}}\\t{{ani}}\\t{{af*100:.2f}}\\t{{af*100:.2f}}")
"""

FAKE_FASTANI = """#!{py}
import os, sys
args = sys.argv[1:]
if "--version" in args or "-v" in args:
    print("version 1.32"); sys.exit(0)
q = args[args.index("-q") + 1]
rl = args[args.index("--rl") + 1]
of = args[args.index("-o") + 1]
table = {{}}
for line in open(os.environ["FAKE_ANI_TABLE"]):
    c = line.strip().split("\\t")
    if len(c) == 3:
        table[c[0]] = (float(c[1]), float(c[2]))
with open(of, "w") as f:
    for cand in open(rl):
        cand = cand.strip()
        if not cand or cand not in table:
            continue
        ani, af = table[cand]
        total = 1000
        # fastANI emits every pair; the CALLER computes the fraction
        f.write(f"{{q}}\\t{{cand}}\\t{{ani}}\\t{{int(af*total)}}\\t{{total}}\\n")
"""


@pytest.fixture
def fake_engines(tmp_path):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    for name, body in (("skani", FAKE_SKANI), ("fastANI", FAKE_FASTANI)):
        exe = bindir / name
        exe.write_text(body.format(py=sys.executable))
        exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    old = os.environ.get("PATH")
    os.environ["PATH"] = f"{bindir}:{old}"
    yield tmp_path
    os.environ["PATH"] = old


@pytest.fixture
def quad(tmp_path):
    """Four genomes that all pass the sketch PREcluster against gA, so
    the external engine decides the final clustering."""
    rng = np.random.default_rng(11)
    base = random_seq(rng, 60000)
    paths = []
    for name, rate in (("ga", 0.0), ("gb", 0.002), ("gc", 0.004),
                       ("gd", 0.006)):
        p = tmp_path / f"{name}.fna"
        write_genome(p, base if rate == 0 else mutate(rng, base, rate))
        paths.append(str(p))
    return paths


def write_table(tmp_path, rows):
    t = tmp_path / "ani_table.tsv"
    t.write_text("".join(f"{p}\t{ani}\t{af}\n" for p, ani, af in rows))
    os.environ["FAKE_ANI_TABLE"] = str(t)
    return str(t)


def test_external_ani_skani_parse(fake_engines, quad, tmp_path):
    ga, gb, gc, gd = quad
    write_table(tmp_path, [(gb, 96.5, 0.8), (gc, 93.0, 0.9),
                           (gd, 99.0, 0.05)])  # gd below --min-af
    out = _external_ani("skani", ga, [gb, gc, gd],
                        min_aligned_fraction=0.15)
    assert out == {gb: 96.5, gc: 93.0}  # gd filtered by skani's gate


def test_external_ani_fastani_parse_and_fraction_gate(fake_engines, quad,
                                                      tmp_path):
    ga, gb, gc, gd = quad
    write_table(tmp_path, [(gb, 96.5, 0.8), (gc, 93.0, 0.9),
                           (gd, 99.0, 0.05)])
    out = _external_ani("fastani", ga, [gb, gc, gd],
                        min_aligned_fraction=0.15)
    # fastANI emits the gd row; OUR parser drops it (frac 0.05 < 0.15)
    assert out == {gb: 96.5, gc: 93.0}


def test_cluster_with_fake_skani(fake_engines, quad, tmp_path):
    ga, gb, gc, gd = quad
    # gb joins (96.5 >= 95); gc misses the threshold; gd's row is
    # af-gated away -> both become their own representatives
    write_table(tmp_path, [(gb, 96.5, 0.8), (gc, 93.0, 0.9),
                           (gd, 99.0, 0.05)])
    c = Clusterer(genome_paths=[ga, gb, gc, gd], ani=95.0,
                  precluster_ani=90.0, cluster_method="skani")
    clusters = c.cluster()
    sets = sorted(sorted(m) for m in clusters)
    assert [0, 1] in sets          # ga + gb
    assert sum(len(m) for m in sets) == 4
    assert len(sets) == 3


def test_cluster_cli_e2e_with_fake_skani(fake_engines, quad, tmp_path):
    ga, gb, gc, gd = quad
    write_table(tmp_path, [(gb, 96.5, 0.8), (gc, 93.0, 0.9),
                           (gd, 96.0, 0.8)])
    out_def = tmp_path / "clusters.tsv"
    rep_list = tmp_path / "reps.txt"
    env = dict(os.environ, COVERM_TPU_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "coverm_tpu", "cluster", "-f", ga, gb, gc, gd,
         "--ani", "95", "--prethreshold-ani", "90",
         "--cluster-method", "skani",
         "--output-cluster-definition", str(out_def),
         "--output-representative-list", str(rep_list)],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    rows = [l.split("\t") for l in out_def.read_text().strip().splitlines()]
    rep_of = {m: rep for rep, m in rows}
    # ga representative claims gb and gd (>=95); gc stands alone
    assert rep_of[gb] == ga and rep_of[gd] == ga and rep_of[ga] == ga
    assert rep_of[gc] == gc
    reps = rep_list.read_text().split()
    assert sorted(reps) == sorted([ga, gc])


def test_cluster_precluster_blocks_external_calls(fake_engines, tmp_path):
    """A genome failing the sketch precluster never reaches the external
    engine, even with a table row saying ANI 99."""
    rng = np.random.default_rng(5)
    ga = tmp_path / "ga.fna"
    gx = tmp_path / "gx.fna"
    write_genome(ga, random_seq(rng, 60000))
    write_genome(gx, random_seq(rng, 60000))  # unrelated
    write_table(tmp_path, [(str(gx), 99.0, 0.9)])
    c = Clusterer(genome_paths=[str(ga), str(gx)], ani=95.0,
                  precluster_ani=90.0, cluster_method="skani")
    clusters = c.cluster()
    assert sorted(len(m) for m in clusters) == [1, 1]
