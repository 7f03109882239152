#!/usr/bin/env python
"""Demo-parity harness (VERDICT r1 item 6).

Reproduces the reference's README demo (README.md "Demo";
demo/output_coverm.tsv:1-10) with coverm_tpu and compares the table
cell-by-cell at the reference E2E tolerance (1e-3, order-insensitive —
tests/test_cmdline.rs:33-96 `assert_equal_table_approx`).

Requirements, checked up front with actionable skip messages:
  - all 8 demo genomes (this snapshot ships only 2/4/5/7; fetch the rest
    from github.com/wwood/CoverM/tree/main/demo or point --demo-dir at a
    complete copy)
  - a mapper on $PATH (strobealign by default; pick another with -p)

Usage:
  python scripts/demo_parity.py [--demo-dir DIR] [-p MAPPER] [--full]

Exit codes: 0 parity, 1 mismatch, 3 inputs unavailable (skip).
"""

import argparse
import os
import shutil
import subprocess
import sys

DEMO_DEFAULT = "/root/reference/demo"
GENOMES = [f"genome_{i}.fna" for i in range(1, 9)]


def approx_equal_table(expected: str, observed: str, tol: float = 1e-3):
    """Order-insensitive rows, per-cell numeric tolerance
    (test_cmdline.rs:33-96)."""
    e_rows = expected.strip("\n").split("\n")
    o_rows = observed.strip("\n").split("\n")
    if e_rows[0] != o_rows[0]:
        return False, f"header differs:\n  {e_rows[0]!r}\n  {o_rows[0]!r}"
    if len(e_rows) != len(o_rows):
        return False, f"row count {len(e_rows)} vs {len(o_rows)}"
    o_by_key = {r.split("\t")[0]: r for r in o_rows[1:]}
    for er in e_rows[1:]:
        key = er.split("\t")[0]
        orow = o_by_key.get(key)
        if orow is None:
            return False, f"missing row {key!r}"
        ecells, ocells = er.split("\t"), orow.split("\t")
        if len(ecells) != len(ocells):
            return False, f"row {key!r}: cell count differs"
        for ec, oc in zip(ecells, ocells):
            if ec == oc:
                continue
            try:
                ev, ov = float(ec), float(oc)
            except ValueError:
                return False, f"row {key!r}: {ec!r} != {oc!r}"
            denom = max(abs(ev), 1.0)
            if abs(ev - ov) / denom > tol:
                return False, f"row {key!r}: {ec} vs {oc} (tol {tol})"
    return True, "ok"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demo-dir", default=DEMO_DEFAULT)
    ap.add_argument("-p", "--mapper", default="strobealign")
    ap.add_argument("--full", action="store_true",
                    help="compare against output_coverm_full.tsv (needs the "
                         "full 76M-read sample, not shipped)")
    args = ap.parse_args()

    d = args.demo_dir
    missing = [g for g in GENOMES if not os.path.exists(os.path.join(d, g))]
    if missing:
        print(f"SKIP: demo genomes missing from {d}: {', '.join(missing)}\n"
              "Fetch them from "
              "https://github.com/wwood/CoverM/tree/main/demo or pass "
              "--demo-dir", file=sys.stderr)
        return 3
    exe = {"strobealign": "strobealign", "minimap2-sr": "minimap2",
           "bwa-mem": "bwa", "bwa-mem2": "bwa-mem2"}.get(
               args.mapper, args.mapper)
    if shutil.which(exe) is None:
        print(f"SKIP: mapper executable {exe!r} not on $PATH", file=sys.stderr)
        return 3
    r1 = os.path.join(d, "sample_1.1.fq.gz")
    r2 = os.path.join(d, "sample_1.2.fq.gz")
    golden_path = os.path.join(
        d, "output_coverm_full.tsv" if args.full else "output_coverm.tsv")
    if not (os.path.exists(r1) and os.path.exists(r2)
            and os.path.exists(golden_path)):
        print("SKIP: demo reads or golden TSV missing", file=sys.stderr)
        return 3

    cmd = [sys.executable, "-m", "coverm_tpu", "genome",
           "--coupled", r1, r2,
           "--genome-fasta-files"] + [os.path.join(d, g) for g in GENOMES] + [
           "-t", "8", "-p", args.mapper,
           "-m", "mean", "relative_abundance", "covered_fraction"]
    print("+ " + " ".join(cmd), file=sys.stderr)
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        print(res.stderr, file=sys.stderr)
        return 1
    with open(golden_path) as f:
        golden = f.read()
    ok, msg = approx_equal_table(golden, res.stdout)
    # the README's documented checkpoint line
    if "found 48254 reads mapped out of 100000 total" in res.stderr:
        print("reads-mapped checkpoint: 48.25% OK", file=sys.stderr)
    print(("PARITY OK" if ok else f"MISMATCH: {msg}"), file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
