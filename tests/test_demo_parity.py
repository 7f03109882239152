"""Demo-parity harness: gated on demo inputs + a real mapper
(VERDICT r1 item 6; README.md "Demo", demo/output_coverm.tsv)."""

import os
import shutil
import subprocess
import sys

import pytest

from scripts_path import SCRIPTS  # noqa: F401  (fixture-less path helper)


def test_demo_parity_gated():
    script = os.path.join(SCRIPTS, "demo_parity.py")
    res = subprocess.run([sys.executable, script], capture_output=True,
                         text=True)
    if res.returncode == 3:
        pytest.skip(f"demo inputs unavailable: {res.stderr.strip()[:200]}")
    assert res.returncode == 0, res.stderr


def test_approx_equal_table():
    sys.path.insert(0, SCRIPTS)
    from demo_parity import approx_equal_table

    golden = ("Genome\ts Mean\nunmapped\tNA\ng1\t0.9410575\n")
    ok, _ = approx_equal_table(golden, "Genome\ts Mean\ng1\t0.9410570\n"
                                       "unmapped\tNA\n")
    assert ok
    ok, msg = approx_equal_table(golden, "Genome\ts Mean\ng1\t0.95\n"
                                         "unmapped\tNA\n")
    assert not ok
    ok, msg = approx_equal_table(golden, "Genome\ts Mean\ng1\t0.9410575\n"
                                         "unmapped\t0\n")
    assert not ok
