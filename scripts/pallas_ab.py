"""On-chip A/B of the Pallas fused sweep-scan vs the XLA multi-scan path
(VERDICT r4 #3).

Both engines get the SAME post-sort workload shape as the bench fixture:
B blocks over 32 contigs (1 Mbp each).  Measured:
  - the production packed XLA path (compute_depth_stats_sweep, single
    u8-upload, packed single fetch);
  - the Pallas legacy path (COVERM_TPU_PALLAS=1: XLA sort -> fused
    Pallas post-sort scan kernel -> i64 cumsums in XLA, full-transfer
    outputs).
Also prints a speed-of-light estimate for the sweep: bytes touched per
event vs v5e HBM bandwidth, so device_only_reads_per_s has a
denominator.

Run on the real TPU:  python scripts/pallas_ab.py [B]
(CPU runs use interpret mode and measure nothing useful.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 933_000
    REPS = 7
    import jax

    from coverm_tpu.ops import sweep
    from coverm_tpu.ops.depth import ReferenceLayout

    platform = jax.devices()[0].platform
    print(f"devices: {jax.devices()}", flush=True)

    rng = np.random.default_rng(0)
    n_contigs, contig_len, read_len = 32, 1_000_000, 150
    layout = ReferenceLayout.build(
        np.full(n_contigs, contig_len, np.int64), 75)
    tids = np.sort(rng.integers(0, n_contigs, B)).astype(np.int64)
    starts = (rng.random(B) * (contig_len - 1)).astype(np.int64)
    order = np.lexsort((starts, tids))
    tids, starts = tids[order], starts[order]
    ends = np.minimum(starts + read_len, contig_len)

    def bench(label, env, need_hist):
        old = os.environ.get("COVERM_TPU_PALLAS")
        os.environ["COVERM_TPU_PALLAS"] = env
        try:
            def one():
                return sweep.compute_depth_stats_sweep(
                    layout, tids, starts, ends, need_hist=need_hist,
                    trim=(0.05, 0.95))
            t0 = time.time()
            r = one()
            print(f"{label}: first call (compile) {time.time()-t0:.1f}s",
                  flush=True)
            times = []
            for _ in range(REPS):
                t0 = time.time()
                one()
                times.append(time.time() - t0)
            best = min(times)
            print(f"{label}: times {[round(t, 3) for t in times]} "
                  f"best={best * 1e3:.1f} ms "
                  f"({B / best / 1e6:.1f}M blocks/s)", flush=True)
            return best, r
        finally:
            if old is None:
                os.environ.pop("COVERM_TPU_PALLAS", None)
            else:
                os.environ["COVERM_TPU_PALLAS"] = old

    for need_hist in (False, True):
        print(f"--- need_hist={need_hist} ---")
        bx, rx = bench("XLA packed", "0", need_hist)
        try:
            bp, rp = bench("Pallas legacy", "1", need_hist)
        except Exception as e:
            print(f"Pallas path FAILED: {e!r}")
            continue
        for f in ("sum_depth_window", "covered_window", "covered_full",
                  "sumsq_window", "min_depth_window", "trimmed_sum"):
            a, b = getattr(rx, f), getattr(rp, f)
            if a is not None and b is not None:
                np.testing.assert_array_equal(a, b, err_msg=f)
        print(f"parity OK; Pallas/XLA wall ratio: {bp / bx:.2f}x "
              f"({'Pallas wins' if bp < bx else 'XLA wins'})")

    # --- speed of light ---------------------------------------------------
    # events E = 2B + sentinels; the sort is the floor: a bitonic-style
    # device sort of E i64 keys + i32 payload makes O(log^2 E) passes
    # over ~12 B/event; the post-sort pipeline is ~8 more full passes
    # (XLA) or ~1 fused pass + 3 i64 cumsums (Pallas) at ~36 B/event
    # read+write.  v5e HBM ~ 819 GB/s.
    E = 2 * B + 1024
    import math
    log2e = math.log2(E)
    sort_passes = log2e * (log2e + 1) / 2
    hbm = 819e9
    sort_bytes = E * 12 * sort_passes
    post_xla = E * 36 * 8
    post_pallas = E * 36 * 1 + E * 24 * 3
    print("--- speed of light (v5e, 819 GB/s HBM) ---")
    print(f"E={E} events; sort ~{sort_passes:.0f} passes "
          f"-> {sort_bytes / hbm * 1e3:.2f} ms floor")
    print(f"post-sort XLA ~8 passes -> {post_xla / hbm * 1e3:.2f} ms; "
          f"Pallas fused -> {post_pallas / hbm * 1e3:.2f} ms")
    print(f"sweep floor ~ {(sort_bytes + post_xla) / hbm * 1e3:.2f} ms "
          f"(XLA) / {(sort_bytes + post_pallas) / hbm * 1e3:.2f} ms "
          f"(Pallas) per dispatch of {B} blocks on {platform}")


if __name__ == "__main__":
    main()
