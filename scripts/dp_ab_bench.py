"""Thread-DP-with-submeshes vs stacked-dp `_mesh_sweep` rows
(VERDICT r4 #6: the dp>=2 kernel row needs a production caller or a
recorded verdict).

The CLI's multi-sample path scans samples on concurrent THREADS, each
contig-sharding over its own (1, n/S) submesh (modes._scanned).  The
alternative is stacking S samples as dp rows of ONE `_mesh_sweep`
dispatch over a (S, n/S) mesh — the axis `dryrun_multichip` step 2
exercises.  This script runs both on the 8-virtual-device CPU mesh,
asserts bit parity, and times them.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      COVERM_TPU_PLATFORM=cpu python scripts/dp_ab_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("COVERM_TPU_PLATFORM", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from coverm_tpu.ops.depth import ReferenceLayout
    from coverm_tpu.ops.sweep import (SPEC_HIST_BINS, _bucket_geo,
                                      unpack_packed)
    from coverm_tpu.parallel.mesh_sweep import (
        _mesh_sweep, _pack_shards, _route_sample,
        compute_depth_stats_sweep_mesh, make_shard_mesh)

    devs = jax.devices()
    print(f"{len(devs)} devices ({devs[0].platform})")
    S = 2
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    TRIM = (0.05, 0.95)
    rng = np.random.default_rng(0)
    C, L, RL = 32, 1_000_000, 150
    layout = ReferenceLayout.build(np.full(C, L, np.int64), 75)
    samples = []
    for s in range(S):
        t = np.sort(rng.integers(0, C, B)).astype(np.int64)
        st = (rng.random(B) * (L - 1)).astype(np.int64)
        order = np.lexsort((st, t))
        t, st = t[order], st[order]
        en = np.minimum(st + RL, L)
        samples.append((t, st, en))

    # ---- A: thread-DP over (1, n/S) submeshes (the production path) ----
    from concurrent.futures import ThreadPoolExecutor
    from jax.sharding import Mesh

    groups = [np.array(devs[i::S]) for i in range(S)]
    submeshes = [Mesh(g.reshape(1, -1), axis_names=("dp", "shard"))
                 for g in groups]

    def thread_dp():
        def job(i):
            t, st, en = samples[i]
            return compute_depth_stats_sweep_mesh(
                layout, t, st, en, need_hist=False, trim=TRIM,
                mesh=submeshes[i])
        with ThreadPoolExecutor(max_workers=S) as ex:
            return list(ex.map(job, range(S)))

    # ---- B: stacked dp rows of ONE _mesh_sweep dispatch ----
    mesh2 = make_shard_mesh(len(devs), dp=S)
    n_shards = mesh2.devices.shape[1]

    def stacked_dp():
        routed = [_route_sample(layout, *samples[s], n_shards)
                  for s in range(S)]
        B_local = _bucket_geo(
            max(int(r[12].max(initial=1)) for r in routed), minimum=128)
        n_seg, seg_len_dev, n_out = routed[0][7], routed[0][8], routed[0][9]
        rows_s, rows_p, rows_c, sl, row_tids = [], [], [], [], []
        len_mode = routed[0][5]
        for r in routed:
            (seg_sorted, starts_sorted, vals_sorted, offsets, counts_mat,
             lm, scalar_len, _ns, _sd, _no, _obs, tids_s, _ps, _sp) = r
            assert lm == len_mode
            sp, pp, ce = _pack_shards(starts_sorted, vals_sorted, offsets,
                                      counts_mat, B_local, n_shards, n_seg,
                                      lm)
            rows_s.append(sp.reshape(-1))
            rows_p.append(pp.reshape(-1))
            rows_c.append(ce)
            sl.append([scalar_len])
            row_tids.append(tids_s)
        packed = _mesh_sweep(
            jnp.asarray(np.stack(rows_s)), jnp.asarray(np.stack(rows_p)),
            jnp.asarray(np.stack(rows_c)), seg_len_dev,
            jnp.asarray(np.asarray(sl, dtype=np.int32)),
            n_seg, 75, False, SPEC_HIST_BINS, len_mode, TRIM, mesh2)
        packed = np.asarray(jax.device_get(packed))
        return [unpack_packed(layout, packed[s], n_seg, n_out, None,
                              row_tids[s], False, TRIM, SPEC_HIST_BINS)
                for s in range(S)]

    def timeit(label, fn):
        r = fn()  # compile
        times = []
        for _ in range(REPS):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        best = min(times)
        print(f"{label}: times {[round(t, 2) for t in times]} "
              f"best={best:.3f}s ({S * B / best / 1e6:.2f}M blocks/s)")
        return best, r

    ta, ra = timeit("thread-DP (submeshes)", thread_dp)
    tb, rb = timeit("stacked-dp (_mesh_sweep rows)", stacked_dp)
    for s in range(S):
        for f in ("sum_depth_window", "covered_window", "covered_full",
                  "sumsq_window", "min_depth_window", "trimmed_sum"):
            np.testing.assert_array_equal(
                getattr(ra[s], f), getattr(rb[s], f), err_msg=f"{s}/{f}")
    print(f"bit parity OK; stacked/thread wall ratio {tb / ta:.2f}x "
          f"({'stacked wins' if tb < ta else 'thread-DP wins'})")


if __name__ == "__main__":
    main()
