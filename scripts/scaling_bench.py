"""Multi-process scaling benchmark for the contig-sharded mesh sweep.

Measures aligned reads/s of the depth engine through
parallel/distributed.compute_depth_stats_sweep_multihost on a mesh of
1 process vs N processes (one device per process, so each process adds
compute), and reports STRONG-scaling efficiency

    eff(N) = rps(N) / (N * rps(1))

against BASELINE.md's >=80% target.  On this CPU host each process is
one XLA CPU device and the cross-process axis rides gloo (the DCN-style
transport); on real multi-host TPU the identical code path rides
ICI/DCN (jax.distributed + shard_map psum) — only the transport
differs, the routing/packing/merge logic measured here is the same.

Run:  python scripts/scaling_bench.py [--nproc 2] [--reads 2000000]
Writes one JSON line to stdout from rank 0 and appends nothing; the
curated results live in SCALING.md.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONTIGS = 64
CONTIG_LEN = 400_000
READ_LEN = 150
REPS = 5
TRIM = (0.05, 0.95)


def build_workload(n_reads):
    import numpy as np

    rng = np.random.default_rng(0)
    tids = np.sort(rng.integers(0, N_CONTIGS, n_reads)).astype(np.int64)
    starts = (rng.random(n_reads) * (CONTIG_LEN - READ_LEN)).astype(np.int64)
    order = np.lexsort((starts, tids))
    tids, starts = tids[order], starts[order]
    return tids, starts, starts + READ_LEN


def worker(args):
    os.environ.setdefault("COVERM_TPU_PLATFORM", "cpu")
    from coverm_tpu.parallel import distributed
    distributed.maybe_initialize()
    import jax
    import numpy as np
    from coverm_tpu.ops.depth import ReferenceLayout

    tids, starts, ends = build_workload(args.reads)
    layout = ReferenceLayout.build(
        np.full(N_CONTIGS, CONTIG_LEN, dtype=np.int64), 75)
    mesh = distributed.make_global_mesh()

    def one_pass():
        d = distributed.compute_depth_stats_sweep_multihost(
            layout, tids, starts, ends, need_hist=False, trim=TRIM,
            mesh=mesh)
        return d.sum_depth_window.sum()

    total = one_pass()  # warmup: compile + gloo channel setup
    times = []
    for _ in range(REPS):
        t0 = time.time()
        one_pass()
        times.append(time.time() - t0)
    med = float(np.median(times))
    if jax.process_index() == 0:
        print(json.dumps({
            "n_processes": jax.process_count(),
            "n_devices": len(jax.devices()),
            "reads_per_s": round(args.reads / med),
            "median_s": round(med, 3),
            "times_s": [round(t, 3) for t in times],
            "checksum": int(total),
        }), flush=True)
    return 0


def launch(nproc, reads):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env["JAX_PLATFORMS"] = "cpu"
        env["COVERM_TPU_PLATFORM"] = "cpu"
        env["COVERM_TPU_COORDINATOR"] = f"localhost:{port}"
        env["COVERM_TPU_NUM_PROCESSES"] = str(nproc)
        env["COVERM_TPU_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--reads", str(reads)],
            cwd=REPO, env=env, stdout=subprocess.PIPE, text=True))
    out = None
    for p in procs:
        o, _ = p.communicate(timeout=1800)
        if o and o.strip():
            for line in o.splitlines():
                if line.startswith("{"):
                    out = json.loads(line)
        assert p.returncode == 0
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--reads", type=int, default=2_000_000)
    args = ap.parse_args()
    if args.worker:
        return worker(args)

    r1 = launch(1, args.reads)
    rn = launch(args.nproc, args.reads)
    assert r1["checksum"] == rn["checksum"], (r1, rn)
    eff = rn["reads_per_s"] / (args.nproc * r1["reads_per_s"])
    print(json.dumps({
        "metric": "multi-process strong-scaling efficiency (mesh sweep, "
                  "1 device/process, gloo cross-process axis)",
        "reads": args.reads,
        "rps_1proc": r1["reads_per_s"],
        f"rps_{args.nproc}proc": rn["reads_per_s"],
        "efficiency": round(eff, 3),
        "target": 0.8,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
