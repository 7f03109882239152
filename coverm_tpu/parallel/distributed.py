"""Multi-host execution: jax.distributed + a cross-process mesh sweep.

The reference is strictly single-host (SURVEY.md §2.3: no MPI/NCCL/
sockets); multi-host is NEW capability mirrored on CoverM's
sample x contig decomposition.  The contig-sharded event sweep
(parallel/mesh_sweep.py) is independent across contigs and merges by a
psum, so it extends to a mesh spanning processes unchanged: each host
routes blocks by contig to the GLOBAL shard set, feeds only its local
shard columns (jax.make_array_from_process_local_data), and the psum
rides the ICI/DCN collective the mesh provides.  The packed per-contig
output is replicated, so every host ends the pass holding the full
statistics — exactly the state the estimator/taker layers expect.

Process startup is environment-driven (COVERM_TPU_COORDINATOR,
COVERM_TPU_NUM_PROCESSES, COVERM_TPU_PROCESS_ID — or the standard
JAX_COORDINATOR_ADDRESS etc. that jax.distributed.initialize reads
natively), so `coverm-tpu contig ...` launched once per host under any
process launcher becomes one SPMD job.  Scaling methodology + measured
numbers live in SCALING.md (scripts/scaling_bench.py).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

_initialized = False


def maybe_initialize() -> bool:
    """Initialise jax.distributed from the environment (idempotent).

    Returns True when running as part of a multi-process job.  Must be
    called before the first JAX backend use (cli.main does this first
    thing).  On the CPU backend (COVERM_TPU_PLATFORM=cpu — the scaling
    test/bench configuration) cross-process collectives need the gloo
    implementation, which must be selected before backend init.
    """
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get("COVERM_TPU_COORDINATOR")
    nproc = os.environ.get("COVERM_TPU_NUM_PROCESSES")
    pid = os.environ.get("COVERM_TPU_PROCESS_ID")
    if not coord:
        return False
    import jax

    platform = os.environ.get("COVERM_TPU_PLATFORM")
    if platform:
        # the axon TPU plugin ignores JAX_PLATFORMS; the config knob wins
        jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc) if nproc else None,
        process_id=int(pid) if pid is not None else None)
    _initialized = True
    return True


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def suppress_output() -> bool:
    """True on non-zero ranks of a multi-process job: every process ends
    the pass with identical replicated statistics, so only process 0
    writes the TSV (a shared -o path must not be written N times)."""
    if not _initialized:
        return False
    import jax

    return jax.process_index() != 0


def make_global_mesh(dp: int = 1):
    """(dp, shard) mesh over ALL devices of the job, processes included.

    Device order follows jax.devices() (grouped by process), so each
    process's addressable devices form contiguous shard columns.
    """
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices())
    shard = len(devices) // dp
    return Mesh(devices[: dp * shard].reshape(dp, shard),
                axis_names=("dp", "shard"))


def _local_cols(mesh) -> np.ndarray:
    """Indices of the shard columns whose devices this process owns."""
    import jax

    pid = jax.process_index()
    return np.asarray([j for j in range(mesh.devices.shape[1])
                       if mesh.devices[0, j].process_index == pid])


def compute_depth_stats_sweep_multihost(layout, tids, starts, ends,
                                        need_hist: bool = False, trim=None,
                                        mesh=None, deferred: bool = False,
                                        need_max: bool = True):
    """Drop-in for compute_depth_stats_sweep over a mesh that may span
    processes.  Every process must call this with the SAME blocks (the
    BAM lives on a shared filesystem, as in any multi-host input
    pipeline); routing is deterministic, so each process independently
    computes the identical global layout and contributes only its local
    shard columns.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.depth import _bucket
    from ..ops.sweep import (SPEC_HIST_BINS, PendingDepthStats, _bucket_geo,
                             empty_depth_stats)
    from .mesh_sweep import _mesh_sweep, _pack_shards, _route_sample

    if mesh is None:
        mesh = make_global_mesh()
    C = layout.n_contigs
    tids = np.asarray(tids)
    starts = np.asarray(starts)
    ends = np.asarray(ends)
    if tids.size == 0 or C == 0:
        return empty_depth_stats(C, need_hist, trim)

    n_shards = mesh.devices.shape[1]
    (seg_sorted, starts_sorted, vals_sorted, offsets, counts_mat, len_mode,
     scalar_len, n_seg, seg_len_dev, n_out, obs, tids_s,
     per_shard, _split) = _route_sample(layout, tids, starts, ends,
                                        n_shards)

    B_local = _bucket_geo(max(int(per_shard.max(initial=1)), 1), minimum=128)
    starts_p, payload_p, counts_ext = _pack_shards(
        starts_sorted, vals_sorted, offsets, counts_mat, B_local, n_shards,
        n_seg, len_mode)

    cols = _local_cols(mesh)
    flat = NamedSharding(mesh, P("dp", "shard"))
    by_shard = NamedSharding(mesh, P("dp", "shard", None))
    repl = NamedSharding(mesh, P())
    dp_only = NamedSharding(mesh, P("dp", None))

    def globalize(local, sharding, global_shape):
        return jax.make_array_from_process_local_data(
            sharding, local, global_shape)

    starts_g = globalize(starts_p[cols].reshape(1, -1), flat,
                         (1, n_shards * B_local))
    pay_w = payload_p.shape[1]
    payload_g = globalize(payload_p[cols].reshape(1, -1), flat,
                          (1, n_shards * pay_w))
    counts_g = globalize(counts_ext[cols].reshape(1, len(cols), -1), by_shard,
                         (1, n_shards, n_seg + 1))
    seg_len_g = globalize(np.asarray(seg_len_dev), repl,
                          np.asarray(seg_len_dev).shape)
    sl_g = globalize(np.asarray([[scalar_len]], np.int32), dp_only, (1, 1))

    ee = layout.contig_end_exclusion
    trim_key = (float(trim[0]), float(trim[1])) if trim is not None else None

    def dispatch(n_bins):
        out = _mesh_sweep(starts_g, payload_g, counts_g, seg_len_g, sl_g,
                          n_seg, ee, need_hist, n_bins, len_mode, trim_key,
                          mesh)
        return out[0]

    pending = PendingDepthStats(dispatch(SPEC_HIST_BINS), dispatch, layout,
                                n_seg, n_out, obs, tids_s, need_hist, trim,
                                SPEC_HIST_BINS, blocks=(tids, starts, ends))
    return pending if deferred else pending.result()


def multihost_depth_fn(mesh=None):
    """A scan_sample-compatible depth_fn bound to a global mesh."""
    if mesh is None:
        mesh = make_global_mesh()
    return partial(compute_depth_stats_sweep_multihost, mesh=mesh)
