"""Multi-device sharded depth engine.

The reference is a single-process tool; its closest analogues to
parallel axes are the serial multi-sample loop (contig.rs:22) and the
`--sharded` reference-sharding merge (shard_bam_reader.rs).  Here both
become mesh axes (SURVEY.md §2.3/§5):

  - ``dp``  (data parallel): samples' block batches sharded over devices;
  - ``pos`` (sequence parallel): the padded position axis of a chunk is
    sharded over devices — each device scatters its local deltas, runs a
    local cumsum, and the inter-device carry is an exclusive scan over
    the per-device totals (an all_gather of one scalar per device);
    per-contig segment totals are psum-merged so the per-contig carry
    correction and the final statistics agree with the single-device
    engine bit-for-bit.

``sharded_depth_step`` is the jittable one-chunk step used by
__graft_entry__.dryrun_multichip and the scaling bench.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, dp: int = 1):
    devices = np.array(jax.devices()[: n_devices or len(jax.devices())])
    pos = len(devices) // dp
    return Mesh(devices.reshape(dp, pos), axis_names=("dp", "pos"))


def _local_depth_stats(idx, val, pos_seg, window, valid, n_seg):
    """Per-device shard of the depth computation (inside shard_map).

    idx/val: this device's scatter points, already rebased to local
    positions (out-of-shard points routed to the dump slot by the host).
    pos_seg/window/valid: this device's position-axis shard.
    """
    Pl = pos_seg.shape[0]
    delta = jnp.zeros(Pl + 1, dtype=jnp.int32)
    delta = delta.at[idx].add(val, mode="drop")
    delta = delta[:Pl]

    local_cumsum = jnp.cumsum(delta, dtype=jnp.int32)
    local_total = local_cumsum[-1]
    # exclusive scan of per-device totals over the 'pos' axis
    totals = jax.lax.all_gather(local_total, "pos")
    my = jax.lax.axis_index("pos")
    offset = jnp.sum(jnp.where(jnp.arange(totals.shape[0]) < my, totals, 0))
    raw = local_cumsum + offset

    # per-contig totals must be global for the carry correction
    seg_total_local = jax.ops.segment_sum(delta, pos_seg, n_seg)
    seg_total = jax.lax.psum(seg_total_local, "pos")
    carry = jnp.cumsum(seg_total) - seg_total
    depth = raw - carry[pos_seg].astype(jnp.int32)

    dw = jnp.where(window, depth, 0)
    sum_w = jax.ops.segment_sum(dw.astype(jnp.int64), pos_seg, n_seg)
    cov_w = jax.ops.segment_sum((dw > 0).astype(jnp.int32), pos_seg, n_seg)
    cov_f = jax.ops.segment_sum(((depth > 0) & valid).astype(jnp.int32),
                                pos_seg, n_seg)
    max_w = jax.ops.segment_max(dw, pos_seg, n_seg)
    # merge partial per-contig stats across the position shards
    sum_w = jax.lax.psum(sum_w, "pos")
    cov_w = jax.lax.psum(cov_w, "pos")
    cov_f = jax.lax.psum(cov_f, "pos")
    # max_w stays per-shard: the axon AOT compile helper only lowers Sum
    # all-reduces, so the max-merge happens outside the shard_map (each
    # shard contributes its local segment max via the output layout)
    return sum_w, cov_w.astype(jnp.int64), cov_f.astype(jnp.int64), max_w


@partial(jax.jit, static_argnames=("n_seg", "mesh"))
def sharded_depth_step(idx, val, pos_seg, window, valid, n_seg, mesh):
    """One depth-stats step over a (dp, pos) mesh.

    Shapes (S = samples, B = scatter points per sample, P = positions):
      idx, val:  int32[S, B]    sharded (dp, pos) — each pos-shard gets the
                                scatter points the host routed to it
      pos_seg:   int32[P]       sharded (pos,)
      window, valid: bool[P]    sharded (pos,)
    Returns per-sample per-contig stats, sharded over dp.
    """
    fn = shard_map(
        jax.vmap(_local_depth_stats, in_axes=(0, 0, None, None, None, None)),
        mesh=mesh,
        in_specs=(P("dp", "pos"), P("dp", "pos"), P("pos"), P("pos"),
                  P("pos"), None),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp", "pos")),
    )
    sum_w, cov_w, cov_f, max_w = fn(idx, val, pos_seg, window, valid, n_seg)
    n_pos = mesh.devices.shape[1]
    max_w = jnp.max(max_w.reshape(max_w.shape[0], n_pos, -1), axis=1)
    return sum_w, cov_w, cov_f, max_w


def route_scatter_points(idx, val, P_total, n_pos_shards, pad_to=None):
    """Host-side routing of scatter points to position shards.

    Points are rebased to shard-local coordinates; every shard's list is
    padded to ``pad_to`` (default: the max shard occupancy) with
    dump-slot points (local_P).  Returns int32[n_pos_shards * pad_to]
    arrays laid out so an even (pos,) sharding gives each shard exactly
    its own points.
    """
    Pl = P_total // n_pos_shards
    shard_of = np.minimum(idx // Pl, n_pos_shards - 1)
    # points on the dump slot (idx == P_total) keep dumping
    local = idx - shard_of * Pl
    local = np.where(idx >= P_total, Pl, local)
    out_idx, out_val = [], []
    max_len = 1
    for s in range(n_pos_shards):
        m = shard_of == s
        out_idx.append(local[m])
        out_val.append(val[m])
        max_len = max(max_len, int(m.sum()))
    if pad_to is not None:
        if pad_to < max_len:
            raise ValueError(f"pad_to {pad_to} < max shard occupancy {max_len}")
        max_len = pad_to
    idx_arr = np.full((n_pos_shards, max_len), Pl, dtype=np.int32)
    val_arr = np.zeros((n_pos_shards, max_len), dtype=np.int32)
    for s in range(n_pos_shards):
        k = out_idx[s].size
        idx_arr[s, :k] = out_idx[s]
        val_arr[s, :k] = out_val[s]
    return idx_arr.reshape(-1), val_arr.reshape(-1)
